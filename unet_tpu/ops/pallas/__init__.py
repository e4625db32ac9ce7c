"""Hand-written Pallas TPU kernels for the hot compute path."""
from unet_tpu.ops.pallas.conv_fused import (  # noqa: F401
    fused_conv_bn_relu, conv_block_fused, fold_bn)
