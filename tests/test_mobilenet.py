"""MobileNetV3 encoder parity + lightweight UNet integration."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
# whole module is minute-scale (trains/loads real encoder weights);
# quick lane skips it, the full lane (-m 'slow or not slow') runs it
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from tests.torch_ref import TMobileNetV3Features
from unet_tpu.models.convert import convert_mobilenet_encoder
from unet_tpu.models.mobilenet import (LARGE_LAST, LARGE_SPEC, MobileNetV3Encoder,
                                       SMALL_LAST, SMALL_SPEC)


@pytest.mark.parametrize("variant,spec,last,channels", [
    ("small", SMALL_SPEC, SMALL_LAST, (16, 24, 40, 48, 576)),
    ("large", LARGE_SPEC, LARGE_LAST, (16, 24, 40, 80, 960)),
])
def test_mobilenet_encoder_parity(variant, spec, last, channels):
    tm = TMobileNetV3Features(spec, last).eval()
    g = torch.Generator().manual_seed(0)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_mobilenet_encoder(sd, variant)
    enc = MobileNetV3Encoder(variant=variant)
    x = torch.randn(1, 3, 64, 64, generator=g)
    feats = enc.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                      train=False)
    assert tuple(int(f.shape[-1]) for f in feats) == channels

    cuts = {2, 4, 7, 9}
    want, y = [], x
    with torch.no_grad():
        for idx, layer in enumerate(tm.features):
            y = layer(y)
            if idx + 1 in cuts:
                want.append(y.numpy())
        want.append(y.numpy())
    for f, wt in zip(feats, want):
        np.testing.assert_allclose(np.asarray(f).transpose(0, 3, 1, 2), wt,
                                   atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("encoder", ["custom", "resnet18", "mobilenet_v3_small"])
def test_lightweight_unet_forward(encoder):
    from unet_tpu.models import LightweightNestedUNet
    model = LightweightNestedUNet(num_classes=7, encoder=encoder,
                                  deep_supervision=True)
    x = jnp.zeros((1, 64, 64, 3))
    # init in train mode so the deep-supervision heads exist
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out = model.apply(variables, x, train=False)
    assert out.shape[-1] == 7
    # train mode with DS returns 4 heads at input resolution
    outs, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert len(outs) == 4
    # reference semantics: aux DS heads are upsampled to input size, while the
    # main output stays at the stage-0 resolution (full-res only for 'custom')
    assert all(o.shape[1:3] == (64, 64) for o in outs[1:])
    if encoder == "custom":
        assert outs[0].shape[1:3] == (64, 64)


def test_channel_shuffle_matches_torch():
    from unet_tpu.models.shufflenet import channel_shuffle
    x = np.arange(2 * 3 * 3 * 8, dtype=np.float32).reshape(2, 3, 3, 8)
    got = np.asarray(channel_shuffle(jnp.asarray(x), 2))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    b, c, h, w = t.shape
    want = t.view(b, 2, c // 2, h, w).transpose(1, 2).reshape(b, c, h, w)
    assert np.array_equal(got, want.numpy().transpose(0, 2, 3, 1))


def test_shufflenet_encoder_shapes():
    from unet_tpu.models.shufflenet import ShuffleNetV2Encoder
    enc = ShuffleNetV2Encoder()
    x = jnp.zeros((1, 128, 128, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(variables, x, train=False)
    assert [tuple(f.shape[1:]) for f in feats] == [
        (32, 32, 24), (16, 16, 116), (8, 8, 232), (4, 4, 464), (2, 2, 464)]


def test_lightweight_shufflenet_forward():
    from unet_tpu.models import LightweightNestedUNet
    model = LightweightNestedUNet(num_classes=3, encoder="shufflenet_v2_x1_0")
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out = model.apply(variables, x, train=False)
    assert out.shape[-1] == 3
