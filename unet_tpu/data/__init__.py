"""Data layer: folder datasets, augmentation, batching, labelme conversion."""
from unet_tpu.data.dataset import (  # noqa: F401
    SegmentationDataset, AdvancedDataset, PatchDefectDataset,
    three_class_dataset, REMAP_7_TO_3, imread_rgb, imread_mask)
from unet_tpu.data.loader import Loader, make_train_val_loaders  # noqa: F401
from unet_tpu.data.augment import (  # noqa: F401
    AugmentationPipeline, StrongAugmentationPipeline, WeakAugmentationPipeline)
from unet_tpu.data import labelme  # noqa: F401
