"""Host I/O: video/image sources, writers, camera acquisition."""
from unet_tpu.io.video import VideoReader, ImageDirReader, VideoWriter, VideoMeta  # noqa: F401
from unet_tpu.io.camera import GigECameraHarvester, Frame  # noqa: F401
