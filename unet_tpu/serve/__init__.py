"""Production serving: YAML-configured inspection system."""
from unet_tpu.serve.inspect_tool import InspectionConfig, InspectionSystem, run_inspection  # noqa: F401
from unet_tpu.serve.multistream import MultiStreamServer, StreamResult  # noqa: F401
from unet_tpu.serve.service import open_sources, serve_streams  # noqa: F401
