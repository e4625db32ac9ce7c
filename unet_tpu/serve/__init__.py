"""Production serving: YAML-configured inspection system."""
from unet_tpu.serve.inspect_tool import InspectionConfig, InspectionSystem, run_inspection  # noqa: F401
