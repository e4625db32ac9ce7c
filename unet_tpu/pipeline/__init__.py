"""Unified inference pipeline: one configurable engine replacing the
reference's 22-script zoo (SURVEY §1 'script zoo' / §7 architecture)."""
from unet_tpu.pipeline.config import (  # noqa: F401
    ROI, BurrCfg, GeometryCfg, InspectCfg, PipelineCfg, PostprocessCfg,
    PreprocessCfg, SegmentCfg)
from unet_tpu.pipeline import stages, visualize  # noqa: F401
from unet_tpu.pipeline.presets import (  # noqa: F401
    PRESETS, engine_hints, get_preset)
from unet_tpu.pipeline.engine import EngineConfig, InferenceEngine  # noqa: F401
from unet_tpu.pipeline.sliding_window import (  # noqa: F401
    SlidingWindowInference, apply_hysteresis, filter_by_cc_and_prob, scan_thresholds)
