"""Inspection decision layer: window aggregation, rule decisions, event
detectors/gates/trackers, frame quality gating (SURVEY §5)."""
from unet_tpu.inspect.window import (  # noqa: F401
    FrameResult, WindowStatistics, WindowAggregator, ThresholdConfig,
    DecisionResult, make_decision)
from unet_tpu.inspect.detectors import (  # noqa: F401
    FrameMetrics, EventConfig, EventDetector, EventGate, DefectTracker,
    FrameQualityGate, QualityResult, quality_stats, bbox_iou)
from unet_tpu.inspect.decision import (  # noqa: F401
    Metrics, Finding, SimpleThresholds, compute_metrics, decide)
from unet_tpu.inspect.uniformity import (  # noqa: F401
    WrapUniformityMonitor, measure_cable_tape_diameter_px)
