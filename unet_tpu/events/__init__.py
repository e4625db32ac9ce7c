"""Event emission: JSONL/CSV/JSON/MQTT emitters, schema-compatible with the
reference (SURVEY §5 'Metrics / logging / observability')."""
from unet_tpu.events.emitters import (  # noqa: F401
    EventManager, EventOutputConfig, InspectionEventLogger, AnomalyLogger,
    JSONLogger, StatisticsLogger, format_reasons_readable, CLASS_NAMES)
