from .stream import StreamDemodulator
from .checkpoint import save_state, restore_state
from .metrics import MetricsAggregator
from .profiling import ThroughputMeter, log_compiles, trace

__all__ = [
    "StreamDemodulator",
    "save_state",
    "restore_state",
    "MetricsAggregator",
    "ThroughputMeter",
    "log_compiles",
    "trace",
]
