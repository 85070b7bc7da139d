from .stream import StreamDemodulator
from .checkpoint import save_state, restore_state
from .metrics import MetricsAggregator

__all__ = [
    "StreamDemodulator",
    "save_state",
    "restore_state",
    "MetricsAggregator",
]
