from .stream import StreamDemodulator
from .checkpoint import (restore_sharded, restore_state, save_sharded,
                         save_state)
from .failover import (ElasticDemodulator, Heartbeat, failed_processes,
                       health_check, monitor_heartbeats)
from .metrics import MetricsAggregator
from .profiling import ThroughputMeter, log_compiles, trace

__all__ = [
    "StreamDemodulator",
    "save_state",
    "restore_state",
    "save_sharded",
    "restore_sharded",
    "ElasticDemodulator",
    "Heartbeat",
    "failed_processes",
    "health_check",
    "monitor_heartbeats",
    "MetricsAggregator",
    "ThroughputMeter",
    "log_compiles",
    "trace",
]
