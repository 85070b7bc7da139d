from .stream import StreamDemodulator
from .checkpoint import (restore_sharded, restore_state, save_sharded,
                         save_state)
from .failover import (ElasticDemodulator, Heartbeat, failed_processes,
                       health_check, monitor_heartbeats)
from .metrics import MetricsAggregator
from .profiling import ThroughputMeter, log_compiles, trace
from .validate import assert_pcm_block, assert_rx_state, checkify_step

__all__ = [
    "assert_pcm_block",
    "assert_rx_state",
    "checkify_step",
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
