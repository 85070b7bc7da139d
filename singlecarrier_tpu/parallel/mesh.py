"""Device mesh construction.

The reference is single-process/single-thread (SURVEY.md section 2:
zero parallelism code); all scaling here is JAX sharding over a
``jax.sharding.Mesh``.  The dominant axis is ``ch`` (independent RF
channels -- pure data parallelism); ``time`` optionally shards one
channel's stream (sequence parallelism with halo exchange,
parallel/timeshard.py).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(ch: int | None = None, time: int = 1,
              devices=None) -> Mesh:
    """Build a [ch, time] mesh over the available devices.

    Defaults to all devices on the channel axis (the scaling axis for
    the >=1M-channel target).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if ch is None:
        ch = n // time
    if ch * time != n:
        raise ValueError(f"mesh {ch}x{time} != {n} devices")
    arr = np.asarray(devices).reshape(ch, time)
    return Mesh(arr, axis_names=("ch", "time"))
