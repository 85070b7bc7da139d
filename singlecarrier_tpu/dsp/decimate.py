"""Symbol-rate decimation.

Replaces the reference's strided copy loop (reference: src/qpsk.c:157-162)
``decimated[i] = filtered[i*CYCLES + rx_timing]`` with a vectorized
gather.  Two forms: a static-phase strided slice (the production path)
and a dynamic-offset gather (the faithful path, where ``rx_timing`` is
traced per-channel state because the reference overwrites it with the
sync symbol index after a detect -- qpsk.c:219, SURVEY.md quirk #2).
"""

from __future__ import annotations

import jax.numpy as jnp


def decimate(x, cycles: int, phase: int = 0):
    """Static-phase decimation: ``x[..., phase::cycles]``."""
    return x[..., phase::cycles]


def decimate_at(x, offset, cycles: int, n_out: int):
    """Gather ``x[..., offset + i*cycles]`` for i in [0, n_out).

    ``offset`` may be a traced (per-channel) int32; under vmap each
    channel gathers at its own offset.  Matches qpsk.c:161 with
    ``rx_timing`` as the offset into the combined 2-frame buffer.
    """
    offset = jnp.asarray(offset, jnp.int32)
    idx = offset[..., None] + cycles * jnp.arange(n_out, dtype=jnp.int32)
    # Broadcast idx up to x's rank for take_along_axis.
    idx = jnp.broadcast_to(idx, (*x.shape[:-1], n_out))
    return jnp.take_along_axis(x, idx, axis=-1)
