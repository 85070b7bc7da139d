"""Channel-sharded demodulation (the DP scaling axis).

Channels are fully independent (the reference's per-channel state is a
few KB of statics -- SURVEY.md section 2 DP row), so scaling is pure
data parallelism: ``vmap`` the per-channel RX over a channel axis and
shard that axis over the mesh with ``NamedSharding``.  XLA partitions
everything automatically; there are no cross-channel collectives in the
demod path, only optional ``psum``-style metric reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModemConfig
from ..modem.rx_production import ProdRxState, prod_rx_init, prod_rx_stream


def shard_channel_state(state: ProdRxState, mesh: Mesh) -> ProdRxState:
    """Place a batched state pytree with the leading axis on 'ch'."""
    def put(x):
        spec = P("ch", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, state)


def make_channel_sharded_rx(cfg: ModemConfig, mesh: Mesh, *,
                            descramble: bool = True):
    """jit-compiled [channels, frames, frame_size] -> ProdRxOut, with
    the channel axis sharded over the mesh's 'ch' axis.

    Returns ``fn(state, pcm) -> (state, out)``; build the initial state
    with ``prod_rx_init(cfg, (n_channels,))`` +
    ``shard_channel_state``.
    """
    vfn = jax.vmap(
        lambda st, pcm: prod_rx_stream(cfg, st, pcm,
                                       descramble=descramble))

    ch = NamedSharding(mesh, P("ch"))
    # Leading (channel) axis sharded on 'ch' for every input/output leaf;
    # XLA propagates the sharding through the whole pipeline with zero
    # cross-channel collectives.
    return jax.jit(vfn, in_shardings=ch, out_shardings=ch)


def metrics_summary(out):
    """Cross-channel metric reduction (detection rate, mean CFO, mean
    eq error) -- an all-reduce XLA lowers to psum over ICI."""
    detected = out.valid.sum()
    return {
        "packets_detected": detected,
        "mean_cfo_hz": jnp.where(
            detected > 0,
            jnp.sum(jnp.where(out.valid, out.cfo_hz, 0.0)) / detected, 0.0),
        "mean_eq_error": jnp.where(
            detected > 0,
            jnp.sum(jnp.where(out.valid, out.eq_error, 0.0)) / detected, 0.0),
    }
