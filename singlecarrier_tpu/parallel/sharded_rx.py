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
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModemConfig
from ..modem.rx_production import (ProdRxState, prod_rx_batch,
                                   prod_rx_init, prod_rx_stream)


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


# Plane-tuple sharding specs (prod_rx_init_planes layout): phase_r [C],
# phase_i [C], fir_tail_r [C, halo], fir_tail_i [C, halo],
# decim_prev_t [cyc, 2, C, n_sym] -- the channel axis is leading on the
# first four leaves and THIRD on the transposed decim planes.
def _plane_specs(axis: str):
    return (P(axis), P(axis), P(axis), P(axis), P(None, None, axis))


def shard_plane_state(planes, mesh: Mesh, *, axis: str = "ch"):
    """Place a plane-tuple state (prod_rx_init_planes) on the mesh with
    the channel axis sharded."""
    return tuple(
        jax.device_put(x, NamedSharding(mesh, spec))
        for x, spec in zip(planes, _plane_specs(axis)))


def make_fused_sharded_rx(cfg: ModemConfig, mesh: Mesh, *,
                          descramble: bool = True, axis: str = "ch",
                          fuse_frontend: bool = True,
                          block_channels: int = 128,
                          decode_block_channels: int | None = None,
                          interpret: bool = False):
    """The HEADLINE fused-kernel RX under a channel-axis shard_map.

    Wraps ``prod_rx_batch`` (``fuse_frontend=True`` = the ONE-kernel
    fused RX, ops/fused_rx.py; ``False`` = the two-kernel pipeline) so
    each device runs its own Pallas dispatch over its channel shard --
    the deployable pod program for the 1M-channel target, not the XLA
    scan that ``make_channel_sharded_rx`` vmaps.  Channels are fully
    independent (the per-channel statics the axis shards:
    reference src/qpsk.c:34-53), so the sharded program contains ZERO
    collectives: shard_map splits the operands, every device executes
    the identical fused kernel on C/n_dev channels, and outputs stay
    channel-sharded for the caller's metric psums.

    Returns ``jit(fn)(planes, pcm) -> (planes, ProdRxOut)`` where
    ``planes`` is the plane-tuple state (``prod_rx_init_planes``,
    channel axis sharded -- use ``shard_plane_state``) and ``pcm`` is
    [n_blocks, C, frame_size] int16 with C divisible by the mesh's
    ``axis`` size.  Per-device-Pallas equality vs the single-device
    fused path is pinned on the 8-virtual-device CPU mesh in
    tests/test_sharding.py (interpret mode).
    """
    n_dev = mesh.shape[axis]

    def shard_fn(planes, pcm):
        # pcm: [B, C/n_dev, frame_size] local shard
        cb = (None if decode_block_channels is None
              else min(decode_block_channels, pcm.shape[1]))
        return prod_rx_batch(
            cfg, planes, pcm, descramble=descramble,
            block_channels=min(block_channels, pcm.shape[0] * pcm.shape[1]),
            decode_block_channels=cb,
            fuse_frontend=fuse_frontend, interpret=interpret)

    specs = _plane_specs(axis)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(specs, P(None, axis)),
        out_specs=(specs, P(None, axis)),
        check_vma=False,
    )

    def wrapped(planes, pcm):
        if pcm.shape[1] % n_dev:
            raise ValueError(
                f"channels ({pcm.shape[1]}) not divisible by mesh "
                f"'{axis}' size ({n_dev})")
        return fn(planes, pcm)

    return jax.jit(wrapped)


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
