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
from ..modem.rx_production import (ProdRxState, _auto_cb,
                                   prod_rx_batch, prod_rx_init,
                                   prod_rx_stream)


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
            block_channels=_auto_cb(pcm.shape[0] * pcm.shape[1],
                                    block_channels),
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


def make_fused_grid_sharded_rx(cfg: ModemConfig, mesh: Mesh, *,
                               descramble: bool = True,
                               fuse_frontend: bool = True,
                               decode_block_channels: int | None = None,
                               interpret: bool = False):
    """The fused-kernel RX under a 2D [ch x time] shard_map (one-shot).

    Channels shard as pure DP; the TIME axis shards one stream's
    blocks with a ONE-BLOCK overlap-save halo: each shard ppermutes
    its last raw PCM block (plus the ntaps-1 samples before it) to its
    right neighbor, PREPENDS it to its local blocks, and seeds the
    prepended walk with closed-form carries --

      * mixer phase entering the halo slot = adv^(g-1) from the GLOBAL
        block index (no communication; for shard 0 that is adv^-1, so
        the first real block lands on adv^0 = the fresh-stream phase);
      * FIR tail entering the halo slot = the downmixed last ntaps-1
        samples of global block g-1 (part of the ppermuted halo);
      * decim_prev = zeros -- it only affects the halo block's OWN
        hunt window, whose outputs are dropped.

    The halo block's decimated planes then ride the fused kernel's
    VMEM ring into the first real block's hunt window, exactly as in
    the unsharded walk: one redundant block of compute per shard buys
    seam-free results.  Outputs for the B_local real blocks are
    returned ([n_blocks, C, ...] leaves, both axes sharded).
    Decision-level seam equality vs the single-device fused path is
    pinned in tests/test_sharding.py (the carried FIR tail is rebuilt
    in f32 where the in-kernel ring holds it in the z-scratch dtype,
    so float stats may differ in ulps at the seam -- the same
    tolerance contract as the dispatch-boundary state-carry test).

    ``pcm``: [n_blocks, n_channels, frame_size] int16, n_blocks
    divisible by mesh['time'] (and >= 2 per shard), n_channels by
    mesh['ch'].
    """
    import numpy as np

    from ..dsp.mixer import mixer_table

    n_t = mesh.shape["time"]
    n_c = mesh.shape["ch"]
    n = cfg.frame_size
    halo = cfg.ntaps - 1
    inv_scale = 1.0 / cfg.tx_amplitude
    w_ = -2.0 * np.pi * cfg.center / cfg.fs
    table = mixer_table(-cfg.center, cfg.fs, n)
    tr_t = jnp.asarray(table.real[n - halo:])
    ti_t = jnp.asarray(table.imag[n - halo:])

    def shard_fn(pcm_local):
        # pcm_local: [B_loc, C_loc, n]
        B_loc, C_loc = pcm_local.shape[0], pcm_local.shape[1]
        t_idx = jax.lax.axis_index("time")
        my_first = t_idx * B_loc                  # global block index
        is_first = t_idx == 0

        # halo to the right neighbor: my last block + the ntaps-1 raw
        # samples preceding it (from my second-to-last block)
        halo_blk = pcm_local[-1]                          # [C_loc, n]
        halo_pre = pcm_local[-2, :, n - halo:]            # [C_loc, halo]
        perm = [(i, i + 1) for i in range(n_t - 1)]
        in_blk = jax.lax.ppermute(halo_blk, "time", perm)
        in_pre = jax.lax.ppermute(halo_pre, "time", perm)
        in_blk = jnp.where(is_first, jnp.zeros_like(in_blk), in_blk)
        in_pre = jnp.where(is_first, jnp.zeros_like(in_pre), in_pre)

        # closed-form carries at the halo slot g = my_first - 1
        # (shard 0: adv^-1 so block 0 gets adv^0).  The seed phasors
        # come from a HOST float64 table indexed by the shard: an f32
        # angle*g product drifts ~1e-7*g rad from prod_rx_batch's
        # float64 adv tabulation, degrading seam equality with stream
        # length (code-review r5).  B_loc and n_t are static, so the
        # tables are exact at trace time.
        import numpy as _np
        g_tab = _np.arange(n_t, dtype=_np.float64) * B_loc - 1.0
        ph1 = _np.exp(1j * w_ * n * g_tab).astype(_np.complex64)
        ph2 = _np.exp(1j * w_ * n * (g_tab - 1.0)).astype(_np.complex64)
        p_r = jnp.asarray(ph1.real)[t_idx] * jnp.ones((C_loc,),
                                                      jnp.float32)
        p_i = jnp.asarray(ph1.imag)[t_idx] * jnp.ones((C_loc,),
                                                      jnp.float32)
        # FIR tail entering g = downmixed tail of block g-1 at
        # phase(g-1); zero for shard 0 (fresh) -- in_pre is zeroed
        qr = jnp.asarray(ph2.real)[t_idx]
        qi = jnp.asarray(ph2.imag)[t_idx]
        x_t = in_pre.astype(jnp.float32) * inv_scale
        tl_r = x_t * (qr * tr_t - qi * ti_t)
        tl_i = x_t * (qr * ti_t + qi * tr_t)

        ddt = (jnp.bfloat16 if cfg.decim_dtype == "bf16"
               else jnp.float32)
        planes = (p_r, p_i, tl_r, tl_i,
                  jnp.zeros((cfg.cycles, 2, C_loc,
                             cfg.symbols_per_block), ddt))
        pcm_ext = jnp.concatenate([in_blk[None], pcm_local], axis=0)
        cb = (None if decode_block_channels is None
              else min(decode_block_channels, C_loc))
        _, out = prod_rx_batch(
            cfg, planes, pcm_ext, descramble=descramble,
            block_channels=_auto_cb((B_loc + 1) * C_loc, 128),
            decode_block_channels=cb,
            fuse_frontend=fuse_frontend, interpret=interpret)
        # drop the halo block's outputs
        return jax.tree.map(lambda x: x[1:], out)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("time", "ch"),),
        out_specs=P("time", "ch"),
        check_vma=False,
    )

    def wrapped(pcm):
        B, C = pcm.shape[0], pcm.shape[1]
        if B % n_t or B // n_t < 2:
            raise ValueError(
                f"n_blocks ({B}) must be a multiple of mesh['time'] "
                f"({n_t}) with >= 2 blocks per shard")
        if C % n_c:
            raise ValueError(
                f"channels ({C}) not divisible by mesh['ch'] ({n_c})")
        return fn(pcm)

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
