#!/usr/bin/env python
"""Per-stage wall-clock breakdown of the production Pallas RX path.

Times cumulative prefixes of the plane-typed fast path
(modem/rx_production.py prod_rx_stream_pallas):

  frontend            fused_frontend_decim only
  +hunt               ... + _hunt_planes
  +extract            ... + _extract_packet_planes
  +decode (full)      ... + fused_decode  (== the headline bench)

Differences between consecutive rows give per-stage costs; prints a
table in us/block-channel (1880 samples).

CAUTION (tunnel dispatch floor): any stage whose per-iter wall lands
near ~27-32 ms is measuring the tunneled backend's per-dispatch floor,
not the work -- the "empty" probe stage (grid + output DMA only)
measures identically to the full front-end at default batch.  Size
--channels/--blocks so stages of interest exceed ~60 ms, and read
DELTAS between stages, not absolute prefixes.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# Runnable as `python tools/<name>.py` from the repo root: the
# script dir shadows the cwd on sys.path (and PYTHONPATH breaks
# axon plugin discovery -- .claude/skills/verify/SKILL.md).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=4096)
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--stages", type=str, default="")
    ap.add_argument("--batch", action="store_true",
                    help="profile the block-parallel prod_rx_batch "
                         "decomposition instead of the scan path")
    ap.add_argument("--fused", action="store_true",
                    help="profile the fully fused batch path "
                         "(transposed front-end + one hunt/extract/"
                         "decode kernel); stages: frontend, full")
    ap.add_argument("--decode-stages", action="store_true",
                    help="with --fused: time cumulative IN-KERNEL "
                         "prefixes of the hunt+decode kernel (probe "
                         "truncation via decode_pallas stage=): "
                         "frontend, hunt, extract, cfo, derot, "
                         "train, refit, refine, full")
    ap.add_argument("--one-kernel", action="store_true",
                    help="profile IN-KERNEL stage prefixes of the "
                         "one-kernel fused RX (ops/fused_rx.py): fe, "
                         "hunt, extract, cfo, derot, train, refit, "
                         "refine, full")
    ap.add_argument("--fe-block", type=int, default=128)
    ap.add_argument("--decode-block", type=int, default=64)
    ap.add_argument("--frontend-dtype", default=None,
                    choices=[None, "bf16", "f32"],
                    help="override cfg.frontend_dtype (z-buffer/matmul "
                         "precision A/B)")
    ap.add_argument("--decim-dtype", default=None,
                    choices=[None, "f32", "bf16"],
                    help="override cfg.decim_dtype (plane-carry A/B)")
    ap.add_argument("--cfo-dtype", default=None,
                    choices=[None, "f32", "bf16"],
                    help="override cfg.cfo_dtype")
    ap.add_argument("--hunt-dtype", default=None,
                    choices=[None, "bf16", "f32", "int8"],
                    help="override cfg.hunt_dtype")
    ap.add_argument("--ls-gram", default=None,
                    choices=[None, "direct", "sliding"],
                    help="override cfg.ls_gram")
    ap.add_argument("--hunt-norm", default=None,
                    choices=[None, "energy", "espan", "none"],
                    help="override cfg.hunt_norm")
    ap.add_argument("--refit-symbols", type=int, default=None,
                    help="override cfg.ls_refit_symbols")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from singlecarrier_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()

    from singlecarrier_tpu.config import DEFAULT_CONFIG
    cfg = DEFAULT_CONFIG
    if args.frontend_dtype:
        cfg = cfg.replace(frontend_dtype=args.frontend_dtype)
    if args.decim_dtype:
        cfg = cfg.replace(decim_dtype=args.decim_dtype)
    if args.hunt_dtype:
        cfg = cfg.replace(hunt_dtype=args.hunt_dtype)
    if args.cfo_dtype:
        cfg = cfg.replace(cfo_dtype=args.cfo_dtype)
    if args.ls_gram:
        cfg = cfg.replace(ls_gram=args.ls_gram)
    if args.hunt_norm:
        cfg = cfg.replace(hunt_norm=args.hunt_norm)
    if args.refit_symbols is not None:
        cfg = cfg.replace(ls_refit_symbols=args.refit_symbols)
    from singlecarrier_tpu.modem import prod_rx_init
    from singlecarrier_tpu.modem.rx_production import (
        _decode_out, _extract_packet_planes, _hunt_planes)
    from singlecarrier_tpu.ops.decode_pallas import fused_decode
    from singlecarrier_tpu.ops.frontend_pallas import fused_frontend_decim

    C, B = args.channels, args.blocks
    n_sym = cfg.symbols_per_block

    def make_batch_step(stage: str):
        import numpy as _np
        from singlecarrier_tpu.dsp.mixer import mixer_table

        n = cfg.frame_size
        halo = cfg.ntaps - 1
        inv_scale = 1.0 / cfg.tx_amplitude
        table = mixer_table(-cfg.center, cfg.fs, n)
        w = -2.0 * _np.pi * cfg.center / cfg.fs
        advs = _np.exp(1j * w * n * _np.arange(B + 1)).astype(
            _np.complex64)

        @jax.jit
        def step(st0, pcm):
            p0r, p0i, t0r, t0i, dprev0 = st0
            ar = jnp.asarray(advs.real[:B, None])
            ai = jnp.asarray(advs.imag[:B, None])
            ph_r = p0r[None] * ar - p0i[None] * ai
            ph_i = p0r[None] * ai + p0i[None] * ar
            x_t = pcm[:, :, n - halo:].astype(jnp.float32) * inv_scale
            tr_t = jnp.asarray(table.real[n - halo:])
            ti_t = jnp.asarray(table.imag[n - halo:])
            tl_r = x_t * (ph_r[..., None] * tr_t - ph_i[..., None] * ti_t)
            tl_i = x_t * (ph_r[..., None] * ti_t + ph_i[..., None] * tr_t)
            tails_r = jnp.concatenate([t0r[None], tl_r[:-1]], 0)
            tails_i = jnp.concatenate([t0i[None], tl_i[:-1]], 0)
            N = B * C
            dcur, _, _, _, _ = fused_frontend_decim(
                cfg, pcm.reshape(N, n), ph_r.reshape(N), ph_i.reshape(N),
                tails_r.reshape(N, halo), tails_i.reshape(N, halo),
                block_channels=args.fe_block)
            chk = dcur[:, 0, 0, 0].sum()
            decim = dcur.reshape(B, C, cfg.cycles, 2, n_sym)
            if stage != "frontend":
                dprev = jnp.concatenate([dprev0[None], decim[:-1]], 0)
                windows = jnp.concatenate([dprev, decim], -1).reshape(
                    N, cfg.cycles, 2, 2 * n_sym)
                lag, phase_idx, peak = _hunt_planes(cfg, windows)
                chk = chk + peak.sum() + lag.sum()
            if stage in ("extract", "full"):
                pkt = _extract_packet_planes(cfg, windows, lag, phase_idx)
                chk = chk + pkt[:, 0, 0].sum()
            if stage == "full":
                dec = fused_decode(cfg, pkt[:, 0], pkt[:, 1], peak,
                                   descramble=True,
                                   block_channels=min(64, N))
                out = _decode_out(cfg, dec, lag, phase_idx, peak)
                chk = chk + (out.valid.sum().astype(jnp.float32)
                             + out.eq_error.sum())
            return st0, chk
        return step

    def make_fused_step(stage: str):
        """Fully fused batch decomposition (prod_rx_batch fuse_hunt):
        transposed front-end, then ONE hunt+extract+decode kernel."""
        import numpy as _np
        from singlecarrier_tpu.dsp.mixer import mixer_table
        from singlecarrier_tpu.ops.decode_pallas import \
            fused_hunt_decode_decim

        n = cfg.frame_size
        halo = cfg.ntaps - 1
        inv_scale = 1.0 / cfg.tx_amplitude
        table = mixer_table(-cfg.center, cfg.fs, n)
        w = -2.0 * _np.pi * cfg.center / cfg.fs
        advs = _np.exp(1j * w * n * _np.arange(B + 1)).astype(
            _np.complex64)
        cyc = cfg.cycles

        decode_stages = ("hunt", "extract", "cfo", "derot", "train",
                         "refit", "refine", "full")

        if stage == "bench":
            # the REAL prod_rx_batch step incl. all XLA glue the other
            # stages skip (decim_prev state transposes, _decode_out,
            # outs materialization).  CAVEAT: the step returns only
            # scalar checksums, so XLA DCEs the outs/state
            # materialization this stage was meant to time -- measure
            # glue as (bench.py wall) - (profiler "full") at the same
            # geometry instead (ROADMAP round-3 notes)
            from singlecarrier_tpu.modem import prod_rx_init
            from singlecarrier_tpu.modem.rx_production import \
                prod_rx_batch

            @jax.jit
            def bench_step(st0, pcm):
                # state built INSIDE jit: a captured device-resident
                # complex state becomes a closure constant the lowering
                # must fetch -- complex64 cannot cross device->host on
                # this backend (ROADMAP Mosaic/axon lessons)
                state0 = prod_rx_init(cfg, (C,))
                st, out = prod_rx_batch(
                    cfg, state0, pcm, block_channels=args.fe_block,
                    decode_block_channels=args.decode_block)
                return st0, (out.valid.sum().astype(jnp.float32)
                             + out.eq_error.sum())
            return bench_step

        @jax.jit
        def step(st0, pcm):
            p0r, p0i, t0r, t0i, dprev0 = st0
            ar = jnp.asarray(advs.real[:B, None])
            ai = jnp.asarray(advs.imag[:B, None])
            ph_r = p0r[None] * ar - p0i[None] * ai
            ph_i = p0r[None] * ai + p0i[None] * ar
            x_t = pcm[:, :, n - halo:].astype(jnp.float32) * inv_scale
            tr_t = jnp.asarray(table.real[n - halo:])
            ti_t = jnp.asarray(table.imag[n - halo:])
            tl_r = x_t * (ph_r[..., None] * tr_t - ph_i[..., None] * ti_t)
            tl_i = x_t * (ph_r[..., None] * ti_t + ph_i[..., None] * tr_t)
            tails_r = jnp.concatenate([t0r[None], tl_r[:-1]], 0)
            tails_i = jnp.concatenate([t0i[None], tl_i[:-1]], 0)
            N = B * C
            dcur_t, _, _, _, _ = fused_frontend_decim(
                cfg, pcm.reshape(N, n), ph_r.reshape(N), ph_i.reshape(N),
                tails_r.reshape(N, halo), tails_i.reshape(N, halo),
                block_channels=args.fe_block, transposed=True,
                debug_mode=(stage if stage in
                            ("mixer", "store_only", "const_table")
                            else "none"))
            # contiguous-plane reduce: a strided [N]-column checksum
            # (dcur_t[0,0,:,0]) costs more than the kernel it times
            chk = dcur_t[0, 0].sum()
            if stage in decode_stages:
                dprev0_t = jnp.zeros((cyc, 2, C, n_sym), jnp.float32)
                dec = fused_hunt_decode_decim(
                    cfg, dprev0_t, dcur_t, channels=C, descramble=True,
                    block_channels=min(args.decode_block, N, C),
                    stage=stage)
                chk = (chk + dec["eq_error"].sum()
                       + dec["lag"].sum().astype(jnp.float32)
                       + dec["matches"].sum().astype(jnp.float32))
            return st0, chk
        return step

    def make_onekernel_step(stage: str):
        from singlecarrier_tpu.ops.fused_rx import fused_rx_block
        cyc, n_sym_ = cfg.cycles, cfg.symbols_per_block
        ddt = (jnp.bfloat16 if cfg.decim_dtype == "bf16"
               else jnp.float32)

        @jax.jit
        def step(st0, pcm):
            p0r, p0i, t0r, t0i, _ = st0
            dprev0 = jnp.zeros((cyc, 2, C, n_sym_), ddt)
            dec, dlast, fin = fused_rx_block(
                cfg, pcm, p0r, p0i, t0r, t0i, dprev0,
                block_channels=args.decode_block, stage=stage)
            chk = (dec["eq_error"].sum()
                   + dec["matches"].sum().astype(jnp.float32)
                   + dec["dibits"][:, :2].sum()
                   + dlast[0, 0, :, 0].astype(jnp.float32).sum())
            return st0, chk
        return step

    def make_step(stage: str):
        def body(st, pcm):
            pr, pi_, tr, ti, dprev = st
            dcur, ntr, nti, npr, npi = fused_frontend_decim(
                cfg, pcm, pr, pi_, tr, ti, block_channels=256)
            chk = dcur[:, 0, 0, 0].sum()
            if stage != "frontend":
                windows = jnp.concatenate([dprev, dcur], axis=-1)
                lag, phase_idx, peak = _hunt_planes(cfg, windows)
                chk = chk + peak.sum() + lag.sum()
            if stage in ("extract", "full"):
                pkt = _extract_packet_planes(cfg, windows, lag, phase_idx)
                chk = chk + pkt[:, 0, 0].sum()
            if stage == "full":
                dec = fused_decode(cfg, pkt[:, 0], pkt[:, 1], peak,
                                   descramble=True,
                                   block_channels=min(64, C))
                out = _decode_out(cfg, dec, lag, phase_idx, peak)
                chk = chk + (out.valid.sum().astype(jnp.float32)
                             + out.eq_error.sum())
            return (npr, npi, ntr, nti, dcur), chk

        @jax.jit
        def step(st0, pcm):
            st, chks = lax.scan(body, st0, pcm)
            return st, chks.sum()
        return step

    @jax.jit
    def synth(key):
        return jax.random.randint(
            key, (B, C, cfg.frame_size), -16384, 16384, jnp.int16)

    state = prod_rx_init(cfg, (C,))
    st0 = (state.phase.real, state.phase.imag,
           state.fir_tail.real, state.fir_tail.imag,
           jnp.stack([state.decim_prev.real, state.decim_prev.imag],
                     axis=2))
    pcm = synth(jax.random.PRNGKey(0))

    stages = (args.stages.split(",") if args.stages
              else (["fe", "hunt", "extract", "cfo", "derot", "train",
                     "refit", "refine", "full"] if args.one_kernel
                    else ["frontend", "hunt", "extract", "cfo",
                          "derot", "train", "refit", "refine", "full"]
                    if (args.fused and args.decode_stages)
                    else ["frontend", "full"] if args.fused
                    else ["frontend", "hunt", "extract", "full"]))
    results = {}
    for stage in stages:
        step = (make_onekernel_step(stage) if args.one_kernel
                else make_fused_step(stage) if args.fused
                else make_batch_step(stage) if args.batch
                else make_step(stage))
        st = st0
        for _ in range(args.warmup):
            st, chk = step(st, pcm)
            float(chk)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, chk = step(st, pcm)
            float(chk)
        dt = (time.perf_counter() - t0) / args.iters
        results[stage] = dt

    samples = C * B * cfg.frame_size
    print(f"{'stage':>10} {'wall_ms':>9} {'us/blk-ch':>10} "
          f"{'delta_us':>9} {'GS/s':>7}")
    prev = 0.0
    rows = {}
    for stage in stages:
        dt = results[stage]
        us = dt / (C * B) * 1e6
        rows[stage] = us
        print(f"{stage:>10} {dt*1e3:9.2f} {us:10.3f} "
              f"{us - prev:9.3f} {samples/dt/1e9:7.3f}")
        prev = us
    print(json.dumps({"us_per_block_channel": rows,
                      "channels": C, "blocks": B}))


if __name__ == "__main__":
    main()
