#!/usr/bin/env python
"""Headline benchmark: batched production demod throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the north-star real-time bar (BASELINE.md) is 1M concurrent
8 kHz channels on a v5e-8 = 1e9 complex samples/s per chip.
``vs_baseline`` is measured samples/s per chip divided by that bar;
>= 1.0 means this chip sustains its share of the 1M-channel target in
real time.

The input stream is synthesized ON DEVICE (jax.random) so host->device
transfer is excluded (the axon tunnel is not representative of
production ingest; the native IO engine covers that path separately).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


REALTIME_SAMPLES_PER_CHIP = 1.0e9  # 1M ch x 8 kHz / 8 chips


def main() -> None:
    ap = argparse.ArgumentParser()
    # Large batch per dispatch: the tunneled dev environment has a
    # ~30 ms per-dispatch floor that must be amortized to measure the
    # device (production deployments dispatch locally/async).
    ap.add_argument("--channels", type=int, default=None,
                    help="default: 8192 (production; with 128 blocks "
                         "= the 1M block-channel dispatch in its best "
                         "measured geometry -- the deep time-walk "
                         "amortizes the per-channel-block ring seed "
                         "and state flush, SCALING.md), 16384 "
                         "(production-scan), 1024 (faithful modes)")
    ap.add_argument("--blocks", type=int, default=None,
                    help="default: 128 (production), 8 otherwise")
    ap.add_argument("--iters", type=int, default=16,
                    help="timed chained steps (longer chain amortizes "
                         "the single end-sync further; steady-state "
                         "streaming model)")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--fe-block", type=int, default=128,
                    help="front-end kernel channel block")
    ap.add_argument("--decode-block", type=int, default=None,
                    help="decode kernel channel block (default: the "
                         "library's per-path sweet spot -- 128 for "
                         "the one-kernel fused RX, 64 for the "
                         "standalone decode kernel)")
    ap.add_argument("--segs-per-chunk", type=int, default=2,
                    help="hunt-matmul segments per column chunk")
    ap.add_argument("--decim-dtype", default=None,
                    choices=[None, "f32", "bf16"],
                    help="override cfg.decim_dtype (bf16 halves the "
                         "decim-plane HBM traffic)")
    ap.add_argument("--hunt-dtype", default=None,
                    choices=[None, "bf16", "f32", "int8"],
                    help="override cfg.hunt_dtype (int8 runs the "
                         "dominant correlation matmul at the MXU's "
                         "doubled int8 rate)")
    ap.add_argument("--cfo-dtype", default=None,
                    choices=[None, "f32", "bf16"],
                    help="override cfg.cfo_dtype (bf16 CFO-DFT "
                         "matmuls at full MXU rate; the XLA oracle "
                         "already runs its DFT in bf16)")
    ap.add_argument("--ls-gram", default=None,
                    choices=[None, "direct", "sliding"],
                    help="override cfg.ls_gram (decode-kernel Gram "
                         "assembly A/B)")
    ap.add_argument("--hunt-scheme", default=None,
                    choices=[None, "chunk", "lagtile"],
                    help="override cfg.hunt_scheme (hunt matmul "
                         "schedule A/B)")
    ap.add_argument("--mixer-fold", type=int, default=None,
                    choices=[0, 1],
                    help="override cfg.mixer_fold (complex-tap folded "
                         "front-end A/B)")
    ap.add_argument("--ls-bvec", default=None,
                    choices=[None, "reduce", "matmul"],
                    help="override cfg.ls_bvec (train b-vector as one "
                         "MXU matmul vs 2L product+reduce chains)")
    ap.add_argument("--corr-segments", type=int, default=None,
                    help="override cfg.corr_segments (CFO-tolerance "
                         "knob: more/shorter segments widen the hunt "
                         "band matrix -- throughput cost of the "
                         "DETECTION.md segment sweep)")
    ap.add_argument("--hunt-norm", default=None,
                    choices=[None, "energy", "espan", "none"],
                    help="override cfg.hunt_norm (energy-normalized "
                         "hunt argmax; 'none' = the round<=4 "
                         "raw-power statistic, for the A/B cost)")
    ap.add_argument("--cfo-nfft", type=int, default=None,
                    help="override cfg.cfo_nfft (CFO-search DFT "
                         "size; 512 default kills the parabolic-"
                         "interpolation bias, config.py)")
    ap.add_argument("--refit-symbols", type=int, default=None,
                    help="override cfg.ls_refit_symbols (refit-window "
                         "throughput knob; 0 = full data section)")
    ap.add_argument("--refit-iters", type=int, default=None,
                    help="override cfg.ls_refit_iters (decode-tail "
                         "cost/quality tradeoff measurement)")
    ap.add_argument("--refine-iters", type=int, default=None,
                    help="override cfg.phase_refine_iters")
    ap.add_argument("--fuse-frontend", type=int, default=None,
                    choices=[0, 1],
                    help="ONE-kernel RX (ops/fused_rx.py): front-end "
                         "+ hunt + decode fused, decim ring in VMEM "
                         "(production mode only)")
    ap.add_argument("--synth-in-step", action="store_true",
                    help="synthesize the noise pcm INSIDE the timed "
                         "step (production mode): the pcm never "
                         "exists as a jit operand, so the XLA "
                         "memory-space copy that feeds the Pallas "
                         "custom call (7.5 GB duplicated at the 2M "
                         "block-channel point -- SCALING.md OOM row) "
                         "is never materialized.  Adds the RNG cost "
                         "(~1-3%%) to the timed region in exchange")
    ap.add_argument("--real-stream", action="store_true",
                    help="synthesize REAL modulated packet streams "
                         "(every channel detecting) instead of noise; "
                         "the dataflow is masked so throughput should "
                         "match the noise headline within run noise -- "
                         "this flag proves it (VERDICT r2 weak #5)")
    ap.add_argument("--mode",
                    choices=["production", "production-scan", "faithful",
                             "faithful-blocked"],
                    default="production",
                    help="production = block-parallel Pallas-fused RX "
                         "(headline; no scan -- closed-form carries); "
                         "production-scan = streaming scan variant; "
                         "faithful = reference-exact Kalman-scan RX "
                         "(completeness datapoint); faithful-blocked = "
                         "blocked-scan Kalman restructuring (B-symbol "
                         "frozen blocks, adaptive/blocked_rls.py)")
    ap.add_argument("--kalman-block", type=int, default=32,
                    help="faithful-blocked block size B")
    ap.add_argument("--superstep", type=int, default=0,
                    help="production-scan mode: scan over K-block "
                         "super-steps (batch path inside; latency K "
                         "blocks, batch-mode throughput) instead of "
                         "the per-block streaming scan")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from singlecarrier_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()

    from singlecarrier_tpu.config import DEFAULT_CONFIG as cfg
    if args.channels is None:
        args.channels = {"production": 8192,
                         "production-scan": 16384,
                         "faithful": 1024,
                         "faithful-blocked": 1024}[args.mode]
    if args.blocks is None:
        args.blocks = 128 if args.mode == "production" else 8
    if args.fuse_frontend is None and (
            args.mode == "production"
            or (args.mode == "production-scan" and args.superstep)):
        # headline path: the ONE-kernel fused RX (ops/fused_rx.py) --
        # zero decim-plane HBM traffic; unlocks the 1M block-channel
        # dispatch (SCALING.md round 4).  The K-block super-step runs
        # the same batch path inside its scan, so it defaults fused
        # too (measured: 5.95 GS/s at K=8 = full batch throughput at
        # the same geometry, vs 5.66 with the two-kernel path inside)
        args.fuse_frontend = 1
    if args.fuse_frontend is None:
        args.fuse_frontend = 0
    if args.decim_dtype is None and args.mode in ("production",
                                                  "production-scan"):
        # headline operating point: bf16 decim carry halves the plane
        # footprint (523k block-channels/dispatch fits HBM; SCALING.md)
        # -- decode parity pinned on-chip in PARITY_TPU_BF16.json
        args.decim_dtype = "bf16"
    if args.hunt_dtype is None and args.mode in ("production",
                                                 "production-scan"):
        # int8 hunt: the dominant correlation matmul at the MXU's
        # doubled int8 rate (3.64 -> 4.18 GS/s).  Quality gate:
        # PARITY_TPU_INT8.json (0 payload bit diffs, all true packets
        # detected by both paths; one gate-marginal noise block may
        # flip -- config.py hunt_dtype docstring)
        args.hunt_dtype = "int8"
    if args.refit_symbols is None and args.mode in ("production",
                                                    "production-scan"):
        # refit window 128 (of 248): the decision-directed refit's
        # Gram/b-vector/apply wide ops scale with the window.  Quality
        # gates, all measured round 5: AWGN BER equal within CIs at
        # 2/4/6 dB (317k bits/point, /tmp-queue3 -> BER_PALLAS rows),
        # 35 Hz CFO edge equal, harsh-echo (1.4 sym, -6 dB) BER equal
        # (3.3e-4 vs 3.4e-4 at 10 dB -- 128 full-power symbols carry
        # the same off-tap evidence as the 128-chip preamble).  64
        # measures +6% throughput but 1.7x the echo errors -- knob
        # left to deployments (config.ls_refit_symbols).
        args.refit_symbols = 128
    if args.decim_dtype:
        cfg = cfg.replace(decim_dtype=args.decim_dtype)
    if args.hunt_dtype:
        cfg = cfg.replace(hunt_dtype=args.hunt_dtype)
    if args.cfo_dtype:
        cfg = cfg.replace(cfo_dtype=args.cfo_dtype)
    if args.ls_gram:
        cfg = cfg.replace(ls_gram=args.ls_gram)
    if args.hunt_scheme:
        cfg = cfg.replace(hunt_scheme=args.hunt_scheme)
    if args.mixer_fold is not None:
        cfg = cfg.replace(mixer_fold=bool(args.mixer_fold))
    if args.ls_bvec:
        cfg = cfg.replace(ls_bvec=args.ls_bvec)
    if args.corr_segments:
        cfg = cfg.replace(corr_segments=args.corr_segments)
    if args.hunt_norm:
        cfg = cfg.replace(hunt_norm=args.hunt_norm)
    if args.cfo_nfft is not None:
        cfg = cfg.replace(cfo_nfft=args.cfo_nfft)
    if args.refit_iters is not None:
        cfg = cfg.replace(ls_refit_iters=args.refit_iters)
    if args.refit_symbols is not None:
        cfg = cfg.replace(ls_refit_symbols=args.refit_symbols)
    if args.refine_iters is not None:
        cfg = cfg.replace(phase_refine_iters=args.refine_iters)

    C, B = args.channels, args.blocks

    if args.real_stream:
        from singlecarrier_tpu.modem import tx_stream

        # Real modulated packets; a packet every packet_size samples so
        # nearly every block's hunt window contains a preamble.  TX cost
        # is bounded by synthesizing `uniq` distinct channels and tiling
        # (demod compute is data-independent masked dataflow; detection
        # statistics are what this datapoint exercises).
        uniq = min(C, 256)
        n_pkts = max(1, (B * cfg.frame_size) // cfg.packet_size)

        @jax.jit
        def synth(key):
            bits = jax.random.randint(
                key, (uniq, n_pkts, cfg.ns, cfg.data_symbols * 2),
                0, 2, jnp.uint8)
            pcm = tx_stream(cfg, bits, flush_gap=True,
                            scramble=True)              # [uniq, S]
            need = B * cfg.frame_size
            pad = max(0, need - pcm.shape[-1])
            x = jnp.pad(pcm, ((0, 0), (0, pad)))[:, :need]
            x = jnp.tile(x, (C // uniq, 1))             # [C, B*n]
            x = x.reshape(C, B, cfg.frame_size)
            return jnp.swapaxes(x, 0, 1).astype(jnp.int16).reshape(
                B * C, cfg.frame_size)
    else:
        from jax import lax

        def _synth_noise(key):
            # [blocks, channels, frame_size] noise stream, synthesized
            # on device.  random.bits + bitcast, one time-block at a
            # time (lax.map): randint materializes u32 intermediates
            # at 4x the int16 stream, which OOMed the >=1M
            # block-channel dispatches the fused kernel itself fits.
            # >>1 keeps the +-16384 amplitude convention.
            def one(k):
                u = jax.random.bits(k, (C, cfg.frame_size // 2),
                                    jnp.uint32)
                x = lax.bitcast_convert_type(u, jnp.int16).reshape(
                    C, cfg.frame_size)
                return (x >> 1).astype(jnp.int16)
            # emitted FLAT [B*C, frame_size]: the steps bitcast it back
            # to [B, C, n]; a [B, C, n]-shaped jit argument picked up a
            # tiled layout whose flattening inside the step was a
            # full 7.5 GB copy at the 2M-block-channel point
            return lax.map(one, jax.random.split(key, B)).reshape(
                B * C, cfg.frame_size)

        synth = jax.jit(_synth_noise)

    if args.mode in ("faithful", "faithful-blocked"):
        from singlecarrier_tpu.modem.rx import rx_init, rx_stream
        kb = args.kalman_block if args.mode == "faithful-blocked" else 0

        @jax.jit
        def step(state, pcm):
            # [C] channel axis via vmap; scan over blocks inside
            pcm = pcm.reshape(B, C, cfg.frame_size)
            st, out = jax.vmap(
                lambda s, p: rx_stream(cfg, s, p, blocked=kb)
            )(state, jnp.swapaxes(pcm, 0, 1))
            return st, (out.valid.sum().astype(jnp.float32)
                        + out.eof_cost.sum(),
                        out.valid.sum().astype(jnp.float32))

        state = rx_init(cfg, (C,))
    elif args.mode == "production-scan":
        from singlecarrier_tpu.modem import (prod_rx_init,
                                             prod_rx_init_planes)
        from singlecarrier_tpu.modem.rx_production import (
            prod_rx_stream_pallas, prod_rx_stream_superstep)

        if args.superstep:
            @jax.jit
            def step(state, pcm):
                st, out = prod_rx_stream_superstep(
                    cfg, state, pcm.reshape(B, C, cfg.frame_size),
                    superstep=args.superstep,
                    fuse_frontend=bool(args.fuse_frontend))
                return st, (out.valid.sum().astype(jnp.float32)
                            + out.eq_error.sum(),
                            out.valid.sum().astype(jnp.float32))

            state = prod_rx_init_planes(cfg, C)
        else:
            @jax.jit
            def step(state, pcm):
                st, out = prod_rx_stream_pallas(
                    cfg, state, pcm.reshape(B, C, cfg.frame_size))
                # scalar checksum forces real completion through the
                # tunnel
                return st, (out.valid.sum().astype(jnp.float32)
                            + out.eq_error.sum(),
                            out.valid.sum().astype(jnp.float32))

            state = prod_rx_init(cfg, (C,))
    else:
        from singlecarrier_tpu.modem import prod_rx_init_planes
        from singlecarrier_tpu.modem.rx_production import prod_rx_batch

        def _demod(state, pcm):
            # plane-typed state: carried in the fused kernels' exact
            # layout, so no complex<->plane conversion or GB-scale
            # transpose appears in the dispatch (rx_production.
            # prod_rx_init_planes)
            st, out = prod_rx_batch(
                cfg, state, pcm.reshape(B, C, cfg.frame_size),
                block_channels=args.fe_block,
                decode_block_channels=args.decode_block,
                segs_per_chunk=args.segs_per_chunk,
                fuse_frontend=bool(args.fuse_frontend))
            return st, (out.valid.sum().astype(jnp.float32)
                        + out.eq_error.sum(),
                        out.valid.sum().astype(jnp.float32))

        # state is DONATED: the chained carry aliases in-place instead
        # of holding input+output plane buffers live simultaneously
        # (3.9 GB at the 2M block-channel point; SCALING.md)
        if args.synth_in_step and not args.real_stream:
            # pcm is generated INSIDE the dispatch: the operand (and
            # the XLA memory-space copy feeding the custom call) never
            # exists.  MEASURED NULL for throughput at 1M (4.63 vs
            # 6.00 GS/s -- the in-step threefry RNG costs ~97 ms/iter,
            # the operand copy it removes costs nothing there); it is
            # the capacity tool for the 2M dispatch, where a 7.5 GB
            # pcm operand + its copy cannot fit
            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(state, k):
                return _demod(state, _synth_noise(k))
        else:
            step = jax.jit(_demod, donate_argnums=(0,))

        state = prod_rx_init_planes(cfg, C)

    key = jax.random.PRNGKey(0)
    if args.synth_in_step and args.mode == "production" \
            and not args.real_stream:
        pcm = key                       # the step synthesizes from it
    else:
        pcm = synth(key)

    # warmup / compile (float() fetch = hard sync; complex leaves must
    # never be fetched on this backend -- utils/compat.py)
    for _ in range(args.warmup):
        state, (chk, nv) = step(state, pcm)
        float(chk)

    # Timed iterations CHAIN asynchronously (each step consumes the
    # previous state, so the device pipeline stays full) with ONE hard
    # sync at the end -- the steady-state streaming model.  A per-iter
    # fetch would serialize a ~30 ms tunnel round trip into every
    # dispatch (~15% of wall at 5 GS/s), measuring the dev harness,
    # not the chip.
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, (chk, nv) = step(state, pcm)
    float(chk)                              # hard sync (scalar fetch)
    dt = time.perf_counter() - t0
    detected = int(float(nv))

    samples = C * B * cfg.frame_size * args.iters
    sps = samples / dt
    channels_realtime = sps / cfg.fs

    metric = {
        "production": "demod_samples_per_sec_per_chip",
        "production-scan": "scan_demod_samples_per_sec_per_chip",
        "faithful": "faithful_demod_samples_per_sec_per_chip",
        "faithful-blocked":
            "faithful_blocked_demod_samples_per_sec_per_chip",
    }[args.mode]
    print(json.dumps({
        "metric": metric,
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / REALTIME_SAMPLES_PER_CHIP, 4),
        "detail": {
            "channels": C,
            "blocks_per_iter": B,
            "iters": args.iters,
            "wall_s": round(dt, 4),
            "equivalent_realtime_8khz_channels": int(channels_realtime),
            "device": str(jax.devices()[0]),
            "stream": "real_packets" if args.real_stream else "noise",
            "detected_blocks_last_iter": detected,
        },
    }))


if __name__ == "__main__":
    main()
