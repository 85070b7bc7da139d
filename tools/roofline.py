#!/usr/bin/env python
"""Per-kernel roofline measurement (BASELINE.md: "RRC FIR + FFT kernels
at speed-of-light per chip"; VERDICT round-1 item 3).

Times each hot kernel IN ISOLATION on the real chip (inputs pre-staged
on device, one jit per kernel, many invocations amortizing the tunnel
dispatch floor), converts to achieved FLOP/s and bytes/s, and compares
against the chip's peaks to name each kernel's bottleneck:

  * fused front-end (mixer + RRC-decimation matmul, Pallas)
  * preamble hunt (banded segment-correlation matmul, XLA -> MXU)
  * fused extract+decode (barrel shift + CFO DFT + LS fit, Pallas)

Prints one row per kernel + a JSON line; writes ROOFLINE.md.
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

# v5e (TPU v5 lite) per-chip peaks
PEAK_BF16 = 197e12       # FLOP/s (MXU)
PEAK_F32 = 49e12         # FLOP/s (MXU f32)
PEAK_HBM = 819e9         # bytes/s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=65536,
                    help="batch rows per dispatch (block-channels)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--out", default="ROOFLINE.md")
    ap.add_argument("--operating-point", action="store_true",
                    help="use the bench.py headline config (decim "
                         "bf16 + int8 hunt) instead of the "
                         "bit-conservative defaults")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from singlecarrier_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()

    from singlecarrier_tpu.config import DEFAULT_CONFIG as cfg
    if args.operating_point:
        cfg = cfg.replace(decim_dtype="bf16", hunt_dtype="int8")
    from singlecarrier_tpu.modem.rx_production import (
        _hunt_planes, _segment_band_matrix)
    from singlecarrier_tpu.ops.decode_pallas import fused_decode_extract
    from singlecarrier_tpu.ops.frontend_pallas import fused_frontend_decim

    N = args.channels
    n = cfg.frame_size
    halo = cfg.ntaps - 1
    cyc = cfg.cycles
    n_sym = cfg.symbols_per_block
    key = jax.random.PRNGKey(0)

    def timeit(fn, *xs):
        # fn must return a SCALAR: float() is the only hard sync on the
        # tunneled backend (block_until_ready returns early there).
        # Timed iterations enqueue WITHOUT per-iter fetches (one sync
        # at the end): a per-iter float() bills a ~30 ms tunnel round
        # trip into every dispatch (bench.py timing note).
        for _ in range(args.warmup):
            float(fn(*xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*xs)
        float(r)
        return (time.perf_counter() - t0) / args.iters

    rows = []

    # ---- fused front-end ----
    pcm = jax.random.randint(key, (N, n), -16384, 16384, jnp.int16)
    ph_r = jnp.ones((N,), jnp.float32)
    ph_i = jnp.zeros((N,), jnp.float32)
    tails = jnp.zeros((N, halo), jnp.float32)

    # Chained-invocation delta: a single front-end dispatch lands under
    # the tunnel's ~30 ms dispatch floor (an EMPTY kernel measures the
    # same), so time K chained invocations vs 1 and take the slope.
    def fe_chain(k):
        @jax.jit
        def fe(pcm, ph_r, ph_i, t1, t2):
            acc = 0.0
            pr, pi_ = ph_r, ph_i
            for _ in range(k):
                d, _, _, pr, pi_ = fused_frontend_decim(
                    cfg, pcm, pr, pi_, t1, t2, block_channels=128)
                acc = acc + d[:, 0, 0, :2].sum()
            return acc
        return fe

    KCH = 5
    t1 = timeit(fe_chain(1), pcm, ph_r, ph_i, tails, tails)
    tk = timeit(fe_chain(KCH), pcm, ph_r, ph_i, tails, tails)
    dt = max((tk - t1) / (KCH - 1), 1e-9)
    chunk = 128
    nchunk = -(-n_sym // chunk)
    klen = cyc * (chunk - 1) + cfg.ntaps
    flops_ch = cyc * 2 * nchunk * klen * chunk * 2      # matmul only
    mixer_ch = 8 * n                                    # VPU downmix
    bytes_ch = n * 2 + cyc * 2 * n_sym * 4              # pcm in + decim out
    rows.append({
        "kernel": "fused_frontend_decim (mixer+RRC+decimate)",
        "us_per_block_channel": dt / N * 1e6,
        "gflops": (flops_ch + mixer_ch) * N / dt / 1e9,
        "pct_mxu_bf16": flops_ch * N / dt / PEAK_BF16 * 100,
        "gbytes_per_s": bytes_ch * N / dt / 1e9,
        "pct_hbm": bytes_ch * N / dt / PEAK_HBM * 100,
    })

    # ---- hunt matmul ----
    windows = jax.random.normal(key, (N, cyc, 2, 2 * n_sym), jnp.float32)

    @jax.jit
    def hunt(w):
        lag, phase_idx, peak = _hunt_planes(cfg, w)
        return peak.sum() + lag.sum()

    dt = timeit(hunt, windows)
    win = n_sym + cfg.preamble_length - 1
    flops_ch = cyc * 2 * win * n_sym * cfg.corr_segments * 2
    bytes_ch = cyc * 2 * win * 4 + cyc * n_sym * 4
    rows.append({
        "kernel": "preamble hunt (banded bf16 matmul + argmax)",
        "us_per_block_channel": dt / N * 1e6,
        "gflops": flops_ch * N / dt / 1e9,
        "pct_mxu_bf16": flops_ch * N / dt / PEAK_BF16 * 100,
        "gbytes_per_s": bytes_ch * N / dt / 1e9,
        "pct_hbm": bytes_ch * N / dt / PEAK_HBM * 100,
    })

    # ---- fused extract + decode ----
    off = cfg.eq_length // 2
    wp = -(-max((n_sym - 1) + cfg.pkt_window, off + 2 * n_sym)
           // 128) * 128
    wfull = jax.random.normal(key, (N, cyc, 2, wp), jnp.float32) * 0.1
    lag = jax.random.randint(key, (N,), 0, n_sym, jnp.int32)
    phs = jax.random.randint(key, (N,), 0, cyc, jnp.int32)
    peak = jnp.ones((N,), jnp.float32) * 1e9

    @jax.jit
    def dec(w, lag, phs, peak):
        d = fused_decode_extract(cfg, w, lag, phs, peak,
                                 block_channels=min(64, N))
        return d["eq_error"].sum()

    dt = timeit(dec, wfull, lag, phs, peak)
    P, D, nfft = cfg.preamble_length, cfg.frame_symbols, cfg.cfo_nfft
    flops_ch = 4 * P * nfft * 2                          # DFT matmuls
    bytes_ch = cyc * 2 * wp * 4 + 256 * 4                # windows in + out
    rows.append({
        "kernel": "fused_decode_extract (shift+CFO+LS+decode)",
        "us_per_block_channel": dt / N * 1e6,
        "gflops": flops_ch * N / dt / 1e9,
        "pct_mxu_bf16": flops_ch * N / dt / PEAK_F32 * 100,
        "gbytes_per_s": bytes_ch * N / dt / 1e9,
        "pct_hbm": bytes_ch * N / dt / PEAK_HBM * 100,
    })

    # ---- fused hunt + extract + decode (one kernel) ----
    from singlecarrier_tpu.ops.decode_pallas import fused_hunt_decode_decim
    wt = jax.random.normal(key, (cyc, 2, 2 * N, n_sym), jnp.float32) * 0.1

    @jax.jit
    def hdec(w):
        d = fused_hunt_decode_decim(cfg, w[:, :, :N], w[:, :, N:],
                                    channels=N,
                                    block_channels=min(64, N))
        return d["eq_error"].sum() + d["lag"].sum().astype(jnp.float32)

    dt = timeit(hdec, wt)
    n_lags_pad = -(-n_sym // 128) * 128
    klen = off + n_sym + cfg.preamble_length - 1
    hunt_flops = cyc * 2 * klen * (cfg.corr_segments * n_lags_pad) * 2
    dft_flops = 4 * cfg.preamble_length * cfg.cfo_nfft * 2
    flops_ch = hunt_flops + dft_flops
    bytes_ch = cyc * 2 * 2 * n_sym * 4 + 384 * 4        # prev+cur in + out
    rows.append({
        "kernel": "fused_hunt_decode_decim (hunt+shift+CFO+LS+decode)",
        "us_per_block_channel": dt / N * 1e6,
        "gflops": flops_ch * N / dt / 1e9,
        "pct_mxu_bf16": hunt_flops * N / dt / PEAK_BF16 * 100,
        "gbytes_per_s": bytes_ch * N / dt / 1e9,
        "pct_hbm": bytes_ch * N / dt / PEAK_HBM * 100,
    })

    def verdict(r):
        if r["pct_mxu_bf16"] > 33:
            return "MXU-bound"
        if r["pct_hbm"] > 50:
            return "HBM-bound"
        return "VPU/latency-bound"

    lines = ["| kernel | us/blk-ch | GFLOP/s | %MXU | GB/s | %HBM | bound |",
             "|---|---|---|---|---|---|---|"]
    for r in rows:
        r["verdict"] = verdict(r)
        lines.append(
            f"| {r['kernel']} | {r['us_per_block_channel']:.3f} | "
            f"{r['gflops']:.0f} | {r['pct_mxu_bf16']:.1f}% | "
            f"{r['gbytes_per_s']:.0f} | {r['pct_hbm']:.1f}% | "
            f"{r['verdict']} |")
    table = "\n".join(lines)
    print(table)
    print(json.dumps({"metric": "kernel_roofline", "rows": rows,
                      "device": str(jax.devices()[0])}))
    with open(args.out, "w") as f:
        f.write(
            "# Per-kernel roofline (real chip)\n\n"
            f"Device: {jax.devices()[0]}; batch {N} block-channels per "
            f"dispatch, {args.iters} iters.  Peaks assumed: "
            f"{PEAK_BF16/1e12:.0f} TF bf16 MXU, {PEAK_HBM/1e9:.0f} GB/s "
            "HBM (v5e).  FLOP counts are the kernels' matmul work; "
            "elementwise VPU work is not counted toward %MXU, so a "
            "VPU-heavy kernel legitimately shows low %MXU with a "
            "VPU/latency-bound verdict.\n\n" + table + "\n")


if __name__ == "__main__":
    main()
