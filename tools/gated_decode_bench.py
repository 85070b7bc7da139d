#!/usr/bin/env python
"""Detection-gated two-phase decode: measured cost model.

VERDICT r4 #8: the fused RX trains/refits/refines EVERY block-channel
(~0.15 of its 0.31 us/blk-ch) although ~1e-5 of noise blocks and ~67%
of real-stream block-channels detect.  This bench builds and measures
the two-phase alternative on hardware:

  phase 1  fused kernel, ``stage="gate"`` (ops/decode_pallas._decode_
           core): front-end + hunt + extraction + energy gate; decode
           tail skipped.  Carries the stream state exactly like the
           full kernel (same ring walk).
  compact  sort-based on-device compaction of the detected
           (block, channel) pairs (argsort of the gate flags -- shape-
           static, the TPU-idiomatic substitute for data-dependent
           nonzero) + gather of each detection's (prev, cur) raw PCM
           rows and closed-form carry seeds.
  phase 2  the SAME fused kernel over the compacted [2, K] batch;
           block 0 rebuilds the hunt window, block 1's stats are the
           decode (bit-identical to the full path -- asserted here on
           a packet stream before timing).

Writes GATED_DECODE.json: T_full, T_gate, T_compact, T_phase2(K), and
the effective throughput of the two-phase pipeline at the measured
noise density (~1.3e-5), the real-stream density (~0.67), and the
break-even density.

Run from the repo root WITHOUT PYTHONPATH (axon discovery).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=8192)
    ap.add_argument("--blocks", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--subset-fracs", default="0.001,0.1,0.33,0.67,1.0")
    ap.add_argument("--out", default="GATED_DECODE.json")
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    from singlecarrier_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()

    from singlecarrier_tpu.config import DEFAULT_CONFIG
    from singlecarrier_tpu.modem import prod_rx_init_planes
    from singlecarrier_tpu.ops.fused_rx import fused_rx_block

    cfg = DEFAULT_CONFIG.replace(hunt_dtype="int8", decim_dtype="bf16")
    C, B = args.channels, args.blocks
    n = cfg.frame_size
    N = B * C
    halo = cfg.ntaps - 1
    interpret = jax.default_backend() == "cpu"

    w_ = -2.0 * np.pi * cfg.center / cfg.fs
    advs = np.exp(1j * w_ * n * np.arange(B + 1)).astype(np.complex64)

    def synth(key):
        def one(k):
            u = jax.random.bits(k, (C, n // 2), jnp.uint32)
            return (lax.bitcast_convert_type(u, jnp.int16)
                    .reshape(C, n) >> 1).astype(jnp.int16)
        return lax.map(one, jax.random.split(key, B))

    def run(state, pcm, stage):
        p0r, p0i, tr, ti, dp = state
        dec, dlast, (fr, fi, ftr, fti) = fused_rx_block(
            cfg, pcm, p0r, p0i, tr, ti, dp, stage=stage,
            block_channels=min(128, C), interpret=interpret)
        chk = (dec["gated"].sum().astype(jnp.float32)
               + dec["peak"].sum())
        if stage == "full":
            chk = chk + dec["eq_error"].sum()
        return (fr, fi, ftr, fti, dlast), dec, chk

    step_full = jax.jit(lambda st, p: run(st, p, "full")[::2],
                        donate_argnums=(0,))
    step_gate = jax.jit(lambda st, p: run(st, p, "gate")[::2],
                        donate_argnums=(0,))

    def compact(dec_gated, pcm, p0r, p0i, K):
        """Detected-first ordering + gather of phase-2 operands.

        Returns ([2, K, n] pcm pairs, [K] phase planes, [K, halo]
        tail seeds) for the top-K gate-flagged (block, channel) pairs.
        Shape-static: K is a capacity; rows past the detection count
        decode garbage and are masked by their own gate downstream.
        """
        Bp, Cp2 = pcm.shape[0], pcm.shape[1]
        flat = dec_gated.reshape(-1)                    # [Bp*Cp2] bool
        order = jnp.argsort(~flat)[:K]                  # detected first
        b_idx = order // Cp2
        c_idx = order % Cp2
        pcm_f = pcm.reshape(Bp * Cp2, n)
        cur = pcm_f[order]
        prev = jnp.where((b_idx > 0)[:, None],
                         pcm_f[jnp.maximum(order - Cp2, 0)], 0)
        # phase entering the PAIR = phase of block b-1 (adv^(b-1),
        # including b=0 -> adv^-1 so the cur block lands on adv^0;
        # its prev block is all-zero there, so only cur's phase counts)
        advm = np.exp(1j * w_ * n * (np.arange(Bp + 1) - 1.0)
                      ).astype(np.complex64)
        ar = jnp.asarray(advm.real)[b_idx]
        ai = jnp.asarray(advm.imag)[b_idx]
        pr = p0r[c_idx] * ar - p0i[c_idx] * ai
        pi = p0r[c_idx] * ai + p0i[c_idx] * ar
        # tail entering block b-1 = downmixed tail of pcm block b-2
        tab_r = jnp.asarray(
            np.cos(w_ * np.arange(n - halo, n, dtype=np.float64))
            .astype(np.float32))
        tab_i = jnp.asarray(
            np.sin(w_ * np.arange(n - halo, n, dtype=np.float64))
            .astype(np.float32))
        advm2 = np.exp(1j * w_ * n * (np.arange(Bp + 1) - 2.0)
                       ).astype(np.complex64)
        arr2 = jnp.asarray(advm2.real)[b_idx]
        ai2 = jnp.asarray(advm2.imag)[b_idx]
        pr2 = p0r[c_idx] * arr2 - p0i[c_idx] * ai2
        pi2 = p0r[c_idx] * ai2 + p0i[c_idx] * arr2
        x_t = jnp.where(
            (b_idx > 1)[:, None],
            pcm_f[jnp.maximum(order - 2 * Cp2, 0)][:, n - halo:], 0
        ).astype(jnp.float32) / cfg.tx_amplitude
        tl_r = x_t * (pr2[:, None] * tab_r - pi2[:, None] * tab_i)
        tl_i = x_t * (pr2[:, None] * tab_i + pi2[:, None] * tab_r)
        return (jnp.stack([prev, cur], 0), pr, pi, tl_r, tl_i, order)

    def phase2(pairs, pr, pi, tl_r, tl_i, K):
        dp0 = jnp.zeros((cfg.cycles, 2, K, cfg.symbols_per_block),
                        jnp.bfloat16 if cfg.decim_dtype == "bf16"
                        else jnp.float32)
        dec, _, _ = fused_rx_block(
            cfg, pairs, pr, pi, tl_r, tl_i, dp0,
            block_channels=min(128, K), interpret=interpret)
        # block 1's rows are the decode (block 0 rebuilt the window)
        return jax.tree.map(lambda x: x[K:], dec)

    report = {"device": str(jax.devices()[0]), "channels": C,
              "blocks": B, "iters": args.iters}

    # ---- correctness: phase-2 decode == full-path decode ----
    if not args.skip_verify:
        from singlecarrier_tpu.modem import tx_stream
        vb = 8
        vC = 128
        rngv = np.random.default_rng(5)
        bits = rngv.integers(
            0, 2, (min(vC, 16), 4, cfg.ns, cfg.data_symbols * 2),
            dtype=np.uint8)

        @jax.jit
        def mkstream(bits_dev):
            pcm = tx_stream(cfg, bits_dev, flush_gap=True,
                            scramble=True)
            need = vb * n
            pad = max(0, need - pcm.shape[-1])
            x = jnp.pad(pcm, ((0, 0), (0, pad)))[:, :need]
            x = jnp.tile(x, (vC // x.shape[0], 1))
            return jnp.swapaxes(
                x.reshape(vC, vb, n), 0, 1).astype(jnp.int16)

        vpcm = mkstream(jnp.asarray(bits))
        vst = prod_rx_init_planes(cfg, vC)

        @jax.jit
        def full_v(st, p):
            return run(st, p, "full")[1]

        @jax.jit
        def gate_then_decode(st, p):
            _, decg, _ = run(st, p, "gate")
            K = vb * vC               # full capacity: verify every row
            pairs, pr, pi, tr_, ti_, order = compact(
                decg["gated"], p, st[0], st[1], K)
            dec2 = phase2(pairs, pr, pi, tr_, ti_, K)
            return decg, dec2, order

        decf = jax.tree.map(np.asarray, full_v(vst, vpcm))
        decg, dec2, order = jax.tree.map(
            np.asarray, gate_then_decode(vst, vpcm))
        nk = int(decg["gated"].sum())
        ok = 0
        mism = 0
        for i in range(nk):
            j = int(order[i])
            if not decf["gated"][j]:
                mism += 1
                continue
            same = (np.array_equal(dec2["dibits"][i],
                                   decf["dibits"][j])
                    and dec2["matches"][i] == decf["matches"][j])
            ok += int(same)
            mism += int(not same)
        report["verify"] = {"detections": nk, "bit_identical": ok,
                            "mismatched": mism}
        print("verify:", report["verify"], flush=True)
        assert mism == 0, report["verify"]

    # ---- timing ----
    key = jax.random.PRNGKey(0)
    pcm = jax.jit(synth)(key)

    def time_chain(step, state):
        for _ in range(2):
            state, chk = step(state, pcm)
            float(chk)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, chk = step(state, pcm)
        float(chk)
        return (time.perf_counter() - t0) / args.iters

    t_full = time_chain(step_full, prod_rx_init_planes(cfg, C))
    t_gate = time_chain(step_gate, prod_rx_init_planes(cfg, C))
    report["t_full_s"] = round(t_full, 4)
    report["t_gate_s"] = round(t_gate, 4)
    report["full_GSps"] = round(N * n / t_full / 1e9, 3)
    report["gate_GSps"] = round(N * n / t_gate / 1e9, 3)
    print(f"full {report['full_GSps']} GS/s, gate-only "
          f"{report['gate_GSps']} GS/s", flush=True)

    # compact + phase2 at subset sizes
    st0 = prod_rx_init_planes(cfg, C)
    _, decg, chk = jax.jit(lambda st, p: run(st, p, "gate"))(st0, pcm)
    float(chk)
    report["phase2"] = {}
    fracs = [float(f) for f in args.subset_fracs.split(",")]
    for frac in fracs:
        K = max(128, int(N * frac) // 128 * 128)

        @jax.jit
        def c_and_d(gated, p, p0r, p0i):
            pairs, pr, pi, tr_, ti_, _ = compact(gated, p, p0r, p0i, K)
            dec2 = phase2(pairs, pr, pi, tr_, ti_, K)
            return (dec2["gated"].sum().astype(jnp.float32)
                    + dec2["peak"].sum() + dec2["eq_error"].sum())

        @jax.jit
        def c_only(gated, p, p0r, p0i):
            pairs, pr, pi, tr_, ti_, _ = compact(gated, p, p0r, p0i, K)
            return (pairs.sum(dtype=jnp.float32) + pr.sum()
                    + tr_.sum())

        for f_ in (c_and_d, c_only):
            float(f_(decg["gated"], pcm, st0[0], st0[1]))  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            chk = c_and_d(decg["gated"], pcm, st0[0], st0[1])
        float(chk)
        t_cd = (time.perf_counter() - t0) / args.iters
        t0 = time.perf_counter()
        for _ in range(args.iters):
            chk = c_only(decg["gated"], pcm, st0[0], st0[1])
        float(chk)
        t_c = (time.perf_counter() - t0) / args.iters
        two_phase = t_gate + t_cd
        report["phase2"][str(frac)] = {
            "K": K, "t_compact_s": round(t_c, 4),
            "t_compact_decode_s": round(t_cd, 4),
            "t_two_phase_s": round(two_phase, 4),
            "two_phase_GSps": round(N * n / two_phase / 1e9, 3),
            "speedup_vs_full": round(t_full / two_phase, 3)}
        print(f"frac {frac}: K={K} compact {t_c:.4f}s "
              f"compact+decode {t_cd:.4f}s two-phase "
              f"{report['phase2'][str(frac)]['two_phase_GSps']} GS/s "
              f"({report['phase2'][str(frac)]['speedup_vs_full']}x)",
              flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
