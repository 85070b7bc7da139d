#!/usr/bin/env python
"""Wrapper-level throughput of the gated two-phase RX.

tools/gated_decode_bench.py measures the CONSTITUENTS (gate kernel,
compaction, subset decode) and derives the pipeline's cost model;
this bench times the shipped wrapper itself --
``modem.rx_gated.prod_rx_batch_gated`` jitted end-to-end, streaming
state carried across chained dispatches -- so the productized API has
its own measured number (glue included) rather than a derived one.

Noise stream at the bench geometry (detection density ~3e-6, the
monitoring regime the wrapper exists for), K = --max-detections
capacity.  Writes GATED_WRAPPER.json.

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
    ap.add_argument("--max-detections", type=int, default=1024)
    ap.add_argument("--out", default="GATED_WRAPPER.json")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    from singlecarrier_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()

    from singlecarrier_tpu.config import DEFAULT_CONFIG
    from singlecarrier_tpu.modem import (prod_rx_batch_gated,
                                         prod_rx_gated_init)
    from singlecarrier_tpu.modem.rx_production import (prod_rx_batch,
                                                      prod_rx_init_planes)

    cfg = DEFAULT_CONFIG.replace(hunt_dtype="int8", decim_dtype="bf16")
    C, B, K = args.channels, args.blocks, args.max_detections
    n = cfg.frame_size
    N = B * C
    interpret = jax.default_backend() == "cpu"

    def synth(key):
        def one(k):
            u = jax.random.bits(k, (C, n // 2), jnp.uint32)
            return (lax.bitcast_convert_type(u, jnp.int16)
                    .reshape(C, n) >> 1).astype(jnp.int16)
        return lax.map(one, jax.random.split(key, B))

    pcm = jax.jit(synth)(jax.random.PRNGKey(0))

    # ---- wrapper, jitted end-to-end ----
    def wstep(state, p):
        state, out = prod_rx_batch_gated(
            cfg, state, p, max_detections=K,
            block_channels=min(128, C), interpret=interpret)
        chk = (out["count"].astype(jnp.float32)
               + out["valid"].sum().astype(jnp.float32)
               + out["peak"].sum())
        return state, chk

    wstep = jax.jit(wstep, donate_argnums=(0,))

    # ---- full path at the identical geometry (reference arm) ----
    def fstep(state, p):
        state, out = prod_rx_batch(
            cfg, state, p, block_channels=min(128, C),
            fuse_frontend=True, interpret=interpret)
        chk = (out.valid.sum().astype(jnp.float32) + out.peak.sum())
        return state, chk

    fstep = jax.jit(fstep, donate_argnums=(0,))

    def time_chain(step, state):
        for _ in range(2):
            state, chk = step(state, pcm)
            float(chk)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, chk = step(state, pcm)
        float(chk)
        return (time.perf_counter() - t0) / args.iters

    t_wrap = time_chain(wstep, prod_rx_gated_init(cfg, C))
    t_full = time_chain(fstep, prod_rx_init_planes(cfg, C))

    report = {
        "device": str(jax.devices()[0]),
        "channels": C, "blocks": B, "iters": args.iters,
        "max_detections": K,
        "t_wrapper_s": round(t_wrap, 4),
        "t_full_s": round(t_full, 4),
        "wrapper_GSps": round(N * n / t_wrap / 1e9, 3),
        "full_GSps": round(N * n / t_full / 1e9, 3),
        "speedup_vs_full": round(t_full / t_wrap, 3),
    }
    with open(args.out, "w") as fo:
        json.dump(report, fo, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    _sys.exit(main())
