#!/usr/bin/env python
"""Probe: int8 MXU matmul support + speed vs bf16 in a Pallas kernel.

The hunt correlation matmul runs at ~bf16 peak for its shape
(ROADMAP round-3); v5e's MXU doubles throughput at int8 (394 TOPS vs
197 TFLOPS).  The band matrix is +/-1/0 chips -- EXACTLY representable
in int8 -- so only the window operand needs quantization.  This probe
times the hunt-shaped matmul chain (4 chunks of [640, 512] x
[512, 768] + square + accumulate) in bf16 vs int8 on the real chip
before any kernel surgery.

Run from the repo root WITHOUT PYTHONPATH (axon plugin discovery).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import time

import numpy as np  # noqa: F401


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=640)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--n", type=int, default=768)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--grid", type=int, default=4096,
                    help="grid steps (channel blocks) per dispatch")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from singlecarrier_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()

    M, K, N, CH, G = args.m, args.k, args.n, args.chunks, args.grid

    def kern(x_ref, m_ref, o_ref, *, dt):
        acc = jnp.zeros((M, N // 2), jnp.float32)
        for c in range(CH):
            if dt == "int8":
                corr = jax.lax.dot(
                    x_ref[0], m_ref[c],
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
                corr = jax.lax.dot(x_ref[0], m_ref[c],
                                   preferred_element_type=jnp.float32)
            p2 = corr * corr
            acc = acc + p2[:, :N // 2] + p2[:, N // 2:]
        # sublane-reduce so the output stays small (a full [G, M, N/2]
        # f32 output would be HBM-traffic-dominated at probe scale)
        o_ref[0] = jnp.sum(acc, axis=0, keepdims=True) + jnp.zeros(
            (8, N // 2), jnp.float32)

    def build(dt):
        idt = (jnp.int8 if dt == "int8"
               else jnp.bfloat16 if dt == "bf16" else jnp.float32)
        # synthesize ON DEVICE: int8 cannot cross host<->device on the
        # axon tunnel (utils/compat.py)
        x, mat = jax.jit(lambda k: (
            jax.random.randint(k, (G, M, K), -100, 100,
                               jnp.int32).astype(idt),
            jax.random.randint(jax.random.fold_in(k, 1), (CH, K, N),
                               -1, 2, jnp.int32).astype(idt),
        ))(jax.random.PRNGKey(0))
        f = pl.pallas_call(
            functools.partial(kern, dt=dt),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, M, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CH, K, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, N // 2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, 8, N // 2), jnp.float32),
        )
        jf = jax.jit(lambda a, b: f(a, b).sum())
        return jf, x, mat

    flops = 2.0 * M * K * N * CH * G
    for dt in ("bf16", "int8"):
        try:
            jf, x, mat = build(dt)
            chk = jf(x, mat)
            float(chk)                       # hard sync through tunnel
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(jf(x, mat))
            el = (time.perf_counter() - t0) / args.iters
            print(f"{dt}: {el*1e3:8.2f} ms  {flops/el/1e12:7.1f} "
                  f"TFLOP/s(eq)")
        except Exception as e:  # noqa: BLE001
            print(f"{dt}: FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
