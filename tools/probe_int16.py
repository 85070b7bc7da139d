#!/usr/bin/env python
"""Probe: is the front-end's convert/store skeleton dominated by the
int16 input path?

The fused front-end's store_only probe reads 0.094 us/blk-ch --
several times the HBM-bandwidth floor.  Suspect: int16 arrays tile
(16, 128) on TPU; converting to f32 (8, 128) forces a hardware
relayout per tile.  This times three kernels of identical logical
work (load [cb, n] -> 2x scaled stores to scratch -> reduce to a tiny
output):

  int16-in : load int16, convert, store f32 scratch   (current path)
  f32-in   : load f32, store f32 scratch              (2x input DMA)
  bf16-out : load int16, convert, store bf16 scratch  (current bf16)

Run from the repo root WITHOUT PYTHONPATH (axon plugin discovery).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cb", type=int, default=128)
    ap.add_argument("--n", type=int, default=1880)
    ap.add_argument("--grid", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from singlecarrier_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()

    CB, N, G = args.cb, args.n, args.grid
    NP = -(-N // 128) * 128

    def kern(x_ref, o_ref, z1, z2, *, sdt, owrite="small"):
        x = x_ref[0].astype(jnp.float32) * (1.0 / 16384.0)
        z1[:, :N] = (x * 0.6).astype(sdt)
        z2[:, :N] = (x * 0.8).astype(sdt)
        s = jnp.sum((z1[:, :128] + z2[:, :128]).astype(jnp.float32),
                    axis=1, keepdims=True)
        if owrite == "small":
            o_ref[0] = s + jnp.zeros((CB, 128), jnp.float32)
        elif owrite == "slices":
            # the real front-end's output pattern: 10 [cb, 128]
            # slice-stores per (cyc, plane) into the transposed layout
            for c in range(5):
                for p in range(2):
                    for b in range(3):
                        o_ref[c, p, :, b * 128:(b + 1) * 128] = (
                            z1[:, b * 128:(b + 1) * 128].astype(
                                o_ref.dtype) if p == 0 else
                            z2[:, b * 128:(b + 1) * 128].astype(
                                o_ref.dtype))
        elif owrite == "flat":
            # single dense [cb, 10*384] store (the candidate layout:
            # (cyc, plane) folded into the lane axis at 384-aligned
            # offsets)
            o_ref[:, :1920] = (z1[:, :1920] * 1.0).astype(o_ref.dtype)
            o_ref[:, 1920:] = (z2[:, :1920] * 1.0).astype(o_ref.dtype)
        else:  # broadcast
            o_ref[...] = (jnp.zeros_like(o_ref)
                          + s[None, None, :, :].astype(o_ref.dtype))

    def build(idt, sdt, owrite="small"):
        x = jax.jit(lambda k: jax.random.randint(
            k, (G, CB, N), -16384, 16384, jnp.int32).astype(idt)
        )(jax.random.PRNGKey(0))
        if owrite == "small":
            ospec = pl.BlockSpec((1, CB, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((G, CB, 128), jnp.float32)
        elif owrite == "flat":
            ospec = pl.BlockSpec((CB, 3840), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((G * CB, 3840), jnp.bfloat16)
        else:
            ospec = pl.BlockSpec((5, 2, CB, 384),
                                 lambda i: (0, 0, i, 0),
                                 memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((5, 2, G * CB, 384),
                                          jnp.bfloat16)
        f = pl.pallas_call(
            functools.partial(kern, sdt=sdt, owrite=owrite),
            grid=(G,),
            in_specs=[pl.BlockSpec((1, CB, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=ospec,
            out_shape=oshape,
            scratch_shapes=[pltpu.VMEM((CB, NP), sdt),
                            pltpu.VMEM((CB, NP), sdt)],
        )
        jf = jax.jit(lambda a: f(a).astype(jnp.float32).sum())
        return jf, x

    for name, idt, sdt, ow in (
            ("int16-in/f32-store", jnp.int16, jnp.float32, "small"),
            ("f32-in/f32-store", jnp.float32, jnp.float32, "small"),
            ("int16-in/bf16-store", jnp.int16, jnp.bfloat16, "small"),
            ("int16/bf16/out-slices", jnp.int16, jnp.bfloat16,
             "slices"),
            ("int16/bf16/out-flat", jnp.int16, jnp.bfloat16,
             "flat"),
            ("int16/bf16/out-bcast", jnp.int16, jnp.bfloat16,
             "broadcast")):
        jf, x = build(idt, sdt, ow)
        float(jf(x))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = jf(x)
        float(r)
        el = (time.perf_counter() - t0) / args.iters
        us = el / (G * CB) * 1e6
        print(f"{name:>22}: {el*1e3:8.2f} ms  {us:7.4f} us/blk-ch-eq")


if __name__ == "__main__":
    main()
