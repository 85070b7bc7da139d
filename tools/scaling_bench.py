#!/usr/bin/env python
"""Partitioning-overhead measurement (BASELINE.md scaling row).

Methodology (VERDICT r2 weak #1): virtual CPU devices share ONE host's
cores, so "efficiency = speedup/devices" is meaningless there -- adding
virtual devices cannot add silicon.  What CAN be measured on shared
resources is *partitioning overhead*: run the SAME TOTAL WORK
unpartitioned and partitioned over an N-device mesh on identical
resources, and report the wall-time overhead of the partitioned run
(shard orchestration, halo exchange, collective scheduling).  On a real
pod slice the same harness measures true silicon scaling (each device
is then its own chip) and the efficiency column becomes meaningful.

Measured here:
  * DP (channel-sharded): fixed total channels partitioned 1/2/4/8 ways;
  * 2D grid (ch x time): same total work over (ch=N/2, time=2) meshes,
    halos riding ppermute on the time axis.

Writes a markdown table + one JSON line.

Usage:
  python tools/scaling_bench.py --platform cpu --vdevices 8 --out SCALING.md
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
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=512,
                    help="TOTAL channels (fixed across device counts)")
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--vdevices", type=int, default=8,
                    help="virtual CPU device count (with --platform cpu)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.vdevices}")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from singlecarrier_tpu.config import DEFAULT_CONFIG as cfg
    from singlecarrier_tpu.modem.rx_production import prod_rx_init
    from singlecarrier_tpu.parallel.sharded_rx import (
        make_channel_sharded_rx, shard_channel_state)
    from singlecarrier_tpu.parallel.timeshard import make_grid_sharded_rx

    devs = jax.devices()
    C, B = args.channels, args.blocks
    rng = np.random.default_rng(0)
    pcm_np = rng.integers(
        -16384, 16384, (C, B, cfg.frame_size)).astype(np.int16)

    def timeit(fn, *a):
        for _ in range(args.warmup):
            out = fn(*a)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / args.iters

    # ---- DP: same total channels, partitioned 1/2/4/8 ways ----
    counts = [d for d in (1, 2, 4, 8, 16) if d <= len(devs) and C % d == 0]
    dp_rows = []
    base_dt = None
    for nd in counts:
        mesh = Mesh(np.array(devs[:nd]), ("ch",))
        fn = make_channel_sharded_rx(cfg, mesh, descramble=False)
        state = shard_channel_state(prod_rx_init(cfg, (C,)), mesh)
        pcm = jax.device_put(
            jnp.asarray(pcm_np), NamedSharding(mesh, P("ch")))
        dt = timeit(lambda s, p: fn(s, p)[1], state, pcm)
        if base_dt is None:
            base_dt = dt
        dp_rows.append({
            "devices": nd, "channels": C, "wall_s": round(dt, 4),
            "samples_per_sec": C * B * cfg.frame_size / dt,
            "overhead_pct": round(100.0 * (dt / base_dt - 1.0), 1),
        })

    # ---- 2D grid: (ch = N/2, time = 2), same total work ----
    grid_rows = []
    for nd in counts:
        if nd < 2 or B % 2 != 0 or C % (nd // 2) != 0:
            continue
        mesh = Mesh(np.array(devs[:nd]).reshape(nd // 2, 2),
                    ("ch", "time"))
        fn = make_grid_sharded_rx(cfg, mesh, descramble=False)
        pcm = jax.device_put(
            jnp.asarray(pcm_np), NamedSharding(mesh, P("ch", "time")))
        dt = timeit(fn, pcm)
        grid_rows.append({
            "devices": nd, "grid": f"{nd // 2}x2",
            "channels": C, "wall_s": round(dt, 4),
            "samples_per_sec": C * B * cfg.frame_size / dt,
            "overhead_pct": round(100.0 * (dt / base_dt - 1.0), 1),
        })

    def table(rows, grid=False):
        hdr = ("| devices | grid (ch x time) |" if grid else "| devices |")
        lines = [hdr + " channels | samples/s | overhead vs unpartitioned |",
                 "|---|---|---|---|" + ("---|" if grid else "")]
        for r in rows:
            g = f" {r['grid']} |" if grid else ""
            lines.append(
                f"| {r['devices']} |{g} {r['channels']} | "
                f"{r['samples_per_sec']:.3e} | {r['overhead_pct']:+.1f}% |")
        return "\n".join(lines)

    dp_tbl = table(dp_rows)
    grid_tbl = table(grid_rows, grid=True)
    print(dp_tbl)
    print()
    print(grid_tbl)
    print(json.dumps({"metric": "partitioning_overhead",
                      "dp_rows": dp_rows, "grid_rows": grid_rows,
                      "platform": str(devs[0].platform)}))
    if args.out:
        with open(args.out, "w") as f:
            f.write(
                "# Scaling measurements (channel-sharded RX)\n\n"
                "## Partitioning overhead (same total work, virtual "
                f"{len(devs)}-device {devs[0].platform} mesh)\n\n"
                f"{C} total channels x {B} blocks/dispatch, "
                f"{args.iters} iters; the SAME work runs unpartitioned "
                "and partitioned over N devices on identical host "
                "resources.  Virtual devices share one host's cores, so "
                "speedup/efficiency is not measurable here -- the "
                "overhead column is the meaningful number: what "
                "sharding costs in orchestration/collectives.  On a "
                "real pod slice this harness measures true scaling "
                "(BASELINE.md scaling row; blocked on multi-chip "
                "hardware availability).\n\n"
                "### DP (channel-sharded)\n\n" + dp_tbl + "\n\n"
                "### 2D grid (ch x time, ppermute halos on time)\n\n"
                + grid_tbl + "\n")


if __name__ == "__main__":
    main()
