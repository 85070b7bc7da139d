#!/usr/bin/env python
"""Samples/s-vs-devices scaling measurement (BASELINE.md scaling row).

Weak scaling of the channel-sharded production RX over a 1/2/4/8-device
mesh: channels-per-device held fixed, so perfect scaling = samples/s
proportional to device count.  On the virtual CPU mesh (default here)
the devices share one host's cores, so the curve measures the
orchestration/partitioning overhead rather than real silicon scaling;
on a real pod slice the same harness measures ICI/DCN scaling.

Writes a markdown table + one JSON line.

Usage:
  python tools/scaling_bench.py --platform cpu --vdevices 8 --out SCALING.md

(--platform cpu is applied via jax.config: under the axon TPU plugin
the JAX_PLATFORMS env var is ignored -- tests/conftest.py note.)
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
    ap.add_argument("--channels-per-device", type=int, default=64)
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
    from jax.sharding import Mesh

    from singlecarrier_tpu.config import DEFAULT_CONFIG as cfg
    from singlecarrier_tpu.modem.rx_production import prod_rx_init
    from singlecarrier_tpu.parallel.sharded_rx import (
        make_channel_sharded_rx, shard_channel_state)

    devs = jax.devices()
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devs)]
    rows = []
    for nd in counts:
        mesh = Mesh(np.array(devs[:nd]), ("ch",))
        C = args.channels_per_device * nd
        fn = make_channel_sharded_rx(cfg, mesh, descramble=False)
        state = shard_channel_state(prod_rx_init(cfg, (C,)), mesh)
        rng = np.random.default_rng(0)
        pcm_np = rng.integers(
            -16384, 16384,
            (C, args.blocks, cfg.frame_size)).astype(np.int16)
        from jax.sharding import NamedSharding, PartitionSpec as P
        pcm = jax.device_put(
            jnp.asarray(pcm_np), NamedSharding(mesh, P("ch")))

        for _ in range(args.warmup):
            st, out = fn(state, pcm)
            jax.block_until_ready(out.valid)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, out = fn(state, pcm)
            jax.block_until_ready(out.valid)
        dt = (time.perf_counter() - t0) / args.iters
        sps = C * args.blocks * cfg.frame_size / dt
        rows.append({"devices": nd, "channels": C,
                     "samples_per_sec": sps, "wall_s": dt})

    base = rows[0]["samples_per_sec"]
    lines = ["| devices | channels | samples/s | speedup | efficiency |",
             "|---|---|---|---|---|"]
    for r in rows:
        spd = r["samples_per_sec"] / base
        eff = spd / r["devices"]
        r["speedup"] = round(spd, 3)
        r["efficiency"] = round(eff, 3)
        lines.append(
            f"| {r['devices']} | {r['channels']} | "
            f"{r['samples_per_sec']:.3e} | {spd:.2f}x | {eff:.1%} |")
    table = "\n".join(lines)
    print(table)
    print(json.dumps({"metric": "weak_scaling", "rows": rows,
                      "platform": str(devs[0].platform)}))
    if args.out:
        with open(args.out, "w") as f:
            f.write(
                "# Weak-scaling measurement (channel-sharded RX)\n\n"
                f"Platform: {devs[0].platform} x {len(devs)} devices; "
                f"{args.channels_per_device} channels/device, "
                f"{args.blocks} blocks/dispatch, {args.iters} iters.\n\n"
                "Virtual CPU devices share one host's cores: this curve "
                "bounds partitioning overhead, not silicon scaling (no "
                "multi-chip hardware in this environment -- BASELINE.md "
                "scaling row).\n\n" + table + "\n")


if __name__ == "__main__":
    main()
