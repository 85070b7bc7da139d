#!/usr/bin/env python
"""Measured production ingest: file -> host assembly -> H2D -> fused RX.

Closes VERDICT r4 missing #2: the native IO engine was host-tested but
never measured FEEDING the device.  This bench builds an interleaved
int16 PCM fixture file, then measures each pipeline stage and the
overlapped end-to-end rate through the SHIPPED fused-RX kernel
(prod_rx_batch fuse_frontend=True), writing BENCH_INGEST.json:

  * host_assembly:   mmap read + blocked native deinterleave into
                     [B, C, frame_size] dispatch buffers (GB/s);
  * h2d:             jax.device_put of a dispatch buffer, synced (GB/s)
                     -- through the tunneled dev backend this is a
                     network hop, NOT production DMA;
  * compute_only:    chained fused-RX dispatches on a resident operand
                     (bench.py's model), samples/s;
  * end_to_end:      runtime/ingest.feed() -- producer-thread assembly,
                     double-buffered H2D, chained async dispatches, one
                     final sync.  The honest tunnel-taxed number;
  * projected_local: min(compute, assumed local H2D bandwidth), the
                     deployment-relevant bound (production hosts DMA
                     over PCIe at tens of GB/s; flag --assumed-dma-gbps,
                     default 32 = PCIe gen4 x16 practical).

Run from the repo root WITHOUT PYTHONPATH (axon discovery).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=4096)
    ap.add_argument("--blocks", type=int, default=8,
                    help="time blocks per dispatch")
    ap.add_argument("--dispatches", type=int, default=8,
                    help="timed end-to-end dispatches")
    ap.add_argument("--file-dispatches", type=int, default=2,
                    help="dispatch-groups of PCM in the fixture file "
                         "(looped for longer runs)")
    ap.add_argument("--file", default="/tmp/scio_ingest_fixture.raw")
    ap.add_argument("--assumed-dma-gbps", type=float, default=32.0)
    ap.add_argument("--assumed-host-membw-gbps", type=float,
                    default=100.0,
                    help="production ingest host effective memory "
                         "bandwidth for the assembly projection (the "
                         "dev VM measures ~2)")
    ap.add_argument("--ring-channels", type=int, default=64,
                    help="channel count for the FrameRing-mode host "
                         "datapoint (the per-sample framing loop is "
                         "for live capture at modest C, not bulk "
                         "assembly)")
    ap.add_argument("--keep-file", action="store_true")
    ap.add_argument("--out", default="BENCH_INGEST.json")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from singlecarrier_tpu.utils.compat import enable_compilation_cache
    enable_compilation_cache()

    from singlecarrier_tpu.config import DEFAULT_CONFIG
    from singlecarrier_tpu.modem import prod_rx_init_planes
    from singlecarrier_tpu.modem.rx_production import prod_rx_batch
    from singlecarrier_tpu.runtime.ingest import (PcmDispatchSource,
                                                  PrefetchIngest, feed)

    cfg = DEFAULT_CONFIG.replace(hunt_dtype="int8", decim_dtype="bf16")
    C, B = args.channels, args.blocks
    n = cfg.frame_size
    disp_bytes = B * C * n * 2

    # ---- fixture: interleaved noise PCM (ADC sample-major layout) ----
    need = args.file_dispatches * B * C * n
    if (not os.path.exists(args.file)
            or os.path.getsize(args.file) != need * 2):
        rng = np.random.default_rng(0)
        with open(args.file, "wb") as f:
            chunk = C * n            # one time-block
            for _ in range(args.file_dispatches * B):
                f.write(rng.integers(-16384, 16384, chunk,
                                     dtype=np.int16).tobytes())
    print(f"fixture: {need * 2 / 1e9:.2f} GB, dispatch "
          f"{disp_bytes / 1e9:.3f} GB", flush=True)

    report = {"device": str(jax.devices()[0]), "channels": C,
              "blocks_per_dispatch": B, "dispatches": args.dispatches,
              "dispatch_bytes": disp_bytes}

    # ---- host assembly rate (mmap + blocked deinterleave), scaling
    # over worker threads (ctypes releases the GIL in the native call)
    reps = max(2, args.dispatches // 2)
    report["host_assembly_gbps"] = {}
    buf = None
    for w in (1, 4, 8, 16):
        src = PcmDispatchSource(args.file, C, n, B, loop=True,
                                workers=w)
        buf = src.read_dispatch()                  # warm page cache
        t0 = time.perf_counter()
        for _ in range(reps):
            src.read_dispatch(out=buf)
        dt = time.perf_counter() - t0
        report["host_assembly_gbps"][str(w)] = round(
            reps * disp_bytes / dt / 1e9, 3)
        src.close()
    host_gbps = max(report["host_assembly_gbps"].values())
    print("host_assembly_gbps", report["host_assembly_gbps"],
          flush=True)

    # memcpy baseline: the assembly is a memcpy-class pass (blocked
    # transpose), so its ceiling is the host's memory bandwidth.  The
    # dev VM here is 2-core / ~2 GB/s; a production ingest host is
    # O(100) GB/s, so the deployment projection scales assembly by the
    # measured fraction-of-memcpy efficiency.
    big = np.empty(disp_bytes // 2, np.int16)
    src_a = np.ascontiguousarray(buf.reshape(-1))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(big, src_a)
    dt = time.perf_counter() - t0
    memcpy_gbps = reps * disp_bytes / dt / 1e9
    report["host_memcpy_gbps"] = round(memcpy_gbps, 3)
    report["assembly_fraction_of_memcpy"] = round(
        host_gbps / memcpy_gbps, 3)
    print("host_memcpy_gbps", report["host_memcpy_gbps"],
          "assembly_eff", report["assembly_fraction_of_memcpy"],
          flush=True)

    # ---- FrameRing live-capture datapoint (modest C) ----
    rc = args.ring_channels
    rsrc = PcmDispatchSource(args.file, rc, n, B, loop=True,
                             mode="ring")
    rbuf = rsrc.read_dispatch()
    t0 = time.perf_counter()
    for _ in range(reps):
        rsrc.read_dispatch(out=rbuf)
    dt = time.perf_counter() - t0
    report["ring_mode_channels"] = rc
    report["ring_mode_gbps"] = round(
        reps * B * rc * n * 2 / dt / 1e9, 3)
    rsrc.close()
    print("ring_mode_gbps", report["ring_mode_gbps"], flush=True)

    # ---- device step (the shipped fused kernel; donated state) ----
    import functools

    def _demod(state, pcm):
        st, out = prod_rx_batch(cfg, state, pcm.reshape(B, C, n),
                                fuse_frontend=True)
        return st, (out.valid.sum().astype(jnp.float32)
                    + out.eq_error.sum())

    step = jax.jit(_demod, donate_argnums=(0,))

    # ---- H2D rate (synced put of one dispatch buffer) ----
    host = np.ascontiguousarray(buf.reshape(B * C, n))
    dev = jax.device_put(host)
    dev.block_until_ready()
    touch = jax.jit(lambda x: x[0, 0].astype(jnp.float32))
    t0 = time.perf_counter()
    dev2 = jax.device_put(host)
    float(touch(dev2))                  # scalar fetch = hard sync
    dt = time.perf_counter() - t0
    report["h2d_gbps_tunnel"] = round(disp_bytes / dt / 1e9, 5)
    report["h2d_one_dispatch_s"] = round(dt, 3)
    print("h2d_gbps_tunnel", report["h2d_gbps_tunnel"],
          f"({dt:.2f}s/dispatch)", flush=True)

    # ---- compute-only (resident operand, chained) ----
    state = prod_rx_init_planes(cfg, C)
    for _ in range(2):
        state, chk = step(state, dev)
        float(chk)
    t0 = time.perf_counter()
    for _ in range(args.dispatches):
        state, chk = step(state, dev)
    float(chk)
    dt = time.perf_counter() - t0
    compute_sps = args.dispatches * B * C * n / dt
    report["compute_only_samples_per_sec"] = round(compute_sps, 1)
    print("compute_only_GSps", round(compute_sps / 1e9, 3), flush=True)

    # ---- end-to-end: file -> assembly thread -> double-buffered H2D
    # -> chained fused-RX (the production loop, tunnel-taxed) ----
    src = PcmDispatchSource(args.file, C, n, B, loop=True, workers=8)
    ingest = PrefetchIngest(src, args.dispatches, depth=2)
    state = prod_rx_init_planes(cfg, C)
    put = lambda b: jax.device_put(  # noqa: E731
        np.ascontiguousarray(b.reshape(B * C, n)))
    t0 = time.perf_counter()
    state, chk = feed(ingest, put, step, state)
    float(chk)
    dt = time.perf_counter() - t0
    src.close()
    e2e_sps = args.dispatches * B * C * n / dt
    report["end_to_end_samples_per_sec_tunnel"] = round(e2e_sps, 1)
    report["end_to_end_wall_s"] = round(dt, 3)
    print("end_to_end_GSps_tunnel", round(e2e_sps / 1e9, 3), flush=True)

    # ---- projected local deployment (PCIe/DMA host, same kernel) ----
    dma_sps = args.assumed_dma_gbps * 1e9 / 2          # 2 B/sample
    proj_host_gbps = (report["assembly_fraction_of_memcpy"]
                      * args.assumed_host_membw_gbps)
    host_sps = proj_host_gbps * 1e9 / 2
    report["assumed_local_h2d_gbps"] = args.assumed_dma_gbps
    report["assumed_host_membw_gbps"] = args.assumed_host_membw_gbps
    report["projected_host_assembly_gbps"] = round(proj_host_gbps, 1)
    report["projected_local_samples_per_sec"] = round(
        min(compute_sps, dma_sps, host_sps), 1)
    report["projected_bound"] = (
        "compute" if compute_sps <= min(dma_sps, host_sps)
        else ("host_assembly" if host_sps < dma_sps else "h2d_dma"))
    print("projected_local_GSps",
          round(report["projected_local_samples_per_sec"] / 1e9, 3),
          "bound:", report["projected_bound"], flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)
    if not args.keep_file:
        os.unlink(args.file)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
