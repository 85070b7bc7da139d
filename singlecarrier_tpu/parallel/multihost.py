"""Multi-host (pod-slice) runner utilities.

The reference is a single process (SURVEY.md: zero distributed code);
scaling past one host uses JAX's multi-controller runtime: every host
runs the same program, ``jax.distributed.initialize`` wires the
coordination service, and the global mesh spans all hosts' devices.
Collectives ride ICI within a slice and DCN across slices -- XLA *is*
the communication backend; there is no hand-written NCCL analog to
port.

Typical launch (one command per host):

  python -m singlecarrier_tpu.parallel.multihost \
      --coordinator=10.0.0.1:8476 --num-processes=4 --process-id=$ID

Host-local data feeding: each host owns the channels whose shards live
on its devices (``host_local_channels``); ``jax.make_array_from_
process_local_data`` assembles the global sharded array.
"""

from __future__ import annotations

import argparse

import numpy as np


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wire up the multi-controller runtime (no-op single-process)."""
    import jax
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(time: int = 1):
    """[ch x time] mesh over ALL processes' devices."""
    from .mesh import make_mesh
    import jax
    return make_mesh(time=time, devices=jax.devices())


def host_local_channels(n_channels_global: int) -> slice:
    """The contiguous channel range this host feeds (channel-major
    layout over processes)."""
    import jax
    per = n_channels_global // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def make_global_pcm(mesh, pcm_local: np.ndarray):
    """Assemble the globally-sharded [channels, ...] PCM array from each
    host's local channel block."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = P("ch", *([None] * (pcm_local.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), pcm_local)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--blocks", type=int, default=4)
    args = ap.parse_args()

    initialize(args.coordinator, args.num_processes, args.process_id)

    import jax
    import jax.numpy as jnp

    from ..config import DEFAULT_CONFIG as cfg
    from ..modem.rx_production import prod_rx_init
    from .sharded_rx import make_channel_sharded_rx, shard_channel_state

    mesh = global_mesh()
    fn = make_channel_sharded_rx(cfg, mesh)

    sl = host_local_channels(args.channels)
    rng = np.random.default_rng(jax.process_index())
    local = rng.integers(-16384, 16384,
                         (sl.stop - sl.start, args.blocks,
                          cfg.frame_size)).astype(np.int16)
    pcm = make_global_pcm(mesh, local)
    state = shard_channel_state(prod_rx_init(cfg, (args.channels,)), mesh)
    state, out = fn(state, pcm)
    jax.block_until_ready(out.valid)
    if jax.process_index() == 0:
        print(f"demodulated {args.channels} channels x {args.blocks} "
              f"blocks over {jax.process_count()} hosts / "
              f"{len(jax.devices())} devices")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
