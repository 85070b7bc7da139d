"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Seam correctness is the hard part (SURVEY.md hard-part #5): the same
stream demodulated on 1 device and on N devices must produce identical
bits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.modem import (
    make_prod_rx_fn,
    prod_rx_init,
    tx_stream,
)
from singlecarrier_tpu.parallel import (
    make_channel_sharded_rx,
    make_mesh,
    make_time_sharded_rx,
    shard_channel_state,
)


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, (10, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), flush_gap=True))
    # pad to a multiple of 8 frames (14.8 -> 16)
    n = 16
    buf = np.zeros(n * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    return bits, buf.reshape(n, CFG.frame_size)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_channel_sharded_rx_matches_single(stream):
    bits, frames = stream
    mesh = make_mesh(ch=8, time=1)
    n_ch = 16

    batch = jnp.asarray(np.broadcast_to(
        frames, (n_ch, *frames.shape)).copy())
    fn = make_channel_sharded_rx(CFG, mesh, descramble=False)
    state = shard_channel_state(prod_rx_init(CFG, (n_ch,)), mesh)
    _, out = fn(state, batch)

    ref_fn = make_prod_rx_fn(CFG, descramble=False)
    _, ref = ref_fn(prod_rx_init(CFG), jnp.asarray(frames))

    for c in range(n_ch):
        assert np.array_equal(np.asarray(out.valid[c]),
                              np.asarray(ref.valid))
        assert np.array_equal(np.asarray(out.bits[c]),
                              np.asarray(ref.bits))


def test_sharded_metrics_reduction(stream):
    """metrics_summary reduces across the sharded channel axis (the
    all-reduce XLA lowers to psum over the mesh): jitted-on-mesh values
    must equal the host-side computation on gathered arrays."""
    from singlecarrier_tpu.parallel import metrics_summary

    bits, frames = stream
    mesh = make_mesh(ch=8, time=1)
    n_ch = 16
    batch = jnp.asarray(np.broadcast_to(
        frames, (n_ch, *frames.shape)).copy())
    fn = make_channel_sharded_rx(CFG, mesh, descramble=False)
    state = shard_channel_state(prod_rx_init(CFG, (n_ch,)), mesh)
    _, out = fn(state, batch)

    m = jax.jit(metrics_summary)(out)   # reduction over sharded leaves
    valid = np.asarray(out.valid)
    cfo = np.asarray(out.cfo_hz)
    eqe = np.asarray(out.eq_error)
    assert int(m["packets_detected"]) == int(valid.sum()) == 10 * n_ch
    assert np.isclose(float(m["mean_cfo_hz"]),
                      cfo[valid].mean(), atol=1e-5)
    assert np.isclose(float(m["mean_eq_error"]),
                      eqe[valid].mean(), rtol=1e-5)


def test_time_sharded_seam_exactness(stream):
    """Overlap-save halo exchange: identical decisions across shard
    seams vs the single-device scan."""
    bits, frames = stream
    mesh = make_mesh(ch=1, time=8)

    fn = make_time_sharded_rx(CFG, mesh, descramble=False)
    out = fn(jnp.asarray(frames))

    ref_fn = make_prod_rx_fn(CFG, descramble=False)
    _, ref = ref_fn(prod_rx_init(CFG), jnp.asarray(frames))

    out = jax.tree.map(np.asarray, out)
    ref = jax.tree.map(np.asarray, ref)

    assert np.array_equal(out.valid, ref.valid), (
        f"valid mismatch: sharded {np.where(out.valid)[0]} "
        f"vs single {np.where(ref.valid)[0]}")
    assert np.array_equal(out.bits[out.valid], ref.bits[ref.valid])
    # all 10 packets survive the seams
    assert out.valid.sum() == 10
    got = out.bits[out.valid]
    assert np.array_equal(got, bits.reshape(10, CFG.bits_per_frame))


def test_time_sharded_two_devices(stream):
    bits, frames = stream
    mesh = make_mesh(ch=1, time=2, devices=jax.devices()[:2])
    fn = make_time_sharded_rx(CFG, mesh, descramble=False)
    out = jax.tree.map(np.asarray, fn(jnp.asarray(frames)))
    assert out.valid.sum() == 10
    assert np.array_equal(out.bits[out.valid],
                          bits.reshape(10, CFG.bits_per_frame))


def test_2d_mesh_channels_and_time(stream):
    """Channels on 'ch' x time on 'time' simultaneously: vmap the
    time-sharded path over a sharded channel axis."""
    bits, frames = stream
    mesh = make_mesh(ch=4, time=2)
    from singlecarrier_tpu.parallel.timeshard import time_sharded_rx

    n_ch = 4
    batch = jnp.asarray(np.broadcast_to(
        frames, (n_ch, *frames.shape)).copy())

    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map
    from singlecarrier_tpu.modem.rx_production import prod_rx_stream

    def per_channel(frames_local):
        return time_sharded_rx(CFG, frames_local, mesh,
                               descramble=False)

    fn = jax.jit(jax.vmap(lambda f: per_channel(f)))
    out = jax.tree.map(np.asarray, fn(batch))
    for c in range(n_ch):
        assert out.valid[c].sum() == 10
        assert np.array_equal(out.bits[c][out.valid[c]],
                              bits.reshape(10, CFG.bits_per_frame))
