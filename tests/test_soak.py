"""Soak test: long multi-channel stream with per-channel impairments
through the streaming runtime (config #4 flavored)."""

import jax
import jax.numpy as jnp
import numpy as np

from singlecarrier_tpu.channel import channel
from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.modem import tx_stream
from singlecarrier_tpu.runtime import StreamDemodulator, ThroughputMeter


def test_long_stream_soak():
    n_packets = 20
    n_channels = 4
    rng = np.random.default_rng(55)
    bits = rng.integers(0, 2, (n_packets, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), scramble=True,
                               flush_gap=True)).astype(np.float32)

    offsets = [0.0, 11.0, -23.0, 37.0]
    snrs = [None, 18.0, 14.0, 12.0]
    keys = jax.random.split(jax.random.PRNGKey(56), n_channels)
    streams = np.stack([
        np.asarray(channel(k, jnp.asarray(pcm), snr_db=s, freq_hz=f,
                           fs=CFG.fs)).astype(np.int16)
        for k, f, s in zip(keys, offsets, snrs)])

    n_blocks = -(-streams.shape[1] // CFG.frame_size)
    buf = np.zeros((n_channels, n_blocks * CFG.frame_size), np.int16)
    buf[:, :streams.shape[1]] = streams

    demod = StreamDemodulator(CFG, n_channels=n_channels,
                              descramble=True)
    meter = ThroughputMeter()
    packets = {c: [] for c in range(n_channels)}
    for b in range(n_blocks):
        out = demod.push(buf[:, b * CFG.frame_size:(b + 1) * CFG.frame_size])
        meter.add(n_channels * CFG.frame_size)
        for c, pkt in demod.collect_packets(out):
            packets[c].append(pkt)
    for c, pkt in demod.collect_packets(demod.flush()):
        packets[c].append(pkt)

    ref = bits.reshape(n_packets, CFG.bits_per_frame)
    for c in range(n_channels):
        got = np.stack(packets[c])
        assert got.shape[0] == n_packets, (
            f"channel {c}: {got.shape[0]}/{n_packets} packets")
        ber = np.mean(got != ref)
        assert ber < 0.005, f"channel {c} ber {ber}"

    s = demod.metrics.summary()
    assert s["packets"] == n_packets * n_channels
    assert meter.summary()["samples"] == n_channels * n_blocks * CFG.frame_size
