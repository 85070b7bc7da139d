"""Runtime layer tests: streaming driver, checkpoint/resume, metrics."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.modem import tx_stream
from singlecarrier_tpu.runtime import (
    MetricsAggregator,
    StreamDemodulator,
    restore_state,
    save_state,
)


def _stream(n_channels=3, n_packets=4, seed=21):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (n_packets, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), flush_gap=True))
    n_blocks = -(-len(pcm) // CFG.frame_size)
    buf = np.zeros(n_blocks * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    blocks = buf.reshape(n_blocks, CFG.frame_size)
    return bits, np.broadcast_to(blocks[:, None, :],
                                 (n_blocks, n_channels,
                                  CFG.frame_size)).copy()


def test_stream_demodulator_end_to_end():
    bits, blocks = _stream()
    demod = StreamDemodulator(CFG, n_channels=3, descramble=False)
    packets = []
    for block in blocks:
        packets += demod.collect_packets(demod.push(block))
    packets += demod.collect_packets(demod.flush())
    # 4 packets x 3 channels
    assert len(packets) == 12
    ref = bits.reshape(4, CFG.bits_per_frame)
    per_ch = {}
    for c, b in packets:
        per_ch.setdefault(c, []).append(b)
    for c in range(3):
        assert np.array_equal(np.stack(per_ch[c]), ref)
    s = demod.metrics.summary()
    assert s["packets"] == 12
    assert s["mean_matches"] == 128.0


def test_checkpoint_resume_bit_identical(tmp_path):
    """Stop mid-stream, checkpoint, restore in a fresh demodulator,
    continue: identical decode to the uninterrupted run."""
    bits, blocks = _stream(seed=22)
    n = len(blocks)
    cut = n // 2

    full = StreamDemodulator(CFG, n_channels=3, descramble=False)
    full_out = [full.push(b) for b in blocks]

    a = StreamDemodulator(CFG, n_channels=3, descramble=False)
    for b in blocks[:cut]:
        a.push(b)
    path = os.path.join(tmp_path, "ckpt.pkl")
    save_state(path, a.state, step=cut)

    b2 = StreamDemodulator(CFG, n_channels=3, descramble=False)
    b2.state, step = restore_state(path, like=b2.state)
    assert step == cut
    rest = [b2.push(b) for b in blocks[cut:]]

    for i, out in enumerate(rest):
        ref = full_out[cut + i]
        assert np.array_equal(np.asarray(out.valid), np.asarray(ref.valid))
        assert np.array_equal(np.asarray(out.bits), np.asarray(ref.bits))


def test_metrics_aggregator_counts():
    m = MetricsAggregator()
    assert m.summary()["packets"] == 0
