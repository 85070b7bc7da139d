"""Golden tests: TX chain vs the reference modulator
(reference: src/qpsk.c:251-342, 373-415)."""

import jax
import jax.numpy as jnp
import numpy as np

from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.modem import qpsk_demod, qpsk_mod, tx_stream


def test_qpsk_mod_gray_map():
    # -1+j1 10 | 00 +1+j1 / -1-j1 11 | 01 +1-j1 (qpsk.c:244-250)
    bits = jnp.asarray([0, 0, 1, 0, 0, 1, 1, 1], jnp.uint8)  # [Q,I] pairs
    syms = np.asarray(qpsk_mod(bits))
    assert np.array_equal(syms, [1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j])


def test_demod_inverts_mod():
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, 64, dtype=np.uint8))
    rec = qpsk_demod(qpsk_mod(bits))
    assert np.array_equal(np.asarray(rec), np.asarray(bits))


def test_tx_stream_matches_reference_pcm(golden):
    """The full 10-packet TX stream vs the patched-C harness output.

    The closed-form mixer reassociates float ops vs the reference's
    iterated phasor (documented deviation, SURVEY.md quirk #9); the
    int16 outputs must agree to within a couple of LSBs at amplitude
    16384.
    """
    bits = jnp.asarray(golden["tx_bits"].reshape(10, CFG.ns,
                                                 CFG.data_symbols * 2))
    pcm = np.asarray(jax.jit(lambda b: tx_stream(CFG, b))(bits))
    ref = golden["tx_pcm"]
    assert pcm.shape == ref.shape
    diff = np.abs(pcm.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2, f"max int16 diff {diff.max()}"
    # overwhelming majority should be exact (measured ~0.91)
    assert (diff == 0).mean() > 0.85


def test_tx_packet_structure(golden):
    """Packet layout: 640 preamble + 1240 data + 903 zeros (qpsk.c:380-413)."""
    bits = jnp.asarray(golden["tx_bits"].reshape(10, CFG.ns,
                                                 CFG.data_symbols * 2))
    pcm = np.asarray(tx_stream(CFG, bits))
    pkt = CFG.packet_size
    assert pkt == 2783
    for k in range(10):
        gap = pcm[k * pkt + CFG.frame_size:(k + 1) * pkt]
        assert np.all(gap == 0)
    # preamble at half amplitude: max |pcm| over preamble < data max
    pre = pcm[:CFG.preamble_size]
    data = pcm[CFG.preamble_size:CFG.frame_size]
    assert np.abs(pre).max() < np.abs(data).max()


def test_golden_raw_structure(golden_raw):
    """The shipped vector is exactly 10 packets (SURVEY.md C12)."""
    assert len(golden_raw) == 10 * CFG.packet_size
