"""Golden integration tests: full RX chain vs the patched C reference.

BASELINE.json config #1: demodulate preamble_qpsk_8k.raw at 8 kHz, zero
offset, and verify frame decisions/bits against the compiled reference
(reference: src/qpsk.c:133-239 via tools/gen_golden.py fixtures).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.modem import make_rx_stream_fn, rx_init


def _run_rx(pcm: np.ndarray, freq_offset: float = 0.0):
    nframes = len(pcm) // CFG.frame_size
    frames = jnp.asarray(
        pcm[:nframes * CFG.frame_size].reshape(nframes, CFG.frame_size))
    fn = make_rx_stream_fn(CFG, freq_offset=freq_offset)
    state, out = fn(rx_init(CFG), frames)
    return state, jax.tree.map(np.asarray, out)


def _check_against(golden, tag, out):
    assert np.array_equal(out.valid.astype(np.int32), golden[f"{tag}_valid"])
    assert np.array_equal(out.max_index, golden[f"{tag}_max_index"])
    assert np.array_equal(out.matches, golden[f"{tag}_matches"])
    # correlation peak power: float32 relative agreement
    assert np.allclose(out.max_value, golden[f"{tag}_max_value"],
                       rtol=1e-3, atol=1e-3)
    assert np.allclose(out.mean, golden[f"{tag}_mean"], rtol=1e-3, atol=1e-3)
    # bits: the C only writes bits[] on the hit branch (qpsk.c:206-215);
    # the harness zero-fills, so invalid frames are all-zero in the
    # fixture.  Compare where defined.
    valid = golden[f"{tag}_valid"].astype(bool)
    assert np.array_equal(out.bits[valid], golden[f"{tag}_bits"][valid]), (
        "bit mismatch on valid frames")


def test_rx_on_shipped_golden_vector(golden, golden_raw):
    """Config #1: bit-exact frame decisions on preamble_qpsk_8k.raw."""
    _, out = _run_rx(golden_raw)
    _check_against(golden, "rxg", out)


def test_rx_on_harness_tx_stream(golden):
    """Known-payload loopback: RX over the harness's deterministic TX."""
    _, out = _run_rx(golden["tx_pcm"])
    _check_against(golden, "rxt", out)


def test_rx_timing_trajectory(golden, golden_raw):
    """The rx_timing clobber (qpsk.c:219) evolves identically."""
    state, out = _run_rx(golden_raw)
    # final rx_timing must match the C's final value
    assert int(state.rx_timing) == golden["rxg_rx_timing"][-1]


def test_batched_rx_matches_single(golden_raw):
    """vmap over channels reproduces the single-channel result."""
    nframes = len(golden_raw) // CFG.frame_size
    frames = jnp.asarray(
        golden_raw[:nframes * CFG.frame_size].reshape(nframes, CFG.frame_size))
    single_fn = make_rx_stream_fn(CFG)
    _, single = single_fn(rx_init(CFG), frames)

    batch = jnp.stack([frames] * 4)
    batch_fn = make_rx_stream_fn(CFG, batched=True)
    _, batched = batch_fn(rx_init(CFG, (4,)), batch)
    for c in range(4):
        assert np.array_equal(np.asarray(batched.valid[c]),
                              np.asarray(single.valid))
        assert np.array_equal(np.asarray(batched.bits[c]),
                              np.asarray(single.bits))


def test_rx_with_frequency_offset_matches_reference(golden, golden_raw):
    """Faithful-mode parity with the reference compiled at FOFFSET=20 Hz
    (the compile-time offset knob, qpsk.c:67) -- BASELINE config #2's
    faithful anchor."""
    _, out = _run_rx(golden_raw, freq_offset=20.0)
    assert np.array_equal(out.valid.astype(np.int32),
                          golden["f20_rxg_valid"])
    assert np.array_equal(out.max_index, golden["f20_rxg_max_index"])
    assert np.array_equal(out.matches, golden["f20_rxg_matches"])
    valid = golden["f20_rxg_valid"].astype(bool)
    assert np.array_equal(out.bits[valid], golden["f20_rxg_bits"][valid])
