"""Continuous timing-drift (sample-rate offset) impairment tests.

SURVEY.md section 5 calls for timing-drift injection -- the impairment
the reference's ``rx_timing`` exists to absorb (reference:
src/qpsk.c:53, 157-162).  ``channel.sample_rate_offset`` models a
receiver clock running ppm fast/slow; the production RX re-hunts every
block (all lags x all decimation phases), so it must track the drifting
timing without loss at any realistic clock error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlecarrier_tpu.ber import ber_run
from singlecarrier_tpu.channel import sample_rate_offset
from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG


def test_resampler_identity_at_zero_ppm():
    x = jnp.asarray(np.random.default_rng(0).normal(size=512)
                    .astype(np.float32))
    y = sample_rate_offset(x, 0.0)
    # interior exact (the 8-tap stencil zeroes 3 head / 4 tail samples)
    np.testing.assert_allclose(np.asarray(y)[3:-4],
                               np.asarray(x)[3:-4], rtol=1e-6)


def test_resampler_tracks_drift():
    """A pure tone resampled at +100 ppm lands at f*(1+1e-4)."""
    fs = 8000.0
    n = 8192
    t = np.arange(n) / fs
    x = jnp.asarray(np.cos(2 * np.pi * 1100.0 * t).astype(np.float32))
    y = np.asarray(sample_rate_offset(x, 100.0))[64:-64]
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    f_peak = np.argmax(spec) * fs / len(y)
    # +100 ppm on a 1100 Hz tone = +0.11 Hz; bin spacing ~1 Hz, so just
    # assert the tone survived cleanly (no resampler artifacts)
    assert abs(f_peak - 1100.0) < 2.0
    # interpolation error floor: compare against the exact drifted tone
    t_drift = (np.arange(n) * (1 + 100e-6))[64:-64] / fs
    exact = np.cos(2 * np.pi * 1100.0 * t_drift)
    err = np.sqrt(np.mean((y - exact) ** 2))
    # -60 dBc relative to the tone's rms (1/sqrt(2))
    assert err < 1e-3 / np.sqrt(2), err


@pytest.mark.parametrize("ppm", [50.0, -50.0])
def test_decode_under_drift_clean(ppm):
    """20-packet stream at +-50 ppm clock skew, no noise: every packet
    decodes error-free (the per-block re-hunt absorbs the drifting
    timing; total drift over the stream ~ 2.8 samples)."""
    p = ber_run(CFG, jax.random.PRNGKey(11), snr_db=None, ppm=ppm,
                n_packets=20, n_trials=1)
    assert p["detection_rate"] == 1.0, p
    assert p["ber"] == 0.0, p


def test_decode_under_drift_noisy():
    """Drift + 8 dB passband SNR: detection holds and BER stays in the
    same regime as the drift-free channel."""
    p = ber_run(CFG, jax.random.PRNGKey(12), snr_db=8.0, ppm=50.0,
                n_packets=10, n_trials=2)
    assert p["detection_rate"] >= 0.95, p
    assert p["ber"] < 1e-2, p
