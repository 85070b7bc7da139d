"""Shape/dtype assertion layer + checkify float checks
(runtime/validate.py; SURVEY.md section 5 "sanitizers")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.modem import prod_rx_init
from singlecarrier_tpu.modem.rx_production import prod_rx_frame
from singlecarrier_tpu.runtime import (StreamDemodulator,
                                       assert_pcm_block,
                                       assert_rx_state, checkify_step)


def test_assert_rx_state_accepts_valid():
    assert_rx_state(CFG, prod_rx_init(CFG, (4,)), 4)
    assert_rx_state(CFG, prod_rx_init(CFG))


def test_assert_rx_state_rejects_wrong_shape():
    st = prod_rx_init(CFG, (4,))
    bad = st._replace(fir_tail=st.fir_tail[:, :10])
    with pytest.raises(AssertionError):
        assert_rx_state(CFG, bad, 4)


def test_assert_pcm_block_rejects_float():
    pcm = np.zeros((2, CFG.frame_size), np.float32)
    with pytest.raises(AssertionError, match="int16"):
        assert_pcm_block(CFG, pcm, 2)


def test_stream_demodulator_validate_flag():
    demod = StreamDemodulator(CFG, 2, metrics=False, validate=True)
    out = demod.push(np.zeros((2, CFG.frame_size), np.int16))
    assert not bool(np.asarray(out.valid).any())
    with pytest.raises(AssertionError):
        demod.push(np.zeros((2, CFG.frame_size), np.float32))


def test_checkify_step_flags_internal_nan():
    """A NaN smuggled into the carried state must surface as a checked
    error from inside the step, not silently propagate."""
    step = checkify_step(
        lambda st, pcm: prod_rx_frame(CFG, st, pcm, descramble=False))
    st = prod_rx_init(CFG)
    pcm = jnp.zeros((CFG.frame_size,), jnp.int16)
    step(st, pcm)  # clean state passes

    bad = st._replace(phase=jnp.complex64(jnp.nan + 0j))
    with pytest.raises(Exception, match="non-finite.*phase"):
        step(bad, pcm)
