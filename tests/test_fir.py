"""Golden tests: batched overlap-save FIR vs the reference delay line
(reference: src/fir.c:22-43)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singlecarrier_tpu.constants import ALPHA35_ROOT
from singlecarrier_tpu.dsp.fir import fir_block, fir_init_state

GAIN = 2.2


@pytest.mark.parametrize("method", ["direct", "banded"])
def test_fir_matches_reference_trajectory(golden, method):
    x = jnp.asarray(golden["fir_in"])
    state = fir_init_state(49)
    y, _ = jax.jit(
        lambda s, x: fir_block(ALPHA35_ROOT, GAIN, s, x, method=method)
    )(state, x)
    ref = golden["fir_out"]
    err = np.max(np.abs(np.asarray(y) - ref))
    scale = np.max(np.abs(ref))
    # float32 reassociation only; the C loop sums 49 taps sequentially.
    assert err < 2e-5 * scale


@pytest.mark.parametrize("method", ["direct", "banded"])
def test_fir_streaming_equals_full(method):
    """Chunked filtering with carried halo == one-shot filtering."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(1000) + 1j * rng.standard_normal(1000),
                    jnp.complex64)
    state = fir_init_state(49)
    y_full, _ = fir_block(ALPHA35_ROOT, GAIN, state, x, method=method)

    state = fir_init_state(49)
    outs = []
    for chunk in (x[:123], x[123:400], x[400:1000]):
        y, state = fir_block(ALPHA35_ROOT, GAIN, state, chunk, method=method)
        outs.append(np.asarray(y))
    y_chunks = np.concatenate(outs)
    assert np.max(np.abs(y_chunks - np.asarray(y_full))) < 1e-5


def test_fir_methods_agree():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(777) + 1j * rng.standard_normal(777),
                    jnp.complex64)
    state = fir_init_state(49)
    ya, _ = fir_block(ALPHA35_ROOT, GAIN, state, x, method="direct")
    yb, _ = fir_block(ALPHA35_ROOT, GAIN, state, x, method="banded")
    assert np.max(np.abs(np.asarray(ya) - np.asarray(yb))) < 1e-5


def test_fir_batched():
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.standard_normal((8, 300)) + 1j * rng.standard_normal((8, 300)),
        jnp.complex64)
    state = fir_init_state(49, (8,))
    y, new_state = fir_block(ALPHA35_ROOT, GAIN, state, x)
    assert y.shape == (8, 300)
    assert new_state.shape == (8, 48)
    # each row filters independently
    y0, _ = fir_block(ALPHA35_ROOT, GAIN, fir_init_state(49), x[0])
    assert np.max(np.abs(np.asarray(y[0]) - np.asarray(y0))) < 1e-6


def test_fir_impulse_response_is_taps():
    x = jnp.zeros(100, jnp.complex64).at[0].set(1.0)
    y, _ = fir_block(ALPHA35_ROOT, 1.0, fir_init_state(49), x,
                     method="direct")
    # The delay-line form: impulse emerges reversed tap order with the
    # newest-sample tap first... taps are symmetric so y[:49] == taps.
    assert np.allclose(np.asarray(y[:49]).real, ALPHA35_ROOT, atol=1e-7)
