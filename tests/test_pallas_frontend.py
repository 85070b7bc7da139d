"""Pallas fused front-end vs the XLA oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.dsp.fir import fir_init_state
from singlecarrier_tpu.dsp.mixer import mixer_init_phase
from singlecarrier_tpu.ops import frontend_reference, fused_frontend


def test_fused_frontend_matches_oracle():
    rng = np.random.default_rng(0)
    C = 256
    pcm = jnp.asarray(
        rng.integers(-16384, 16384, (C, CFG.frame_size)).astype(np.int16))
    ph = mixer_init_phase((C,))
    tail = fir_init_state(49, (C,))

    fr, fi, tr, ti, pr, pi = fused_frontend(
        CFG, pcm, ph.real, ph.imag, tail.real, tail.imag, interpret=True)
    filt, ntail, nph = frontend_reference(CFG, pcm, ph, tail)

    assert float(jnp.max(jnp.abs(fr + 1j * fi - filt))) < 1e-5
    assert float(jnp.max(jnp.abs(tr + 1j * ti - ntail))) < 1e-6
    assert float(jnp.max(jnp.abs(pr + 1j * pi - nph))) < 1e-6


def test_fused_frontend_decim_aligned_layouts():
    """The lane-aligned decimating kernel (phase offset folded into the
    tap-matrix columns) equals the original per-phase-slice kernel in
    both output layouts, and the transposed layout is an exact
    transpose of the channel-major one."""
    from singlecarrier_tpu.ops.frontend_pallas import fused_frontend_decim

    rng = np.random.default_rng(2)
    C = 8
    pcm = jnp.asarray(
        rng.integers(-16384, 16384, (C, CFG.frame_size)).astype(np.int16))
    ph = mixer_init_phase((C,))
    tail = fir_init_state(49, (C,))
    args = (CFG, pcm, ph.real, ph.imag, tail.real, tail.imag)

    d_old = fused_frontend_decim(*args, block_channels=8, aligned=False,
                                 interpret=True)[0]
    d_new = fused_frontend_decim(*args, block_channels=8, aligned=True,
                                 interpret=True)[0]
    d_t = fused_frontend_decim(*args, block_channels=8, aligned=True,
                               transposed=True, interpret=True)[0]

    assert np.allclose(np.asarray(d_old), np.asarray(d_new),
                       atol=1e-2, rtol=1e-2)     # bf16 z-buffer paths
    assert np.array_equal(np.asarray(d_t),
                          np.asarray(jnp.transpose(d_new, (1, 2, 0, 3))))


def test_fused_frontend_streaming_continuity():
    """Two chunked invocations with carried tail/phase == one long
    XLA-filtered stream."""
    rng = np.random.default_rng(1)
    C = 256
    pcm = jnp.asarray(
        rng.integers(-16384, 16384,
                     (C, 2 * CFG.frame_size)).astype(np.int16))
    ph = mixer_init_phase((C,))
    tail = fir_init_state(49, (C,))

    a = fused_frontend(CFG, pcm[:, :CFG.frame_size], ph.real, ph.imag,
                       tail.real, tail.imag, interpret=True)
    b = fused_frontend(CFG, pcm[:, CFG.frame_size:], a[4], a[5],
                       a[2], a[3], interpret=True)
    got = np.concatenate(
        [np.asarray(a[0] + 1j * a[1]), np.asarray(b[0] + 1j * b[1])],
        axis=-1)

    filt1, ntail, nph = frontend_reference(
        CFG, pcm[:, :CFG.frame_size], ph, tail)
    filt2, _, _ = frontend_reference(
        CFG, pcm[:, CFG.frame_size:], nph, ntail)
    ref = np.concatenate([np.asarray(filt1), np.asarray(filt2)], axis=-1)
    assert np.max(np.abs(got - ref)) < 1e-5
