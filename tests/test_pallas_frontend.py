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


def test_fused_frontend_decim_mixer_fold():
    """The mixer-folded kernel (complex decimation taps + post-decim
    rotation, ONE raw z plane) equals the premix aligned kernel across
    a carried-state block boundary, at f32 exactly and bf16 within
    quantization."""
    from singlecarrier_tpu.ops.frontend_pallas import fused_frontend_decim

    rng = np.random.default_rng(5)
    C = 8
    pcm = jnp.asarray(rng.integers(
        -16384, 16384, (C, 2 * CFG.frame_size)).astype(np.int16))
    th = rng.uniform(0, 2 * np.pi, C)
    phr = jnp.asarray(np.cos(th).astype(np.float32))
    phi = jnp.asarray(np.sin(th).astype(np.float32))
    tl = jnp.zeros((C, 48), jnp.float32)

    for dt, tol in (("f32", 1e-5), ("bf16", 2e-2)):
        cfg = CFG.replace(frontend_dtype=dt)

        def run(fold):
            a = fused_frontend_decim(
                cfg, pcm[:, :cfg.frame_size], phr, phi, tl, tl,
                block_channels=8, mixer_fold=fold, interpret=True)
            b = fused_frontend_decim(
                cfg, pcm[:, cfg.frame_size:], a[3], a[4], a[1], a[2],
                block_channels=8, mixer_fold=fold, interpret=True)
            return np.asarray(a[0]), np.asarray(b[0])

        a0, b0 = run(False)
        a1, b1 = run(True)
        assert np.max(np.abs(a0 - a1)) < tol, dt
        assert np.max(np.abs(b0 - b1)) < tol, dt   # carried raw tail


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
