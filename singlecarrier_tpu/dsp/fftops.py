"""FFT utilities + FFT-based carrier-frequency-offset search.

The reference ships a KISS-FFT derivative that is compiled but never
called (reference: src/fft.c, included only at src/qpsk.c:20 --
SURVEY.md quirk #4); the north-star design promotes it to a live
feature: FFT-based frequency-offset search.  On TPU the FFT itself is
``jnp.fft`` (XLA); this module implements the modem-level feature:

  CFO estimation from the preamble: the received preamble chips are
  r[k] ~ a * p[k] * exp(j(2 pi df k / RS + phi)); multiplying by the
  known +/-1 chips strips the modulation, leaving a pure tone whose
  zero-padded-FFT peak (with parabolic interpolation) is the offset.
  Unambiguous range +/- RS/2.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def fft(x, n=None, axis=-1):
    """Complex FFT (the reference's fft(), fft.h:48)."""
    return jnp.fft.fft(x, n=n, axis=axis)


def ifft(x, n=None, axis=-1):
    return jnp.fft.ifft(x, n=n, axis=axis)


def rfft(x, n=None, axis=-1):
    """Real-input FFT (the reference's fftr wrappers, fft.c:52-186)."""
    return jnp.fft.rfft(x, n=n, axis=axis)


def irfft(x, n=None, axis=-1):
    return jnp.fft.irfft(x, n=n, axis=axis)


@functools.lru_cache(maxsize=8)
def _dft_matrix(p: int, nfft: int):
    """[p, nfft] DFT analysis matrix (host, complex64)."""
    k = np.arange(p)[:, None]
    f = np.arange(nfft)[None, :]
    return np.exp(-2j * np.pi * k * f / nfft).astype(np.complex64)


def estimate_cfo(chips, pn, symbol_rate: float, *, nfft: int = 512,
                 method: str = "dft"):
    """Estimate carrier offset (Hz) from received preamble chips.

    Args:
      chips: [..., P] received complex chips at the symbol rate.
      pn:    [P] known +/-1 chip sequence (modulation wipe-off).
      symbol_rate: chips per second.
      nfft:  zero-padded FFT length (resolution = rs/nfft before
             interpolation).

    Returns (cfo_hz, peak_power): both [...]-shaped float32.
    """
    # wipe off +/-1 modulation; pn must be REAL (complex host constants
    # cannot cross to device on the axon backend -- utils/compat.py)
    tone = chips * pn
    if method == "dft":
        # Zero-padded spectrum as matmuls (MXU) instead of a batched
        # length-nfft FFT of a length-P signal, in bf16: the spectrum
        # only feeds a peak search + parabolic interpolation, well
        # within bf16's ~3 significant digits.
        wm = _dft_matrix(int(tone.shape[-1]), int(nfft))
        wr = jnp.asarray(wm.real).astype(jnp.bfloat16)
        wi = jnp.asarray(wm.imag).astype(jnp.bfloat16)
        tr = tone.real.astype(jnp.bfloat16)
        ti = tone.imag.astype(jnp.bfloat16)
        f32 = jnp.float32
        sr = jnp.matmul(tr, wr, preferred_element_type=f32) \
            - jnp.matmul(ti, wi, preferred_element_type=f32)
        si = jnp.matmul(tr, wi, preferred_element_type=f32) \
            + jnp.matmul(ti, wr, preferred_element_type=f32)
        power = sr * sr + si * si
    else:
        spec = jnp.fft.fft(tone, n=nfft, axis=-1)
        power = spec.real ** 2 + spec.imag ** 2
    k = jnp.argmax(power, axis=-1)

    # Parabolic interpolation around the peak for sub-bin accuracy.
    km = (k - 1) % nfft
    kp = (k + 1) % nfft
    pm = jnp.take_along_axis(power, km[..., None], -1)[..., 0]
    p0 = jnp.take_along_axis(power, k[..., None], -1)[..., 0]
    pp = jnp.take_along_axis(power, kp[..., None], -1)[..., 0]
    denom = pm - 2.0 * p0 + pp
    delta = jnp.where(jnp.abs(denom) > 1e-20,
                      0.5 * (pm - pp) / denom, 0.0)
    kf = k.astype(jnp.float32) + delta
    # Map bin to signed frequency.
    kf = jnp.where(kf > nfft / 2, kf - nfft, kf)
    return kf * (symbol_rate / nfft), p0


def wipeoff_rotation(n_sym: int, cfo_hz, symbol_rate: float):
    """Rotation ``exp(-j 2 pi cfo k / rs)`` to de-rotate symbols after a
    CFO estimate; ``cfo_hz`` may be traced (per-channel)."""
    k = jnp.arange(n_sym, dtype=jnp.float32)
    ang = -2.0 * np.pi * cfo_hz[..., None] / symbol_rate * k
    return jnp.exp(1j * ang).astype(jnp.complex64)
