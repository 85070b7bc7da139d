"""Pallas fused decode kernel: packet window -> payload dibits + stats.

Fuses every post-extraction RX stage into ONE VMEM-resident kernel per
channel block (the XLA path runs these as ~40 separate HBM-roundtrip
ops -- the dominant cost after the front-end):

  energy gate -> CFO search (in-kernel DFT matmul + one-hot parabolic
  peak) -> de-rotation -> LS equalizer fit (normal equations via
  static shifted reductions + unrolled Cholesky) -> guarded
  decision-directed refit -> one-shot decode -> clamped phase/freq
  refinement -> descramble.

Everything is static-offset (the packet window is extracted aligned,
modem/rx_production.py) and complex travels as real/imag planes.
Mosaic constraints respected: accumulation through refs where live
ranges are big, no dynamic lane slices, one fat output (dibits +
stats packed in one f32 array).

Numerical notes vs the XLA path: the phase-refinement angle uses the
small-angle ratio imag/real (valid because corrections are clamped to
<= pi/8) instead of atan2; agreement is verified to decision level in
tests/test_decode_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModemConfig
from ..constants import PREAMBLE_VALUES, scramble_dibit_mask
from ..dsp.fftops import _dft_matrix


@functools.lru_cache(maxsize=8)
def _segment_band_matrix_smaj(n_lags: int, n_lags_pad: int, n_seg: int,
                              p: int, off: int, klen_pad: int = 0):
    """Segment-MAJOR banded correlation matrix for the in-kernel hunt.

    B[off + l + s*seg + k, s*n_lags_pad + l] = v[s*seg + k] -- same
    band as rx_production._segment_band_matrix but with

      * columns grouped by segment (s-major) so the per-segment power
        sum is a static 128-aligned lane slice inside the kernel,
      * the lag axis padded to ``n_lags_pad`` (a multiple of 128; the
        pad columns are zero, so their correlation power is 0 and can
        never win the argmax over real lags),
      * ``off`` leading zero rows so the matrix contracts directly
        against the left-padded hunt windows (packet alignment pad,
        modem/rx_production.py prod_rx_batch),
      * the row (window) axis padded with zero rows to ``klen_pad``
        (128-multiple) so the kernel's x-operand slice is lane-ALIGNED
        -- a [:, :505] slice forces a Mosaic relayout roll per plane
        before every chunk matmul; [:, :512] is free.
    """
    v = PREAMBLE_VALUES.astype(np.float32)
    seg = p // n_seg
    klen = max(off + n_lags + p - 1, klen_pad)
    b = np.zeros((klen, n_seg * n_lags_pad), np.float32)
    for s in range(n_seg):
        chips = v[s * seg:(s + 1) * seg]
        for l in range(n_lags):
            r0 = off + l + s * seg
            b[r0:r0 + seg, s * n_lags_pad + l] = chips
    return b


@functools.lru_cache(maxsize=8)
def _segment_band_matrix_lagtile(n_lags: int, n_seg: int, p: int,
                                 off: int, tile: int = 128,
                                 kwin: int = 384):
    """Lag-TILED banded correlation matrices.

    The segment-major band (``_segment_band_matrix_smaj``) contracts
    every lag against the full K=512 window -- 16 nonzero chips per
    column out of 512 rows (a 32x im2col inflation, the price of an
    MXU formulation).  Tiling the lag axis into ``tile``-lag groups
    shrinks each group's window span to off + (tile-1) + p - 1 <= 257
    rows -> K=384 aligned: 3 matmuls of [*, 384] x [384, n_seg*tile]
    instead of chunks of [*, 512], a 1.33x FLOP cut with identical
    values (int8/int32 accumulation is exact; f32 differs only by
    reassociation).

    Returns [n_tiles, kwin, n_seg*tile]; tile t's x-operand is the
    128-aligned window slice [t*tile, t*tile + kwin).
    """
    v = PREAMBLE_VALUES.astype(np.float32)
    seg = p // n_seg
    n_tiles = -(-n_lags // tile)
    assert off + (tile - 1) + p - 1 < kwin, (off, tile, p, kwin)
    b = np.zeros((n_tiles, kwin, n_seg * tile), np.float32)
    for t in range(n_tiles):
        for ll in range(min(tile, n_lags - t * tile)):
            l = t * tile + ll
            for s in range(n_seg):
                r0 = off + ll + s * seg
                b[t, r0:r0 + seg, s * tile + ll] = v[s * seg:(s + 1) * seg]
    return b


def _reduce_last(x):
    return jnp.sum(x, axis=-1, keepdims=True)          # [cb, 1]


@functools.lru_cache(maxsize=8)
def _energy_band_smaj(n_lags: int, n_lags_pad: int, p: int, off: int,
                      klen_pad: int = 0):
    """Ones band for the per-lag window ENERGY (hunt_norm="energy"/"espan"
    denominator): E[off + l + k, l] = 1 for k < p.  Same row
    conventions as _segment_band_matrix_smaj.  Pad lag columns are
    zero -> zero energy -> zero normalized metric (never win)."""
    klen = max(off + n_lags + p - 1, klen_pad)
    b = np.zeros((klen, n_lags_pad), np.float32)
    for l in range(n_lags):
        b[off + l:off + l + p, l] = 1.0
    return b


@functools.lru_cache(maxsize=8)
def _energy_band_lagtile(n_lags: int, p: int, off: int,
                         tile: int = 128, kwin: int = 384):
    """Lag-tiled ones band for the window energy (the lagtile-schedule
    counterpart of _energy_band_smaj; same x-slices as
    _segment_band_matrix_lagtile)."""
    n_tiles = -(-n_lags // tile)
    b = np.zeros((n_tiles, kwin, tile), np.float32)
    for t in range(n_tiles):
        for ll in range(min(tile, n_lags - t * tile)):
            b[t, off + ll:off + ll + p, ll] = 1.0
    return b


@functools.lru_cache(maxsize=4)
def _pn_bvec_band(p: int, L: int, kb: int):
    """Banded PN matrix for the TRAIN b-vector as ONE MXU matmul.

    b[i] = sum_u conj(w[u]) pn[u - i]  (the cross-correlation of the
    train window with the known preamble at lags 0..L-1), so
    B[u, i] = pn[u - i] and b_r = w_r @ B, b_i = -w_i @ B -- two
    [cb, kb] x [kb, 128] matmuls replace 2L wide product+reduce
    chains (the issue-bound tail the profiler flagged; VERDICT r3
    next-step 5).  kb/128-padded for lane alignment; pad rows/cols
    are zero.
    """
    v = PREAMBLE_VALUES.astype(np.float32)
    b = np.zeros((kb, 128), np.float32)
    for i in range(L):
        b[i:i + p, i] = v
    return b


def _solve_chol(A_r, A_i, b_r, b_i, L):
    """Unrolled complex Cholesky solve on [cb,1]-shaped scalars.

    A as dicts of planes A_r[(i,j)], lower triangle i>=j; b planes
    lists.  Returns coeff planes (lists of [cb,1]).
    """
    c_r = [[None] * L for _ in range(L)]
    c_i = [[None] * L for _ in range(L)]
    for j in range(L):
        s = A_r[(j, j)]
        for k in range(j):
            s = s - (c_r[j][k] * c_r[j][k] + c_i[j][k] * c_i[j][k])
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        c_r[j][j] = d
        c_i[j][j] = jnp.zeros_like(d)
        inv = 1.0 / d
        for i in range(j + 1, L):
            tr, ti = A_r[(i, j)], A_i[(i, j)]
            for k in range(j):
                # t -= c[i][k] * conj(c[j][k])
                tr = tr - (c_r[i][k] * c_r[j][k] + c_i[i][k] * c_i[j][k])
                ti = ti - (c_i[i][k] * c_r[j][k] - c_r[i][k] * c_i[j][k])
            c_r[i][j] = tr * inv
            c_i[i][j] = ti * inv

    # forward C y = b
    y_r, y_i = [None] * L, [None] * L
    for i in range(L):
        tr, ti = b_r[i], b_i[i]
        for k in range(i):
            tr = tr - (c_r[i][k] * y_r[k] - c_i[i][k] * y_i[k])
            ti = ti - (c_r[i][k] * y_i[k] + c_i[i][k] * y_r[k])
        inv = 1.0 / c_r[i][i]
        y_r[i], y_i[i] = tr * inv, ti * inv

    # back C^H x = y   (C^H entries conj(c[k][i]))
    x_r, x_i = [None] * L, [None] * L
    for i in reversed(range(L)):
        tr, ti = y_r[i], y_i[i]
        for k in range(i + 1, L):
            # t -= conj(c[k][i]) * x[k]
            tr = tr - (c_r[k][i] * x_r[k] + c_i[k][i] * x_i[k])
            ti = ti - (c_r[k][i] * x_i[k] - c_i[k][i] * x_r[k])
        inv = 1.0 / c_r[i][i]
        x_r[i], x_i[i] = tr * inv, ti * inv
    return x_r, x_i


def _gram_direct(pr, pi, sl_r, sl_i, L, count):
    """Gram entries as L*(L+1)/2 independent products + reductions."""
    A_r, A_i = {}, {}
    for i in range(L):
        for j in range(i + 1):
            # A[i][j] = sum_t conj(w[t+i]) w[t+j]  (lower triangle):
            # Im = r_i*i_j - i_i*r_j.  (A sign flip here builds conj(A)
            # and silently solves the wrong normal equations -- nearly
            # invisible on preamble-dominated windows where A is real,
            # but it flipped ~1e-3 of payload bits at 12 dB on
            # hardware; tools/tpu_parity.py caught it.)
            A_r[(i, j)] = _reduce_last(sl_r[i] * sl_r[j]
                                       + sl_i[i] * sl_i[j])
            A_i[(i, j)] = _reduce_last(sl_r[i] * sl_i[j]
                                       - sl_i[i] * sl_r[j])
    return A_r, A_i


def _gram_sliding(pr, pi, L, count):
    """Gram via lag products + prefix-corrected partial sums (EXACT).

    All entries with the same lag d = i - j sum the SAME lag-product
    array g_d[u] = conj(w[u]) w[u+d] over shifted windows
    [j, j+count): compute g_d once (L complex wide products instead of
    L(L+1)/2), reduce the j=0 window, and step j -> j+1 with two
    [cb, 1] scalar corrections.  ~2.5x fewer wide VPU ops than
    ``_gram_direct``; numerically identical up to fp reassociation of
    the same terms (the parity criterion is decision-level,
    tools/tpu_parity.py).
    """
    W = pr.shape[-1]                                   # count + L - 1
    A_r, A_i = {}, {}
    for d in range(L):
        a_r, a_i = pr[:, :W - d], pi[:, :W - d]
        b_r, b_i = pr[:, d:], pi[:, d:]
        # g_d[u] = conj(w[u]) w[u+d]
        g_r = a_r * b_r + a_i * b_i
        g_i = (a_r * b_i - a_i * b_r) if d else None
        s_r = _reduce_last(g_r[:, :count])
        s_i = _reduce_last(g_i[:, :count]) if d else None
        # A[(i, j)] with i-j = d: real = +sum g_r, imag = -sum g_i
        A_r[(d, 0)] = s_r
        if d:
            A_i[(d, 0)] = -s_i
        for j in range(1, L - d):
            s_r = (s_r - g_r[:, j - 1:j]
                   + g_r[:, count + j - 1:count + j])
            A_r[(d + j, j)] = s_r
            if d:
                s_i = (s_i - g_i[:, j - 1:j]
                       + g_i[:, count + j - 1:count + j])
                A_i[(d + j, j)] = -s_i
    for i in range(L):
        # never consumed by _solve_chol (diagonal of a Hermitian Gram
        # is real); present so both gram methods return the same keys
        A_i[(i, i)] = jnp.zeros_like(A_r[(i, i)])
    return A_r, A_i


def _fit(pr, pi, target_r, target_i, L, reg, count,
         gram: str = "direct", bw=None, pnb=None, offtap=None):
    """LS fit of sum_i coeff_i * w[t+i] ~ target[t] over t < count.

    pr/pi: [cb, count + L - 1] window planes; target planes [cb, count]
    (target_i may be None for a real target).  Returns coeff planes.
    ``bw``/``pnb``: optional (wide window planes, PN band matrix) --
    the b-vector as one MXU matmul per plane (_pn_bvec_band); train
    (known-target) fits only.
    """
    sl_r = [pr[:, i:i + count] for i in range(L)]
    sl_i = [pi[:, i:i + count] for i in range(L)]
    if gram == "sliding":
        A_r, A_i = _gram_sliding(pr, pi, L, count)
    else:
        A_r, A_i = _gram_direct(pr, pi, sl_r, sl_i, L, count)
    tr_mean = A_r[(0, 0)]
    for i in range(1, L):
        tr_mean = tr_mean + A_r[(i, i)]
    # center-tap reg + off-tap shrinkage prior (config.ls_offtap_reg;
    # offtap=None recovers the uniform ridge)
    ridge_c = reg * tr_mean / L + 1e-12
    ridge_o = ridge_c if offtap is None else \
        (offtap * tr_mean / L + 1e-12)
    for i in range(L):
        A_r[(i, i)] = A_r[(i, i)] + (ridge_c if i == L // 2
                                     else ridge_o)

    if bw is not None:
        f32 = jnp.float32
        br_m = jnp.dot(bw[0], pnb, preferred_element_type=f32)
        bi_m = jnp.dot(-bw[1], pnb, preferred_element_type=f32)
        b_r = [br_m[:, i:i + 1] for i in range(L)]
        b_i = [bi_m[:, i:i + 1] for i in range(L)]
        return _solve_chol(A_r, A_i, b_r, b_i, L)

    b_r, b_i = [], []
    for i in range(L):
        if target_i is None:
            b_r.append(_reduce_last(sl_r[i] * target_r))
            b_i.append(_reduce_last(-sl_i[i] * target_r))
        else:
            b_r.append(_reduce_last(sl_r[i] * target_r
                                    + sl_i[i] * target_i))
            b_i.append(_reduce_last(sl_r[i] * target_i
                                    - sl_i[i] * target_r))
    # NOTE b = C^H target => b_i uses conj(C): conj(w)*t.
    return _solve_chol(A_r, A_i, b_r, b_i, L)


def _apply(pr, pi, cr, ci, L, count):
    """raw[t] = sum_i coeff_i * w[t+i]; returns planes [cb, count]."""
    ar = jnp.zeros_like(pr[:, :count])
    ai = jnp.zeros_like(ar)
    for i in range(L):
        wr = pr[:, i:i + count]
        wi = pi[:, i:i + count]
        ar = ar + cr[i] * wr - ci[i] * wi
        ai = ai + cr[i] * wi + ci[i] * wr
    return ar, ai


def _apply_real(pr, pi, cr, ci, L, count):
    """Real plane of ``_apply`` only (identical fp sequence for ar).

    The train/refit guards consume just Re(eq): the preamble
    sign-match count.  Skipping the imaginary accumulation halves the
    guard-apply's wide ops."""
    ar = jnp.zeros_like(pr[:, :count])
    for i in range(L):
        ar = ar + cr[i] * pr[:, i:i + count] - ci[i] * pi[:, i:i + count]
    return ar


def _cossin_small(x):
    """cos/sin via Taylor polynomials, valid for |x| <= ~0.8 rad.

    The refine-loop corrections are clamped to |a| + |b|*D <= pi/4, so
    range reduction is unnecessary: 4th/5th-order truncation keeps the
    rotation error < 4e-4 rad -- far below the decision noise at any
    operating SNR, and the refine guard rejects any harmful step.
    Replaces four transcendental array ops per refine iteration.
    """
    x2 = x * x
    c = 1.0 + x2 * (-0.5 + x2 * np.float32(1.0 / 24.0))
    s = x * (1.0 + x2 * (np.float32(-1.0 / 6.0)
                         + x2 * np.float32(1.0 / 120.0)))
    return c, s


def _slice_hard(ar, ai):
    """QPSK decisions in the raw domain: sym = raw*(1+j)."""
    sr = ar - ai
    si = ar + ai
    i_bit = (sr < 0.0)
    q_bit = (si < 0.0)
    hi = jnp.where(i_bit, -1.0, 1.0)
    hq = jnp.where(q_bit, -1.0, 1.0)
    # hard_raw = (hi + j hq) * (0.5 - 0.5j)
    hr = 0.5 * (hi + hq)
    hh = 0.5 * (hq - hi)
    dib = i_bit.astype(jnp.float32) * 2.0 + q_bit.astype(jnp.float32)
    return dib, hr, hh


def _decode_kernel(pkt_ref, peak_ref, wr_ref, wi_ref, pn_ref, pnb_ref,
                   mask_ref, out_ref, *, P, D, L, off, nfft, rs,
                   peak_gate, ls_reg, refit_iters, refine_iters,
                   refit_sym=0,
                   gram="direct", bvec="reduce", cfo_dtype="f32",
                   ls_offtap=None, ls_offtap_refit=None):
    _decode_core(pkt_ref[:, 0, :], pkt_ref[:, 1, :], peak_ref[:, 0, :],
                 wr_ref[0], wi_ref[0], pn_ref[0, 0:1, :], pnb_ref[0],
                 mask_ref[0, 0:1, :], out_ref, P=P, D=D, L=L, off=off,
                 nfft=nfft, rs=rs, peak_gate=peak_gate, ls_reg=ls_reg,
                 refit_iters=refit_iters, refit_sym=refit_sym,
                 refine_iters=refine_iters,
                 gram=gram, bvec=bvec, cfo_dtype=cfo_dtype,
                 ls_offtap=ls_offtap, ls_offtap_refit=ls_offtap_refit)


def _probe_out(out_ref, D, *vals):
    """Stage-probe epilogue: consume ``vals`` (defeats DCE of the work
    being timed) and fill the output (tools/profile_stages.py
    --decode-stages; not used in production)."""
    out_ref[...] = jnp.zeros_like(out_ref)
    acc = jnp.zeros_like(out_ref[:, 0:1])
    for v in vals:
        v = v.astype(jnp.float32)
        acc = acc + (v if v.shape[-1] == 1 else _reduce_last(v))
    out_ref[:, D:D + 1] = acc


def _decode_core(pr0, pi0, peak, wr, wi, pn, pnb, m, out_ref, *, P, D,
                 L, off, nfft, rs, peak_gate, ls_reg, refit_iters,
                 refine_iters, refit_sym: int = 0,
                 gram: str = "direct",
                 bvec: str = "reduce", cfo_dtype: str = "f32",
                 ls_offtap=None, ls_offtap_refit=None,
                 stage: str = "full"):
    """Shared decode body: aligned packet planes -> out_ref stats.

    pr0/pi0: [cb, pkt_window] values; peak: [cb, 1]; wr/wi: [P, nfft]
    DFT planes; pn: [1, P]; pnb: [kb, 128] train-b band
    (_pn_bvec_band, consumed when bvec == "matmul"); m: [1, D]
    descramble mask.  ``stage`` truncates the body after a named
    sub-stage (cost attribution probes; "full" = production).
    """
    chips_r = pr0[:, off:off + P]
    chips_i = pi0[:, off:off + P]
    energy = _reduce_last(chips_r * chips_r + chips_i * chips_i)
    gated = peak > energy * peak_gate                   # [cb, 1]
    if stage == "gate":
        # Phase 1 of the detection-gated two-phase decode
        # (tools/gated_decode_bench.py): REAL stats, not a DCE probe --
        # the full hunt + extraction + energy gate run, the decode tail
        # (CFO/derot/train/refit/refine/descramble, ~half the fused
        # kernel) is skipped.  The caller appends lag/phase/peak into
        # D+5..D+7 exactly like the full path.
        out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[:, D + 3:D + 4] = gated.astype(jnp.float32)
        out_ref[:, D + 4:D + 5] = energy
        return

    # ---- CFO search: DFT matmul + one-hot parabolic peak ----
    f32 = jnp.float32
    cdt = jnp.bfloat16 if cfo_dtype == "bf16" else f32
    tr = (chips_r * pn).astype(cdt)
    ti = (chips_i * pn).astype(cdt)
    wr = wr.astype(cdt)
    wi = wi.astype(cdt)
    sr = jnp.dot(tr, wr, preferred_element_type=f32) \
        - jnp.dot(ti, wi, preferred_element_type=f32)
    si = jnp.dot(tr, wi, preferred_element_type=f32) \
        + jnp.dot(ti, wr, preferred_element_type=f32)
    pw = sr * sr + si * si                              # [cb, nfft]
    kbin_i = jnp.argmax(pw, axis=-1, keepdims=True).astype(jnp.int32)
    cols = lax.broadcasted_iota(jnp.int32, pw.shape, 1)
    ohm = (cols == (kbin_i - 1) % nfft).astype(f32)
    ohp = (cols == (kbin_i + 1) % nfft).astype(f32)
    kbin = kbin_i.astype(f32)
    # p0 IS the max (argmax picks it); skip the one-hot masked reduce
    p0 = jnp.max(pw, axis=-1, keepdims=True)
    pm = _reduce_last(pw * ohm)
    pp = _reduce_last(pw * ohp)
    denom = pm - 2.0 * p0 + pp
    delta = jnp.where(jnp.abs(denom) > 1e-20,
                      0.5 * (pm - pp) / denom, 0.0)
    kf = kbin + delta
    kf = jnp.where(kf > nfft / 2.0, kf - nfft, kf)
    cfo = kf * (rs / nfft)                              # [cb, 1]
    cfo = jnp.where(gated, cfo, 0.0)
    if stage == "cfo":
        return _probe_out(out_ref, D, cfo, energy)

    # ---- de-rotate the packet ----
    n_all = pr0.shape[-1]
    t_idx = lax.broadcasted_iota(jnp.int32, (1, n_all), 1).astype(f32) - off
    ang = (-2.0 * np.pi / rs) * cfo * t_idx             # [cb, n_all]
    rc = jnp.cos(ang)
    rsn = jnp.sin(ang)
    pr = pr0 * rc - pi0 * rsn
    pi_ = pr0 * rsn + pi0 * rc
    if stage == "derot":
        return _probe_out(out_ref, D, pr, pi_)

    # ---- LS train on the preamble (real target pn) ----
    win_r = pr[:, :P + L - 1]
    win_i = pi_[:, :P + L - 1]
    if bvec == "matmul":
        kb = pnb.shape[-2]
        bw = (pr[:, :kb], pi_[:, :kb])
    else:
        bw = None
    cr, ci = _fit(win_r, win_i, pn, None, L, ls_reg, P, gram=gram,
                  bw=bw, pnb=pnb, offtap=ls_offtap)
    vr = _apply_real(win_r, win_i, cr, ci, L, P)
    matches = _reduce_last((vr * pn > 0.0).astype(f32))
    if stage == "train":
        return _probe_out(out_ref, D, matches, *cr, *ci)

    # ---- guarded decision-directed refit on the data ----
    # refit_sym (config.ls_refit_symbols): R < D fits on only the
    # FIRST R data windows -- the Gram/b-vector/apply wide work scales
    # with R while the refit keeps most of its denoising leverage
    # (the fit averages decision noise ~1/sqrt(R)).  R = 0 -> full D
    # (identical fp sequence to the pre-knob kernel).
    R = refit_sym if refit_sym else D
    dstart = off + P - (L // 2)
    dat_r = pr[:, dstart:dstart + D + L - 1]
    dat_i = pi_[:, dstart:dstart + D + L - 1]
    rdat_r = dat_r[:, :R + L - 1]
    rdat_i = dat_i[:, :R + L - 1]
    for _ in range(refit_iters):
        ar, ai = _apply(rdat_r, rdat_i, cr, ci, L, R)
        dib, hr, hh = _slice_hard(ar, ai)
        mag_raw = _reduce_last(jnp.sqrt(ar * ar + ai * ai)) / R
        mag_h = _reduce_last(jnp.sqrt(hr * hr + hh * hh)) / R + 1e-12
        scale = mag_raw / mag_h
        cr2, ci2 = _fit(rdat_r, rdat_i, hr * scale, hh * scale, L,
                        1e-3, R, gram=gram, offtap=ls_offtap_refit)
        vr2 = _apply_real(win_r, win_i, cr2, ci2, L, P)
        m2 = _reduce_last((vr2 * pn > 0.0).astype(f32))
        keep = (m2 >= matches).astype(f32)
        cr = [keep * a + (1.0 - keep) * b for a, b in zip(cr2, cr)]
        ci = [keep * a + (1.0 - keep) * b for a, b in zip(ci2, ci)]
    if stage == "refit":
        return _probe_out(out_ref, D, *cr, *ci)

    # ---- decode + clamped GUARDED phase/frequency refinement ----
    def _derr(xr, xi):
        # amplitude-normalized mean decision distance (the guard
        # metric; matches ls_equalizer._refine_err).  Also returns the
        # hard decisions it computed: selection by the 0/1 ``keep``
        # row-mask commutes with the per-element slicer, so the caller
        # carries them through the guard instead of re-slicing (saves
        # one _slice_hard per iteration + the post-loop one, exact).
        dib_, hrr, hhh = _slice_hard(xr, xi)
        mg = _reduce_last(jnp.sqrt(xr * xr + xi * xi)) / D + 1e-9
        er = xr / mg - hrr
        ei = xi / mg - hhh
        return _reduce_last(jnp.sqrt(er * er + ei * ei)), dib_, hrr, hhh

    ar, ai = _apply(dat_r, dat_i, cr, ci, L, D)
    a_max = np.float32(np.pi / 8.0)
    b_max = np.float32(np.pi / 8.0 / D)
    kd = lax.broadcasted_iota(jnp.int32, (1, D), 1).astype(f32)
    if refine_iters:
        cur_err, dib, hr, hh = _derr(ar, ai)
    for _ in range(refine_iters):
        zr = ar * hr + ai * hh
        zi = ai * hr - ar * hh
        incr = _reduce_last(zr[:, 1:] * zr[:, :-1] + zi[:, 1:] * zi[:, :-1])
        inci = _reduce_last(zi[:, 1:] * zr[:, :-1] - zr[:, 1:] * zi[:, :-1])
        # small-angle: angle ~ imag/real (corrections are clamped)
        b = jnp.clip(inci / (jnp.abs(incr) + 1e-20), -b_max, b_max)
        angd = -b * kd
        dc, dsn = _cossin_small(angd)
        zr2 = zr * dc - zi * dsn
        zi2 = zr * dsn + zi * dc
        z0r = _reduce_last(zr2)
        z0i = _reduce_last(zi2)
        a = jnp.clip(z0i / (jnp.abs(z0r) + 1e-20), -a_max, a_max)
        ang2 = -a - b * kd
        c2, s2 = _cossin_small(ang2)
        ar2, ai2 = ar * c2 - ai * s2, ar * s2 + ai * c2
        # guard: unguarded iteration accumulates estimator noise
        # (+0.7 dB at 2 iters; see ls_equalizer.phase_refine).  The
        # kept metric carries across iterations (recomputing
        # _derr(ar, ai) per pass is redundant -- it equals whichever
        # of new/cur survived the previous guard), and so do the kept
        # hard decisions (select commutes with the slicer).
        new_err, dib2, hr2, hh2 = _derr(ar2, ai2)
        keep = (new_err <= cur_err).astype(f32)
        cur_err = keep * new_err + (1.0 - keep) * cur_err
        ar = keep * ar2 + (1.0 - keep) * ar
        ai = keep * ai2 + (1.0 - keep) * ai
        dib = keep * dib2 + (1.0 - keep) * dib
        hr = keep * hr2 + (1.0 - keep) * hr
        hh = keep * hh2 + (1.0 - keep) * hh
    if stage == "refine":
        return _probe_out(out_ref, D, ar, ai)

    if not refine_iters:
        dib, hr, hh = _slice_hard(ar, ai)
    if refine_iters:
        # cur_err is _derr of the SELECTED (ar, ai) by the guard
        # invariant, and _derr computes exactly D * eq_err -- reuse it
        # instead of recomputing the normalized decision distance
        # (saves a sqrt + 2 reduces + 6 wide ops on [cb, D]).
        eq_err = cur_err * np.float32(1.0 / D)
    else:
        mag = _reduce_last(jnp.sqrt(ar * ar + ai * ai)) / D + 1e-9
        # |hard_raw| == 1 per decision, so the unit target is (hr, hh)
        err_r = ar / mag - hr
        err_i = ai / mag - hh
        eq_err = _reduce_last(jnp.sqrt(err_r * err_r
                                       + err_i * err_i)) / D

    # ---- descramble (XOR via arithmetic on {0..3} dibits) ----
    di = dib.astype(jnp.int32)
    mi = m.astype(jnp.int32)
    x_i = (di // 2 + mi // 2) % 2
    x_q = (di % 2 + mi % 2) % 2
    dscr = (x_i * 2 + x_q).astype(f32)

    out_ref[:, :D] = dscr
    out_ref[:, D:D + 1] = matches
    out_ref[:, D + 1:D + 2] = eq_err
    out_ref[:, D + 2:D + 3] = cfo
    out_ref[:, D + 3:D + 4] = gated.astype(f32)
    out_ref[:, D + 4:D + 5] = energy
    out_ref[:, D + 5:] = jnp.zeros_like(out_ref[:, D + 5:])



def _dft_operands(cfg: ModemConfig):
    """[1, P, nfft] CFO-DFT plane operands at cfg.cfo_dtype (bf16
    halves the operand and runs the DFT matmuls at full MXU rate;
    config.py cfo_dtype note)."""
    P, nfft = cfg.preamble_length, cfg.cfo_nfft
    wm = _dft_matrix(P, nfft)
    dt = jnp.bfloat16 if cfg.cfo_dtype == "bf16" else jnp.float32
    wr = jnp.asarray(wm.real.reshape(1, P, nfft)).astype(dt)
    wi = jnp.asarray(wm.imag.reshape(1, P, nfft)).astype(dt)
    return wr, wi


def _pnb_operand(cfg: ModemConfig):
    """(pnb array [1, kb, 128], effective bvec) for a config.  Falls
    back to "reduce" when the band would not fit the packet window or
    the eq length exceeds the 128 lag columns."""
    P = cfg.preamble_length
    L = cfg.eq_length
    kb = -(-(P + L - 1) // 128) * 128
    bvec = cfg.ls_bvec
    if L > 128 or kb > cfg.pkt_window:
        bvec = "reduce"
    return jnp.asarray(_pn_bvec_band(P, L, kb).reshape(1, kb, 128)), bvec


def fused_decode(cfg: ModemConfig, pkt_r, pkt_i, peak, *,
                 descramble: bool = True, block_channels: int = 256,
                 interpret: bool = False):
    """Run the fused decode kernel.

    Args:
      pkt_r/pkt_i: [C, pkt_window] aligned packet planes (first chip at
                   index eq_length//2).
      peak:        [C] hunt correlation peak.

    Returns dict with dibits (f32 [C, D]), matches, eq_error, cfo_hz,
    gated, energy.
    """
    P = cfg.preamble_length
    D = cfg.frame_symbols
    L = cfg.eq_length
    off = L // 2
    nfft = cfg.cfo_nfft
    C = pkt_r.shape[0]
    cb = min(block_channels, C)
    assert C % cb == 0
    n_out = -(-(D + 5) // 128) * 128

    wr, wi = _dft_operands(cfg)
    pn = jnp.asarray(PREAMBLE_VALUES.astype(np.float32).reshape(1, 1, P))
    if descramble:
        mask = scramble_dibit_mask()[:D].astype(np.float32)
    else:
        mask = np.zeros(D, np.float32)
    maskj = jnp.asarray(mask.reshape(1, 1, D))

    pkt = jnp.stack([pkt_r, pkt_i], axis=1)             # [C, 2, W]

    pnbj, bvec = _pnb_operand(cfg)
    kern = functools.partial(
        _decode_kernel, P=P, D=D, L=L, off=off, nfft=nfft, rs=cfg.rs,
        peak_gate=cfg.effective_peak_gate, ls_reg=cfg.ls_reg,
        ls_offtap=cfg.ls_offtap_reg,
        ls_offtap_refit=cfg.ls_offtap_reg_refit,
        refit_iters=cfg.ls_refit_iters,
        refit_sym=cfg.ls_refit_symbols,
        refine_iters=cfg.phase_refine_iters, gram=cfg.ls_gram,
        bvec=bvec, cfo_dtype=cfg.cfo_dtype)

    out = pl.pallas_call(
        kern,
        grid=(C // cb,),
        in_specs=[
            pl.BlockSpec((cb, 2, pkt.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, nfft), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, nfft), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pnbj.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, n_out), jnp.float32),
        interpret=interpret,
    )(pkt, peak.reshape(C, 1, 1), wr, wi, pn, pnbj, maskj)

    return {
        "dibits": out[:, :D],
        "matches": out[:, D].astype(jnp.int32),
        "eq_error": out[:, D + 1],
        "cfo_hz": out[:, D + 2],
        "gated": out[:, D + 3] > 0.5,
        "energy": out[:, D + 4],
    }


def _hunt_decode_core(wins, mat_ref, eband_ref, wr_ref, wi_ref, pn_ref,
                      pnb_ref, mask_ref, out_ref, *, cyc, wp, pkt_len,
                      n_lags, n_lags_pad, segs_per_chunk, n_chunks,
                      klen, P, D, L, off, nfft, rs, peak_gate, ls_reg,
                      refit_iters, refine_iters, hunt_mode,
                      refit_sym=0,
                      hunt_scale, gram: str = "direct",
                      bvec: str = "reduce", cfo_dtype: str = "f32",
                      lag_tiles: int = 0, lag_kwin: int = 384,
                      qwins=None, hunt_norm: str = "none",
                      ls_offtap=None, ls_offtap_refit=None,
                      stage: str = "full"):
    """Hunt + extract + decode, fully fused.

    Replaces the XLA hunt stage (rx_production._hunt_planes), whose
    cost was dominated not by its matmul FLOPs (~30 MFLOP/block-chan,
    0.15 us at bf16 peak) but by the [C, cyc*2, n_lags*n_seg] ``corr``
    intermediate round-tripping HBM (~120 KB/block-chan = ~0.3 us at
    HBM bandwidth) plus the skinny per-channel M=10 matmul shape.
    Here the correlation runs with M = cyc*2*cb rows (MXU-shaped) and
    corr/power/argmax never leave VMEM.

    ``wins``: a [cyc][2]-nested list of [cb, Wp] hunt-window plane
    VALUES (not refs) -- the TRANSPOSED layout (channel on the sublane
    axis) so every per-(phase, plane) slice is a dense 2D tile; the
    [cb, cyc, 2, Wp] layout of ``_decode_extract_kernel`` sublane-pads
    its (2, Wp) tiles 4x.  Callers either slice a windows ref or
    assemble the windows in VMEM from prev/cur decim refs
    (``_hunt_decode_decim_kernel`` -- skips materializing the padded,
    2x-duplicated windows array in HBM entirely).

    The segment-major band matrix is consumed in ``n_chunks`` column
    chunks to bound the live ``corr`` tile; power accumulates into
    per-phase [cb, n_lags_pad] planes.  Plane (real/imag) power
    combines by static cb-aligned SUBLANE slices of the chunk -- rows
    of the matmul are ordered (phase-major, plane, channel).
    """
    cb = wins[0][0].shape[0]
    f32 = jnp.float32
    int8_hunt = hunt_mode == "int8"
    dt = jnp.bfloat16 if hunt_mode == "bf16" else f32

    # ---- hunt: one [cyc*2*cb, klen] matmul per column chunk ----
    # int8 mode: the band matrix is +/-1/0 PN chips (exactly int8);
    # quantizing the window operand q = clip(round(x*s), +/-127) runs
    # the dominant matmul at the MXU's doubled int8 rate.  |corr| <=
    # 16 chips * 127 fits int32 (even int16); each corr^2 <= 2032^2
    # < 2^24 is exact in f32.  The summed per-lag POWER (up to 2*n_seg
    # such squares) can exceed 2^24 when windows clip near +/-127, so
    # the accumulated peak is order-dependent there -- exactness holds
    # for typical amplitudes and the actual gate is decision-level
    # parity (tools/tpu_parity.py).  The peak statistic is rescaled by
    # 1/s^2 so the energy gate sees matched-filter units.
    xw = ((lag_tiles - 1) * 128 + lag_kwin) if lag_tiles else klen
    xs = []
    for c in range(cyc):
        for pl_ in range(2):
            if int8_hunt and qwins is not None:
                # pre-quantized window (the fused kernel's int8 ring:
                # cur quantized ONCE per block instead of re-quantized
                # as next block's prev -- identical integers)
                xs.append(qwins[c][pl_][:, :xw])
                continue
            w_ = wins[c][pl_][:, :xw]
            if int8_hunt:
                q = jnp.clip(jnp.round(w_.astype(f32) * hunt_scale),
                             -127.0, 127.0)
                xs.append(q.astype(jnp.int8))
            else:
                xs.append(w_.astype(dt))
    x = jnp.concatenate(xs, axis=0)

    def _corr(xt, m):
        if int8_hunt:
            return jnp.dot(xt, m,
                           preferred_element_type=jnp.int32).astype(f32)
        return jnp.dot(xt, m, preferred_element_type=f32)

    if lag_tiles:
        # lag-TILED schedule (_segment_band_matrix_lagtile): per
        # 128-lag tile, one [cyc*2*cb, kwin] x [kwin, n_seg*128]
        # matmul on the 128-aligned window slice -- 1.33x fewer MACs
        # than the full-K chunks; values identical (int8 accumulation
        # exact).
        n_seg_t = mat_ref.shape[-1] // 128
        pw_tiles = [[] for _ in range(cyc)]
        for t in range(lag_tiles):
            xt = x[:, t * 128:t * 128 + lag_kwin]
            p2 = _corr(xt, mat_ref[t])
            p2 = p2 * p2                         # [cyc*2*cb, seg*128]
            for c in range(cyc):
                blk = (p2[(2 * c) * cb:(2 * c + 1) * cb]
                       + p2[(2 * c + 1) * cb:(2 * c + 2) * cb])
                acc = blk[:, :128]
                for s in range(1, n_seg_t):
                    acc = acc + blk[:, s * 128:(s + 1) * 128]
                pw_tiles[c].append(acc)
        pw = [jnp.concatenate(pt, axis=1) for pt in pw_tiles]
    else:
        csz = segs_per_chunk * n_lags_pad
        pw = [jnp.zeros((cb, n_lags_pad), f32) for _ in range(cyc)]
        for ch in range(n_chunks):
            corr = _corr(x, mat_ref[ch])
            p2 = corr * corr                     # [cyc*2*cb, csz]
            for c in range(cyc):
                blk = (p2[(2 * c) * cb:(2 * c + 1) * cb]
                       + p2[(2 * c + 1) * cb:(2 * c + 2) * cb])
                acc = pw[c]
                for s in range(segs_per_chunk):
                    acc = acc + blk[:, s * n_lags_pad:
                                    (s + 1) * n_lags_pad]
                pw[c] = acc

    # hunt_norm="energy"/"espan": per-lag window energy (f32 band matmuls
    # mirroring rx_production._hunt_metric) normalizes the argmax
    # statistic; PEAK stays raw power at the chosen lag (gate
    # semantics unchanged -- config.hunt_norm)
    en = None
    if hunt_norm in ("energy", "espan"):
        # f32 band matmuls mirroring the XLA _hunt_metric contraction.
        # Measured variants at the bench geometry (don't redo): the
        # per-phase f32 "energy" form costs 5% of the pipeline (6.40 ->
        # 6.08 GS/s); bf16 operands are SLOWER (5.94-5.97 -- the cast
        # wide ops and mixed-precision relayouts outweigh the MXU-rate
        # win in this issue-bound kernel), as is batching all phases
        # into one matmul via a sublane concat; the one-hot raw-peak
        # readback below is free (5.97 with it stubbed out).
        # "espan" sums the squared planes across phases FIRST (the
        # full-rate span energy, 5x the samples in the estimate) so
        # only ONE band contraction runs instead of cyc.
        def _eband_contract(sq):
            if lag_tiles:
                tiles = [
                    jnp.dot(sq[:, t * 128:t * 128 + lag_kwin],
                            eband_ref[t], preferred_element_type=f32)
                    for t in range(lag_tiles)]
                return jnp.concatenate(tiles, axis=1)
            return jnp.dot(sq[:, :klen], eband_ref[...],
                           preferred_element_type=f32)

        sqs = [wins[c][0].astype(f32) * wins[c][0].astype(f32)
               + wins[c][1].astype(f32) * wins[c][1].astype(f32)
               for c in range(cyc)]
        if hunt_norm == "espan":
            ssum = sqs[0]
            for c in range(1, cyc):
                ssum = ssum + sqs[c]
            en = [_eband_contract(ssum)] * cyc
        else:
            en = [_eband_contract(sq) for sq in sqs]

    # argmax over (phase, lag): per-phase lane argmax + running best
    # with strict > across ascending phases == XLA's first-max flat
    # argmax over the phase-major [cyc, n_lags] metric array.
    best_m = jnp.full((cb, 1), -1.0, f32)
    best_pk = jnp.full((cb, 1), -1.0, f32)
    best_lag = jnp.zeros((cb, 1), jnp.int32)
    best_ph = jnp.zeros((cb, 1), jnp.int32)
    for c in range(cyc):
        stat = pw[c] if en is None else pw[c] / (en[c] + f32(1e-12))
        mx = jnp.max(stat, axis=-1, keepdims=True)
        idx = jnp.argmax(stat, axis=-1, keepdims=True).astype(jnp.int32)
        if en is None:
            pk = mx
        else:
            cols = lax.broadcasted_iota(jnp.int32, pw[c].shape, 1)
            pk = _reduce_last(pw[c] * (cols == idx).astype(f32))
        upd = mx > best_m
        best_m = jnp.where(upd, mx, best_m)
        best_pk = jnp.where(upd, pk, best_pk)
        best_lag = jnp.where(upd, idx, best_lag)
        best_ph = jnp.where(upd, jnp.int32(c), best_ph)
    peak = 2.0 * best_pk                         # _hunt_planes scaling
    if int8_hunt:
        # back to matched-filter units for the energy gate
        peak = peak * np.float32(1.0 / (hunt_scale * hunt_scale))
    if stage == "hunt":
        return _probe_out(out_ref, D, peak, best_lag.astype(jnp.float32))

    # ---- extract: phase select + barrel shift (see
    # _decode_extract_kernel for the Mosaic constraints).  Always f32:
    # Mosaic's lane rotate is 32-bit-only ("Rotate with non-32-bit
    # data" -- bf16 wins are converted here, in VMEM) ----
    sel_r = jnp.zeros((cb, wp), f32)
    sel_i = jnp.zeros((cb, wp), f32)
    for k in range(cyc):
        mk = (best_ph == k).astype(f32)
        sel_r = sel_r + mk * wins[k][0].astype(f32)
        sel_i = sel_i + mk * wins[k][1].astype(f32)

    # Progressive-narrowing barrel shift, MSB first: before processing
    # bit j the remaining shift is <= 2^(j+1)-1, so only the first
    # pkt_len + 2^(j+1)-1 columns matter -- slice the rolled width down
    # as high bits retire (1024 -> 896 -> 640 -> 512 at the default
    # numerology; ~1.8x less VPU roll work than fixed-width rolls).
    nbits = max(1, int(np.ceil(np.log2(max(wp - pkt_len, 2)))))
    for j in reversed(range(nbits)):
        need = pkt_len + (1 << (j + 1)) - 1
        w = min(wp, -(-need // 128) * 128)
        if w < sel_r.shape[-1]:
            sel_r = sel_r[:, :w]
            sel_i = sel_i[:, :w]
        bit = ((best_lag >> j) & 1).astype(f32)
        roll_r = pltpu.roll(sel_r, w - (1 << j), axis=1)
        roll_i = pltpu.roll(sel_i, w - (1 << j), axis=1)
        sel_r = bit * roll_r + (1.0 - bit) * sel_r
        sel_i = bit * roll_i + (1.0 - bit) * sel_i
    if stage == "extract":
        return _probe_out(out_ref, D, sel_r, sel_i)

    _decode_core(sel_r[:, :pkt_len], sel_i[:, :pkt_len], peak,
                 wr_ref[0], wi_ref[0], pn_ref[0, 0:1, :], pnb_ref[0],
                 mask_ref[0, 0:1, :], out_ref, P=P, D=D, L=L, off=off,
                 nfft=nfft, rs=rs, peak_gate=peak_gate, ls_reg=ls_reg,
                 refit_iters=refit_iters, refit_sym=refit_sym,
                 refine_iters=refine_iters,
                 gram=gram, bvec=bvec, cfo_dtype=cfo_dtype,
                 ls_offtap=ls_offtap, ls_offtap_refit=ls_offtap_refit,
                 stage=stage)
    if stage not in ("full", "gate"):
        return
    # hunt results ride the same fat output (slots D+5..D+7; the core
    # zeroed them above).
    out_ref[:, D + 5:D + 6] = best_lag.astype(f32)
    out_ref[:, D + 6:D + 7] = best_ph.astype(f32)
    out_ref[:, D + 7:D + 8] = peak


def _hunt_decode_decim_kernel(prev0_ref, curprev_ref, cur_ref, mat_ref,
                              eband_ref, wr_ref, wi_ref, pn_ref,
                              pnb_ref, mask_ref, out_ref, *, cyc, wp,
                              off, n_sym, cshift, **kw):
    # (``stage`` rides in **kw to _hunt_decode_core)
    """Hunt+extract+decode reading prev/cur decim blocks directly.

    The windows-array interface costs an HBM round trip of a
    [cyc, 2, N, Wp] array that is ~26% zero padding and duplicates
    every decim block twice (as `cur` of its own window and `prev` of
    the next).  Here prev/cur stay SEPARATE operands (concatenating
    them into one [cyc, 2, N+C, n_sym] array costs a full extra HBM
    round trip of the decim planes, ~0.04 us/blk-ch):

      * ``cur``     = decim_cur block i;
      * ``curprev`` = decim_cur block max(i - cshift, 0) -- element
        k's previous block is element k - C of the same batch;
      * ``prev0``   = the carried decim_prev state, block
        min(i, cshift - 1) -- the previous block of the FIRST C
        elements.

    The clamped index maps make the off-range fetches revisit a
    constant block (Mosaic skips the re-fetch), and the kernel
    selects per grid step with a scalar predicate.  The [cb, Wp]
    window planes are assembled in VMEM by lane concatenation.
    """
    cb = cur_ref.shape[2]
    use_state = pl.program_id(0) < cshift
    wdt = cur_ref.dtype       # f32, or bf16 (cfg.decim_dtype) -- the
    # window planes stay in storage dtype through phase select and
    # barrel shift (pure selection, exact in any dtype); _decode_core
    # receives f32
    zoff = jnp.zeros((cb, off), wdt)
    zpad = jnp.zeros((cb, wp - off - 2 * n_sym), wdt)
    wins = [[jnp.concatenate(
                [zoff,
                 jnp.where(use_state, prev0_ref[c, p_],
                           curprev_ref[c, p_]),
                 cur_ref[c, p_], zpad], axis=-1)
             for p_ in range(2)] for c in range(cyc)]
    _hunt_decode_core(wins, mat_ref, eband_ref, wr_ref, wi_ref, pn_ref,
                      pnb_ref, mask_ref, out_ref, cyc=cyc, wp=wp,
                      off=off, **kw)


def fused_hunt_decode_decim(cfg: ModemConfig, decim_prev0, decim_cur,
                            *, channels: int, descramble: bool = True,
                            block_channels: int = 64,
                            segs_per_chunk: int = 2,
                            stage: str = "full",
                            interpret: bool = False):
    """Fused hunt+extract+decode straight from decimated symbol planes.

    Args:
      decim_prev0: [cycles, 2, channels, n_sym] f32 -- the carried
                 previous-block decim planes of the first C batch
                 elements (the stream state entering this dispatch).
      decim_cur: [cycles, 2, N, n_sym] f32 -- the batch's decim planes
                 in (block-major, channel) order: element k's previous
                 block is element k - channels (k >= channels) or
                 decim_prev0 row k (k < channels).  The two arrays are
                 consumed as separate operands with clamped index maps
                 (concatenating them costs a full extra HBM round trip
                 of the planes); the hunt windows are assembled in
                 VMEM (see ``_hunt_decode_decim_kernel``).
      channels:  C (the element offset between a block and its
                 predecessor).

    Returns the ``fused_decode`` stat dict plus "lag", "phase_idx",
    and "peak" (i32/i32/f32) from the in-kernel hunt.
    """
    P = cfg.preamble_length
    D = cfg.frame_symbols
    L = cfg.eq_length
    off = L // 2
    nfft = cfg.cfo_nfft
    pkt_len = cfg.pkt_window
    n_lags = cfg.symbols_per_block
    n_seg = cfg.corr_segments
    n_sym = cfg.symbols_per_block
    n_lags_pad = -(-n_lags // 128) * 128
    cyc = decim_cur.shape[0]
    C = channels
    N = decim_cur.shape[2]
    assert decim_prev0.shape[2] == C, (decim_prev0.shape, C)
    klen = -(-(off + n_lags + P - 1) // 128) * 128   # lane-aligned K
    need = (n_lags - 1) + pkt_len
    wp = -(-max(need, off + 2 * n_sym, klen) // 128) * 128
    cb = min(block_channels, N)
    assert N % cb == 0 and C % cb == 0, (N, C, cb)
    segs_per_chunk = min(segs_per_chunk, n_seg)
    assert n_seg % segs_per_chunk == 0
    n_chunks = n_seg // segs_per_chunk
    csz = segs_per_chunk * n_lags_pad
    n_out = -(-(D + 8) // 128) * 128

    mdt = {"bf16": jnp.bfloat16, "f32": jnp.float32,
           "int8": jnp.int8}[cfg.hunt_dtype]
    lag_kwin = 384
    # lag-tiling needs every tile's band to fit the K window, the
    # tiled lag count to equal the padded lag axis, AND the assembled
    # hunt window to cover the last tile's aligned K slice (a narrow-
    # window numerology falls back to the chunk schedule instead of
    # tripping an assert at trace time -- ADVICE r3)
    lag_ok = (cfg.hunt_scheme == "lagtile"
              and off + 127 + P - 1 < lag_kwin
              and n_lags_pad % 128 == 0
              and wp >= (n_lags_pad // 128 - 1) * 128 + lag_kwin)
    lag_tiles = n_lags_pad // 128 if lag_ok else 0
    if lag_ok:
        mat_np = _segment_band_matrix_lagtile(n_lags, n_seg, P, off,
                                              tile=128, kwin=lag_kwin)
        mat = jnp.asarray(mat_np, dtype=mdt)
        eband = jnp.asarray(_energy_band_lagtile(
            n_lags, P, off, tile=128, kwin=lag_kwin))
    else:
        mat_np = _segment_band_matrix_smaj(n_lags, n_lags_pad, n_seg,
                                           P, off, klen_pad=klen)
        mat = jnp.asarray(
            mat_np.reshape(klen, n_chunks, csz).swapaxes(0, 1),
            dtype=mdt)
        eband = jnp.asarray(_energy_band_smaj(
            n_lags, n_lags_pad, P, off, klen_pad=klen))

    wr, wi = _dft_operands(cfg)
    pn = jnp.asarray(PREAMBLE_VALUES.astype(np.float32).reshape(1, 1, P))
    if descramble:
        mask = scramble_dibit_mask()[:D].astype(np.float32)
    else:
        mask = np.zeros(D, np.float32)
    maskj = jnp.asarray(mask.reshape(1, 1, D))

    cshift = C // cb
    pnbj, bvec = _pnb_operand(cfg)
    kern = functools.partial(
        _hunt_decode_decim_kernel, cyc=cyc, wp=wp, n_sym=n_sym,
        cshift=cshift,
        pkt_len=pkt_len, n_lags=n_lags, n_lags_pad=n_lags_pad,
        segs_per_chunk=segs_per_chunk, n_chunks=n_chunks, klen=klen,
        P=P, D=D, L=L, off=off, nfft=nfft, rs=cfg.rs,
        peak_gate=cfg.effective_peak_gate, ls_reg=cfg.ls_reg,
        ls_offtap=cfg.ls_offtap_reg,
        ls_offtap_refit=cfg.ls_offtap_reg_refit,
        refit_iters=cfg.ls_refit_iters,
        refit_sym=cfg.ls_refit_symbols,
        refine_iters=cfg.phase_refine_iters, hunt_mode=cfg.hunt_dtype,
        hunt_scale=cfg.hunt_int8_scale, gram=cfg.ls_gram, bvec=bvec,
        cfo_dtype=cfg.cfo_dtype,
        lag_tiles=lag_tiles, lag_kwin=lag_kwin,
        hunt_norm=cfg.hunt_norm, stage=stage)

    out = pl.pallas_call(
        kern,
        grid=(N // cb,),
        in_specs=[
            pl.BlockSpec((cyc, 2, cb, n_sym),
                         lambda i: (0, 0, jnp.minimum(i, cshift - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cyc, 2, cb, n_sym),
                         lambda i: (0, 0, jnp.maximum(i - cshift, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cyc, 2, cb, n_sym), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mat.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(eband.shape,
                         lambda i: (0,) * eband.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, nfft), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, nfft), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pnbj.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_out), jnp.float32),
        # v5e has 128 MB VMEM; Mosaic's default 16 MB scoped limit is
        # what capped cb at 64 (ROADMAP r2).  Raising the limit makes
        # cb=128 COMPILE, but it is measured 20x SLOWER (Mosaic
        # pathology, ROADMAP r3 -- not merely "no gain").  Keep cb=64;
        # the raised limit exists only for headroom in the fused
        # operand set at cb=64.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(decim_prev0, decim_cur, decim_cur, mat, eband, wr, wi, pn, pnbj,
      maskj)

    return {
        "dibits": out[:, :D],
        "matches": out[:, D].astype(jnp.int32),
        "eq_error": out[:, D + 1],
        "cfo_hz": out[:, D + 2],
        "gated": out[:, D + 3] > 0.5,
        "energy": out[:, D + 4],
        "lag": out[:, D + 5].astype(jnp.int32),
        "phase_idx": out[:, D + 6].astype(jnp.int32),
        "peak": out[:, D + 7],
    }


def _decode_extract_kernel(win_ref, lag_ref, ph_ref, peak_ref, wr_ref,
                           wi_ref, pn_ref, pnb_ref, mask_ref, out_ref,
                           *, cyc, wp, pkt_len, P, D, L, off, nfft,
                           rs, peak_gate, ls_reg, refit_iters,
                           refine_iters, refit_sym=0, gram="direct",
                           bvec="reduce", cfo_dtype="f32",
                           ls_offtap=None, ls_offtap_refit=None):
    """Decode with IN-KERNEL packet extraction.

    Replaces the XLA extraction stage (one-hot phase einsum + pad +
    per-channel gather + an extra HBM round trip of the packet array),
    which profiling showed to be the single most expensive stage of the
    pipeline (tools/profile_stages.py: 0.87 us of 2.23 us/block-chan).

    Mosaic has no dynamic lane-dim indexing (a [.., lag:lag+W] slice
    needs lag provably 128-divisible; 1D HBM DMAs need 1024-aligned
    slice shapes), so alignment is done with VECTORIZED data
    movement instead:

      * decimation-phase select = masked sum over the cyc axis;
      * lag alignment = a barrel shifter -- ceil(log2(n_lags)) static
        circular rolls, each applied per channel only where that bit
        of ``lag`` is set.  No wrap contamination reaches the packet:
        pkt_len <= Wp - max_lag.
    """
    lag = lag_ref[:, 0, :]                              # [cb, 1] i32
    ph = ph_ref[:, 0, :]

    # phase select: sel = win[:, phase] via masked sum (VPU)
    sel_r = jnp.zeros_like(win_ref[:, 0, 0, :])
    sel_i = jnp.zeros_like(sel_r)
    for k in range(cyc):
        mk = (ph == k).astype(jnp.float32)
        sel_r = sel_r + mk * win_ref[:, k, 0, :]
        sel_i = sel_i + mk * win_ref[:, k, 1, :]

    # barrel shift left by `lag` (9 masked static rolls for 376 lags)
    nbits = max(1, int(np.ceil(np.log2(max(wp - pkt_len, 2)))))
    for j in range(nbits):
        bit = ((lag >> j) & 1).astype(jnp.float32)
        roll_r = pltpu.roll(sel_r, wp - (1 << j), axis=1)
        roll_i = pltpu.roll(sel_i, wp - (1 << j), axis=1)
        sel_r = bit * roll_r + (1.0 - bit) * sel_r
        sel_i = bit * roll_i + (1.0 - bit) * sel_i

    _decode_core(sel_r[:, :pkt_len], sel_i[:, :pkt_len],
                 peak_ref[:, 0, :],
                 wr_ref[0], wi_ref[0], pn_ref[0, 0:1, :], pnb_ref[0],
                 mask_ref[0, 0:1, :], out_ref, P=P, D=D, L=L, off=off,
                 nfft=nfft, rs=rs, peak_gate=peak_gate, ls_reg=ls_reg,
                 refit_iters=refit_iters, refit_sym=refit_sym,
                 refine_iters=refine_iters,
                 gram=gram, bvec=bvec, cfo_dtype=cfo_dtype,
                 ls_offtap=ls_offtap, ls_offtap_refit=ls_offtap_refit)


def fused_decode_extract(cfg: ModemConfig, windows, lag, phase_idx,
                         peak, *, descramble: bool = True,
                         block_channels: int = 64,
                         interpret: bool = False):
    """Fused extract+decode from the padded hunt windows.

    Args:
      windows:   [N, cycles, 2, Wp] f32 hunt-window planes, where the
                 time axis is LEFT-padded by eq_length//2 zeros (so a
                 packet starting at lag l begins at padded index l) and
                 right-padded so that max_lag + pkt_window <= Wp.
      lag:       [N] int32 symbol lag of the correlation peak.
      phase_idx: [N] int32 winning decimation phase.
      peak:      [N] f32 correlation peak.

    Returns the same stat dict as ``fused_decode``.
    """
    P = cfg.preamble_length
    D = cfg.frame_symbols
    L = cfg.eq_length
    off = L // 2
    nfft = cfg.cfo_nfft
    pkt_len = cfg.pkt_window
    N = windows.shape[0]
    Wp = windows.shape[-1]
    assert Wp >= (cfg.symbols_per_block - 1) + pkt_len, (Wp, pkt_len)
    cb = min(block_channels, N)
    assert N % cb == 0
    n_out = -(-(D + 5) // 128) * 128

    wr, wi = _dft_operands(cfg)
    pn = jnp.asarray(PREAMBLE_VALUES.astype(np.float32).reshape(1, 1, P))
    if descramble:
        mask = scramble_dibit_mask()[:D].astype(np.float32)
    else:
        mask = np.zeros(D, np.float32)
    maskj = jnp.asarray(mask.reshape(1, 1, D))

    pnbj, bvec = _pnb_operand(cfg)
    kern = functools.partial(
        _decode_extract_kernel, cyc=cfg.cycles, wp=Wp,
        pkt_len=pkt_len, P=P, D=D, L=L, off=off, nfft=nfft, rs=cfg.rs,
        peak_gate=cfg.effective_peak_gate, ls_reg=cfg.ls_reg,
        ls_offtap=cfg.ls_offtap_reg,
        ls_offtap_refit=cfg.ls_offtap_reg_refit,
        refit_iters=cfg.ls_refit_iters,
        refit_sym=cfg.ls_refit_symbols,
        refine_iters=cfg.phase_refine_iters, gram=cfg.ls_gram,
        bvec=bvec, cfo_dtype=cfg.cfo_dtype)

    out = pl.pallas_call(
        kern,
        grid=(N // cb,),
        in_specs=[
            pl.BlockSpec((cb, cfg.cycles, 2, Wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, nfft), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, nfft), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pnbj.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_out), jnp.float32),
        interpret=interpret,
    )(windows, lag.astype(jnp.int32).reshape(N, 1, 1),
      phase_idx.astype(jnp.int32).reshape(N, 1, 1),
      peak.reshape(N, 1, 1), wr, wi, pn, pnbj, maskj)

    return {
        "dibits": out[:, :D],
        "matches": out[:, D].astype(jnp.int32),
        "eq_error": out[:, D + 1],
        "cfo_hz": out[:, D + 2],
        "gated": out[:, D + 3] > 0.5,
        "energy": out[:, D + 4],
    }
