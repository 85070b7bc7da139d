"""Production RX: intended-semantics, full-throughput demodulator.

The faithful path (modem/rx.py) replicates the reference's behavior
including its structural limitations; this is the production redesign
that keeps the same signal chain (reference: src/qpsk.c:133-239) but
fixes the intent-vs-implementation gaps documented in SURVEY.md:

 * hunts ALL 376 lag positions per block and all 5 decimation phases
   (the reference searches 128 lags at one fixed phase -- qpsk.c:53,
   176-183 -- and so misses most packets; 3/14 frames detect on its own
   golden vector).
 * decodes ALL ns*31 = 248 data symbols of a detected packet (the
   reference slices only the first 31 -- qpsk.c:206-215 -- discarding
   7/8 of the payload).
 * rx_timing stays a timing phase; no symbol-index clobber (qpsk.c:219).
 * segmented (non-coherent) preamble correlation for CFO tolerance,
   then FFT-based frequency-offset search over the detected chips (the
   reference's dead fft.c promoted to a live feature) and closed-form
   de-rotation before equalizer training.
 * an energy gate on the correlation peak (the reference commented it
   out -- qpsk.c:196), which also kills the reference's spurious
   detects on all-zero windows.
 * symmetric scrambling with per-packet keystream reset (the DVB frame
   sync intent, scramble.c:14; the reference TX never scrambles --
   SURVEY.md quirk #3).

Per-block latency is one frame (the hunt window is [prev | cur]); every
stream position is searched exactly once.  The whole step is pure
``(cfg, state, pcm) -> (state, out)``; ``vmap`` over channels is the
scaling axis, ``lax.scan`` over blocks the streaming axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..adaptive.ls_equalizer import (ls_decode, ls_refit, ls_train,
                                     phase_refine, window_matrix)
from ..config import ModemConfig
from ..constants import PREAMBLE_VALUES, rrc_taps
from ..dsp.fftops import estimate_cfo
from ..dsp.fir import fir_block, fir_init_state
from ..dsp.mixer import (downmix_tail, mix_block, mixer_init_phase,
                         mixer_table)
from ..scramble import scramble_dibits
from ..utils.compat import czeros


class ProdRxState(NamedTuple):
    phase: jnp.ndarray        # [..] c64 downmix phasor
    fir_tail: jnp.ndarray     # [.., ntaps-1] c64 matched-filter halo
    decim_prev: jnp.ndarray   # [.., cycles, n_sym] prev block, all phases


class ProdRxOut(NamedTuple):
    valid: jnp.ndarray        # [..] bool packet detected in this block
    bits: jnp.ndarray         # [.., bits_per_frame] u8 full packet payload
    matches: jnp.ndarray      # [..] i32 trained-chip sign matches
    lag: jnp.ndarray          # [..] i32 preamble start (symbol lag in window)
    timing_phase: jnp.ndarray  # [..] i32 winning decimation phase
    peak: jnp.ndarray         # [..] f32 correlation peak (non-coherent)
    energy: jnp.ndarray       # [..] f32 window energy at the peak
    cfo_hz: jnp.ndarray       # [..] f32 estimated carrier offset
    eq_error: jnp.ndarray     # [..] f32 mean |decision error| over data


def prod_rx_init(cfg: ModemConfig, batch_shape=()) -> ProdRxState:
    return ProdRxState(
        phase=mixer_init_phase(batch_shape),
        fir_tail=fir_init_state(cfg.ntaps, batch_shape),
        decim_prev=czeros(
            (*batch_shape, cfg.cycles, cfg.symbols_per_block)),
    )


def prod_rx_init_planes(cfg: ModemConfig, channels: int):
    """Plane-typed RX state for the fast batch path.

    Layout: ``(phase_r [C], phase_i [C], fir_tail_r [C, ntaps-1],
    fir_tail_i [C, ntaps-1], decim_prev_t [cyc, 2, C, n_sym])`` with
    ``decim_prev_t`` in ``cfg.decim_dtype`` -- EXACTLY the layout the
    fused kernels consume.  Carrying this tuple across ``prod_rx_batch``
    dispatches skips the complex<->plane conversion and the
    [C, cyc, n_sym] <-> [cyc, 2, C, n_sym] transposes of ~1 GB-scale
    state arrays that dominated the non-kernel dispatch cost
    (measured ~0.05 us/blk-ch at the 524k operating point).
    """
    ddt = jnp.bfloat16 if cfg.decim_dtype == "bf16" else jnp.float32
    return (jnp.ones((channels,), jnp.float32),
            jnp.zeros((channels,), jnp.float32),
            jnp.zeros((channels, cfg.ntaps - 1), jnp.float32),
            jnp.zeros((channels, cfg.ntaps - 1), jnp.float32),
            jnp.zeros((cfg.cycles, 2, channels, cfg.symbols_per_block),
                      ddt))


def state_to_planes(cfg: ModemConfig, state: ProdRxState):
    """ProdRxState -> the plane tuple (one-time conversion)."""
    ddt = jnp.bfloat16 if cfg.decim_dtype == "bf16" else jnp.float32
    dprev_t = jnp.transpose(
        jnp.stack([state.decim_prev.real, state.decim_prev.imag],
                  axis=0), (2, 0, 1, 3)).astype(ddt)
    return (state.phase.real, state.phase.imag,
            state.fir_tail.real, state.fir_tail.imag, dprev_t)


def planes_to_state(planes) -> ProdRxState:
    """Plane tuple -> ProdRxState (one-time conversion)."""
    pr, pi_, tr, ti, dprev_t = planes
    return ProdRxState(
        phase=lax.complex(pr, pi_),
        fir_tail=lax.complex(tr, ti),
        decim_prev=lax.complex(
            jnp.transpose(dprev_t[:, 0], (1, 0, 2)).astype(jnp.float32),
            jnp.transpose(dprev_t[:, 1], (1, 0, 2)).astype(jnp.float32)))


@functools.lru_cache(maxsize=8)
def _segment_band_matrix(n_lags: int, n_segments: int, p: int):
    """Banded correlation matrix B[w, l*n_seg + s] = v[16s + k] at
    w = l + 16s + k.

    The preamble chip c_k = v_k * (1+j) with v_k real +/-1
    (qpsk.c:361-365), so the (non-conjugated, qpsk.c:92) correlation
    factors: sum c_k s[l+k] = (1+j) * (real-kernel correlation), and
    |corr|^2 = 2 * |...|^2.  Splitting v into ``n_segments`` pieces
    gives the CFO-tolerant non-coherent hunt; one dense [win,
    n_lags*n_seg] matmul computes every (lag, segment) partial sum --
    MXU-shaped, and tolerant of bf16 (it is only a peak statistic).
    """
    v = PREAMBLE_VALUES.astype(np.float32)
    seg = p // n_segments
    win = n_lags + p - 1
    b = np.zeros((win, n_lags * n_segments), np.float32)
    for l in range(n_lags):
        for s in range(n_segments):
            for k in range(seg):
                b[l + s * seg + k, l * n_segments + s] = v[s * seg + k]
    return b


@functools.lru_cache(maxsize=8)
def _energy_band_matrix(n_lags: int, p: int):
    """Ones band E[w, l] = 1 for l <= w < l + p: contracting the
    squared-magnitude planes against it gives the per-lag window
    energy (the denominator of the hunt_norm="energy"/"espan"
    statistics)."""
    win = n_lags + p - 1
    b = np.zeros((win, n_lags), np.float32)
    for l in range(n_lags):
        b[l:l + p, l] = 1.0
    return b


def _hunt_metric(cfg: ModemConfig, power, sq):
    """Hunt argmax statistic from the raw segmented power.

    ``power``: [..., cyc, n_lags]; ``sq``: squared window magnitude
    [..., cyc, >=n_lags+p-1].  With cfg.hunt_norm == "energy" the
    statistic is power / window-energy per lag (see config.hunt_norm);
    "none" returns the raw power.  The argmax consumer reads PEAK as
    raw power at the chosen lag either way -- the gate semantics never
    change.
    """
    if cfg.hunt_norm not in ("energy", "espan"):
        return power
    # f32 contraction, matching the kernel's (measured: bf16 energy
    # operands are SLOWER in the issue-bound fused kernel -- the cast
    # wide ops outweigh the MXU-rate win; decode_pallas notes).
    eband = jnp.asarray(_energy_band_matrix(cfg.symbols_per_block,
                                            cfg.preamble_length))
    sq = sq.astype(jnp.float32)
    if cfg.hunt_norm == "espan":
        # Full-rate span energy shared across phases: sum the squared
        # planes FIRST (explicit left-associated adds, mirroring the
        # kernel's phase loop bit-for-bit), then one band contraction.
        ssum = sq[..., 0, :]
        for c in range(1, sq.shape[-2]):
            ssum = ssum + sq[..., c, :]
        energy = jnp.matmul(ssum, eband,
                            preferred_element_type=jnp.float32)
        return power / (energy[..., None, :] + jnp.float32(1e-12))
    energy = jnp.matmul(sq, eband,
                        preferred_element_type=jnp.float32)
    return power / (energy + jnp.float32(1e-12))


def _hunt_corr(cfg: ModemConfig, planes, mat):
    """Correlation matmul in ``cfg.hunt_dtype`` (shared by the _hunt
    variants; the Pallas kernel mirrors this math in
    ops/decode_pallas._hunt_decode_core).

    "int8" quantizes q = clip(round(x*s), +/-127) and contracts
    against the +/-1/0 chip matrix at the MXU's doubled int8 rate;
    int32 accumulation is exact, so there is no reassociation at all
    in the int8 path.  ``planes``: [..., rows, win] f32.
    """
    if cfg.hunt_dtype == "int8":
        s = jnp.float32(cfg.hunt_int8_scale)
        q = jnp.clip(jnp.round(planes.astype(jnp.float32) * s),
                     -127.0, 127.0).astype(jnp.int8)
        return jnp.matmul(q, mat.astype(jnp.int8),
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32)
    dt = jnp.bfloat16 if cfg.hunt_dtype == "bf16" else jnp.float32
    return jnp.matmul(planes.astype(dt), mat.astype(dt),
                      preferred_element_type=jnp.float32)


def _hunt_power_scale(cfg: ModemConfig) -> float:
    """2x for the (1+j) chip factor (_segment_band_matrix docstring),
    /s^2 to undo int8 quantization so peak stays in matched-filter
    units for the energy gate."""
    if cfg.hunt_dtype == "int8":
        return float(2.0 / (cfg.hunt_int8_scale ** 2))
    return 2.0


def _hunt(cfg: ModemConfig, windows):
    """Find the (phase, lag) correlation peak.

    ``windows``: [cycles, 2*n_sym] decimated symbol windows per phase
    (a leading batch axis is also supported).  Returns
    (lag, phase_idx, peak, energy_at_peak).

    Metric: sum_s 2*|corr_s(l)|^2 over the ``corr_segments`` pieces of
    the PN -- segments combine by power so a carrier offset cannot
    cancel the sum; n_segments=1 recovers the reference's coherent
    correlator (qpsk.c:88-96) up to the constant factor 2.  Computed as
    one banded matmul in ``hunt_dtype`` (bf16 by default: the MXU runs
    it ~8x faster than f32 and a peak statistic does not need more).
    """
    n_lags = cfg.symbols_per_block
    p = cfg.preamble_length
    n_seg = cfg.corr_segments
    mat = jnp.asarray(_segment_band_matrix(n_lags, n_seg, p))

    batch_shape = windows.shape[:-2]
    cyc = windows.shape[-2]
    w = windows[..., :n_lags + p - 1]
    # real/imag planes: [..., cyc*2, win] @ [win, lags*seg]
    planes = jnp.stack([w.real, w.imag], axis=-2)
    planes = planes.reshape(*batch_shape, cyc * 2, -1)
    corr = _hunt_corr(cfg, planes, mat)
    corr = corr.reshape(*batch_shape, cyc, 2, n_lags, n_seg)
    power = _hunt_power_scale(cfg) * (corr * corr).sum(
        axis=(-3, -1))                                 # [B, cyc, lags]
    metric = _hunt_metric(cfg, power,
                          w.real * w.real + w.imag * w.imag)

    flat_m = metric.reshape(*batch_shape, -1)
    idx = jnp.argmax(flat_m, axis=-1)
    flat = power.reshape(*batch_shape, -1)
    peak = jnp.take_along_axis(flat, idx[..., None], -1)[..., 0]
    phase_idx = (idx // n_lags).astype(jnp.int32)
    lag = (idx % n_lags).astype(jnp.int32)

    # Sub-sample timing: a (lag, phase) pair IS an absolute sample
    # position t = lag*cycles + phase; the correlation power at t-1 /
    # t+1 (any phase/lag combination) brackets the peak, and a
    # parabolic fit gives the fractional offset.  The extraction step
    # blends adjacent samples by ``frac`` (SURVEY.md hard-part: the
    # reference quantizes timing to the decimation grid, qpsk.c:157-162,
    # costing up to +-0.5 samples = 1-2 dB at the slicer).
    if cfg.frac_timing:
        cyc = windows.shape[-2]
        pt = jnp.swapaxes(power, -1, -2).reshape(*batch_shape, -1)
        t = lag * cyc + phase_idx
        tmax = pt.shape[-1] - 1
        pm = jnp.take_along_axis(
            pt, jnp.clip(t - 1, 0, tmax)[..., None], -1)[..., 0]
        pp = jnp.take_along_axis(
            pt, jnp.clip(t + 1, 0, tmax)[..., None], -1)[..., 0]
        denom = pm + pp - 2.0 * peak
        frac = jnp.where(denom < -1e-12, 0.5 * (pm - pp) / denom, 0.0)
        frac = jnp.clip(frac, -0.5, 0.5)
        frac = jnp.where((t > 0) & (t < tmax), frac, 0.0)
    else:
        frac = jnp.zeros(batch_shape, jnp.float32)
    # Window energy at the peak is computed later from the extracted
    # packet (avoids a full [cyc, 2*n_sym] cumsum whose only consumer
    # is one value).
    return lag, phase_idx, peak, frac


def _extract_packet(cfg: ModemConfig, windows, lag, phase_idx, frac):
    """Extract the aligned packet window [pkt_window] (single channel).

    ``windows``: [cycles, 2*n_sym] decimated phases of the two-block
    hunt window.  A (lag, phase) pair addresses absolute sample
    t0 = (lag - L//2)*cycles + phase of the time-ordered filtered
    stream; the packet is the stride-``cycles`` comb from t0.  One
    transpose rebuilds the time-ordered stream, one scalar-start
    dynamic slice grabs the comb's span plus one sample either side,
    and a reshape exposes the comb and its +-1-sample neighbors as
    columns -- the 2-tap fractional-delay blend by ``frac`` is then a
    lerp between adjacent columns (at 5x oversampling adjacent samples
    are 0.2 symbol apart, so linear interpolation is accurate for the
    RRC-bandlimited signal).

    The first preamble chip lands at static index L//2, so every
    downstream offset (training window, data start) stays static.
    """
    cyc = cfg.cycles
    off = cfg.eq_length // 2
    pkt_len = cfg.pkt_window
    n_lags = cfg.symbols_per_block

    # time-ordered stream: s2[n*cyc + c] = windows[c, n]
    s2 = jnp.swapaxes(windows, -1, -2).reshape(-1)
    lpad = off * cyc + 1
    span = pkt_len * cyc + 2
    # max start (in padded coords) = (n_lags-1)*cyc + cyc-1
    rpad = max(0, (n_lags * cyc - 1) + span - (lpad + s2.shape[-1]))
    sp = jnp.pad(s2, (lpad, rpad))
    start = lag * cyc + phase_idx           # >= 0 by construction
    sl = lax.dynamic_slice_in_dim(sp, start, span)

    grid = sl[1:1 + pkt_len * cyc].reshape(pkt_len, cyc)[:, 0]
    if not cfg.frac_timing:
        return grid
    minus = sl[0:pkt_len * cyc].reshape(pkt_len, cyc)[:, 0]
    plus = sl[2:2 + pkt_len * cyc].reshape(pkt_len, cyc)[:, 0]
    af = jnp.abs(frac).astype(jnp.float32)
    nb = jnp.where(frac >= 0, plus, minus)
    return grid * (1.0 - af) + nb * af


def _train_and_decode(cfg: ModemConfig, pkt):
    """Closed-form equalizer fit + one-shot packet decode (no scans).

    ``pkt``: [pkt_window] CFO-corrected symbols ALIGNED so the first
    preamble chip sits at index L//2 (see prod_rx_backend: one dynamic
    gather extracts the packet; every offset here is static, so all
    window matrices are static slices).  Replaces the reference's
    serial train_eq x128 / data_eq recursion (qpsk.c:186-215) with the
    batch least-squares fit of the same problem
    (adaptive/ls_equalizer.py) -- the per-packet work is two matmuls, a
    5x5 solve, and a vectorized phase refinement.
    """
    off = cfg.eq_length // 2
    pre_real = jnp.asarray(PREAMBLE_VALUES.astype(np.float32))
    coeff, matches = ls_train(pkt, off, pre_real, cfg.eq_length,
                              cfg.ls_reg,
                              offtap_reg=cfg.ls_offtap_reg)
    start = off + cfg.preamble_length
    # Decision-directed refit: the preamble trains 6 dB below the data
    # amplitude (qpsk.c:313-319); refitting on first-pass decisions
    # recovers the estimation loss (adaptive/ls_equalizer.py ls_refit).
    # Guard: keep the refit only if it scores at least as well on the
    # KNOWN preamble chips (at low SNR decision-directed loops can
    # reinforce their own errors).
    C_pre = window_matrix(pkt, off, cfg.preamble_length, cfg.eq_length)
    for _ in range(cfg.ls_refit_iters):
        cand = ls_refit(pkt, start, coeff, cfg.frame_symbols,
                        offtap_reg=cfg.ls_offtap_reg_refit,
                        n_fit=cfg.ls_refit_symbols)
        m_old = jnp.sum(((C_pre @ coeff).real * pre_real) > 0, axis=-1)
        m_new = jnp.sum(((C_pre @ cand).real * pre_real) > 0, axis=-1)
        keep = (m_new >= m_old)
        coeff = jnp.where(keep[..., None], cand, coeff)
    raw = ls_decode(pkt, start, coeff, cfg.frame_symbols)
    _, dibits, err = phase_refine(raw, iterations=cfg.phase_refine_iters)
    return matches, dibits, err


def prod_rx_backend(cfg: ModemConfig, decim_prev, filtered, *,
                    descramble: bool = True):
    """Post-filter demodulation: decimate -> hunt -> CFO -> equalize.

    Single-channel; takes the matched-filter output ``filtered``
    [frame_size] complex plus the previous block's decimated phases
    ``decim_prev`` [cycles, n_sym].  Returns ``(decim_cur, ProdRxOut)``.
    Split out so the front-end can come from either the XLA path or the
    Pallas fused kernel (ops/frontend_pallas.py).
    """
    n_sym = cfg.symbols_per_block

    # All 5 decimation phases at once: [cycles, n_sym].
    decim_cur = filtered.reshape(n_sym, cfg.cycles).T

    # Two-block hunt windows per phase: [cycles, 2*n_sym].
    windows = jnp.concatenate([decim_prev, decim_cur], axis=-1)

    lag, phase_idx, peak, frac = _hunt(cfg, windows)

    # Extract the aligned packet window [pkt_window] with sub-sample
    # timing correction (_extract_packet).  A scalar-start dynamic
    # slice is far cheaper than an index-array gather on TPU; the first
    # chip sits at static index L//2 so downstream offsets are static.
    off = cfg.eq_length // 2
    pkt_len = cfg.pkt_window
    if windows.ndim == 2:
        pkt = _extract_packet(cfg, windows, lag, phase_idx, frac)
    else:
        pkt = jax.vmap(
            lambda w, l, p, f: _extract_packet(cfg, w, l, p, f)
        )(windows, lag, phase_idx, frac)

    # Energy gate (the gate the reference commented out, qpsk.c:196):
    # window energy at the peak, from the extracted packet.
    chips = pkt[..., off:off + cfg.preamble_length]
    energy = jnp.sum(chips.real ** 2 + chips.imag ** 2, axis=-1)
    gated = peak > energy * cfg.effective_peak_gate

    # FFT-based CFO search over the detected chips (promoted feature;
    # the reference's fft.c is dead code -- SURVEY.md quirk #4).
    pn = jnp.asarray(PREAMBLE_VALUES.astype(np.float32))
    cfo_hz, _ = estimate_cfo(chips, pn, cfg.rs, nfft=cfg.cfo_nfft)
    cfo_hz = jnp.where(gated, cfo_hz, 0.0)

    # De-rotate so training and data see a stable constellation;
    # rotation anchored at the preamble start (static index off).
    k = jnp.arange(pkt_len, dtype=jnp.float32) - off
    rot = jnp.exp(-1j * (2.0 * np.pi / cfg.rs) * cfo_hz * k
                  ).astype(jnp.complex64)
    pkt = pkt * rot

    matches, dibits, eq_error = _train_and_decode(cfg, pkt)
    valid = gated & (matches > cfg.match_threshold)

    if descramble:
        # Per-packet keystream reset (DVB frame-sync intent,
        # scramble.c:14-16).
        dibits, _ = scramble_dibits(dibits, jnp.int32(0))

    bits = jnp.stack([dibits & 1, dibits >> 1], axis=-1).reshape(
        *dibits.shape[:-1], -1).astype(jnp.uint8)

    out = ProdRxOut(
        valid=valid, bits=bits, matches=matches, lag=lag,
        timing_phase=phase_idx, peak=peak, energy=energy,
        cfo_hz=cfo_hz, eq_error=eq_error,
    )
    return decim_cur, out


def prod_rx_frame(cfg: ModemConfig, state: ProdRxState, pcm, *,
                  descramble: bool = True):
    """Demodulate one frame_size block; returns ``(state, ProdRxOut)``.

    Single-channel; ``jax.vmap`` supplies the channel axis.  XLA
    front-end (dsp/mixer.py + dsp/fir.py); for the Pallas fused
    front-end use ``prod_rx_stream_pallas``.
    """
    taps = rrc_taps(cfg.alpha, cfg.ntaps)

    # Downmix + matched filter the CURRENT block (streaming halo; no
    # double-buffer latency).
    x = pcm.astype(jnp.float32) / cfg.tx_amplitude
    raw, phase = mix_block(x, state.phase, -cfg.center, cfg.fs)
    filtered, fir_tail = fir_block(taps, cfg.fir_gain, state.fir_tail, raw)

    decim_cur, out = prod_rx_backend(cfg, state.decim_prev, filtered,
                                     descramble=descramble)
    new_state = ProdRxState(phase=phase, fir_tail=fir_tail,
                            decim_prev=decim_cur)
    return new_state, out


def prod_rx_stream(cfg: ModemConfig, state: ProdRxState, pcm_frames, *,
                   descramble: bool = True):
    """Stream demod over [n_frames, frame_size] blocks via lax.scan."""
    def body(st, pcm):
        return prod_rx_frame(cfg, st, pcm, descramble=descramble)

    return lax.scan(body, state, pcm_frames)


def _hunt_planes(cfg: ModemConfig, windows, *, col_offset: int = 0):
    """Plane-typed hunt: ``windows`` [C, cyc, 2, >=2*n_sym] f32
    (real/imag planes on axis 2).  Same metric as ``_hunt``; returns
    (lag, phase_idx, peak).  ``col_offset`` skips leading pad columns
    (the fused-extract path stores windows left-padded by eq_length//2
    so the DMA extraction can index packets at ``lag`` directly)."""
    n_lags = cfg.symbols_per_block
    p = cfg.preamble_length
    n_seg = cfg.corr_segments
    mat = jnp.asarray(_segment_band_matrix(n_lags, n_seg, p))

    C, cyc = windows.shape[0], windows.shape[1]
    w = windows[..., col_offset:col_offset + n_lags + p - 1]
    planes = w.reshape(C, cyc * 2, -1)
    corr = _hunt_corr(cfg, planes, mat)
    corr = corr.reshape(C, cyc, 2, n_lags, n_seg)
    power = _hunt_power_scale(cfg) * (corr * corr).sum(
        axis=(-3, -1))                                 # [C, cyc, lags]
    metric = _hunt_metric(cfg, power,
                          w[:, :, 0] * w[:, :, 0]
                          + w[:, :, 1] * w[:, :, 1])

    flat_m = metric.reshape(C, -1)
    idx = jnp.argmax(flat_m, axis=-1)
    flat = power.reshape(C, -1)
    peak = jnp.take_along_axis(flat, idx[..., None], -1)[..., 0]
    phase_idx = (idx // n_lags).astype(jnp.int32)
    lag = (idx % n_lags).astype(jnp.int32)
    return lag, phase_idx, peak


def _extract_packet_planes(cfg: ModemConfig, windows, lag, phase_idx):
    """Plane-typed packet extraction (integer timing only).

    ``windows``: [C, cyc, 2, 2*n_sym] f32.  pkt[t] =
    windows[phase_idx, :, lag - off + t] (identical alignment to
    ``_extract_packet`` with frac=0): phase select is a one-hot
    contraction over the cyc axis, then one symbol-domain dynamic
    slice per channel -- no time-ordered 5x-oversampled intermediate.
    Returns [C, 2, pkt_window].
    """
    cyc = cfg.cycles
    off = cfg.eq_length // 2
    pkt_len = cfg.pkt_window
    W = windows.shape[-1]

    oh = jax.nn.one_hot(phase_idx, cyc, dtype=windows.dtype)
    sel = jnp.einsum("bc,bcpw->bpw", oh, windows)       # [C, 2, W]
    rpad = max(0, (cfg.symbols_per_block - 1) + pkt_len - (off + W))
    sp = jnp.pad(sel, ((0, 0), (0, 0), (off, rpad)))
    pkt = jax.vmap(
        lambda s, l: lax.dynamic_slice_in_dim(s, l, pkt_len, axis=-1)
    )(sp, lag)
    return pkt


def prod_rx_stream_pallas(cfg: ModemConfig, state: ProdRxState,
                          pcm_frames, *, descramble: bool = True,
                          block_channels: int = 256,
                          decode_block_channels: int = 64,
                          fuse_decode: bool = True,
                          interpret: bool = False):
    """Batched stream demod with the Pallas fused kernels.

    ``state``: channel-batched ProdRxState ([C] leading axis);
    ``pcm_frames``: [n_frames, C, frame_size] int16.  The front-end
    (int16 -> downmix -> RRC) runs as one VMEM-resident kernel per
    channel block (ops/frontend_pallas.py); with ``fuse_decode`` the
    whole post-extraction chain (CFO -> LS fit -> decode -> refine ->
    descramble) runs as a second fused kernel (ops/decode_pallas.py),
    leaving only decimation, the bf16 hunt matmul, and the packet
    extraction in XLA.

    The fused path carries ALL scan state as real/imag float planes
    (complex64 never appears inside the scan body): Mosaic has no
    complex dtype, so a complex-typed carry forces plane<->complex
    conversion glue on every stage boundary -- measurably the largest
    non-kernel cost of the previous design (ROADMAP.md round-1 perf
    table).  Conversion to/from the public complex ``ProdRxState``
    happens once per stream call.
    """
    from ..ops.decode_pallas import fused_decode
    from ..ops.frontend_pallas import fused_frontend, fused_frontend_decim

    n_sym = cfg.symbols_per_block

    if not fuse_decode or cfg.frac_timing:
        # Reference-structured path (complex carry, XLA backend or
        # fractional-timing extraction).
        def body_c(st, pcm):
            fr, fi, ntr, nti, npr, npi = fused_frontend(
                cfg, pcm, st.phase.real, st.phase.imag,
                st.fir_tail.real, st.fir_tail.imag,
                block_channels=_auto_cb(pcm.shape[0], block_channels),
                interpret=interpret)
            filtered = lax.complex(fr, fi)

            if not fuse_decode:
                decim_cur, out = jax.vmap(
                    lambda dp, f: prod_rx_backend(cfg, dp, f,
                                                  descramble=descramble)
                )(st.decim_prev, filtered)
            else:
                decim_cur = filtered.reshape(-1, n_sym, cfg.cycles)
                decim_cur = jnp.swapaxes(decim_cur, -1, -2)
                windows = jnp.concatenate(
                    [st.decim_prev, decim_cur], axis=-1)
                lag, phase_idx, peak, frac = _hunt(cfg, windows)
                pkt = jax.vmap(
                    lambda w, l, p, f: _extract_packet(cfg, w, l, p, f)
                )(windows, lag, phase_idx, frac)
                dec = fused_decode(
                    cfg, pkt.real, pkt.imag, peak,
                    descramble=descramble,
                    block_channels=min(decode_block_channels,
                                       pkt.shape[0]),
                    interpret=interpret)
                out = _decode_out(cfg, dec, lag, phase_idx, peak)

            new_state = ProdRxState(
                phase=lax.complex(npr, npi),
                fir_tail=lax.complex(ntr, nti),
                decim_prev=decim_cur)
            return new_state, out

        return lax.scan(body_c, state, pcm_frames)

    # ---- plane-typed fast path (fused hunt+extract+decode kernel,
    # transposed decim carry [cyc, 2, C, n_sym]) ----
    from ..ops.decode_pallas import fused_hunt_decode_decim

    def body(st, pcm):
        pr, pi_, tr, ti, dprev_t = st
        dcur_t, ntr, nti, npr, npi = fused_frontend_decim(
            cfg, pcm, pr, pi_, tr, ti,
            block_channels=_auto_cb(pcm.shape[0], block_channels),
            transposed=True, interpret=interpret)

        C = pcm.shape[0]
        dec = fused_hunt_decode_decim(
            cfg, dprev_t, dcur_t, channels=C, descramble=descramble,
            block_channels=min(decode_block_channels, C),
            interpret=interpret)
        out = _decode_out(cfg, dec, dec["lag"], dec["phase_idx"],
                          dec["peak"])
        return (npr, npi, ntr, nti, dcur_t), out

    ddt = (jnp.bfloat16 if cfg.decim_dtype == "bf16"
           else jnp.float32)
    st0 = (state.phase.real, state.phase.imag,
           state.fir_tail.real, state.fir_tail.imag,
           jnp.transpose(
               jnp.stack([state.decim_prev.real, state.decim_prev.imag],
                         axis=0), (2, 0, 1, 3)).astype(ddt))
    (npr, npi, ntr, nti, dcur_t), outs = lax.scan(body, st0, pcm_frames)
    final = ProdRxState(
        phase=lax.complex(npr, npi),
        fir_tail=lax.complex(ntr, nti),
        decim_prev=lax.complex(
            jnp.transpose(dcur_t[:, 0], (1, 0, 2)).astype(jnp.float32),
            jnp.transpose(dcur_t[:, 1], (1, 0, 2)).astype(jnp.float32)))
    return final, outs


def prod_rx_stream_superstep(cfg: ModemConfig, state, pcm_frames, *,
                             superstep: int = 4,
                             descramble: bool = True,
                             block_channels: int = 128,
                             decode_block_channels: int | None = None,
                             fuse_frontend: bool = False,
                             interpret: bool = False):
    """Streaming demod at BATCH-mode throughput: scan over K-block
    super-steps.

    The per-block streaming scan (``prod_rx_stream_pallas``) pays one
    dispatch round of kernel-launch + state plumbing per 1880-sample
    block -- measured 13% behind batch mode at identical geometry
    (ROADMAP r3).  Every carried quantity of the production RX is
    closed-form across a group of K blocks (``prod_rx_batch``), and
    the splice between consecutive batch calls is exact
    (tests/test_batch_rx.py test_batch_rx_state_carry_across_calls),
    so a stream arriving K blocks at a time can run each arrival as
    ONE batch dispatch: throughput amortizes to batch mode while
    latency is bounded at K blocks (K * 235 ms of signal at 8 kHz).

    ``state`` may be a ProdRxState or the plane tuple
    (prod_rx_init_planes); the same type is returned.
    ``pcm_frames``: [n_blocks, C, frame_size] int16 with n_blocks a
    multiple of ``superstep``.
    """
    B = pcm_frames.shape[0]
    if B % superstep:
        raise ValueError(f"n_blocks ({B}) not a multiple of "
                         f"superstep ({superstep})")
    groups = pcm_frames.reshape(B // superstep, superstep,
                                *pcm_frames.shape[1:])
    plane_state = not isinstance(state, ProdRxState)
    st0 = state if plane_state else state_to_planes(cfg, state)

    def body(st, grp):
        return prod_rx_batch(
            cfg, st, grp, descramble=descramble,
            block_channels=block_channels,
            decode_block_channels=decode_block_channels,
            fuse_frontend=fuse_frontend, interpret=interpret)

    st_f, outs = lax.scan(body, st0, groups)
    outs = jax.tree.map(
        lambda x: x.reshape(B, *x.shape[2:]), outs)
    return (st_f if plane_state else planes_to_state(st_f)), outs


def prod_rx_batch(cfg: ModemConfig, state: ProdRxState, pcm_frames, *,
                  descramble: bool = True, block_channels: int = 128,
                  decode_block_channels: int | None = None,
                  segs_per_chunk: int = 2,
                  fuse_extract: bool = True, fuse_hunt: bool = True,
                  fuse_frontend: bool = False,
                  interpret: bool = False):
    """Block-PARALLEL batched demod: no scan, no sequential carries.

    Same contract as ``prod_rx_stream_pallas`` (``pcm_frames``
    [n_frames, C, frame_size] int16 -> (final_state, outs with
    [n_frames, C, ...] leaves)) but exploits that every carried
    quantity of the production RX is a CLOSED-FORM function of the raw
    input:

      * the mixer phase advances by a constant unit phasor per block:
        phase_b = phase_0 * adv^b, with adv^b tabulated in float64;
      * the FIR halo entering block b is just the last ntaps-1
        downmixed samples of raw block b-1 (a handful of elementwise
        ops on the raw PCM tail);
      * the hunt window's previous-block symbols are another batch
        element's front-end output.

    All n_frames*C (block, channel) pairs therefore run as ONE batched
    front-end kernel + ONE hunt matmul + ONE extraction + ONE decode
    kernel -- a lax.scan would serialize n_frames dispatch rounds for
    carries that were never actually sequential.  (The reference's
    per-sample recursions -- running phasor qpsk.c:139-147, FIR delay
    line fir.c:30-34 -- are the source of the apparent dependency; both
    are linear and time-invariant, hence the closed forms.)

    This is the throughput path (bench.py).  For streaming arrival
    (one block at a time) use ``prod_rx_stream_pallas``; results agree
    to decision level (tests/test_batch_rx.py).
    """
    from ..ops.decode_pallas import fused_decode
    from ..ops.frontend_pallas import fused_frontend_decim

    if cfg.frac_timing and (fuse_hunt or fuse_extract or fuse_frontend):
        # The batch hunt/extract paths run INTEGER timing only
        # (_hunt_planes / the in-kernel barrel-shift extraction); a
        # frac_timing config through them would silently lose the
        # feature and diverge from the XLA oracle (VERDICT r4 weak #4).
        # The streaming path falls back automatically
        # (prod_rx_stream_pallas); batch has no frac-capable
        # formulation, so fail loudly.
        raise ValueError(
            "cfg.frac_timing=True is not supported by the fused batch "
            "paths (integer-timing extraction only); use "
            "prod_rx_stream_pallas (falls back to the fractional-"
            "capable scan body) or set frac_timing=False")
    B, C = pcm_frames.shape[0], pcm_frames.shape[1]
    n = cfg.frame_size
    halo = cfg.ntaps - 1
    n_sym = cfg.symbols_per_block
    inv_scale = 1.0 / cfg.tx_amplitude
    if decode_block_channels is None:
        # measured sweet spots differ per kernel: the ONE-kernel fused
        # RX runs fastest at cb=128 (6.38 vs 6.13 GS/s at cb=64;
        # cb=32 5.37, cb=256 5.47), while the standalone decode
        # kernel's cb=128 is a 20x Mosaic pathology (ROADMAP r3) --
        # keep 64 there.  Channel counts the sweet spot does not
        # divide fall back to the largest divisor (ADVICE r4: C=192
        # must not hit the kernels' divisibility check).
        decode_block_channels = _auto_cb(
            C, 128 if fuse_frontend else 64)

    # ``state`` may be the public complex ProdRxState or the plane
    # tuple (prod_rx_init_planes); with planes the output state stays
    # in plane layout too -- carrying planes across dispatches skips
    # the GB-scale complex<->transposed-plane conversions per call.
    plane_state = not isinstance(state, ProdRxState)
    if plane_state:
        if not (fuse_extract and fuse_hunt):
            # public-API precondition: must survive python -O
            raise TypeError(
                "plane-typed state (prod_rx_init_planes) requires the "
                "fully fused path (fuse_extract=True, fuse_hunt=True); "
                "pass a ProdRxState for the unfused paths")
        p0r, p0i, tail0_r, tail0_i, dprev0_t_in = state
    else:
        p0r, p0i = state.phase.real, state.phase.imag
        tail0_r = state.fir_tail.real
        tail0_i = state.fir_tail.imag
        dprev0_t_in = None

    if fuse_frontend:
        # ---- ONE-kernel path: front-end + hunt + decode fused, decim
        # ring carried in VMEM across the time-block grid walk
        # (ops/fused_rx.py).  No decim-plane HBM traffic at all.
        from ..ops.fused_rx import fused_rx_block
        if not (fuse_extract and fuse_hunt):
            raise ValueError(
                "fuse_frontend requires fuse_extract and fuse_hunt")
        if plane_state:
            dprev0_t = dprev0_t_in
        else:
            dprev0_t = jnp.transpose(
                jnp.stack([state.decim_prev.real, state.decim_prev.imag],
                          axis=0), (2, 0, 1, 3))
        dec, dlast, (fr, fi, ftr, fti) = fused_rx_block(
            cfg, pcm_frames, p0r, p0i, tail0_r, tail0_i, dprev0_t,
            descramble=descramble,
            block_channels=min(decode_block_channels, C),
            segs_per_chunk=segs_per_chunk, interpret=interpret)
        out = _decode_out(cfg, dec, dec["lag"], dec["phase_idx"],
                          dec["peak"])
        out = jax.tree.map(lambda x: x.reshape(B, C, *x.shape[1:]), out)
        if plane_state:
            return (fr, fi, ftr, fti, dlast), out
        return ProdRxState(
            phase=lax.complex(fr, fi),
            fir_tail=lax.complex(ftr, fti),
            decim_prev=lax.complex(
                jnp.transpose(dlast[:, 0], (1, 0, 2)).astype(
                    jnp.float32),
                jnp.transpose(dlast[:, 1], (1, 0, 2)).astype(
                    jnp.float32))), out

    table = mixer_table(-cfg.center, cfg.fs, n)
    # adv^b for b in [0, B], float64 phase -> exactly-unit complex64
    w = -2.0 * np.pi * cfg.center / cfg.fs
    advs = np.exp(1j * w * n * np.arange(B + 1)).astype(np.complex64)

    # phases[b] = phase_0 * adv^b  (planes [B, C])
    ar = jnp.asarray(advs.real[:B, None])
    ai = jnp.asarray(advs.imag[:B, None])
    ph_r = p0r[None, :] * ar - p0i[None, :] * ai
    ph_i = p0r[None, :] * ai + p0i[None, :] * ar

    # tails[b] = last `halo` downmixed samples of raw block b-1
    # (tails[0] = carried state), in scaled units.
    x_t = pcm_frames[:, :, n - halo:].astype(jnp.float32) * inv_scale
    tl_r, tl_i = downmix_tail(cfg.center, cfg.fs, n, halo, x_t,
                              ph_r[..., None], ph_i[..., None])
    tails_r = jnp.concatenate([tail0_r[None], tl_r[:-1]], 0)
    tails_i = jnp.concatenate([tail0_i[None], tl_i[:-1]], 0)

    # ---- one batched front-end over all B*C (block, channel) pairs ----
    N = B * C

    if fuse_extract and fuse_hunt:
        # Fully fused post-frontend path: ONE kernel does hunt +
        # extract + decode (ops/decode_pallas.fused_hunt_decode_decim)
        # on TRANSPOSED decim planes [cyc, 2, N+C, n_sym] -- the
        # channel-major layout's (2, W) VMEM tiles sublane-pad 4x, the
        # XLA hunt round-trips its [N, cyc*2, lags*segs] corr
        # intermediate through HBM (the dominant hunt cost), and the
        # kernel reads prev/cur decim blocks directly (rows k and k+C
        # of one array) instead of a materialized padded windows array.
        from ..ops.decode_pallas import fused_hunt_decode_decim
        dcur_t, _, _, _, _ = fused_frontend_decim(
            cfg, pcm_frames.reshape(N, n),
            ph_r.reshape(N), ph_i.reshape(N),
            tails_r.reshape(N, halo), tails_i.reshape(N, halo),
            block_channels=_auto_cb(N, block_channels),
            transposed=True,
            interpret=interpret)

        if plane_state:
            dprev0_t = dprev0_t_in.astype(dcur_t.dtype)
        else:
            dprev0_t = jnp.stack(
                [state.decim_prev.real, state.decim_prev.imag],
                axis=0)                                 # [2, C, cyc, .]
            dprev0_t = jnp.transpose(dprev0_t, (2, 0, 1, 3)).astype(
                dcur_t.dtype)

        dec = fused_hunt_decode_decim(
            cfg, dprev0_t, dcur_t, channels=C, descramble=descramble,
            block_channels=min(decode_block_channels, N, C),
            segs_per_chunk=segs_per_chunk,
            interpret=interpret)
        lag, phase_idx = dec["lag"], dec["phase_idx"]
        peak = dec["peak"]
        out = _decode_out(cfg, dec, lag, phase_idx, peak)
        out = jax.tree.map(lambda x: x.reshape(B, C, *x.shape[1:]), out)

        # ---- final state (closed form) ----
        fr = (p0r * np.float32(advs.real[B])
              - p0i * np.float32(advs.imag[B]))
        fi = (p0r * np.float32(advs.imag[B])
              + p0i * np.float32(advs.real[B]))
        mag = jnp.sqrt(fr * fr + fi * fi)
        dlast = dcur_t[:, :, (B - 1) * C:]              # [cyc, 2, C, .]
        if plane_state:
            return (fr / mag, fi / mag, tl_r[-1], tl_i[-1], dlast), out
        return ProdRxState(
            phase=lax.complex(fr / mag, fi / mag),
            fir_tail=lax.complex(tl_r[-1], tl_i[-1]),
            decim_prev=lax.complex(
                jnp.transpose(dlast[:, 0], (1, 0, 2)).astype(
                    jnp.float32),
                jnp.transpose(dlast[:, 1], (1, 0, 2)).astype(
                    jnp.float32))), out

    dcur, _, _, _, _ = fused_frontend_decim(
        cfg, pcm_frames.reshape(N, n),
        ph_r.reshape(N), ph_i.reshape(N),
        tails_r.reshape(N, halo), tails_i.reshape(N, halo),
        block_channels=_auto_cb(N, block_channels), interpret=interpret)
    decim = dcur.reshape(B, C, cfg.cycles, 2, n_sym)

    # hunt windows: [prev | cur] along the symbol axis
    dprev0 = jnp.stack([state.decim_prev.real, state.decim_prev.imag],
                       axis=1)                           # [C, 2, ...]
    dprev0 = jnp.swapaxes(dprev0, 1, 2)[None]            # [1, C, cyc, 2, .]
    dprev = jnp.concatenate([dprev0, decim[:-1]], axis=0)

    if fuse_extract:
        # One padded windows array serves BOTH the hunt (reads at a
        # column offset) and the in-kernel DMA extraction (indexes
        # packets at `lag` directly): [off | prev | cur | rpad].
        from ..ops.decode_pallas import fused_decode_extract
        off = cfg.eq_length // 2
        need = (n_sym - 1) + cfg.pkt_window
        wp = -(-max(need, off + 2 * n_sym) // 128) * 128
        zl = jnp.zeros((B, C, cfg.cycles, 2, off), jnp.float32)
        zr_ = jnp.zeros((B, C, cfg.cycles, 2, wp - off - 2 * n_sym),
                        jnp.float32)
        windows = jnp.concatenate([zl, dprev, decim, zr_], -1).reshape(
            N, cfg.cycles, 2, wp)
        lag, phase_idx, peak = _hunt_planes(cfg, windows,
                                            col_offset=off)
        dec = fused_decode_extract(
            cfg, windows, lag, phase_idx, peak, descramble=descramble,
            block_channels=min(decode_block_channels, N),
            interpret=interpret)
    else:
        windows = jnp.concatenate([dprev, decim], axis=-1).reshape(
            N, cfg.cycles, 2, 2 * n_sym)
        lag, phase_idx, peak = _hunt_planes(cfg, windows)
        pkt = _extract_packet_planes(cfg, windows, lag, phase_idx)
        dec = fused_decode(cfg, pkt[:, 0], pkt[:, 1], peak,
                           descramble=descramble,
                           block_channels=min(decode_block_channels, N),
                           interpret=interpret)
    out = _decode_out(cfg, dec, lag, phase_idx, peak)
    out = jax.tree.map(lambda x: x.reshape(B, C, *x.shape[1:]), out)

    # ---- final state (closed form) ----
    fr = p0r * np.float32(advs.real[B]) - p0i * np.float32(advs.imag[B])
    fi = p0r * np.float32(advs.imag[B]) + p0i * np.float32(advs.real[B])
    mag = jnp.sqrt(fr * fr + fi * fi)
    final = ProdRxState(
        phase=lax.complex(fr / mag, fi / mag),
        fir_tail=lax.complex(tl_r[-1], tl_i[-1]),
        decim_prev=lax.complex(decim[-1, :, :, 0, :],
                               decim[-1, :, :, 1, :]))
    return final, out


def _auto_cb(C: int, cap: int) -> int:
    """Largest channel-block size <= cap that divides C (the Pallas
    kernels require C % cb == 0)."""
    cb = min(cap, C)
    while C % cb:
        cb -= 1
    return cb


def dibits_to_bits(dibits):
    """u8 dibits {0..3} -> the interleaved ProdRxOut.bits layout
    (single definition shared with the gated pipeline -- code-review
    r5 finding #2)."""
    d = dibits.astype(jnp.uint8)
    return jnp.stack([d & 1, d >> 1], axis=-1).reshape(
        *d.shape[:-1], -1).astype(jnp.uint8)


def _decode_out(cfg: ModemConfig, dec, lag, phase_idx, peak) -> ProdRxOut:
    """Assemble ProdRxOut from the fused-decode kernel's stat dict."""
    valid = dec["gated"] & (dec["matches"] > cfg.match_threshold)
    bits = dibits_to_bits(dec["dibits"])
    return ProdRxOut(
        valid=valid, bits=bits, matches=dec["matches"], lag=lag,
        timing_phase=phase_idx, peak=peak, energy=dec["energy"],
        cfo_hz=dec["cfo_hz"], eq_error=dec["eq_error"],
    )


def make_prod_rx_fn(cfg: ModemConfig, *, descramble: bool = True,
                    batched: bool = False, pallas: bool = False):
    if pallas:
        def fn(state, pcm_frames):
            return prod_rx_stream_pallas(cfg, state, pcm_frames,
                                         descramble=descramble)
        return jax.jit(fn)

    def fn(state, pcm_frames):
        return prod_rx_stream(cfg, state, pcm_frames, descramble=descramble)

    if batched:
        fn = jax.vmap(fn)
    return jax.jit(fn)
