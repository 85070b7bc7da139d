"""Pallas fused RX front-end: int16 PCM -> matched-filtered baseband.

Fuses the first RX stages (reference: src/qpsk.c:138-162 -- downmix,
RRC matched filter) into ONE kernel so the [C, 1880] complex
intermediates never round-trip HBM: per channel block, the kernel

  1. converts int16 PCM to float and downmixes against the per-channel
     carrier phasor times the (host-precomputed, float64-accurate)
     relative ramp table,
  2. applies the 49-tap RRC as 49 shifted multiply-accumulates over the
     VMEM-resident [tail | block] buffer (overlap-save, fir.c:22-43
     semantics).

Decimation afterwards is a free strided reshape; the 48-sample FIR
tail and the phase advance are recomputed outside the kernel from the
raw inputs (a handful of elementwise ops) so the kernel has exactly
one fat output -- mixed skinny/fat output blocks triggered whole-array
VMEM staging in XLA's layout assignment on this backend.

Complex data travels as separate real/imag planes: Mosaic has no
complex dtype, and the axon backend cannot transfer complex across
host<->device anyway (utils/compat.py).

The XLA implementation (frontend_reference) is the correctness oracle;
tests compare both paths in interpret mode.
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
from ..constants import rrc_taps
from ..dsp.fir import fir_block
from ..dsp.mixer import mix_block, mixer_table


def _kernel(pcm_ref, ph_ref, tail_ref, tab_ref, taps_ref, out_ref,
            z_ref, *, n: int, ntaps: int, inv_scale: float,
            gain: float):
    halo = ntaps - 1
    x = pcm_ref[...].astype(jnp.float32) * inv_scale       # [CB, n]

    # Downmix: real PCM x complex (phase * table): two real products.
    pr = ph_ref[:, 0:1, 0]                                 # [CB, 1]
    pi = ph_ref[:, 1:2, 0]
    tr = tab_ref[0, 0:1, :]                                # [1, n]
    ti = tab_ref[0, 1:2, :]
    z_ref[:, 0, :halo] = tail_ref[:, 0, :]
    z_ref[:, 1, :halo] = tail_ref[:, 1, :]
    z_ref[:, 0, halo:] = x * (pr * tr - pi * ti)
    z_ref[:, 1, halo:] = x * (pr * ti + pi * tr)

    # 49 shifted MACs: y[t] = sum_k (gain*taps[k]) * z[t + k].
    # Static shift offsets (Mosaic requires lane-dim indices provably
    # 128-aligned for dynamic slices), accumulating THROUGH the output
    # ref in VMEM: a fully register-resident accumulation at this tile
    # size spills the register allocator by >100MB.
    out_ref[...] = jnp.zeros_like(out_ref)
    for k in range(ntaps):
        w = taps_ref[0, 0, k] * gain
        out_ref[:, 0, :] += w * z_ref[:, 0, k:k + n]
        out_ref[:, 1, :] += w * z_ref[:, 1, k:k + n]


def fused_frontend(cfg: ModemConfig, pcm, phase_r, phase_i,
                   tail_r, tail_i, *, block_channels: int = 256,
                   interpret: bool = False):
    """Run the fused front-end.

    Args:
      pcm:     [C, frame_size] int16.
      phase_r/phase_i: [C] mixer phasor planes.
      tail_r/tail_i:   [C, ntaps-1] FIR halo planes (last downmixed
                       samples of the previous block).

    Returns (filt_r, filt_i, new_tail_r, new_tail_i, new_phase_r,
    new_phase_i); filt_* are [C, frame_size] matched-filter outputs.
    """
    n = cfg.frame_size
    ntaps = cfg.ntaps
    halo = ntaps - 1
    C = pcm.shape[0]
    cb = min(block_channels, C)
    assert C % cb == 0, (C, cb)

    table = mixer_table(-cfg.center, cfg.fs, n)
    tab = jnp.asarray(
        np.stack([table.real, table.imag]).reshape(1, 2, n))
    taps_np = rrc_taps(cfg.alpha, cfg.ntaps)
    taps = jnp.asarray(taps_np.reshape(1, 1, ntaps))
    phases = jnp.stack([phase_r, phase_i], axis=1)[..., None]  # [C,2,1]
    tails = jnp.stack([tail_r, tail_i], axis=1)                # [C,2,halo]

    kern = functools.partial(
        _kernel, n=n, ntaps=ntaps, inv_scale=1.0 / cfg.tx_amplitude,
        gain=cfg.fir_gain)

    filt = pl.pallas_call(
        kern,
        grid=(C // cb,),
        in_specs=[
            pl.BlockSpec((cb, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 2, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 2, halo), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ntaps), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, 2, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 2, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cb, 2, n + halo), jnp.float32),
        ],
        interpret=interpret,
    )(pcm, phases, tails, tab, taps)

    filt_r = filt[:, 0, :]
    filt_i = filt[:, 1, :]

    # New FIR tail: last `halo` downmixed samples, recomputed directly
    # from the raw inputs (cheap; keeps the kernel single-output).
    x_t = pcm[:, n - halo:].astype(jnp.float32) / cfg.tx_amplitude
    tr_t = jnp.asarray(table.real[n - halo:])
    ti_t = jnp.asarray(table.imag[n - halo:])
    ntail_r = x_t * (phase_r[:, None] * tr_t - phase_i[:, None] * ti_t)
    ntail_i = x_t * (phase_r[:, None] * ti_t + phase_i[:, None] * tr_t)

    # Phase advance.
    adv = table[n - 1]
    npr = phase_r * np.float32(adv.real) - phase_i * np.float32(adv.imag)
    npi = phase_r * np.float32(adv.imag) + phase_i * np.float32(adv.real)
    mag = jnp.sqrt(npr * npr + npi * npi)
    return filt_r, filt_i, ntail_r, ntail_i, npr / mag, npi / mag


def _kernel_decim(pcm_ref, ph_ref, tail_ref, tab_ref, tdec_ref, out_ref,
                  zr_ref, zi_ref, *, n: int, ntaps: int, cyc: int,
                  n_sym: int, chunk: int, inv_scale: float,
                  transposed: bool = False):
    """Decimating-matmul front-end: downmix on the VPU, then the RRC
    matched filter + decimation as MXU matmuls.

    The shifted-MAC formulation (``_kernel``) is VMEM-bandwidth-bound:
    every one of the 49 taps re-reads the [cb, n] window and
    read-modify-writes the accumulator through the output ref.  Here
    y_dec[c, s] = sum_k w_k z[s*cyc + c + k] is computed 128 symbols at
    a time as ``z[:, start:start+K] @ T`` with the banded tap matrix
    T[cyc*j + k, j] = w_k -- each output element is ONE MXU matmul
    result, the decimation is folded into T's row stride, and the
    output is emitted directly in decimated [cyc, plane, sym] layout
    (no XLA-side transpose).
    """
    halo = ntaps - 1
    nchunk = -(-n_sym // chunk)
    klen = cyc * (chunk - 1) + ntaps
    zdt = zr_ref.dtype

    x = pcm_ref[...].astype(jnp.float32) * inv_scale       # [CB, n]
    pr = ph_ref[:, 0:1, 0]
    pi = ph_ref[:, 1:2, 0]
    tr = tab_ref[0, 0:1, :]
    ti = tab_ref[0, 1:2, :]
    zr_ref[:, :halo] = tail_ref[:, 0, :].astype(zdt)
    zi_ref[:, :halo] = tail_ref[:, 1, :].astype(zdt)
    zr_ref[:, halo:halo + n] = (x * (pr * tr - pi * ti)).astype(zdt)
    zi_ref[:, halo:halo + n] = (x * (pr * ti + pi * tr)).astype(zdt)
    pad = zr_ref.shape[-1] - (halo + n)
    if pad:
        zr_ref[:, halo + n:] = jnp.zeros_like(zr_ref[:, halo + n:])
        zi_ref[:, halo + n:] = jnp.zeros_like(zi_ref[:, halo + n:])

    td = tdec_ref[0]                                       # [klen, chunk]
    for c in range(cyc):
        for p, z_ref in enumerate((zr_ref, zi_ref)):
            for b in range(nchunk):
                start = b * cyc * chunk + c
                y = jnp.dot(z_ref[:, start:start + klen], td,
                            preferred_element_type=jnp.float32)
                w = min(chunk, n_sym - b * chunk)
                ys = y[:, :w].astype(out_ref.dtype)
                if transposed:
                    out_ref[c, p, :, b * chunk:b * chunk + w] = ys
                else:
                    out_ref[:, c, p, b * chunk:b * chunk + w] = ys


def _kernel_decim_aligned(pcm_ref, ph_ref, tail_ref, tab_ref, tdec_ref,
                          out_ref, zr_ref, zi_ref, *, n: int, ntaps: int,
                          cyc: int, n_sym: int, chunk: int, zpad: int,
                          klen_pad: int, inv_scale: float,
                          transposed: bool, debug_mode: str = "none"):
    """Lane-ALIGNED decimating-matmul front-end.

    ``_kernel_decim``'s dot operands were lane slices at offsets
    ``b*cyc*chunk + c`` -- the per-phase ``+c`` is never 128-aligned,
    so Mosaic inserts a relayout roll before every one of the
    nchunk*cyc*2 dots; together with the halo-offset block store
    (z[halo:halo+n], offset 48) those rolls dominated the kernel
    (roofline verdict: VPU/latency-bound at 6.6% MXU).

    Fixes, all static-layout:

      * the [tail | block] stream is stored at buffer offset
        ``zpad - halo`` with zpad = 128: the fat block store lands at
        lane 128 (aligned); the 48-wide tail store sits inside one
        lane tile.
      * the decimation-phase offset moves INTO the tap matrix: column
        c*chunk + j of T holds taps at rows
        (zpad - halo) + j*cyc + c + k, so one dot per (plane, chunk)
        emits ALL ``cyc`` phases: [cb, klen_pad] @ [klen_pad,
        cyc*chunk].  Slice starts are b*cyc*chunk (cyc*chunk is a
        multiple of 128) and klen_pad is 128-rounded.
    """
    nchunk = -(-n_sym // chunk)
    zdt = zr_ref.dtype
    lead = zpad - (ntaps - 1)

    x = pcm_ref[...].astype(jnp.float32) * inv_scale       # [CB, n]
    pr = ph_ref[:, 0:1, 0]
    pi = ph_ref[:, 1:2, 0]
    tr = tab_ref[0, 0:1, :]
    ti = tab_ref[0, 1:2, :]
    zr_ref[:, :lead] = jnp.zeros_like(zr_ref[:, :lead])
    zi_ref[:, :lead] = jnp.zeros_like(zi_ref[:, :lead])
    zr_ref[:, lead:zpad] = tail_ref[:, 0, :].astype(zdt)
    zi_ref[:, lead:zpad] = tail_ref[:, 1, :].astype(zdt)
    if debug_mode == "store_only":
        # probe: int16 convert + stores, no mixer products
        zr_ref[:, zpad:zpad + n] = x.astype(zdt)
        zi_ref[:, zpad:zpad + n] = x.astype(zdt)
    elif debug_mode == "const_table":
        # probe: mixer products against scalar constants (isolates the
        # [1, n] table sublane-broadcast cost)
        zr_ref[:, zpad:zpad + n] = (x * (pr * 0.6 - pi * 0.8)).astype(zdt)
        zi_ref[:, zpad:zpad + n] = (x * (pr * 0.8 + pi * 0.6)).astype(zdt)
    else:
        zr_ref[:, zpad:zpad + n] = (x * (pr * tr - pi * ti)).astype(zdt)
        zi_ref[:, zpad:zpad + n] = (x * (pr * ti + pi * tr)).astype(zdt)
    pad = zr_ref.shape[-1] - (zpad + n)
    if pad:
        zr_ref[:, zpad + n:] = jnp.zeros_like(zr_ref[:, zpad + n:])
        zi_ref[:, zpad + n:] = jnp.zeros_like(zi_ref[:, zpad + n:])

    if debug_mode != "none":
        # cost probes: consume z so the stores aren't DCE'd, skip the
        # decimation matmuls (tools/profile_stages --fused --stages)
        s = jnp.sum((zr_ref[:, :chunk] + zi_ref[:, :chunk]
                     ).astype(jnp.float32), axis=1,
                    keepdims=True).astype(out_ref.dtype)   # [cb, 1]
        if transposed:
            out_ref[...] = (jnp.zeros_like(out_ref)
                            + s[None, None, :, :])
        else:
            out_ref[...] = (jnp.zeros_like(out_ref)
                            + s[:, None, None, :])
        return

    td = tdec_ref[0]                               # [klen_pad, cyc*chunk]
    for p, z_ref in enumerate((zr_ref, zi_ref)):
        for b in range(nchunk):
            start = b * cyc * chunk
            y = jnp.dot(z_ref[:, start:start + klen_pad], td,
                        preferred_element_type=jnp.float32)
            w = min(chunk, n_sym - b * chunk)
            for c in range(cyc):
                ys = y[:, c * chunk:c * chunk + w].astype(out_ref.dtype)
                if transposed:
                    out_ref[c, p, :, b * chunk:b * chunk + w] = ys
                else:
                    out_ref[:, c, p, b * chunk:b * chunk + w] = ys


def _kernel_decim_folded(pcm_ref, ph_ref, tail_ref, unrot_ref, tabd_ref,
                         tdre_ref, tdim_ref, out_ref, z_ref, *, n: int,
                         ntaps: int, cyc: int, n_sym: int, chunk: int,
                         zpad: int, klen_pad: int, inv_scale: float,
                         transposed: bool):
    """Mixer-FOLDED lane-aligned decimating front-end: ONE real z plane.

    The downmix commutes with the (real-tap) matched filter:

      y[t0] = sum_k w_k * (x[u] * phase * e^{jw(u+1)}),  u = t0 + k - halo
            = phase * e^{jw(t0+1)} * sum_k (w_k e^{jw(k-halo)}) x[t0+k-halo]

    so with COMPLEX taps c_k = w_k e^{jw(k-halo)} the matmul operand is
    the RAW real PCM -- one z plane instead of two (halves the z-store
    volume and the z scratch, the dominant cost of the front-end
    skeleton per the store_only probe, ROADMAP r3) -- and the mixer
    moves POST-decimation as a per-output rotation by
    rot[t0] = phase * e^{jw(t0+1)} (= phase * mixer_table[t0]), equal
    op count to the pre-mix it replaces.  Matmul count is unchanged:
    2 tap matrices (Re/Im of c_k) x 1 plane instead of 1 matrix x 2
    planes.

    The carried tail state stays in the public DOWNMIXED-plane layout
    (contract-stable with ``_kernel_decim_aligned``); the kernel
    un-rotates it back to raw samples (a [cb, halo] sliver):
    raw = Re[tail * conj(phase) * e^{-jw(m-halo+1)}].
    """
    halo = ntaps - 1
    nchunk = -(-n_sym // chunk)
    zdt = z_ref.dtype
    lead = zpad - halo

    x = pcm_ref[...].astype(jnp.float32) * inv_scale       # [CB, n]
    pr = ph_ref[:, 0:1, 0]
    pi = ph_ref[:, 1:2, 0]

    eur = unrot_ref[0, 0:1, :]     # [1, halo] cos(w(m-halo+1))
    eui = unrot_ref[0, 1:2, :]     # [1, halo] sin(w(m-halo+1))
    t_r = tail_ref[:, 0, :]
    t_i = tail_ref[:, 1, :]
    a_ = t_r * pr + t_i * pi       # Re / Im of tail * conj(phase)
    b_ = t_i * pr - t_r * pi
    raw_tail = a_ * eur + b_ * eui

    z_ref[:, :lead] = jnp.zeros_like(z_ref[:, :lead])
    z_ref[:, lead:zpad] = raw_tail.astype(zdt)
    z_ref[:, zpad:zpad + n] = x.astype(zdt)
    pad = z_ref.shape[-1] - (zpad + n)
    if pad:
        z_ref[:, zpad + n:] = jnp.zeros_like(z_ref[:, zpad + n:])

    tdre = tdre_ref[0]                             # [klen_pad, cyc*chunk]
    tdim = tdim_ref[0]
    acc_a = [[] for _ in range(cyc)]
    acc_b = [[] for _ in range(cyc)]
    for b in range(nchunk):
        start = b * cyc * chunk
        zs = z_ref[:, start:start + klen_pad]
        ar = jnp.dot(zs, tdre, preferred_element_type=jnp.float32)
        ai = jnp.dot(zs, tdim, preferred_element_type=jnp.float32)
        w = min(chunk, n_sym - b * chunk)
        for c in range(cyc):
            acc_a[c].append(ar[:, c * chunk:c * chunk + w])
            acc_b[c].append(ai[:, c * chunk:c * chunk + w])
    # Rotation as FAT per-phase ops (a per-(chunk, phase) formulation
    # = 120 narrow [cb, 128] ops was measurably slower than premix;
    # here it is 5 groups of [cb, n_sym] ops).
    for c in range(cyc):
        A = jnp.concatenate(acc_a[c], axis=-1)     # [cb, n_sym]
        B = jnp.concatenate(acc_b[c], axis=-1)
        ta = tabd_ref[0, c:c + 1, :]               # [1, n_sym]
        tb = tabd_ref[0, cyc + c:cyc + c + 1, :]
        mr = pr * ta - pi * tb                     # [cb, n_sym]
        mi = pr * tb + pi * ta
        yr = (mr * A - mi * B).astype(out_ref.dtype)
        yi = (mr * B + mi * A).astype(out_ref.dtype)
        if transposed:
            out_ref[c, 0, :, :] = yr
            out_ref[c, 1, :, :] = yi
        else:
            out_ref[:, c, 0, :] = yr
            out_ref[:, c, 1, :] = yi


@functools.lru_cache(maxsize=8)
def _decim_tap_matrix_folded(alpha: float, ntaps: int, gain: float,
                             cyc: int, chunk: int, zpad: int,
                             klen_pad: int, w_rad: float):
    """Complex-folded taps c_k = gain*taps[k]*e^{j w (k-halo)} in the
    aligned banded layout (``_decim_tap_matrix_aligned``); returns
    (T_re, T_im)."""
    taps = rrc_taps(alpha, ntaps) * gain
    k = np.arange(ntaps)
    ck = taps * np.exp(1j * w_rad * (k - (ntaps - 1)))
    lead = zpad - (ntaps - 1)
    tre = np.zeros((klen_pad, cyc * chunk), np.float32)
    tim = np.zeros((klen_pad, cyc * chunk), np.float32)
    for c in range(cyc):
        for j in range(chunk):
            r0 = lead + j * cyc + c
            tre[r0:r0 + ntaps, c * chunk + j] = ck.real.astype(np.float32)
            tim[r0:r0 + ntaps, c * chunk + j] = ck.imag.astype(np.float32)
    return tre, tim


@functools.lru_cache(maxsize=8)
def _fold_tables(center: float, fs: float, n: int, cyc: int, n_sym: int,
                 halo: int):
    """(rot table [1, 2*cyc, n_sym], tail un-rotation [1, 2, halo]) for
    the folded kernel.  rot row c / cyc+c = cos/sin of w(t0+1) at
    t0 = j*cyc + c (the mixer_table convention: index t -> e^{jw(t+1)});
    unrot row 0/1 = cos/sin of w(m-halo+1)."""
    w = -2.0 * np.pi * center / fs
    table = mixer_table(-center, fs, n)
    t0 = np.arange(n_sym)[None, :] * cyc + np.arange(cyc)[:, None]
    rot = table[t0]                                # [cyc, n_sym] c64
    tabd = np.concatenate([rot.real, rot.imag], axis=0).astype(
        np.float32).reshape(1, 2 * cyc, n_sym)
    m = np.arange(halo)
    eu = np.exp(1j * w * (m - halo + 1))
    unrot = np.stack([eu.real, eu.imag]).astype(np.float32).reshape(
        1, 2, halo)
    return tabd, unrot


@functools.lru_cache(maxsize=8)
def _decim_tap_matrix_aligned(alpha: float, ntaps: int, gain: float,
                              cyc: int, chunk: int, zpad: int,
                              klen_pad: int):
    """T[(zpad - ntaps + 1) + j*cyc + c + k, c*chunk + j] = gain*taps[k]."""
    taps = rrc_taps(alpha, ntaps) * gain
    lead = zpad - (ntaps - 1)
    t = np.zeros((klen_pad, cyc * chunk), np.float32)
    for c in range(cyc):
        for j in range(chunk):
            r0 = lead + j * cyc + c
            t[r0:r0 + ntaps, c * chunk + j] = taps
    return t


@functools.lru_cache(maxsize=8)
def _decim_tap_matrix(alpha: float, ntaps: int, gain: float, cyc: int,
                      chunk: int):
    """T[cyc*j + k, j] = gain * taps[k] (float32)."""
    taps = rrc_taps(alpha, ntaps) * gain
    klen = cyc * (chunk - 1) + ntaps
    t = np.zeros((klen, chunk), np.float32)
    for j in range(chunk):
        t[cyc * j:cyc * j + ntaps, j] = taps
    return t


def fused_frontend_decim(cfg: ModemConfig, pcm, phase_r, phase_i,
                         tail_r, tail_i, *, block_channels: int = 256,
                         chunk: int = 128, transposed: bool = False,
                         aligned: bool = True, debug_mode: str = "none",
                         mixer_fold: bool | None = None,
                         interpret: bool = False):
    """Fused front-end emitting decimated symbol planes.

    Same contract as ``fused_frontend`` but returns
    ``(decim, new_tail_r, new_tail_i, new_phase_r, new_phase_i)`` where
    ``decim`` is [C, cycles, 2, symbols_per_block] float32 -- the
    matched-filter output already split by decimation phase (axis 1)
    and real/imag plane (axis 2), i.e. the hunt-window layout.  With
    ``transposed=True`` the layout is [cycles, 2, C, symbols_per_block]
    instead (channel on the sublane axis): dense VMEM tiles for the
    fused hunt+decode kernel (ops/decode_pallas.fused_hunt_decode_decim) --
    the channel-major layout sublane-pads its (2, n_sym) tiles 4x.

    ``cfg.frontend_dtype`` selects the matmul input precision: "bf16"
    runs the MXU at full rate (quantization floor ~-45 dBc, far below
    any operating channel SNR); "f32" for bit-conservative parity runs.
    """
    n = cfg.frame_size
    ntaps = cfg.ntaps
    halo = ntaps - 1
    cyc = cfg.cycles
    n_sym = cfg.symbols_per_block
    C = pcm.shape[0]
    cb = min(block_channels, C)
    assert C % cb == 0, (C, cb)
    nchunk = -(-n_sym // chunk)
    zdt = jnp.bfloat16 if cfg.frontend_dtype == "bf16" else jnp.float32
    if aligned and (cyc * chunk) % 128 != 0:
        aligned = False                     # alignment trick unavailable
    if mixer_fold is None:
        mixer_fold = cfg.mixer_fold
    mixer_fold = (mixer_fold and aligned and debug_mode == "none")

    table = mixer_table(-cfg.center, cfg.fs, n)
    tab = jnp.asarray(
        np.stack([table.real, table.imag]).reshape(1, 2, n))
    phases = jnp.stack([phase_r, phase_i], axis=1)[..., None]  # [C,2,1]
    tails = jnp.stack([tail_r, tail_i], axis=1)                # [C,2,halo]

    # decim_dtype applies to the TRANSPOSED (fused hunt+decode) path
    # only; the plane-major layout feeds XLA consumers that expect f32.
    odt = (jnp.bfloat16 if (cfg.decim_dtype == "bf16" and transposed)
           else jnp.float32)
    if transposed:
        out_spec = pl.BlockSpec((cyc, 2, cb, n_sym),
                                lambda i: (0, 0, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((cyc, 2, C, n_sym), odt)
    else:
        out_spec = pl.BlockSpec((cb, cyc, 2, n_sym),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, cyc, 2, n_sym), jnp.float32)

    if mixer_fold:
        zpad = -(-halo // 128) * 128
        klen = zpad + cyc * chunk
        zlen = max(zpad + n, zpad + nchunk * cyc * chunk)
        tre_np, tim_np = _decim_tap_matrix_folded(
            cfg.alpha, cfg.ntaps, cfg.fir_gain, cyc, chunk, zpad, klen,
            -2.0 * np.pi * cfg.center / cfg.fs)
        tdre = jnp.asarray(tre_np.reshape(1, klen, cyc * chunk)
                           ).astype(zdt)
        tdim = jnp.asarray(tim_np.reshape(1, klen, cyc * chunk)
                           ).astype(zdt)
        tabd_np, unrot_np = _fold_tables(cfg.center, cfg.fs, n, cyc,
                                         n_sym, halo)
        kern = functools.partial(
            _kernel_decim_folded, n=n, ntaps=ntaps, cyc=cyc,
            n_sym=n_sym, chunk=chunk, zpad=zpad, klen_pad=klen,
            inv_scale=1.0 / cfg.tx_amplitude, transposed=transposed)
        decim = pl.pallas_call(
            kern,
            grid=(C // cb,),
            in_specs=[
                pl.BlockSpec((cb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cb, 2, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cb, 2, halo), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, halo), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * cyc, n_sym), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, klen, cyc * chunk),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, klen, cyc * chunk),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((cb, zlen), zdt)],
            # the fat per-phase rotation temporaries push past the
            # 16 MB default scoped limit at cb=128 (v5e has 128 MB)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(pcm, phases, tails, jnp.asarray(unrot_np),
          jnp.asarray(tabd_np), tdre, tdim)
        return _frontend_state_out(cfg, decim, pcm, table, phase_r,
                                   phase_i, n, halo)

    if aligned:
        zpad = -(-halo // 128) * 128
        klen = zpad + cyc * chunk           # 128-multiple by construction
        zlen = max(zpad + n, zpad + nchunk * cyc * chunk)
        td_np = _decim_tap_matrix_aligned(
            cfg.alpha, cfg.ntaps, cfg.fir_gain, cyc, chunk, zpad, klen)
        td = jnp.asarray(td_np.reshape(1, klen, cyc * chunk)).astype(zdt)
        kern = functools.partial(
            _kernel_decim_aligned, n=n, ntaps=ntaps, cyc=cyc,
            n_sym=n_sym, chunk=chunk, zpad=zpad, klen_pad=klen,
            inv_scale=1.0 / cfg.tx_amplitude, transposed=transposed,
            debug_mode=debug_mode)
        td_cols = cyc * chunk
    else:
        klen = cyc * (chunk - 1) + ntaps
        zlen = max(halo + n,
                   (nchunk - 1) * cyc * chunk + (cyc - 1) + klen)
        td_np = _decim_tap_matrix(cfg.alpha, cfg.ntaps, cfg.fir_gain,
                                  cyc, chunk)
        td = jnp.asarray(td_np.reshape(1, klen, chunk)).astype(zdt)
        kern = functools.partial(
            _kernel_decim, n=n, ntaps=ntaps, cyc=cyc, n_sym=n_sym,
            chunk=chunk, inv_scale=1.0 / cfg.tx_amplitude,
            transposed=transposed)
        td_cols = chunk

    decim = pl.pallas_call(
        kern,
        grid=(C // cb,),
        in_specs=[
            pl.BlockSpec((cb, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 2, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 2, halo), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, klen, td_cols), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((cb, zlen), zdt),
            pltpu.VMEM((cb, zlen), zdt),
        ],
        interpret=interpret,
    )(pcm, phases, tails, tab, td)

    return _frontend_state_out(cfg, decim, pcm, table, phase_r,
                               phase_i, n, halo)


def _frontend_state_out(cfg, decim, pcm, table, phase_r, phase_i, n,
                        halo):
    """New FIR tail + phase advance (identical to fused_frontend)."""
    x_t = pcm[:, n - halo:].astype(jnp.float32) / cfg.tx_amplitude
    tr_t = jnp.asarray(table.real[n - halo:])
    ti_t = jnp.asarray(table.imag[n - halo:])
    ntail_r = x_t * (phase_r[:, None] * tr_t - phase_i[:, None] * ti_t)
    ntail_i = x_t * (phase_r[:, None] * ti_t + phase_i[:, None] * tr_t)

    adv = table[n - 1]
    npr = phase_r * np.float32(adv.real) - phase_i * np.float32(adv.imag)
    npi = phase_r * np.float32(adv.imag) + phase_i * np.float32(adv.real)
    mag = jnp.sqrt(npr * npr + npi * npi)
    return decim, ntail_r, ntail_i, npr / mag, npi / mag


def frontend_reference(cfg: ModemConfig, pcm, phase, tail):
    """XLA oracle: mixer + FIR (dsp/mixer.py, dsp/fir.py)."""
    x = pcm.astype(jnp.float32) / cfg.tx_amplitude
    raw, new_phase = mix_block(x, phase, -cfg.center, cfg.fs)
    taps = rrc_taps(cfg.alpha, cfg.ntaps)
    filt, new_tail = fir_block(taps, cfg.fir_gain, tail, raw)
    return filt, new_tail, new_phase
