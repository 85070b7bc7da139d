"""ONE-kernel RX: int16 PCM -> payload dibits, fully fused.

Fuses the ENTIRE per-block receive pipeline (reference:
src/qpsk.c:133-239 -- downmix, RRC matched filter, decimation,
preamble hunt, packet extraction, CFO search, LS equalization, decode,
descramble) into a single Pallas kernel, one VMEM residency per
(channel-block, time-block) grid step:

  * front-end: the lane-aligned decimating matmul
    (ops/frontend_pallas._kernel_decim_aligned math; optionally the
    mixer-FOLDED complex-tap variant, cfg.mixer_fold -- measured
    SLOWER standalone, kept for A/B);
  * hunt + extract + decode: ops/decode_pallas._hunt_decode_core,
    verbatim.

vs the two-kernel pipeline (fused_frontend_decim +
fused_hunt_decode_decim) this removes the decimated-plane HBM round
trip entirely: the decim planes were written once and read twice per
block (~7.5 KB/block-channel at bf16, the single largest HBM stream
after the PCM itself), and with them goes the [cyc, 2, N, n_sym]
HBM footprint that capped the batch at 524k block-channels/dispatch
(SCALING.md) -- the fused kernel's HBM residency is just PCM in
(3.76 KB/blk-ch) + stats out (~1 KB/blk-ch) + a C-sized state carry.

Grid and state plumbing (TPU Pallas grids execute SEQUENTIALLY on a
core, so VMEM persists across steps):

  * grid = (C/cb, B), time-block b innermost: for a fixed channel
    block the kernel walks the stream in order;
  * the hunt window needs the PREVIOUS block's decimated symbols: the
    [cyc, 2, C, n_sym] state OUTPUT doubles as the ring buffer -- its
    block index map ignores b, so the block stays VMEM-resident across
    the b-walk (read = previous step's cur = prev; then overwritten
    with this step's cur) and Mosaic flushes it to HBM once per
    channel block, leaving exactly the b = B-1 planes = the stream
    state for the next dispatch;
  * the FIR tail rides the z scratch the same way (the previous
    step's last ntaps-1 downmixed samples are still there, and the
    closed-form phase recursion makes them exactly the halo the next
    block needs -- rx_production.prod_rx_batch docstring);
  * at b == 0 both rings are seeded from carried-state operands
    (dprev0 planes, downmixed tail planes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModemConfig
from ..constants import PREAMBLE_VALUES, scramble_dibit_mask
from ..dsp.mixer import downmix_tail, mixer_table
from .decode_pallas import (_dft_operands, _energy_band_lagtile,
                            _energy_band_smaj, _hunt_decode_core,
                            _pnb_operand, _probe_out,
                            _segment_band_matrix_lagtile,
                            _segment_band_matrix_smaj)
from .frontend_pallas import (_decim_tap_matrix_aligned,
                              _decim_tap_matrix_folded, _fold_tables)


def _decode_from_cur(cur, first, dprev0_ref, dlast_ref, mat_ref,
                     eband_ref, wr_ref, wi_ref, pn_ref, pnb_ref,
                     mask_ref, out_ref, qring_ref, *, cyc, wp, off,
                     n_sym, stage, use_qring=False, **kw):
    """Shared tail: cur decim values -> ring update -> hunt+decode.

    ``qring_ref`` (int8 scratch [cyc, 2, cb, n_sym] or None): the
    QUANTIZED decim ring for the int8 hunt -- each block's planes are
    quantized once as cur and reused from the ring as the next
    block's prev (the identical integers; a plain window re-quantizes
    every column twice across consecutive steps).  Seeded from dprev0
    at b == 0 under pl.when.
    """
    ddt = dlast_ref.dtype
    cb = cur[0][0].shape[0]
    if stage == "fe":
        return _probe_out(out_ref, kw["D"],
                          *[cur[c][p] for c in range(cyc)
                            for p in range(2)])
    f32 = jnp.float32
    scale = kw["hunt_scale"]

    def _q(v):
        return jnp.clip(jnp.round(v.astype(f32) * scale),
                        -127.0, 127.0).astype(jnp.int8)

    qwins = None
    if use_qring:
        @pl.when(first)
        def _seed():
            for c in range(cyc):
                for p_ in range(2):
                    qring_ref[c, p_] = _q(dprev0_ref[c, p_])
        lag_tiles = kw["lag_tiles"]
        xw = ((lag_tiles - 1) * 128 + kw["lag_kwin"]) if lag_tiles             else kw["klen"]
        zoq = jnp.zeros((cb, off), jnp.int8)
        qwins = []
        for c in range(cyc):
            rowq = []
            for p_ in range(2):
                cq = _q(cur[c][p_])
                rowq.append(jnp.concatenate(
                    [zoq, qring_ref[c, p_],
                     cq[:, :xw - off - n_sym]], axis=-1))
                qring_ref[c, p_] = cq
            qwins.append(rowq)

    zoff = jnp.zeros((cb, off), ddt)
    zright = jnp.zeros((cb, wp - off - 2 * n_sym), ddt)
    wins = []
    for c in range(cyc):
        row = []
        for p_ in range(2):
            prev = jnp.where(first, dprev0_ref[c, p_], dlast_ref[c, p_])
            row.append(jnp.concatenate(
                [zoff, prev, cur[c][p_], zright], axis=-1))
        wins.append(row)
    # ring update AFTER the reads above
    for c in range(cyc):
        for p_ in range(2):
            dlast_ref[c, p_] = cur[c][p_]

    _hunt_decode_core(wins, mat_ref, eband_ref, wr_ref, wi_ref,
                      pn_ref, pnb_ref, mask_ref, out_ref, cyc=cyc,
                      wp=wp, off=off, stage=stage, qwins=qwins, **kw)


def _phase_tail(ptail_ref, advs_ref, halo):
    """Per-step mixer phase + carried-tail seed from the PACKED
    state operand.

    ``ptail``: [cb, 2, 8 + halo] -- lane 0 carries the block-0 phase
    plane, lanes 8.. the downmixed tail planes.  A separate [N, 2, 1]
    phases operand lane-pads 1 -> 128 (a 2 GB HBM stream + copy at the
    2M-block-channel point); here the phase rides an operand that
    already exists and the per-block advance adv^b comes from two SMEM
    scalars: pr = p0r*adv_r - p0i*adv_i.
    """
    b = pl.program_id(1)
    ar_s = advs_ref[0, b]
    ai_s = advs_ref[1, b]
    p0r = ptail_ref[:, 0, 0:1]                             # [cb, 1]
    p0i = ptail_ref[:, 1, 0:1]
    pr = p0r * ar_s - p0i * ai_s
    pi = p0r * ai_s + p0i * ar_s
    return pr, pi


def _fused_rx_kernel_premix(pcm_ref, ptail_ref, advs_ref, dprev0_ref,
                            tab_ref, td_ref, mat_ref, eband_ref,
                            wr_ref, wi_ref,
                            pn_ref, pnb_ref, mask_ref, out_ref,
                            dlast_ref,
                            zr_ref, zi_ref, qring_ref, *, n, ntaps,
                            cyc, n_sym,
                            chunk, zpad, fe_klen, inv_scale, wp, off,
                            stage="full", **kw):
    """Front-end = aligned decimating matmul on two downmixed planes
    (frontend_pallas._kernel_decim_aligned math, value-emitting)."""
    halo = ntaps - 1
    nchunk = -(-n_sym // chunk)
    zdt = zr_ref.dtype
    ddt = dlast_ref.dtype
    lead = zpad - halo
    first = pl.program_id(1) == 0

    x = pcm_ref[...].astype(jnp.float32) * inv_scale       # [cb, n]
    pr, pi = _phase_tail(ptail_ref, advs_ref, halo)
    tr = tab_ref[0, 0:1, :]
    ti = tab_ref[0, 1:2, :]

    # downmixed tail: ring (previous block's z, which the closed-form
    # phase recursion makes exactly this block's halo) or carried state
    for p_, z_ref in enumerate((zr_ref, zi_ref)):
        seed = ptail_ref[:, p_, 8:8 + halo].astype(zdt)
        ring = z_ref[:, zpad + n - halo:zpad + n]
        z_ref[:, :lead] = jnp.zeros_like(z_ref[:, :lead])
        z_ref[:, lead:zpad] = jnp.where(first, seed, ring)
        if p_ == 0:
            z_ref[:, zpad:zpad + n] = (x * (pr * tr - pi * ti)
                                       ).astype(zdt)
        else:
            z_ref[:, zpad:zpad + n] = (x * (pr * ti + pi * tr)
                                       ).astype(zdt)
        pad = z_ref.shape[-1] - (zpad + n)
        if pad:
            z_ref[:, zpad + n:] = jnp.zeros_like(z_ref[:, zpad + n:])

    td = td_ref[0]                                 # [fe_klen, cyc*chunk]
    cur = [[None, None] for _ in range(cyc)]
    acc = [[[], []] for _ in range(cyc)]
    for b in range(nchunk):
        start = b * cyc * chunk
        w = min(chunk, n_sym - b * chunk)
        for p_, z_ref in enumerate((zr_ref, zi_ref)):
            y = jnp.dot(z_ref[:, start:start + fe_klen], td,
                        preferred_element_type=jnp.float32)
            for c in range(cyc):
                acc[c][p_].append(
                    y[:, c * chunk:c * chunk + w].astype(ddt))
    for c in range(cyc):
        for p_ in range(2):
            cur[c][p_] = jnp.concatenate(acc[c][p_], axis=-1)

    _decode_from_cur(cur, first, dprev0_ref, dlast_ref, mat_ref,
                     eband_ref, wr_ref, wi_ref, pn_ref, pnb_ref,
                     mask_ref, out_ref, qring_ref, cyc=cyc, wp=wp,
                     off=off, n_sym=n_sym, stage=stage, **kw)


def _fused_rx_kernel_folded(pcm_ref, ptail_ref, advs_ref, dprev0_ref,
                            unrot_ref, tabd_ref, tdre_ref, tdim_ref,
                            mat_ref, eband_ref, wr_ref, wi_ref,
                            pn_ref, pnb_ref,
                            mask_ref, out_ref, dlast_ref, z_ref,
                            qring_ref, *, n, ntaps,
                            cyc, n_sym, chunk, zpad, fe_klen,
                            inv_scale, wp, off, stage="full", **kw):
    """Front-end = mixer-folded complex-tap matmul on ONE raw plane
    (frontend_pallas._kernel_decim_folded math, value-emitting)."""
    halo = ntaps - 1
    nchunk = -(-n_sym // chunk)
    zdt = z_ref.dtype
    ddt = dlast_ref.dtype
    lead = zpad - halo
    first = pl.program_id(1) == 0

    x = pcm_ref[...].astype(jnp.float32) * inv_scale       # [cb, n]
    pr, pi = _phase_tail(ptail_ref, advs_ref, halo)

    # raw tail: ring, or the carried downmixed planes un-rotated
    eur = unrot_ref[0, 0:1, :]
    eui = unrot_ref[0, 1:2, :]
    t_r = ptail_ref[:, 0, 8:8 + halo]
    t_i = ptail_ref[:, 1, 8:8 + halo]
    a_ = t_r * pr + t_i * pi
    b_ = t_i * pr - t_r * pi
    tail_seed = (a_ * eur + b_ * eui).astype(zdt)
    tail_ring = z_ref[:, zpad + n - halo:zpad + n]
    z_ref[:, :lead] = jnp.zeros_like(z_ref[:, :lead])
    z_ref[:, lead:zpad] = jnp.where(first, tail_seed, tail_ring)
    z_ref[:, zpad:zpad + n] = x.astype(zdt)
    pad = z_ref.shape[-1] - (zpad + n)
    if pad:
        z_ref[:, zpad + n:] = jnp.zeros_like(z_ref[:, zpad + n:])

    tdre = tdre_ref[0]                             # [fe_klen, cyc*chunk]
    tdim = tdim_ref[0]
    acc_a = [[] for _ in range(cyc)]
    acc_b = [[] for _ in range(cyc)]
    for b in range(nchunk):
        start = b * cyc * chunk
        zs = z_ref[:, start:start + fe_klen]
        ar = jnp.dot(zs, tdre, preferred_element_type=jnp.float32)
        ai = jnp.dot(zs, tdim, preferred_element_type=jnp.float32)
        w = min(chunk, n_sym - b * chunk)
        for c in range(cyc):
            acc_a[c].append(ar[:, c * chunk:c * chunk + w])
            acc_b[c].append(ai[:, c * chunk:c * chunk + w])
    cur = [[None, None] for _ in range(cyc)]
    for c in range(cyc):
        A = jnp.concatenate(acc_a[c], axis=-1)     # [cb, n_sym]
        B = jnp.concatenate(acc_b[c], axis=-1)
        ta = tabd_ref[0, c:c + 1, :]               # [1, n_sym]
        tb = tabd_ref[0, cyc + c:cyc + c + 1, :]
        mr = pr * ta - pi * tb
        mi = pr * tb + pi * ta
        cur[c][0] = (mr * A - mi * B).astype(ddt)
        cur[c][1] = (mr * B + mi * A).astype(ddt)

    _decode_from_cur(cur, first, dprev0_ref, dlast_ref, mat_ref,
                     eband_ref, wr_ref, wi_ref, pn_ref, pnb_ref,
                     mask_ref, out_ref, qring_ref, cyc=cyc, wp=wp,
                     off=off, n_sym=n_sym, stage=stage, **kw)


def fused_rx_schedule(cfg: ModemConfig) -> dict:
    """The geometry-dependent schedule decisions of ``fused_rx_block``.

    The kernel has two silent fallback chains keyed off the numerology
    (tests/test_alt_numerology.py pins both against the XLA oracle):

      * hunt scheme: "lagtile" needs every 128-lag tile's K=384 window
        slice to exist inside the padded window (``lag_ok``); falls
        back to the segment-major "chunk" matmul otherwise;
      * int8 quantized decim ring: only usable when the hunt window's
        x-slice [zoff | prev | cur-prefix] fits inside the two decim
        blocks (``use_qring``); otherwise int8 hunts re-quantize the
        concatenated window per step.

    Shared with ``fused_rx_block`` so the decision logic cannot drift
    from what tests introspect.
    """
    P = cfg.preamble_length
    off = cfg.eq_length // 2
    n_sym = cfg.symbols_per_block
    n_lags = n_sym
    n_lags_pad = -(-n_lags // 128) * 128
    klen = -(-(off + n_lags + P - 1) // 128) * 128
    need = (n_lags - 1) + cfg.pkt_window
    wp = -(-max(need, off + 2 * n_sym, klen) // 128) * 128
    lag_kwin = 384
    lag_ok = (cfg.hunt_scheme == "lagtile"
              and off + 127 + P - 1 < lag_kwin
              and n_lags_pad % 128 == 0
              and wp >= (n_lags_pad // 128 - 1) * 128 + lag_kwin)
    xw_need = ((n_lags_pad // 128 - 1) * 128 + lag_kwin) if lag_ok \
        else klen
    use_qring = (cfg.hunt_dtype == "int8"
                 and off + 2 * n_sym >= xw_need)
    return {
        "lag_ok": lag_ok,
        "lag_tiles": n_lags_pad // 128 if lag_ok else 0,
        "lag_kwin": lag_kwin,
        "use_qring": use_qring,
        "wp": wp,
        "klen": klen,
        "n_lags_pad": n_lags_pad,
    }


def fused_rx_block(cfg: ModemConfig, pcm_frames, p0r, p0i, tail0_r,
                   tail0_i, dprev0_t, *, descramble: bool = True,
                   block_channels: int = 64,
                   segs_per_chunk: int = 2, chunk: int = 128,
                   stage: str = "full", interpret: bool = False):
    """Run the one-kernel RX over [B, C, frame_size] int16 frames.

    Args:
      p0r/p0i:         [C] mixer phasor planes entering block 0.
      tail0_r/tail0_i: [C, ntaps-1] DOWNMIXED FIR halo planes (public
                       state layout).
      dprev0_t:        [cyc, 2, C, n_sym] carried decim planes
                       (cfg.decim_dtype).

    Returns ``(dec, dlast, (fin_pr, fin_pi, fin_tr, fin_ti))``: the
    fused_hunt_decode_decim stat dict with [B*C] leaves, the
    [cyc, 2, C, n_sym] stream state leaving block B-1, and the
    closed-form final phase/tail planes.
    """
    P = cfg.preamble_length
    D = cfg.frame_symbols
    L = cfg.eq_length
    off = L // 2
    nfft = cfg.cfo_nfft
    pkt_len = cfg.pkt_window
    n = cfg.frame_size
    ntaps = cfg.ntaps
    halo = ntaps - 1
    cyc = cfg.cycles
    n_sym = cfg.symbols_per_block
    n_lags = n_sym
    n_seg = cfg.corr_segments
    n_lags_pad = -(-n_lags // 128) * 128
    B, C = pcm_frames.shape[0], pcm_frames.shape[1]
    N = B * C
    cb = min(block_channels, C)
    if C % cb:
        raise ValueError(
            f"channels ({C}) must be divisible by the decode channel "
            f"block ({cb}); pass decode_block_channels=None to "
            f"auto-pick a divisor (rx_production._auto_cb)")
    assert (cyc * chunk) % 128 == 0, (cyc, chunk)
    klen = -(-(off + n_lags + P - 1) // 128) * 128
    need = (n_lags - 1) + pkt_len
    wp = -(-max(need, off + 2 * n_sym, klen) // 128) * 128
    segs_per_chunk = min(segs_per_chunk, n_seg)
    assert n_seg % segs_per_chunk == 0
    n_chunks = n_seg // segs_per_chunk
    n_out = -(-(D + 8) // 128) * 128
    ddt = jnp.bfloat16 if cfg.decim_dtype == "bf16" else jnp.float32
    zdt = jnp.bfloat16 if cfg.frontend_dtype == "bf16" else jnp.float32
    inv_scale = 1.0 / cfg.tx_amplitude

    # ---- front-end constants ----
    zpad = -(-halo // 128) * 128
    fe_klen = zpad + cyc * chunk
    nchunk = -(-n_sym // chunk)
    zlen = max(zpad + n, zpad + nchunk * cyc * chunk)

    # ---- hunt constants (decode_pallas conventions) ----
    mdt = {"bf16": jnp.bfloat16, "f32": jnp.float32,
           "int8": jnp.int8}[cfg.hunt_dtype]
    sched = fused_rx_schedule(cfg)
    assert sched["wp"] == wp and sched["klen"] == klen
    lag_kwin = sched["lag_kwin"]
    lag_ok = sched["lag_ok"]
    lag_tiles = sched["lag_tiles"]
    if lag_ok:
        mat_np = _segment_band_matrix_lagtile(n_lags, n_seg, P, off,
                                              tile=128, kwin=lag_kwin)
        mat = jnp.asarray(mat_np, dtype=mdt)
        eband = jnp.asarray(_energy_band_lagtile(
            n_lags, P, off, tile=128, kwin=lag_kwin))
    else:
        csz = segs_per_chunk * n_lags_pad
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

    # ---- phase + tail state, PACKED (ops/fused_rx._phase_tail) ----
    w_ = -2.0 * np.pi * cfg.center / cfg.fs
    advs = np.exp(1j * w_ * n * np.arange(B + 1)).astype(np.complex64)
    advsj = jnp.asarray(
        np.stack([advs.real[:B], advs.imag[:B]]))          # [2, B]
    ptail = jnp.concatenate([
        jnp.stack([p0r, p0i], axis=1)[..., None],          # [C, 2, 1]
        jnp.zeros((C, 2, 7), jnp.float32),
        jnp.stack([tail0_r, tail0_i], axis=1),             # [C, 2, halo]
    ], axis=-1)                                            # [C, 2, 8+halo]

    pnbj, bvec = _pnb_operand(cfg)
    # int8 quantized decim ring: only when the hunt is int8 and the
    # hunt window's x-slice fits [zoff | prev | cur-prefix]
    # (fused_rx_schedule)
    use_qring = sched["use_qring"]
    cshift = C // cb
    common_kw = dict(
        n=n, ntaps=ntaps, cyc=cyc, n_sym=n_sym, chunk=chunk, zpad=zpad,
        fe_klen=fe_klen, inv_scale=inv_scale, wp=wp, off=off,
        stage=stage, pkt_len=pkt_len, n_lags=n_lags,
        n_lags_pad=n_lags_pad, segs_per_chunk=segs_per_chunk,
        n_chunks=n_chunks, klen=klen, P=P, D=D, L=L, nfft=nfft,
        rs=cfg.rs, peak_gate=cfg.effective_peak_gate, ls_reg=cfg.ls_reg,
        ls_offtap=cfg.ls_offtap_reg,
        ls_offtap_refit=cfg.ls_offtap_reg_refit,
        refit_iters=cfg.ls_refit_iters,
        refit_sym=cfg.ls_refit_symbols,
        refine_iters=cfg.phase_refine_iters, hunt_mode=cfg.hunt_dtype,
        hunt_scale=cfg.hunt_int8_scale, gram=cfg.ls_gram, bvec=bvec,
        cfo_dtype=cfg.cfo_dtype,
        lag_tiles=lag_tiles, lag_kwin=lag_kwin, use_qring=use_qring,
        hunt_norm=cfg.hunt_norm)

    fixed_specs = [
        pl.BlockSpec(mat.shape, lambda i, b: (0,) * mat.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(eband.shape, lambda i, b: (0,) * eband.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, nfft), lambda i, b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, nfft), lambda i, b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P), lambda i, b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(pnbj.shape, lambda i, b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), lambda i, b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    lead_specs = [
        pl.BlockSpec((cb, n), _mk_nidx(cshift),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cb, 2, 8 + halo), lambda i, b: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((cyc, 2, cb, n_sym), lambda i, b: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    lead_args = [pcm_frames.reshape(N, n), ptail, advsj,
                 dprev0_t.astype(ddt)]

    if cfg.mixer_fold:
        tre_np, tim_np = _decim_tap_matrix_folded(
            cfg.alpha, cfg.ntaps, cfg.fir_gain, cyc, chunk, zpad,
            fe_klen, w_)
        tabd_np, unrot_np = _fold_tables(cfg.center, cfg.fs, n, cyc,
                                         n_sym, halo)
        kern = functools.partial(_fused_rx_kernel_folded, **common_kw)
        fe_specs = [
            pl.BlockSpec((1, 2, halo), lambda i, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * cyc, n_sym), lambda i, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fe_klen, cyc * chunk),
                         lambda i, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fe_klen, cyc * chunk),
                         lambda i, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        fe_args = [
            jnp.asarray(unrot_np), jnp.asarray(tabd_np),
            jnp.asarray(tre_np.reshape(1, fe_klen, cyc * chunk)
                        ).astype(zdt),
            jnp.asarray(tim_np.reshape(1, fe_klen, cyc * chunk)
                        ).astype(zdt),
        ]
        scratch = [pltpu.VMEM((cb, zlen), zdt),
                   pltpu.VMEM((cyc, 2, cb, n_sym), jnp.int8)]
    else:
        table = mixer_table(-cfg.center, cfg.fs, n)
        tab = jnp.asarray(
            np.stack([table.real, table.imag]).reshape(1, 2, n))
        td_np = _decim_tap_matrix_aligned(
            cfg.alpha, cfg.ntaps, cfg.fir_gain, cyc, chunk, zpad,
            fe_klen)
        kern = functools.partial(_fused_rx_kernel_premix, **common_kw)
        fe_specs = [
            pl.BlockSpec((1, 2, n), lambda i, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fe_klen, cyc * chunk),
                         lambda i, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        fe_args = [tab, jnp.asarray(
            td_np.reshape(1, fe_klen, cyc * chunk)).astype(zdt)]
        scratch = [pltpu.VMEM((cb, zlen), zdt),
                   pltpu.VMEM((cb, zlen), zdt),
                   pltpu.VMEM((cyc, 2, cb, n_sym), jnp.int8)]

    out, dlast = pl.pallas_call(
        kern,
        grid=(cshift, B),
        in_specs=lead_specs + fe_specs + fixed_specs,
        out_specs=[
            pl.BlockSpec((cb, n_out), _mk_nidx(cshift),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cyc, 2, cb, n_sym), lambda i, b: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, n_out), jnp.float32),
            jax.ShapeDtypeStruct((cyc, 2, C, n_sym), ddt),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*lead_args, *fe_args, mat, eband, wr, wi, pn, pnbj, maskj)

    dec = {
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

    # ---- closed-form final phase + tail (XLA glue, O(C)) ----
    fr = p0r * np.float32(advs.real[B]) - p0i * np.float32(advs.imag[B])
    fi = p0r * np.float32(advs.imag[B]) + p0i * np.float32(advs.real[B])
    mag = jnp.sqrt(fr * fr + fi * fi)
    x_t = pcm_frames[-1, :, n - halo:].astype(jnp.float32) * inv_scale
    lr = (p0r * np.float32(advs.real[B - 1])
          - p0i * np.float32(advs.imag[B - 1]))[:, None]
    li = (p0r * np.float32(advs.imag[B - 1])
          + p0i * np.float32(advs.real[B - 1]))[:, None]
    fin_tr, fin_ti = downmix_tail(cfg.center, cfg.fs, n, halo,
                                  x_t, lr, li)
    return dec, dlast, (fr / mag, fi / mag, fin_tr, fin_ti)


def _mk_nidx(cshift):
    return lambda i, b: (b * cshift + i, 0)


def _mk_nidx3(cshift):
    return lambda i, b: (b * cshift + i, 0, 0)
