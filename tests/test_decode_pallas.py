"""Fused decode kernel vs the XLA backend (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.modem import prod_rx_init, tx_stream
from singlecarrier_tpu.modem.rx_production import (
    _extract_packet,
    _hunt,
    prod_rx_stream,
)
from singlecarrier_tpu.ops.decode_pallas import fused_decode
from singlecarrier_tpu.ops.frontend_pallas import frontend_reference
from singlecarrier_tpu.dsp.fir import fir_init_state
from singlecarrier_tpu.dsp.mixer import mixer_init_phase


def _extract_pkts(pcm_frames):
    """Replicate the pipeline up to packet extraction for each frame."""
    n_sym = CFG.symbols_per_block
    off = CFG.eq_length // 2
    pkt_len = CFG.pkt_window
    phase = mixer_init_phase()
    tail = fir_init_state(49)
    decim_prev = jnp.zeros((CFG.cycles, n_sym), jnp.complex64)
    pkts, peaks, lags = [], [], []
    for pcm in pcm_frames:
        filt, tail, phase = frontend_reference(CFG, pcm, phase, tail)
        decim_cur = filt.reshape(n_sym, CFG.cycles).T
        windows = jnp.concatenate([decim_prev, decim_cur], axis=-1)
        lag, pidx, peak, frac = _hunt(CFG, windows)
        pkt = _extract_packet(CFG, windows, lag, pidx, frac)
        pkts.append(np.asarray(pkt))
        peaks.append(float(peak))
        lags.append(int(lag))
        decim_prev = decim_cur
    return np.stack(pkts), np.asarray(peaks, np.float32), lags


def test_fused_decode_matches_xla_backend():
    rng = np.random.default_rng(41)
    bits = rng.integers(0, 2, (3, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), flush_gap=True))
    n = -(-len(pcm) // CFG.frame_size) + 1
    buf = np.zeros(n * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    frames = jnp.asarray(buf.reshape(n, CFG.frame_size))

    # XLA reference pipeline
    _, ref = prod_rx_stream(CFG, prod_rx_init(CFG), frames,
                            descramble=False)
    ref = jax.tree.map(np.asarray, ref)

    # kernel on the extracted packets
    pkts, peaks, lags = _extract_pkts(frames)
    out = fused_decode(CFG, jnp.asarray(pkts.real),
                       jnp.asarray(pkts.imag), jnp.asarray(peaks),
                       descramble=False, block_channels=pkts.shape[0],
                       interpret=True)
    out = jax.tree.map(np.asarray, out)

    valid_k = out["gated"] & (out["matches"] > CFG.match_threshold)
    assert np.array_equal(valid_k, ref.valid)

    # payload equality on detected frames
    ref_dib = (ref.bits[:, 1::2].astype(np.uint8) << 1) | ref.bits[:, 0::2]
    for fr in np.nonzero(ref.valid)[0]:
        got = out["dibits"][fr].astype(np.uint8)
        assert np.array_equal(got, ref_dib[fr]), f"frame {fr}"
        assert abs(out["cfo_hz"][fr] - ref.cfo_hz[fr]) < 0.5
        assert out["matches"][fr] == ref.matches[fr]


def test_sliding_gram_matches_direct():
    """cfg.ls_gram="sliding" (lag products + prefix-corrected partial
    sums) is the SAME Gram up to fp reassociation: coefficient planes
    agree to ~1e-5 relative and all decode decisions are identical."""
    from singlecarrier_tpu.ops.decode_pallas import _fit

    rng = np.random.default_rng(7)
    L, count, cb = CFG.eq_length, 128, 8
    pr = jnp.asarray(rng.normal(size=(cb, count + L - 1)), jnp.float32)
    pi = jnp.asarray(rng.normal(size=(cb, count + L - 1)), jnp.float32)
    tr = jnp.asarray(np.sign(rng.normal(size=(1, count))), jnp.float32)
    cd = _fit(pr, pi, tr, None, L, 1e-4, count, gram="direct")
    cs = _fit(pr, pi, tr, None, L, 1e-4, count, gram="sliding")
    for a, b in zip(cd[0] + cd[1], cs[0] + cs[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)

    # end-to-end: decisions identical through the fused kernel
    bits = rng.integers(0, 2, (2, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), flush_gap=True))
    n = -(-len(pcm) // CFG.frame_size) + 1
    buf = np.zeros(n * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    frames = jnp.asarray(buf.reshape(n, CFG.frame_size))
    pkts, peaks, lags = _extract_pkts(frames)
    outs = {}
    for g in ("direct", "sliding"):
        cfg = CFG.replace(ls_gram=g)
        o = fused_decode(cfg, jnp.asarray(pkts.real),
                         jnp.asarray(pkts.imag), jnp.asarray(peaks),
                         descramble=False,
                         block_channels=pkts.shape[0], interpret=True)
        outs[g] = jax.tree.map(np.asarray, o)
    assert np.array_equal(outs["direct"]["gated"],
                          outs["sliding"]["gated"])
    assert np.array_equal(outs["direct"]["matches"],
                          outs["sliding"]["matches"])
    v = outs["direct"]["gated"] & (
        outs["direct"]["matches"] > CFG.match_threshold)
    assert np.array_equal(outs["direct"]["dibits"][v],
                          outs["sliding"]["dibits"][v])


def test_bvec_matmul_matches_reduce():
    """cfg.ls_bvec="matmul" (train b-vector via the banded PN MXU
    matmul) sums the same products as the reduce chains: coefficients
    agree to reassociation level and decode decisions are identical."""
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, (2, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), flush_gap=True))
    n = -(-len(pcm) // CFG.frame_size) + 1
    buf = np.zeros(n * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    frames = jnp.asarray(buf.reshape(n, CFG.frame_size))
    pkts, peaks, lags = _extract_pkts(frames)
    outs = {}
    for bv in ("reduce", "matmul"):
        cfg = CFG.replace(ls_bvec=bv)
        o = fused_decode(cfg, jnp.asarray(pkts.real),
                         jnp.asarray(pkts.imag), jnp.asarray(peaks),
                         descramble=False,
                         block_channels=pkts.shape[0], interpret=True)
        outs[bv] = jax.tree.map(np.asarray, o)
    assert np.array_equal(outs["reduce"]["gated"],
                          outs["matmul"]["gated"])
    assert np.array_equal(outs["reduce"]["matches"],
                          outs["matmul"]["matches"])
    v = outs["reduce"]["gated"] & (
        outs["reduce"]["matches"] > CFG.match_threshold)
    assert v.any()
    assert np.array_equal(outs["reduce"]["dibits"][v],
                          outs["matmul"]["dibits"][v])
    np.testing.assert_allclose(outs["matmul"]["eq_error"][v],
                               outs["reduce"]["eq_error"][v],
                               rtol=1e-3, atol=1e-5)


def test_fused_decode_descramble():
    rng = np.random.default_rng(42)
    bits = rng.integers(0, 2, (2, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    from singlecarrier_tpu.scramble import scramble_dibits
    dibits = (bits[..., 1::2] << 1) | bits[..., 0::2]
    flat = dibits.reshape(2, -1)
    scr = np.stack([np.asarray(scramble_dibits(jnp.asarray(r), 0)[0])
                    for r in flat])
    sb = np.stack([scr & 1, scr >> 1], axis=-1)
    tx_bits = sb.reshape(2, CFG.ns, CFG.data_symbols * 2)

    pcm = np.asarray(tx_stream(CFG, jnp.asarray(tx_bits),
                               flush_gap=True))
    n = -(-len(pcm) // CFG.frame_size) + 1
    buf = np.zeros(n * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    frames = jnp.asarray(buf.reshape(n, CFG.frame_size))

    pkts, peaks, lags = _extract_pkts(frames)
    out = fused_decode(CFG, jnp.asarray(pkts.real),
                       jnp.asarray(pkts.imag), jnp.asarray(peaks),
                       descramble=True, block_channels=pkts.shape[0],
                       interpret=True)
    out = jax.tree.map(np.asarray, out)
    valid = out["gated"] & (out["matches"] > CFG.match_threshold)
    got = out["dibits"][valid].astype(np.uint8)
    want = dibits.reshape(2, -1)
    assert np.array_equal(got, want)


def test_cfo_bf16_decisions_match_f32():
    """cfg.cfo_dtype="bf16" runs the CFO-search DFT matmuls in bf16
    (full MXU rate, half the operand).  The peak bin and parabolic
    delta are robust to the precision drop: all decode decisions and
    payloads must match f32, and the CFO estimate must stay within a
    fraction of a bin (rs/nfft = 9.4 Hz)."""
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, (2, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), flush_gap=True))
    n = -(-len(pcm) // CFG.frame_size) + 1
    buf = np.zeros(n * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    frames = jnp.asarray(buf.reshape(n, CFG.frame_size))
    pkts, peaks, lags = _extract_pkts(frames)
    outs = {}
    for cd in ("f32", "bf16"):
        cfg = CFG.replace(cfo_dtype=cd)
        o = fused_decode(cfg, jnp.asarray(pkts.real),
                         jnp.asarray(pkts.imag), jnp.asarray(peaks),
                         descramble=False,
                         block_channels=pkts.shape[0], interpret=True)
        outs[cd] = jax.tree.map(np.asarray, o)
    assert np.array_equal(outs["f32"]["gated"], outs["bf16"]["gated"])
    assert np.array_equal(outs["f32"]["matches"],
                          outs["bf16"]["matches"])
    v = outs["f32"]["gated"] & (
        outs["f32"]["matches"] > CFG.match_threshold)
    assert v.any()
    assert np.array_equal(outs["f32"]["dibits"][v],
                          outs["bf16"]["dibits"][v])
    assert np.max(np.abs(outs["f32"]["cfo_hz"][v]
                         - outs["bf16"]["cfo_hz"][v])) < 3.0


def test_cfo_dtype_validation():
    import pytest
    with pytest.raises(ValueError):
        CFG.replace(cfo_dtype="fp8")
