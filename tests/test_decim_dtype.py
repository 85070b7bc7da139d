"""bf16 decimated-plane carry (cfg.decim_dtype) decode parity.

The bf16 storage halves the dominant HBM traffic of the fused batch
path (decim planes: written once by the front-end, read twice by the
hunt+decode kernel).  Quantization sits at ~-45 dBc -- these tests pin
that it does not cost payload bits (interpret mode; the on-chip gate
is tools/tpu_parity.py --decim-dtype bf16).
"""

import jax
import jax.numpy as jnp
import numpy as np

from singlecarrier_tpu.config import DEFAULT_CONFIG
from singlecarrier_tpu.modem import tx_stream
from singlecarrier_tpu.modem.rx_production import (prod_rx_batch,
                                                   prod_rx_init)


def _stream(C=4, packets=3, seed=1):
    rng = np.random.default_rng(seed)
    cfg = DEFAULT_CONFIG
    bits = jnp.asarray(rng.integers(
        0, 2, (C, packets, cfg.ns, cfg.data_symbols * 2),
        dtype=np.uint8))
    pcm = jax.vmap(lambda b: tx_stream(cfg, b, flush_gap=True,
                                       scramble=True))(bits)
    n_blocks = -(-pcm.shape[-1] // cfg.frame_size)
    pad = n_blocks * cfg.frame_size - pcm.shape[-1]
    fr = jnp.swapaxes(
        jnp.pad(pcm, ((0, 0), (0, pad))).reshape(C, n_blocks, -1),
        0, 1).astype(jnp.int16)
    return fr, np.asarray(bits).reshape(C, packets, -1)


def test_bf16_decim_batch_decodes_clean_stream():
    fr, ref = _stream()
    C, packets = ref.shape[0], ref.shape[1]
    cfg = DEFAULT_CONFIG.replace(decim_dtype="bf16")
    _, out = prod_rx_batch(cfg, prod_rx_init(cfg, (C,)), fr,
                           block_channels=4, decode_block_channels=4,
                           interpret=True)
    v = np.asarray(out.valid)
    got = np.asarray(out.bits)
    assert int(v.sum()) == C * packets
    for b, c in zip(*np.nonzero(v)):
        errs = min(int((got[b, c] != ref[c, p]).sum())
                   for p in range(packets))
        assert errs == 0, (b, c, errs)


def test_bf16_decim_matches_f32_decisions():
    fr, ref = _stream(seed=7)
    C = ref.shape[0]
    outs = {}
    for dd in ("f32", "bf16"):
        cfg = DEFAULT_CONFIG.replace(decim_dtype=dd)
        _, out = prod_rx_batch(cfg, prod_rx_init(cfg, (C,)), fr,
                               block_channels=4,
                               decode_block_channels=4, interpret=True)
        outs[dd] = jax.tree.map(np.asarray, out)
    f32, b16 = outs["f32"], outs["bf16"]
    assert np.array_equal(f32.valid, b16.valid)
    assert np.array_equal(f32.lag, b16.lag)
    vm = f32.valid
    assert np.array_equal(f32.bits[vm], b16.bits[vm])
