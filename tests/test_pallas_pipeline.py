"""Full production pipeline with the Pallas front-end (interpret mode)
vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.modem import prod_rx_init, tx_stream
from singlecarrier_tpu.modem.rx_production import (
    prod_rx_stream,
    prod_rx_stream_pallas,
)


def test_pallas_pipeline_matches_xla():
    rng = np.random.default_rng(31)
    bits = rng.integers(0, 2, (3, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), flush_gap=True))
    n = -(-len(pcm) // CFG.frame_size) + 1
    buf = np.zeros(n * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    frames = buf.reshape(n, CFG.frame_size)

    C = 4
    batch = jnp.asarray(np.broadcast_to(
        frames[:, None, :], (n, C, CFG.frame_size)).copy())

    _, out_p = prod_rx_stream_pallas(
        CFG, prod_rx_init(CFG, (C,)), batch, descramble=False,
        block_channels=4, fuse_decode=False, interpret=True)

    _, out_x = prod_rx_stream(CFG, prod_rx_init(CFG),
                              jnp.asarray(frames), descramble=False)

    for c in range(C):
        assert np.array_equal(np.asarray(out_p.valid[:, c]),
                              np.asarray(out_x.valid))
        assert np.array_equal(np.asarray(out_p.bits[:, c]),
                              np.asarray(out_x.bits))
        assert np.array_equal(np.asarray(out_p.lag[:, c]),
                              np.asarray(out_x.lag))
    # decodes the payload
    got = np.asarray(out_p.bits[:, 0])[np.asarray(out_p.valid[:, 0])]
    assert np.array_equal(got, bits.reshape(3, CFG.bits_per_frame))


def test_fused_decode_pipeline_matches_xla():
    rng = np.random.default_rng(32)
    bits = rng.integers(0, 2, (3, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), flush_gap=True))
    n = -(-len(pcm) // CFG.frame_size) + 1
    buf = np.zeros(n * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    frames = buf.reshape(n, CFG.frame_size)

    C = 4
    batch = jnp.asarray(np.broadcast_to(
        frames[:, None, :], (n, C, CFG.frame_size)).copy())

    _, out_p = prod_rx_stream_pallas(
        CFG, prod_rx_init(CFG, (C,)), batch, descramble=False,
        block_channels=4, fuse_decode=True, interpret=True)

    _, out_x = prod_rx_stream(CFG, prod_rx_init(CFG),
                              jnp.asarray(frames), descramble=False)

    for c in range(C):
        assert np.array_equal(np.asarray(out_p.valid[:, c]),
                              np.asarray(out_x.valid))
        vx = np.asarray(out_x.valid)
        assert np.array_equal(np.asarray(out_p.bits[:, c])[vx],
                              np.asarray(out_x.bits)[vx])
    got = np.asarray(out_p.bits[:, 0])[np.asarray(out_p.valid[:, 0])]
    assert np.array_equal(got, bits.reshape(3, CFG.bits_per_frame))
