"""End-to-end decode at a NON-default numerology.

Every constant the reference hardcodes is a ModemConfig field; this
pins that the whole pipeline -- TX, XLA RX, and the fused Pallas batch
path (band matrices, barrel shift, aligned tap matrix) -- is generic
over it, not silently specialized to the 8 kHz / 1600 baud / 5x
defaults (reference: headers/qpsk_internal.h:32-35).
"""

import jax.numpy as jnp
import numpy as np

from singlecarrier_tpu.config import ModemConfig
from singlecarrier_tpu.modem import prod_rx_init, tx_stream
from singlecarrier_tpu.modem.rx_production import (prod_rx_batch,
                                                   prod_rx_stream)

# 9.6 kHz / 2400 baud / 4x oversampling / 1500 Hz carrier
ALT = ModemConfig(fs=9600.0, rs=2400.0, center=1500.0)


def test_alt_numerology_roundtrip():
    assert ALT.cycles == 4
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (3, ALT.ns, ALT.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(ALT, jnp.asarray(bits), flush_gap=True))
    n = -(-len(pcm) // ALT.frame_size) + 1
    buf = np.zeros(n * ALT.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    frames = buf.reshape(n, ALT.frame_size)

    # XLA scan path
    _, out = prod_rx_stream(ALT, prod_rx_init(ALT), jnp.asarray(frames),
                            descramble=False)
    v = np.asarray(out.valid)
    got = np.asarray(out.bits)[v]
    assert np.array_equal(got, bits.reshape(-1, ALT.bits_per_frame))

    # fused Pallas batch path (interpret) agrees exactly
    C = 2
    batch = jnp.asarray(np.broadcast_to(
        frames[:, None, :], (n, C, ALT.frame_size)).copy())
    _, ob = prod_rx_batch(ALT, prod_rx_init(ALT, (C,)), batch,
                          descramble=False, block_channels=2,
                          decode_block_channels=2, interpret=True)
    for c in range(C):
        assert np.array_equal(np.asarray(ob.valid[:, c]), v)
        assert np.array_equal(np.asarray(ob.bits[:, c])[v], got)
        assert np.array_equal(np.asarray(ob.lag[:, c]),
                              np.asarray(out.lag))
