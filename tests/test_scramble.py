"""Golden tests: vectorized XOR scrambler vs the reference LFSR
(reference: src/scramble.c)."""

import jax
import jax.numpy as jnp
import numpy as np

from singlecarrier_tpu.constants import (
    SCRAMBLE_PERIOD,
    scramble_dibit_mask,
    scramble_keystream,
)
from singlecarrier_tpu.scramble import (
    reference_lfsr_state,
    scramble_bits,
    scramble_dibits,
)


def test_keystream_matches_reference_lfsr(golden):
    """Scrambling zeros yields the raw keystream: the harness drove the C
    scrambler with zero dibits (tools/harness/golden_main.c section C)."""
    masks = scramble_dibit_mask()[:256]
    assert np.array_equal(masks, golden["scramble_zero_dibits"])


def test_keystream_is_maximal_length():
    ks = scramble_keystream(0x4A80, 2 * SCRAMBLE_PERIOD)
    assert np.array_equal(ks[:SCRAMBLE_PERIOD], ks[SCRAMBLE_PERIOD:])
    # 1 + X^14 + X^15 is primitive: all-but-one 15-bit states visited.
    assert ks[:SCRAMBLE_PERIOD].sum() == 2 ** 14  # balanced PN property


def test_scramble_roundtrip():
    rng = np.random.default_rng(0)
    dibits = jnp.asarray(rng.integers(0, 4, 500, dtype=np.uint8))
    scrambled, off = scramble_dibits(dibits, 0)
    assert not np.array_equal(np.asarray(scrambled), np.asarray(dibits))
    unscrambled, _ = scramble_dibits(scrambled, 0)
    assert np.array_equal(np.asarray(unscrambled), np.asarray(dibits))
    assert int(off) == 500


def test_offset_continuation():
    """Two chunked calls == one call (stream state = offset)."""
    rng = np.random.default_rng(1)
    dibits = jnp.asarray(rng.integers(0, 4, 100, dtype=np.uint8))
    full, _ = scramble_dibits(dibits, 0)
    a, off = scramble_dibits(dibits[:37], 0)
    b, _ = scramble_dibits(dibits[37:], off)
    assert np.array_equal(np.asarray(full),
                          np.concatenate([np.asarray(a), np.asarray(b)]))


def test_bit_level_scramble():
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, 200, dtype=np.uint8))
    s, off = scramble_bits(bits, 0)
    u, _ = scramble_bits(s, 0)
    assert np.array_equal(np.asarray(u), np.asarray(bits))
    assert int(off) == 200


def test_reference_lfsr_state_evolution():
    """The offset representation can reproduce the C register exactly."""
    assert reference_lfsr_state(0) == 0x4A80
    s = reference_lfsr_state(10)
    assert 0 <= s < (1 << 15)


def test_vmapped_per_channel_offsets():
    dibits = jnp.zeros((4, 31), jnp.uint8)
    offsets = jnp.asarray([0, 31, 62, 93], jnp.int32)
    out, new_off = jax.vmap(lambda d, o: scramble_dibits(d, o))(dibits, offsets)
    table = scramble_dibit_mask()
    for c in range(4):
        assert np.array_equal(np.asarray(out[c]), table[31 * c:31 * (c + 1)])
    assert np.array_equal(np.asarray(new_off), [31, 62, 93, 124])
