"""Failure detection + elastic recovery (runtime/failover.py).

The recovery contract: the demod step is pure state-in/state-out, so
restore-and-replay after ANY fault reproduces the fault-free outputs
bit-for-bit.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG
from singlecarrier_tpu.modem import prod_rx_init, tx_stream
from singlecarrier_tpu.runtime import StreamDemodulator
from singlecarrier_tpu.runtime.failover import (
    ElasticDemodulator,
    Heartbeat,
    failed_processes,
    health_check,
    monitor_heartbeats,
)

N_CH = 2


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(33)
    bits = rng.integers(0, 2, (3, CFG.ns, CFG.data_symbols * 2),
                        dtype=np.uint8)
    pcm = np.asarray(tx_stream(CFG, jnp.asarray(bits), flush_gap=True))
    n_blocks = -(-len(pcm) // CFG.frame_size)
    buf = np.zeros(n_blocks * CFG.frame_size, np.int16)
    buf[:len(pcm)] = pcm
    blocks = buf.reshape(n_blocks, CFG.frame_size)
    return np.broadcast_to(
        blocks[:, None, :], (n_blocks, N_CH, CFG.frame_size)).copy()


@pytest.fixture(scope="module")
def clean_outputs(stream):
    demod = StreamDemodulator(CFG, n_channels=N_CH, descramble=False,
                              metrics=False)
    return [demod.push(b) for b in stream]


def _assert_matches(outs, clean_outputs):
    for out, ref in zip(outs, clean_outputs):
        assert np.array_equal(np.asarray(out.valid), np.asarray(ref.valid))
        assert np.array_equal(np.asarray(out.bits), np.asarray(ref.bits))


def test_health_check_flags_nonfinite():
    state = prod_rx_init(CFG, (N_CH,))
    assert health_check(state) == 0
    bad = state._replace(
        fir_tail=state.fir_tail.at[0, 3].set(jnp.nan + 0j))
    assert health_check(bad) >= 1


def test_recovers_from_transient_source_fault(stream, clean_outputs,
                                              tmp_path):
    faulted = {"done": False}

    def source(i):
        if i == 3 and not faulted["done"]:
            faulted["done"] = True
            raise IOError("injected transient ingest fault")
        return stream[i]

    ed = ElasticDemodulator(
        CFG, N_CH, checkpoint_path=os.path.join(tmp_path, "ckpt.pkl"),
        checkpoint_every=2, descramble=False)
    outs = ed.run(source, n_blocks=len(stream))
    assert ed.recoveries == 1
    _assert_matches(outs, clean_outputs)


def test_recovers_from_state_corruption(stream, clean_outputs, tmp_path):
    """Poison the carried state mid-stream; the health check must trip
    and restore-and-replay must reproduce the clean decode."""
    ed = ElasticDemodulator(
        CFG, N_CH, checkpoint_path=os.path.join(tmp_path, "ckpt.pkl"),
        checkpoint_every=2, descramble=False)
    outs = []
    for i in range(len(stream)):
        if i == 3:
            # the downmix phasor is multiplicative carry: a NaN here
            # poisons every subsequent block's state until recovery
            ed.state = ed.state._replace(
                phase=ed.state.phase.at[1].set(jnp.nan + 0j))
        outs.append(ed.step(lambda k: stream[k]))
    assert ed.recoveries >= 1
    _assert_matches(outs, clean_outputs)


def test_persistent_fault_raises(stream, tmp_path):
    def source(i):
        if i == 2:
            raise IOError("deterministic poison")
        return stream[i]

    ed = ElasticDemodulator(
        CFG, N_CH, checkpoint_path=os.path.join(tmp_path, "ckpt.pkl"),
        max_retries=2, descramble=False)
    with pytest.raises(IOError):
        ed.run(source, n_blocks=len(stream))


def test_heartbeat_monitor(tmp_path):
    hb_dir = str(tmp_path / "hb")
    hb0 = Heartbeat(hb_dir, process_id=0)
    hb1 = Heartbeat(hb_dir, process_id=1)
    hb0.beat(step=7)
    hb1.beat(step=7)
    recs = monitor_heartbeats(hb_dir, timeout_s=30.0)
    assert set(recs) == {0, 1}
    assert not any(r["stale"] for r in recs.values())
    assert failed_processes(hb_dir, timeout_s=30.0) == []
    # age out process 1 by back-dating its stamp
    import json
    p1 = os.path.join(hb_dir, "hb_1.json")
    with open(p1) as f:
        rec = json.load(f)
    rec["time"] -= 120.0
    with open(p1, "w") as f:
        json.dump(rec, f)
    assert failed_processes(hb_dir, timeout_s=30.0) == [1]
