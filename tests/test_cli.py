"""CLI smoke tests (mod -> demod roundtrip through files)."""

import json
import os

import numpy as np

from singlecarrier_tpu.cli import main
from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG


def test_mod_demod_roundtrip(tmp_path, capsys):
    raw = str(tmp_path / "tx.raw")
    bits = str(tmp_path / "bits.npy")
    assert main(["mod", "--out", raw, "--bits-out", bits,
                 "--packets", "3", "--seed", "3"]) == 0
    assert os.path.getsize(raw) == 3 * CFG.packet_size * 2
    capsys.readouterr()

    assert main(["demod", "--in", raw]) == 0
    out = capsys.readouterr().out
    recs = [json.loads(line) for line in out.strip().splitlines()]
    assert len(recs) == 3
    sent = np.load(bits).reshape(3, CFG.bits_per_frame)
    for i, r in enumerate(recs):
        got = np.frombuffer(r["bits"].encode(), np.uint8) - ord("0")
        assert np.array_equal(got, sent[i])
        assert r["matches"] == 128


def test_loopback_with_impairments(capsys):
    assert main(["loopback", "--packets", "2", "--snr", "15",
                 "--cfo", "12"]) == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["packets_detected"] == 2
    assert rec["ber"] < 0.01
    assert abs(rec["mean_cfo_hz"] - 12.0) < 3.0
