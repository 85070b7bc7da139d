#!/usr/bin/env python
"""Quantify TPU default-vs-highest matmul precision on the XLA RX path
(BER vs ground truth at a moderate SNR).  Supports ROADMAP round-3
item 2 / the PARITY_TPU.json investigation."""

import os as _os
import sys as _sys

# Runnable as `python tools/<name>.py` from the repo root: the
# script dir shadows the cwd on sys.path (and PYTHONPATH breaks
# axon plugin discovery -- .claude/skills/verify/SKILL.md).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import jax

from singlecarrier_tpu.utils.compat import enable_compilation_cache

enable_compilation_cache()

from singlecarrier_tpu.ber import ber_run                      # noqa: E402
from singlecarrier_tpu.config import DEFAULT_CONFIG as CFG     # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--precision", default=None,
                choices=[None, "default", "highest", "float32"])
ap.add_argument("--snr-db", type=float, default=12.0)
args = ap.parse_args()

kw = dict(snr_db=args.snr_db, freq_hz=15.0, n_packets=6, n_trials=2)
if args.precision in (None, "default"):
    p = ber_run(CFG, jax.random.PRNGKey(9), **kw)
else:
    with jax.default_matmul_precision(args.precision):
        p = ber_run(CFG, jax.random.PRNGKey(9), **kw)
print(f"precision={args.precision} snr={args.snr_db}:", p, flush=True)
