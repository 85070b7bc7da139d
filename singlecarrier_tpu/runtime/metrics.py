"""Streaming metrics / observability.

The reference's only observability is a DEBUG2 printf per detected
frame (reference: src/qpsk.c:196-200) and a stderr scatter dump
(qpsk.c:164-168).  Here every block yields structured per-channel
outputs (ProdRxOut) and this aggregator reduces them into running
counters; on a mesh the reductions are psum-style all-reduces XLA
inserts automatically when the inputs are sharded.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class MetricsAggregator:
    blocks: int = 0
    packets: int = 0
    channels_seen: int = 0
    match_hist: list = field(default_factory=list)
    cfo_sum: float = 0.0
    eq_error_sum: float = 0.0

    def update(self, out) -> None:
        valid = np.asarray(out.valid)
        self.blocks += 1
        self.channels_seen = valid.shape[0] if valid.ndim else 1
        n = int(valid.sum())
        self.packets += n
        if n:
            self.cfo_sum += float(np.asarray(out.cfo_hz)[valid].sum())
            self.eq_error_sum += float(
                np.asarray(out.eq_error)[valid].sum())
            self.match_hist.append(
                np.asarray(out.matches)[valid].copy())

    def summary(self) -> dict:
        matches = (np.concatenate(self.match_hist)
                   if self.match_hist else np.zeros(0))
        return {
            "blocks": self.blocks,
            "packets": self.packets,
            "mean_cfo_hz": self.cfo_sum / max(self.packets, 1),
            "mean_eq_error": self.eq_error_sum / max(self.packets, 1),
            "mean_matches": float(matches.mean()) if matches.size else 0.0,
        }
