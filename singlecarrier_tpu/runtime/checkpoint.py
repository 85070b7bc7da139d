"""Checkpoint / resume of demodulator state.

The reference has no persistence at all -- its state dies with the
process (static globals, SURVEY.md section 5).  Here the per-channel
state is an explicit pytree, so checkpointing between streaming blocks
is exact by construction: save the pytree, restore it, continue --
bit-identical resume (tested in tests/test_runtime.py,
tests/test_checkpoint_sharded.py).

Two paths:

 * ``save_state`` / ``restore_state`` -- single-file pickle of the
   fetched-to-host tree.  Right for small channel counts and for
   states that must travel as one portable artifact.
 * ``save_sharded`` / ``restore_sharded`` -- orbax (OCDBT) save of the
   still-sharded device arrays: every host writes only its own shards,
   and restore places shards directly onto the target mesh without the
   state ever being gathered to one host.  This is the path for
   1M-channel sharded state across a pod.

Complex leaves are split into real/imag float planes first in both
paths because (a) the axon backend cannot transfer complex across
host<->device (utils/compat.py), (b) orbax/tensorstore handles real
dtypes universally, and (c) it keeps the on-disk format trivially
portable.  The plane split happens ON DEVICE (``x.real``), so sharded
leaves stay sharded.
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


def _is_marker(x):
    return isinstance(x, dict) and x.get("__complex__")


def _join_complex(tree):
    import jax.numpy as jnp
    from jax import lax

    def f(x):
        if _is_marker(x):
            return lax.complex(jnp.asarray(x["re"]), jnp.asarray(x["im"]))
        return jnp.asarray(x)
    return jax.tree.map(f, tree, is_leaf=_is_marker)


def save_state(path: str, state: Any, *, step: int = 0) -> None:
    """Persist a demod state pytree (+ stream position) to one file.

    Fetches everything to this host -- use ``save_sharded`` for state
    sharded across devices/hosts at scale.
    """
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


# ---------------------------------------------------------------------------
# Sharded (orbax) path


def _is_plane_pair(x):
    """Device-path complex marker: a dict with exactly {re, im} keys
    (no bool leaf -- orbax stores only array leaves)."""
    return isinstance(x, dict) and set(x.keys()) == {"re", "im"}


def _split_planes_device(tree):
    """Split complex leaves into real/imag planes ON DEVICE -- sharded
    leaves stay sharded; no host round-trip."""
    import jax.numpy as jnp

    def f(x):
        if jnp.iscomplexobj(x):
            return {"re": x.real, "im": x.imag}
        return x
    return jax.tree.map(f, tree)


def _join_planes_device(tree):
    from jax import lax

    def f(x):
        if _is_plane_pair(x):
            return lax.complex(x["re"], x["im"])
        return x
    return jax.tree.map(f, tree, is_leaf=_is_plane_pair)


def save_sharded(path: str, state: Any, *, step: int = 0) -> None:
    """Orbax save of a (possibly multi-host-sharded) state pytree.

    Each process writes only the shards it owns (OCDBT); safe to call
    from every process of a multi-host run with the same ``path``.
    """
    import orbax.checkpoint as ocp

    split = _split_planes_device(state)
    split = {"state": split, "step": np.asarray(step, np.int64)}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), split, force=True)
    ckptr.wait_until_finished()


def restore_sharded(path: str, like: Any):
    """Restore ``(state, step)`` saved by ``save_sharded``.

    ``like``: a state pytree (concrete or ShapeDtypeStruct) whose
    shapes/dtypes/shardings describe the restore targets -- shards load
    straight onto the devices that own them.
    """
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    def to_abstract(x):
        sharding = getattr(x, "sharding", None)
        if jnp.iscomplexobj(x):
            real = jnp.float32 if x.dtype == jnp.complex64 else jnp.float64
            plane = jax.ShapeDtypeStruct(x.shape, real, sharding=sharding)
            return {"re": plane, "im": plane}
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    abstract = jax.tree.map(to_abstract, like)
    abstract = {"state": abstract,
                "step": jax.ShapeDtypeStruct((), jnp.int64)}
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), abstract)
    state = _join_planes_device(restored["state"])
    return state, int(restored["step"])
