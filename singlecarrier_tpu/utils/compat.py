"""Backend compatibility helpers.

The axon TPU backend (the tunneled single-chip environment this
framework develops against) cannot transfer complex64 arrays across the
host<->device boundary in either direction -- complex COMPUTE on device
is fully supported, only the transfers are unimplemented.  Two rules
keep the framework portable:

 * embed host complex constants as two real constants combined on
   device with ``lax.complex`` (``device_complex``);
 * fetch complex results by splitting into real/imag on device first
   (``fetch`` / ``tree_fetch``).

On standard backends these are no-ops semantically and cost one fused
elementwise op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The tunneled dev chip pays 1-8 min per Mosaic/XLA compile; a
    process-spanning on-disk cache cuts repeat invocations (bench, CLI,
    driver entry) to cache hits.  Safe to call multiple times.
    """
    import os

    if path is None:
        path = os.environ.get(
            "SINGLECARRIER_JAX_CACHE",
            os.path.expanduser("~/.cache/singlecarrier_tpu/jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def device_complex(arr):
    """jnp-ify a host array; complex goes as two real constants.

    Use instead of ``jnp.asarray`` for any possibly-complex host
    constant that lands inside a jitted program.
    """
    a = np.asarray(arr)
    if not np.iscomplexobj(a):
        return jnp.asarray(a)
    return lax.complex(jnp.asarray(np.ascontiguousarray(a.real)),
                       jnp.asarray(np.ascontiguousarray(a.imag)))


def czeros(shape):
    """complex64 zeros built ON device (eager jnp.zeros(.., complex64)
    lowers to a host-constant device_put, which the axon backend cannot
    transfer)."""
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    return lax.complex(jnp.zeros(shape, jnp.float32),
                       jnp.zeros(shape, jnp.float32))


def cones(shape):
    """complex64 ones (1+0j) built ON device."""
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    return lax.complex(jnp.ones(shape, jnp.float32),
                       jnp.zeros(shape, jnp.float32))


@jax.jit
def _split(x):
    return x.real, x.imag


def fetch(x) -> np.ndarray:
    """Device -> host, safe for complex and narrow-int leaves.

    The axon backend implements device->host transfers only for the
    common wide dtypes; complex64 splits into planes, and
    uint8/int8/bool ride as int32 and are narrowed back on host.
    """
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        re, im = _split(x)
        return np.asarray(re) + 1j * np.asarray(im)
    if x.dtype in (jnp.uint8, jnp.int8, jnp.bool_):
        # flatten: narrow-dtype transfers fail for some >=2D layouts
        # (e.g. u8 [6,8,62]); 1D int32 always moves
        flat = x.astype(jnp.int32).reshape(-1)
        return np.asarray(flat).astype(x.dtype).reshape(x.shape)
    return np.asarray(x)


def tree_fetch(tree):
    """``fetch`` over a pytree (states, outputs)."""
    return jax.tree.map(fetch, tree)
