"""Host↔device transfer helpers that tolerate complex-transfer-less backends.

Some TPU attachment paths (e.g. the axon PJRT tunnel in this build environment)
implement device↔host transfers only for real dtypes — complex64/complex128
round trips raise UNIMPLEMENTED even though on-device complex compute is fully
supported.  These helpers split complex arrays into (real, imag) float pairs at
the transfer boundary and recombine on the other side under jit.  On backends
with native complex transfers they reduce to plain ``np.asarray``/``device_put``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["to_numpy", "device_put", "zeros"]


def zeros(shape, dtype, sharding=None) -> jax.Array:
    """Device-created zeros (optionally sharded).

    Eager ``jnp.zeros`` with a complex dtype uploads a host constant — which
    raises UNIMPLEMENTED on complex-transfer-less backends (axon) and poisons
    the stream.  Building inside jit lowers to an on-device broadcast instead.
    """
    fn = jax.jit(lambda: jnp.zeros(shape, dtype), out_shardings=sharding)
    return fn()

_COMPLEX_TRANSFER_OK: Dict[str, bool] = {}


def _complex_transfer_ok() -> bool:
    # NOTE: this must NOT be probed with a trial transfer — a failed complex
    # device_put poisons the runtime stream on the axon backend (subsequent
    # dispatches raise UNIMPLEMENTED).  Decide from the platform name instead;
    # override with MPIFFT4PY_TPU_COMPLEX_TRANSFER={0,1} if needed.
    import os

    env = os.environ.get("MPIFFT4PY_TPU_COMPLEX_TRANSFER")
    if env is not None:
        return env not in ("0", "false", "False")
    backend = jax.default_backend()
    ok = _COMPLEX_TRANSFER_OK.get(backend)
    if ok is None:
        # The axon PJRT tunnel registers under the 'tpu' platform name; its
        # marker is the platform_version string.
        try:
            ver = getattr(jax.devices()[0].client, "platform_version", "")
        except Exception:
            ver = ""
        ok = "axon" not in ver.lower()
        _COMPLEX_TRANSFER_OK[backend] = ok
    return ok


def _real_dtype(cdtype) -> np.dtype:
    return np.zeros(0, dtype=cdtype).real.dtype


def to_numpy(x) -> np.ndarray:
    """Fetch a jax array to host, splitting complex into re/im if needed."""
    if np.dtype(x.dtype).kind != "c" or _complex_transfer_ok():
        return np.asarray(x)
    re, im = jax.jit(lambda a: (jnp.real(a), jnp.imag(a)))(x)
    re, im = np.asarray(re), np.asarray(im)
    cdt = np.complex64 if re.dtype == np.float32 else np.complex128
    return re.astype(cdt) + 1j * im.astype(cdt)


def device_put(a, dtype, sharding: Optional[jax.sharding.Sharding] = None) -> jax.Array:
    """Place a host (or device) array with the given dtype/sharding, splitting
    complex payloads into float pairs when the backend can't move them whole."""
    dtype = np.dtype(dtype)
    if isinstance(a, jax.Array) and not isinstance(a, np.ndarray):
        # Already on device: cast/reshard under jit (no host transfer involved).
        fn = jax.jit(lambda v: v.astype(dtype), out_shardings=sharding)
        return fn(a)
    a = np.asarray(a)
    if dtype.kind != "c" or _complex_transfer_ok():
        return jax.device_put(np.ascontiguousarray(a, dtype=dtype), sharding)
    rdt = _real_dtype(dtype)
    re = jax.device_put(np.ascontiguousarray(a.real, dtype=rdt), sharding)
    im = jax.device_put(np.ascontiguousarray(a.imag, dtype=rdt), sharding)
    combine = jax.jit(lambda r, i: jax.lax.complex(r, i).astype(dtype),
                      out_shardings=sharding)
    return combine(re, im)
