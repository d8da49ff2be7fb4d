"""Multi-process (real-pod) runtime scaffolding.

Reference analog: mpiFFT4py never calls ``MPI_Init`` itself — ``mpi4py`` does
on import, and the caller passes a communicator in (SURVEY.md §2.4).  The
TPU-native equivalent of "the job launcher owns process bootstrap" is
``jax.distributed.initialize``: on a real pod each host process calls it once
before touching devices, after which ``jax.devices()`` is the *global* device
list and every ``Mesh`` built from it spans the pod.

This module provides:

* ``initialize(...)`` — thin, idempotent wrapper over
  ``jax.distributed.initialize`` (no-op under a single process or when the
  runtime is already initialised), so user scripts are portable between one
  chip and a pod without edits.
* ``hybrid_mesh(mesh_shape, axis_names, ...)`` — compose a DCN-spanning outer
  axis with ICI-connected inner axes (the multi-slice recipe: collectives
  along inner axes ride ICI; only the outermost axis crosses DCN).  Built on
  ``mesh_utils.create_hybrid_device_mesh`` with a pure-numpy fallback so the
  composition logic is unit-testable with fake device objects.

Usage on a v5p multi-slice pod (one process per host)::

    from mpifft4py_tpu.parallel import runtime
    runtime.initialize()                      # env-driven (TPU autodetect)
    FFT = pencil.R2C(N, L, None, "single")    # comm=None -> all global devices

The decomposition classes themselves are unchanged: single-controller SPMD
means the transform program is identical; only device discovery differs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["initialize", "is_initialized", "hybrid_mesh"]

_initialized = False


def is_initialized() -> bool:
    """True if this process already joined a multi-process JAX runtime."""
    return _initialized


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kw) -> None:
    """Join the multi-process runtime (idempotent; no-op for 1 process).

    All arguments optional: on TPU pods JAX autodetects them from the
    environment (TPU metadata / ``JAX_COORDINATOR_ADDRESS`` etc.), matching
    how ``mpirun`` fed ``MPI_Init`` for the reference.  Call before any other
    JAX API.  Under a single-process launch (no coordinator information at
    all) this is a no-op so scripts stay portable.
    """
    global _initialized
    if _initialized:
        return
    import os
    env_driven = any(os.environ.get(k) for k in
                     ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                      "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and num_processes is None and not env_driven:
        # Single-process or TPU-autodetect launch: initialize only when JAX
        # can autodetect a real multi-host topology; otherwise stay a no-op
        # so the same script runs on one chip.
        try:
            jax.distributed.initialize()
            _initialized = True
        except Exception:
            pass
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)
    _initialized = True


def _granule_key(dev) -> Tuple:
    """Group devices into ICI-connected granules (slices/hosts).

    Real TPU devices carry ``slice_index``; fall back to ``process_index``
    (simulated CPU meshes), then to host id attributes on fakes.
    """
    for attr in ("slice_index", "process_index", "host_id"):
        v = getattr(dev, attr, None)
        if v is not None:
            return (attr, int(v))
    return ("flat", 0)


def hybrid_mesh(ici_shape: Sequence[int], axis_names: Sequence[str],
                dcn_axis: str = "dcn", devices=None) -> Mesh:
    """Mesh with a DCN-spanning outer axis and ICI-connected inner axes.

    ``ici_shape``/``axis_names`` describe the per-slice (per-granule) mesh;
    the returned mesh has shape ``(n_granules,) + ici_shape`` with axis names
    ``(dcn_axis,) + axis_names``.  Collectives over the inner names stay
    inside one granule (ICI); only ``dcn_axis`` crosses granules (the
    scaling-book multi-slice recipe).  A pencil transform on a pod maps its
    two all-to-all groups onto inner names and uses ``dcn_axis`` for batch /
    ensemble parallelism.

    With one granule the DCN axis has size 1 (costless).  Granule membership
    comes from device attributes (``slice_index``/``process_index``), so the
    composition is testable with fake device lists.
    """
    devs = list(jax.devices()) if devices is None else list(devices)
    granules: dict = {}
    for d in devs:
        granules.setdefault(_granule_key(d), []).append(d)
    groups = [granules[k] for k in sorted(granules)]
    per = int(np.prod(ici_shape))
    for g in groups:
        if len(g) != per:
            raise ValueError(
                f"each ICI granule must have exactly prod(ici_shape)={per} "
                f"devices; got granule sizes {[len(x) for x in groups]}")
    want = (len(groups),) + tuple(ici_shape)
    try:  # physical-topology-aware layout when real TPUs are present.
        # create_hybrid_device_mesh takes same-rank shapes whose elementwise
        # product is the result shape: per-granule (1, *ici) × across-granule
        # (G, 1, …) → (G, *ici) with the DCN axis leading.
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            (1,) + tuple(ici_shape), (len(groups),) + (1,) * len(ici_shape),
            devices=devs, process_is_granule=False)
        if arr.shape != want:
            raise ValueError(f"hybrid mesh shape {arr.shape} != {want}")
        # inner axes must never cross a granule boundary
        for g in range(len(groups)):
            if len({_granule_key(d) for d in arr[g].ravel()}) != 1:
                raise ValueError("granule mixing in hybrid mesh")
    except Exception:
        arr = np.array([np.asarray(g).reshape(tuple(ici_shape)) for g in groups])
    return Mesh(arr, (dcn_axis,) + tuple(axis_names))
