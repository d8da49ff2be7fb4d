"""Collective transpose primitives — the framework's communication tier.

Reference analog (SURVEY.md §2.4): mpiFFT4py issues blocking ``MPI_Alltoall``
between local FFT stages.  Here the transpose is ``lax.all_to_all`` on a named
mesh axis inside ``shard_map`` (riding ICI), with two call styles:

* ``transpose(x, axis_name, split_axis, concat_axis)`` — one dense all-to-all,
  the direct Alltoall analog.  XLA fuses the pack/unpack relayouts the way
  Alltoallw's derived datatypes did.
* ``transpose_pipelined(x, axis_name, split_axis, concat_axis, work_fn,
  pipeline_axis, nchunks)`` — the *overlap* upgrade the reference never had
  (its collectives are blocking): the array is chunked along an axis that is
  independent of both the transpose and the per-chunk compute, and the
  chunk-c collective runs while chunk c−1's FFT computes.  The unrolled
  schedule exposes the overlap to XLA's async collective scheduler, so the
  transpose cost approaches ICI-bandwidth-bound instead of serialised
  comm+compute (BASELINE config 5).

Both are shard_map-local functions (operate on per-device blocks).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from jax import lax

__all__ = ["transpose", "transpose_pipelined"]


def transpose(x, axis_name: str, split_axis: int, concat_axis: int):
    """Dense tiled all-to-all: MPI_Alltoall analog on one mesh axis."""
    return lax.all_to_all(x, axis_name, split_axis=split_axis,
                          concat_axis=concat_axis, tiled=True)


def _chunk_bounds(n: int, k: int):
    """k contiguous chunks covering n (first chunks one larger on remainder)."""
    base, rem = divmod(n, k)
    bounds = []
    start = 0
    for i in range(k):
        size = base + (1 if i < rem else 0)
        if size == 0:
            continue
        bounds.append((start, size))
        start += size
    return bounds


def transpose_pipelined(x, axis_name: str, split_axis: int, concat_axis: int,
                        work_fn: Optional[Callable], pipeline_axis: int,
                        nchunks: int = 4, pre_fn: Optional[Callable] = None):
    """Chunked transpose + per-chunk compute, overlappable by XLA.

    ``pipeline_axis`` must be independent of ``split_axis``/``concat_axis`` and
    of ``work_fn``'s contraction axes (true for the Hermitian z-axis in the
    slab/pencil pipelines).  ``work_fn(chunk)`` is applied to each transposed
    chunk; results are concatenated back along ``pipeline_axis``.

    Equivalent (bitwise, per chunk) to ``work_fn(transpose(x, ...))`` — tested
    against the unpipelined path.
    """
    work_fn = work_fn or (lambda v: v)
    pre_fn = pre_fn or (lambda v: v)
    n = x.shape[pipeline_axis]
    bounds = _chunk_bounds(n, nchunks)
    if len(bounds) <= 1:
        return work_fn(transpose(pre_fn(x), axis_name, split_axis, concat_axis))
    outs = []
    idx = [slice(None)] * x.ndim
    for start, size in bounds:
        idx[pipeline_axis] = slice(start, start + size)
        chunk = pre_fn(x[tuple(idx)])
        y = transpose(chunk, axis_name, split_axis, concat_axis)
        outs.append(work_fn(y))
    return jnp.concatenate(outs, axis=pipeline_axis)
