"""Pipelined (overlapped transpose/FFT) paths vs the dense-collective paths.

SURVEY.md §7 hard-parts: "chunked pipelines are where silent corruption hides;
land only after vs-unoverlapped tests."  These assert the pipelined slab and
pencil transforms match the dense ones to fp64 roundoff on the 8-device mesh.
"""

import numpy as np
import pytest

from mpifft4py_tpu import slab, pencil

TAU = 2 * np.pi


@pytest.mark.parametrize("nchunks", [2, 3, 4])
def test_slab_pipelined_matches_dense(rng, nchunks):
    N = 16
    args = (np.array([N] * 3), np.array([TAU] * 3), 8, "double")
    dense = slab.R2C(*args)
    piped = slab.R2C(*args, communication="pipelined", pipeline_chunks=nchunks)
    u = rng.standard_normal((N, N, N))
    fu_d = np.asarray(dense.fftn(u))
    fu_p = np.asarray(piped.fftn(u))
    assert np.allclose(fu_p, fu_d, atol=1e-12 * N ** 3)
    ub_d = np.asarray(dense.ifftn(dense.shard_complex(fu_d)))
    ub_p = np.asarray(piped.ifftn(piped.shard_complex(fu_d)))
    assert np.allclose(ub_p, ub_d, atol=1e-13)
    assert np.allclose(ub_p, u, atol=1e-12)


@pytest.mark.parametrize("P1", [2, 4])
def test_pencil_pipelined_matches_dense(rng, P1):
    N = 16
    kw = dict(P1=P1)
    dense = pencil.R2C(np.array([N] * 3), np.array([TAU] * 3), 8, "double", **kw)
    piped = pencil.R2C(np.array([N] * 3), np.array([TAU] * 3), 8, "double",
                       communication="pipelined", pipeline_chunks=3, **kw)
    u = rng.standard_normal((N, N, N))
    fu_d = np.asarray(dense.fftn(u))
    fu_p = np.asarray(piped.fftn(u))
    assert np.allclose(fu_p, fu_d, atol=1e-12 * N ** 3)
    ub_p = np.asarray(piped.ifftn(piped.shard_complex(fu_d)))
    assert np.allclose(ub_p, u, atol=1e-12)


def test_pipelined_with_dealias_mask(rng):
    N = 16
    piped = slab.R2C(np.array([N] * 3), np.array([TAU] * 3), 4, "double",
                     communication="pipelined")
    u = rng.standard_normal((N, N, N))
    fu = np.asarray(piped.fftn(u, dealias="2/3-rule"))
    dense = slab.R2C(np.array([N] * 3), np.array([TAU] * 3), 4, "double")
    fu_d = np.asarray(dense.fftn(u, dealias="2/3-rule"))
    assert np.allclose(fu, fu_d, atol=1e-12 * N ** 3)


def test_chunk_bounds():
    from mpifft4py_tpu.parallel.collectives import _chunk_bounds

    assert _chunk_bounds(9, 4) == [(0, 3), (3, 2), (5, 2), (7, 2)]
    assert _chunk_bounds(8, 4) == [(0, 2), (2, 2), (4, 2), (6, 2)]
    assert _chunk_bounds(2, 4) == [(0, 1), (1, 1)]
    assert sum(s for _, s in _chunk_bounds(129, 4)) == 129
