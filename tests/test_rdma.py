"""Pallas remote-DMA transpose (communication="rdma") — interpret-mode tests.

The RDMA all-to-all runs under the Pallas TPU interpreter on the 8-device
CPU mesh with real cross-device semantics: per-peer async remote copies,
DMA semaphores, and the collective barrier.  Oracles: lax.all_to_all parity
at the primitive level, and full numpy-checked transforms through the MXU
distributed pipelines (whose collectives carry planar float pairs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mpifft4py_tpu import slab
from mpifft4py_tpu.parallel.rdma import rdma_all_to_all

TAU = 2 * np.pi


@pytest.mark.parametrize("split,concat", [(1, 0), (0, 1), (2, 0)])
def test_rdma_matches_lax_all_to_all(rng, split, concat):
    mesh = Mesh(np.array(jax.devices()[:8]), ("p",))
    x = jnp.asarray(rng.standard_normal((16, 32, 8)).astype(np.float32))
    in_spec = [None, None, None]
    in_spec[concat] = "p"
    out_spec = [None, None, None]
    out_spec[split] = "p"
    f = jax.jit(jax.shard_map(
        lambda v: rdma_all_to_all(v, "p", split, concat, 8, interpret=True),
        mesh=mesh, in_specs=P(*in_spec), out_specs=P(*out_spec),
        check_vma=False))
    ref = jax.jit(jax.shard_map(
        lambda v: jax.lax.all_to_all(v, "p", split, concat, tiled=True),
        mesh=mesh, in_specs=P(*in_spec), out_specs=P(*out_spec),
        check_vma=False))
    assert np.array_equal(np.asarray(f(x)), np.asarray(ref(x)))


@pytest.mark.parametrize("Pn", [2, 4])
def test_slab_rdma_transform_vs_numpy(rng, monkeypatch, Pn):
    """Full slab R2C through the MXU distributed pipeline with the RDMA
    transpose carrying the planar pair."""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setenv("MPIFFT4PY_TPU_PALLAS_DIST", "force")
    shape = (16, 16, 256)
    with pltpu.force_tpu_interpret_mode():
        FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), Pn, "single",
                       communication="rdma")
        assert FFT._pallas_dist_ok(None)
        u = rng.standard_normal(shape).astype(np.float32)
        fu = np.asarray(FFT.fftn(FFT.shard_real(u)))
        ref = np.fft.rfftn(u.astype(np.float64))
        assert np.abs(fu - ref).max() / np.abs(ref).max() < 2e-6
        ub = np.asarray(FFT.ifftn(FFT.shard_complex(fu)))
        assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


def test_rdma_complex_tier_raises(monkeypatch):
    """The XLA complex tier must refuse rdma loudly, not fall back."""
    monkeypatch.setenv("MPIFFT4PY_TPU_PALLAS", "0")  # force the XLA tier
    FFT = slab.R2C(np.array([16, 16, 16]), np.array([TAU] * 3), 4, "single",
                   communication="rdma")
    u = np.random.default_rng(0).standard_normal((16, 16, 16)).astype(np.float32)
    with pytest.raises(Exception, match="rdma"):
        FFT.fftn(FFT.shard_real(u))


def test_rdma_doubleword_transform_vs_numpy(rng, monkeypatch):
    """Doubleword fields move as four float32 leaves — rdma serves them."""
    FFT = slab.R2C(np.array([16, 16, 16]), np.array([TAU] * 3), 4, "double",
                   fp64_mode="doubleword", communication="rdma")
    u = rng.standard_normal((16, 16, 16))
    fu = FFT.gather_dd(FFT.fftn(u)) if hasattr(FFT, "gather_dd") else None
    if fu is None:
        pytest.skip("no dd gather")
    ref = np.fft.rfftn(u)
    assert np.abs(fu - ref).max() / np.abs(ref).max() < 1e-12


def test_pencil_rdma_transform_vs_numpy(rng, monkeypatch):
    """Multi-axis mesh: both of pencil's grouped all-to-alls over RDMA
    (MESH device ids need one coordinate per mesh axis — regression test
    for the 1-tuple addressing bug)."""
    from jax.experimental.pallas import tpu as pltpu
    from mpifft4py_tpu import pencil

    monkeypatch.setenv("MPIFFT4PY_TPU_PALLAS_DIST", "force")
    shape = (16, 16, 256)
    with pltpu.force_tpu_interpret_mode():
        FFT = pencil.R2C(np.array(shape), np.array([TAU] * 3), 4, "single",
                         P1=2, communication="rdma")
        assert FFT._pallas_dist_ok(None)
        u = rng.standard_normal(shape).astype(np.float32)
        fu = np.asarray(FFT.fftn(FFT.shard_real(u)))
        ref = np.fft.rfftn(u.astype(np.float64))
        assert np.abs(fu[..., :FFT.Nf] - ref).max() / np.abs(ref).max() < 2e-6
        ub = np.asarray(FFT.ifftn(FFT.shard_complex(fu)))
        assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


@pytest.mark.parametrize("Pn,nchunks", [(2, 2), (4, 4)])
def test_fused_transpose_fft_x(rng, Pn, nchunks):
    """Fused RDMA-transpose + x-FFT kernel == unfused all_to_all + factored
    FFT (same matmuls, same constants) — the DMA-overlap megakernel."""
    from mpifft4py_tpu.parallel.rdma import fused_transpose_fft_x
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:Pn]), ("p",))
    N0, N1, h = 16, 16, 256
    yr = rng.standard_normal((N0, N1, h)).astype(np.float32)
    yi = rng.standard_normal((N0, N1, h)).astype(np.float32)

    def fused(a, b):
        return fused_transpose_fft_x(a, b, "p", Pn, nchunks=nchunks,
                                     interpret=True)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.shard_map(
            fused, mesh=mesh, in_specs=(P("p"), P("p")),
            out_specs=(P(None, "p"), P(None, "p")), check_vma=False))(
            jnp.asarray(yr), jnp.asarray(yi))

        def unfused(a, b):
            a = jax.lax.all_to_all(a, "p", 1, 0, tiled=True)
            b = jax.lax.all_to_all(b, "p", 1, 0, tiled=True)
            return p3.fft_axis_planar(a, b, axis=0)

        ref = jax.jit(jax.shard_map(
            unfused, mesh=mesh, in_specs=(P("p"), P("p")),
            out_specs=(P(None, "p"), P(None, "p")), check_vma=False))(
            jnp.asarray(yr), jnp.asarray(yi))
    for g, rf in zip(got, ref):
        scale = np.abs(np.asarray(rf)).max()
        assert np.abs(np.asarray(g) - np.asarray(rf)).max() < 1e-5 * scale


@pytest.mark.parametrize("Pn,nchunks", [(2, 2), (4, 4)])
def test_fused_ifft_x_transpose(rng, Pn, nchunks):
    """Inverse megakernel (compute-then-send, double-buffered staging) ==
    unfused inverse FFT + all_to_all."""
    from mpifft4py_tpu.parallel.rdma import fused_ifft_x_transpose
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:Pn]), ("p",))
    N0, N1, h = 16, 16, 256
    yr = rng.standard_normal((N0, N1, h)).astype(np.float32)
    yi = rng.standard_normal((N0, N1, h)).astype(np.float32)

    def fused(a, b):
        return fused_ifft_x_transpose(a, b, "p", Pn, nchunks=nchunks,
                                      interpret=True)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.shard_map(
            fused, mesh=mesh, in_specs=(P(None, "p"), P(None, "p")),
            out_specs=(P("p"), P("p")), check_vma=False))(
            jnp.asarray(yr), jnp.asarray(yi))

        def unfused(a, b):
            a, b = p3.fft_axis_planar(a, b, axis=0, inverse=True)
            a = jax.lax.all_to_all(a, "p", 0, 1, tiled=True)
            b = jax.lax.all_to_all(b, "p", 0, 1, tiled=True)
            return a, b

        ref = jax.jit(jax.shard_map(
            unfused, mesh=mesh, in_specs=(P(None, "p"), P(None, "p")),
            out_specs=(P("p"), P("p")), check_vma=False))(
            jnp.asarray(yr), jnp.asarray(yi))
    for g, rf in zip(got, ref):
        scale = np.abs(np.asarray(rf)).max()
        assert np.abs(np.asarray(g) - np.asarray(rf)).max() < 1e-5 * scale


@pytest.mark.parametrize("Pn", [2, 4])
def test_fused_y_stage_kernels(rng, Pn):
    """y-stage megakernels (pencil's P2-group transpose) == unfused paths."""
    from mpifft4py_tpu.parallel.rdma import (fused_transpose_fft_y,
                                             fused_ifft_y_transpose)
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:Pn]), ("p",))
    n0, N1, w2 = 8, 256, 128   # per-device fwd input (n0, N1/P, w2*P)
    yr = rng.standard_normal((n0 * 1, N1, w2)).astype(np.float32)
    yi = rng.standard_normal((n0 * 1, N1, w2)).astype(np.float32)
    # global arrays: fwd input sharded (None, "p", None) with lanes w2*...:
    # build global (n0, N1, w2) and treat lanes as the split axis
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.shard_map(
            lambda a, b: fused_transpose_fft_y(a, b, "p", Pn, nchunks=2,
                                               interpret=True),
            mesh=mesh, in_specs=(P(None, "p"), P(None, "p")),
            out_specs=(P(None, None, "p"), P(None, None, "p")),
            check_vma=False))(jnp.asarray(yr), jnp.asarray(yi))

        def unfused(a, b):
            a = jax.lax.all_to_all(a, "p", 2, 1, tiled=True)
            b = jax.lax.all_to_all(b, "p", 2, 1, tiled=True)
            return p3.fft_axis_planar(a, b, axis=1)

        ref = jax.jit(jax.shard_map(
            unfused, mesh=mesh, in_specs=(P(None, "p"), P(None, "p")),
            out_specs=(P(None, None, "p"), P(None, None, "p")),
            check_vma=False))(jnp.asarray(yr), jnp.asarray(yi))
        for g, rf in zip(got, ref):
            scale = np.abs(np.asarray(rf)).max()
            assert np.abs(np.asarray(g) - np.asarray(rf)).max() < 1e-5 * scale

        # inverse: input sharded on lanes, output sharded on axis 1
        gi = jax.jit(jax.shard_map(
            lambda a, b: fused_ifft_y_transpose(a, b, "p", Pn, nchunks=2,
                                                interpret=True),
            mesh=mesh, in_specs=(P(None, None, "p"), P(None, None, "p")),
            out_specs=(P(None, "p"), P(None, "p")), check_vma=False))(*got)

        def unfused_inv(a, b):
            a, b = p3.fft_axis_planar(a, b, axis=1, inverse=True)
            a = jax.lax.all_to_all(a, "p", 1, 2, tiled=True)
            b = jax.lax.all_to_all(b, "p", 1, 2, tiled=True)
            return a, b

        ri = jax.jit(jax.shard_map(
            unfused_inv, mesh=mesh, in_specs=(P(None, None, "p"),
                                              P(None, None, "p")),
            out_specs=(P(None, "p"), P(None, "p")), check_vma=False))(*ref)
        for g, rf in zip(gi, ri):
            scale = np.abs(np.asarray(rf)).max()
            assert np.abs(np.asarray(g) - np.asarray(rf)).max() < 1e-5 * scale
        # and the fused round trip returns the input
        for g, x0 in zip(gi, (yr, yi)):
            assert np.abs(np.asarray(g) - x0).max() < 2e-5 * np.abs(x0).max()


def test_line_rdma_transform_vs_numpy(rng, monkeypatch):
    """2D line transform over the RDMA transpose (generic _stage branch)."""
    from jax.experimental.pallas import tpu as pltpu
    from mpifft4py_tpu import line

    monkeypatch.setenv("MPIFFT4PY_TPU_PALLAS_DIST", "force")
    shape = (16, 256)
    with pltpu.force_tpu_interpret_mode():
        FFT = line.R2C(np.array(shape), np.array([TAU] * 2), 4, "single",
                       communication="rdma")
        u = rng.standard_normal(shape).astype(np.float32)
        fu = np.asarray(FFT.fft2(FFT.shard_real(u)))
        ref = np.fft.rfft2(u.astype(np.float64))
        assert np.abs(fu[:, :FFT.Nf] - ref).max() / np.abs(ref).max() < 2e-6
        ub = np.asarray(FFT.ifft2(FFT.shard_complex(fu)))
        assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


@pytest.mark.parametrize("mode", ["db", "paced"])
def test_fused_kernel_alt_schedules(rng, monkeypatch, mode):
    """The pod-scale megakernel schedules that default hardware runs don't
    exercise (code-review r3): the opt-in double-buffered tile staging
    (MPIFFT4PY_TPU_RDMA_DB=1) and the paced DMA-posting branch (engaged when
    nc·P·2 exceeds the in-flight budget) must match the unfused path."""
    from mpifft4py_tpu.parallel import rdma
    from mpifft4py_tpu.parallel.rdma import fused_transpose_fft_x
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    if mode == "db":
        monkeypatch.setenv("MPIFFT4PY_TPU_RDMA_DB", "1")
    else:
        monkeypatch.setattr(rdma, "_post_depth", lambda nc, P: 1)

    Pn, nchunks = 4, 4
    mesh = Mesh(np.array(jax.devices()[:Pn]), ("p",))
    N0, N1, h = 16, 16, 256
    yr = rng.standard_normal((N0, N1, h)).astype(np.float32)
    yi = rng.standard_normal((N0, N1, h)).astype(np.float32)

    def fused(a, b):
        return fused_transpose_fft_x(a, b, "p", Pn, nchunks=nchunks,
                                     interpret=True)

    def unfused(a, b):
        a = jax.lax.all_to_all(a, "p", 1, 0, tiled=True)
        b = jax.lax.all_to_all(b, "p", 1, 0, tiled=True)
        return p3.fft_axis_planar(a, b, axis=0)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.shard_map(
            fused, mesh=mesh, in_specs=(P("p"), P("p")),
            out_specs=(P(None, "p"), P(None, "p")), check_vma=False))(
            jnp.asarray(yr), jnp.asarray(yi))
        ref = jax.jit(jax.shard_map(
            unfused, mesh=mesh, in_specs=(P("p"), P("p")),
            out_specs=(P(None, "p"), P(None, "p")), check_vma=False))(
            jnp.asarray(yr), jnp.asarray(yi))
    for g, rf in zip(got, ref):
        scale = np.abs(np.asarray(rf)).max()
        assert np.abs(np.asarray(g) - np.asarray(rf)).max() < 1e-5 * scale


def test_fused_inv_db_schedule(rng, monkeypatch):
    """Double-buffered staging on the inverse megakernel too."""
    from mpifft4py_tpu.parallel.rdma import fused_ifft_x_transpose
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    monkeypatch.setenv("MPIFFT4PY_TPU_RDMA_DB", "1")
    Pn = 4
    mesh = Mesh(np.array(jax.devices()[:Pn]), ("p",))
    N0, N1, h = 16, 16, 256
    yr = rng.standard_normal((N0, N1 // Pn, h)).astype(np.float32)
    yi = rng.standard_normal((N0, N1 // Pn, h)).astype(np.float32)

    def fused(a, b):
        return fused_ifft_x_transpose(a, b, "p", Pn, nchunks=4,
                                      interpret=True)

    def unfused(a, b):
        a, b = p3.fft_axis_planar(a, b, axis=0, inverse=True)
        a = jax.lax.all_to_all(a, "p", 0, 1, tiled=True)
        b = jax.lax.all_to_all(b, "p", 0, 1, tiled=True)
        return a, b

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.shard_map(
            fused, mesh=mesh, in_specs=(P(None, "p"), P(None, "p")),
            out_specs=(P("p"), P("p")), check_vma=False))(
            jnp.asarray(yr), jnp.asarray(yi))[:2]
        ref = jax.jit(jax.shard_map(
            unfused, mesh=mesh, in_specs=(P(None, "p"), P(None, "p")),
            out_specs=(P("p"), P("p")), check_vma=False))(
            jnp.asarray(yr), jnp.asarray(yi))
    for g, rf in zip(got, ref):
        scale = np.abs(np.asarray(rf)).max()
        assert np.abs(np.asarray(g) - np.asarray(rf)).max() < 1e-5 * scale


@pytest.mark.parametrize("chunks", [2, 4])
def test_rdma_chunked_matches_lax_all_to_all(rng, chunks):
    """k concurrent sub-copies per peer block (MPIFFT4PY_TPU_RDMA_CHUNKS
    lever) carry the same all-to-all semantics as the single-descriptor
    path."""
    mesh = Mesh(np.array(jax.devices()[:4]), ("p",))
    x = jnp.asarray(rng.standard_normal((8, 32, 8)).astype(np.float32))
    f = jax.jit(jax.shard_map(
        lambda v: rdma_all_to_all(v, "p", 1, 0, 4, interpret=True,
                                  chunks=chunks),
        mesh=mesh, in_specs=P(None, "p", None), out_specs=P("p", None, None),
        check_vma=False))
    ref = jax.jit(jax.shard_map(
        lambda v: jax.lax.all_to_all(v, "p", 1, 0, tiled=True),
        mesh=mesh, in_specs=P(None, "p", None), out_specs=P("p", None, None),
        check_vma=False))
    assert np.array_equal(np.asarray(f(x)), np.asarray(ref(x)))
