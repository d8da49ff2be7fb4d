"""Distributed Pallas pipeline parity (interpret mode, 8-device CPU mesh).

VERDICT r1 item 2: the MXU fast tier must serve every rank's local stages,
not just the P==1 shortcut.  These run slab.R2C with the packed-planar
distributed pipeline forced on (MPIFFT4PY_TPU_PALLAS_DIST=force) under
pltpu.force_tpu_interpret_mode, against numpy oracles — real collectives,
interpreted kernels.  On-chip perf of the same program: bench.py with
MPIFFT4PY_TPU_FORCE_DIST=1 (recorded in BENCH.md).
"""

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from mpifft4py_tpu import slab, pencil

TAU = 2 * np.pi


@pytest.fixture(autouse=True)
def _force_dist(monkeypatch):
    monkeypatch.setenv("MPIFFT4PY_TPU_PALLAS_DIST", "force")
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("shape", [(16, 16, 256), (16, 128, 256)])
@pytest.mark.parametrize("P", [2, 4])  # P=8: the Mosaic interpreter deadlocks
def test_slab_dist_pallas_vs_numpy(rng, shape, P):
    """(16,128,256) engages the fused z+y kernel; (16,16,256) the separate
    packed-rfft + factored-y path.  Both must match numpy through the real
    all-to-all + plane-0 all-gather epilogue."""
    N = np.array(shape)
    FFT = slab.R2C(N, np.array([TAU] * 3), P, "single")
    assert FFT._pallas_dist_ok(None)
    u = rng.standard_normal(shape).astype(np.float32)
    fu = np.asarray(FFT.fftn(FFT.shard_real(u)))
    ref = np.fft.rfftn(u.astype(np.float64))
    assert np.abs(fu - ref).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(FFT.ifftn(FFT.shard_complex(fu)))
    assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


def test_slab_dist_pallas_dealias(rng):
    shape = (16, 16, 256)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 4, "single")
    u = rng.standard_normal(shape).astype(np.float32)
    fu = np.asarray(FFT.fftn(FFT.shard_real(u), dealias="2/3-rule"))
    ref = np.fft.rfftn(u.astype(np.float64))
    filt = np.asarray(FFT.get_dealias_filter()).astype(bool)
    refm = np.where(filt, ref, 0)
    assert np.abs(fu - refm).max() / np.abs(ref).max() < 2e-6


def test_fields_fn_matches_per_component(rng):
    """forward/backward_fields_fn == stacked per-component transforms
    (both the loop default at P>1 and the batched MXU path shape-wise)."""
    shape = (16, 16, 256)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 4, "single")
    U = rng.standard_normal((3,) + shape).astype(np.float32)
    Us = FFT.shard_real(U[0]), FFT.shard_real(U[1]), FFT.shard_real(U[2])
    import jax.numpy as jnp
    got = np.asarray(FFT.forward_fields_fn()(jnp.stack(Us)))
    ref = np.stack([np.asarray(FFT.fftn(Us[i])) for i in range(3)])
    assert np.abs(got - ref).max() <= 1e-5 * np.abs(ref).max()
    back = np.asarray(FFT.backward_fields_fn()(jnp.asarray(got)))
    assert np.abs(back - U).max() / np.abs(U).max() < 3e-6


def test_batched_kernels_vs_numpy(rng):
    """Leading-dim batching of the packed 3D kernel chain (rfft3d/irfft3d)."""
    import jax.numpy as jnp
    from mpifft4py_tpu.ops import pallas_fft3d as p3

    u = rng.standard_normal((2, 8, 16, 256)).astype(np.float32)
    fu = np.asarray(p3.rfft3d(jnp.asarray(u)))
    ref = np.fft.rfftn(u.astype(np.float64), axes=(1, 2, 3))
    assert np.abs(fu - ref).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(p3.irfft3d(jnp.asarray(fu.astype(np.complex64)),
                               (8, 16, 256)))
    assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


@pytest.mark.parametrize("dealias", [None, "2/3-rule"])
def test_pencil_dist_pallas_vs_numpy(rng, dealias):
    """Pencil planar MXU local stages through both grouped all-to-alls."""
    shape = (16, 16, 256)
    FFT = pencil.R2C(np.array(shape), np.array([TAU] * 3), 4, "single", P1=2)
    assert FFT._pallas_dist_ok(dealias)
    u = rng.standard_normal(shape).astype(np.float32)
    fu = np.asarray(FFT.fftn(FFT.shard_real(u), dealias=dealias))
    ref = np.fft.rfftn(u.astype(np.float64))
    if dealias == "2/3-rule":
        filt = np.asarray(FFT.get_dealias_filter()).astype(bool)
        ref = np.where(filt[..., :FFT.Nf], ref, 0)
    assert np.abs(fu[..., :FFT.Nf] - ref).max() / np.abs(ref).max() < 2e-6
    assert np.all(fu[..., FFT.Nf:] == 0)
    if dealias is None:
        ub = np.asarray(FFT.ifftn(FFT.shard_complex(fu)))
        assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


def test_pencil_p2_1_packed_vs_numpy(rng):
    """P2 == 1 collapses pencil to slab's single transpose: the packed-
    Hermitian pipeline (_PackedDist1D) must engage and match numpy."""
    shape = (16, 16, 256)
    FFT = pencil.R2C(np.array(shape), np.array([TAU] * 3), 4, "single", P1=4)
    assert FFT.P2 == 1 and FFT._packed_dist_ok(None)
    assert FFT.Nfp == FFT.Nf  # no alignment padding when P2 == 1
    u = rng.standard_normal(shape).astype(np.float32)
    fu = np.asarray(FFT.fftn(FFT.shard_real(u)))
    ref = np.fft.rfftn(u.astype(np.float64))
    assert np.abs(fu - ref).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(FFT.ifftn(FFT.shard_complex(fu)))
    assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


def test_line_dist_pallas_vs_numpy(rng):
    """2D line transform's distributed MXU local stages (block-chunked a2a)."""
    from mpifft4py_tpu import line

    shape = (16, 256)
    FFT = line.R2C(np.array(shape), np.array([TAU] * 2), 4, "single")
    assert FFT._pallas_dist_ok(None)
    u = rng.standard_normal(shape).astype(np.float32)
    fu = np.asarray(FFT.fft2(FFT.shard_real(u)))
    ref = np.fft.rfft2(u.astype(np.float64))
    assert np.abs(fu[:, :FFT.Nf] - ref).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(FFT.ifft2(FFT.shard_complex(fu)))
    assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


def test_c2c_dist_pallas_vs_numpy(rng):
    """Distributed planar c2c pipeline (no packed riders) vs numpy."""
    shape = (16, 16, 256)
    FFT = slab.C2C(np.array(shape), np.array([TAU] * 3), 4, "single")
    assert FFT._pallas_dist_ok(None)
    u = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    fu = np.asarray(FFT.fftn(FFT.shard_real(u)))
    ref = np.fft.fftn(u.astype(np.complex128))
    assert np.abs(fu - ref).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(FFT.ifftn(FFT.shard_complex(fu)))
    assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


def test_slab_dist_pallas_pipelined(rng):
    """Planar pair rides the chunked (pipelined) transpose identically."""
    shape = (16, 16, 256)
    dense = slab.R2C(np.array(shape), np.array([TAU] * 3), 4, "single")
    piped = slab.R2C(np.array(shape), np.array([TAU] * 3), 4, "single",
                     communication="pipelined", pipeline_chunks=2)
    u = rng.standard_normal(shape).astype(np.float32)
    fu_d = np.asarray(dense.fftn(dense.shard_real(u)))
    fu_p = np.asarray(piped.fftn(piped.shard_real(u)))
    assert np.abs(fu_p - fu_d).max() <= 1e-4 * np.abs(fu_d).max()


# -- 3/2-rule padded distributed MXU tier (VERDICT r2 next-step 4) -----------


@pytest.mark.parametrize("P", [2, 4])
def test_slab_dist_pallas_padded(rng, P):
    """Padded (3/2-rule) transforms through the planar MXU distributed
    pipeline: fftn(3/2) ∘ ifftn(3/2) is identity on the spectrum, and the
    padded physical field matches the XLA tier."""
    import os

    shape = (16, 16, 256)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), P, "single")
    assert FFT._pallas_dist_padded_ok()
    u = rng.standard_normal(shape).astype(np.float32)
    fu = np.asarray(FFT.fftn(FFT.shard_real(u)))
    up = FFT.ifftn(FFT.shard_complex(fu), dealias="3/2-rule")
    fu2 = np.asarray(FFT.fftn(up, dealias="3/2-rule"))
    assert np.abs(fu2 - fu).max() / np.abs(fu).max() < 2e-6
    os.environ["MPIFFT4PY_TPU_PALLAS"] = "0"
    try:
        Fx = slab.R2C(np.array(shape), np.array([TAU] * 3), P, "single")
        upx = np.asarray(Fx.ifftn(Fx.shard_complex(fu), dealias="3/2-rule"))
    finally:
        del os.environ["MPIFFT4PY_TPU_PALLAS"]
    assert np.abs(np.asarray(up) - upx).max() / np.abs(upx).max() < 2e-6


@pytest.mark.parametrize("alignment", ["X", "Y"])
def test_pencil_dist_planar_alignment_padded(rng, alignment):
    """Pencil planar MXU tier now serves BOTH alignments (VERDICT r2
    missing #5) and the padded variant; small grid keeps interpret fast."""
    shape = (16, 16, 16)
    FFT = pencil.R2C(np.array(shape), np.array([TAU] * 3), 8, "single",
                     P1=2, alignment=alignment)
    assert FFT._pallas_dist_ok(None) and FFT._pallas_dist_ok("3/2-rule")
    u = rng.standard_normal(shape).astype(np.float32)
    fu = np.asarray(FFT.fftn(FFT.shard_real(u)))
    ref = np.fft.rfftn(u.astype(np.float64))
    assert np.abs(fu[..., :FFT.Nf] - ref).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(FFT.ifftn(FFT.shard_complex(fu)))
    assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6
    up = FFT.ifftn(FFT.shard_complex(fu), dealias="3/2-rule")
    fu2 = np.asarray(FFT.fftn(up, dealias="3/2-rule"))
    assert np.abs(fu2 - fu).max() / np.abs(fu).max() < 2e-6


def test_pencil_y_p2_1_routes_planar(rng):
    """alignment='Y' with a degenerate P2 must NOT take the slab-collapsed
    packed pipeline (its output is the X/slab spectral layout) — regression
    test for the round-3 gate reshuffle."""
    shape = (16, 16, 256)
    FFT = pencil.R2C(np.array(shape), np.array([TAU] * 3), 4, "single",
                     P1=4, alignment="Y")
    assert FFT.P2 == 1 and not FFT._packed_dist_ok(None)
    u = rng.standard_normal(shape).astype(np.float32)
    fu = np.asarray(FFT.fftn(FFT.shard_real(u)))
    ref = np.fft.rfftn(u.astype(np.float64))
    assert np.abs(fu[..., :FFT.Nf] - ref).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(FFT.ifftn(FFT.shard_complex(fu)))
    assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6
