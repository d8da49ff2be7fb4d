"""Streaming-fold RHS API (round 5): the integrator folds per-slice RHS
pieces into the accumulator in place, so the full (C, …) RHS stack never
materialises — the MHD-512³ LSRK54 / Bq-512³ RK4 single-chip enabler
(VERDICT r4 item 1; BENCH.md round-4 "anatomy of the LSRK54 miss").

These verify bitwise-class parity of the fold integrators against the
classical stacked path in interpret mode; the HBM claims are validated by
the AOT memory ledger on chip (benchmarks/memory_ledger.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mpifft4py_tpu import slab
from mpifft4py_tpu.models.boussinesq import Boussinesq3D
from mpifft4py_tpu.models.mhd import MHD3D
from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

TAU = 2 * np.pi
SHAPE = (16, 16, 256)


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("MPIFFT4PY_TPU_PALLAS_DIST", "force")
    with pltpu.force_tpu_interpret_mode():
        yield


def _fft():
    return slab.R2C(np.array(SHAPE), np.array([TAU] * 3), 1, "single")


def _step_pair(make, monkeypatch, integrator):
    """(classical step, fold step) of the same model/IC/integrator."""
    FFT = _fft()
    monkeypatch.setenv("MPIFFT4PY_TPU_RHS_FOLD", "0")
    ref_solver, U0 = make(FFT, integrator)
    assert not ref_solver._rhs_fold_on()
    ref = ref_solver.step(U0)
    monkeypatch.setenv("MPIFFT4PY_TPU_RHS_FOLD", "1")
    fold_solver, U1 = make(FFT, integrator)
    assert fold_solver._rhs_fold_on()
    got = fold_solver.step(U1)
    return ref, got


def _assert_close(ref, got, tol=2e-5):
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        scale = max(np.abs(r).max(), 1e-30)
        assert np.abs(g - r).max() / scale < tol


def _mhd(FFT, integrator):
    s = MHD3D(FFT, nu=0.01, eta=0.02, dt=1e-3, dealias="2/3-rule",
              spectral_layout="packed", integrator=integrator)
    return s, s.taylor_green_mhd()


def _bq(FFT, integrator):
    s = Boussinesq3D(FFT, nu=0.01, kappa=0.005, dt=1e-3, Ri=0.5,
                     dealias="2/3-rule", spectral_layout="packed",
                     integrator=integrator)
    return s, s.taylor_green_stratified()


@pytest.mark.parametrize("integrator", ["LSRK54", "RK4"])
def test_mhd_fold_matches_classical(rng, monkeypatch, integrator):
    ref, got = _step_pair(_mhd, monkeypatch, integrator)
    _assert_close(ref, got)


@pytest.mark.parametrize("integrator", ["LSRK54", "RK4"])
def test_bq_fold_matches_classical(rng, monkeypatch, integrator):
    ref, got = _step_pair(_bq, monkeypatch, integrator)
    _assert_close(ref, got)


def _ns(FFT, integrator):
    s = NavierStokes3D(FFT, nu=0.01, dt=1e-3, dealias="2/3-rule",
                       spectral_layout="packed", integrator=integrator)
    return s, s.taylor_green()


def _vv(FFT, integrator):
    from mpifft4py_tpu.models.vv import VorticityVelocity3D
    s = VorticityVelocity3D(FFT, nu=0.01, dt=1e-3, dealias="2/3-rule",
                            spectral_layout="packed", integrator=integrator)
    return s, s.taylor_green()


@pytest.mark.parametrize("make", [_ns, _vv], ids=["ns", "vv"])
def test_streamed_fold_matches_classical(rng, monkeypatch, make):
    """The per-component streamed fold (incremental Leray divisor / curl
    contributions folded as adds) == the classical stacked LSRK54 step."""
    FFT = _fft()
    monkeypatch.setenv("MPIFFT4PY_TPU_NL_STREAM", "0")
    monkeypatch.setenv("MPIFFT4PY_TPU_RHS_FOLD", "0")
    ref_solver, U0 = make(FFT, "LSRK54")
    ref = ref_solver.step(U0)
    monkeypatch.setenv("MPIFFT4PY_TPU_NL_STREAM", "1")
    monkeypatch.setenv("MPIFFT4PY_TPU_RHS_FOLD", "1")
    fold_solver, U1 = make(FFT, "LSRK54")
    assert fold_solver._rhs_fold_on() and fold_solver._nl_stream_on()
    assert len(fold_solver._fold_slices()) == 3
    got = fold_solver.step(U1)
    _assert_close(ref, got)


def test_fold_gate_defaults():
    """auto gate: off below the ~2 GB pair threshold, on above; models
    without a fold path never engage."""
    FFT = _fft()
    mhd = MHD3D(FFT, nu=0.01, eta=0.02, dt=1e-3, dealias="2/3-rule",
                spectral_layout="packed", integrator="LSRK54")
    assert not mhd._rhs_fold_on()        # (16,16,256) is tiny
    ns = NavierStokes3D(FFT, nu=0.01, dt=1e-3, dealias="2/3-rule",
                        spectral_layout="packed", integrator="LSRK54")
    assert not ns._rhs_fold_on()         # below the size threshold
    ns_forced = NavierStokes3D(FFT, nu=0.01, dt=1e-3, dealias="2/3-rule",
                               spectral_layout="packed", integrator="LSRK54",
                               forcing_band=(1.0, 2.0), forcing_rate=0.1)
    assert ns_forced._fold_slices() is None   # band forcing: no fold path
    # the >2GB arithmetic (no FFT construction at 512³ needed: fake N)
    mhd.FFT = type("F", (), {"N": np.array([512, 512, 512])})()
    assert mhd._rhs_fold_on()
    mhd.integrator = "Euler"
    assert not mhd._rhs_fold_on()        # fold is an LSRK54/RK4 path
