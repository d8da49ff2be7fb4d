"""Flagship DNS model: Taylor–Green vortex on slab and pencil decompositions.

Integration test in the reference consumer's pattern (SURVEY.md §3.5): ~24
distributed transforms per RK4 step, driven as one jitted SPMD program.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mpifft4py_tpu import slab, pencil
from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

TAU = 2 * np.pi


def _solver(kind, P, dealias="2/3-rule"):
    N = np.array([16, 16, 16])
    L = np.array([TAU] * 3)
    if kind == "slab":
        FFT = slab.R2C(N, L, P, "double")
    else:
        FFT = pencil.R2C(N, L, P, "double", P1=2)
    return NavierStokes3D(FFT, nu=0.000625, dt=0.01, dealias=dealias)


@pytest.mark.parametrize("kind,P", [("slab", 1), ("slab", 4), ("pencil", 8)])
def test_taylor_green_energy(kind, P):
    s = _solver(kind, P)
    U_hat = s.taylor_green()
    e0 = s.energy(U_hat)
    assert abs(e0 - 0.125) < 1e-10  # analytic TG initial energy
    U1 = s.step(U_hat)
    e1 = s.energy(U1)
    assert e1 < e0  # viscous decay
    assert e0 - e1 < 1e-3  # but tiny over one small dt
    # divergence-free is preserved
    div = jnp.sum(s.K * U1, axis=0)
    assert float(jnp.abs(div).max()) < 1e-10


def test_slab_pencil_agree():
    """Same physics on 1D and 2D decompositions must agree to roundoff."""
    s1 = _solver("slab", 4)
    s2 = _solver("pencil", 8)
    U1 = s1.step(s1.taylor_green())
    U2 = s2.step(s2.taylor_green())
    a = np.asarray(U1)
    b = np.asarray(U2)[..., :s2.Nf if hasattr(s2, "Nf") else a.shape[-1]]
    b = np.asarray(U2)[..., :s2.FFT.Nf]
    assert np.allclose(a, b, atol=1e-10)


def test_run_scan():
    s = _solver("slab", 2)
    U = s.run(s.taylor_green(), 3)
    e = s.energy(U)
    assert np.isfinite(e) and e < 0.125


def _solver_integ(integrator, dt=0.01):
    N = np.array([16, 16, 16])
    FFT = slab.R2C(N, np.array([TAU] * 3), 1, "double")
    return NavierStokes3D(FFT, nu=0.000625, dt=dt, dealias="2/3-rule",
                          integrator=integrator)


def test_lsrk54_matches_rk4():
    """Carpenter–Kennedy 2N-storage RK4(5) is 4th order like classical RK4:
    one TG step must agree to far below the O(dt⁵) local error."""
    rk4 = _solver_integ("RK4")
    ls = _solver_integ("LSRK54")
    U1 = rk4.step(rk4.taylor_green())
    U2 = ls.step(ls.taylor_green())
    assert np.allclose(np.asarray(U1), np.asarray(U2), atol=1e-9)
    # multi-step under lax.scan too
    e1 = rk4.energy(rk4.run(rk4.taylor_green(), 3))
    e2 = ls.energy(ls.run(ls.taylor_green(), 3))
    assert abs(e1 - e2) < 1e-9 and e1 < 0.125


def test_euler_first_order_decay():
    s = _solver_integ("Euler", dt=0.002)
    U1 = s.step(s.taylor_green())
    e1 = s.energy(U1)
    assert 0 < e1 < 0.125
    div = jnp.sum(s.K * U1, axis=0)
    assert float(jnp.abs(div).max()) < 1e-10


def test_ab2_state_and_steps():
    """AB2 carries (U, f_prev); step 1 is the Euler seed, step 2 is genuine
    Adams–Bashforth.  Compare against a hand-rolled two-step AB2."""
    s = _solver_integ("AB2", dt=0.002)
    U0 = s.taylor_green()
    st = s.ab2_state(U0)
    st1 = s.step(st)
    st2 = s.step(st1)
    U2, _ = st2
    # hand-rolled: f0 = rhs(U0); U1 = U0 + dt f0 (seed); f1 = rhs(U1);
    # U2 = U1 + dt(1.5 f1 - 0.5 f0)
    f0 = s.rhs_with_state(U0)
    U1h = U0 + s.dt * f0
    assert np.allclose(np.asarray(st1[0]), np.asarray(U1h), atol=1e-12)
    f1 = s.rhs_with_state(U1h)
    U2h = U1h + s.dt * (1.5 * f1 - 0.5 * f0)
    assert np.allclose(np.asarray(U2), np.asarray(U2h), atol=1e-12)
    assert s.energy(U2) < 0.125


def test_bad_integrator_raises():
    with pytest.raises(ValueError):
        _solver_integ("RK3")


def test_padded_dealias_matches_mask_dealias():
    """3/2-rule and 2/3-rule give close (not identical) results; both stable."""
    s23 = _solver("slab", 2, "2/3-rule")
    s32 = _solver("slab", 2, "3/2-rule")
    U23 = s23.step(s23.taylor_green())
    U32 = s32.step(s32.taylor_green())
    # TG at t=0 has only low modes: no aliasing yet, so results nearly agree
    assert np.allclose(np.asarray(U23), np.asarray(U32), atol=1e-8)


def test_forced_turbulence_energy_balance():
    """Constant-energy-injection band forcing: dE/dt = eps - dissipation.
    With nu=0, the energy grows by exactly eps*dt per unit time (to RK4
    accuracy); with forcing off nothing changes."""
    N = np.array([16, 16, 16])
    FFT = slab.R2C(N, np.array([TAU] * 3), 1, "double")
    eps = 0.01
    s = NavierStokes3D(FFT, nu=0.0, dt=0.002, dealias="2/3-rule",
                       forcing_band=(0.5, 3.5), forcing_rate=eps)
    U = s.taylor_green()
    e0 = s.energy(U)
    nsteps = 5
    for _ in range(nsteps):
        U = s.step(U)
    e1 = s.energy(U)
    # inviscid + forced: dE/dt == eps (nonlinear term conserves energy)
    assert abs((e1 - e0) - eps * s.dt * nsteps) < 1e-8
    # divergence-free preserved under forcing (forcing is parallel to u_hat)
    import jax.numpy as jnp
    div = jnp.sum(s.K * U, axis=0)
    assert float(jnp.abs(div).max()) < 1e-10
    # forced viscous run reaches a statistically steady balance direction:
    # energy decays slower than unforced
    sf = NavierStokes3D(FFT, nu=0.01, dt=0.002, dealias="2/3-rule",
                        forcing_band=(0.5, 3.5), forcing_rate=eps)
    su = NavierStokes3D(FFT, nu=0.01, dt=0.002, dealias="2/3-rule")
    ef = sf.energy(sf.run(sf.taylor_green(), 5))
    eu = su.energy(su.run(su.taylor_green(), 5))
    assert ef > eu


def test_forcing_distributed_matches_serial():
    """The band-energy reduction inside the forced RHS is a global sum over
    the sharded spectrum — P=4 must match P=1 to roundoff."""
    N = np.array([16, 16, 16])
    L = np.array([TAU] * 3)
    kw = dict(nu=0.001, dt=0.002, dealias="2/3-rule",
              forcing_band=(0.5, 3.5), forcing_rate=0.02)
    s1 = NavierStokes3D(slab.R2C(N, L, 1, "double"), **kw)
    s4 = NavierStokes3D(slab.R2C(N, L, 4, "double"), **kw)
    U1 = s1.step(s1.taylor_green())
    U4 = s4.step(s4.taylor_green())
    assert np.allclose(np.asarray(U1), np.asarray(U4), atol=1e-12)


def test_run_with_monitor_trace():
    """run(..., monitor_every=k) returns (final, trace) with the in-scan
    Parseval energies matching eagerly-stepped energies; the final state is
    bit-identical to the unmonitored run."""
    N = np.array([16, 16, 16])
    FFT = slab.R2C(N, np.array([TAU] * 3), 4, "double")
    s = NavierStokes3D(FFT, nu=1e-3, dt=0.005, dealias="2/3-rule")
    V = s.taylor_green()
    es = []
    for i in range(1, 5):
        V = s.step(V)
        if i % 2 == 0:
            es.append(s.energy(V))
    final, trace = s.run(s.taylor_green(), 4, monitor_every=2)
    assert trace.shape == (2,)
    assert np.allclose(np.asarray(trace), es, rtol=1e-12)
    assert np.abs(FFT.gather(final) - FFT.gather(V)).max() == 0.0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="divisible"):
        s.run(s.taylor_green(), 5, monitor_every=2)
