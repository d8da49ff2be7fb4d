"""Energy spectrum / dissipation diagnostics + inviscid conservation physics."""

import numpy as np
import pytest

from mpifft4py_tpu import slab
from mpifft4py_tpu.models.navier_stokes import NavierStokes3D
from mpifft4py_tpu.models.diagnostics import energy_spectrum, dissipation

TAU = 2 * np.pi


def test_spectrum_parseval_consistent():
    N = 16
    FFT = slab.R2C(np.array([N] * 3), np.array([TAU] * 3), 4, "double")
    s = NavierStokes3D(FFT, nu=0.01, dt=0.01)
    U = s.taylor_green()
    E = energy_spectrum(FFT, U)
    # TG energy = 0.125, concentrated in the |k| ≈ sqrt(3) shell
    assert abs(E.sum() - 0.125) < 1e-8
    assert E[2] > 0.9 * E.sum()  # round(sqrt(3)) = 2
    eps = dissipation(FFT, U, nu=0.01)
    assert eps > 0


def test_spectrum_packed_matches_complex(rng, monkeypatch):
    """energy_spectrum_packed on the (Sr, Si) pair == energy_spectrum on the
    unpacked complex state (packed layout needs (N2/2) % 128 == 0)."""
    from jax.experimental.pallas import tpu as pltpu
    from mpifft4py_tpu.models.diagnostics import energy_spectrum_packed

    monkeypatch.setenv("MPIFFT4PY_TPU_PALLAS_DIST", "force")
    with pltpu.force_tpu_interpret_mode():
        shape = (16, 16, 256)
        FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 4, "single")
        s = NavierStokes3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule",
                           spectral_layout="packed")
        U = s.step(s.taylor_green())      # one step: fill more shells
        Ep = energy_spectrum_packed(FFT, U)
        Ec = energy_spectrum(FFT, s.from_packed(U))
        assert Ep.shape == Ec.shape
        assert np.abs(Ep - Ec).max() < 1e-10 * max(Ec.max(), 1e-30)
        assert abs(Ep.sum() - s.energy(U)) < 1e-9
        from mpifft4py_tpu.models.diagnostics import dissipation_packed
        ep = dissipation_packed(FFT, U, nu=0.01)
        ec = dissipation(FFT, s.from_packed(U), nu=0.01)
        assert abs(ep - ec) < 1e-9 * max(abs(ec), 1e-30)
        # solver-level dispatch mirrors both paths
        assert np.abs(s.spectrum(U) - Ep).max() == 0.0
        s2 = NavierStokes3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule")
        U2 = s2.taylor_green()
        assert np.abs(s2.spectrum(U2)
                      - np.asarray(energy_spectrum(FFT, U2))).max() == 0.0


def test_inviscid_energy_conservation():
    """nu = 0, dealiased: RK4 conserves energy to integrator order."""
    N = 16
    FFT = slab.R2C(np.array([N] * 3), np.array([TAU] * 3), 2, "double")
    s = NavierStokes3D(FFT, nu=0.0, dt=0.005, dealias="2/3-rule")
    U = s.taylor_green()
    e0 = s.energy(U)
    for _ in range(10):
        U = s.step(U)
    e1 = s.energy(U)
    assert abs(e1 - e0) / e0 < 1e-9   # conservative to RK4 truncation order


def test_hermitian_weights_pencil_full_padding(rng):
    """Regression (r2 review): pencil with Nfp == N (alignment padding fills
    the axis) must still get r2c weights, not the c2c unit weights."""
    from mpifft4py_tpu import pencil
    from mpifft4py_tpu.models.diagnostics import _hermitian_weights

    N = 16
    FFT = pencil.R2C(np.array([N] * 3), np.array([2 * np.pi] * 3), 8,
                     "double", P1=1)  # P2=8: Nfp = ceil(9/8)*8 = 16 == N
    assert FFT.Nfp == N
    w = np.asarray(_hermitian_weights(FFT))
    assert w[0] == 1.0 and w[N // 2] == 1.0
    assert np.all(w[1:N // 2] == 2.0)
    assert np.all(w[FFT.Nf:] == 0.0)
