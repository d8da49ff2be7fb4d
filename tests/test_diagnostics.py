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
