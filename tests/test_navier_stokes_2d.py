"""2D vorticity-form NS over line.R2C (the 2D transform family consumer)."""

import numpy as np
import pytest

from mpifft4py_tpu import line
from mpifft4py_tpu.models.navier_stokes_2d import NavierStokes2D

TAU = 2 * np.pi


@pytest.mark.parametrize("P", [1, 4])
def test_vortex_pair_decays(P):
    N = 64
    FFT = line.R2C(np.array([N, N]), np.array([TAU, TAU]), P, "double")
    s = NavierStokes2D(FFT, nu=1e-3, dt=5e-3)
    w = s.vortex_pair()
    e0 = s.enstrophy(w)
    assert e0 > 0
    for _ in range(3):
        w = s.step(w)
    e1 = s.enstrophy(w)
    assert np.isfinite(e1) and e1 < e0  # viscous enstrophy decay


def test_serial_parallel_agree():
    N = 32
    r1 = line.R2C(np.array([N, N]), np.array([TAU, TAU]), 1, "double")
    r4 = line.R2C(np.array([N, N]), np.array([TAU, TAU]), 4, "double")
    s1, s4 = NavierStokes2D(r1, 1e-3, 5e-3), NavierStokes2D(r4, 1e-3, 5e-3)
    w1 = s1.step(s1.vortex_pair())
    w4 = s4.step(s4.vortex_pair())
    a = np.asarray(w1)[:, :r1.Nf]
    b = np.asarray(w4)[:, :r4.Nf]
    assert np.allclose(a, b, atol=1e-10)
