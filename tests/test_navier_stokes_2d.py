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


def test_2d_integrators_agree():
    """LSRK54 matches RK4 to 4th-order accuracy; AB2 runs via its carry."""
    import numpy as np
    from mpifft4py_tpu import line

    N = np.array([32, 32])
    L = np.array([2 * np.pi] * 2)
    FFT = line.R2C(N, L, 1, "double")
    rk4 = NavierStokes2D(FFT, 1e-3, 5e-3)
    ls = NavierStokes2D(FFT, 1e-3, 5e-3, integrator="LSRK54")
    w1 = rk4.step(rk4.vortex_pair())
    w2 = ls.step(ls.vortex_pair())
    assert np.allclose(np.asarray(w1), np.asarray(w2), atol=1e-9)
    ab = NavierStokes2D(FFT, 1e-3, 5e-3, integrator="AB2")
    st = ab.step(ab.ab2_state(ab.vortex_pair()))
    assert np.isfinite(ab.enstrophy(st[0]))
