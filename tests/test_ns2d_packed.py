"""NS2D packed-pair layout == the complex layout (the 2D analog of the 3D
``spectral_layout="packed"`` fast path), incl. the DIF k1-lane order at
512-class N1.  Kernels run in interpret mode on the CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mpifft4py_tpu import line
from mpifft4py_tpu.models.navier_stokes_2d import NavierStokes2D

TAU = 2 * np.pi


@pytest.fixture(autouse=True)
def _interp():
    with pltpu.force_tpu_interpret_mode():
        yield


def _make(shape, layout, **kw):
    FFT = line.R2C(np.array(shape), np.array([TAU] * 2), 1, "single")
    return NavierStokes2D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule",
                          spectral_layout=layout, **kw)


@pytest.mark.parametrize("shape", [(32, 256), (32, 512)])
def test_ns2d_packed_step_matches_complex(shape):
    """One RK4 step: packed (dif lane order at N1=512) == complex layout."""
    sc = _make(shape, "complex")
    sp = _make(shape, "packed")
    assert sp._dif == (shape[1] >= 512)
    wc = sc.vortex_pair()
    wp = sp.vortex_pair()
    # same state through both layout boundaries
    w0 = np.asarray(sp.unpack_state(wp))
    assert np.abs(w0 - np.asarray(wc)).max() < 1e-5 * np.abs(w0).max()
    wc1 = sc.step(wc)
    wp1 = sp.step(wp)
    got = np.asarray(sp.unpack_state(wp1))
    ref = np.asarray(wc1)
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
    # pack_state is the inverse boundary
    rt = sp.unpack_state(sp.pack_state(jnp.asarray(got)))
    assert np.abs(np.asarray(rt) - got).max() < 1e-6 * np.abs(got).max()


def test_ns2d_packed_run_and_enstrophy():
    """run() (donated scan) advances; enstrophy decays under viscosity and
    matches the complex layout."""
    sc = _make((32, 256), "complex")
    sp = _make((32, 256), "packed")
    wc, wp = sc.vortex_pair(), sp.vortex_pair()
    e0c, e0p = sc.enstrophy(wc), sp.enstrophy(wp)
    assert abs(e0c - e0p) < 1e-5 * abs(e0c)
    out = sp.run(wp, 3)
    for _ in range(3):
        wc = sc.step(wc)
    e1c, e1p = sc.enstrophy(wc), sp.enstrophy(out)
    assert abs(e1c - e1p) < 1e-4 * abs(e1c)
    assert e1p < e0p


def test_ns2d_packed_gate():
    with pytest.raises(ValueError):
        _make((32, 192), "packed")        # h = 96: lane gate fails
    with pytest.raises(ValueError):
        NavierStokes2D(line.R2C(np.array([32, 256]), np.array([TAU] * 2),
                                1, "single"),
                       nu=0.01, dt=0.001, dealias=None,
                       spectral_layout="packed")
