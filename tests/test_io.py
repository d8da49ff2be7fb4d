"""Checkpoint I/O: save/restore fields and DNS state across shardings."""

import numpy as np
import pytest

from mpifft4py_tpu import slab, pencil
from mpifft4py_tpu.utils import io

TAU = 2 * np.pi


def test_save_load_field_roundtrip(rng, tmp_path):
    N = 16
    FFT = slab.R2C(np.array([N] * 3), np.array([TAU] * 3), 4, "double")
    u = rng.standard_normal((N, N, N))
    fu = FFT.fftn(u)
    p = str(tmp_path / "f.npz")
    io.save_field(p, FFT, fu)
    back = io.load_field(p, FFT)
    assert np.abs(FFT.gather(back) - FFT.gather(fu)).max() == 0
    # physical field too
    io.save_field(p, FFT, FFT.shard_real(u))
    ub = io.load_field(p, FFT)
    assert np.abs(FFT.gather(ub) - u).max() == 0


def test_save_load_state_stack(rng, tmp_path):
    """(3,)+spectral stacks get a None-padded sharding on reload."""
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    N = 16
    FFT = pencil.R2C(np.array([N] * 3), np.array([TAU] * 3), 8, "double", P1=2)
    s = NavierStokes3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule")
    U = s.taylor_green()
    p = str(tmp_path / "state.npz")
    io.save_state(p, FFT, U, step=7, t=0.007)
    U2, meta = io.load_state(p, FFT)
    assert int(meta["step"]) == 7
    assert np.abs(FFT.gather(U2) - FFT.gather(U)).max() == 0
    # restored state must actually run
    e1 = s.energy(s.step(U))
    e2 = s.energy(s.step(U2))
    assert abs(e1 - e2) < 1e-12


def test_load_rejects_wrong_grid(rng, tmp_path):
    N = 16
    FFT = slab.R2C(np.array([N] * 3), np.array([TAU] * 3), 2, "double")
    p = str(tmp_path / "f.npz")
    io.save_field(p, FFT, FFT.shard_real(rng.standard_normal((N, N, N))))
    FFT2 = slab.R2C(np.array([32] * 3), np.array([TAU] * 3), 2, "double")
    with pytest.raises(ValueError, match="grid"):
        io.load_field(p, FFT2)


def test_doubleword_state_io(rng, tmp_path):
    N = 16
    FFT = slab.R2C(np.array([N] * 3), np.array([TAU] * 3), 2, "double",
                   fp64_mode="doubleword")
    u = rng.standard_normal((N, N, N))
    fu = FFT.fftn(u)
    p = str(tmp_path / "dd.npz")
    io.save_field(p, FFT, fu)
    back = io.load_field(p, FFT)
    assert np.abs(FFT.gather_dd(back) - FFT.gather_dd(fu)).max() == 0
