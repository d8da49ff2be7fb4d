"""L1 serial tier vs numpy/scipy oracles (reference test strategy, SURVEY.md §4)."""

import numpy as np
import pytest

from mpifft4py_tpu import serialFFT as sf


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_rfft_family_matches_numpy(rng, dtype):
    u = rng.standard_normal((8, 12, 16)).astype(dtype)
    tol = 1e-5 if dtype == np.float32 else 1e-12
    assert np.allclose(sf.rfft(u), np.fft.rfft(u), atol=tol)
    assert np.allclose(sf.rfft2(u), np.fft.rfft2(u), atol=tol)
    assert np.allclose(sf.rfftn(u), np.fft.rfftn(u), atol=tol)
    fu = np.fft.rfftn(u)
    assert np.allclose(sf.irfftn(fu.astype(np.complex128 if dtype == np.float64
                                           else np.complex64), s=u.shape),
                       u, atol=tol)


def test_cfft_family_matches_numpy(rng):
    u = (rng.standard_normal((8, 8, 8)) + 1j * rng.standard_normal((8, 8, 8)))
    assert np.allclose(sf.fft(u), np.fft.fft(u))
    assert np.allclose(sf.ifft(u), np.fft.ifft(u))
    assert np.allclose(sf.fft2(u), np.fft.fft2(u))
    assert np.allclose(sf.fftn(u), np.fft.fftn(u))
    assert np.allclose(sf.ifftn(sf.fftn(u)), u)


def test_out_param_and_fftw_kwargs_accepted(rng):
    # Reference call convention: fu = rfft2(u, fu, axes=(1,2), threads=1, planner_effort=...)
    u = rng.standard_normal((4, 8, 8))
    out = np.zeros((4, 8, 5), np.complex128)
    fu = sf.rfft2(u, out, axes=(1, 2), threads=4, planner_effort="FFTW_MEASURE")
    assert np.allclose(fu, np.fft.rfft2(u, axes=(1, 2)))


@pytest.mark.parametrize("type_", [1, 2, 3])
@pytest.mark.parametrize("axis", [0, -1])
def test_dct_matches_scipy(rng, type_, axis):
    from scipy import fftpack

    u = rng.standard_normal((6, 10))
    assert np.allclose(sf.dct(u, type=type_, axis=axis),
                       fftpack.dct(u, type=type_, axis=axis), atol=1e-10)
    assert np.allclose(sf.idct(u, type=type_, axis=axis),
                       fftpack.idct(u, type=type_, axis=axis), atol=1e-10)


def test_dct_roundtrip(rng):
    # scipy.fftpack unnormalised pairing: idct(dct(x)) == 2N·x
    u = rng.standard_normal((5, 16))
    assert np.allclose(sf.idct(sf.dct(u)) / (2 * 16), u, atol=1e-10)


@pytest.mark.parametrize("axis", [0, -1])
def test_dct4_matches_scipy(rng, axis):
    from scipy import fft as sfft

    u = rng.standard_normal((6, 10))
    assert np.allclose(sf.dct(u, type=4, axis=axis),
                       sfft.dct(u, type=4, axis=axis), atol=1e-10)
    # self-inverse up to 2N
    n = u.shape[axis]
    assert np.allclose(sf.idct(sf.dct(u, type=4, axis=axis), type=4, axis=axis)
                       / (2 * n), u, atol=1e-10)
