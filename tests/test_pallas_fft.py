"""Pallas kernel tiers vs numpy (interpret mode on the CPU test backend).

Covers the dense per-axis kernels (ops.pallas_fft) and the planar factored 3D
pipeline (ops.pallas_fft3d) at power-of-two and 3·2^k (3/2-rule) sizes.
On-chip accuracy/perf are exercised by benchmarks/pallas_tuning.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mpifft4py_tpu.ops import pallas_fft as pf
from mpifft4py_tpu.ops import pallas_fft3d as p3


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("axis", [0, 1])
def test_dense_fft_axis(rng, axis):
    x = (rng.standard_normal((8, 16, 128))
         + 1j * rng.standard_normal((8, 16, 128))).astype(np.complex64)
    out = np.asarray(pf.fft_axis(jnp.asarray(x), axis=axis))
    ref = np.fft.fft(x, axis=axis)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5
    back = np.asarray(pf.fft_axis(jnp.asarray(out), axis=axis, inverse=True))
    assert np.abs(back - x).max() < 1e-4


def test_dense_rfft_irfft_last(rng):
    x = rng.standard_normal((4, 8, 64)).astype(np.float32)
    out = np.asarray(pf.rfft_last(jnp.asarray(x)))
    ref = np.fft.rfft(x, axis=-1)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5
    back = np.asarray(pf.irfft_last(jnp.asarray(out.astype(np.complex64)), 64))
    assert np.abs(back - x).max() < 1e-5


@pytest.mark.parametrize("n,axis", [(256, 1), (384, 1), (256, 0), (96, 1),
                                    # hierarchical-combine radix coverage:
                                    # r=4 (two-level), r=5 (odd base),
                                    # r=6 (even split -> odd base, composed
                                    # twiddles), r=7 (direct odd),
                                    # r=8 (three-level)
                                    (512, 1), (640, 1), (768, 1), (896, 1),
                                    (1024, 1)])
def test_factored_planar_axis(rng, n, axis):
    shape = (2, n, 128) if axis == 1 else (n, 2, 128)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    r, m = p3._factor(n)
    assert m <= 128 and r * m == n
    yr, yi = p3.fft_axis_planar(jnp.real(x), jnp.imag(x), axis=axis)
    out = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x, axis=axis)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-5
    br, bi = p3.fft_axis_planar(yr, yi, axis=axis, inverse=True)
    back = np.asarray(br) + 1j * np.asarray(bi)
    assert np.abs(back - x).max() < 1e-4


def test_planar_3d_chain(rng):
    N = 64
    u = rng.standard_normal((N, N, N)).astype(np.float32)
    fu = np.asarray(p3.rfft3d(jnp.asarray(u)))
    ref = np.fft.rfftn(u.astype(np.float64))
    assert fu.shape == (N, N, N // 2 + 1)
    assert np.abs(fu - ref).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(p3.irfft3d(jnp.asarray(fu), (N, N, N)))
    assert np.abs(ub - u).max() < 2e-5


def test_supported_predicates():
    assert p3.supported_c2c(256) and p3.supported_c2c(384) and p3.supported_c2c(1024)
    assert not p3.supported_c2c(17 * 128 * 2)   # r too large
    assert p3.supported_r2c(256) and not p3.supported_r2c(255)


def test_cfft3d_chain(rng):
    x = (rng.standard_normal((32, 32, 128))
         + 1j * rng.standard_normal((32, 32, 128))).astype(np.complex64)
    out = np.asarray(p3.cfft3d(jnp.asarray(x)))
    ref = np.fft.fftn(x)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-6
    back = np.asarray(p3.cfft3d(jnp.asarray(out), inverse=True))
    assert np.abs(back - x).max() < 1e-4


def test_factored_packed_z_kernels_vs_numpy(rng, monkeypatch):
    """Large-n packed r2c/c2r via in-kernel transpose + half-length factored
    FFT: body, plane-0 riders, and round trip against numpy.  Opt-in tier —
    measured SLOWER than the dense matmuls on v5e (Mosaic transpose/XLA flip
    costs; see _zfact_ok) but kept correct for future toolchains."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from mpifft4py_tpu.ops import pallas_fft3d as p3

    monkeypatch.setenv("MPIFFT4PY_TPU_ZFACT", "1")
    with pltpu.force_tpu_interpret_mode():
        for n in (512, 1024):
            assert p3._zfact_ok(n)
            h = n // 2
            x = rng.standard_normal((3, 8, n)).astype(np.float32)
            yr, yi = p3._rfft_last_packed_fact(jnp.asarray(x))
            yr, yi = np.asarray(yr), np.asarray(yi)
            ref = np.fft.rfft(x.astype(np.float64), axis=-1)
            scale = np.abs(ref).max()
            assert np.abs((yr + 1j * yi)[..., 1:] - ref[..., 1:h]).max() < 3e-6 * scale
            assert np.abs(yr[..., 0] - ref[..., 0].real).max() < 3e-6 * scale
            assert np.abs(yi[..., 0] - ref[..., h].real).max() < 3e-6 * scale
            xb = np.asarray(p3._irfft_last_packed_fact(
                jnp.asarray(yr), jnp.asarray(yi), n))
            assert np.abs(xb - x).max() < 3e-6 * np.abs(x).max()
    assert not p3._zfact_ok(256)  # small n stays on the dense kernels
    monkeypatch.delenv("MPIFFT4PY_TPU_ZFACT")
    assert not p3._zfact_ok(1024)  # off by default (measured slower on v5e)


def test_curl_irfft3d_packed_matches_unfused(rng):
    """Fused curl + x-inverse kernel == kx() followed by irfft3d_packed
    (the DNS RHS pattern; VMEM curl saves the 6-plane HBM intermediate).
    State is 2/3-rule masked — the model's envelope (unmasked Nyquist modes
    make iK× non-Hermitian, where packed-inverse and numpy legitimately
    differ)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    N0, N1, h = 16, 16, 128
    N2 = 2 * h
    u = rng.standard_normal((3, N0, N1, N2))
    fu = np.fft.rfftn(u, axes=(1, 2, 3)).astype(np.complex64)
    k0 = np.fft.fftfreq(N0, 1 / N0).astype(np.float32)
    k1 = np.fft.fftfreq(N1, 1 / N1).astype(np.float32)
    k2 = np.arange(h, dtype=np.float32)
    mask = ((np.abs(k0)[:, None, None] < 2 / 3 * (N0 // 2))
            & (np.abs(k1)[None, :, None] < 2 / 3 * (N1 // 2))
            & (k2[None, None, :] < 2 / 3 * (N2 // 2)))
    with pltpu.force_tpu_interpret_mode():
        yr, yi = p3.pack_spectrum(jnp.asarray(fu))
        pr, pi = p3.purify_plane0(yr, yi)
        pr = jnp.where(mask, pr, 0)
        pi = jnp.where(mask, pi, 0)
        W = np.asarray(jax.jit(
            lambda a, b: p3.curl_irfft3d_packed(
                a, b, jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(k2),
                (N0, N1, N2)))(pr, pi))
        K0 = k0[:, None, None]
        K1 = k1[None, :, None]
        K2 = k2[None, None, :]

        def kx(V):
            V = np.asarray(V, np.float64)
            return np.stack([K1 * V[2] - K2 * V[1], K2 * V[0] - K0 * V[2],
                             K0 * V[1] - K1 * V[0]]).astype(np.float32)
        Wref = np.asarray(jax.jit(
            lambda a, b: p3.irfft3d_packed(a, b, (N0, N1, N2)))(
            jnp.asarray(-kx(pi)), jnp.asarray(kx(pr))))
    assert np.abs(W - Wref).max() / np.abs(Wref).max() < 1e-5
    # numpy oracle on the masked (model-envelope) state
    fu2 = np.asarray(pr) + 1j * np.asarray(pi)
    full = np.concatenate([fu2, np.zeros_like(fu2[..., :1])], -1)
    Kf = np.meshgrid(k0, k1, np.arange(h + 1), indexing="ij")
    cu = 1j * np.stack([Kf[1] * full[2] - Kf[2] * full[1],
                        Kf[2] * full[0] - Kf[0] * full[2],
                        Kf[0] * full[1] - Kf[1] * full[0]])
    refn = np.fft.irfftn(cu, s=(N0, N1, N2), axes=(1, 2, 3))
    assert np.abs(W - refn).max() / np.abs(refn).max() < 2e-6

    # Biot–Savart variant: the 1/|k|² factor folded into the fused kernel
    # (VV's û-from-ω̂ recovery) == numpy on the masked state.
    with pltpu.force_tpu_interpret_mode():
        U = np.asarray(jax.jit(
            lambda a, b: p3.curl_irfft3d_packed(
                a, b, jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(k2),
                (N0, N1, N2), biot_savart=True))(pr, pi))
    ksq = Kf[0] ** 2 + Kf[1] ** 2 + Kf[2] ** 2
    refu = np.fft.irfftn(cu / np.where(ksq == 0, 1, ksq),
                         s=(N0, N1, N2), axes=(1, 2, 3))
    assert np.abs(U - refu).max() / np.abs(refu).max() < 2e-6


def test_cross_zy_acc_matches_oneshot_path(rng):
    """The z-tiled ACCUMULATING cross/mul+zy kernel (512³-class planes whose
    full operand set exceeds VMEM) == the XLA cross + fused_zy_fwd chain.
    Plane (512, 512) forces the acc route (one-shot gate False); N0 kept
    small for interpret-mode runtime."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from mpifft4py_tpu.ops import pallas_fft3d as p3

    shape = (2, 512, 512)
    a = jnp.asarray(rng.standard_normal((3,) + shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((3,) + shape).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1,) + shape).astype(np.float32))

    def cross(x, y):
        return jnp.stack([x[1] * y[2] - x[2] * y[1],
                          x[2] * y[0] - x[0] * y[2],
                          x[0] * y[1] - x[1] * y[0]])

    with pltpu.force_tpu_interpret_mode():
        assert not p3._cross_zy_oneshot_ok(512, 512)
        assert p3.cross_zy_ok(512, 512)          # served by the acc kernel
        assert p3._pick_tk_acc(512, 512, 12) is None  # MHD stays XLA at 512
        rr, ri = p3.fused_zy_fwd(cross(a, b))
        yr, yi = p3.cross_rfft_zy_packed(a, b)
        s = np.abs(np.asarray(rr)).max()
        assert np.abs(np.asarray(yr) - np.asarray(rr)).max() < 1e-5 * s
        assert np.abs(np.asarray(yi) - np.asarray(ri)).max() < 1e-5 * s
        rr, ri = p3.fused_zy_fwd(a * t)
        yr, yi = p3.mul_rfft_zy_packed(a, t)
        s = np.abs(np.asarray(rr)).max()
        assert np.abs(np.asarray(yr) - np.asarray(rr)).max() < 1e-5 * s
        assert np.abs(np.asarray(yi) - np.asarray(ri)).max() < 1e-5 * s


def test_fft_x_epilogue_buoy_fallback_matches_reference(rng):
    """Above the buoy gate (576-class N0+) the buoyancy rider's two extra
    blocks overflow scoped VMEM; ``fft_x_epilogue_packed`` must fall back to
    kernel-without-buoy + an XLA Ri·P(θ̂ê_z) pass (projection is linear).
    N0=576 passes the base gate but fails the buoy gate — the fallback
    composition is checked against a dense complex reference of the full
    buoyant epilogue.  (512-class fits the rider in-kernel since the
    fori_loop+scratch restructure.)"""
    N0, N1, h = 576, 4, 128
    assert p3.fft_x_epilogue_ok(N0) and not p3.fft_x_epilogue_ok(N0, buoy=True)
    assert p3.fft_x_epilogue_ok(256, buoy=True)   # 256-class keeps the kernel

    f = (rng.standard_normal((3, N0, N1, h))
         + 1j * rng.standard_normal((3, N0, N1, h)))
    S = (rng.standard_normal((3, N0, N1, h))
         + 1j * rng.standard_normal((3, N0, N1, h)))
    T = (rng.standard_normal((1, N0, N1, h))
         + 1j * rng.standard_normal((1, N0, N1, h)))
    k0 = np.fft.fftfreq(N0, 1.0 / N0)
    k1 = np.arange(N1, dtype=np.float64)
    k2 = np.arange(h, dtype=np.float64)
    m0 = (np.abs(k0) < N0 / 3).astype(np.float64)
    m1 = np.ones(N1)
    m2 = (k2 < h / 2).astype(np.float64)
    Ri, visc = 0.7, 0.02

    # dense reference: x-FFT, mask, +Ri·θ̂ê_z, Leray projection, −νk²S
    F = np.fft.fft(f, axis=1)
    F *= (m0[:, None, None] * m1[None, :, None] * m2[None, None, :])
    F[2] += Ri * T[0]
    K = [k0[:, None, None], k1[None, :, None], k2[None, None, :]]
    ksq = K[0] ** 2 + K[1] ** 2 + K[2] ** 2
    inv = 1.0 / np.where(ksq == 0, 1.0, ksq)
    div = (K[0] * F[0] + K[1] * F[1] + K[2] * F[2]) * inv
    ref = np.stack([F[c] - K[c] * div for c in range(3)]) - visc * ksq * S

    a = lambda x: jnp.asarray(x, jnp.float32)
    yr, yi = p3.fft_x_epilogue_packed(
        a(f.real), a(f.imag), a(S.real), a(S.imag),
        a(k0), a(k1), a(k2), a(m0), a(m1), a(m2),
        "project", visc, buoy=(a(T.real), a(T.imag), Ri))
    s = np.abs(ref).max()
    assert np.abs(np.asarray(yr) - ref.real).max() < 2e-5 * s
    assert np.abs(np.asarray(yi) - ref.imag).max() < 2e-5 * s


def test_cross_rfft_z_packed_matches_unfused(rng):
    """The z-only fused cross/mul kernel (wide-layout first leg) == XLA
    cross + rfft_last_packed, for all three ops, incl. non-128 row counts."""
    shape = (3, 4, 8, 256)
    a = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    c = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    d = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1,) + shape[1:]).astype(np.float32))

    def cross(x, y):
        return jnp.stack([x[1] * y[2] - x[2] * y[1],
                          x[2] * y[0] - x[0] * y[2],
                          x[0] * y[1] - x[1] * y[0]])

    assert p3.cross_z_ok(256, 32) and p3.cross_z_ok(256, 32, two=True)
    for got, F in [(p3.cross_rfft_z_packed(a, b), cross(a, b)),
                   (p3.cross_rfft_z_packed(a, b, c, d),
                    cross(a, b) + cross(c, d)),
                   (p3.mul_rfft_z_packed(a, t), a * t)]:
        rr, ri = p3.rfft_last_packed(F)
        s = float(jnp.abs(rr).max())
        assert float(jnp.abs(got[0] - rr).max()) < 1e-5 * s
        assert float(jnp.abs(got[1] - ri).max()) < 1e-5 * s


def test_curl_irfft3d_with_state_matches_separate(rng):
    """curl_irfft3d_packed(with_state=True) returns (W, U) from ONE pass
    over the state pair; W must equal the curl-only kernel exactly and U the
    plain packed inverse."""
    N0, N1, N2 = 16, 64, 256
    u = rng.standard_normal((3, N0, N1, N2)).astype(np.float32)
    fu = np.fft.rfftn(u, axes=(1, 2, 3))
    yr, yi = p3.pack_spectrum(jnp.asarray(fu))
    k0 = jnp.asarray(np.fft.fftfreq(N0, 1.0 / N0).astype(np.float32))
    k1 = jnp.asarray(np.fft.fftfreq(N1, 1.0 / N1).astype(np.float32))
    k2 = jnp.asarray(np.arange(N2 // 2, dtype=np.float32))
    assert p3.curl_fused_ok(N0, with_state=True)
    W, U = p3.curl_irfft3d_packed(yr, yi, k0, k1, k2, (N0, N1, N2),
                                  with_state=True)
    Wonly = p3.curl_irfft3d_packed(yr, yi, k0, k1, k2, (N0, N1, N2))
    assert float(jnp.abs(W - Wonly).max()) == 0.0
    assert np.abs(np.asarray(U) - u).max() / np.abs(u).max() < 1e-5


@pytest.mark.parametrize("spec,n,want", [("256:4", 256, (4, 64)),
                                         ("256:8", 256, (8, 32)),
                                         ("256:4", 512, (4, 128))])
def test_factor_override_env(monkeypatch, spec, n, want):
    """MPIFFT4PY_TPU_FACTOR overrides only the named n (A/B knob)."""
    monkeypatch.setenv("MPIFFT4PY_TPU_FACTOR", spec)
    assert p3._factor(n) == want


def test_factored_planar_axis_override_parity(rng, monkeypatch):
    """r=4/m=64 factorisation of the 256-point stage matches numpy."""
    monkeypatch.setenv("MPIFFT4PY_TPU_FACTOR", "256:4")
    x = (rng.standard_normal((2, 256, 128))
         + 1j * rng.standard_normal((2, 256, 128))).astype(np.complex64)
    assert p3._factor(256) == (4, 64)
    yr, yi = p3.fft_axis_planar(jnp.real(x), jnp.imag(x), axis=1)
    out = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x, axis=1)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-5
