"""Packed-Hermitian spectral layout: the boundary-free MXU fast path.

The packed pair (re, im) of width N2/2 carries X0 + i·X_Nyquist in plane
k2=0; under 2/3-rule dealiasing the rider is identically zero, so the pair IS
the spectrum on k2 = 0..h−1 and whole solver steps run on float32 pairs
(measured 256³ RK4: 78 ms vs 112 ms through the complex boundary — BENCH.md).
These verify the layout helpers and the packed DNS path in interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mpifft4py_tpu import slab
from mpifft4py_tpu.ops import pallas_fft3d as p3

TAU = 2 * np.pi


@pytest.fixture(autouse=True)
def _force(monkeypatch):
    monkeypatch.setenv("MPIFFT4PY_TPU_PALLAS_DIST", "force")
    with pltpu.force_tpu_interpret_mode():
        yield


def test_pack_unpack_roundtrip(rng):
    fu = (rng.standard_normal((3, 8, 8, 129))
          + 1j * rng.standard_normal((3, 8, 8, 129))).astype(np.complex64)
    yr, yi = p3.pack_spectrum(jnp.asarray(fu))
    assert yr.shape == (3, 8, 8, 128)
    # unpack needs Hermitian plane-0 riders: use a real field's spectrum
    u = rng.standard_normal((3, 8, 8, 256))
    fu = np.fft.rfftn(u, axes=(1, 2, 3)).astype(np.complex64)
    back = np.asarray(p3.unpack_spectrum(*p3.pack_spectrum(jnp.asarray(fu))))
    assert np.abs(back - fu).max() < 1e-4


def test_purify_plane0_drops_rider(rng):
    u = rng.standard_normal((8, 8, 256))
    fu = np.fft.rfftn(u).astype(np.complex64)
    yr, yi = p3.pack_spectrum(jnp.asarray(fu))
    pr, pi = p3.purify_plane0(yr, yi)
    # plane 0 must equal X0 exactly; body untouched
    assert np.abs(np.asarray(jax.lax.complex(pr, pi))[..., 0]
                  - fu[..., 0]).max() < 1e-4
    assert np.array_equal(np.asarray(pr)[..., 1:], np.asarray(yr)[..., 1:])


def test_packed_fft_interface_vs_numpy(rng):
    shape = (16, 16, 256)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    fwd = jax.jit(FFT.forward_packed_fn("2/3-rule"))
    bwd = jax.jit(FFT.backward_packed_fn())
    u = rng.standard_normal(shape).astype(np.float32)
    yr, yi = fwd(jnp.asarray(u))
    ref = np.fft.rfftn(u.astype(np.float64))
    cut = 2 / 3 * (shape[0] // 2)
    k = np.fft.fftfreq(shape[0], 1 / shape[0])
    k2 = np.arange(128)
    mask = ((np.abs(k)[:, None, None] < cut) & (np.abs(k)[None, :, None] < cut)
            & (k2[None, None, :] < 2 / 3 * (shape[2] // 2)))
    got = np.asarray(jax.lax.complex(yr, yi))
    assert np.abs(got - np.where(mask, ref[..., :128], 0)).max() \
        / np.abs(ref).max() < 2e-6
    ub = np.asarray(bwd((yr, yi)))
    # reference: inverse of the masked spectrum
    full = np.where(np.concatenate([mask, np.zeros_like(mask[..., :1])], -1),
                    ref, 0)
    uref = np.fft.irfftn(full, s=shape, axes=(0, 1, 2))
    assert np.abs(ub - uref).max() / np.abs(uref).max() < 2e-6


def test_packed_dns_matches_complex(rng):
    """One RK4 step in the packed layout == the complex-layout step."""
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    shape = (16, 16, 256)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    sc = NavierStokes3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule")
    sp = NavierStokes3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule",
                        spectral_layout="packed")
    Uc = sc.taylor_green()
    Up = sp.taylor_green()
    assert abs(sc.energy(Uc) - sp.energy(Up)) < 1e-6
    Uc = sc.step(Uc)
    Up = sp.step(Up)
    got = np.asarray(sp.from_packed(Up))
    ref = np.asarray(Uc)[..., :got.shape[-1]]
    assert np.abs(got - ref).max() < 1e-5
    assert abs(sc.energy(Uc) - sp.energy(Up)) < 1e-6


def test_packed_layout_validation():
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    FFT = slab.R2C(np.array([16, 16, 64]), np.array([TAU] * 3), 1, "single")
    with pytest.raises(ValueError, match="packed"):
        NavierStokes3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule",
                       spectral_layout="packed")


# -- distributed packed layout (VERDICT r2 next-step 1) ----------------------


def _packed_vs_numpy(FFT, rng, shape):
    import jax.numpy as jnp

    fwd = jax.jit(FFT.forward_packed_fn("2/3-rule"))
    bwd = jax.jit(FFT.backward_packed_fn())
    u = rng.standard_normal(shape).astype(np.float32)
    yr, yi = fwd(FFT.shard_real(u))
    ref = np.fft.rfftn(u.astype(np.float64), axes=(-3, -2, -1))
    h = shape[-1] // 2
    filt = np.asarray(FFT.get_dealias_filter()).astype(bool)[..., :h]
    got = np.asarray(jax.lax.complex(yr, yi))
    want = np.where(filt, ref[..., :h], 0)
    assert np.abs(got - want).max() / np.abs(ref).max() < 2e-6
    # inverse of the masked packed pair == numpy inverse of the masked spectrum
    full = np.concatenate([want, np.zeros(want.shape[:-1] + (1,), want.dtype)],
                          axis=-1)
    uref = np.fft.irfftn(full, s=shape[-3:], axes=(-3, -2, -1))
    ub = np.asarray(bwd((jnp.asarray(got.real), jnp.asarray(got.imag))))
    assert np.abs(ub - uref).max() / np.abs(uref).max() < 2e-6


@pytest.mark.parametrize("P", [2, 4])
def test_packed_interface_distributed_slab(rng, P):
    shape = (16, 16, 256)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), P, "single")
    assert FFT._packed_iface_ok("2/3-rule")
    _packed_vs_numpy(FFT, rng, shape)


def test_packed_interface_distributed_pencil_p2_1(rng):
    from mpifft4py_tpu import pencil

    shape = (16, 16, 256)
    FFT = pencil.R2C(np.array(shape), np.array([TAU] * 3), 4, "single", P1=4)
    assert FFT.P2 == 1 and FFT._packed_iface_ok("2/3-rule")
    _packed_vs_numpy(FFT, rng, shape)


@pytest.mark.parametrize("P", [2, 4])
def test_packed_dns_distributed_matches_serial(rng, P):
    """One packed RK4 step on a P-device slab mesh == the serial packed step
    (the fast layout must survive sharding — VERDICT r2 next-step 1)."""
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    shape = (16, 16, 256)
    L = np.array([TAU] * 3)
    Fs = slab.R2C(np.array(shape), L, 1, "single")
    Fd = slab.R2C(np.array(shape), L, P, "single")
    ss = NavierStokes3D(Fs, nu=0.01, dt=0.001, dealias="2/3-rule",
                        spectral_layout="packed")
    sd = NavierStokes3D(Fd, nu=0.01, dt=0.001, dealias="2/3-rule",
                        spectral_layout="packed")
    Us = ss.taylor_green()
    Ud = sd.taylor_green()
    assert abs(ss.energy_packed(Us) - sd.energy_packed(Ud)) < 1e-6
    Us = ss.step(Us)
    Ud = sd.step(Ud)
    for a, b in zip(Us, Ud):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5
    assert abs(ss.energy_packed(Us) - sd.energy_packed(Ud)) < 1e-6


def test_packed_forcing_matches_complex(rng):
    """Band forcing on the packed pair == the complex-layout forcing term
    (VERDICT r2 next-step 8)."""
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    shape = (16, 16, 256)
    L = np.array([TAU] * 3)
    FFT = slab.R2C(np.array(shape), L, 1, "single")
    kw = dict(nu=0.01, dt=0.001, dealias="2/3-rule",
              forcing_band=(0.5, 2.5), forcing_rate=0.3)
    sc = NavierStokes3D(FFT, **kw)
    sp = NavierStokes3D(FFT, spectral_layout="packed", **kw)
    Uc = sc.taylor_green()
    Up = sp.taylor_green()
    Uc = sc.step(Uc)
    Up = sp.step(Up)
    got = np.asarray(sp.from_packed(Up))
    ref = np.asarray(Uc)[..., :got.shape[-1]]
    assert np.abs(got - ref).max() < 1e-5


def test_packed_interface_pencil_wide(rng):
    """P2>1 pencil packed interface — the WIDE choreography (full-lane
    packed pipeline, VERDICT r2 next-step 2): parity vs numpy at 2x2
    (8 simulated devices deadlock the Mosaic interpreter — see top note)."""
    from mpifft4py_tpu import pencil

    shape = (16, 16, 256)
    FFT = pencil.R2C(np.array(shape), np.array([TAU] * 3), 4, "single", P1=2)
    assert FFT.P2 > 1 and FFT._packed_wide_ok("2/3-rule")
    _packed_vs_numpy(FFT, rng, shape)


def test_packed_dns_pencil_wide_matches_serial(rng):
    """Packed DNS step on a 2x2 pencil mesh (wide layout) == serial packed."""
    from mpifft4py_tpu import pencil
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    shape = (16, 16, 256)
    L = np.array([TAU] * 3)
    Fs = slab.R2C(np.array(shape), L, 1, "single")
    Fw = pencil.R2C(np.array(shape), L, 4, "single", P1=2)
    ss = NavierStokes3D(Fs, nu=0.01, dt=0.001, dealias="2/3-rule",
                        spectral_layout="packed")
    sw = NavierStokes3D(Fw, nu=0.01, dt=0.001, dealias="2/3-rule",
                        spectral_layout="packed")
    Us = ss.taylor_green()
    Uw = sw.taylor_green()
    assert abs(ss.energy_packed(Us) - sw.energy_packed(Uw)) < 1e-6
    Us = ss.step(Us)
    Uw = sw.step(Uw)
    for a, b in zip(Us, Uw):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5


@pytest.mark.parametrize("model", ["ns", "vv", "mhd", "bq"])
def test_nl_fused_rhs_matches_generic(rng, model):
    """The two-kernel fused nonlinear path (cross+z/y forward, then
    x-FFT+mask+epilogue) == the generic packed RHS on the same solver.
    Shape (16, 64, 256): N1=64 satisfies the cross kernel's m>=64 factor
    gate (the (16,16,256) shapes elsewhere keep the generic path covered)."""
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D
    from mpifft4py_tpu.models.vv import VorticityVelocity3D
    from mpifft4py_tpu.models.mhd import MHD3D

    shape = (16, 64, 256)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    kw = dict(nu=0.01, dt=0.001, dealias="2/3-rule", spectral_layout="packed")
    if model == "ns":
        s = NavierStokes3D(FFT, **kw)
    elif model == "vv":
        s = VorticityVelocity3D(FFT, **kw)
    elif model == "bq":
        from mpifft4py_tpu.models.boussinesq import Boussinesq3D
        s = Boussinesq3D(FFT, kappa=0.005, Ri=0.5, **kw)
    else:
        s = MHD3D(FFT, eta=0.02, **kw)
    assert s._nl_fused
    # random state (every mode populated): on symmetry-rich ICs like
    # Taylor-Green most modes are mathematically zero and both paths compute
    # only fp32 cancellation noise there, making comparison meaningless —
    # with a dense spectrum a relative check is well-posed
    nc = {"ns": 3, "vv": 3, "bq": 4, "mhd": 6}[model]
    U = jnp.asarray(rng.standard_normal((nc,) + shape).astype(np.float32))
    if nc == 3:
        S = s._fwd_pk(U)                    # purified + masked packed pair
    else:
        a, b = s._fwd_pk(U[:3])
        c, d = s._fwd_pk(U[3:])
        S = (jnp.concatenate([a, c]), jnp.concatenate([b, d]))
    kargs = s._packed_arrays()
    fused = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    s._nl_fused = False
    generic = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    scale = np.abs(np.asarray(generic[0])).max()
    for g, f in zip(generic, fused):
        assert np.abs(np.asarray(g) - np.asarray(f)).max() < 1e-5 * scale


@pytest.mark.parametrize("model", ["ns", "vv", "mhd", "bq"])
def test_nl_fused_dist_rhs_matches_generic(rng, model):
    """The DISTRIBUTED fused nonlinear path (shard-local cross+z/y kernels,
    pair across the 1D transpose, x-FFT+mask+epilogue with the local k1/m1
    slice — FFT.nl_forward_epilogue_fn) == the generic packed RHS on a P=4
    slab mesh.  The serial mirror is test_nl_fused_rhs_matches_generic."""
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D
    from mpifft4py_tpu.models.vv import VorticityVelocity3D
    from mpifft4py_tpu.models.mhd import MHD3D

    shape = (16, 64, 256)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 4, "single")
    kw = dict(nu=0.01, dt=0.001, dealias="2/3-rule", spectral_layout="packed")
    if model == "ns":
        s = NavierStokes3D(FFT, **kw)
    elif model == "vv":
        s = VorticityVelocity3D(FFT, **kw)
    elif model == "bq":
        from mpifft4py_tpu.models.boussinesq import Boussinesq3D
        s = Boussinesq3D(FFT, kappa=0.005, Ri=0.5, **kw)
    else:
        s = MHD3D(FFT, eta=0.02, **kw)
    assert not s._nl_fused and s._nl_fused_dist
    nc = {"ns": 3, "vv": 3, "bq": 4, "mhd": 6}[model]
    U = jnp.asarray(rng.standard_normal((nc,) + shape).astype(np.float32))
    if nc == 3:
        S = s._fwd_pk(U)
    else:
        a, b = s._fwd_pk(U[:3])
        c, d = s._fwd_pk(U[3:])
        S = (jnp.concatenate([a, c]), jnp.concatenate([b, d]))
    kargs = s._packed_arrays()
    fused = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    s._nl_fused_dist = False
    generic = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    scale = np.abs(np.asarray(generic[0])).max()
    for g, f in zip(generic, fused):
        assert np.abs(np.asarray(g) - np.asarray(f)).max() < 1e-5 * scale


@pytest.mark.parametrize("model", ["ns", "vv", "mhd", "bq"])
def test_nl_fused_wide_rhs_matches_generic(rng, model):
    """The WIDE (pencil P2>1) fused nonlinear path — shard-local cross/mul
    with only the z-rfft fused behind it (cross_rfft_z_packed), y as the
    P2-stage work_fn, x-FFT+mask+epilogue after the joint transpose, wide
    plane-0 purify (pencil._nl_pair_pre_x/_nl_purify) == the generic packed
    RHS on a 2x2 pencil mesh."""
    from mpifft4py_tpu import pencil
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D
    from mpifft4py_tpu.models.vv import VorticityVelocity3D
    from mpifft4py_tpu.models.mhd import MHD3D

    shape = (16, 16, 256)
    FFT = pencil.R2C(np.array(shape), np.array([TAU] * 3), 4, "single", P1=2)
    assert FFT.P2 > 1
    kw = dict(nu=0.01, dt=0.001, dealias="2/3-rule", spectral_layout="packed")
    if model == "ns":
        s = NavierStokes3D(FFT, **kw)
    elif model == "vv":
        s = VorticityVelocity3D(FFT, **kw)
    elif model == "bq":
        from mpifft4py_tpu.models.boussinesq import Boussinesq3D
        s = Boussinesq3D(FFT, kappa=0.005, Ri=0.5, **kw)
    else:
        s = MHD3D(FFT, eta=0.02, **kw)
    assert not s._nl_fused and s._nl_fused_dist
    nc = {"ns": 3, "vv": 3, "bq": 4, "mhd": 6}[model]
    U = jnp.asarray(rng.standard_normal((nc,) + shape).astype(np.float32))
    if nc == 3:
        S = s._fwd_pk(U)
    else:
        a, b = s._fwd_pk(U[:3])
        c, d = s._fwd_pk(U[3:])
        S = (jnp.concatenate([a, c]), jnp.concatenate([b, d]))
    kargs = s._packed_arrays()
    fused = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    s._nl_fused_dist = False
    generic = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    scale = np.abs(np.asarray(generic[0])).max()
    for g, f in zip(generic, fused):
        assert np.abs(np.asarray(g) - np.asarray(f)).max() < 1e-5 * scale


def test_cross2_split_matches_direct(rng, monkeypatch):
    """The 2-pass cross2 SPLIT (two 6-field crosses summed — the 512-class
    route where the 12-field kernel finds no VMEM tile, VERDICT r3 item 3a)
    == the direct cross2 kernel."""
    shape = (3, 8, 64, 256)
    a, b, c, d = (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
                  for _ in range(4))
    direct = p3.cross_rfft_zy_packed(a, b, c, d)
    assert p3.cross2_direct_ok(64, 256)  # the reference really was direct
    monkeypatch.setattr(p3, "cross2_direct_ok", lambda *args: False)
    split = p3.cross_rfft_zy_packed(a, b, c, d)
    scale = np.abs(np.asarray(direct[0])).max()
    for g, f in zip(direct, split):
        assert np.abs(np.asarray(g) - np.asarray(f)).max() < 1e-5 * scale


@pytest.mark.parametrize("integrator", ["RK4", "LSRK54"])
def test_mhd_rhs_packed_seq_matches_generic(rng, monkeypatch, integrator):
    """MHD's peak-HBM-sequenced RHS (_rhs_packed_seq: split cross2 +
    optimization_barrier stack sequencing — the 512³ single-chip route) ==
    the generic packed RHS.  LSRK54 exercises the recompute-U variant
    (the physical velocity is rebuilt for the induction cross instead of
    held across the b/j window — the 2N-storage memory trade)."""
    from mpifft4py_tpu.models.mhd import MHD3D

    shape = (16, 64, 256)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    s = MHD3D(FFT, nu=0.01, eta=0.02, dt=0.001, dealias="2/3-rule",
              spectral_layout="packed", integrator=integrator)
    assert s._nl_fused
    U = jnp.asarray(rng.standard_normal((6,) + shape).astype(np.float32))
    ar, ai = s._fwd_pk(U[:3])
    br, bi = s._fwd_pk(U[3:])
    S = (jnp.concatenate([ar, br]), jnp.concatenate([ai, bi]))
    kargs = s._packed_arrays()
    monkeypatch.setattr(p3, "cross2_direct_ok", lambda *args: False)
    seq = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    s._nl_fused = False
    generic = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    scale = np.abs(np.asarray(generic[0])).max()
    for g, f in zip(generic, seq):
        assert np.abs(np.asarray(g) - np.asarray(f)).max() < 1e-5 * scale
