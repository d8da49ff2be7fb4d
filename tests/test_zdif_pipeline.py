"""DIF z-order integration through the packed interface and the DNS path.

The DIF-split z-stage (ops/pallas_zdif) leaves the packed pair in
``zdif_perm`` lane order at 512/768/1024-class N2; these verify every
consumer of that order: the packed FFT interface (serial + distributed),
the solver's factored wavenumber/mask vectors, the fused nonlinear kernels
(one-shot / z-tiled accumulating / z-only), checkpoints, and the
natural-order conversion boundary.  Interpret-mode kernels on CPU; hardware
lowering of the new in-kernel paths is validated on chip
(benchmarks/zdif_onchip.py sweep — interpret parity cannot catch Mosaic
lowering gaps)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mpifft4py_tpu import slab
from mpifft4py_tpu.ops import pallas_fft3d as p3
from mpifft4py_tpu.ops import pallas_zdif as z

TAU = 2 * np.pi
N2 = 512


@pytest.fixture(autouse=True)
def _force(monkeypatch):
    monkeypatch.setenv("MPIFFT4PY_TPU_PALLAS_DIST", "force")
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# -- kernel level: every fused forward emits the same spectrum, permuted ----

def test_fused_zy_dif_matches_natural_permuted(rng):
    u = rng.standard_normal((2, 128, N2)).astype(np.float32)
    assert p3._use_fused_zy(128, N2)
    yr, yi = p3.fused_zy_fwd(jnp.asarray(u), dif=True)
    yr0, yi0 = p3.fused_zy_fwd(jnp.asarray(u), dif=False)
    pm = z.zdif_perm(N2)
    scale = np.abs(np.asarray(yr0)).max()
    assert np.abs(np.asarray(yr) - np.asarray(yr0)[..., pm]).max() < 3e-6 * scale
    assert np.abs(np.asarray(yi) - np.asarray(yi0)[..., pm]).max() < 3e-6 * scale
    ub = np.asarray(p3.fused_zy_bwd(yr, yi, N2, dif=True))
    assert np.abs(ub - u).max() < 3e-6 * np.abs(u).max()


@pytest.mark.parametrize("which", ["oneshot", "acc", "mul_acc", "zonly"])
def test_cross_kernels_dif_match_natural_permuted(rng, which):
    a = rng.standard_normal((3, 2, 128, N2)).astype(np.float32)
    b = rng.standard_normal((3, 2, 128, N2)).astype(np.float32)
    t = rng.standard_normal((1, 2, 128, N2)).astype(np.float32)
    pm = z.zdif_perm(N2)
    if which == "oneshot":
        assert p3._cross_zy_oneshot_ok(128, N2)
        got = p3.cross_rfft_zy_packed(jnp.asarray(a), jnp.asarray(b), dif=True)
        ref = p3.cross_rfft_zy_packed(jnp.asarray(a), jnp.asarray(b))
    elif which == "acc":
        got = p3._cross_rfft_zy_acc([jnp.asarray(a), jnp.asarray(b)],
                                    "cross", dif=True)
        ref = p3.cross_rfft_zy_packed(jnp.asarray(a), jnp.asarray(b))
    elif which == "mul_acc":
        got = p3._cross_rfft_zy_acc([jnp.asarray(a), jnp.asarray(t)],
                                    "mul", dif=True)
        ref = p3.mul_rfft_zy_packed(jnp.asarray(a), jnp.asarray(t))
    else:
        got = p3.cross_rfft_z_packed(jnp.asarray(a), jnp.asarray(b), dif=True)
        ref = p3.cross_rfft_z_packed(jnp.asarray(a), jnp.asarray(b))
    scale = np.abs(np.asarray(ref[0])).max()
    for g, r in zip(got, ref):
        assert np.abs(np.asarray(g) - np.asarray(r)[..., pm]).max() \
            < 3e-6 * scale


# -- packed interface ---------------------------------------------------------

def _iface_vs_numpy(FFT, rng, shape):
    fwd = jax.jit(FFT.forward_packed_fn("2/3-rule"))
    bwd = jax.jit(FFT.backward_packed_fn())
    u = rng.standard_normal(shape).astype(np.float32)
    yr, yi = fwd(FFT.shard_real(u) if FFT.P > 1 else jnp.asarray(u))
    ref = np.fft.rfftn(u.astype(np.float64), axes=(-3, -2, -1))
    h = shape[-1] // 2
    filt = np.asarray(FFT.get_dealias_filter()).astype(bool)[..., :h]
    want = np.where(filt, ref[..., :h], 0)
    perm = FFT.packed_z_perm
    assert perm is not None, "zdif should be active at N2=512"
    want = want[..., perm]
    got = np.asarray(jax.lax.complex(yr, yi))
    assert np.abs(got - want).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(bwd((yr, yi)))
    full = np.concatenate([np.where(filt, ref[..., :h], 0),
                           np.zeros(ref.shape[:-1] + (1,), ref.dtype)], -1)
    uref = np.fft.irfftn(full, s=shape[-3:], axes=(-3, -2, -1))
    assert np.abs(ub - uref).max() / np.abs(uref).max() < 2e-6


def test_packed_interface_dif_vs_numpy_serial(rng):
    shape = (16, 16, N2)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    _iface_vs_numpy(FFT, rng, shape)


def test_packed_interface_dif_vs_numpy_distributed(rng):
    shape = (16, 16, N2)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 2, "single")
    _iface_vs_numpy(FFT, rng, shape)


def test_packed_interface_dif_kill_switch(rng, monkeypatch):
    monkeypatch.setenv("MPIFFT4PY_TPU_ZDIF", "0")
    shape = (16, 16, N2)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    assert FFT.packed_z_perm is None
    u = rng.standard_normal(shape).astype(np.float32)
    yr, yi = jax.jit(FFT.forward_packed_fn(None))(jnp.asarray(u))
    ref = np.fft.rfftn(u.astype(np.float64))
    # natural order: lane 1 == X_1 (no mask, body lanes unaffected by rider)
    assert np.abs(np.asarray(yr)[..., 1] - ref[..., 1].real).max() \
        < 2e-6 * np.abs(ref).max()


# -- DNS solver on the DIF layout --------------------------------------------

def test_packed_dns_dif_matches_complex(rng):
    """One RK4 step on the DIF packed layout == the complex-layout step
    (generic packed RHS path; N1=16 keeps the fused kernels out)."""
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    shape = (16, 16, N2)
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


def test_nl_fused_rhs_dif_matches_generic(rng):
    """The fused nonlinear path (cross+z/y kernel + x-epilogue) == the
    generic packed RHS, both on the DIF layout (N1=64 passes the cross
    kernels' m>=64 gate)."""
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    shape = (16, 64, N2)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    s = NavierStokes3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule",
                       spectral_layout="packed")
    assert s._nl_fused and FFT.packed_z_perm is not None
    U = jnp.asarray(rng.standard_normal((3,) + shape).astype(np.float32))
    S = s._fwd_pk(U)
    kargs = s._packed_arrays()
    fused = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    s._nl_fused = False
    generic = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    scale = np.abs(np.asarray(generic[0])).max()
    for g, f in zip(generic, fused):
        assert np.abs(np.asarray(g) - np.asarray(f)).max() < 1e-5 * scale


def test_packed_diagnostics_dif(rng):
    """E(k) / dissipation on the DIF pair == the complex-layout values."""
    from mpifft4py_tpu.models import diagnostics as dg
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    shape = (16, 16, N2)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    sp = NavierStokes3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule",
                        spectral_layout="packed")
    Up = sp.taylor_green()
    fu = np.asarray(sp.from_packed(Up))
    Ek_p = dg.energy_spectrum_packed(FFT, Up)
    Ek_c = dg.energy_spectrum(FFT, jnp.asarray(fu))
    assert np.abs(Ek_p - Ek_c).max() < 1e-8
    ep = dg.dissipation_packed(FFT, Up, 0.01)
    ec = dg.dissipation(FFT, jnp.asarray(fu), 0.01)
    assert abs(ep - ec) < 1e-8 * max(1.0, abs(ec))


def test_checkpoint_z_order_reconciliation(rng, tmp_path, monkeypatch):
    """A packed checkpoint saved in DIF order restores bit-identically onto
    a DIF FFT, and correctly PERMUTED onto a natural-order (ZDIF=0) FFT."""
    from mpifft4py_tpu.utils.io import save_state, load_state

    shape = (16, 16, N2)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    h = N2 // 2
    ur = rng.standard_normal((3, 16, 16, h)).astype(np.float32)
    ui = rng.standard_normal((3, 16, 16, h)).astype(np.float32)
    path = str(tmp_path / "ck.npz")
    save_state(path, FFT, (jnp.asarray(ur), jnp.asarray(ui)), step=3, t=0.1)
    (br, bi), meta = load_state(path, FFT)
    assert str(meta["z_order"]) == "dif"
    assert np.array_equal(np.asarray(br), ur)
    monkeypatch.setenv("MPIFFT4PY_TPU_ZDIF", "0")
    Fn = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    (nr, ni), _ = load_state(path, Fn)
    ip = z.zdif_iperm(N2)
    assert np.array_equal(np.asarray(nr), ur[..., ip])


# -- complex API over the DIF z-stage (MPIFFT4PY_TPU_API_ZDIF) ----------------

def test_api_zdif_matches_numpy(rng, monkeypatch):
    """rfft3d/irfft3d with the API-zdif gate: DIF kernels + the natural-order
    lane gather folded into the boundary must reproduce numpy exactly like
    the dense path (natural k2 order, complex in/out)."""
    monkeypatch.setenv("MPIFFT4PY_TPU_API_ZDIF", "1")
    shape = (16, 16, N2)
    u = rng.standard_normal(shape).astype(np.float32)
    fu = np.asarray(p3.rfft3d(jnp.asarray(u)))
    ref = np.fft.rfftn(u.astype(np.float64), axes=(-3, -2, -1))
    assert np.abs(fu - ref).max() / np.abs(ref).max() < 2e-6
    ub = np.asarray(p3.irfft3d(jnp.asarray(fu), shape))
    assert np.abs(ub - u).max() / np.abs(u).max() < 2e-6


def test_nl_streamed_rhs_matches_generic(rng, monkeypatch):
    """The per-component-streamed nonlinear term (768-class memory envelope,
    MPIFFT4PY_TPU_NL_STREAM=1) == the generic packed RHS on the DIF layout:
    transform + mask + purify are linear, so fwd(U_j·ω_k) − fwd(U_k·ω_j)
    per component reproduces fwd(U×ω)."""
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    shape = (16, 16, N2)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    s = NavierStokes3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule",
                       spectral_layout="packed")
    U = jnp.asarray(rng.standard_normal((3,) + shape).astype(np.float32))
    S = s._fwd_pk(U)
    kargs = s._packed_arrays()
    monkeypatch.setenv("MPIFFT4PY_TPU_NL_STREAM", "0")
    generic = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    monkeypatch.setenv("MPIFFT4PY_TPU_NL_STREAM", "1")
    streamed = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    scale = np.abs(np.asarray(generic[0])).max()
    for g, f in zip(generic, streamed):
        assert np.abs(np.asarray(g) - np.asarray(f)).max() < 1e-5 * scale


def test_vv_nl_streamed_rhs_matches_generic(rng, monkeypatch):
    """VV's streamed RHS (Biot–Savart single-component recovery +
    per-component curl/viscosity epilogue) == the generic packed VV RHS."""
    from mpifft4py_tpu.models.vv import VorticityVelocity3D

    shape = (16, 16, N2)
    FFT = slab.R2C(np.array(shape), np.array([TAU] * 3), 1, "single")
    s = VorticityVelocity3D(FFT, nu=0.01, dt=0.001, dealias="2/3-rule",
                            spectral_layout="packed")
    U = jnp.asarray(rng.standard_normal((3,) + shape).astype(np.float32))
    S = s._fwd_pk(U)
    kargs = s._packed_arrays()
    monkeypatch.setenv("MPIFFT4PY_TPU_NL_STREAM", "0")
    generic = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    monkeypatch.setenv("MPIFFT4PY_TPU_NL_STREAM", "1")
    streamed = jax.jit(lambda a, b: s.rhs_packed(a, b, *kargs))(*S)
    scale = np.abs(np.asarray(generic[0])).max()
    for g, f in zip(generic, streamed):
        assert np.abs(np.asarray(g) - np.asarray(f)).max() < 1e-5 * scale


def test_api_zdif_auto_gate(monkeypatch):
    """auto = 1024-class only (the measured win size); 0/1 force."""
    monkeypatch.delenv("MPIFFT4PY_TPU_API_ZDIF", raising=False)
    assert p3._api_zdif(1024) and not p3._api_zdif(512) \
        and not p3._api_zdif(768)
    monkeypatch.setenv("MPIFFT4PY_TPU_API_ZDIF", "1")
    assert p3._api_zdif(512)
    monkeypatch.setenv("MPIFFT4PY_TPU_API_ZDIF", "0")
    assert not p3._api_zdif(1024)
