"""Per-stage budget of the packed fused-NL DNS RHS, on chip.

Relay-safe: every timing is ONE jitted lax.scan chain ending in a scalar
fetch.  Stages whose output shape differs from their input are chained with
an epsilon feedback (out folded back into the carry) so the scan has a true
data dependency; the feedback's own elementwise cost is measured separately
(`feedback_only`) and can be subtracted.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/rhs_profile_onchip.py [N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def chain(fn, args, iters=10):
    """Device ms/iteration of carry -> fn(carry) (matching structures)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    f = jax.jit(lambda c: jnp.asarray(
        jax.tree_util.tree_leaves(
            lax.scan(lambda c, _: (fn(c), None), c, None, length=iters)[0]
        )[0]).ravel()[0])
    float(f(args))
    t0 = time.perf_counter()
    float(f(args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp
    from mpifft4py_tpu import slab
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D
    from mpifft4py_tpu.ops import pallas_fft3d as p3

    FFT = slab.R2C(np.array([N] * 3), np.array([2 * np.pi] * 3), None,
                   "single")
    s = NavierStokes3D(FFT, nu=1 / 1600, dt=0.002, dealias="2/3-rule",
                       spectral_layout="packed")
    Ur, Ui = s.taylor_green()
    k0, k1, k2, m0, m1, m2 = s._step_args()
    h = Ur.shape[-1]
    eps = jnp.float32(1e-30)
    iters = 10 if N <= 256 else 4
    out = {}

    def rec(name, ms):
        out[name] = round(ms, 2)
        print(json.dumps({name: out[name]}), flush=True)

    # whole RHS: (Ur, Ui) -> (dUr, dUi), directly chainable
    rec("rhs", chain(lambda c: s.rhs_packed(c[0], c[1], k0, k1, k2,
                                            m0, m1, m2), (Ur, Ui), iters))

    # stage A: state+curl inverse (packed pair -> two physical 3-stacks)
    def A(c):
        U, W = s._bwd_state_curl_pk(c[0], c[1], k0, k1, k2)
        return (c[0] + eps * U[..., :h], c[1] + eps * W[..., :h])
    rec("A_state_curl_inverse", chain(A, (Ur, Ui), iters))

    # feedback-only control for A's epsilon adds (two slice-adds)
    U0, W0 = jax.jit(lambda a, b: s._bwd_state_curl_pk(a, b, k0, k1, k2))(
        Ur, Ui)
    rec("A_feedback_only", chain(
        lambda c: (c[0] + eps * U0[..., :h], c[1] + eps * W0[..., :h]),
        (Ur, Ui), iters))

    # stage B: fused NL forward + epilogue ((U, W, Sr, Si) carry; dU feeds Sr)
    if s._nl_any_fused:
        def B(c):
            U, W, Sr, Si = c
            dUr, dUi = s._nl_fwd_epilogue_pk(U, W, Sr, Si,
                                             (k0, k1, k2, m0, m1, m2),
                                             "project", s.nu)
            return (U, W, Sr + eps * dUr, Si + eps * dUi)
        rec("B_nl_fwd_epilogue", chain(B, (U0, W0, Ur, Ui), iters))
        rec("B_feedback_only", chain(
            lambda c: (c[0], c[1], c[2] + eps * Ur, c[3] + eps * Ui),
            (U0, W0, Ur, Ui), iters))

    # kernel-level: the two NL kernels separately (serial path only)
    if getattr(s, "_nl_fused", False):
        def C(c):
            U, W = c
            Fr, Fi = p3.cross_rfft_zy_packed(U, W)
            return (U.at[..., :h].add(eps * Fr), W)
        rec("C_cross_zy_fwd_kernel", chain(C, (U0, W0), iters))
        Fr0, Fi0 = jax.jit(p3.cross_rfft_zy_packed)(U0, W0)
        rec("C_feedback_only", chain(
            lambda c: (c[0].at[..., :h].add(eps * Fr0), c[1]), (U0, W0),
            iters))

        def D(c):
            Sr, Si = c
            dUr, dUi = p3.fft_x_epilogue_packed(Fr0, Fi0, Sr, Si,
                                                k0, k1, k2, m0, m1, m2,
                                                mode="project",
                                                visc=float(s.nu))
            return (Sr + eps * dUr, Si + eps * dUi)
        rec("D_x_epilogue_kernel", chain(D, (Ur, Ui), iters))

    # integrator overhead: step - 4*rhs
    stepms = None
    try:
        o = s.run((Ur, Ui), iters)
        float(s.energy(o))
        t0 = time.perf_counter()
        o = s.run(o, iters)
        float(s.energy(o))
        stepms = (time.perf_counter() - t0) / iters * 1e3
        rec("full_rk4_step", stepms)
    except Exception as e:
        print("step timing failed:", e)
    print(json.dumps({"N": N, "profile": out}))


if __name__ == "__main__":
    main()
