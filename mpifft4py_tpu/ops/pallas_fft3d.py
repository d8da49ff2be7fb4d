"""Planar 3D r2c/c2r FFT pipeline — factored MXU kernels, minimal HBM traffic.

Second-generation Pallas tier (see ``pallas_fft.py`` for the dense per-axis
reference kernels).  Two ideas buy the speed:

1. **Planar end-to-end**: Mosaic has no complex dtype, so complex64 arrays
   cost a split (re/im) before and a merge after every kernel.  Here the
   whole 3D transform runs on (re, im) float32 pairs; complex appears only at
   the API boundary (and not at all inside a fused round trip / DNS step).

2. **Factored contraction, K=128**: a length-n DFT with n = r·m (m <= 128)
   runs as r DIT sub-FFTs — matmuls shaped (rows, m)·(m, m), i.e. full MXU
   contraction utilisation — plus an O(r) elementwise twiddle-combine on the
   VPU.  For n=256 this halves MXU work vs the dense n×n DFT at identical
   accuracy (HIGHEST precision, needed for the 1e-6 fp32 target); n=512/1024
   save 4×/8×.  Sub-sequence selection x[q::r] is a free sublane reshape —
   the contracted axis is never the lane axis (r2c/c2r handle the last axis
   with rectangular real matmuls instead, which are cheap: real×real).

Supported: c2c along any non-last axis (any n = r·m, r<=8, m<=128 after
factoring by the largest m); r2c/c2r along the last axis (dense rectangular,
even n).  Callers fall back to ``jnp.fft`` outside this envelope.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fft_axis_planar", "rfft_last_planar", "irfft_last_planar",
           "rfft3d", "irfft3d", "supported_c2c", "supported_r2c"]

_PREC = lax.Precision.HIGHEST

def _mm_mode() -> str:
    import os
    return os.environ.get("MPIFFT4PY_TPU_MATMUL", "highest")


def _combine_mode() -> str:
    """Twiddle-combine strategy for the factored DIT: "hier" (default —
    pre-twiddle + radix-2 block DFT) or "direct" (r² accumulation)."""
    import os
    return os.environ.get("MPIFFT4PY_TPU_COMBINE", "hier")


def _dot(a, b):
    """MXU matmul at the selected precision tier.

    Default HIGHEST = XLA's 6-pass bf16 emulation of fp32 (measured ~3e-7
    relative on a 1024-point dense DFT — the 1e-6 fp32 target's tier).
    Opt-in ``MPIFFT4PY_TPU_MATMUL=bf16x3``: manual 3-pass hi/lo-bf16 split
    (the "HIGH" tier Mosaic does not expose) — measured 1.54× faster on the
    dense z matmul at n=1024, accuracy ~4e-6 relative.  NOT within the 1e-6
    target; for DNS production runs whose nonlinear term tolerates ~1e-5.
    """
    if _mm_mode() == "bf16x3":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = partial(jnp.dot, preferred_element_type=jnp.float32)
        return d(ah, bh) + (d(ah, bl) + d(al, bh))
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_PREC)



_TUNED_R = {256: 4}   # measured on v5e: r=4/m=64 API roundtrip 2.559 vs
                      # 2.684 ms at 256³ (the K=64 contraction costs less
                      # than the halved madds save) — BENCH.md round 4


def _factor(n: int, tuned: bool = False):
    """n = r·m with the largest m <= 128 dividing n; returns (r, m).

    ``tuned=True`` (the plain transform stages: fft_axis_planar,
    fused_zy_*) consults the measured _TUNED_R table first — scoped to the
    exact kernels the on-chip A/B covered; the fused cross/epilogue/rdma
    kernels keep the largest-m default (their r=4/m=64 programs are
    unmeasured).  MPIFFT4PY_TPU_FACTOR="n:r[,n:r…]" overrides r for
    specific n everywhere (the A/B knob)."""
    import os
    env = os.environ.get("MPIFFT4PY_TPU_FACTOR", "")
    if env:
        for part in env.split(","):
            ns, _, rs = part.partition(":")
            if ns.strip() and int(ns) == n:
                r = int(rs)
                assert n % r == 0, (n, r)
                return r, n // r
    if tuned and n in _TUNED_R:
        r = _TUNED_R[n]
        return r, n // r
    for m in range(min(n, 128), 0, -1):
        if n % m == 0:
            return n // m, m
    return n, 1


def supported_c2c(n: int) -> bool:
    r, m = _factor(n)
    return r <= 8 and m >= 8


def supported_r2c(n: int) -> bool:
    return n % 2 == 0 and 16 <= n <= 2048


@lru_cache(maxsize=None)
def _dft_cs(m: int, sign: int, scale: float = 1.0):
    """DFT_m matrix pair.  ``scale`` folds a normalisation into the matrix:
    every output of the factored stage is linear in W (E_q = W @ x_q feeds
    both combine modes), so scaling W scales the stage output for free —
    the inverse stages' 1/n post-multiply was a full extra HBM pass over
    the pair (~4/8 ms at 768³/1024³ per stage, stage-budget audit r5)."""
    jk = np.outer(np.arange(m), np.arange(m))
    ang = sign * 2.0 * np.pi * jk / m
    c = np.cos(ang) * scale
    s = np.sin(ang) * scale
    return c.astype(np.float32), s.astype(np.float32)


@lru_cache(maxsize=None)
def _combine_cs(n: int, r: int, m: int, sign: int):
    """Twiddle-combine phases flattened to ((r·r·m), 1):
    row (p·r+q)·m + k  holds  exp(sign·2πi·q·(k+p·m)/n)  (cos, sin)."""
    p = np.arange(r)[:, None, None]
    q = np.arange(r)[None, :, None]
    k = np.arange(m)[None, None, :]
    ang = sign * 2.0 * np.pi * q * (k + p * m) / n
    c = np.cos(ang).astype(np.float32).reshape(r * r * m, 1)
    s = np.sin(ang).astype(np.float32).reshape(r * r * m, 1)
    return c, s


def _karatsuba(ar, ai, br, bi):
    """(ar+i·ai)·(br+i·bi) matmul via 3 real MXU matmuls; contracts dim 0 of b."""
    t1 = _dot(ar, br)
    t2 = _dot(ai, bi)
    t3 = _dot(ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


def _block_dft(G, w, r):
    """X_p = Σ_q w(p·q)·G_q across the list of (re, im) block values —
    recursive radix-2 Cooley–Tukey on the BLOCK index (direct for odd
    factors: r=3 in practice).  ``w(j)`` returns the scalar w_r^j as a
    (re, im) pair of PYTHON floats — compile-time immediates, NOT (1,1)
    table slices: Mosaic cannot lower a (1,1)->(m,TQ) vector broadcast on
    hardware ("Broadcast in both sublanes and lanes", caught on-chip at
    512-class r=4; radix-2 never calls w so 256-class masked it).  w(0) is
    skipped (identity)."""
    if r == 1:
        return G
    if r % 2:                                   # direct odd-radix base
        out = []
        for p in range(r):
            ar, ai = G[0]
            for q in range(1, r):
                sr, si = w(p * q)
                gr, gi = G[q]
                if (p * q) % r == 0:
                    ar, ai = ar + gr, ai + gi
                else:
                    ar = ar + (sr * gr - si * gi)
                    ai = ai + (sr * gi + si * gr)
            out.append((ar, ai))
        return out
    h = r // 2
    E = _block_dft(G[0::2], lambda j: w(2 * j), h)
    O = _block_dft(G[1::2], lambda j: w(2 * j), h)
    out = [None] * r
    for p in range(h):
        if p == 0:
            tr, ti = O[0]
        else:
            sr, si = w(p)
            orr, oi = O[p]
            tr = sr * orr - si * oi
            ti = sr * oi + si * orr
        er, ei = E[p]
        out[p] = (er + tr, ei + ti)
        out[p + h] = (er - tr, ei - ti)
    return out


def _factored_vals(xr, xi, wr, wi, crv, civ, r, m, sign):
    """Factored DIT over the sublane axis of 2D (n, TQ) VALUES; returns values.

    x[q::r] selection = reshape (n, TQ) -> (m, r, TQ)[:, q, :] (sublane split).
    E_q = fft_m(x[q::r]) via W (m, m) complex matmuls contracting sublanes.
    out[k + p·m] = Σ_q phase[p, q, k] · E_q[k]  with
    phase[p, q, k] = w_n^{q·k} · w_r^{p·q}  — so the combine runs
    HIERARCHICALLY: pre-twiddle each E_q by w_n^{q·k} (the table's p=0
    block), then an r-point DFT ACROSS blocks via radix-2 recursion
    (_block_dft).  vs the direct r² accumulation this cuts the VPU combine
    from ~8·r to ~(6 + ~7·log₂r) flops/element at r ∈ {4, 6, 8} — the
    512/768/1024-class y/x stages (BENCH.md: 256³ DNS 60.2→53.4 ms/step on
    chip).  Scalars w_r^j = exp(sign·2πi·j/r) are Python-float immediates
    (``sign`` must match the table's): (1,1) table slices need a both-axes
    Mosaic broadcast that fails hardware lowering (see _block_dft).
    MPIFFT4PY_TPU_COMBINE=direct restores the old path."""
    TQ = xr.shape[-1]
    Er, Ei = [], []
    for q in range(r):
        if r > 1:
            sr = xr.reshape(m, r, TQ)[:, q, :]
            si = xi.reshape(m, r, TQ)[:, q, :]
        else:
            sr, si = xr, xi
        er, ei = _karatsuba(wr, wi, sr, si)
        Er.append(er)
        Ei.append(ei)
    if r == 1:
        return Er[0], Ei[0]
    if _combine_mode() != "direct":
        G = [(Er[0], Ei[0])]
        for q in range(1, r):                  # pre-twiddle (p=0 table block)
            cr = crv[q * m:(q + 1) * m, :]     # (m, 1) broadcast over TQ
            ci = civ[q * m:(q + 1) * m, :]
            G.append((cr * Er[q] - ci * Ei[q], cr * Ei[q] + ci * Er[q]))

        def w(j):                              # w_r^j, Python-float immediates
            ang = sign * 2.0 * np.pi * (j % r) / r
            return float(np.float32(np.cos(ang))), float(np.float32(np.sin(ang)))

        X = _block_dft(G, w, r)
        return (jnp.concatenate([x[0] for x in X], axis=0),
                jnp.concatenate([x[1] for x in X], axis=0))
    outs_r, outs_i = [], []
    for p in range(r):
        accr = acci = None
        for q in range(r):
            row = (p * r + q) * m
            cr = crv[row:row + m, :]              # (m, 1) broadcast over TQ
            ci = civ[row:row + m, :]
            tr = cr * Er[q] - ci * Ei[q]
            ti = cr * Ei[q] + ci * Er[q]
            accr = tr if accr is None else accr + tr
            acci = ti if acci is None else acci + ti
        outs_r.append(accr)
        outs_i.append(acci)
    return jnp.concatenate(outs_r, axis=0), jnp.concatenate(outs_i, axis=0)


def _factored_fft_kernel(n, r, m, sign,
                         xr_ref, xi_ref, wr_ref, wi_ref, cr_ref, ci_ref,
                         or_ref, oi_ref):
    yr, yi = _factored_vals(xr_ref[0], xi_ref[0], wr_ref[...], wi_ref[...],
                            cr_ref[...], ci_ref[...], r, m, sign)
    or_ref[0] = yr
    oi_ref[0] = yi


def _pick_tq(n: int, q: int, r: int, m: int) -> int:
    """Lane-tile that keeps VMEM residency under budget.

    Live per lane-column (float32 words): 2·(in re,im) + 2·(out) blocks ×2 for
    Mosaic double-buffering → 16n, plus r sub-FFT results (2·r·m) and matmul
    temporaries (~4m).  512³ exceeded the 16 MB scoped limit before this
    accounting existed (r=4 scratch unbudgeted).  12 MB budget: lets n=256
    take tq=256 (measured 3% faster than 128; 10.5 MB estimated residency,
    verified on-chip) while 512/1024 stay at 128."""
    env = os.environ.get("MPIFFT4PY_TPU_TQ")
    if env and q % int(env) == 0:
        return int(env)
    budget = 12 * 1024 * 1024
    per_tq = (16 * n + 2 * r * m + 4 * m) * 4
    tq = 128
    while per_tq * tq * 2 <= budget and q % (tq * 2) == 0:
        tq *= 2
    return tq if q % tq == 0 else q


def fft_axis_planar(xr, xi, axis: int, inverse: bool = False):
    """c2c DFT along a non-last ``axis`` of planar float32 (re, im) arrays.

    One HBM pass; factored MXU contraction.  Inverse includes the 1/n scale.
    """
    axis = axis % xr.ndim
    assert axis != xr.ndim - 1, "last axis: use the r2c/c2r kernels or transpose"
    n = xr.shape[axis]
    r, m = _factor(n, tuned=True)
    # r = 16 parses and is interpret-correct, but the 2048-class single
    # pass does NOT fit scoped VMEM on hardware: (2048, 1024) pairs
    # measured 40.1 MB scoped at r=16/m=128 and 24.5 MB at r=8/m=256
    # (MPIFFT4PY_TPU_FACTOR=2048:8) vs the 16 MB limit — the unrolled
    # butterfly holds all block temporaries at once (BENCH.md round 5).
    # A 2048-point axis therefore needs a two-pass cascade (not built);
    # consumers gate on r <= 8 for hardware.
    assert r <= 16 and m >= 8, (n, r, m)
    sign = +1 if inverse else -1
    pre = int(np.prod(xr.shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(xr.shape[axis + 1:], dtype=np.int64))
    x3r = xr.reshape(pre, n, post)
    x3i = xi.reshape(pre, n, post)
    tq = _pick_tq(n, post, r, m)
    if pre == 1 and not os.environ.get("MPIFFT4PY_TPU_TQ"):
        # axis-0 stage: blocks walk n strided rows of tq·4 bytes at the
        # N1·h·4 row pitch; wider tiles amortise the per-row DRAM cost.
        # On-chip sweep (xstage_tq_onchip.py, post-scale-fold): −6/−9/−10%
        # at 768/512/1024; n·tq ≤ 294912 (= 768·384) is the measured
        # Mosaic scoped-VMEM compile boundary (768·512 and 1024·512 fail).
        # post >= 65536 restricts widening to the 3D axis-0 regime the sweep
        # measured (post = N1·h); small-post 2D shapes hit a scoped-VMEM
        # compile boundary 128K over the limit at (n=1024, post=512, tq=256)
        # that the huge-grid 3D programs don't.
        for cand in (512, 384, 256):
            if (n >= 512 and post >= 65536 and post % cand == 0
                    and n * cand <= 294912):
                tq = max(tq, cand)
                break
    wr, wi = _dft_cs(m, sign, scale=(1.0 / n) if inverse else 1.0)
    cr, ci = _combine_cs(n, r, m, sign)
    grid = (pre, post // tq)
    bspec_x = pl.BlockSpec((1, n, tq), lambda p, q: (p, 0, q),
                           memory_space=pltpu.VMEM)
    bspec_w = pl.BlockSpec((m, m), lambda p, q: (0, 0), memory_space=pltpu.VMEM)
    bspec_c = pl.BlockSpec((r * r * m, 1), lambda p, q: (0, 0),
                           memory_space=pltpu.VMEM)
    kernel = partial(_factored_fft_kernel, n, r, m, sign)
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec_x, bspec_x, bspec_w, bspec_w, bspec_c, bspec_c],
        out_specs=[bspec_x, bspec_x],
        out_shape=[jax.ShapeDtypeStruct(x3r.shape, jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * m * m * r * post * pre,
            bytes_accessed=4 * pre * n * post * 4, transcendentals=0),
    )
    yr, yi = fn(x3r, x3i, jnp.asarray(wr), jnp.asarray(wi),
                jnp.asarray(cr), jnp.asarray(ci))
    return yr.reshape(xr.shape), yi.reshape(xr.shape)


# ---------------------------------------------------------------------------
# r2c / c2r along the last axis (rectangular real matmuls)
# ---------------------------------------------------------------------------

def _round_up(x, m):
    return -(-x // m) * m


@lru_cache(maxsize=None)
def _rdft_cs(n: int, nfp: int, nf: int, double_last: bool = False,
             scale: float = 1.0):
    """r2c DFT matrix pair (n × nfp), columns >= nf zeroed.

    ``double_last``/``scale`` fold the 3/2-rule z-truncation (Nyquist ×2 at
    column nf−1) and the 1/padsize³ normalisation into the matmul — the
    padded pipeline then skips two full elementwise HBM passes."""
    jk = np.outer(np.arange(n), np.arange(nfp))
    ang = -2.0 * np.pi * jk / n
    c = np.cos(ang)
    s = np.sin(ang)
    c[:, nf:] = 0.0
    s[:, nf:] = 0.0
    if double_last:
        c[:, nf - 1] *= 2.0
        s[:, nf - 1] *= 2.0
    if scale != 1.0:
        c *= scale
        s *= scale
    return c.astype(np.float32), s.astype(np.float32)


@lru_cache(maxsize=None)
def _irdft_cs(n: int, nfp: int, nf: int, nf_in: int | None = None,
              scale: float = 1.0):
    # irfft(x)[j] = (1/n)[X0 + 2 Σ_{0<k<n/2} Re(Xk e^{+2πijk/n}) + X_{n/2}(−1)^j]
    #
    # ``nf_in`` < nf folds the 3/2-rule z zero-padding into the matrix: rows
    # >= nf_in vanish and the input's last live row (the N-grid Nyquist,
    # which pad_half_axis would halve) gets weight 1 instead of 2; ``scale``
    # folds the padsize³ normalisation.
    kj = np.outer(np.arange(nfp), np.arange(n))
    ang = 2.0 * np.pi * kj / n
    w = np.zeros((nfp, 1), np.float64)
    w[0] = 1.0
    w[1:min(nf - 1, nfp)] = 2.0
    if nf - 1 < nfp:
        w[nf - 1] = 1.0
    cut = nf
    if nf_in is not None:
        w[nf_in - 1] = 1.0          # halved pad × weight 2 ⇒ net 1
        cut = nf_in
    c = (np.cos(ang) * w * (scale / n)).astype(np.float32)
    s = (np.sin(ang) * w * (scale / n)).astype(np.float32)
    c[cut:, :] = 0.0
    s[cut:, :] = 0.0
    return c, s


def _rfft_kernel(x_ref, cr_ref, ci_ref, or_ref, oi_ref):
    x = x_ref[0]
    or_ref[0] = _dot(x, cr_ref[...])
    oi_ref[0] = _dot(x, ci_ref[...])


def _pick_tr(R: int, n: int = 256, ncols: int = 256) -> int:
    """Row tile for the r2c/c2r kernels under the 16 MB scoped-VMEM limit:
    2×(in + out) double-buffered blocks + the two (n × ncols) constant
    matrices must fit (1024³ exceeded the limit with a fixed 512 tile)."""
    budget = 10 * 1024 * 1024 - 2 * n * ncols * 4
    per_tr = (n + 2 * ncols) * 4 * 2
    for tr in (512, 256, 128):
        if R % tr == 0 and per_tr * tr <= budget:
            return tr
    return R if per_tr * R <= budget else 128


def rfft_last_planar(x, nf=None, scale: float = 1.0):
    """real (…, n) -> planar (re, im) of shape (…, nfp) with nfp = ceil(nf/128)·128.

    Columns beyond nf are structural zeros (alignment padding — same
    convention as the pencil decomposition's Nfp).  Passing ``nf`` < n//2+1
    folds the 3/2-rule truncation (Nyquist-doubled at nf−1) into the matrix;
    ``scale`` folds a normalisation factor — both save a full elementwise
    HBM pass on the padded pipelines."""
    n = x.shape[-1]
    full_nf = n // 2 + 1
    trunc = nf is not None and nf < full_nf
    if nf is None:
        nf = full_nf
    nfp = _round_up(nf, 128)
    R = int(np.prod(x.shape[:-1], dtype=np.int64))
    xr = x.astype(jnp.float32).reshape(1, R, n)
    cr, ci = _rdft_cs(n, nfp, nf, trunc, float(scale))
    tr = _pick_tr(R, n, nfp)
    fn = pl.pallas_call(
        _rfft_kernel,
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec((1, tr, n), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, nfp), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, nfp), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr, nfp), lambda r: (0, r, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, R, nfp), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(flops=2 * 2 * n * nfp * R,
                                      bytes_accessed=(R * n + 2 * R * nfp) * 4,
                                      transcendentals=0),
    )
    yr, yi = fn(xr, jnp.asarray(cr), jnp.asarray(ci))
    shp = x.shape[:-1] + (nfp,)
    return yr.reshape(shp), yi.reshape(shp)


def _irfft_kernel(xr_ref, xi_ref, cr_ref, ci_ref, o_ref):
    o_ref[0] = (_dot(xr_ref[0], cr_ref[...])
                - _dot(xi_ref[0], ci_ref[...]))


def irfft_last_planar(xr, xi, n: int, nf_in=None, scale: float = 1.0):
    """planar (…, nfp) -> real (…, n); columns >= nf are ignored (must be pad).

    ``nf_in`` < n//2+1 folds the 3/2-rule zero-pad into the matrix (input
    carries only the N-grid modes; its Nyquist row gets the halved-pad
    weight); ``scale`` folds the padsize³ normalisation."""
    nf = n // 2 + 1
    nfp = xr.shape[-1]
    assert nfp >= (nf if nf_in is None else nf_in) and nfp % 128 == 0, \
        (nfp, nf, nf_in)
    R = int(np.prod(xr.shape[:-1], dtype=np.int64))
    cr, ci = _irdft_cs(n, nfp, nf, nf_in, float(scale))
    tr = _pick_tr(R, n, nfp)
    fn = pl.pallas_call(
        _irfft_kernel,
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec((1, tr, nfp), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, nfp), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nfp, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nfp, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, n), lambda r: (0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R, n), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=2 * 2 * n * nfp * R,
                                      bytes_accessed=(R * n + 2 * R * nfp) * 4,
                                      transcendentals=0),
    )
    y = fn(xr.reshape(1, R, nfp), xi.reshape(1, R, nfp),
           jnp.asarray(cr), jnp.asarray(ci))
    return y.reshape(xr.shape[:-1] + (n,))


# ---------------------------------------------------------------------------
# c2c along the LAST axis (dense, lane contraction) + full c2c 3D chain
# ---------------------------------------------------------------------------

def _cfft_last_planar_kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref):
    # out[t, k] = Σ_j x[t, j] W[j, k]
    xr = xr_ref[0]
    xi = xi_ref[0]
    wr = wr_ref[...]
    wi = wi_ref[...]
    t1 = _dot(xr, wr)
    t2 = _dot(xi, wi)
    t3 = _dot(xr + xi, wr + wi)
    or_ref[0] = t1 - t2
    oi_ref[0] = t3 - t1 - t2


@lru_cache(maxsize=None)
def _dense_cs(n: int, sign: int, scale: float = 1.0):
    jk = np.outer(np.arange(n), np.arange(n))
    ang = sign * 2.0 * np.pi * jk / n
    c = np.cos(ang) * scale
    s = np.sin(ang) * scale
    return c.astype(np.float32), s.astype(np.float32)


def fft_last_planar_c2c(xr, xi, inverse: bool = False):
    """c2c DFT along the last axis of planar arrays (dense n×n, one pass)."""
    n = xr.shape[-1]
    sign = +1 if inverse else -1
    R = int(np.prod(xr.shape[:-1], dtype=np.int64))
    wr, wi = _dense_cs(n, sign, scale=(1.0 / n) if inverse else 1.0)
    tr = _pick_tr(R, n, n)
    fn = pl.pallas_call(
        _cfft_last_planar_kernel,
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec((1, tr, n), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, n), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr, n), lambda r: (0, r, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, R, n), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(flops=2 * 3 * n * n * R,
                                      bytes_accessed=4 * R * n * 4,
                                      transcendentals=0),
    )
    yr, yi = fn(xr.reshape(1, R, n), xi.reshape(1, R, n),
                jnp.asarray(wr), jnp.asarray(wi))
    return yr.reshape(xr.shape), yi.reshape(xr.shape)


def cfft3d(x, inverse: bool = False) -> jnp.ndarray:
    """Full 3D c2c transform of a complex64 array (fftn/ifftn conventions)."""
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    yr, yi = fft_last_planar_c2c(xr, xi, inverse)
    yr, yi = fft_axis_planar(yr, yi, axis=1, inverse=inverse)
    yr, yi = fft_axis_planar(yr, yi, axis=0, inverse=inverse)
    return lax.complex(yr, yi)


def supported_c2c_last(n: int) -> bool:
    return 16 <= n <= 1024 and n % 128 == 0


# ---------------------------------------------------------------------------
# Packed-Hermitian r2c / c2r (width exactly n/2 — no Nyquist column)
# ---------------------------------------------------------------------------
#
# Classic packed-real format: the z-spectrum is stored in h = n/2 complex
# columns with  P[k] = X[k] (k = 1..h-1)  and  P[0] = X[0] + i·X[n/2]  (both
# real for real input).  Subsequent y/x transforms are complex-linear, so the
# two rider planes stay separable: after the full 3D forward,
#   F[X0](k)   = (Q(k) + conj(Q(-k)))/2,
#   F[Xny](k)  = (Q(k) - conj(Q(-k)))/(2i),      Q = packed plane 0,
# recovered by a flip-conj epilogue on 1/h of the data.  Benefits: lane width
# is exactly a multiple of 128 (no 129→256 padding waste), and the y/x stages
# do HALF the matmul work of the naive Nf-padded layout.


@lru_cache(maxsize=None)
def _packed_rdft_cs(n: int):
    h = n // 2
    j = np.arange(n)[:, None]
    k = np.arange(h)[None, :]
    A = np.cos(2.0 * np.pi * j * k / n)
    B = -np.sin(2.0 * np.pi * j * k / n)
    A[:, 0] = 1.0
    B[:, 0] = np.cos(np.pi * np.arange(n))          # (−1)^j  → X[n/2] rider
    return A.astype(np.float32), B.astype(np.float32)


@lru_cache(maxsize=None)
def _packed_irdft_cs(n: int):
    h = n // 2
    k = np.arange(h)[:, None]
    j = np.arange(n)[None, :]
    C = 2.0 * np.cos(2.0 * np.pi * k * j / n) / n
    D = -2.0 * np.sin(2.0 * np.pi * k * j / n) / n
    C[0, :] = 1.0 / n
    D[0, :] = np.cos(np.pi * np.arange(n)) / n      # X[n/2]·(−1)^j / n
    return C.astype(np.float32), D.astype(np.float32)


def _zdif_on(n: int, dif: bool) -> bool:
    """Whether a packed z-stage call rides the DIF-split kernels
    (ops.pallas_zdif — k-decimated lane order, ``zdif_perm``).  ``dif`` is
    the caller's layout choice: True only from the packed INTERFACE (whose
    spectral lane order is free); the complex API boundary always passes
    False and keeps the natural-order dense kernels."""
    if not dif:
        return False
    from . import pallas_zdif as zd
    return zd.zdif_active(n)


def rfft_last_packed(x, dif: bool = False):
    """real (…, n) -> packed planar (re, im), shape (…, n/2).

    ``dif=True`` (packed-interface callers only): ride the DIF-split z-stage
    where gated (512/768/1024-class) — 2/r of the dense MXU cost, output in
    ``pallas_zdif.zdif_perm`` lane order (consumers permute their k2/m2
    vectors; lane 0 stays the plane-0 rider)."""
    n = x.shape[-1]
    h = n // 2
    assert h % 128 == 0, f"packed layout needs (n/2) % 128 == 0, got n={n}"
    if _zdif_on(n, dif):
        from . import pallas_zdif as zd
        return zd.rfft_last_zdif(x)
    if _zfact_ok(n):
        return _rfft_last_packed_fact(x)
    R = int(np.prod(x.shape[:-1], dtype=np.int64))
    xr = x.astype(jnp.float32).reshape(1, R, n)
    A, B = _packed_rdft_cs(n)
    tr = _pick_tr(R, n, h)
    fn = pl.pallas_call(
        _rfft_kernel,
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec((1, tr, n), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, h), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, h), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr, h), lambda r: (0, r, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, R, h), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(flops=2 * 2 * n * h * R,
                                      bytes_accessed=(R * n + 2 * R * h) * 4,
                                      transcendentals=0),
    )
    yr, yi = fn(xr, jnp.asarray(A), jnp.asarray(B))
    shp = x.shape[:-1] + (h,)
    return yr.reshape(shp), yi.reshape(shp)


# ---------------------------------------------------------------------------
# factored packed r2c/c2r (large n): in-kernel transpose + half-length c2c
# ---------------------------------------------------------------------------
#
# The dense (n × h) matrices cost 2n madds per output element — at n = 1024
# the z stage was 40% of the whole 1024³ round trip (145 of 364 ms measured).
# Classic half-length algorithm instead: z_t = x[2t] + i·x[2t+1],
# Z = FFT_h(z) (factored DIT over SUBLANES — ~3m madds), then
#   E(k) = (Z[k] + conj Z[h−k])/2,  O(k) = (Z[k] − conj Z[h−k])/(2i),
#   X[k] = E(k) + e^{−2πik/n}·O(k)                        (k = 1..h−1)
#   X[0] = Re Z₀ + Im Z₀,  X_Nyq = Re Z₀ − Im Z₀          (plane-0 riders)
# The z axis lives on LANES in HBM, so the kernel transposes its block
# in-VMEM (lane↔sublane), contracts over sublanes, and transposes back —
# one HBM pass, ~4-5× fewer MXU flops than the dense matmul at n ≥ 512.

def _zfact_ok(n: int) -> bool:
    # MEASURED NEGATIVE RESULT (v5e, 2026-08): the factored route is 2.8×
    # SLOWER than the dense matmuls despite 4-5× fewer MXU flops — Mosaic
    # lowers the in-kernel (TR, n) transposes as slow shuffles (9.4 ms for a
    # 0.5 GB in+out pair, ~3× copy bandwidth) and an XLA lane-axis flip costs
    # 23.7 ms where ~2 ms of elementwise work was expected.  Kept as an
    # opt-in experiment (MPIFFT4PY_TPU_ZFACT=1); parity-tested in
    # tests/test_pallas_fft.py either way.
    import os
    if os.environ.get("MPIFFT4PY_TPU_ZFACT", "0") not in ("1", "true", "force"):
        return False
    h = n // 2
    if n < 512 or h % 128 != 0:
        return False
    r, m = _factor(h)
    return r <= 8 and m >= 64


@lru_cache(maxsize=None)
def _half_twiddle(n: int, sign: int):
    """(cos, sin) of sign·2πk/n for k = 0..h−1, shaped (h,)."""
    h = n // 2
    ang = sign * 2.0 * np.pi * np.arange(h) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _flip_conj_lanes(Zr, Zi):
    """Z[(h−k) mod h] over the LANE (last) axis — XLA side; Mosaic cannot
    lower `rev`, so the conjugate-symmetric combine lives outside the kernel
    (it fuses into one elementwise pass)."""
    return (jnp.roll(jnp.flip(Zr, axis=-1), 1, axis=-1),
            jnp.roll(jnp.flip(Zi, axis=-1), 1, axis=-1))


def _zcombine_fwd(Zr, Zi, n):
    """Z = FFT_h(x_even + i·x_odd)  →  packed X (plane 0 = X₀ + i·X_Nyq)."""
    Zfr, Zfi = _flip_conj_lanes(Zr, Zi)
    Er, Ei = 0.5 * (Zr + Zfr), 0.5 * (Zi - Zfi)
    Or, Oi = 0.5 * (Zi + Zfi), 0.5 * (Zfr - Zr)
    c, s = _half_twiddle(n, -1)
    c, s = jnp.asarray(c), jnp.asarray(s)
    Xr = Er + c * Or - s * Oi
    Xi = Ei + c * Oi + s * Or
    Xi = Xi.at[..., 0].set(Zr[..., 0] - Zi[..., 0])   # rider: X_Nyquist
    return Xr, Xi


def _zcombine_bwd(Xr, Xi, n):
    """packed X → Z (the half-length spectrum to inverse-transform)."""
    Xfr, Xfi = _flip_conj_lanes(Xr, Xi)
    Er, Ei = 0.5 * (Xr + Xfr), 0.5 * (Xi - Xfi)
    Dr, Di = 0.5 * (Xr - Xfr), 0.5 * (Xi + Xfi)
    c, s = _half_twiddle(n, +1)
    c, s = jnp.asarray(c), jnp.asarray(s)
    Or = c * Dr - s * Di
    Oi = c * Di + s * Dr
    # plane-0 riders: X[0] = Xr₀, X_Nyq = Xi₀ (both real)
    Er = Er.at[..., 0].set(0.5 * (Xr[..., 0] + Xi[..., 0]))
    Ei = Ei.at[..., 0].set(0.0)
    Or = Or.at[..., 0].set(0.5 * (Xr[..., 0] - Xi[..., 0]))
    Oi = Oi.at[..., 0].set(0.0)
    return Er - Oi, Ei + Or                    # Z = E + i·O


def _zpack_fft_kernel(h, r, m, x_ref, wr_ref, wi_ref, cr_ref, ci_ref,
                      zr_ref, zi_ref):
    xt = x_ref[0].T                            # (n, TR): z on sublanes
    z = xt.reshape(h, 2, xt.shape[-1])         # even/odd sample split
    Zr, Zi = _factored_vals(z[:, 0, :], z[:, 1, :], wr_ref[...], wi_ref[...],
                            cr_ref[...], ci_ref[...], r, m, -1)
    zr_ref[0] = Zr.T
    zi_ref[0] = Zi.T


def _zpack_ifft_kernel(h, r, m, zr_ref, zi_ref, wr_ref, wi_ref,
                       cr_ref, ci_ref, o_ref):
    Zr = zr_ref[0].T                           # (h, TR)
    Zi = zi_ref[0].T
    zr, zi = _factored_vals(Zr, Zi, wr_ref[...], wi_ref[...],
                            cr_ref[...], ci_ref[...], r, m, +1)
    inv = jnp.float32(1.0 / h)
    y = jnp.stack([zr * inv, zi * inv], axis=1)  # re-interleave even/odd
    o_ref[0] = y.reshape(2 * h, zr.shape[-1]).T


def _pick_tr_fact(n: int, R: int) -> int:
    """Row tile for the factored z kernels: transposed block + temporaries
    (~6 h·TR values live) + (m, m) consts, double-buffered."""
    h = n // 2
    if R <= 128:
        return R
    budget = 10 * 1024 * 1024 - 2 * (128 * 128 * 2) * 4
    per_tr = (n * 2 + 6 * h) * 4 * 2
    for tr in (512, 256, 128):
        if R % tr == 0 and per_tr * tr * 2 <= budget:
            return tr
    return 128  # non-dividing R: trailing partial block is masked by pallas


def _rfft_last_packed_fact(x):
    n = x.shape[-1]
    h = n // 2
    r, m = _factor(h)
    R = int(np.prod(x.shape[:-1], dtype=np.int64))
    xr = x.astype(jnp.float32).reshape(1, R, n)
    wr, wi = _dft_cs(m, -1)
    cr, ci = _combine_cs(h, r, m, -1)
    tr = _pick_tr_fact(n, R)
    c2 = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        partial(_zpack_fft_kernel, h, r, m),
        grid=(-(-R // tr),),
        in_specs=[pl.BlockSpec((1, tr, n), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  c2((m, m)), c2((m, m)), c2((r * r * m, 1)),
                  c2((r * r * m, 1))],
        out_specs=[pl.BlockSpec((1, tr, h), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, R, h), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * m * m * r * (R // m) + 10 * R * h,
            bytes_accessed=(R * n + 2 * R * h) * 4, transcendentals=0),
    )
    Zr, Zi = fn(xr, jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(cr),
                jnp.asarray(ci))
    Xr, Xi = _zcombine_fwd(Zr, Zi, n)          # XLA: one fused flip+combine
    shp = x.shape[:-1] + (h,)
    return Xr.reshape(shp), Xi.reshape(shp)


def _irfft_last_packed_fact(xr, xi, n: int):
    h = n // 2
    r, m = _factor(h)
    R = int(np.prod(xr.shape[:-1], dtype=np.int64))
    Zr, Zi = _zcombine_bwd(xr.reshape(1, R, h), xi.reshape(1, R, h), n)
    wr, wi = _dft_cs(m, +1)
    cr, ci = _combine_cs(h, r, m, +1)
    tr = _pick_tr_fact(n, R)
    c2 = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        partial(_zpack_ifft_kernel, h, r, m),
        grid=(-(-R // tr),),
        in_specs=[pl.BlockSpec((1, tr, h), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [c2((m, m)), c2((m, m)), c2((r * r * m, 1)), c2((r * r * m, 1))],
        out_specs=pl.BlockSpec((1, tr, n), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * m * m * r * (R // m) + 10 * R * h,
            bytes_accessed=(R * n + 2 * R * h) * 4, transcendentals=0),
    )
    y = fn(Zr, Zi, jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(cr),
           jnp.asarray(ci))
    return y.reshape(xr.shape[:-1] + (n,))


def _ipacked_kernel(xr_ref, xi_ref, cr_ref, ci_ref, o_ref):
    # u = Pre·C + Pim·D
    o_ref[0] = (_dot(xr_ref[0], cr_ref[...])
                + _dot(xi_ref[0], ci_ref[...]))


def irfft_last_packed(xr, xi, n: int, dif: bool = False):
    """packed planar (…, n/2) -> real (…, n).  ``dif=True``: the input pair
    is in DIF lane order (see rfft_last_packed)."""
    h = n // 2
    assert xr.shape[-1] == h and h % 128 == 0
    if _zdif_on(n, dif):
        from . import pallas_zdif as zd
        return zd.irfft_last_zdif(xr, xi, n)
    if _zfact_ok(n):
        return _irfft_last_packed_fact(xr, xi, n)
    R = int(np.prod(xr.shape[:-1], dtype=np.int64))
    C, D = _packed_irdft_cs(n)
    tr = _pick_tr(R, n, h)
    fn = pl.pallas_call(
        _ipacked_kernel,
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec((1, tr, h), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, h), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, n), lambda r: (0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R, n), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=2 * 2 * n * h * R,
                                      bytes_accessed=(R * n + 2 * R * h) * 4,
                                      transcendentals=0),
    )
    y = fn(xr.reshape(1, R, h), xi.reshape(1, R, h),
           jnp.asarray(C), jnp.asarray(D))
    return y.reshape(xr.shape[:-1] + (n,))


def fit_width(yr, yi, w: int):
    """Truncate or zero-pad the last (planar spectral) axis to width ``w`` —
    converts between kernel widths (round_up(Nf, 128)) and decomposition
    alignment widths (Nfp)."""
    if yr.shape[-1] > w:
        return yr[..., :w], yi[..., :w]
    if yr.shape[-1] < w:
        pad = [(0, 0)] * (yr.ndim - 1) + [(0, w - yr.shape[-1])]
        return jnp.pad(yr, pad), jnp.pad(yi, pad)
    return yr, yi


def _flipconj(qr, qi, axes):
    """conj(Q(-k)) with wraparound along ``axes``."""
    fr = jnp.roll(jnp.flip(qr, axis=axes), shift=(1,) * len(axes), axis=axes)
    fi = jnp.roll(jnp.flip(qi, axis=axes), shift=(1,) * len(axes), axis=axes)
    return fr, -fi


def unpack_plane0(yr, yi, axes=(0, 1)):
    """Split packed plane 0 into the k=0 and k=Nyquist standard planes.

    ``axes`` are the already-transformed full axes (flip-conj dims); returns
    (p0, pny) complex64 arrays with the last (packed) axis removed."""
    qr, qi = yr[..., 0], yi[..., 0]
    cr, ci = _flipconj(qr, qi, axes)
    p0 = lax.complex(0.5 * (qr + cr), 0.5 * (qi + ci))
    pny = lax.complex(0.5 * (qi - ci), -0.5 * (qr - cr))   # (Q−conjQ̃)/(2i)
    return p0, pny


def pack_plane0(p0, pny):
    """Inverse of unpack: packed plane0 = p0 + i·pny (complex add)."""
    qr = jnp.real(p0) - jnp.imag(pny)
    qi = jnp.imag(p0) + jnp.real(pny)
    return qr, qi


# ---------------------------------------------------------------------------
# 3D chains (serial fast path)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Fused z+y kernels: packed rfft(z) + factored fft(y) in ONE VMEM residency
# (one HBM pass instead of two per direction).
# ---------------------------------------------------------------------------

def _fused_zy_fwd_kernel(r, m, x_ref, A_ref, B_ref, wr_ref, wi_ref,
                         cr_ref, ci_ref, or_ref, oi_ref):
    u = x_ref[0]                                   # (n1, n2) real x-slab
    pr = _dot(u, A_ref[...])                  # (n1, h) packed re
    pi = _dot(u, B_ref[...])
    yr, yi = _factored_vals(pr, pi, wr_ref[...], wi_ref[...],
                            cr_ref[...], ci_ref[...], r, m, -1)
    or_ref[0] = yr
    oi_ref[0] = yi


def _fused_zy_bwd_kernel(r, m, xr_ref, xi_ref, wr_ref, wi_ref,
                         cr_ref, ci_ref, C_ref, D_ref, o_ref):
    yr, yi = _factored_vals(xr_ref[0], xi_ref[0], wr_ref[...], wi_ref[...],
                            cr_ref[...], ci_ref[...], r, m, +1)
    n1 = yr.shape[0]
    s = np.float32(1.0 / n1)                       # fold the y-ifft 1/n1 here
    o_ref[0] = (_dot(yr, C_ref[...])
                + _dot(yi, D_ref[...])) * s


def _fused_zy_dif_fwd_kernel(ry, m, rz, x_ref, ma_ref, mb_ref, mc_ref,
                             md_ref, wr_ref, wi_ref, cr_ref, ci_ref,
                             or_ref, oi_ref):
    """DIF z-stage + factored y-FFT in one VMEM residency (the dif mirror of
    _fused_zy_fwd_kernel; output lanes in zdif_perm order)."""
    from .pallas_zdif import zdif_fwd_slots
    slots = zdif_fwd_slots(x_ref[0], ma_ref, mb_ref, mc_ref, md_ref, rz)
    pr = jnp.concatenate([s[0] for s in slots], axis=-1)
    pi = jnp.concatenate([s[1] for s in slots], axis=-1)
    yr, yi = _factored_vals(pr, pi, wr_ref[...], wi_ref[...],
                            cr_ref[...], ci_ref[...], ry, m, -1)
    or_ref[0] = yr
    oi_ref[0] = yi


def _fused_zy_dif_bwd_kernel(ry, m, rz, xr_ref, xi_ref, wr_ref, wi_ref,
                             cr_ref, ci_ref, a_ref, b_ref, c_ref, d_ref,
                             o_ref):
    from .pallas_zdif import zdif_bwd_slices, _M
    yr, yi = _factored_vals(xr_ref[0], xi_ref[0], wr_ref[...], wi_ref[...],
                            cr_ref[...], ci_ref[...], ry, m, +1)
    s = np.float32(1.0 / yr.shape[0])              # fold the y-ifft 1/n1 here
    yr = yr * s
    yi = yi * s
    sv = [(yr[:, p * _M:(p + 1) * _M], yi[:, p * _M:(p + 1) * _M])
          for p in range(rz // 2)]
    for c, xc in enumerate(zdif_bwd_slices(sv, a_ref, b_ref, c_ref, d_ref,
                                           rz)):
        o_ref[0, :, c * _M:(c + 1) * _M] = xc


def fused_zy_fwd(u, dif: bool = False):
    """real (…, N1, N2) -> packed planar (…, N1, N2/2) with y already
    transformed: one kernel, one HBM pass (vs rfft_last + fft_axis).
    Leading dims (x-slab rows, field components) batch into the grid."""
    shp = u.shape
    u = u.reshape((-1,) + shp[-2:])
    N0, N1, N2 = u.shape
    h = N2 // 2
    assert h % 128 == 0
    r, m = _factor(N1, tuned=True)
    assert r <= 8 and m >= 8
    wr, wi = _dft_cs(m, -1)
    cr, ci = _combine_cs(N1, r, m, -1)
    bx = pl.BlockSpec((1, N1, N2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bo = pl.BlockSpec((1, N1, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c2 = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    if _zdif_on(N2, dif):
        from . import pallas_zdif as zd
        rz = N2 // zd._M
        mats = [jnp.asarray(t) for t in zd._zdif_fwd_mats(N2)]
        kern = partial(_fused_zy_dif_fwd_kernel, r, m, rz)
        zspecs = [c2((rz // 2, zd._M, zd._M))] * 4
        zflops = 4 * zd._M * h + 2 * rz * N2
    else:
        A, B = _packed_rdft_cs(N2)
        mats = [jnp.asarray(A), jnp.asarray(B)]
        kern = partial(_fused_zy_fwd_kernel, r, m)
        zspecs = [c2((N2, h))] * 2
        zflops = 2 * 2 * N2 * h
    fn = pl.pallas_call(
        kern,
        grid=(N0,),
        in_specs=[bx] + zspecs + [c2((m, m)), c2((m, m)),
                                  c2((r * r * m, 1)), c2((r * r * m, 1))],
        out_specs=[bo, bo],
        out_shape=[jax.ShapeDtypeStruct((N0, N1, h), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=N0 * N1 * (zflops + 2 * 3 * m * m * r),
            bytes_accessed=(N0 * N1 * N2 + 2 * N0 * N1 * h) * 4,
            transcendentals=0),
    )
    yr, yi = fn(u.astype(jnp.float32), *mats,
                jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(cr),
                jnp.asarray(ci))
    out_shp = shp[:-1] + (h,)
    return yr.reshape(out_shp), yi.reshape(out_shp)


def fused_zy_bwd(yr, yi, n2: int, dif: bool = False):
    """packed planar (…, N1, n2/2) -> real (…, N1, n2); inverse y-fft and
    packed z-irfft fused in one kernel.  Leading dims batch into the grid.
    ``dif=True``: input pair lanes are in zdif_perm order."""
    shp = yr.shape
    yr = yr.reshape((-1,) + shp[-2:])
    yi = yi.reshape((-1,) + shp[-2:])
    N0, N1, h = yr.shape
    assert h == n2 // 2 and h % 128 == 0
    r, m = _factor(N1, tuned=True)
    wr, wi = _dft_cs(m, +1)
    cr, ci = _combine_cs(N1, r, m, +1)
    bx = pl.BlockSpec((1, N1, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bo = pl.BlockSpec((1, N1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c2 = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    if _zdif_on(n2, dif):
        from . import pallas_zdif as zd
        rz = n2 // zd._M
        mats = [jnp.asarray(t) for t in zd._zdif_bwd_mats(n2)]
        kern = partial(_fused_zy_dif_bwd_kernel, r, m, rz)
        zspecs = [c2((rz // 2, zd._M, zd._M))] * 4
        zflops = 4 * zd._M * h + 2 * rz * n2
    else:
        C, D = _packed_irdft_cs(n2)
        mats = [jnp.asarray(C), jnp.asarray(D)]
        kern = partial(_fused_zy_bwd_kernel, r, m)
        zspecs = [c2((h, n2))] * 2
        zflops = 2 * 2 * n2 * h
    fn = pl.pallas_call(
        kern,
        grid=(N0,),
        in_specs=[bx, bx, c2((m, m)), c2((m, m)),
                  c2((r * r * m, 1)), c2((r * r * m, 1))] + zspecs,
        out_specs=bo,
        out_shape=jax.ShapeDtypeStruct((N0, N1, n2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=N0 * N1 * (zflops + 2 * 3 * m * m * r),
            bytes_accessed=(N0 * N1 * n2 + 2 * N0 * N1 * h) * 4,
            transcendentals=0),
    )
    y = fn(yr, yi, jnp.asarray(wr), jnp.asarray(wi),
           jnp.asarray(cr), jnp.asarray(ci), *mats)
    return y.reshape(shp[:-1] + (n2,))


def _use_fused_zy(n1: int, n2: int) -> bool:
    if (n2 // 2) % 128 != 0:
        return False
    r, m = _factor(n1)
    # VMEM: real block n1·n2 + packed 2·n1·h (+ outs, consts, double-buffer)
    vmem = (n1 * n2 * 3 * 2 + 2 * n2 * (n2 // 2) + 2 * (n2 // 2) * n2) * 4
    return r <= 4 and m >= 64 and vmem < 12 * 1024 * 1024


def _use_packed(n2: int) -> bool:
    return (n2 // 2) % 128 == 0


def rfft3d_packed(u, dif: bool = False):
    """real (…,N0,N1,N2) -> packed planar spectral (re, im), (…,N0,N1,N2/2).

    Leading dims (e.g. velocity components) are batched — one kernel chain
    transforms the whole stack.  ``dif=True`` (packed-interface callers):
    z lanes leave in zdif_perm order where the DIF z-stage is gated."""
    if _use_fused_zy(u.shape[-2], u.shape[-1]):
        yr, yi = fused_zy_fwd(u, dif=dif)          # z+y in one HBM pass
    else:
        yr, yi = rfft_last_packed(u, dif=dif)
        yr, yi = fft_axis_planar(yr, yi, axis=u.ndim - 2)
    return fft_axis_planar(yr, yi, axis=u.ndim - 3)


def irfft3d_packed(yr, yi, s, dif: bool = False):
    yr, yi = fft_axis_planar(yr, yi, axis=yr.ndim - 3, inverse=True)
    if _use_fused_zy(s[-2], s[-1]):
        return fused_zy_bwd(yr, yi, s[-1], dif=dif)
    yr, yi = fft_axis_planar(yr, yi, axis=yr.ndim - 2, inverse=True)
    return irfft_last_packed(yr, yi, s[-1], dif=dif)


def rfft3d_planar(u):
    """real (…,N0,N1,N2) -> planar spectral (re, im) of shape (…,N0,N1,Nfp)."""
    if _use_packed(u.shape[-1]):
        return rfft3d_packed(u)
    yr, yi = rfft_last_planar(u)
    yr, yi = fft_axis_planar(yr, yi, axis=u.ndim - 2)
    return fft_axis_planar(yr, yi, axis=u.ndim - 3)


def irfft3d_planar(yr, yi, s):
    if _use_packed(s[-1]) and yr.shape[-1] == s[-1] // 2:
        return irfft3d_packed(yr, yi, s)
    yr, yi = fft_axis_planar(yr, yi, axis=yr.ndim - 3, inverse=True)
    yr, yi = fft_axis_planar(yr, yi, axis=yr.ndim - 2, inverse=True)
    return irfft_last_planar(yr, yi, s[-1])


def unpack_spectrum(yr, yi) -> jnp.ndarray:
    """packed planar (…,N0,N1,h) -> standard complex (…,N0,N1,h+1): separate
    the plane-0 riders (full-axes flip-conj) and append the Nyquist column.

    Concat deliberately: a pad+column-set formulation measured SLOWER
    (512³ 32.7 → 37.8 ms, 1024³ 364 → 414 ms round trip) — XLA fuses this
    concat chain better than dynamic-update-slices."""
    p0, pny = unpack_plane0(yr, yi, axes=(yr.ndim - 3, yr.ndim - 2))
    body = lax.complex(yr, yi)[..., 1:]
    return jnp.concatenate([p0[..., None], body, pny[..., None]], axis=-1)


def pack_spectrum(fu) -> tuple:
    """standard complex (…,N0,N1,Nf) -> packed planar pair (…,N0,N1,Nf−1)
    (plane 0 = X0 + i·X_Nyquist; pointwise, no flips)."""
    nf = fu.shape[-1]
    qr, qi = pack_plane0(fu[..., 0], fu[..., nf - 1])
    br = jnp.concatenate([qr[..., None],
                          jnp.real(fu[..., 1:nf - 1]).astype(jnp.float32)],
                         axis=-1)
    bi = jnp.concatenate([qi[..., None],
                          jnp.imag(fu[..., 1:nf - 1]).astype(jnp.float32)],
                         axis=-1)
    return br.astype(jnp.float32), bi.astype(jnp.float32)


def purify_plane0(yr, yi):
    """Drop the Nyquist rider from packed plane 0 (→ X0 exactly), leaving the
    body untouched.  Used by consumers whose spectra are Nyquist-free by
    construction (2/3-rule-dealiased states): afterwards the packed pair IS
    the spectrum on k2 = 0..h−1 and all spectral algebra is uniform."""
    qr, qi = yr[..., 0], yi[..., 0]
    axes = (qr.ndim - 2, qr.ndim - 1)  # the (k0, k1) axes of the plane
    fr = jnp.roll(jnp.flip(qr, axis=axes), (1, 1), axis=axes)
    fi = jnp.roll(jnp.flip(qi, axis=axes), (1, 1), axis=axes)
    p0r = 0.5 * (qr + fr)
    p0i = 0.5 * (qi - fi)
    yr = jnp.concatenate([p0r[..., None], yr[..., 1:]], axis=-1)
    yi = jnp.concatenate([p0i[..., None], yi[..., 1:]], axis=-1)
    return yr, yi


def _api_zdif(n2: int) -> bool:
    """Whether the COMPLEX API boundary rides the DIF z-stage: zdif kernels
    + a lane unpermute back to natural k2 order folded into the boundary.
    On-chip A/Bs (BENCH.md rounds 4–5): the unpermute implementation is
    radix-dependent (see _api_unperm) — with the structured interleave at
    r=6 the composed boundary penalty is +10.6 ms at 768³ vs the ~28 ms
    dense-z saving, so 768 flips to a net WIN; 1024 (take-based) was
    already +8%; 512³ stays a wash (saving ~4 ms vs ~5 ms composed
    permutation).  Default auto = r ∈ {6, 8} (768/1024-class);
    MPIFFT4PY_TPU_API_ZDIF=0/1 forces."""
    import os
    from .pallas_zdif import zdif_active
    env = os.environ.get("MPIFFT4PY_TPU_API_ZDIF", "auto")
    if env == "0":
        return False
    if not zdif_active(n2):
        return False
    return env == "1" or n2 // 128 >= 6


def _api_unperm(yr, yi, n2: int):
    """DIF lane order -> natural, by the measured-fastest implementation:
    r=6: dif_interleave (static 64-lane slices + stack — composes into the
    boundary concat at half the gather's marginal cost: +10.6 vs +21.1 ms
    at 768³); r=8: jnp.take (the 8-piece stack+reshape lowers WORSE than
    the gather at 1024³: 110.6 vs 88.0 composed)."""
    from .pallas_zdif import dif_interleave, zdif_iperm
    if n2 // 128 == 6:
        return dif_interleave(yr, n2), dif_interleave(yi, n2)
    ip = zdif_iperm(n2)
    return jnp.take(yr, ip, axis=-1), jnp.take(yi, ip, axis=-1)


def _api_perm(br, bi, n2: int):
    """Natural -> DIF lane order (inverse boundary), mirror of _api_unperm."""
    from .pallas_zdif import dif_deinterleave, zdif_perm
    if n2 // 128 == 6:
        return dif_deinterleave(br, n2), dif_deinterleave(bi, n2)
    pm = zdif_perm(n2)
    return jnp.take(br, pm, axis=-1), jnp.take(bi, pm, axis=-1)


def rfft3d(u) -> jnp.ndarray:
    """numpy-convention rfftn over the LAST THREE axes of real input —
    complex64 out, (…,N0,N1,Nf).  Leading axes batch."""
    nf = u.shape[-1] // 2 + 1
    if _use_packed(u.shape[-1]):
        if _api_zdif(u.shape[-1]):
            yr, yi = rfft3d_packed(u, dif=True)
            yr, yi = _api_unperm(yr, yi, u.shape[-1])  # rider stays lane 0
            return unpack_spectrum(yr, yi)
        return unpack_spectrum(*rfft3d_packed(u))
    yr, yi = rfft3d_planar(u)
    return lax.complex(yr, yi)[..., :nf]


def irfft3d(fu, s) -> jnp.ndarray:
    """inverse of rfft3d; ``s`` = the last-three-axes physical sizes."""
    s = tuple(s)[-3:]
    nf = s[-1] // 2 + 1
    if _use_packed(s[-1]) and fu.shape[-1] == nf:
        if _api_zdif(s[-1]):
            br, bi = pack_spectrum(fu)
            br, bi = _api_perm(br, bi, s[-1])
            return irfft3d_packed(br, bi, s, dif=True)
        br, bi = pack_spectrum(fu)
        return irfft3d_packed(br, bi, s)
    nfp = _round_up(nf, 128)
    pad = [(0, 0)] * (fu.ndim - 1) + [(0, nfp - fu.shape[-1])]
    fup = jnp.pad(fu, pad)
    return irfft3d_planar(jnp.real(fup).astype(jnp.float32),
                          jnp.imag(fup).astype(jnp.float32), s)


# ---------------------------------------------------------------------------
# Fused curl + x-inverse stage (DNS fast path, serial): W = ifft_x(i K × Û)
# without materialising the six curl intermediates in HBM.
# ---------------------------------------------------------------------------
#
# Every pseudo-spectral RHS computes the vorticity ω̂ = i K × Û and inverse-
# transforms it.  As separate steps the curl writes (and the x-IFFT re-reads)
# a full 6-plane intermediate (~400 MB of HBM traffic per RHS at 256³); here
# the curl is computed in VMEM inside the x-stage kernel.  Planar semantics:
# re(iK×Û) = −K×Ui, im(iK×Û) = K×Ur.

def _unroll_components(n0: int) -> bool:
    """Static choice of the per-component loop form in the fused x-stage
    kernels.  Unrolled (Python for, static indices) lets Mosaic pipeline the
    three components' matmuls/DMAs but co-allocates every iteration's
    _factored_vals temporaries on the scoped-VMEM stack — measured 16.85 M
    (epilogue) / 18.65 M (curl, 768) vs the 16 M limit at 512-class+, so
    512-class+ takes the fori_loop+scratch form instead.  The packed layout
    admits only h%128==0 grids, so the boundary sits cleanly at 256.
    MPIFFT4PY_TPU_UNROLL={0,1} overrides for measurement."""
    import os
    env = os.environ.get("MPIFFT4PY_TPU_UNROLL")
    if env in ("0", "1"):
        return env == "1"
    return n0 <= 256


def _curl_ifft_x_kernel(n, r, m, biot_savart, with_state, unroll, *refs):
    (ur_ref, ui_ref, k0_ref, k12_ref,
     wr_ref, wi_ref, cr_ref, ci_ref) = refs[:8]
    if with_state:
        or_ref, oi_ref, sr_ref, si_ref, kf_ref = refs[8:]
    else:
        or_ref, oi_ref, kf_ref = refs[8:]
    K0 = k0_ref[...]                      # (n, 1), varies along sublanes (k0)
    K1 = k12_ref[0:1, :]                  # (1, tq) flattened (k1, k2) lanes
    K2 = k12_ref[1:2, :]
    inv = jnp.float32(1.0 / n)
    if biot_savart:  # û = i(K×ω̂)/|k|² — fold 1/k² into the curl factors
        ksq = K0 * K0 + K1 * K1 + K2 * K2
        kinv = inv / jnp.where(ksq == 0, 1.0, ksq)
    else:
        kinv = inv

    if unroll:
        # 256-class: static component indices — no K scratch staging, no
        # fori_loop serialization; Mosaic pipelines the three components'
        # matmuls and block DMAs freely.  VMEM-gated by curl_fused_ok
        # (unrolling co-allocates all iterations' _factored_vals temps).
        Ks = (K0, K1, K2)
        for c in range(3):
            c1, c2 = (c + 1) % 3, (c + 2) % 3
            u1r, u1i = ur_ref[c1], ui_ref[c1]
            u2r, u2i = ur_ref[c2], ui_ref[c2]
            ar = -(Ks[c1] * u2i - Ks[c2] * u1i) * kinv
            ai = (Ks[c1] * u2r - Ks[c2] * u1r) * kinv
            yr, yi = _factored_vals(ar, ai, wr_ref[...], wi_ref[...],
                                    cr_ref[...], ci_ref[...], r, m, +1)
            or_ref[c] = yr
            oi_ref[c] = yi
            if with_state:
                yr, yi = _factored_vals(ur_ref[c] * inv, ui_ref[c] * inv,
                                        wr_ref[...], wi_ref[...],
                                        cr_ref[...], ci_ref[...], r, m, +1)
                sr_ref[c] = yr
                si_ref[c] = yi
        return

    # 512-class+: fori_loop keeps one iteration's temporaries live at a
    # time (unrolling measured 18.65 M scoped VMEM at 768-class).  Stage
    # the three K factors broadcast to (n, tq) in a VMEM scratch — a
    # dynamic component index can only address refs, not the
    # heterogeneous-shape K values.
    z01 = K0 * jnp.float32(0.0)
    kf_ref[0] = K0 + K1 * jnp.float32(0.0)
    kf_ref[1] = K1 + z01
    kf_ref[2] = K2 + z01

    def body(c, _):
        c1 = lax.rem(c + 1, 3)
        c2 = lax.rem(c + 2, 3)
        K1c = kf_ref[pl.ds(c1, 1)][0]
        K2c = kf_ref[pl.ds(c2, 1)][0]
        u1r, u1i = ur_ref[pl.ds(c1, 1)][0], ui_ref[pl.ds(c1, 1)][0]
        u2r, u2i = ur_ref[pl.ds(c2, 1)][0], ui_ref[pl.ds(c2, 1)][0]
        ar = -(K1c * u2i - K2c * u1i) * kinv
        ai = (K1c * u2r - K2c * u1r) * kinv
        yr, yi = _factored_vals(ar, ai, wr_ref[...], wi_ref[...],
                                cr_ref[...], ci_ref[...], r, m, +1)
        or_ref[pl.ds(c, 1)] = yr[None]
        oi_ref[pl.ds(c, 1)] = yi[None]
        if with_state:   # plain x-inverse of the state rides the same pass
            yr, yi = _factored_vals(ur_ref[pl.ds(c, 1)][0] * inv,
                                    ui_ref[pl.ds(c, 1)][0] * inv,
                                    wr_ref[...], wi_ref[...],
                                    cr_ref[...], ci_ref[...], r, m, +1)
            sr_ref[pl.ds(c, 1)] = yr[None]
            si_ref[pl.ds(c, 1)] = yi[None]
        return 0

    jax.lax.fori_loop(0, 3, body, 0)


def curl_fused_ok(n0: int, with_state: bool = False) -> bool:
    """VMEM gate for the fused curl(+state) x-inverse kernel: in/out blocks
    double-buffered + the K scratch + loop-body temps.  768-class fits the
    curl-only variant after the fori_loop restructure; with_state (two
    3-stacks out) fits through 512-class."""
    r, m = _factor(n0)
    if not (r <= 8 and m >= 8):
        return False
    planes = 18 if with_state else 12
    vmem = planes * n0 * 128 * 4 * 2 + 3 * n0 * 128 * 4 \
        + 10 * n0 * 128 * 4 + 2 * m * m * 4
    if _mm_mode() == "bf16x3":
        vmem += 14 * n0 * 128 * 4
    return vmem < 15 * 1024 * 1024


def curl_irfft3d_packed(ur, ui, k0, k1, k2, s, biot_savart: bool = False,
                        with_state: bool = False, dif: bool = False):
    """W = irfft3d_packed of i K × Û for a packed planar state (3, N0, N1, h).

    ``k0, k1, k2`` are the 1-D scaled wavenumber vectors (the solver's
    factored arrays); ``s`` the physical shape.  The curl and the x-axis
    inverse FFT run in ONE kernel (one HBM pass over the state).
    ``biot_savart=True`` folds the 1/|k|² factor in (û from ω̂ — the
    vorticity-form velocity recovery).  ``with_state=True`` additionally
    emits irfft3d_packed of Û itself from the SAME pass (the RHS needs both
    U and ω; this halves the state-pair reads) — returns (W, U)."""
    _, N0, N1, h = ur.shape
    r, m = _factor(N0)
    assert curl_fused_ok(N0, with_state), (N0, with_state)
    tq = 128 if ((N1 * h) % 128 == 0) else h
    postf = N1 * h
    assert postf % tq == 0
    wr, wi = _dft_cs(m, +1)
    cr, ci = _combine_cs(N0, r, m, +1)
    k0c = k0.astype(jnp.float32).reshape(N0, 1)
    k12 = jnp.stack([jnp.repeat(k1.astype(jnp.float32), h),
                     jnp.tile(k2.astype(jnp.float32), N1)])    # (2, N1*h)
    x3r = ur.reshape(3, N0, postf)
    x3i = ui.reshape(3, N0, postf)
    bx = pl.BlockSpec((3, N0, tq), lambda q: (0, 0, q), memory_space=pltpu.VMEM)
    c2 = lambda shape, im: pl.BlockSpec(shape, im, memory_space=pltpu.VMEM)
    nout = 4 if with_state else 2
    fn = pl.pallas_call(
        partial(_curl_ifft_x_kernel, N0, r, m, bool(biot_savart),
                bool(with_state), _unroll_components(N0)),
        grid=(postf // tq,),
        in_specs=[bx, bx,
                  c2((N0, 1), lambda q: (0, 0)),
                  c2((2, tq), lambda q: (0, q)),
                  c2((m, m), lambda q: (0, 0)), c2((m, m), lambda q: (0, 0)),
                  c2((r * r * m, 1), lambda q: (0, 0)),
                  c2((r * r * m, 1), lambda q: (0, 0))],
        out_specs=[bx] * nout,
        out_shape=[jax.ShapeDtypeStruct((3, N0, postf), jnp.float32)] * nout,
        scratch_shapes=[pltpu.VMEM((3, N0, tq), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=(2 if with_state else 1) * 3 * 2 * 3 * m * m * r * postf
            + 30 * N0 * postf,
            bytes_accessed=4 * (2 + nout) * 3 * N0 * postf, transcendentals=0),
    )
    outs = fn(x3r, x3i, k0c, k12, jnp.asarray(wr), jnp.asarray(wi),
              jnp.asarray(cr), jnp.asarray(ci))

    def _zy(yr, yi):
        yr = yr.reshape(3, N0, N1, h)
        yi = yi.reshape(3, N0, N1, h)
        if _use_fused_zy(s[-2], s[-1]):
            return fused_zy_bwd(yr, yi, s[-1], dif=dif)
        yr, yi = fft_axis_planar(yr, yi, axis=2, inverse=True)
        return irfft_last_packed(yr, yi, s[-1], dif=dif)

    if with_state:
        return _zy(outs[0], outs[1]), _zy(outs[2], outs[3])
    return _zy(outs[0], outs[1])


# ---------------------------------------------------------------------------
# Fused nonlinear-term kernels (DNS fast path, serial).  The solver RHS's
# elementwise stages fold into the transform kernels so the intermediates
# (the cross product F, the pre-projection spectrum F̂) never touch HBM:
#   cross_rfft_zy_packed:   F = A×B (+ C×D), then packed z-rfft + y-FFT.
#   fft_x_epilogue_packed:  x-FFT, 2/3-rule mask, then the spectral epilogue
#     (Leray projection or iK× curl) and the diffusive −c·k²·S term — emits
#     the RHS increment directly.
# Plane-0 purification cannot ride either kernel (it needs (k0,k1) flips —
# Mosaic has no rev); purify_plane0_dus applies it as a k2=0-column update.
# ---------------------------------------------------------------------------

def _zfwd_vals(f, zrefs, rz):
    """Packed z forward of a (rows, n2) real VALUE inside a kernel: dense
    matmul pair (``zrefs`` = (A, Bm) refs, ``rz`` = 0) or the DIF split
    (``zrefs`` = the 4 stacked slot-matrix refs, ``rz`` = n2/128 > 0).
    Returns the (rows, h) planar pair (DIF: zdif_perm lane order)."""
    if rz:
        from .pallas_zdif import zdif_fwd_slots
        slots = zdif_fwd_slots(f, *zrefs, rz)
        return (jnp.concatenate([s[0] for s in slots], axis=-1),
                jnp.concatenate([s[1] for s in slots], axis=-1))
    A_ref, Bm_ref = zrefs
    return _dot(f, A_ref[...]), _dot(f, Bm_ref[...])


def _zfwd_consts(n2: int, dif: bool):
    """Host-side constants for ``_zfwd_vals``: (rz, device mats, spec
    shapes).  rz = 0 selects the dense pair."""
    if _zdif_on(n2, dif):
        from . import pallas_zdif as zd
        rz = n2 // zd._M
        mats = [jnp.asarray(t) for t in zd._zdif_fwd_mats(n2)]
        return rz, mats, [(rz // 2, zd._M, zd._M)] * 4
    A, Bm = _packed_rdft_cs(n2)
    return 0, [jnp.asarray(A), jnp.asarray(Bm)], [(n2, n2 // 2)] * 2


def _cross_zy_kernel(r, m, two, rz, *refs):
    nz = 4 if rz else 2
    if two:
        a_ref, b_ref, c_ref, d_ref = refs[:4]
        refs = refs[4:]
    else:
        a_ref, b_ref = refs[:2]
        refs = refs[2:]
    zrefs = refs[:nz]
    wr_ref, wi_ref, cr_ref, ci_ref, or_ref, oi_ref = refs[nz:]
    a0, a1, a2 = a_ref[0, 0], a_ref[1, 0], a_ref[2, 0]
    b0, b1, b2 = b_ref[0, 0], b_ref[1, 0], b_ref[2, 0]
    f = [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0]
    if two:
        c0, c1, c2 = c_ref[0, 0], c_ref[1, 0], c_ref[2, 0]
        d0, d1, d2 = d_ref[0, 0], d_ref[1, 0], d_ref[2, 0]
        f[0] = f[0] + (c1 * d2 - c2 * d1)
        f[1] = f[1] + (c2 * d0 - c0 * d2)
        f[2] = f[2] + (c0 * d1 - c1 * d0)
    for c in range(3):
        pr, pi = _zfwd_vals(f[c], zrefs, rz)
        yr, yi = _factored_vals(pr, pi, wr_ref[...], wi_ref[...],
                                cr_ref[...], ci_ref[...], r, m, -1)
        or_ref[c, 0] = yr
        oi_ref[c, 0] = yi


def _cross_zy_oneshot_ok(n1: int, n2: int, two: bool = False) -> bool:
    """VMEM gate for the one-shot kernel: blocks hold all 3 components of
    every operand (the cross mixes them), so the budget is 3× fused_zy_fwd's
    — 256³ fits, 512³ falls to the accumulating variant below."""
    if (n2 // 2) % 128 != 0:
        return False
    r, m = _factor(n1)
    nin = 4 if two else 2
    vmem = (nin * 3 * n1 * n2 + 2 * 3 * n1 * (n2 // 2)) * 2 * 4 \
        + (2 * n2 * (n2 // 2) + 2 * m * m) * 4
    return r <= 4 and m >= 64 and vmem < 13 * 1024 * 1024


def _pick_tk_acc(n1: int, n2: int, nin: int):
    """z-contraction lane tile for the accumulating cross/mul+zy kernel, or
    None if no tile fits.  Resident: the (3, n1, h) output pair used as the
    accumulator (×2 buffers at the i boundary), the y-stage value
    temporaries (~8 planes measured-class bound), double-buffered input and
    DFT-matrix tiles.  ``nin`` counts input FIELDS per grid step (cross 6,
    cross+cross 12, mul 4)."""
    h = n2 // 2
    if h % 128 != 0:
        return None
    r, m = _factor(n1)
    if r > 4 or m < 64:
        return None
    budget = 13 * 1024 * 1024
    fixed = (2 * 3 * n1 * h * 2 + 5 * n1 * h + 2 * m * m) * 4
    if _mm_mode() == "bf16x3":
        fixed += 4 * n1 * h * 4       # hi/lo-split matmul temporaries
    for tk in (256, 128):          # Mosaic lane blocks: multiples of 128
        if n2 % tk:
            continue
        if fixed + (nin * n1 * tk + 2 * tk * h) * 2 * 4 <= budget:
            return tk
    return None


def cross_zy_ok(n1: int, n2: int, two: bool = False) -> bool:
    """True when SOME fused cross+z/y kernel serves (n1, n2) planes: the
    one-shot kernel (256³-class), the z-tiled accumulating kernel
    (512³-class), or — for the 12-field cross2 where neither fits — the
    SPLIT route (two 6-field single-cross passes summed; the z/y forward is
    linear, so Ẑ(A×B) + Ẑ(C×D) = Ẑ(A×B + C×D))."""
    ok1 = (_cross_zy_oneshot_ok(n1, n2, False)
           or _pick_tk_acc(n1, n2, 6) is not None)
    if not two:
        return ok1
    return cross2_direct_ok(n1, n2) or ok1


def cross2_direct_ok(n1: int, n2: int) -> bool:
    """True when the 12-field cross2 fits a fused kernel DIRECTLY (one-shot
    or accumulating); False → cross_rfft_zy_packed takes the 2-pass split
    (MHD at 512-class planes).  Models use this to sequence their physical
    stacks for peak-HBM when the split engages."""
    return (_cross_zy_oneshot_ok(n1, n2, True)
            or _pick_tk_acc(n1, n2, 12) is not None)


def _cross_zy_acc_kernel(r, m, K, op, rz, bt, *refs):
    if op == "cross2":
        a_ref, b_ref, c_ref, d_ref = refs[:4]
        rest = refs[4:]
    else:
        a_ref, b_ref = refs[:2]
        rest = refs[2:]
    if rz:
        (ma_ref, mb_ref, mc_ref, md_ref, tcc_ref, tss_ref,
         wr_ref, wi_ref, cr_ref, ci_ref, or_ref, oi_ref) = rest
        S = rz // 2
    else:
        A_ref, Bm_ref, wr_ref, wi_ref, cr_ref, ci_ref, or_ref, oi_ref = rest
    k = pl.program_id(1)

    # Everything below runs inside fori_loops (not unrolled python loops):
    # Mosaic allocates the unrolled copies' temporaries SIMULTANEOUSLY on the
    # scoped-VMEM stack (measured 21.8 MB > the 16 MB limit at 512-class
    # planes); a loop body allocates once and reuses.  Mosaic also cannot
    # lower dynamic_slice on VALUES, so the dynamic component index c
    # addresses REFS only (operand reads, output accumulator writes).
    def _cross_at(c):
        if op == "mul":
            return a_ref[pl.ds(c, 1)][0, 0] * b_ref[0, 0]
        c1 = lax.rem(c + 1, 3)
        c2 = lax.rem(c + 2, 3)
        f = (a_ref[pl.ds(c1, 1)][0, 0] * b_ref[pl.ds(c2, 1)][0, 0]
             - a_ref[pl.ds(c2, 1)][0, 0] * b_ref[pl.ds(c1, 1)][0, 0])
        if op == "cross2":
            f = f + (c_ref[pl.ds(c1, 1)][0, 0] * d_ref[pl.ds(c2, 1)][0, 0]
                     - c_ref[pl.ds(c2, 1)][0, 0] * d_ref[pl.ds(c1, 1)][0, 0])
        return f

    if rz:
        # DIF z split: the tile's lane blocks enter the butterfly only —
        # slot p's two REAL accumulators (la, lb) live in the out refs'
        # lanes [p·128, (p+1)·128) (or = la, oi = lb; the S slots tile h
        # exactly).  Block index cz = k·bt + j is TRACED, so the butterfly
        # coefficients stream as (1, 128) rows of the (rz·S, 128) tables
        # (sublane-only broadcast — the (1,1) form does not lower).
        def _acc(c, _):
            fc = _cross_at(c)
            for j in range(bt):
                y = fc[:, j * 128:(j + 1) * 128]
                base = (k * bt + j) * S
                for p in range(S):
                    cc = tcc_ref[pl.ds(base + p, 1)]
                    ss = tss_ref[pl.ds(base + p, 1)]
                    pr = (cc * y)[None, None]
                    pi = (ss * y)[None, None]
                    lanes = pl.ds(p * 128, 128)
                    if j == 0:
                        @pl.when(k == 0)
                        def _(pr=pr, pi=pi, lanes=lanes):
                            or_ref[pl.ds(c, 1), :, :, lanes] = pr
                            oi_ref[pl.ds(c, 1), :, :, lanes] = pi

                        @pl.when(k != 0)
                        def _(pr=pr, pi=pi, lanes=lanes):
                            or_ref[pl.ds(c, 1), :, :, lanes] += pr
                            oi_ref[pl.ds(c, 1), :, :, lanes] += pi
                    else:
                        or_ref[pl.ds(c, 1), :, :, lanes] += pr
                        oi_ref[pl.ds(c, 1), :, :, lanes] += pi
            return 0
    else:
        def _acc(c, _):
            fc = _cross_at(c)
            pr = _dot(fc, A_ref[...])[None, None]
            pi = _dot(fc, Bm_ref[...])[None, None]

            @pl.when(k == 0)
            def _():
                or_ref[pl.ds(c, 1)] = pr
                oi_ref[pl.ds(c, 1)] = pi

            @pl.when(k != 0)
            def _():
                or_ref[pl.ds(c, 1)] += pr
                oi_ref[pl.ds(c, 1)] += pi
            return 0

    jax.lax.fori_loop(0, 3, _acc, 0)

    if rz:
        @pl.when(k == K - 1)       # butterfly complete: per-slot DFT matmuls
        def _():
            def _slots(c, _):
                def _one(p, _):
                    lanes = pl.ds(p * 128, 128)
                    la = or_ref[pl.ds(c, 1), :, :, lanes][0, 0]
                    lb = oi_ref[pl.ds(c, 1), :, :, lanes][0, 0]
                    ma = ma_ref[pl.ds(p, 1)][0]
                    mb = mb_ref[pl.ds(p, 1)][0]
                    mc = mc_ref[pl.ds(p, 1)][0]
                    md = md_ref[pl.ds(p, 1)][0]
                    sr = _dot(la, ma) + _dot(lb, mb)
                    si = _dot(la, mc) + _dot(lb, md)
                    or_ref[pl.ds(c, 1), :, :, lanes] = sr[None, None]
                    oi_ref[pl.ds(c, 1), :, :, lanes] = si[None, None]
                    return 0

                jax.lax.fori_loop(0, S, _one, 0)
                return 0

            jax.lax.fori_loop(0, 3, _slots, 0)

    @pl.when(k == K - 1)                   # z contraction complete: y-FFT
    def _():
        def _yfft(c, _):
            xr = or_ref[pl.ds(c, 1)][0, 0]
            xi = oi_ref[pl.ds(c, 1)][0, 0]
            TQ = xr.shape[-1]
            Er, Ei = [], []
            for q in range(r):
                sr = xr.reshape(m, r, TQ)[:, q, :] if r > 1 else xr
                si = xi.reshape(m, r, TQ)[:, q, :] if r > 1 else xi
                er, ei = _karatsuba(wr_ref[...], wi_ref[...], sr, si)
                Er.append(er)
                Ei.append(ei)
            if r == 1:
                or_ref[pl.ds(c, 1)] = Er[0][None, None]
                oi_ref[pl.ds(c, 1)] = Ei[0][None, None]
                return 0

            # combine rows [p·m, (p+1)·m) written straight to the output ref
            # (in place: the whole input was consumed into E_q above) — the
            # _factored_vals outs-list + concat temporaries don't fit here
            def _combine(p, _):
                accr = acci = None
                for q in range(r):
                    row = (p * r + q) * m
                    crv = cr_ref[pl.ds(row, m)]
                    civ = ci_ref[pl.ds(row, m)]
                    tr = crv * Er[q] - civ * Ei[q]
                    ti = crv * Ei[q] + civ * Er[q]
                    accr = tr if accr is None else accr + tr
                    acci = ti if acci is None else acci + ti
                or_ref[pl.ds(c, 1), :, pl.ds(p * m, m)] = accr[None, None]
                oi_ref[pl.ds(c, 1), :, pl.ds(p * m, m)] = acci[None, None]
                return 0

            jax.lax.fori_loop(0, r, _combine, 0)
            return 0

        jax.lax.fori_loop(0, 3, _yfft, 0)


@lru_cache(maxsize=None)
def _zdif_acc_tables(n: int):
    """Butterfly-coefficient tables for the z-tiled DIF accumulate: rows
    (cz·S + p) of (rz·S, 128) hold w_rz^{−p·cz} as lane-constant (cos, sin)
    rows — the traced block index cz addresses REFS, and the (1, 128) row ×
    (N1, 128) block multiply is a sublane-only broadcast (the (1, 1) scalar
    form does not lower on hardware).  Bitwise-equal to zdif_fwd_slots'
    Python-float immediates (same _wr rounding)."""
    from .pallas_zdif import _wr, _M
    rz = n // _M
    S = rz // 2
    tcc = np.zeros((rz * S, 128), np.float32)
    tss = np.zeros_like(tcc)
    for c in range(rz):
        for p in range(S):
            if p == 0:
                cc, ss = 1.0, float((-1.0) ** c)
            else:
                cc, ss = _wr(p, c, rz, -1)
            tcc[c * S + p, :] = cc
            tss[c * S + p, :] = ss
    return tcc, tss


def _cross_rfft_zy_acc(ins, op, dif: bool = False):
    """z-tiled accumulating variant of the fused cross/mul+z/y forward for
    plane sizes whose full operand set exceeds VMEM (512³-class).  The grid
    is (N0, N2/tk): each step crosses/multiplies a z-tile of the operands and
    accumulates its partial z-DFT into the resident output pair; the y-FFT
    runs in-place on the final step.  Same HBM traffic as the one-shot
    kernel, plus re-streaming the (N2, h) DFT matrices once per x-slab.
    ``dif=True`` (where gated): the tile contributes VPU butterfly terms to
    the slot accumulators instead of dense partial matmuls; the per-slot
    (128 × 128) DFT matmuls run once on the final step — 2/rz of the dense
    MXU cost, output lanes in zdif_perm order."""
    nin = {"cross": 6, "cross2": 12, "mul": 4}[op]
    _, N0, N1, N2 = ins[0].shape
    h = N2 // 2
    tk = _pick_tk_acc(N1, N2, nin)
    assert tk is not None, (N1, N2, op)
    K = N2 // tk
    r, m = _factor(N1)
    wr, wi = _dft_cs(m, -1)
    cr, ci = _combine_cs(N1, r, m, -1)
    bx = lambda nc: pl.BlockSpec((nc, 1, N1, tk), lambda i, k: (0, i, 0, k),
                                 memory_space=pltpu.VMEM)
    bo = pl.BlockSpec((3, 1, N1, h), lambda i, k: (0, i, 0, 0),
                      memory_space=pltpu.VMEM)
    bA = pl.BlockSpec((tk, h), lambda i, k: (k, 0), memory_space=pltpu.VMEM)
    c2 = lambda shape: pl.BlockSpec(shape, lambda i, k: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    if _zdif_on(N2, dif):
        from . import pallas_zdif as zd
        rz = N2 // zd._M
        bt = tk // zd._M
        tcc, tss = _zdif_acc_tables(N2)
        zmats = [jnp.asarray(t) for t in zd._zdif_fwd_mats(N2)] \
            + [jnp.asarray(tcc), jnp.asarray(tss)]
        zspecs = [c2((rz // 2, zd._M, zd._M))] * 4 \
            + [c2(tcc.shape), c2(tss.shape)]
        zflops = 4 * zd._M * h + 2 * rz * N2
    else:
        rz = bt = 0
        A, Bm = _packed_rdft_cs(N2)
        zmats = [jnp.asarray(A), jnp.asarray(Bm)]
        zspecs = [bA, bA]
        zflops = 2 * N2 * h
    in_specs = [bx(x.shape[0]) for x in ins] \
        + zspecs + [c2((m, m)), c2((m, m)),
                    c2((r * r * m, 1)), c2((r * r * m, 1))]
    fn = pl.pallas_call(
        partial(_cross_zy_acc_kernel, r, m, K, op, rz, bt),
        grid=(N0, K),
        in_specs=in_specs,
        out_specs=[bo, bo],
        out_shape=[jax.ShapeDtypeStruct((3, N0, N1, h), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * N0 * N1 * (zflops + 3 * m * m * r)
            + nin * N0 * N1 * N2,
            bytes_accessed=(nin * N0 * N1 * N2 + 2 * 3 * N0 * N1 * h
                            + 2 * N0 * N2 * h) * 4,
            transcendentals=0),
    )
    return fn(*[x.astype(jnp.float32) for x in ins], *zmats,
              jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(cr),
              jnp.asarray(ci))


def cross_rfft_zy_packed(a, b, c=None, d=None, dif: bool = False):
    """(A×B [+ C×D]) with the packed z-rfft + y-FFT fused behind it — the
    cross-product field never materialises in HBM.  Inputs physical
    (3, N0, N1, N2); returns the packed planar pair (3, N0, N1, h) with z and
    y transformed (x pending — feed fft_x_epilogue_packed).  ``dif=True``:
    z lanes leave in zdif_perm order where the DIF z-stage is gated."""
    two = c is not None
    _, N0, N1, N2 = a.shape
    h = N2 // 2
    if two and not cross2_direct_ok(N1, N2):
        # 512-class cross2 (12 input fields) fits no VMEM tile — run the two
        # 6-field crosses separately and sum the pairs (linearity of the z/y
        # forward).  One extra pair add ≈ 2.4 ms HBM at 512³ vs the XLA
        # fallback's full F materialisation.
        fr, fi = cross_rfft_zy_packed(a, b, dif=dif)
        gr, gi = cross_rfft_zy_packed(c, d, dif=dif)
        return fr + gr, fi + gi
    if not _cross_zy_oneshot_ok(N1, N2, two):
        return _cross_rfft_zy_acc([a, b, c, d] if two else [a, b],
                                  "cross2" if two else "cross", dif=dif)
    r, m = _factor(N1)
    rz, zmats, zshapes = _zfwd_consts(N2, dif)
    wr, wi = _dft_cs(m, -1)
    cr, ci = _combine_cs(N1, r, m, -1)
    bx = pl.BlockSpec((3, 1, N1, N2), lambda i: (0, i, 0, 0),
                      memory_space=pltpu.VMEM)
    bo = pl.BlockSpec((3, 1, N1, h), lambda i: (0, i, 0, 0),
                      memory_space=pltpu.VMEM)
    c2 = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    ins = [a, b] + ([c, d] if two else [])
    nin = len(ins)
    fn = pl.pallas_call(
        partial(_cross_zy_kernel, r, m, two, rz),
        grid=(N0,),
        in_specs=[bx] * nin + [c2(s) for s in zshapes]
        + [c2((m, m)), c2((m, m)), c2((r * r * m, 1)), c2((r * r * m, 1))],
        out_specs=[bo, bo],
        out_shape=[jax.ShapeDtypeStruct((3, N0, N1, h), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * N0 * N1 * (2 * N2 * h + 3 * m * m * r)
            + nin * 3 * N0 * N1 * N2,
            bytes_accessed=(nin * 3 * N0 * N1 * N2
                            + 2 * 3 * N0 * N1 * h) * 4,
            transcendentals=0),
    )
    return fn(*[x.astype(jnp.float32) for x in ins], *zmats,
              jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(cr),
              jnp.asarray(ci))


def _fft_x_epilogue_kernel(n, r, m, mode, visc, ri, unroll, *refs):
    if ri is not None:                    # buoyancy rider (project mode)
        (fr_ref, fi_ref, sr_ref, si_ref, tr_ref, ti_ref,
         k0_ref, k12_ref, wr_ref, wi_ref, cr_ref, ci_ref,
         or_ref, oi_ref, Fr_s, Fi_s) = refs
    else:
        (fr_ref, fi_ref, sr_ref, si_ref, k0_ref, k12_ref,
         wr_ref, wi_ref, cr_ref, ci_ref, or_ref, oi_ref, Fr_s, Fi_s) = refs
    K0 = k0_ref[:, 0:1]                   # (n, 1), varies along sublanes
    M0 = k0_ref[:, 1:2]
    K1 = k12_ref[0:1, :]                  # (1, tq) flattened (k1, k2) lanes
    K2 = k12_ref[1:2, :]
    M12 = k12_ref[2:3, :]
    mask = M0 * M12                       # (n, tq) 0/1 floats

    # x-FFT the three components.  256-class: unrolled with the results held
    # as VALUES (no scratch round-trip; Mosaic pipelines the components).
    # 512-class+: fori_loop staging into VMEM scratch — unrolling
    # co-allocates every iteration's _factored_vals temporaries on the
    # scoped-VMEM stack (the buoyancy-rider variant measured 16.85 M > the
    # 16 M limit at 512-class when unrolled; staged it fits).
    if unroll:
        F = []
        for c in range(3):
            yr, yi = _factored_vals(fr_ref[c], fi_ref[c],
                                    wr_ref[...], wi_ref[...], cr_ref[...],
                                    ci_ref[...], r, m, -1)
            F.append((yr * mask, yi * mask))
        if ri is not None:                # F̂₂ += Ri·θ̂ BEFORE projection
            F[2] = (F[2][0] + jnp.float32(ri) * tr_ref[0],
                    F[2][1] + jnp.float32(ri) * ti_ref[0])
    else:
        def _xfft(c, _):
            yr, yi = _factored_vals(fr_ref[pl.ds(c, 1)][0],
                                    fi_ref[pl.ds(c, 1)][0],
                                    wr_ref[...], wi_ref[...], cr_ref[...],
                                    ci_ref[...], r, m, -1)
            Fr_s[pl.ds(c, 1)] = (yr * mask)[None]
            Fi_s[pl.ds(c, 1)] = (yi * mask)[None]
            return 0

        jax.lax.fori_loop(0, 3, _xfft, 0)
        if ri is not None:                # F̂₂ += Ri·θ̂ BEFORE projection
            Fr_s[2] += jnp.float32(ri) * tr_ref[0]
            Fi_s[2] += jnp.float32(ri) * ti_ref[0]
        F = [(Fr_s[c], Fi_s[c]) for c in range(3)]
    ksq = K0 * K0 + K1 * K1 + K2 * K2
    Ks = (K0, K1, K2)
    nu = jnp.float32(visc)
    if mode == "project":
        inv = 1.0 / jnp.where(ksq == 0, 1.0, ksq)
        dr = (K0 * F[0][0] + K1 * F[1][0] + K2 * F[2][0]) * inv
        di = (K0 * F[0][1] + K1 * F[1][1] + K2 * F[2][1]) * inv
        for c in range(3):
            or_ref[c] = F[c][0] - Ks[c] * dr - nu * ksq * sr_ref[c]
            oi_ref[c] = F[c][1] - Ks[c] * di - nu * ksq * si_ref[c]
    elif mode == "div":                   # dS = −i k·F̂ − visc·k²·S (scalar)
        or_ref[0] = (K0 * F[0][1] + K1 * F[1][1] + K2 * F[2][1]) \
            - nu * ksq * sr_ref[0]
        oi_ref[0] = -(K0 * F[0][0] + K1 * F[1][0] + K2 * F[2][0]) \
            - nu * ksq * si_ref[0]
    else:                                 # "curl": dS = iK×F̂ − visc·k²·S
        Fr = [F[c][0] for c in range(3)]
        Fi = [F[c][1] for c in range(3)]

        def kxc(V, c):
            i, j = ((1, 2), (2, 0), (0, 1))[c]
            return Ks[i] * V[j] - Ks[j] * V[i]
        for c in range(3):
            or_ref[c] = -kxc(Fi, c) - nu * ksq * sr_ref[c]
            oi_ref[c] = kxc(Fr, c) - nu * ksq * si_ref[c]


def fft_x_epilogue_ok(n0: int, buoy: bool = False) -> bool:
    """VMEM gate: 18 (n0, 128) blocks double-buffered (6 F̂-pair in, 6 state
    in, 6 out; the buoyancy rider adds 2 more) + the (3, n0, tq) staging
    scratch pair + loop-body value temps.  After the fori_loop+scratch
    restructure the 512-class kernel fits WITH the rider per this budget
    (the earlier unrolled form measured 16.85 M > the 16 M limit there).
    768-class stays out: the double-buffered blocks alone are 14.2 M."""
    r, m = _factor(n0)
    planes = 18 + (2 if buoy else 0)
    vmem = planes * n0 * 128 * 4 * 2 + 14 * n0 * 128 * 4 + 2 * m * m * 4
    if _mm_mode() == "bf16x3":
        # the manual hi/lo-split matmul's extra temporaries: measured
        # 19.46 M vs ~15.8 M (HIGHEST) at n0=512 pre-restructure — +14
        # (n0, 128) planes.  bf16x3 therefore gates the 512-class fused path
        # OFF (it remains a 1024-class dense-z lever; BENCH.md)
        vmem += 14 * n0 * 128 * 4
    return r <= 8 and m >= 8 and vmem < 15 * 1024 * 1024


def fft_x_epilogue_packed(fzr, fzi, sr, si, k0, k1, k2, m0, m1, m2,
                          mode: str, visc: float, buoy=None):
    """x-axis forward FFT of a packed 3-stack + the RHS spectral epilogue in
    ONE kernel: 2/3-rule mask, then ``mode``:
      "project" — Leray projection  dS = mask·P(F̂) − visc·k²·S
      "curl"    — spectral curl     dS = mask·(iK×F̂) − visc·k²·S
      "div"     — neg. divergence   dS = −mask·(ik·F̂) − visc·k²·S (scalar S)
    ``(fzr, fzi)`` is the pair after cross_rfft_zy_packed (z+y transformed);
    ``(sr, si)`` the packed solver state carrying the diffusive term — a
    3-stack, or a 1-stack for "div";  ``m0, m1, m2`` the solver's 1-D dealias
    masks (bool).  ``buoy=(Tr, Ti, Ri)`` (project only) adds Ri·θ̂ ê_z to F̂
    before projecting — the Boussinesq buoyancy term.  The plane-0 rider is
    NOT purified here — callers apply purify_plane0_dus to the result."""
    _, N0, N1, h = fzr.shape
    ns = 1 if mode == "div" else 3
    assert sr.shape[0] == ns, (sr.shape, mode)
    r, m = _factor(N0)
    assert fft_x_epilogue_ok(N0), N0
    if buoy is not None and not fft_x_epilogue_ok(N0, buoy=True):
        # Above the buoy gate (576-class+) the rider's two extra blocks
        # overflow scoped VMEM.  Projection is linear, so run
        # the kernel without the rider and add  Ri·P(θ̂·ê_z)  as an XLA
        # elementwise pass:  P(θ̂ê_z)_c = θ̂·(δ_c2 − k_c·k2/k²).  θ̂ is state
        # spectrum (already masked), matching the kernel's unmasked rider.
        tr, ti, ri = buoy
        yr, yi = fft_x_epilogue_packed(fzr, fzi, sr, si, k0, k1, k2,
                                       m0, m1, m2, mode, visc)
        f32 = jnp.float32
        K0 = k0.astype(f32)[:, None, None]
        K1 = k1.astype(f32)[None, :, None]
        K2 = k2.astype(f32)[None, None, :]
        ksq = K0 * K0 + K1 * K1 + K2 * K2
        inv = 1.0 / jnp.where(ksq == 0, 1.0, ksq)
        coef = jnp.stack([-K0 * K2 * inv,
                          -K1 * K2 * inv,
                          1.0 - K2 * K2 * inv]) * f32(ri)
        return yr + coef * tr, yi + coef * ti
    tq = 128 if ((N1 * h) % 128 == 0) else h
    postf = N1 * h
    assert postf % tq == 0
    wr, wi = _dft_cs(m, -1)
    cr, ci = _combine_cs(N0, r, m, -1)
    f32 = jnp.float32
    k0c = jnp.stack([k0.astype(f32), m0.astype(f32)], axis=1)       # (N0, 2)
    m12 = jnp.repeat(m1.astype(f32), h) * jnp.tile(m2.astype(f32), N1)
    k12 = jnp.stack([jnp.repeat(k1.astype(f32), h),
                     jnp.tile(k2.astype(f32), N1), m12])            # (3, N1*h)
    xs = [fzr.reshape(3, N0, postf), fzi.reshape(3, N0, postf),
          sr.reshape(ns, N0, postf), si.reshape(ns, N0, postf)]
    ri = None
    if buoy is not None:
        assert mode == "project"
        tr, ti, ri = buoy
        xs += [tr.reshape(1, N0, postf), ti.reshape(1, N0, postf)]
        ri = float(ri)
    bk = lambda nc: pl.BlockSpec((nc, N0, tq), lambda q: (0, 0, q),
                                 memory_space=pltpu.VMEM)
    c2 = lambda shape, im: pl.BlockSpec(shape, im, memory_space=pltpu.VMEM)
    in_specs = [bk(3), bk(3), bk(ns), bk(ns)] \
        + ([bk(1), bk(1)] if buoy is not None else []) \
        + [c2((N0, 2), lambda q: (0, 0)),
           c2((3, tq), lambda q: (0, q)),
           c2((m, m), lambda q: (0, 0)), c2((m, m), lambda q: (0, 0)),
           c2((r * r * m, 1), lambda q: (0, 0)),
           c2((r * r * m, 1), lambda q: (0, 0))]
    fn = pl.pallas_call(
        partial(_fft_x_epilogue_kernel, N0, r, m, mode, float(visc), ri,
                _unroll_components(N0)),
        grid=(postf // tq,),
        in_specs=in_specs,
        out_specs=[bk(ns), bk(ns)],
        out_shape=[jax.ShapeDtypeStruct((ns, N0, postf), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((3, N0, tq), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * 3 * m * m * r * postf + 40 * N0 * postf,
            bytes_accessed=4 * (6 + 2 * ns) * N0 * postf, transcendentals=0),
    )
    yr, yi = fn(*xs, k0c, k12, jnp.asarray(wr), jnp.asarray(wi),
                jnp.asarray(cr), jnp.asarray(ci))
    return yr.reshape(ns, N0, N1, h), yi.reshape(ns, N0, N1, h)


def _mul_zy_kernel(r, m, rz, *refs):
    nz = 4 if rz else 2
    a_ref, t_ref = refs[:2]
    zrefs = refs[2:2 + nz]
    wr_ref, wi_ref, cr_ref, ci_ref, or_ref, oi_ref = refs[2 + nz:]
    t = t_ref[0, 0]
    for c in range(3):
        f = a_ref[c, 0] * t
        pr, pi = _zfwd_vals(f, zrefs, rz)
        yr, yi = _factored_vals(pr, pi, wr_ref[...], wi_ref[...],
                                cr_ref[...], ci_ref[...], r, m, -1)
        or_ref[c, 0] = yr
        oi_ref[c, 0] = yi


def mul_rfft_zy_packed(a, t, dif: bool = False):
    """(a_c·t) for a 3-stack ``a`` and scalar field ``t`` (1, N0, N1, N2)
    with the packed z-rfft + y-FFT fused behind it — the flux field u·θ
    never materialises in HBM (Boussinesq scalar advection)."""
    _, N0, N1, N2 = a.shape
    h = N2 // 2
    if not _cross_zy_oneshot_ok(N1, N2):
        return _cross_rfft_zy_acc([a, t], "mul", dif=dif)
    r, m = _factor(N1)
    rz, zmats, zshapes = _zfwd_consts(N2, dif)
    wr, wi = _dft_cs(m, -1)
    cr, ci = _combine_cs(N1, r, m, -1)
    bx = pl.BlockSpec((3, 1, N1, N2), lambda i: (0, i, 0, 0),
                      memory_space=pltpu.VMEM)
    bt = pl.BlockSpec((1, 1, N1, N2), lambda i: (0, i, 0, 0),
                      memory_space=pltpu.VMEM)
    bo = pl.BlockSpec((3, 1, N1, h), lambda i: (0, i, 0, 0),
                      memory_space=pltpu.VMEM)
    c2 = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        partial(_mul_zy_kernel, r, m, rz),
        grid=(N0,),
        in_specs=[bx, bt] + [c2(s) for s in zshapes]
        + [c2((m, m)), c2((m, m)), c2((r * r * m, 1)), c2((r * r * m, 1))],
        out_specs=[bo, bo],
        out_shape=[jax.ShapeDtypeStruct((3, N0, N1, h), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * N0 * N1 * (2 * N2 * h + 3 * m * m * r)
            + 3 * N0 * N1 * N2,
            bytes_accessed=(4 * N0 * N1 * N2 + 2 * 3 * N0 * N1 * h) * 4,
            transcendentals=0),
    )
    return fn(a.astype(jnp.float32), t.astype(jnp.float32), *zmats,
              jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(cr),
              jnp.asarray(ci))


def _cross_z_kernel(op, rz, *refs):
    nz = 4 if rz else 2
    if op == "cross2":
        a_ref, b_ref, c_ref, d_ref = refs[:4]
        refs = refs[4:]
    else:
        a_ref, b_ref = refs[:2]
        refs = refs[2:]
    zrefs = refs[:nz]
    or_ref, oi_ref = refs[nz:]
    if op == "mul":
        t = b_ref[0]
        f = [a_ref[0] * t, a_ref[1] * t, a_ref[2] * t]
    else:
        a0, a1, a2 = a_ref[0], a_ref[1], a_ref[2]
        b0, b1, b2 = b_ref[0], b_ref[1], b_ref[2]
        f = [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0]
        if op == "cross2":
            c0, c1, c2 = c_ref[0], c_ref[1], c_ref[2]
            d0, d1, d2 = d_ref[0], d_ref[1], d_ref[2]
            f[0] = f[0] + (c1 * d2 - c2 * d1)
            f[1] = f[1] + (c2 * d0 - c0 * d2)
            f[2] = f[2] + (c0 * d1 - c1 * d0)
    for c in range(3):
        or_ref[c], oi_ref[c] = _zfwd_vals(f[c], zrefs, rz)


def _crossz_pick_tr(nstk: int, n: int, R: int):
    """Row tile for the cross/mul + z-only kernel (``nstk`` input field
    planes per row: cross 6, cross+cross 12, mul 4; + the output pair),
    double-buffered, with the (n × h) DFT matrix pair resident; or None."""
    h = n // 2
    budget = 10 * 1024 * 1024 - 2 * n * h * 4
    per_tr = (nstk * n + 2 * 3 * h) * 4 * 2 + 3 * (n + 2 * h) * 4
    for tr in (512, 256, 128, 64, 32, 16, 8):
        if tr <= R and R % tr == 0 and per_tr * tr <= budget:
            return tr
    return None


def cross_z_ok(n2: int, R: int, two: bool = False, mul: bool = False) -> bool:
    if (n2 // 2) % 128 != 0:
        return False
    nstk = 4 if mul else (12 if two else 6)
    if _crossz_pick_tr(nstk, n2, R) is not None:
        return True
    # 12-field cross2 with no tile: the split route (two 6-field passes
    # summed) serves whenever the single cross does.
    return two and not mul and _crossz_pick_tr(6, n2, R) is not None


def cross_rfft_z_packed(a, b, c=None, d=None, dif: bool = False):
    """(A×B [+ C×D]) with ONLY the packed z-rfft fused behind it (no y
    stage) — the shard-local first leg of the pencil WIDE fused nonlinear
    path, where y is sharded and transforms after the P2 transpose.  Inputs
    physical (3, …, N2); returns the packed planar pair (3, …, N2/2)."""
    two = c is not None
    if two:
        n = a.shape[-1]
        R = int(np.prod(a.shape[1:-1], dtype=np.int64))
        if _crossz_pick_tr(12, n, R) is None:
            fr, fi = _cross_rfft_z([a, b], "cross", dif=dif)
            gr, gi = _cross_rfft_z([c, d], "cross", dif=dif)
            return fr + gr, fi + gi
    return _cross_rfft_z(([a, b, c, d] if two else [a, b]),
                         "cross2" if two else "cross", dif=dif)


def mul_rfft_z_packed(a, t, dif: bool = False):
    """(a_c·t) with only the packed z-rfft fused behind it — the wide-layout
    scalar-flux mirror of cross_rfft_z_packed."""
    return _cross_rfft_z([a, t], "mul", dif=dif)


def _cross_rfft_z(ins, op, dif: bool = False):
    n = ins[0].shape[-1]
    h = n // 2
    lead = ins[0].shape[1:-1]
    R = int(np.prod(lead, dtype=np.int64))
    nstk = {"cross": 6, "cross2": 12, "mul": 4}[op]
    tr = _crossz_pick_tr(nstk, n, R)
    assert tr is not None, (n, R, op)
    rz, zmats, zshapes = _zfwd_consts(n, dif)
    xs = [x.astype(jnp.float32).reshape(x.shape[0], R, n) for x in ins]
    bx = lambda nc: pl.BlockSpec((nc, tr, n), lambda q: (0, q, 0),
                                 memory_space=pltpu.VMEM)
    bo = pl.BlockSpec((3, tr, h), lambda q: (0, q, 0),
                      memory_space=pltpu.VMEM)
    c2 = lambda shape: pl.BlockSpec(shape, lambda q: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        partial(_cross_z_kernel, op, rz),
        grid=(R // tr,),
        in_specs=[bx(x.shape[0]) for x in xs] + [c2(s) for s in zshapes],
        out_specs=[bo, bo],
        out_shape=[jax.ShapeDtypeStruct((3, R, h), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * R * 2 * n * h + nstk * R * n,
            bytes_accessed=(nstk * R * n + 2 * 3 * R * h) * 4,
            transcendentals=0),
    )
    yr, yi = fn(*xs, *zmats)
    shp = (3,) + lead + (h,)
    return yr.reshape(shp), yi.reshape(shp)


def purify_plane0_dus(yr, yi):
    """purify_plane0 as an in-place k2=0-column update (dynamic-update-slice)
    instead of a whole-array concat: measured 1.21 vs 2.18 ms standalone on a
    256³ 3-stack — the right form when the result is NOT consumed by a larger
    elementwise fusion (e.g. straight out of a Pallas kernel)."""
    qr, qi = yr[..., 0], yi[..., 0]
    axes = (qr.ndim - 2, qr.ndim - 1)
    fr = jnp.roll(jnp.flip(qr, axis=axes), (1, 1), axis=axes)
    fi = jnp.roll(jnp.flip(qi, axis=axes), (1, 1), axis=axes)
    return (yr.at[..., 0].set(0.5 * (qr + fr)),
            yi.at[..., 0].set(0.5 * (qi - fi)))
