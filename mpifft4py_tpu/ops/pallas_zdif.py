"""DIF-split packed r2c/c2r z-stage — sub-dense MXU cost without flips.

The packed z transform (last axis, lanes) has been a DENSE (n × h) matmul
pair since round 1: 2·n·h real madds per row.  Every earlier factored-z
attempt lost to one of three Mosaic limits (BENCH.md round-2/3 negative
results): value lane↔sublane transposes run at ~3× copy bandwidth, `rev`
(lane flips) does not lower at all, and any flip-free ALL-matmul
factorisation composes back to the dense DFT matrix (linear maps — the
analytic negative).  This module threads between all three with a
decimation-in-FREQUENCY split that keeps the butterfly on contiguous
lane blocks and pushes every index reversal into host-built matrices:

    n = r·m (m = 128), h = n/2, lanes = z.  View x as r contiguous
    m-wide lane blocks y_c = x[:, c·m:(c+1)·m]  (free: 128-aligned slices).

    u_0     = Σ_c y_c                     (real)
    u_{r/2} = Σ_c (−1)^c y_c              (real)
    u_b     = Σ_c w_r^{bc} y_c            (complex, b = 1..r/2−1; w_r = e^{−2πi/r})

    X[r·t + b] = DFT_m(u_b · w_n^{bq})[t]         (w_n = e^{−2πi/n})
    X[r·t + (r−b)] = DFT_m(conj(u_b) · w_n^{(r−b)q})[t]

Only k = 0..h−1 is kept (plus the packed rider: lane 0 = X₀ + i·X_{n/2}),
so the per-block DFT_m matrices keep exactly m/2 = 64 columns each and the
conjugate pair (b, r−b) shares its lhs — merged into (m × 128) matmuls at
full MXU lane utilisation.  Total matmul cost: 4·m·h madds/row = 2/r of
the dense pair (4× at n = 1024, where the dense z stage measured 145 of
364 ms of the 1024³ round trip).  The butterfly is ~r VPU madds/element
with Python-float immediates.  No transposes, no `rev`, no (1,1)
broadcasts — every primitive is already hardware-proven in pallas_fft3d.

The price: the packed spectrum leaves in k-DECIMATED lane order
(`zdif_perm`), with block pairs laid out slot-wise:
[b=0 | b=r/2 | b=1 | b=r−1 | …].  Lane 0 still holds the plane-0 rider,
so `purify_plane0` and the fused x-stage epilogues work unchanged; every
OTHER consumer uses the factored k2/m2 VECTORS, which the solver permutes
(`_packed_arrays`).  The complex API boundary keeps the dense (natural
order) z-stage — permuted order is a packed-interface-only layout, exactly
like the packed layout itself.

Gate: n ≡ 0 (mod 256) with r = n/128 ∈ {4, 6, 8} — the 512/768/1024
classes.  At n = 256 (r = 2) the flop count ties the dense pair, so the
dense kernel stays.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["zdif_ok", "zdif_active", "zdif_perm",
           "rfft_last_zdif", "irfft_last_zdif",
           "zdif_fwd_slots", "zdif_bwd_slices",
           "dif_interleave", "dif_deinterleave"]

_M = 128          # per-block DFT size == MXU contraction sweet spot


def _dot(a, b):
    from . import pallas_fft3d as p3
    return p3._dot(a, b)


def zdif_ok(n: int) -> bool:
    """Shape gate: n = r·128 with even r in [4, 8] (512/768/1024-class)."""
    return n % 256 == 0 and 4 <= n // _M <= 8


def zdif_active(n: int) -> bool:
    """Whether the packed pipeline uses the DIF z-stage (permuted k2 order).
    MPIFFT4PY_TPU_ZDIF: "1" force-on (where zdif_ok), "0" off, default auto."""
    env = os.environ.get("MPIFFT4PY_TPU_ZDIF", "auto")
    if env == "0":
        return False
    return zdif_ok(n)


@lru_cache(maxsize=None)
def zdif_perm(n: int):
    """lane -> k map of the DIF output order (length h; perm[0] == 0, the
    rider lane).  Packed vectors follow as v_perm = v[zdif_perm(n)]."""
    r, m, h = n // _M, _M, n // 2
    ks = []
    for p in range(r // 2):
        for b in ((0, r // 2) if p == 0 else (p, r - p)):
            ks.extend(r * t + b for t in range(m // 2))
    assert len(ks) == h and ks[0] == 0
    return np.array(ks)


@lru_cache(maxsize=None)
def zdif_iperm(n: int):
    """k -> lane inverse of zdif_perm."""
    p = zdif_perm(n)
    ip = np.empty_like(p)
    ip[p] = np.arange(len(p))
    return ip


@lru_cache(maxsize=None)
def _piece_offsets(n: int):
    """Lane offset of residue b's contiguous 64-lane piece in the DIF
    layout: slot p = min(b, r−b) holds [b=p | b=r−p] (slot 0: [0 | r/2]),
    so piece(b) = 128·slot + 64·half.  The DIF order is therefore NOT an
    arbitrary permutation — natural order is the stride-r interleave of r
    contiguous pieces, which XLA lowers far better than a lane gather
    (measured: the `take` unpermute ran at 46-61% of elementwise rate)."""
    r = n // _M
    off = {}
    for p in range(r // 2):
        bs = (0, r // 2) if p == 0 else (p, r - p)
        for half, b in enumerate(bs):
            off[b] = 128 * p + 64 * half
    return tuple(off[b] for b in range(r))


def dif_interleave(x, n: int):
    """DIF-ordered lanes (…, h) -> natural k order, as r static 64-lane
    slices + stack + reshape (equivalent to ``x[..., zdif_iperm(n)]``)."""
    r, h = n // _M, n // 2
    assert x.shape[-1] == h, (x.shape, n)
    pieces = [x[..., o:o + _M // 2] for o in _piece_offsets(n)]
    return jnp.stack(pieces, axis=-1).reshape(x.shape[:-1] + (h,))


def dif_deinterleave(x, n: int):
    """Natural k order (…, h) -> DIF lane order, as a (64, r) lane view +
    r column slices re-concatenated in slot order (equivalent to
    ``x[..., zdif_perm(n)]``)."""
    r, h = n // _M, n // 2
    assert x.shape[-1] == h, (x.shape, n)
    v = x.reshape(x.shape[:-1] + (_M // 2, r))
    off = _piece_offsets(n)
    order = sorted(range(r), key=lambda b: off[b])
    return jnp.concatenate([v[..., b] for b in order], axis=-1)


def _wr(b: int, c: int, r: int, sign: int):
    """w_r^{bc} as float32 Python immediates (cos, sin), exact at multiples
    of π/2."""
    k = (sign * b * c) % r
    ang = 2.0 * np.pi * k / r
    return float(np.float32(np.cos(ang))), float(np.float32(np.sin(ang)))


@lru_cache(maxsize=None)
def _zdif_fwd_mats(n: int):
    """Stacked forward slot matrices (S, m, 128), S = r/2:
    slot_re = lhsA @ MA[p] + lhsB @ MB[p];  slot_im = lhsA @ MC[p] + lhsB @ MD[p]
    with (lhsA, lhsB) = (u_0, u_{r/2}) at p = 0, (Re u_p, Im u_p) else.
    Column t of block b computes X[r·t + b]; block-0 column 0 is the packed
    rider (re row = Σ, im row = (−1)^q — X_{n/2})."""
    r, m, h = n // _M, _M, n // 2
    q = np.arange(m)[:, None]
    t = np.arange(m // 2)[None, :]

    def G(b):                      # (m, 64) complex: w_n^{bq} · F_m[:, kept t]
        return np.exp(-2j * np.pi * q * (b / n + t / m))

    S = r // 2
    MA = np.zeros((S, m, 2 * (m // 2)), np.float64)
    MB = np.zeros_like(MA)
    MC = np.zeros_like(MA)
    MD = np.zeros_like(MA)
    half = m // 2
    # p = 0: two real lhs, block-diagonal halves
    G0 = G(0)
    MA[0, :, :half] = G0.real
    MC[0, :, :half] = G0.imag
    MA[0, :, 0] = 1.0                          # rider re: X0 = Σ u0
    MC[0, :, 0] = np.cos(np.pi * np.arange(m))  # rider im: X_{n/2}
    Gh = G(r // 2)
    MB[0, :, half:] = Gh.real
    MD[0, :, half:] = Gh.imag
    # p >= 1: complex lhs u_p serves blocks p and r−p
    for p in range(1, S):
        Gb, Gc = G(p), G(r - p)
        MA[p, :, :half], MA[p, :, half:] = Gb.real, Gc.real
        MB[p, :, :half], MB[p, :, half:] = -Gb.imag, Gc.imag
        MC[p, :, :half], MC[p, :, half:] = Gb.imag, Gc.imag
        MD[p, :, :half], MD[p, :, half:] = Gb.real, -Gc.real
    f32 = np.float32
    return MA.astype(f32), MB.astype(f32), MC.astype(f32), MD.astype(f32)



@lru_cache(maxsize=None)
def _zdif_bwd_mats(n: int):
    """Stacked inverse slot matrices (S, 128, m):

        u_re = Zr_slot @ A[p] + Zi_slot @ B[p]
        u_im = Zr_slot @ C[p] + Zi_slot @ D[p]

    where at p = 0 the two "re/im" outputs are the two REAL fields
    (u_0, u_{r/2}).  Each block's conjugate tail (t with r·t+b > h), the
    rider unfold (lane 0 → X₀, X_{n/2}), the z-share 1/n of the inverse
    normalisation and the conjugate-pair 2× for b ≥ 1 are folded into the
    matrices, so the kernel's VPU combine is just

        x[:, c·m+q] = u_0 + (−1)^c u_{r/2}
                      + Σ_{b=1}^{r/2−1} [cos(2πbc/r)·u_re_b − sin(2πbc/r)·u_im_b].

    Derivation: u_b[q] = w_n^{+bq} · Σ_t X_b_full[t] e^{+2πi tq/m}, with
    X_b_full[t] = Σ_l α_{t,l} Z[l] + β_{t,l} conj(Z[l]) over the slot's 128
    lanes — so u_b = Z @ M1 + conj(Z) @ M2 and splitting into planar parts
    gives the four real matrices."""
    r, m, h = n // _M, _M, n // 2
    half = m // 2
    q = np.arange(m)
    S = r // 2

    def u_maps(b, lo, lo2):
        """M1/M2 for u_b where block b sits at slot offset ``lo`` and its
        conjugate partner block (r−b) mod r at ``lo2``."""
        tw = np.exp(2j * np.pi * b * q / n)[None, :]
        M1 = np.zeros((m, m), np.complex128)
        M2 = np.zeros((m, m), np.complex128)
        for t in range(m):
            k = r * t + b
            row = np.exp(2j * np.pi * t * q / m)
            if k == 0:                       # X0 = (Z0 + conj Z0)/2
                M1[lo, :] += 0.5 * row
                M2[lo, :] += 0.5 * row
            elif k == h:                     # X_{n/2} = (Z0 − conj Z0)/(2i)
                M1[lo, :] += -0.5j * row
                M2[lo, :] += 0.5j * row
            elif k < h:                      # stored lane
                M1[lo + t, :] += row
            else:                            # conj tail from partner block
                k2 = n - k
                b2, t2 = k2 % r, k2 // r
                if k2 == 0:                  # conj X0 = X0 (b=0 tail end)
                    M1[lo, :] += 0.5 * row
                    M2[lo, :] += 0.5 * row
                elif k2 == h:
                    M1[lo, :] += -0.5j * row
                    M2[lo, :] += 0.5j * row
                else:
                    assert b2 == (r - b) % r and t2 < half, (b, t, k2)
                    M2[lo2 + t2, :] += row
        return M1 * tw, M2 * tw

    A = np.zeros((S, m, m), np.float64)
    B = np.zeros_like(A)
    C = np.zeros_like(A)
    D = np.zeros_like(A)
    # p = 0: the two real fields.  Block 0 tails fold back into block 0
    # (lo2 = 0); block r/2 tails into block r/2 (lo2 = half).
    M1, M2 = u_maps(0, 0, 0)
    A[0] = (M1 + M2).real / n
    B[0] = -(M1 - M2).imag / n
    M1, M2 = u_maps(r // 2, half, half)
    C[0] = (M1 + M2).real / n
    D[0] = -(M1 - M2).imag / n
    for p in range(1, S):
        M1, M2 = u_maps(p, 0, half)
        A[p] = (M1 + M2).real * (2.0 / n)
        B[p] = -(M1 - M2).imag * (2.0 / n)
        C[p] = (M1 + M2).imag * (2.0 / n)
        D[p] = (M1 - M2).real * (2.0 / n)
    f32 = np.float32
    return A.astype(f32), B.astype(f32), C.astype(f32), D.astype(f32)


# ---------------------------------------------------------------------------
# value-level helpers (reused inside fused kernels)
# ---------------------------------------------------------------------------

def zdif_fwd_slots(x, MA, MB, MC, MD, r):
    """DIF forward on a (rows, n) real VALUE; M* are (S, m, 128) refs (or
    stacked values).  Returns the S slots as [(slot_re, slot_im), …], each
    (rows, 128) — callers store them at lane offset 128·p (or feed them to a
    per-slot y-stage).  All butterfly coefficients are Python-float
    immediates; lane slices are 128-aligned."""
    m = _M
    ys = [x[:, c * m:(c + 1) * m] for c in range(r)]
    slots = []
    for p in range(r // 2):
        if p == 0:
            la = ys[0]
            lb = ys[0]
            for c in range(1, r):
                la = la + ys[c]
                lb = lb - ys[c] if c % 2 else lb + ys[c]
        else:
            la, lb = ys[0], None
            for c in range(1, r):
                cc, ss = _wr(p, c, r, -1)
                if cc == 1.0:
                    la = la + ys[c]
                elif cc == -1.0:
                    la = la - ys[c]
                elif cc != 0.0:
                    la = la + cc * ys[c]
                if ss == 1.0:
                    lb = ys[c] if lb is None else lb + ys[c]
                elif ss == -1.0:
                    lb = -ys[c] if lb is None else lb - ys[c]
                elif ss != 0.0:
                    lb = ss * ys[c] if lb is None else lb + ss * ys[c]
        sr = _dot(la, MA[p]) + _dot(lb, MB[p])
        si = _dot(la, MC[p]) + _dot(lb, MD[p])
        slots.append((sr, si))
    return slots


def zdif_bwd_slices(slot_vals, A, B, C, D, r):
    """DIF inverse from S slot pairs [(Zr_p, Zi_p), …] (each (rows, 128)
    values) to the r real lane-block slices [x_c, …] (each (rows, m)) —
    callers store slice c at lane offset m·c.  A..D are (S, 128, m) refs."""
    u = []
    for p in range(r // 2):
        zr, zi = slot_vals[p]
        u.append((_dot(zr, A[p]) + _dot(zi, B[p]),
                  _dot(zr, C[p]) + _dot(zi, D[p])))
    out = []
    for c in range(r):
        acc = u[0][0] - u[0][1] if c % 2 else u[0][0] + u[0][1]
        for b in range(1, r // 2):
            cc, ss = _wr(b, c, r, +1)
            if cc == 1.0:
                acc = acc + u[b][0]
            elif cc == -1.0:
                acc = acc - u[b][0]
            elif cc != 0.0:
                acc = acc + cc * u[b][0]
            if ss == 1.0:
                acc = acc - u[b][1]
            elif ss == -1.0:
                acc = acc + u[b][1]
            elif ss != 0.0:
                acc = acc - ss * u[b][1]
        out.append(acc)
    return out


# ---------------------------------------------------------------------------
# standalone kernels (drop-in for rfft_last_packed / irfft_last_packed)
# ---------------------------------------------------------------------------

def _zdif_fwd_kernel(r, x_ref, ma_ref, mb_ref, mc_ref, md_ref,
                     or_ref, oi_ref):
    slots = zdif_fwd_slots(x_ref[0], ma_ref, mb_ref, mc_ref, md_ref, r)
    for p, (sr, si) in enumerate(slots):
        or_ref[0, :, p * _M:(p + 1) * _M] = sr
        oi_ref[0, :, p * _M:(p + 1) * _M] = si


def _zdif_bwd_kernel(r, zr_ref, zi_ref, a_ref, b_ref, c_ref, d_ref, o_ref):
    sv = [(zr_ref[0, :, p * _M:(p + 1) * _M],
           zi_ref[0, :, p * _M:(p + 1) * _M]) for p in range(r // 2)]
    for c, xc in enumerate(zdif_bwd_slices(sv, a_ref, b_ref, c_ref, d_ref, r)):
        o_ref[0, :, c * _M:(c + 1) * _M] = xc


def _pick_tr_zdif(R: int, n: int) -> int:
    """Row tile under the scoped-VMEM budget: double-buffered in/out blocks
    plus ~r live (rows, 128) temporaries plus the 8 constant matrices."""
    r = n // _M
    mats = 8 * (r // 2) * _M * _M * 4
    budget = 12 * 1024 * 1024 - mats
    per_tr = (n + n // 2 * 2) * 4 * 2 + (2 * r) * _M * 4
    for tr in (512, 256, 128, 64):
        if R % tr == 0 and per_tr * tr <= budget:
            return tr
    return R


def rfft_last_zdif(x):
    """real (…, n) -> DIF-ordered packed planar (re, im), (…, n/2).
    Lane p·128+j of the output holds X[zdif_perm(n)[p·128+j]]; lane 0 is the
    packed rider X₀ + i·X_{n/2} (same convention as rfft_last_packed)."""
    n = x.shape[-1]
    assert zdif_ok(n), n
    r, h = n // _M, n // 2
    R = int(np.prod(x.shape[:-1], dtype=np.int64))
    MA, MB, MC, MD = (jnp.asarray(a) for a in _zdif_fwd_mats(n))
    tr = _pick_tr_zdif(R, n)
    from functools import partial as _p
    fn = pl.pallas_call(
        _p(_zdif_fwd_kernel, r),
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec((1, tr, n), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((r // 2, _M, _M), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec((1, tr, h), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, R, h), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=R * (4 * _M * h + 2 * r * n),
            bytes_accessed=(R * n + 2 * R * h) * 4, transcendentals=0),
    )
    yr, yi = fn(x.astype(jnp.float32).reshape(1, R, n), MA, MB, MC, MD)
    shp = x.shape[:-1] + (h,)
    return yr.reshape(shp), yi.reshape(shp)


def irfft_last_zdif(xr, xi, n: int):
    """DIF-ordered packed planar (…, n/2) -> real (…, n) (1/n applied)."""
    assert zdif_ok(n), n
    r, h = n // _M, n // 2
    assert xr.shape[-1] == h
    R = int(np.prod(xr.shape[:-1], dtype=np.int64))
    A, B, C, D = (jnp.asarray(a) for a in _zdif_bwd_mats(n))
    tr = _pick_tr_zdif(R, n)
    from functools import partial as _p
    fn = pl.pallas_call(
        _p(_zdif_bwd_kernel, r),
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec((1, tr, h), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, h), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((r // 2, _M, _M), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, tr, n), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=R * (4 * _M * h + 2 * r * n),
            bytes_accessed=(R * n + 2 * R * h) * 4, transcendentals=0),
    )
    y = fn(xr.reshape(1, R, h), xi.reshape(1, R, h), A, B, C, D)
    return y.reshape(xr.shape[:-1] + (n,))
