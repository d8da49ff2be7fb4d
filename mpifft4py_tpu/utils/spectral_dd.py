"""Double-word variants of the spectral pad/truncate helpers.

Slicing, concatenation, zero-fill and exact power-of-two scalings apply
leaf-wise to the (hi, lo) pairs; only the split-Nyquist *summation* in
truncation needs true dd addition (leaf-wise hi+hi would round at f32 level).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.doubledouble import DD, DDComplex, dd_concat


def _slc(nd, axis, start, stop):
    s = [slice(None)] * nd
    s[axis] = slice(start, stop)
    return tuple(s)


def _zeros_like_slice(x: DDComplex, axis: int, count: int) -> DDComplex:
    shape = list(x.shape)
    shape[axis] = count
    z = jnp.zeros(shape, jnp.float32)
    return DDComplex(DD(z, z), DD(z, z))


def pad_full_axis_dd(x: DDComplex, axis: int, M: int) -> DDComplex:
    N = x.shape[axis]
    if M == N:
        return x
    h = N // 2
    nd = x.ndim
    half = x._map(lambda a: a * jnp.float32(0.5))  # exact
    pos = x[_slc(nd, axis, 0, h)]
    ny = half[_slc(nd, axis, h, h + 1)]
    neg = x[_slc(nd, axis, h + 1, N)]
    zeros = _zeros_like_slice(x, axis, M - N - 1)
    return dd_concat([pos, ny, zeros, ny, neg], axis=axis)


def trunc_full_axis_dd(x: DDComplex, axis: int, N: int) -> DDComplex:
    M = x.shape[axis]
    if M == N:
        return x
    h = N // 2
    nd = x.ndim
    pos = x[_slc(nd, axis, 0, h)]
    ny = x[_slc(nd, axis, h, h + 1)] + x[_slc(nd, axis, M - h, M - h + 1)]  # dd add
    neg = x[_slc(nd, axis, M - h + 1, M)]
    return dd_concat([pos, ny, neg], axis=axis)


def pad_half_axis_dd(x: DDComplex, axis: int, Mf: int) -> DDComplex:
    Nf = x.shape[axis]
    if Mf == Nf:
        return x
    nd = x.ndim
    body = x[_slc(nd, axis, 0, Nf - 1)]
    ny = x[_slc(nd, axis, Nf - 1, Nf)]._map(lambda a: a * jnp.float32(0.5))
    zeros = _zeros_like_slice(x, axis, Mf - Nf)
    return dd_concat([body, ny, zeros], axis=axis)


def trunc_half_axis_dd(x: DDComplex, axis: int, Nf: int) -> DDComplex:
    if x.shape[axis] == Nf:
        return x
    nd = x.ndim
    body = x[_slc(nd, axis, 0, Nf - 1)]
    ny = x[_slc(nd, axis, Nf - 1, Nf)]._map(lambda a: a * jnp.float32(2.0))
    return dd_concat([body, ny], axis=axis)


def flip_conj_plane_dd(q: DDComplex, axes) -> DDComplex:
    """conj(Q(−k)) over full fft-layout ``axes`` (dd analog of
    utils.spectral.flip_conj_plane)."""
    axes = tuple(axes)
    f = q._map(lambda v: jnp.roll(jnp.flip(v, axis=axes),
                                  (1,) * len(axes), axis=axes))
    return f.conj()


def sym_select_set_dd(x: DDComplex, off: int, sym: DDComplex,
                      cond=None) -> DDComplex:
    """x[..., off] = (cond ? sym : x[..., off]), leafwise (dd pytrees)."""
    import jax

    q = x[..., off]
    if cond is not None:
        sym = jax.tree.map(lambda a, b: jnp.where(cond, a, b), sym, q)
    return jax.tree.map(lambda xv, sv: xv.at[..., off].set(sv), x, sym)
