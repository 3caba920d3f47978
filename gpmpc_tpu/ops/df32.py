"""Double-float32 (df32) arithmetic — f64-grade accuracy on f32 hardware.

TPU has no hardware float64: XLA emulates it in software at ~100x the cost
(measured 1.05 s vs 7 ms for the full planning step, PERFORMANCE.md). But the
f32 planning path has a hard validity boundary: once MLL training drives the
GP noise floor toward 1e-6, cond(K + sigma^2 I) ~ 1e6 makes beta/iK entries
reach +-1e2..1e3 with heavy sign cancellation in the moment-matching
contractions, and the log-domain exponents reach 1e4..1e5 magnitudes — f32
rounding (eps ~ 6e-8) then drowns the ~1e-2 signals.

The fix used here is *error-free transformations*: every f32 add/mul can be
split exactly into (result, rounding_error) pairs using only f32 ops
(Knuth two-sum, Dekker/Veltkamp two-prod). Carrying (hi, lo) pairs through
the cancellation-prone reductions gives ~2x44-bit effective precision at a
small constant-factor cost in VPU flops — everything stays elementwise f32,
fusible by XLA, with no sequential software-f64 kernels.

All reductions use a *tree* (pairwise halving) of df additions: log2(N)
fully-vectorized levels instead of a sequential Kahan loop, so the
compensation costs latency O(log N), not O(N).

References: Dekker (1971), Knuth TAOCP v2, Hida/Li/Bailey double-double.
No reference-repo counterpart — the reference runs global float64 on CPU
(total_config.py:11); this module is what replaces that capability on TPU.
"""

from __future__ import annotations

from typing import Tuple

import math as _math

import jax
import jax.numpy as jnp
import numpy as _np
from jax import lax

Array = jnp.ndarray
DF = Tuple[Array, Array]  # (hi, lo), value = hi + lo, |lo| <= ulp(hi)/2

def two_sum(a: Array, b: Array) -> DF:
    """Exact: a + b = s + e with s = fl(a + b). 6 flops, branch-free."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a: Array, b: Array) -> DF:
    """Exact when |a| >= |b|: a + b = s + e. 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


# Keep the top 12 significand bits (1 implicit + 11 stored): both halves of
# the split then carry <= 12 bits, so every partial product in two_prod has
# <= 24 significant bits and is EXACT in f32. numpy scalar on purpose: a
# module-level jnp scalar would be a committed device constant captured by
# every consuming jaxpr (fastpath-arg hazards in mixed-device sessions).
_SPLIT_MASK = _np.uint32(0xFFFFF000)


def _split12(a: Array) -> DF:
    """Truncating 12-bit significand split via mantissa masking.

    Classic Veltkamp splitting (c = a * 4097; ah = c - (c - a)) depends on
    `a * 4097` being ROUNDED before the subtractions — but XLA's CPU backend
    compiles with LLVM AllowFPOpFusion=Fast, so when a fusion rematerializes
    that multiply next to its consumer subtraction, instruction selection
    contracts them into an FMA and the rounding silently disappears
    (measured: fl(k * ln2_hi) ties resolve differently between duplicated
    copies, costing df_exp six decimal digits and NaN-ing the round-2 df32
    episode; optimization_barrier does not survive to the fusion pass, and
    this XLA build exposes no flag for it). Masking the mantissa in integer
    space has no such failure mode: bitcast/and are exact on every backend,
    and `a - ah` is exact by construction (same binade, trailing bits only).
    """
    ai = lax.bitcast_convert_type(a, jnp.uint32)
    ah = lax.bitcast_convert_type(ai & _SPLIT_MASK, jnp.float32)
    return ah, a - ah


def two_prod(a: Array, b: Array) -> DF:
    """Exact product: a * b = p + e with |e| <= ulp(p), contraction-immune.

    Every floating multiply below is EXACT (<= 24 significant bits by the
    12-bit splits), so an FMA contraction of any mul+add pair computes the
    same value as the uncontracted sequence — the algorithm is correct on
    backends that contract aggressively (XLA:CPU) and on those that don't
    (TPU), with no barriers and full fusion freedom. The exact partial
    products are then combined with add-only two_sum chains (ISel never
    contracts or reassociates pure adds), capturing every rounding error:
    p + e = a*b up to O(eps^2 * |a*b|) from the final error-channel adds.
    """
    # broadcast first: the masked split bitcasts, and Mosaic (Pallas TPU)
    # only lowers bitcast on vectors — a scalar operand (e.g. the ln2
    # constant inside df_exp) must ride the vector shape of its partner
    shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))
    if jnp.shape(a) != shape:
        a = jnp.broadcast_to(a, shape)
    if jnp.shape(b) != shape:
        b = jnp.broadcast_to(b, shape)
    ah, al = _split12(a)
    bh, bl = _split12(b)
    hh = ah * bh  # exact: 12 x 12 bits
    m1 = ah * bl  # exact
    m2 = al * bh  # exact
    ll = al * bl  # exact
    s, e1 = two_sum(m1, m2)
    p, e2 = two_sum(hh, s)
    return fast_two_sum(p, (e1 + e2) + ll)


def df_add(xh: Array, xl: Array, yh: Array, yl: Array) -> DF:
    """(xh+xl) + (yh+yl) with relative error O(eps^2)."""
    sh, se = two_sum(xh, yh)
    se = se + (xl + yl)
    return fast_two_sum(sh, se)


def df_add_f32(xh: Array, xl: Array, y: Array) -> DF:
    sh, se = two_sum(xh, y)
    se = se + xl
    return fast_two_sum(sh, se)


@jax.custom_jvp
def df_mul(xh: Array, xl: Array, yh: Array, yl: Array) -> DF:
    """(xh+xl) * (yh+yl) with relative error O(eps^2).

    Custom derivative (semantic product rule in plain f32): the df pair
    represents ONE number, so d(x*y) = y dx + x dy with x = xh+xl collapsed.
    Autodiff THROUGH the error-free transformations computes the same
    Jacobian (the split bitcasts carry zero gradient and the partial-product
    chain sums to it) but reverse mode then saves ~10 (N, N)-sized residuals
    per df_mul — the dominant VMEM/HBM load of the moment-matching backward.
    The custom rule saves two. Gradients only steer the L-BFGS optimizers
    (objective VALUES come from the compensated forward), so f32-grade
    gradient accuracy is the design point (PERFORMANCE.md).
    """
    ph, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    return fast_two_sum(ph, pe)


@df_mul.defjvp
def _df_mul_jvp(primals, tangents):
    xh, xl, yh, yl = primals
    dxh, dxl, dyh, dyl = tangents
    out = df_mul(xh, xl, yh, yl)
    dv = (dxh + dxl) * (yh + yl) + (dyh + dyl) * (xh + xl)
    return out, (dv, jnp.zeros_like(dv))


def df_mul_f32(xh: Array, xl: Array, y: Array) -> DF:
    """(xh+xl) * y for a plain-f32 y."""
    ph, pe = two_prod(xh, y)
    pe = pe + xl * y
    return fast_two_sum(ph, pe)


def df_neg(xh: Array, xl: Array) -> DF:
    return -xh, -xl


def df_div(xh: Array, xl: Array, yh: Array, yl: Array) -> DF:
    """(xh+xl) / (yh+yl) with relative error O(eps^2).

    One Newton step on the f32 quotient: q1 = fl(xh/yh); the residual
    x - q1*y is computed exactly via two_prod, and its quotient by yh is
    the correction. Standard double-double division (Hida/Li/Bailey).
    """
    q1 = xh / yh
    ph, pe = two_prod(q1, yh)
    # r = x - q1*y, accurate at eps^2 relative to x
    rh, rl = df_add(xh, xl, -ph, -(pe + q1 * yl))
    q2 = (rh + rl) / yh
    return fast_two_sum(q1, q2)


def df_sqrt(xh: Array, xl: Array) -> DF:
    """sqrt(xh+xl) with relative error O(eps^2) (one Newton/Heron step).

    s1 = fl(sqrt(xh)); the residual x - s1^2 is exact via two_prod and the
    correction is residual / (2 s1). Negative/zero inputs follow jnp.sqrt
    semantics on the hi part (NaN / 0) — callers guard as for plain sqrt.
    """
    s1 = jnp.sqrt(xh)
    ph, pe = two_prod(s1, s1)
    rh, rl = df_add(xh, xl, -ph, -pe)
    s2 = (rh + rl) / (2.0 * s1)
    return fast_two_sum(s1, s2)


def df_sum(hi: Array, lo: Array, axis: int = -1) -> DF:
    """Compensated reduction of df values along ``axis``.

    Pairwise-halving tree: ceil(log2(N)) levels of fully-vectorized df_add
    (odd tails padded with zeros), keeping the whole reduction elementwise
    and parallel. Error ~ O(eps^2 * log N * sum|x|) — effectively exact for
    the cancellation magnitudes this framework sees (|terms| <= 1e6 against
    eps^2 ~ 4e-15).
    """
    hi = jnp.moveaxis(hi, axis, -1)
    lo = jnp.moveaxis(lo, axis, -1)
    n = hi.shape[-1]
    while n > 1:
        if n % 2 == 1:
            pad = [(0, 0)] * (hi.ndim - 1) + [(0, 1)]
            hi = jnp.pad(hi, pad)
            lo = jnp.pad(lo, pad)
            n += 1
        hi, lo = df_add(hi[..., 0::2], lo[..., 0::2], hi[..., 1::2], lo[..., 1::2])
        n //= 2
    return hi[..., 0], lo[..., 0]


def df_dot_f32(a: Array, bh: Array, bl: Array, axis: int = -1) -> DF:
    """Compensated sum_k a[k] * (bh[k] + bl[k]) with a in plain f32.

    Every product is error-free (two_prod) and the accumulation is a df
    tree — the pattern for the beta/iK-weighted moment-matching reductions,
    whose terms are +-1e2..1e3 cancelling to ~1e-2.
    """
    ph, pe = two_prod(a, bh)
    pe = pe + a * bl
    return df_sum(ph, pe, axis=axis)


_LN2_64 = float(_np.log(2.0))
_LN2_HI = _np.float32(_LN2_64)
_LN2_LO = _np.float32(_LN2_64 - float(_LN2_HI))
_INV_LN2 = _np.float32(1.0 / _LN2_64)
# 1/n! for the degree-12 Taylor of exp on |r| <= ln2/2, as f32 (hi, lo)
# pairs (Horner order: highest degree first).
_EXP_COEF = [
    (_np.float32(c), _np.float32(c - float(_np.float32(c))))
    for c in [1.0 / _math.factorial(n) for n in range(12, -1, -1)]
]


@jax.custom_jvp
def df_exp(xh: Array, xl: Array) -> DF:
    """exp of a df number as a df, accurate to ~1e-13 relative.

    Custom derivative: d exp = exp, so the backward multiplies the
    (collapsed) cotangent by the saved OUTPUT in plain f32 — no residuals
    from the degree-12 Horner chain (which reverse-mode would otherwise
    checkpoint as ~25 (N, N)-sized df intermediates per call: the single
    largest VMEM/HBM load of the moment-matching backward). Same
    f32-grade-gradient design point as df_mul.

    The obvious ``jnp.exp(hi) * (1 + lo)`` is NOT enough: the hardware f32
    exp carries ~2^-24 relative error, and the moment-matching covariance
    cancellation multiplies E-matrix entries by beta_i * beta_j ~ 2.5e5
    before cancelling ~7 orders — measured ~1e-2 absolute error in S against
    a ~1e-5 true predictive variance (the round-2 df32 episode failure).

    So compute exp in df precision end to end:
      * range-reduce: k = round(x / ln2)  ->  x = k*ln2 + r, |r| <= ln2/2.
        k is an exact f32 integer (|x| <= ~1e5 << 2^24) and k*ln2 is removed
        in df, so r carries the full 48-bit argument.
      * exp(r) by a degree-12 df Horner of the Taylor series — remainder
        r^13/13! < 2e-16, accumulated df rounding ~25 * 2^-48 ~ 1e-13.
      * scale by 2^k, BUILT BITWISE as (k+127)<<23: XLA's f32 exp2 is an
        approximation that is ~1.5e-6 off even at integer arguments
        (measured: exp2(-47) = 7.10541634e-15 vs 2^-47 = 7.10542736e-15 on
        XLA:CPU), which would silently cap the whole function at f32
        accuracy. The assembled bit pattern is the exact power of two, and
        multiplying (hi, lo) by it is exact. k < -126 flushes to 0 — the
        true exp is < 1.2e-38 there, far below anything this framework's
        cancellations can see.

    jnp.round and the integer bit-assembly have zero gradient, so autodiff
    sees the smooth r-path only.
    """
    return _df_exp_impl(xh, xl)


def _df_exp_impl(xh, xl):
    k = jnp.round(xh * _INV_LN2)
    ph, pe = two_prod(k, _LN2_HI)
    pe = pe + k * _LN2_LO
    th, tl = fast_two_sum(ph, pe)
    rh, rl = df_add(xh, xl, -th, -tl)

    eh = jnp.full_like(xh, _EXP_COEF[0][0])
    el = jnp.full_like(xh, _EXP_COEF[0][1])
    for ch, cl in _EXP_COEF[1:]:
        eh, el = df_mul(eh, el, rh, rl)
        eh, el = df_add(eh, el, jnp.full_like(xh, ch), jnp.full_like(xh, cl))

    ki = jnp.clip(k, -127.0, 127.0).astype(jnp.int32)
    scale = lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
    scale = jnp.where(k < -126, jnp.float32(0), scale)
    return eh * scale, el * scale


@df_exp.defjvp
def _df_exp_jvp(primals, tangents):
    eh, el = _df_exp_impl(*primals)
    dv = (tangents[0] + tangents[1]) * (eh + el)
    return (eh, el), (dv, jnp.zeros_like(dv))


def split_f64(x) -> DF:
    """Split a float64 array into an f32 (hi, lo) pair: hi = f32(x),
    lo = f32(x - hi). Used to ship the f64 master factorization (beta, iK,
    exponent constants) into the f32 compute path without losing the bits
    that the cancellation needs."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo
