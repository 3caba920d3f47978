"""Batched Gaussian-process dynamics model — the TPU compute core.

The reference keeps one GPyTorch ``ExactGP`` per state dimension in a Python
list (reference gp_model.py:318-397). Here the whole model family is a single
stacked parameter pytree with a leading ``Ns`` axis, so every operation —
ARD-RBF Gram construction, jittered Cholesky, triangular solves, exact
marginal log likelihood, and PILCO moment matching — is one batched XLA
computation that tiles onto the MXU.

Hyperparameters are stored *raw* (unconstrained) and mapped into their
GPyTorch-style ``Interval`` boxes with a sigmoid reparameterization
(lower + (upper - lower) * sigmoid(raw)), matching the constraint semantics
registered per-model in the reference (gp_model.py:356-374).

Memory is a fixed-capacity padded buffer with a boolean active mask (see
gpmpc_tpu/memory/buffer.py). Masking rules keeping the padded problem exactly
equivalent to the dense one on the active block:

* Gram rows/cols of inactive points are zeroed and their diagonal set to 1
  (no noise added), so ``K + diag(noise)`` stays block-diagonal:
  ``[K_active + sigma^2 I, 0; 0, I]``.
* Targets of inactive points are zero, hence ``beta = K^-1 y`` has zero rows
  for padding and padded points contribute nothing to the moment-matched
  mean/covariance sums.
* ``iK`` is re-masked to zero outside the active block so the
  ``sum(iK * diag(L))`` covariance correction (reference gp_model.py:175)
  ignores padding.

Equation provenance: one-step moment matching follows reference
gp_model.py:112-180 (itself the standard PILCO Gaussian-input/RBF posterior
moments), trajectory propagation reference gp_model.py:60-110, factorizations
reference gp_model.py:400-431, MLL training reference gp_model.py:193-306.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as _np
from jax import lax


class GPBounds(NamedTuple):
    """Interval-constraint boxes for the hyperparameters (constrained space).

    Shapes: lengthscale bounds (Ns, D); outputscale/noise bounds (Ns,).
    Noise bounds are *variances* (the reference squares min/max_std_noise,
    gp_model.py:359-360).
    """

    min_lengthscale: jnp.ndarray
    max_lengthscale: jnp.ndarray
    min_outputscale: jnp.ndarray
    max_outputscale: jnp.ndarray
    min_noise: jnp.ndarray
    max_noise: jnp.ndarray


class GPParams(NamedTuple):
    """Raw (unconstrained) hyperparameters, one stacked row per state dim."""

    raw_lengthscales: jnp.ndarray  # (Ns, D)
    raw_outputscale: jnp.ndarray  # (Ns,)
    raw_noise: jnp.ndarray  # (Ns,)


class FactorizationCache(NamedTuple):
    """Everything inference needs that depends only on memory + params.

    Mirrors the reference's ``prepare_inference`` precomputation
    (gp_model.py:182-191): iK, beta, and the constrained kernel parameters.
    ``L`` and ``noises`` are carried so the cache can be *extended* in
    O(N^2) when a point is appended (``extend_factorization``) instead of
    refactorized from scratch — a capability the reference lacks (it redoes
    the full Cholesky every planning step, gp_model.py:400-431).
    """

    x_mem: jnp.ndarray  # (N, D) padded memory inputs
    mask: jnp.ndarray  # (N,) active-point mask
    iK: jnp.ndarray  # (Ns, N, N), zero outside active block
    beta: jnp.ndarray  # (Ns, N), zero rows for padding
    lengthscales: jnp.ndarray  # (Ns, D) constrained
    outputscales: jnp.ndarray  # (Ns,) constrained
    L: jnp.ndarray  # (Ns, N, N) lower Cholesky of K + sigma^2 I (identity on padding)
    noises: jnp.ndarray  # (Ns,) constrained noise variances
    y_mem: jnp.ndarray  # (N, Ns) padded targets (zero rows for padding)


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _logit(p):
    return jnp.log(p) - jnp.log1p(-p)


def constrain(raw, lo, hi):
    """raw -> constrained via lower + (upper-lower)*sigmoid(raw)."""
    return lo + (hi - lo) * _sigmoid(raw)


def unconstrain(value, lo, hi):
    """constrained -> raw; clips slightly inside the box for finiteness."""
    frac = (value - lo) / (hi - lo)
    frac = jnp.clip(frac, 1e-12, 1.0 - 1e-12)
    return _logit(frac)


def params_from_constrained(lengthscales, outputscale, noise, bounds: GPBounds) -> GPParams:
    return GPParams(
        raw_lengthscales=unconstrain(lengthscales, bounds.min_lengthscale, bounds.max_lengthscale),
        raw_outputscale=unconstrain(outputscale, bounds.min_outputscale, bounds.max_outputscale),
        raw_noise=unconstrain(noise, bounds.min_noise, bounds.max_noise),
    )


def constrained_params(params: GPParams, bounds: GPBounds):
    """Return (lengthscales (Ns,D), outputscale (Ns,), noise (Ns,))."""
    return (
        constrain(params.raw_lengthscales, bounds.min_lengthscale, bounds.max_lengthscale),
        constrain(params.raw_outputscale, bounds.min_outputscale, bounds.max_outputscale),
        constrain(params.raw_noise, bounds.min_noise, bounds.max_noise),
    )


def gram_ard_rbf(lengthscales: jnp.ndarray, outputscales: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched ARD-RBF Gram matrices k(x, x) for all Ns models at once.

    k_m(a, b) = outputscale_m * exp(-0.5 * sum_d ((a_d - b_d) / ls_{m,d})^2)

    Args:
      lengthscales: (Ns, D); outputscales: (Ns,); x: (N, D)
    Returns:
      (Ns, N, N)

    Implemented with the squared-norm expansion so the O(Ns*N^2*D) work is a
    single batched matmul on the MXU rather than an O(N^2) broadcast subtract.
    """
    xs = x[None, :, :] / lengthscales[:, None, :]  # (Ns, N, D)
    sq = jnp.sum(xs * xs, axis=-1)  # (Ns, N)
    cross = jnp.einsum("mnd,mkd->mnk", xs, xs)  # (Ns, N, N) — MXU
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    return outputscales[:, None, None] * jnp.exp(-0.5 * d2)


def masked_cholesky_factorize(
    params: GPParams,
    bounds: GPBounds,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    upcast: bool = False,
) -> FactorizationCache:
    """Compute (iK, beta) with identity padding on inactive rows.

    Equivalent of reference ``calculate_factorizations`` (gp_model.py:400-431)
    on the active block: ``K + sigma^2 I = L L^T``, ``iK = K^-1`` materialized,
    ``beta = K^-1 y``.

    ``upcast=True`` computes AND returns the cache in float64 regardless of
    input dtype (mixed-precision mode: cond(K + sigma^2 I) reaches ~1e6 once
    MLL training drives the noise floor down, where f32 factorization error
    eps*cond ~ 0.1 wrecks the GP predictions; the rollout itself is fine in
    f32). Requires jax_enable_x64. Callers cast the cache down for the f32
    compute path (planner.py).
    """
    if upcast:
        f64 = jnp.float64
        params = GPParams(*(p.astype(f64) for p in params))
        bounds = GPBounds(*(b.astype(f64) for b in bounds))
        x = x.astype(f64)
        y = y.astype(f64)
    lengthscales, outputscales, noise = constrained_params(params, bounds)
    n = x.shape[0]
    dtype = x.dtype
    mask_f = mask.astype(dtype)
    mask2 = mask_f[:, None] * mask_f[None, :]  # (N, N)

    from ..ops import gram  # local import: ops dispatches back into this module

    K = gram(lengthscales, outputscales, x)  # (Ns, N, N) — Pallas on TPU f32
    eye = jnp.eye(n, dtype=dtype)
    # zero inactive rows/cols, then give them a unit diagonal; active diagonal
    # gets the noise variance added.
    K = K * mask2[None, :, :]
    diag_fix = jnp.where(mask, noise[:, None], 1.0)  # (Ns, N)
    K = K + jnp.einsum("ij,mj->mij", eye, diag_fix)

    L = jnp.linalg.cholesky(K)
    # iK = L^-T L^-1 via ONE batched triangular solve + a symmetric matmul:
    # the matmul rides the MXU, halving the sequential triangular-solve work
    # vs cho_solve(eye) (two N-rhs solves).
    eye_b = jnp.broadcast_to(eye, K.shape)
    Linv = lax.linalg.triangular_solve(L, eye_b, left_side=True, lower=True)
    iK = jnp.einsum("mki,mkj->mij", Linv, Linv)
    iK = iK * mask2[None, :, :]

    y_masked = (y * mask_f[:, None]).T[:, :, None]  # (Ns, N, 1)
    beta = jax.scipy.linalg.cho_solve((L, True), y_masked)[..., 0]  # (Ns, N)
    beta = beta * mask_f[None, :]

    return FactorizationCache(
        x_mem=x,
        mask=mask,
        iK=iK,
        beta=beta,
        lengthscales=lengthscales,
        outputscales=outputscales,
        L=L,
        noises=noise,
        y_mem=y * mask_f[:, None],
    )


def extend_factorization(cache: FactorizationCache, x_new: jnp.ndarray, y_new: jnp.ndarray) -> FactorizationCache:
    """Append ONE point to the factorization in O(Ns * N^2).

    TPU-native replacement for the per-step O(Ns * N^3) refactorization the
    reference performs (gp_model.py:400-431 called from :182-191 every
    planning step): with hyperparameters unchanged, appending a memory point
    is a bordered-Cholesky extension plus a rank-1 inverse update.

    With e the one-hot of the insert slot n (= current active count),
    k the kernel column against stored points, c = outputscale + noise:

      L      <- row n becomes [l21, l22] with l21 = L^-1 k, l22 = sqrt(c - |l21|^2)
      iK_new  = iK + v v^T / s,  v = iK k - e,  s = c - k^T iK k     (Schur)
      beta    = iK_new y_new                                          (matvec)

    Padding invariants (unit diagonal L, zero iK/beta rows) are preserved.
    Float32 drift over repeated extensions is bounded by the controller,
    which refactorizes fully whenever hyperparameters change (every
    training_frequency steps).
    """
    dtype = cache.x_mem.dtype
    x_new = x_new.astype(dtype)  # mixed mode: f32 rows extend an f64 master
    y_new = y_new.astype(dtype)
    n_cap = cache.x_mem.shape[0]
    n = jnp.sum(cache.mask.astype(jnp.int32))  # insert slot
    e = (jnp.arange(n_cap) == n).astype(dtype)  # (N,)
    mask_f = cache.mask.astype(dtype)

    x_mem = cache.x_mem + e[:, None] * (x_new[None, :] - cache.x_mem)
    y_mem = cache.y_mem + e[:, None] * (y_new[None, :] - cache.y_mem)
    new_mask = jnp.logical_or(cache.mask, e.astype(bool))

    # kernel column vs active points: (Ns, N)
    diff = (cache.x_mem - x_new[None, :])[None, :, :] / cache.lengthscales[:, None, :]
    k_col = cache.outputscales[:, None] * jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1))
    k_col = k_col * mask_f[None, :]
    c = cache.outputscales + cache.noises  # (Ns,) = k(x,x) + sigma^2

    # bordered Cholesky row: l21 = L^-1 k (padding rows of L are identity and
    # k is zero there, so l21 is zero on padding), l22 = sqrt(c - |l21|^2)
    l21 = lax.linalg.triangular_solve(cache.L, k_col[..., None], left_side=True, lower=True)[..., 0]
    l22 = jnp.sqrt(jnp.maximum(c - jnp.sum(l21 * l21, axis=-1), jnp.asarray(1e-12, dtype)))
    new_row = l21 * (1.0 - e)[None, :] + l22[:, None] * e[None, :]  # (Ns, N)
    L_new = cache.L * (1.0 - e)[None, :, None] + new_row[:, None, :] * e[None, :, None]

    # rank-1 Schur update of the materialized inverse
    u = jnp.einsum("mij,mj->mi", cache.iK, k_col)  # (Ns, N), zero at slot n
    s = jnp.maximum(c - jnp.sum(k_col * u, axis=-1), jnp.asarray(1e-12, dtype))  # (Ns,)
    v = u - e[None, :]
    iK_new = cache.iK + v[:, :, None] * v[:, None, :] / s[:, None, None]

    beta_new = jnp.einsum("mij,jm->mi", iK_new, y_mem)

    return cache._replace(x_mem=x_mem, y_mem=y_mem, mask=new_mask, L=L_new, iK=iK_new, beta=beta_new)


def _small_spd_inv_det(M: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse and determinant of small SPD matrices via UNROLLED Cholesky.

    M: (..., k, k), k a small static int. Every operation is an elementwise
    jnp op on (...)-shaped slices — no lax.linalg primitives — so XLA fuses
    the whole factorization into the surrounding moment-matching math. This
    is what keeps the rollout scan body free of Cholesky / triangular-solve
    kernels on TPU (which are latency-bound sequential loops even at 3x3).

    Returns (Minv (..., k, k), det (...,)).
    """
    k = M.shape[-1]
    # Pivot guard: in f32 the propagated state covariance can drift slightly
    # indefinite, driving a pivot negative and poisoning the whole rollout
    # with NaN. Clamping at a tiny positive fraction of the row diagonal is
    # inactive for healthy (and all f64-parity) inputs; when it does fire,
    # values are already garbage and the optimizer's keep-best / NaN fallback
    # (reference gp_mpc_controller.py:146-148 semantics) discards them.
    eps = jnp.asarray(1e-10, M.dtype)
    L = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1):
            s = M[..., i, j]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            if i == j:
                s = jnp.maximum(s, eps * jnp.abs(M[..., i, i]) + jnp.asarray(1e-30, M.dtype))
                L[i][i] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    det = L[0][0] * L[0][0]
    for i in range(1, k):
        det = det * (L[i][i] * L[i][i])
    # forward-substitute L^-1 (lower triangular), unrolled
    Li = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1):
            if i == j:
                Li[i][i] = 1.0 / L[i][i]
            else:
                s = L[i][j] * Li[j][j]
                for p in range(j + 1, i):
                    s = s + L[i][p] * Li[p][j]
                Li[i][j] = -s / L[i][i]
    # Minv = L^-T L^-1 (symmetric)
    rows = []
    for i in range(k):
        row = []
        for j in range(k):
            lo = max(i, j)
            s = Li[lo][i] * Li[lo][j]
            for p in range(lo + 1, k):
                s = s + Li[p][i] * Li[p][j]
            row.append(s)
        rows.append(jnp.stack(row, axis=-1))
    return jnp.stack(rows, axis=-2), det


# Above this state dimension the unrolled Cholesky's O(Ns^3) op-count stops
# paying for itself against the batched lax.linalg kernels.
_UNROLL_MAX_DIM = 8


def _small_spd_inv_det_df(Mh: jnp.ndarray, Ml: jnp.ndarray):
    """Double-float32 twin of ``_small_spd_inv_det``.

    (Mh + Ml): (..., k, k) SPD in df32. Returns (Minv_h, Minv_l, det_h,
    det_l). Same fully-unrolled Cholesky structure — every operation is an
    elementwise df op on (...)-shaped slices, fusible by XLA — but carried
    in compensated f32 instead of float64. This is what lets the mixed
    rollout drop software-emulated f64 entirely: the Q / B^-1 outputs feed
    the 1e4..1e5-magnitude moment-matching exponents, whose ~1e-9 absolute
    accuracy requirement exceeds plain f32 but sits comfortably inside df32
    (~2^-45 relative here, dominated by the df division/sqrt Newton steps).
    """
    from ..ops.df32 import df_add, df_div, df_mul, df_sqrt, two_sum

    k = Mh.shape[-1]
    eps = jnp.asarray(1e-10, Mh.dtype)
    one = (jnp.ones_like(Mh[..., 0, 0]), jnp.zeros_like(Mh[..., 0, 0]))
    L = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1):
            s = (Mh[..., i, j], Ml[..., i, j])
            for p in range(j):
                prod = df_mul(*L[i][p], *L[j][p])
                s = df_add(s[0], s[1], -prod[0], -prod[1])
            if i == j:
                # pivot guard as in the f32/f64 twin (see _small_spd_inv_det)
                floor = eps * jnp.abs(Mh[..., i, i]) + jnp.asarray(1e-30, Mh.dtype)
                guard = s[0] < floor
                s = (jnp.where(guard, floor, s[0]), jnp.where(guard, 0.0, s[1]))
                L[i][i] = df_sqrt(*s)
            else:
                L[i][j] = df_div(*s, *L[j][j])
    det = df_mul(*L[0][0], *L[0][0])
    for i in range(1, k):
        det = df_mul(*det, *df_mul(*L[i][i], *L[i][i]))
    Li = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1):
            if i == j:
                Li[i][i] = df_div(*one, *L[i][i])
            else:
                s = df_mul(*L[i][j], *Li[j][j])
                for p in range(j + 1, i):
                    s = df_add(*s, *df_mul(*L[i][p], *Li[p][j]))
                neg = (-s[0], -s[1])
                Li[i][j] = df_div(*neg, *L[i][i])
    rows_h, rows_l = [], []
    for i in range(k):
        row_h, row_l = [], []
        for j in range(k):
            lo = max(i, j)
            s = df_mul(*Li[lo][i], *Li[lo][j])
            for p in range(lo + 1, k):
                s = df_add(*s, *df_mul(*Li[p][i], *Li[p][j]))
            row_h.append(s[0])
            row_l.append(s[1])
        rows_h.append(jnp.stack(row_h, axis=-1))
        rows_l.append(jnp.stack(row_l, axis=-1))
    return jnp.stack(rows_h, axis=-2), jnp.stack(rows_l, axis=-2), det[0], det[1]


class DFCache(NamedTuple):
    """Double-float32 split of an f64 master FactorizationCache.

    The mixed-precision rollout path (ops/df32.py): beta/iK magnitudes reach
    +-1e2..1e3 with sign cancellation and the log-domain exponents reach
    1e4..1e5 once MLL training sharpens the GP — f32 rounding then drowns the
    ~1e-2 signals (PERFORMANCE.md precision boundary). Splitting every
    cancellation-sensitive master quantity into exact f32 (hi, lo) pairs and
    carrying compensated arithmetic through the big reductions restores
    f64-grade results at f32-pipeline speed. The tiny Ns x Ns solves (B, A,
    Q) run in df32 too (``_small_spd_inv_det_df``) — the rollout contains NO
    f64 ops at all, so nothing in the planning step is software-emulated on
    TPU.
    """

    x_hi: jnp.ndarray  # (N, D)
    x_lo: jnp.ndarray
    mask: jnp.ndarray  # (N,)
    iK_hi: jnp.ndarray  # (Ns, N, N)
    iK_lo: jnp.ndarray
    beta_hi: jnp.ndarray  # (Ns, N)
    beta_lo: jnp.ndarray
    ils_hi: jnp.ndarray  # (Ns, D) 1/lengthscale
    ils_lo: jnp.ndarray
    ils2_hi: jnp.ndarray  # (Ns, D) 1/lengthscale^2
    ils2_lo: jnp.ndarray
    log_outs_hi: jnp.ndarray  # (Ns,)
    log_outs_lo: jnp.ndarray
    outs: jnp.ndarray  # (Ns,) f32 outputscales
    y_mem: jnp.ndarray  # kept so planner cache bookkeeping stays uniform

    @property
    def x_mem(self):  # duck-type the pieces predict_trajectory reads
        return self.x_hi

    @property
    def outputscales(self):
        return self.outs


def split_cache_df(cache: FactorizationCache) -> DFCache:
    """Split an f64 master cache into the df32 rollout cache."""
    from ..ops.df32 import split_f64

    assert cache.x_mem.dtype == jnp.float64, "df32 path needs the f64 master cache"
    x_hi, x_lo = split_f64(cache.x_mem)
    iK_hi, iK_lo = split_f64(cache.iK)
    beta_hi, beta_lo = split_f64(cache.beta)
    ils64 = 1.0 / cache.lengthscales
    ils_hi, ils_lo = split_f64(ils64)
    ils2_hi, ils2_lo = split_f64(ils64 * ils64)
    lo_hi, lo_lo = split_f64(jnp.log(cache.outputscales))
    return DFCache(
        x_hi=x_hi, x_lo=x_lo, mask=cache.mask,
        iK_hi=iK_hi, iK_lo=iK_lo, beta_hi=beta_hi, beta_lo=beta_lo,
        ils_hi=ils_hi, ils_lo=ils_lo, ils2_hi=ils2_hi, ils2_lo=ils2_lo,
        log_outs_hi=lo_hi, log_outs_lo=lo_lo,
        outs=cache.outputscales.astype(jnp.float32),
        y_mem=cache.y_mem.astype(jnp.float32),
    )


def _df_stage1(cache: DFCache, sv32: jnp.ndarray, ii, jj):
    """Small df32 matrices of one moment-matching step: B^-1, c, Q,
    sqrt_det_R (reference gp_model.py:118-131, 149-155 — there in f64).

    All df32 (``_small_spd_inv_det_df``): the outputs feed the 1e4..1e5
    log-domain exponents whose ~1e-9 absolute accuracy requirement exceeds
    plain f32, and keeping them out of f64 leaves the rollout free of
    software-emulated doubles on TPU. Shared by the XLA path
    (``moment_match_df``) and the fused Pallas path
    (``moment_match_df_fused``); tiny (Ns/P x ns x ns) tensors only.
    """
    from ..ops.df32 import df_add, df_add_f32, df_div, df_mul, df_mul_f32

    f32 = jnp.float32
    ns = sv32.shape[0]

    # B = diag(ils) sv diag(ils) + I, per model (state block only)
    ils_s_h, ils_s_l = cache.ils_hi[:, :ns], cache.ils_lo[:, :ns]
    outer_h, outer_l = df_mul(
        ils_s_h[:, :, None], ils_s_l[:, :, None], ils_s_h[:, None, :], ils_s_l[:, None, :]
    )  # (Ns, ns, ns)
    B_h, B_l = df_mul_f32(outer_h, outer_l, sv32[None])
    eye = jnp.eye(ns, dtype=f32)
    B_h, B_l = df_add_f32(B_h, B_l, eye[None])
    B_inv_h, B_inv_l, det_B_h, det_B_l = _small_spd_inv_det_df(B_h, B_l)
    c32 = cache.outs / jnp.sqrt(det_B_h + det_B_l)  # (Ns,) — f32 precision is
    # enough for c: it scales M/V multiplicatively (target ~1e-5 relative)

    ils2_h, ils2_l = cache.ils2_hi[:, :ns], cache.ils2_lo[:, :ns]
    ss_h, ss_l = df_add(ils2_h[ii], ils2_l[ii], ils2_h[jj], ils2_l[jj])  # (P, ns)
    ones = jnp.ones_like(ss_h)
    d_inv_h, d_inv_l = df_div(ones, jnp.zeros_like(ss_h), ss_h, ss_l)
    # A = sv + diag(d_inv): diag entries fold sv_ii into the df pair exactly
    eye_p = jnp.eye(ns, dtype=f32)[None]  # (1, ns, ns)
    diag_h, diag_l = df_add_f32(
        _diag_embed(d_inv_h), _diag_embed(d_inv_l), sv32[None] * eye_p
    )
    A_h = jnp.where(eye_p > 0, diag_h, sv32[None])
    A_l = jnp.where(eye_p > 0, diag_l, 0.0)
    A_inv_h, A_inv_l, det_A_h, det_A_l = _small_spd_inv_det_df(A_h, A_l)
    # AinvS = A^-1 @ sv (sv exact f32), unrolled df dots
    ns_ = ns
    AS_cols_h, AS_cols_l = [], []
    for m in range(ns_):
        ah, al = df_mul_f32(A_inv_h[:, :, 0], A_inv_l[:, :, 0], sv32[0, m])
        for l_ in range(1, ns_):
            ph, pl = df_mul_f32(A_inv_h[:, :, l_], A_inv_l[:, :, l_], sv32[l_, m])
            ah, al = df_add(ah, al, ph, pl)
        AS_cols_h.append(ah)
        AS_cols_l.append(al)
    AinvS_h = jnp.stack(AS_cols_h, axis=-1)  # (P, ns, ns)
    AinvS_l = jnp.stack(AS_cols_l, axis=-1)
    Qh, Ql = df_mul(d_inv_h[..., :, None], d_inv_l[..., :, None], AinvS_h, AinvS_l)
    Qh, Ql = 0.5 * Qh, 0.5 * Ql  # exact halving
    det_R32 = (det_A_h + det_A_l) * jnp.prod(ss_h + ss_l, axis=-1)
    sqrt_det_R32 = jnp.sqrt(det_R32)  # (P,) — divides S_p AFTER the
    # cancellation, so f32 relative precision suffices there
    return B_inv_h, B_inv_l, c32, Qh, Ql, sqrt_det_R32


def moment_match_df_fused(
    cache: DFCache, input_mu: jnp.ndarray, input_var: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``moment_match_df`` with stages 2-3 in ONE fused Pallas kernel.

    Same math, same df32 precision; the N-scaling work (mean path + the
    (P, N, N) covariance pipeline with its compensated reductions) runs as a
    single pallas_call per step instead of O(100) XLA kernels
    (ops/pallas_df_mm.py — measured launch-overhead-bound at 9.1 ms per
    15-step objective at N=128 on v5e). Stage 1 and the tiny finish stay in
    XLA. Dispatch happens in ``predict_trajectory``; the XLA twin is the
    correctness oracle (tests/test_df32.py::test_fused_matches_xla).
    """
    from ..ops.pallas_df_mm import full_step_pallas, stage23_pallas

    f32 = jnp.float32
    ns, d = cache.ils_hi.shape
    n = cache.x_hi.shape[0]
    sv32 = input_var[:ns, :ns].astype(f32)
    mu32 = input_mu.astype(f32)

    ii, jj = _np.triu_indices(ns)
    diag_pos = _np.where(ii == jj)[0]
    p = len(ii)
    pairs = tuple((int(a), int(b)) for a, b in zip(ii, jj))

    if n <= 512:
        # whole-step kernel: stage 1 + finish in-kernel; only the 3x3 S
        # assembly and M M^T remain here. Forward-only line-search
        # evaluations then cost ONE launch per horizon step at every
        # supported bucket (the backward differentiates the split path).
        M, V, S_p = full_step_pallas(mu32, sv32, cache, pairs)
    else:
        Bh, Bl, c32, Qh, Ql, sqrt_det_R32 = _df_stage1(cache, sv32, ii, jj)
        M_h, M_l, V_h, V_l, Sp_h, Sp_l, corr_h, corr_l = stage23_pallas(
            mu32, Bh, Bl, Qh, Ql, cache, pairs
        )
        M = c32 * (M_h + M_l)
        V = c32[:, None] * (V_h + V_l)

        from ..ops.df32 import df_add

        cfull_h = jnp.zeros((p,), f32).at[jnp.asarray(diag_pos)].set(corr_h)
        cfull_l = jnp.zeros((p,), f32).at[jnp.asarray(diag_pos)].set(corr_l)
        Sp_h, Sp_l = df_add(Sp_h, Sp_l, -cfull_h, -cfull_l)
        S_p = (Sp_h + Sp_l).astype(f32) / sqrt_det_R32

    S = jnp.zeros((ns, ns), dtype=f32).at[ii, jj].set(S_p)
    S = S + S.T - jnp.diag(jnp.diagonal(S))
    S = S + jnp.diag(cache.outs)
    S = S - M[:, None] * M[None, :]
    return M, S, V.T


def moment_match_df(
    cache: DFCache, input_mu: jnp.ndarray, input_var: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Moment matching in double-float32 — same math as ``moment_match``
    (reference gp_model.py:112-180), f32-hardware-speed, f64-grade accuracy.

    Precision schedule (see DFCache docstring / PERFORMANCE.md):
      * (input_mu, input_var) arrive in f32 from the rollout carry and are
        treated as exact — the moment-matched moments are SMOOTH functions of
        them (the wild cancellation lives in the evaluation, not the map).
      * x_mem / 1/ls / log outs / beta / iK come pre-split from the f64
        master, so kernel evaluations stay consistent with the master
        factorization to ~2^-48 — the property whose loss wrecked plain f32.
      * Ns x Ns solves/determinants (B, A, Q) run in df32 as well
        (``_small_spd_inv_det_df``): their outputs feed the 1e4..1e5
        exponents, whose ~1e-9 absolute-accuracy need exceeds plain f32 —
        and running them in df32 instead of f64 keeps the entire rollout
        free of software-emulated f64 on TPU (measured: the f64 stage was a
        large share of the per-step kernel-launch count).
      * The (Ns, N, D) mean path and the (P, N, N) covariance pipeline —
        exponent accumulation, exp, beta/iK products, reductions — run in
        compensated f32 (two_prod/two_sum trees).

    Kernel dispatch note: both Pallas families behind this path gate on
    Ns <= 3 (ops/pallas_df_mm.supported, ops/pallas_df_cov.supported) —
    environments with more than 3 state dimensions run the XLA df cov core
    everywhere (same numerics, more kernel launches; pinned by
    tests/test_df32.py::test_ns4_env_falls_back_to_xla_df_and_matches_oracle).
    """
    from ..ops.df32 import (
        df_add,
        df_add_f32,
        df_div,
        df_exp,
        df_mul,
        df_mul_f32,
        df_sum,
        two_prod,
    )

    f32 = jnp.float32
    ns, d = cache.ils_hi.shape
    n = cache.x_hi.shape[0]

    sv32 = input_var[:ns, :ns].astype(f32)
    mu32 = input_mu.astype(f32)

    ii, jj = _np.triu_indices(ns)
    Bh, Bl, c32, Qh, Ql, sqrt_det_R32 = _df_stage1(cache, sv32, ii, jj)

    # ---- mean + input-output covariance (df over (Ns, N, D)) ------------
    # inp = x_mem - mu, exact given the f32 mu
    inp_h, inp_l = df_add_f32(jnp.broadcast_to(cache.x_hi, (n, d)), cache.x_lo, -mu32[None, :])
    iN_h, iN_l = df_mul(
        inp_h[None], inp_l[None], cache.ils_hi[:, None, :], cache.ils_lo[:, None, :]
    )  # (Ns, N, D)

    # t = iN with the state block transformed by B^-1 (action/time cols pass)
    t_cols_h, t_cols_l = [], []
    for j in range(ns):
        ah, al = df_mul(iN_h[..., 0], iN_l[..., 0], Bh[:, None, 0, j], Bl[:, None, 0, j])
        for k in range(1, ns):
            ph, pl = df_mul(iN_h[..., k], iN_l[..., k], Bh[:, None, k, j], Bl[:, None, k, j])
            ah, al = df_add(ah, al, ph, pl)
        t_cols_h.append(ah)
        t_cols_l.append(al)
    t_h = jnp.concatenate([jnp.stack(t_cols_h, axis=-1), iN_h[..., ns:]], axis=-1)
    t_l = jnp.concatenate([jnp.stack(t_cols_l, axis=-1), iN_l[..., ns:]], axis=-1)

    # exponent -0.5 * sum_d iN . t — the 1e4..1e5-magnitude cancellation
    eh, el = df_mul(iN_h, iN_l, t_h, t_l)
    exp_h, exp_l = df_sum(eh, el, axis=-1)
    exp_h, exp_l = -0.5 * exp_h, -0.5 * exp_l
    q_h, q_l = df_exp(jnp.minimum(exp_h, 60.0), exp_l)
    lb_h, lb_l = df_mul(q_h, q_l, cache.beta_hi, cache.beta_lo)  # (Ns, N)

    M_h, M_l = df_sum(lb_h, lb_l, axis=-1)
    M = c32 * (M_h + M_l)  # (Ns,)

    tiL_h, tiL_l = df_mul(t_h, t_l, cache.ils_hi[:, None, :], cache.ils_lo[:, None, :])
    vh, vl = df_mul(tiL_h, tiL_l, lb_h[..., None], lb_l[..., None])
    V_h, V_l = df_sum(vh, vl, axis=1)  # (Ns, D)
    V = c32[:, None] * (V_h + V_l)

    # ---- predictive covariance (df over (P, N, N)) -----------------------
    diag_pos = _np.where(ii == jj)[0]
    p = len(ii)

    ils2_h, ils2_l = cache.ils2_hi[:, :ns], cache.ils2_lo[:, :ns]  # (Ns, ns)

    # Xi[m,n,e] = inp[n,e] / ls_m[e]^2 (state cols only)
    Xi_h, Xi_l = df_mul(
        inp_h[None, :, :ns], inp_l[None, :, :ns], ils2_h[:, None, :], ils2_l[:, None, :]
    )  # (Ns, N, ns)

    def df_mat_small(xh, xl, mh, ml):
        # (P, N, ns) x (P, ns, ns) -> (P, N, ns), unrolled df dots
        cols_h, cols_l = [], []
        for j in range(ns):
            ah, al = df_mul(xh[..., 0], xl[..., 0], mh[:, None, 0, j], ml[:, None, 0, j])
            for k in range(1, ns):
                ph, pl = df_mul(xh[..., k], xl[..., k], mh[:, None, k, j], ml[:, None, k, j])
                ah, al = df_add(ah, al, ph, pl)
            cols_h.append(ah)
            cols_l.append(al)
        return jnp.stack(cols_h, axis=-1), jnp.stack(cols_l, axis=-1)

    Xi_ph, Xi_pl = Xi_h[ii], Xi_l[ii]  # (P, N, ns)
    Xj_ph, Xj_pl = Xi_h[jj], Xi_l[jj]
    XQ_h, XQ_l = df_mat_small(Xi_ph, Xi_pl, Qh, Ql)  # (P, N, ns)

    def df_rowdot(ah, al, bh, bl):
        ph, pl = df_mul(ah, al, bh, bl)
        return df_sum(ph, pl, axis=-1)

    Xs_h, Xs_l = df_rowdot(XQ_h, XQ_l, Xi_ph, Xi_pl)  # (P, N)
    XjQ_h, XjQ_l = df_mat_small(Xj_ph, Xj_pl, Qh, Ql)
    X2s_h, X2s_l = df_rowdot(XjQ_h, XjQ_l, Xj_ph, Xj_pl)

    # k_m(n) = log outs_m - 0.5 sum iN^2
    sh, sl = df_mul(iN_h, iN_l, iN_h, iN_l)
    k_h, k_l = df_sum(sh, sl, axis=-1)  # (Ns, N)
    k_h, k_l = df_add(
        jnp.broadcast_to(cache.log_outs_hi[:, None], k_h.shape),
        jnp.broadcast_to(cache.log_outs_lo[:, None], k_h.shape),
        -0.5 * k_h,
        -0.5 * k_l,
    )

    a_h, a_l = df_add(k_h[ii], k_l[ii], Xs_h, Xs_l)  # (P, N)
    c_h, c_l = df_add(k_h[jj], k_l[jj], X2s_h, X2s_l)  # (P, N)
    U_h, U_l = 2.0 * XQ_h, 2.0 * XQ_l  # exact doubling

    # ---- the (P, N, N) pipeline ------------------------------------------
    # expo[p,n,k] = a[p,n] + c[p,k] + sum_e U[p,n,e] Xj[p,k,e];
    # S_p = sum b_i E b_j, corr_m = sum iK_m E[diag_m]. Dispatched
    # (ops.df_cov_core): row-tiled Pallas kernels on TPU at N >= 192
    # (ops/pallas_df_cov.py — VMEM-tiled E, bounded Mosaic compile), the
    # XLA form otherwise (ops.df_cov_core_xla, the correctness oracle).
    from ..ops import df_cov_core

    Sp_h, Sp_l, corr_h, corr_l = df_cov_core(
        a_h, a_l, c_h, c_l, U_h, U_l, Xj_ph, Xj_pl,
        cache.beta_hi[ii], cache.beta_lo[ii], cache.beta_hi[jj], cache.beta_lo[jj],
        cache.iK_hi, cache.iK_lo, diag_pos,
    )

    # S_p(diag) and corr are each ~1e3..1e4 at cond(K) ~ 1e6 and cancel to
    # ~1e-2: subtract IN df, collapse to f32 only after the cancellation
    # (collapsing first loses ulp(1e4) ~ 1e-3 — measured).
    cfull_h = jnp.zeros((p,), f32).at[jnp.asarray(diag_pos)].set(corr_h)
    cfull_l = jnp.zeros((p,), f32).at[jnp.asarray(diag_pos)].set(corr_l)
    Sp_h, Sp_l = df_add(Sp_h, Sp_l, -cfull_h, -cfull_l)
    S_p = (Sp_h + Sp_l).astype(f32) / sqrt_det_R32

    S = jnp.zeros((ns, ns), dtype=f32).at[ii, jj].set(S_p)
    S = S + S.T - jnp.diag(jnp.diagonal(S))
    S = S + jnp.diag(cache.outs)
    S = S - M[:, None] * M[None, :]

    return M, S, V.T


def moment_match(
    cache: FactorizationCache, input_mu: jnp.ndarray, input_var: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact GP posterior moments under a Gaussian input (PILCO).

    Equivalent of reference ``predict_next_state_change`` (gp_model.py:112-180).

    Args:
      input_mu: (D,) mean of the Gaussian input (state+action(+time)).
      input_var: (D, D) input covariance. Only the top-left Ns x Ns state
        block may be nonzero — actions (and time) are deterministic, exactly
        as in the reference (gp_model.py:96-97). This block structure is
        exploited: all D x D solves/determinants collapse to Ns x Ns ones,
        computed with fully-unrolled fusible Cholesky (no linalg kernels in
        the rollout hot loop).

    Returns:
      M: (Ns,) predicted mean state change.
      S: (Ns, Ns) predictive covariance of the change.
      V: (D, Ns) inv(input_var) times input-output covariance.
    """
    x_mem, beta, iK = cache.x_mem, cache.beta, cache.iK
    ls = cache.lengthscales  # (Ns, D)
    outs = cache.outputscales  # (Ns,)
    ns, d = ls.shape
    dtype = x_mem.dtype
    sv = input_var[:ns, :ns]  # the only nonzero block

    inp = x_mem - input_mu[None, :]  # (N, D), same for every model
    inv_ls = 1.0 / ls  # (Ns, D)

    # --- mean and input-output covariance -------------------------------
    # B = iL S iL + I is block diagonal [B_ss, I]: only its state block needs
    # factorizing. det(B) = det(B_ss); solve(B, v) touches only v[:ns].
    iN = inp[None, :, :] * inv_ls[:, None, :]  # (Ns, N, D) == inp @ iL
    B_ss = inv_ls[:, :ns, None] * sv[None, :, :] * inv_ls[:, None, :ns] + jnp.eye(ns, dtype=dtype)
    if ns <= _UNROLL_MAX_DIM:
        B_inv, det_B = _small_spd_inv_det(B_ss)  # (Ns, ns, ns), (Ns,)
    else:
        Lb = jnp.linalg.cholesky(B_ss)
        eye_b = jnp.broadcast_to(jnp.eye(ns, dtype=dtype), B_ss.shape)
        B_inv = _cho_solve(Lb, eye_b)
        det_B = jnp.prod(jnp.einsum("mii->mi", Lb), axis=-1) ** 2
    # t = solve(B, iN^T)^T : action/time columns pass through untouched.
    t_s = jnp.einsum("mnk,mkj->mnj", iN[..., :ns], B_inv)  # (Ns, N, ns)
    t = jnp.concatenate([t_s, iN[..., ns:]], axis=-1)  # (Ns, N, D)
    lb = jnp.exp(-0.5 * jnp.sum(iN * t, axis=-1)) * beta  # (Ns, N)
    tiL = t * inv_ls[:, None, :]  # (Ns, N, D)
    c = outs / jnp.sqrt(det_B)

    M = jnp.sum(lb, axis=-1) * c  # (Ns,)
    V = jnp.einsum("mnd,mn->md", tiL, lb) * c[:, None]  # (Ns, D)

    # --- predictive covariance ------------------------------------------
    # S is symmetric: L_ij(n,k) = exp(k_i[n] + k_j[k] + maha) with maha =
    # 2 Xi[n]^T Q Xj[k] + Xi[n]^T Q Xi[n] + Xj[k]^T Q Xj[k] invariant under
    # (i,n)<->(j,k) and Q_ij = Q_ji — so only the Ns(Ns+1)/2 upper-triangle
    # pairs are computed. The (pairs, N, N) exp/contract chain is the
    # HBM-traffic hot spot of the whole rollout; this cuts it by ~1/3.
    inv_ls2 = inv_ls * inv_ls  # (Ns, D)
    ii, jj = _np.triu_indices(ns)  # static pair index lists, length P
    diag_pos = _np.where(ii == jj)[0]  # pair index of (m, m), length Ns

    # R[i,j] = S * diag(1/ls_i^2 + 1/ls_j^2) + I is NOT symmetric, but with
    # Dd = diag(scale_sum) it factors as R = (S + Dd^-1) Dd where A = S + Dd^-1
    # is SPD, so solve(R, S) = Dd^-1 A^-1 S and det(R) = det(A) prod(Dd).
    # A inherits the block structure: A = [S_ss + D_ss^-1, 0; 0, D_aa^-1], so
    # A^-1 S has only the state block nonzero and
    # det(R) = det(A_ss) prod(scale_sum_ss).
    scale_sum = inv_ls2[ii, :ns] + inv_ls2[jj, :ns]  # (P, ns) — state block only
    d_inv_s = 1.0 / scale_sum  # (P, ns)
    A_ss = sv[None, :, :] + _diag_embed(d_inv_s)  # (P, ns, ns)
    if ns <= _UNROLL_MAX_DIM:
        A_inv, det_A = _small_spd_inv_det(A_ss)  # (P, ns, ns), (P,)
    else:
        La = jnp.linalg.cholesky(A_ss)
        eye_a = jnp.broadcast_to(jnp.eye(ns, dtype=dtype), A_ss.shape)
        A_inv = _cho_solve(La, eye_a)
        det_A = jnp.prod(jnp.einsum("pkk->pk", La), axis=-1) ** 2
    AinvS = jnp.einsum("pkl,lm->pkm", A_inv, sv)  # (P, ns, ns)
    Q = d_inv_s[..., :, None] * AinvS * 0.5  # (P, ns, ns)
    sqrt_det_R = jnp.sqrt(det_A * jnp.prod(scale_sum, axis=-1))  # (P,)

    # X[i,j,n,:] = inp[n]/ls_i^2 ; X2[i,j,n,:] = -inp[n]/ls_j^2. Q only has
    # the state block, so every Q contraction runs over ns, not D.
    Xi = inp[None, :, :ns] * inv_ls2[:, None, :ns]  # (Ns, N, ns)
    Xi_p = Xi[ii]  # (P, N, ns) — row model of each pair
    Xj_p = Xi[jj]  # (P, N, ns) — column model of each pair
    XQ = jnp.einsum("pnd,pde->pne", Xi_p, Q)  # (P, N, ns)
    XjQ = jnp.einsum("pnd,pde->pne", Xj_p, Q)  # (P, N, ns)
    Xs = jnp.sum(XQ * Xi_p, axis=-1)  # (P, N)
    X2s = jnp.sum(XjQ * Xj_p, axis=-1)  # (P, N) — (-Xj)Q(-Xj) = Xj Q Xj

    # The (P, N, N) pairwise kernel matrix E[p,n,k] =
    # exp(a[p,n] + c[p,k] + U[p,n]·Xj[p,k]) and its two contractions
    # S_p = b_i E b_j and corr_m = sum(iK ⊙ E_diag) dominate the rollout's
    # HBM traffic; ops.cov_core dispatches to a fused VMEM-resident Pallas
    # kernel on TPU f32 at large N and to this math in XLA otherwise.
    k = jnp.log(outs)[:, None] - 0.5 * jnp.sum(iN * iN, axis=-1)  # (Ns, N)
    a_row = k[ii] + Xs  # (P, N)
    c_col = k[jj] + X2s  # (P, N)
    U = 2.0 * XQ  # (P, N, ns)

    from ..ops import cov_core

    S_p, corr = cov_core(a_row, c_col, U, Xj_p, beta[ii], beta[jj], iK, tuple(diag_pos.tolist()))
    S_p = S_p.at[diag_pos].add(-corr)
    S_p = S_p / sqrt_det_R

    S = jnp.zeros((ns, ns), dtype=dtype).at[ii, jj].set(S_p)
    S = S + S.T - jnp.diag(jnp.diagonal(S))  # mirror the strict upper triangle
    S = S + jnp.diag(outs)
    S = S - M[:, None] * M[None, :]

    return M, S, V.T


def _cho_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given the lower Cholesky factor L of A; batched."""
    z = lax.linalg.triangular_solve(L, b, left_side=True, lower=True)
    return lax.linalg.triangular_solve(L, z, left_side=True, lower=True, transpose_a=True)


def _diag_embed(v: jnp.ndarray) -> jnp.ndarray:
    """Batched diagonal embedding of (..., D) -> (..., D, D)."""
    d = v.shape[-1]
    return v[..., :, None] * jnp.eye(d, dtype=v.dtype)


def predict_trajectory(
    cache: FactorizationCache,
    actions: jnp.ndarray,
    state_mu: jnp.ndarray,
    state_var: jnp.ndarray,
    current_time_idx,
    include_time_model: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Moment-matched rollout over the MPC horizon as a single lax.scan.

    Equivalent of reference ``predict_trajectory`` (gp_model.py:60-110):
    carries (mu, Sigma) of the *state*, embeds it in the input covariance's
    top-left block (actions deterministic), propagates
    ``Sigma_{t+1} = S + Sigma_t + Sigma_row V + V^T Sigma_row^T``.

    Args:
      actions: (Nh, Na) normalized actions.
      state_mu: (Ns,), state_var: (Ns, Ns).
      current_time_idx: scalar; raw iteration index appended when
        include_time_model (reference gp_model.py:101-102 — NOT normalized).

    Returns:
      states_mu: (Nh+1, Ns) with the initial state first.
      states_var: (Nh+1, Ns, Ns).
    """
    ns = state_mu.shape[0]
    na = actions.shape[1]
    d = cache.x_mem.shape[1]
    dtype = state_mu.dtype

    def step(carry, inputs):
        mu, var = carry
        action, t_off = inputs
        input_var = jnp.zeros((d, d), dtype=dtype).at[:ns, :ns].set(var)
        parts = [mu, action.astype(dtype)]
        if include_time_model:
            parts.append(jnp.asarray(current_time_idx, dtype=dtype)[None] + t_off[None])
        input_mu = jnp.concatenate(parts)
        if isinstance(cache, DFCache):
            from ..ops import use_df_pallas

            ns_, d_ = cache.ils_hi.shape
            fused = use_df_pallas(cache.x_hi.shape[0], ns_, d_)
            mm = moment_match_df_fused if fused else moment_match_df
        else:
            mm = moment_match
        dmu, dvar, v = mm(cache, input_mu, input_var)
        new_mu = mu + dmu
        sv = input_var[:ns]  # (Ns, D)
        new_var = dvar + var + sv @ v + v.T @ sv.T
        return (new_mu, new_var), (new_mu, new_var)

    t_offsets = jnp.arange(actions.shape[0], dtype=dtype)
    # Full unroll: the horizon is short (<= ~30) and the step body is pure
    # fusible arithmetic after the block-structure rewrite, so unrolling
    # removes the TPU loop/dynamic-slice overhead (and the backward pass's
    # residual stacking) that dominates at these tiny shapes. The df32 body
    # is ~10x the ops: fully unrolling it OOM-kills the XLA TPU compiler
    # (measured SIGKILL on v5e remote compile), while the rolled scan pays
    # ~35 ms/plan of trip overhead (537 ms plan at N=128) — unroll=3 keeps
    # the graph a third of the full unroll with most of the fusion win.
    unroll = True if not isinstance(cache, DFCache) else 3
    (_, _), (mus, vars_) = lax.scan(step, (state_mu, state_var), (actions, t_offsets), unroll=unroll)
    states_mu = jnp.concatenate([state_mu[None], mus], axis=0)
    states_var = jnp.concatenate([state_var[None], vars_], axis=0)
    return states_mu, states_var


# ----------------------------------------------------------------------------
# Marginal log likelihood + hyperparameter training
# ----------------------------------------------------------------------------


def negative_mll(params: GPParams, bounds: GPBounds, x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-model negative exact marginal log likelihood, normalized by N.

    Matches GPyTorch's ExactMarginalLogLikelihood convention (loss divided by
    the number of data points) used as the training objective in the
    reference (gp_model.py:226-229):
      loss_m = 0.5 * (y^T K^-1 y + logdet(K + s^2 I) + N log 2pi) / N

    Returns: (Ns,) losses. Padded rows contribute nothing (unit diagonal,
    zero targets).
    """
    lengthscales, outputscales, noise = constrained_params(params, bounds)
    n = x.shape[0]
    dtype = x.dtype
    mask_f = mask.astype(dtype)
    mask2 = mask_f[:, None] * mask_f[None, :]
    n_active = jnp.sum(mask_f)

    K = gram_ard_rbf(lengthscales, outputscales, x) * mask2[None, :, :]
    eye = jnp.eye(n, dtype=dtype)
    diag_fix = jnp.where(mask, noise[:, None], 1.0)
    K = K + jnp.einsum("ij,mj->mij", eye, diag_fix)
    L = jnp.linalg.cholesky(K)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.einsum("mii->mi", L)), axis=-1)  # (Ns,)
    y_m = (y * mask_f[:, None]).T[:, :, None]
    alpha = jax.scipy.linalg.cho_solve((L, True), y_m)[..., 0]
    quad = jnp.sum(alpha * y_m[..., 0], axis=-1)  # (Ns,)
    log2pi = jnp.log(2.0 * jnp.pi).astype(dtype)
    return 0.5 * (quad + logdet + n_active * log2pi) / jnp.maximum(n_active, 1.0)


class TrainConfigDevice(NamedTuple):
    """Static training knobs baked into the jitted training function."""

    lr: float
    iters: int
    clip_grad_value: float
    maxcor: int = 10
    maxls: int = 12


def _single_model_negative_mll(
    raw: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    x: jnp.ndarray,
    y_col: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Negative MLL of ONE output-dim GP from its flat raw vector.

    raw layout: [raw_lengthscales (D,), raw_outputscale, raw_noise];
    lo/hi are the matching constraint bounds in the same layout.
    """
    d = x.shape[1]
    c = constrain(raw, lo, hi)
    ls, outputscale, noise = c[:d], c[d], c[d + 1]
    dtype = x.dtype
    mask_f = mask.astype(dtype)
    mask2 = mask_f[:, None] * mask_f[None, :]
    n_active = jnp.sum(mask_f)

    xs = x / ls[None, :]
    sq = jnp.sum(xs * xs, axis=-1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (xs @ xs.T), 0.0)
    K = outputscale * jnp.exp(-0.5 * d2) * mask2
    diag_fix = jnp.where(mask, noise, 1.0)
    K = K + jnp.diag(diag_fix)
    L = jnp.linalg.cholesky(K)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
    y_m = y_col * mask_f
    alpha = jax.scipy.linalg.cho_solve((L, True), y_m[:, None])[:, 0]
    quad = jnp.dot(alpha, y_m)
    log2pi = jnp.log(2.0 * jnp.pi).astype(dtype)
    return 0.5 * (quad + logdet + n_active * log2pi) / jnp.maximum(n_active, 1.0)


def train_hyperparams(
    params: GPParams,
    bounds: GPBounds,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    key: jnp.ndarray,
    cfg: TrainConfigDevice,
    restarts: int = 1,
    keys: jnp.ndarray | None = None,
) -> Tuple[GPParams, jnp.ndarray]:
    """On-device MLL hyperparameter optimization with keep-best semantics.

    Replaces the reference's spawned training process (gp_model.py:193-306):
    per model, start from a random uniform re-init inside the constraint box,
    run L-BFGS with gradient-value clipping on that model's exact MLL, and
    keep the best (loss, params) ever seen — falling back to the incumbent
    parameters when no improvement is found. Each model trains independently
    (the reference loops over models; here they are vmapped), and
    ``restarts`` independent re-inits per model run in parallel too
    (restarts=1 matches the reference's single random re-init).

    ``keys`` optionally supplies the pre-split (restarts, Ns, key) batch —
    e.g. with a restart-axis sharding constraint attached (parallel/sharding
    .build_sharded_train_fn) — in which case ``key`` is unused.

    Returns (best_params, best_losses (Ns,)).
    """
    from ..controllers.lbfgs import lbfgs_minimize  # local import to avoid cycle

    ns, d = params.raw_lengthscales.shape
    dtype = x.dtype

    lo = jnp.concatenate(
        [bounds.min_lengthscale, bounds.min_outputscale[:, None], bounds.min_noise[:, None]], axis=1
    )  # (Ns, D+2)
    hi = jnp.concatenate(
        [bounds.max_lengthscale, bounds.max_outputscale[:, None], bounds.max_noise[:, None]], axis=1
    )

    raw0 = jnp.concatenate(
        [params.raw_lengthscales, params.raw_outputscale[:, None], params.raw_noise[:, None]], axis=1
    )  # (Ns, D+2)

    def baseline_loss(m):
        return _single_model_negative_mll(raw0[m], lo[m], hi[m], x, y[:, m], mask)

    baseline_losses = jax.vmap(baseline_loss)(jnp.arange(ns))  # (Ns,)

    def one_train(m, k):
        init_c = lo[m] + jax.random.uniform(k, (d + 2,), dtype=dtype) * (hi[m] - lo[m])
        init_raw = unconstrain(init_c, lo[m], hi[m])

        def loss_fn(raw):
            return _single_model_negative_mll(raw, lo[m], hi[m], x, y[:, m], mask)

        best_x, best_f = lbfgs_minimize(
            loss_fn,
            init_raw,
            maxiter=cfg.iters,
            maxcor=cfg.maxcor,
            maxls=cfg.maxls,
            clip_grad_value=cfg.clip_grad_value,
            keep_best=True,
            # the reference's torch-LBFGS lr (config lr_train): base trial
            # step of the strong-wolfe-style line search (gp_model.py:262)
            init_step_scale=cfg.lr,
        )
        return best_x, best_f

    if keys is None:
        keys = jax.random.split(key, ns * restarts).reshape(restarts, ns, -1)
    models = jnp.arange(ns)
    # vmap over models, then over restarts.
    raws, losses = jax.vmap(lambda ks: jax.vmap(one_train)(models, ks))(keys)  # (R, Ns, D+2), (R, Ns)

    ridx = jnp.argmin(losses, axis=0)  # (Ns,)
    cand_raw = raws[ridx, models]  # (Ns, D+2)
    cand_losses = losses[ridx, models]  # (Ns,)

    improved = cand_losses < baseline_losses
    new_raw = jnp.where(improved[:, None], cand_raw, raw0)
    new_params = GPParams(
        raw_lengthscales=new_raw[:, :d],
        raw_outputscale=new_raw[:, d],
        raw_noise=new_raw[:, d + 1],
    )
    return new_params, jnp.minimum(cand_losses, baseline_losses)
