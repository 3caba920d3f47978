"""Whole-step fused Pallas TPU kernels for df32 moment matching.

The df32 rollout step (models/gp.moment_match_df) is mathematically one
step of PILCO moment matching (reference gp_model.py:112-180) carried in
double-float32. As plain XLA it lowers to O(100) small kernels per step —
measured 9.1 ms per 15-step objective evaluation at N=128 on v5e, pure
kernel-launch overhead (the arithmetic is ~50 MFLOP). This module fuses the
N-scaling stages — the (Ns, N, D) mean path and the (P, N, N) covariance
pipeline — into ONE pallas_call for the forward, with every df intermediate
living in VMEM/registers.

Structure (mirrors moment_match_df, which remains the dispatch fallback and
the correctness oracle):

  * stage 1 (OUTSIDE, plain XLA df32): the Ns x Ns solves B^-1, Q, c,
    sqrt_det_R — tiny tensors whose scalar error-free transforms need f32
    bitcasts that Mosaic only supports on vectors.
  * stage 2+3 forward (ONE kernel): inp/iN/t, the mean exponents and
    q/beta products, Xi/XQ/Xs, the pairwise E matrices, and all compensated
    reductions. Python loops over models/pairs/dims (all <= 6) keep every
    traced op a (N,) or (N, N) vector op — no gathers, no scalar EFT.
  * backward (1 + P kernels): each kernel's body runs ``jax.vjp`` of its
    OWN slice of the math — the mean path, or one covariance pair — so the
    recompute-and-transpose residuals of a single (N, N) pipeline are the
    peak VMEM load. (A single whole-step vjp kernel measured 65 MB of
    scoped VMEM against the 16 MB budget at N=128; jax.checkpoint cannot
    help because Mosaic has no remat2 lowering.) The cotangent surface is
    tiny — mu (D,), B^-1, Q — so each kernel halving-sums its (N,)-row
    cotangents to scalars before writing them out, and the per-kernel mu
    gradients are summed outside.

Mosaic-shaped design rules learned here (each cost a compile failure):
no scalar bitcasts (broadcast first — two_prod does this), no in-kernel
shape casts of small tensors (flat (K,) vectors + python-level row lists),
no traced row-indexing of differentiated arrays (its transpose is an
unsupported pad/concat — rows enter jax.vjp as separate arguments), and
only contiguous-half-slice reductions.

Outputs are RAW df partials (M, V before the c scaling; S_p before the
sqrt_det_R division; corr separate) packed into one (8, 128) f32 block.
``supported(n, ns, d)`` gates dispatch: N <= 512 keeps the df iK slabs
inside VMEM. f32 only. Bucket sizes (memory/buffer.py) are 2^k or 3*2^k
(32/64/128/192/256/384/512): non-power-of-two N is zero-padded to the next
power of two OUTSIDE the kernel (``_pad_cache_pow2`` — exact, every
reduction term carries a zero beta/iK factor on pad rows), so the kernel
always runs at pow2 lane counts. No reference-repo counterpart — the
reference runs global float64 on CPU (total_config.py:11).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .df32 import df_add, df_add_f32, df_exp, df_mul, fast_two_sum, two_sum

_OUT_PAD = (8, 128)


def supported(n: int, ns: int, d: int) -> bool:
    # WHOLE-STEP kernel bound: N <= 128 ONLY. The body performs full-(N, N)
    # vector ops in a single grid cell, and Mosaic fully unrolls each such
    # op over (8, 128) vregs — the kernel's instruction count therefore
    # scales as N^2/1024 per op, and the MOSAIC COMPILE TIME blows up
    # super-linearly: measured 14 s at bucket 128 but > 9 min (unfinished)
    # at bucket 256 and > 25 min (unfinished) at padded 512 on v5e
    # (scripts/probe_kernel_compile.py). Buckets 32..128 are where the
    # online-learning episode spends its early steps; larger buckets
    # (incl. the flagship N=300 -> bucket 384) dispatch to the ROW-TILED
    # kernel family instead (ops/pallas_df_cov.py via moment_match_df),
    # whose per-cell body is bounded by the row-tile size. Non-pow2 N in
    # range (96) zero-pads outside the kernel (see _pad_cache_pow2) —
    # Mosaic's 1-D vector ops mis-lower at 3*2^k lane counts (measured:
    # "vector types must have positive constant sizes", tpu.concatenate
    # 128+64 -> 192 internal error).
    return 32 <= n <= 128 and ns <= 3 and d <= 8


@jax.custom_jvp
def _reduce_last(h, l):
    """Compensated sum along the LAST axis via contiguous halving.

    Contiguous half-slices (no strides, no reshapes) are the one reduction
    pattern Mosaic lowers unconditionally; the pairing is still a binary
    tree, so the error bound matches df32.df_sum. Requires pow2 sizes —
    non-pow2 operands are zero-padded before entering the kernel.

    Custom derivative (same rationale as df32.df_mul): the df pair is ONE
    number whose true derivative w.r.t. every input term is exactly 1, so
    the tangent is a plain f32 sum. This is also what makes the BACKWARD
    kernels compile at N > 128: autodiff through the halving tree would
    transpose each half-slice into a pad -> 1-D tpu.concatenate across the
    128-lane tile boundary, which Mosaic rejects ("Input offsets outside of
    the first tile"); the transpose of jnp.sum is a broadcast, which it
    lowers unconditionally.
    """
    n = h.shape[-1]
    assert (n & (n - 1)) == 0, n
    while n > 1:
        half = n // 2
        h, l = df_add(h[..., :half], l[..., :half], h[..., half:n], l[..., half:n])
        n = half
    return h[..., 0], l[..., 0]


@_reduce_last.defjvp
def _reduce_last_jvp(primals, tangents):
    h, l = primals
    dh, dl = tangents
    out = _reduce_last(h, l)
    dv = jnp.sum(dh + dl, axis=-1)
    return out, (dv, jnp.zeros_like(dv))


@jax.custom_jvp
def _reduce_2d(h, l):
    """(N, N) df -> scalar df: halve rows (sublanes), then lanes.

    Same custom plain-sum derivative as _reduce_last (and for the same
    Mosaic transpose reason)."""
    n = h.shape[0]
    assert (n & (n - 1)) == 0, n
    while n > 1:
        half = n // 2
        h, l = df_add(h[:half], l[:half], h[half:n], l[half:n])
        n = half
    return _reduce_last(h[0], l[0])


@_reduce_2d.defjvp
def _reduce_2d_jvp(primals, tangents):
    h, l = primals
    dh, dl = tangents
    out = _reduce_2d(h, l)
    dv = jnp.sum(dh + dl)
    return out, (dv, jnp.zeros_like(dv))


def _sum_last(v):
    """Plain-f32 contiguous-halving sum of (.., N) gradient rows."""
    m = v.shape[-1]
    assert (m & (m - 1)) == 0, m
    while m > 1:
        half = m // 2
        v = v[..., :half] + v[..., half:m]
        m = half
    return v[..., 0]


def _pad_row(v, width=128):
    # 1-D only: Mosaic cannot shape-cast small multi-dim tensors in-kernel
    v = jnp.asarray(v)
    assert v.ndim == 1, v.shape
    return jnp.pad(v, (0, width - v.size))


# ---------------------------------------------------------------------------
# in-kernel stage-1: the Ns x Ns df solves in list form on (N,) lanes
# ---------------------------------------------------------------------------
# Every "scalar" is carried as an (N,)-broadcast df pair: redundant across
# lanes but fully vectorized, which sidesteps Mosaic's scalar-bitcast
# restriction inside two_prod and keeps the whole step in ONE kernel.


def _spd_inv_det_df_list(M):
    """df32 inverse+det of a small SPD matrix given as nested lists of
    (N,)-shaped df pairs. Same unrolled Cholesky as gp._small_spd_inv_det_df."""
    from .df32 import df_div, df_sqrt

    k = len(M)
    eps = 1e-10
    some = M[0][0][0]
    one = (jnp.ones_like(some), jnp.zeros_like(some))
    L = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1):
            s = M[i][j]
            for q_ in range(j):
                pr = df_mul(*L[i][q_], *L[j][q_])
                s = df_add(s[0], s[1], -pr[0], -pr[1])
            if i == j:
                floor = eps * jnp.abs(M[i][i][0]) + 1e-30
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
                for q_ in range(j + 1, i):
                    s = df_add(*s, *df_mul(*L[i][q_], *Li[q_][j]))
                Li[i][j] = df_div(-s[0], -s[1], *L[i][i])
    Minv = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(k):
            lo = max(i, j)
            s = df_mul(*Li[lo][i], *Li[lo][j])
            for q_ in range(lo + 1, k):
                s = df_add(*s, *df_mul(*Li[q_][i], *Li[q_][j]))
            Minv[i][j] = s
    return Minv, det


def _stage1_rows(sv, ils_s, ils2_s, outs_b, pairs, ns):
    """In-kernel df32 stage 1 (the twin of gp._df_stage1) in list form.

    sv: ns x ns nested list of (N,) f32 (exact, lo = 0). ils_s/ils2_s:
    per-model lists of (N,)-broadcast df pairs (state cols). outs_b: list
    of (N,) f32. Returns (binv_rows_h/l flat (m,k,j), c list of (N,) f32,
    q_rows_h/l flat (p,k,j), sdr list of (N,) f32).
    """
    from .df32 import df_div

    zero = jnp.zeros_like(sv[0][0])

    def exact(v):
        return (v, zero)

    binv_h, binv_l, c_list = [], [], []
    for m in range(ns):
        B = [[None] * ns for _ in range(ns)]
        for i in range(ns):
            for j in range(ns):
                pr = df_mul(*ils_s[m][i], *ils_s[m][j])
                pr = df_mul(pr[0], pr[1], sv[i][j], zero)
                if i == j:
                    pr = df_add_f32(pr[0], pr[1], jnp.ones_like(zero))
                B[i][j] = pr
        Binv, detB = _spd_inv_det_df_list(B)
        for i in range(ns):
            for j in range(ns):
                binv_h.append(Binv[i][j][0])
                binv_l.append(Binv[i][j][1])
        c_list.append(outs_b[m] / jnp.sqrt(detB[0] + detB[1]))

    q_h, q_l, sdr_list = [], [], []
    for (i_p, j_p) in pairs:
        ss = [df_add(*ils2_s[i_p][e], *ils2_s[j_p][e]) for e in range(ns)]
        one = (jnp.ones_like(zero), zero)
        dinv = [df_div(*one, *ss[e]) for e in range(ns)]
        A = [[None] * ns for _ in range(ns)]
        for i in range(ns):
            for j in range(ns):
                A[i][j] = df_add_f32(*(dinv[i] if i == j else (zero, zero)), sv[i][j])
        Ainv, detA = _spd_inv_det_df_list(A)
        # Q = 0.5 * diag(dinv) @ (Ainv @ sv)
        for k in range(ns):
            for j in range(ns):
                acc = df_mul(Ainv[k][0][0], Ainv[k][0][1], sv[0][j], zero)
                for l_ in range(1, ns):
                    acc = df_add(*acc, *df_mul(Ainv[k][l_][0], Ainv[k][l_][1], sv[l_][j], zero))
                acc = df_mul(*acc, *dinv[k])
                q_h.append(0.5 * acc[0])
                q_l.append(0.5 * acc[1])
        prod_ss = ss[0][0] + ss[0][1]
        for e in range(1, ns):
            prod_ss = prod_ss * (ss[e][0] + ss[e][1])
        sdr_list.append(jnp.sqrt((detA[0] + detA[1]) * prod_ss))
    return binv_h, binv_l, c_list, q_h, q_l, sdr_list


# ---------------------------------------------------------------------------
# stage-2/3 math as Mosaic-lowerable jnp — split into mean and per-pair parts
# ---------------------------------------------------------------------------


def _inp_rows(mu, x_h, x_l, d):
    """inp[e] = x[:, e] - mu[e] (exact: add-only; mu rows are (N,))."""
    return [df_add_f32(x_h[:, e], x_l[:, e], -mu[e]) for e in range(d)]


def _mean_part(mu, binv_h, binv_l, x_h, x_l, ils_h, ils_l, beta_h, beta_l,
               *, ns: int, d: int):
    """Mean path: M partials (list of scalars) + V partials (flat list)."""
    inp = _inp_rows(mu, x_h, x_l, d)
    M_parts_h, M_parts_l = [], []
    V_rows_h, V_rows_l = [], []
    for m in range(ns):
        iN = [df_mul(*inp[e], ils_h[m, e], ils_l[m, e]) for e in range(d)]
        t = []
        for j in range(ns):
            acc = df_mul(*iN[0], *(binv_h[(m * ns) * ns + j], binv_l[(m * ns) * ns + j]))
            for k in range(1, ns):
                idx = (m * ns + k) * ns + j
                acc = df_add(*acc, *df_mul(*iN[k], *(binv_h[idx], binv_l[idx])))
            t.append(acc)
        t.extend(iN[ns:])
        eh, el = df_mul(*iN[0], *t[0])
        for e in range(1, d):
            eh, el = df_add(eh, el, *df_mul(*iN[e], *t[e]))
        q_vec = df_exp(jnp.minimum(-0.5 * eh, 60.0), -0.5 * el)
        lb = df_mul(*q_vec, beta_h[m], beta_l[m])
        mh, ml = _reduce_last(*lb)
        M_parts_h.append(mh)
        M_parts_l.append(ml)
        for e in range(d):
            tiL = df_mul(*t[e], ils_h[m, e], ils_l[m, e])
            sh_, sl_ = _reduce_last(*df_mul(*tiL, *lb))
            V_rows_h.append(sh_)
            V_rows_l.append(sl_)
    return (jnp.stack(M_parts_h), jnp.stack(M_parts_l),
            jnp.stack(V_rows_h), jnp.stack(V_rows_l))


def _pair_part(mu, q_rows_h, q_rows_l, x_h, x_l, ils_h, ils_l, ils2_h, ils2_l,
               logo_h, logo_l, beta_h, beta_l, ik_h, ik_l,
               *, i_p: int, j_p: int, ns: int, d: int):
    """One covariance pair: (sp_h, sp_l, corr_h, corr_l) scalars.

    Recomputes its own inp/klog/Xi slice from mu — each backward kernel
    then carries exactly one (N, N) pipeline's residuals.
    """
    inp = _inp_rows(mu, x_h, x_l, d)

    def klog_of(m):
        iN = [df_mul(*inp[e], ils_h[m, e], ils_l[m, e]) for e in range(d)]
        kh, kl = df_mul(*iN[0], *iN[0])
        for e in range(1, d):
            kh, kl = df_add(kh, kl, *df_mul(*iN[e], *iN[e]))
        kh, kl = -0.5 * kh, -0.5 * kl
        return df_add(
            kh, kl,
            jnp.broadcast_to(logo_h[m], kh.shape), jnp.broadcast_to(logo_l[m], kh.shape),
        )

    def xi_of(m):
        return [df_mul(*inp[e], ils2_h[m, e], ils2_l[m, e]) for e in range(ns)]

    xi_i = xi_of(i_p)
    xi_j = xi_i if j_p == i_p else xi_of(j_p)
    klog_i = klog_of(i_p)
    klog_j = klog_i if j_p == i_p else klog_of(j_p)

    def qform(rows):
        xq = []
        for j in range(ns):
            acc = df_mul(*rows[0], *(q_rows_h[j], q_rows_l[j]))
            for k in range(1, ns):
                acc = df_add(*acc, *df_mul(*rows[k], *(q_rows_h[k * ns + j], q_rows_l[k * ns + j])))
            xq.append(acc)
        qf = df_mul(*xq[0], *rows[0])
        for j in range(1, ns):
            qf = df_add(*qf, *df_mul(*xq[j], *rows[j]))
        return xq, qf

    xq_i, xs_i = qform(xi_i)
    _, xs_j = qform(xi_j)
    a_vec = df_add(*klog_i, *xs_i)  # (N,)
    c_vec = df_add(*klog_j, *xs_j)  # (N,)
    # E exponent (N, N) = a[:, None] + c[None, :] + 2 sum_e XQ_i[e] Xj[e]
    eh, el = two_sum(a_vec[0][:, None], c_vec[0][None, :])
    el = el + (a_vec[1][:, None] + c_vec[1][None, :])
    eh, el = fast_two_sum(eh, el)
    for e in range(ns):
        u_h, u_l = 2.0 * xq_i[e][0], 2.0 * xq_i[e][1]
        t_h, t_l = df_mul(
            u_h[:, None], u_l[:, None],
            xi_j[e][0][None, :], xi_j[e][1][None, :],
        )
        eh, el = df_add(eh, el, t_h, t_l)
    E_h, E_l = df_exp(jnp.minimum(eh, 60.0), el)
    w_h, w_l = df_mul(E_h, E_l, beta_h[i_p][:, None], beta_l[i_p][:, None])
    w_h, w_l = df_mul(w_h, w_l, beta_h[j_p][None, :], beta_l[j_p][None, :])
    sp_h, sp_l = _reduce_2d(w_h, w_l)
    if i_p == j_p:
        corr_h, corr_l = _reduce_2d(*df_mul(E_h, E_l, ik_h[i_p], ik_l[i_p]))
    else:
        corr_h = jnp.zeros((), jnp.float32)
        corr_l = jnp.zeros((), jnp.float32)
    return sp_h, sp_l, corr_h, corr_l


def _full_step(mu_rows, sv_rows, x_h, x_l, ils_h, ils_l, ils2_h, ils2_l,
               logo_h, logo_l, beta_h, beta_l, ik_h, ik_l, outs,
               *, ns: int, d: int, pairs: Tuple[Tuple[int, int], ...]):
    """The ENTIRE moment-matching step (stage 1 + 2 + 3 + finish) on (N,)
    lanes — one kernel body, differentiable wrt mu_rows + sv_rows only.

    Returns (M (ns,), V (ns*d,) flat, S_p (p,)) — final values (c applied,
    corr subtracted in df, sqrt_det_R divided); only the 3x3 S assembly and
    the M M^T subtraction remain outside.
    """
    from .df32 import df_add as _dfa

    zero = jnp.zeros_like(mu_rows[0])

    def bc_pair(h, l):
        return (jnp.broadcast_to(h, zero.shape), jnp.broadcast_to(l, zero.shape))

    sv = [[sv_rows[i * ns + j] for j in range(ns)] for i in range(ns)]
    ils_s = [[bc_pair(ils_h[m, e], ils_l[m, e]) for e in range(ns)] for m in range(ns)]
    ils2_s = [[bc_pair(ils2_h[m, e], ils2_l[m, e]) for e in range(ns)] for m in range(ns)]
    outs_b = [jnp.broadcast_to(outs[m], zero.shape) for m in range(ns)]

    binv_h, binv_l, c_list, q_h, q_l, sdr_list = _stage1_rows(
        sv, ils_s, ils2_s, outs_b, pairs, ns
    )

    M_h, M_l, V_h, V_l = _mean_part(
        mu_rows, binv_h, binv_l, x_h, x_l, ils_h, ils_l, beta_h, beta_l, ns=ns, d=d
    )
    # finish in-kernel: c and sdr are (N,)-broadcast, the raw reductions are
    # scalars — scalar*vector broadcasting keeps everything a vector op and
    # lane 0 is extracted at the very end
    M_fin = [(c_list[m] * (M_h[m] + M_l[m]))[0] for m in range(ns)]
    V_fin = [(c_list[m] * (V_h[m * d + e] + V_l[m * d + e]))[0]
             for m in range(ns) for e in range(d)]

    Sp_fin = []
    for k, (i_p, j_p) in enumerate(pairs):
        s_h, s_l, co_h, co_l = _pair_part(
            mu_rows, q_h[k * ns * ns : (k + 1) * ns * ns], q_l[k * ns * ns : (k + 1) * ns * ns],
            x_h, x_l, ils_h, ils_l, ils2_h, ils2_l, logo_h, logo_l,
            beta_h, beta_l, ik_h, ik_l, i_p=i_p, j_p=j_p, ns=ns, d=d,
        )
        if i_p == j_p:
            s_h, s_l = _dfa(s_h, s_l, -co_h, -co_l)
        Sp_fin.append(((s_h + s_l) / sdr_list[k])[0])
    return jnp.stack(M_fin), jnp.stack(V_fin), jnp.stack(Sp_fin)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _build(n: int, ns: int, d: int, pairs: Tuple[Tuple[int, int], ...], interpret: bool):
    p = len(pairs)
    nb = ns * ns * ns
    nq = p * ns * ns
    diag_slot = {ip: k for k, (ip, jp) in enumerate(pairs) if ip == jp}

    def _rows(ref):
        return [ref[i] for i in range(ref.shape[0])]

    # ---- forward: everything in one launch -------------------------------
    def fwd_kernel(mu_ref, bh_ref, bl_ref, qh_ref, ql_ref, xh_ref, xl_ref,
                   ilsh_ref, ilsl_ref, ils2h_ref, ils2l_ref, logoh_ref, logol_ref,
                   beth_ref, betl_ref, ikh_ref, ikl_ref, out_ref):
        mu = _rows(mu_ref)
        bh, bl = _rows(bh_ref), _rows(bl_ref)
        qh, ql = _rows(qh_ref), _rows(ql_ref)
        M_h, M_l, V_h, V_l = _mean_part(
            mu, bh, bl, xh_ref[...], xl_ref[...], ilsh_ref[...], ilsl_ref[...],
            beth_ref[...], betl_ref[...], ns=ns, d=d,
        )
        sp_h, sp_l, co_h, co_l = [], [], [None] * ns, [None] * ns
        for k, (i_p, j_p) in enumerate(pairs):
            qrh = qh[k * ns * ns : (k + 1) * ns * ns]
            qrl = ql[k * ns * ns : (k + 1) * ns * ns]
            s_h, s_l, c_h, c_l = _pair_part(
                mu, qrh, qrl, xh_ref[...], xl_ref[...], ilsh_ref[...], ilsl_ref[...],
                ils2h_ref[...], ils2l_ref[...], logoh_ref[0], logol_ref[0],
                beth_ref[...], betl_ref[...], ikh_ref[...], ikl_ref[...],
                i_p=i_p, j_p=j_p, ns=ns, d=d,
            )
            sp_h.append(s_h)
            sp_l.append(s_l)
            if i_p == j_p:
                co_h[i_p] = c_h
                co_l[i_p] = c_l
        out_ref[...] = jnp.stack([
            _pad_row(M_h), _pad_row(M_l), _pad_row(V_h), _pad_row(V_l),
            _pad_row(jnp.stack(sp_h)), _pad_row(jnp.stack(sp_l)),
            _pad_row(jnp.stack(co_h)), _pad_row(jnp.stack(co_l)),
        ])

    # ---- backward: one kernel for the mean path, one per pair ------------
    def bwd_mean_kernel(mu_ref, bh_ref, bl_ref, xh_ref, xl_ref,
                        ilsh_ref, ilsl_ref, beth_ref, betl_ref, ct_ref, gout_ref):
        mu = _rows(mu_ref)
        bh, bl = _rows(bh_ref), _rows(bl_ref)

        def inner(*rows):
            return _mean_part(
                list(rows[:d]), list(rows[d : d + nb]), list(rows[d + nb :]),
                xh_ref[...], xl_ref[...], ilsh_ref[...], ilsl_ref[...],
                beth_ref[...], betl_ref[...], ns=ns, d=d,
            )

        _, pull = jax.vjp(inner, *(mu + bh + bl))
        ct = ct_ref[...]
        grads = pull((ct[0, :ns], ct[1, :ns], ct[2, : ns * d], ct[3, : ns * d]))
        sums = [_sum_last(g) for g in grads]
        gout_ref[...] = jnp.stack([
            _pad_row(jnp.stack(sums[:d])),
            _pad_row(jnp.stack(sums[d : d + nb])),
            _pad_row(jnp.stack(sums[d + nb :])),
            jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32),
            jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32),
        ])

    # single-launch backward for small N: the whole-step vjp's live set is
    # ~65 MB at N=128 (quadratic in N) — inside the raised 100 MB scoped
    # VMEM budget up to N=128, far outside it beyond
    def bwd_all_kernel(mu_ref, bh_ref, bl_ref, qh_ref, ql_ref, xh_ref, xl_ref,
                       ilsh_ref, ilsl_ref, ils2h_ref, ils2l_ref, logoh_ref, logol_ref,
                       beth_ref, betl_ref, ikh_ref, ikl_ref, ct_ref, gout_ref):
        def inner(*rows):
            mu = list(rows[:d])
            bh = list(rows[d : d + nb])
            bl = list(rows[d + nb : d + 2 * nb])
            qh = list(rows[d + 2 * nb : d + 2 * nb + nq])
            ql = list(rows[d + 2 * nb + nq :])
            M_h, M_l, V_h, V_l = _mean_part(
                mu, bh, bl, xh_ref[...], xl_ref[...], ilsh_ref[...], ilsl_ref[...],
                beth_ref[...], betl_ref[...], ns=ns, d=d,
            )
            sp_h, sp_l, co_h, co_l = [], [], [None] * ns, [None] * ns
            for k, (i_p, j_p) in enumerate(pairs):
                s_h, s_l, c_h, c_l = _pair_part(
                    mu, qh[k * ns * ns : (k + 1) * ns * ns], ql[k * ns * ns : (k + 1) * ns * ns],
                    xh_ref[...], xl_ref[...], ilsh_ref[...], ilsl_ref[...],
                    ils2h_ref[...], ils2l_ref[...], logoh_ref[0], logol_ref[0],
                    beth_ref[...], betl_ref[...], ikh_ref[...], ikl_ref[...],
                    i_p=i_p, j_p=j_p, ns=ns, d=d,
                )
                sp_h.append(s_h)
                sp_l.append(s_l)
                if i_p == j_p:
                    co_h[i_p] = c_h
                    co_l[i_p] = c_l
            return (M_h, M_l, V_h, V_l, jnp.stack(sp_h), jnp.stack(sp_l),
                    jnp.stack(co_h), jnp.stack(co_l))

        mu = _rows(mu_ref)
        bh, bl = _rows(bh_ref), _rows(bl_ref)
        qh, ql = _rows(qh_ref), _rows(ql_ref)
        _, pull = jax.vjp(inner, *(mu + bh + bl + qh + ql))
        ct = ct_ref[...]
        grads = pull((ct[0, :ns], ct[1, :ns], ct[2, : ns * d], ct[3, : ns * d],
                      ct[4, :p], ct[5, :p], ct[6, :ns], ct[7, :ns]))
        sums = [_sum_last(g) for g in grads]
        gout_ref[...] = jnp.stack([
            _pad_row(jnp.stack(sums[:d])),
            _pad_row(jnp.stack(sums[d : d + nb])),
            _pad_row(jnp.stack(sums[d + nb : d + 2 * nb])),
            _pad_row(jnp.stack(sums[d + 2 * nb : d + 2 * nb + nq])),
            _pad_row(jnp.stack(sums[d + 2 * nb + nq :])),
            jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32),
        ])

    def make_bwd_pair_kernel(k: int, i_p: int, j_p: int):
        def bwd_pair_kernel(mu_ref, qh_ref, ql_ref, xh_ref, xl_ref,
                            ilsh_ref, ilsl_ref, ils2h_ref, ils2l_ref,
                            logoh_ref, logol_ref, beth_ref, betl_ref,
                            ikh_ref, ikl_ref, ct_ref, gout_ref):
            mu = _rows(mu_ref)
            qh = [qh_ref[i] for i in range(k * ns * ns, (k + 1) * ns * ns)]
            ql = [ql_ref[i] for i in range(k * ns * ns, (k + 1) * ns * ns)]

            def inner(*rows):
                return _pair_part(
                    list(rows[:d]), list(rows[d : d + ns * ns]), list(rows[d + ns * ns :]),
                    xh_ref[...], xl_ref[...], ilsh_ref[...], ilsl_ref[...],
                    ils2h_ref[...], ils2l_ref[...], logoh_ref[0], logol_ref[0],
                    beth_ref[...], betl_ref[...], ikh_ref[...], ikl_ref[...],
                    i_p=i_p, j_p=j_p, ns=ns, d=d,
                )

            _, pull = jax.vjp(inner, *(mu + qh + ql))
            ct = ct_ref[...]
            ct_sp = (ct[4, k], ct[5, k])
            ct_co = (ct[6, i_p], ct[7, i_p]) if i_p == j_p else (
                jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
            grads = pull((ct_sp[0], ct_sp[1], ct_co[0], ct_co[1]))
            sums = [_sum_last(g) for g in grads]
            gout_ref[...] = jnp.stack([
                _pad_row(jnp.stack(sums[:d])),
                _pad_row(jnp.stack(sums[d : d + ns * ns])),
                _pad_row(jnp.stack(sums[d + ns * ns :])),
                jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32),
                jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32),
            ])
        return bwd_pair_kernel

    out_sd = jax.ShapeDtypeStruct(_OUT_PAD, jnp.float32)
    # the vjp transpose chains exceed the 16 MB default scoped-vmem budget
    # (measured 20.3 MB for the mean backward at N=128); v5e has far more
    # physical VMEM, so raise the compiler's soft limit for these kernels
    kparams = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    }
    fwd_call = pl.pallas_call(fwd_kernel, out_shape=out_sd, interpret=interpret, **kparams)
    single_bwd = n <= 128
    if single_bwd:
        bwd_all_call = pl.pallas_call(bwd_all_kernel, out_shape=out_sd, interpret=interpret, **kparams)
    else:
        bwd_mean_call = pl.pallas_call(bwd_mean_kernel, out_shape=out_sd, interpret=interpret, **kparams)
        bwd_pair_calls = [
            pl.pallas_call(make_bwd_pair_kernel(k, i_p, j_p), out_shape=out_sd,
                           interpret=interpret, **kparams)
            for k, (i_p, j_p) in enumerate(pairs)
        ]

    def _b(v):  # broadcast a flat (K,) differentiable input to (K, N) rows
        return jnp.broadcast_to(v[:, None], v.shape + (n,))

    # Mixed sessions run with jax_enable_x64 on (the f64 master cache);
    # vmapping a pallas_call there makes the auto-generated grid index maps
    # trace as i64, which Mosaic refuses ("func.return (i32, i64, i64)").
    # All kernel operands are f32, so binding under disable_x64 is purely a
    # trace-dtype fix.
    def _no64():
        return jax.enable_x64(False)

    @jax.custom_vjp
    def core(mu, bh, bl, qh, ql, xh, xl, ilsh, ilsl, ils2h, ils2l,
             logoh, logol, beth, betl, ikh, ikl):
        with _no64():
            block = fwd_call(_b(mu), _b(bh), _b(bl), _b(qh), _b(ql), xh, xl, ilsh, ilsl,
                             ils2h, ils2l, logoh[None], logol[None], beth, betl, ikh, ikl)
        return (block[0, :ns], block[1, :ns], block[2, : ns * d], block[3, : ns * d],
                block[4, :p], block[5, :p], block[6, :ns], block[7, :ns])

    def core_fwd(*args):
        return core(*args), args

    def core_bwd(args, cts):
        (mu, bh, bl, qh, ql, xh, xl, ilsh, ilsl, ils2h, ils2l,
         logoh, logol, beth, betl, ikh, ikl) = args
        ct_block = jnp.stack([
            _pad_row(cts[0]), _pad_row(cts[1]), _pad_row(cts[2]), _pad_row(cts[3]),
            _pad_row(cts[4]), _pad_row(cts[5]), _pad_row(cts[6]), _pad_row(cts[7]),
        ])
        if single_bwd:
            with _no64():
                g = bwd_all_call(_b(mu), _b(bh), _b(bl), _b(qh), _b(ql), xh, xl,
                                 ilsh, ilsl, ils2h, ils2l, logoh[None], logol[None],
                                 beth, betl, ikh, ikl, ct_block)
            gmu = g[0, :d]
            gbh, gbl = g[1, :nb], g[2, :nb]
            gqh, gql = g[3, :nq], g[4, :nq]
        else:
            with _no64():
                g_mean = bwd_mean_call(_b(mu), _b(bh), _b(bl), xh, xl, ilsh, ilsl,
                                       beth, betl, ct_block)
            gmu = g_mean[0, :d]
            gbh = g_mean[1, :nb]
            gbl = g_mean[2, :nb]
            gq_h_parts, gq_l_parts = [], []
            qh_b, ql_b = _b(qh), _b(ql)
            for k, call in enumerate(bwd_pair_calls):
                with _no64():
                    g = call(_b(mu), qh_b, ql_b, xh, xl, ilsh, ilsl, ils2h, ils2l,
                             logoh[None], logol[None], beth, betl, ikh, ikl, ct_block)
                gmu = gmu + g[0, :d]
                gq_h_parts.append(g[1, : ns * ns])
                gq_l_parts.append(g[2, : ns * ns])
            gqh = jnp.concatenate(gq_h_parts)
            gql = jnp.concatenate(gq_l_parts)
        zero = jnp.zeros_like
        return (gmu, gbh, gbl, gqh, gql, zero(xh), zero(xl), zero(ilsh), zero(ilsl),
                zero(ils2h), zero(ils2l), zero(logoh), zero(logol),
                zero(beth), zero(betl), zero(ikh), zero(ikl))

    core.defvjp(core_fwd, core_bwd)
    return core


@functools.lru_cache(maxsize=None)
def _build_full(n: int, ns: int, d: int, pairs: Tuple[Tuple[int, int], ...], interpret: bool):
    """Whole-step kernels (stage 1 in-kernel): fwd + single vjp kernel.

    Only for n <= 128, where the whole-step vjp fits the raised VMEM budget;
    differentiable surface is (mu, sv) — 4-8 + ns^2 rows."""
    p = len(pairs)
    nsv = ns * ns
    kw = dict(ns=ns, d=d, pairs=pairs)

    def _rows(ref):
        return [ref[i] for i in range(ref.shape[0])]

    def fwd_kernel(mu_ref, sv_ref, xh_ref, xl_ref, ilsh_ref, ilsl_ref,
                   ils2h_ref, ils2l_ref, logoh_ref, logol_ref,
                   beth_ref, betl_ref, ikh_ref, ikl_ref, outs_ref, out_ref):
        M, V, Sp = _full_step(
            _rows(mu_ref), _rows(sv_ref), xh_ref[...], xl_ref[...],
            ilsh_ref[...], ilsl_ref[...], ils2h_ref[...], ils2l_ref[...],
            logoh_ref[0], logol_ref[0], beth_ref[...], betl_ref[...],
            ikh_ref[...], ikl_ref[...], outs_ref[0], **kw,
        )
        z = jnp.zeros(128, jnp.float32)
        out_ref[...] = jnp.stack([_pad_row(M), _pad_row(V), _pad_row(Sp), z, z, z, z, z])

    out_sd = jax.ShapeDtypeStruct(_OUT_PAD, jnp.float32)
    kparams = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    }
    fwd_call = pl.pallas_call(fwd_kernel, out_shape=out_sd, interpret=interpret, **kparams)

    def _b(v):
        return jnp.broadcast_to(v[:, None], v.shape + (n,))

    def _no64():
        return jax.enable_x64(False)

    # Backward: a whole-step in-kernel vjp (stage 1 included) exceeds what
    # Mosaic can compile in reasonable time (>40 min, abandoned). Instead
    # the backward differentiates the mathematically identical SPLIT path —
    # XLA df32 stage 1 + the stage-2/3 kernels of _build, whose vjp kernels
    # compile in minutes — via jax.vjp. The fused forward only serves the
    # (majority) forward-only line-search evaluations; the once-per-
    # iteration gradient pays one extra stage-2/3 forward launch.
    split_core = _build(n, ns, d, pairs, interpret)

    def _reference_path(mu, svf, xh, xl, ilsh, ilsl, ils2h, ils2l,
                        logoh, logol, beth, betl, ikh, ikl, outs):
        import numpy as _np2

        from ..models.gp import _df_stage1

        class _Shim:
            pass

        shim = _Shim()
        shim.ils_hi, shim.ils_lo = ilsh, ilsl
        shim.ils2_hi, shim.ils2_lo = ils2h, ils2l
        shim.outs = outs
        ii = _np2.array([a for a, _ in pairs])
        jj = _np2.array([b for _, b in pairs])
        Bh, Bl, c32, Qh, Ql, sdr = _df_stage1(shim, svf.reshape(ns, ns), ii, jj)
        raw = split_core(mu, Bh.reshape(-1), Bl.reshape(-1), Qh.reshape(-1), Ql.reshape(-1),
                         xh, xl, ilsh, ilsl, ils2h, ils2l, logoh, logol, beth, betl, ikh, ikl)
        M_h, M_l, V_h, V_l, Sp_h, Sp_l, corr_h, corr_l = raw
        M = c32 * (M_h + M_l)
        V = (jnp.repeat(c32, d) * (V_h + V_l))
        diag_pos = _np2.where(ii == jj)[0]
        cfull_h = jnp.zeros((p,), jnp.float32).at[jnp.asarray(diag_pos)].set(corr_h)
        cfull_l = jnp.zeros((p,), jnp.float32).at[jnp.asarray(diag_pos)].set(corr_l)
        sh, sl = df_add(Sp_h, Sp_l, -cfull_h, -cfull_l)
        Sp = (sh + sl) / sdr
        return M, V, Sp

    @jax.custom_vjp
    def core(mu, svf, xh, xl, ilsh, ilsl, ils2h, ils2l,
             logoh, logol, beth, betl, ikh, ikl, outs):
        with _no64():
            block = fwd_call(_b(mu), _b(svf), xh, xl, ilsh, ilsl, ils2h, ils2l,
                             logoh[None], logol[None], beth, betl, ikh, ikl, outs[None])
        return block[0, :ns], block[1, : ns * d], block[2, :p]

    def core_fwd(*args):
        return core(*args), args

    def core_bwd(args, cts):
        _, pull = jax.vjp(_reference_path, *args)
        return pull(cts)

    core.defvjp(core_fwd, core_bwd)
    return core


def _pad_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _pad_cache_pow2(cache):
    """Zero-pad the N-axis slabs of a DFCache to the next power of two.

    EXACT: every reduction term of the kernel carries a beta (mean path,
    S_p) or iK (corr) factor per memory index, and both are zero on pad
    rows; the padded exponents stay finite (x = 0 rows give large-negative
    ARD exponents -> exp underflows to 0). This keeps the kernel itself at
    pow2 lane counts, which is the shape family Mosaic lowers reliably
    (non-pow2 1-D vectors mis-lower — see supported()). Returns
    (n_pad, padded slab tuple).
    """
    n = cache.x_hi.shape[0]
    n_pad = _pad_pow2(n)
    if n_pad == n:
        return n, (cache.x_hi, cache.x_lo, cache.beta_hi, cache.beta_lo,
                   cache.iK_hi, cache.iK_lo)
    e = n_pad - n
    return n_pad, (
        jnp.pad(cache.x_hi, ((0, e), (0, 0))), jnp.pad(cache.x_lo, ((0, e), (0, 0))),
        jnp.pad(cache.beta_hi, ((0, 0), (0, e))), jnp.pad(cache.beta_lo, ((0, 0), (0, e))),
        jnp.pad(cache.iK_hi, ((0, 0), (0, e), (0, e))), jnp.pad(cache.iK_lo, ((0, 0), (0, e), (0, e))),
    )


def full_step_pallas(mu, sv, cache, pairs: Tuple[Tuple[int, int], ...]):
    """Whole-step fused call. Returns (M (Ns,), V (Ns, D), S_p (P,))
    — final values; caller assembles the 3x3 S and subtracts M M^T."""
    ns, d = cache.ils_hi.shape
    n = cache.x_hi.shape[0]
    assert supported(n, ns, d), f"unsupported fused-df shape N={n}"
    n_pad, (xh, xl, bh, bl, ikh, ikl) = _pad_cache_pow2(cache)
    fn = _build_full(n_pad, ns, d, tuple(pairs), jax.default_backend() == "cpu")
    M, V_flat, Sp = fn(
        mu, sv.reshape(-1), xh, xl, cache.ils_hi, cache.ils_lo,
        cache.ils2_hi, cache.ils2_lo, cache.log_outs_hi, cache.log_outs_lo,
        bh, bl, ikh, ikl, cache.outs,
    )
    return M, V_flat.reshape(ns, d), Sp


def stage23_pallas(mu, binv_h, binv_l, q_h, q_l, cache, pairs: Tuple[Tuple[int, int], ...]):
    """Fused stage-2/3 call. Returns raw partials
    (M_h, M_l, V_h (Ns, D), V_l, Sp_h, Sp_l, corr_h, corr_l).

    ``cache`` is a models.gp.DFCache; mu is the (D,) f32 input mean;
    binv/q are the df32 stage-1 outputs computed outside.
    """
    ns, d = cache.ils_hi.shape
    n = cache.x_hi.shape[0]
    assert supported(n, ns, d), f"unsupported fused-df shape N={n}"
    n_pad, (xh, xl, bh, bl, ikh, ikl) = _pad_cache_pow2(cache)
    # interpret mode makes the kernel (and the CPU oracle tests) runnable
    # off-TPU; dispatch (ops.use_df_pallas) never selects it there for perf
    fn = _build(n_pad, ns, d, tuple(pairs), jax.default_backend() == "cpu")
    out = fn(
        mu, binv_h.reshape(-1), binv_l.reshape(-1), q_h.reshape(-1), q_l.reshape(-1),
        xh, xl, cache.ils_hi, cache.ils_lo,
        cache.ils2_hi, cache.ils2_lo, cache.log_outs_hi, cache.log_outs_lo,
        bh, bl, ikh, ikl,
    )
    M_h, M_l, V_h, V_l, Sp_h, Sp_l, corr_h, corr_l = out
    return (M_h, M_l, V_h.reshape(ns, d), V_l.reshape(ns, d),
            Sp_h, Sp_l, corr_h, corr_l)
