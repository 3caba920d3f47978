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
inside VMEM. f32 only; bucket sizes are powers of two (memory/buffer.py
guarantees this). No reference-repo counterpart — the reference runs global
float64 on CPU (total_config.py:11).
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
    # df iK is 2 * Ns * N * N * 4 bytes; N = 512, Ns = 3 -> 6.3 MB, inside
    # the 16 MB VMEM budget together with one pair's (N, N) E slabs.
    return 128 <= n <= 512 and (n & (n - 1)) == 0 and ns <= 3 and d <= 8


def _reduce_last(h, l):
    """Compensated sum along the LAST axis via contiguous halving.

    Contiguous half-slices (no strides, no reshapes) are the one reduction
    pattern Mosaic lowers unconditionally; the pairing is still a binary
    tree, so the error bound matches df32.df_sum.
    """
    n = h.shape[-1]
    while n > 1:
        half = n // 2
        h, l = df_add(h[..., :half], l[..., :half], h[..., half:n], l[..., half:n])
        n = half
    return h[..., 0], l[..., 0]


def _reduce_2d(h, l):
    """(N, N) df -> scalar df: halve rows (sublanes), then lanes."""
    n = h.shape[0]
    while n > 1:
        half = n // 2
        h, l = df_add(h[:half], l[:half], h[half:n], l[half:n])
        n = half
    return _reduce_last(h[0], l[0])


def _sum_last(v):
    """Plain-f32 contiguous-halving sum of (.., N) gradient rows."""
    m = v.shape[-1]
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


def stage23_pallas(mu, binv_h, binv_l, q_h, q_l, cache, pairs: Tuple[Tuple[int, int], ...]):
    """Fused stage-2/3 call. Returns raw partials
    (M_h, M_l, V_h (Ns, D), V_l, Sp_h, Sp_l, corr_h, corr_l).

    ``cache`` is a models.gp.DFCache; mu is the (D,) f32 input mean;
    binv/q are the df32 stage-1 outputs computed outside.
    """
    ns, d = cache.ils_hi.shape
    n = cache.x_hi.shape[0]
    assert (n & (n - 1)) == 0, "fused df kernel needs power-of-two buckets"
    # interpret mode makes the kernel (and the CPU oracle tests) runnable
    # off-TPU; dispatch (ops.use_df_pallas) never selects it there for perf
    fn = _build(n, ns, d, tuple(pairs), jax.default_backend() == "cpu")
    out = fn(
        mu, binv_h.reshape(-1), binv_l.reshape(-1), q_h.reshape(-1), q_l.reshape(-1),
        cache.x_hi, cache.x_lo, cache.ils_hi, cache.ils_lo,
        cache.ils2_hi, cache.ils2_lo, cache.log_outs_hi, cache.log_outs_lo,
        cache.beta_hi, cache.beta_lo, cache.iK_hi, cache.iK_lo,
    )
    M_h, M_l, V_h, V_l, Sp_h, Sp_l, corr_h, corr_l = out
    return (M_h, M_l, V_h.reshape(ns, d), V_l.reshape(ns, d),
            Sp_h, Sp_l, corr_h, corr_l)
