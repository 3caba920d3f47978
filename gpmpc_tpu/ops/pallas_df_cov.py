"""Row-tiled Pallas TPU kernels for the df32 moment-matching covariance core.

This is the N-scaling heart of the df32 (trained-GP) rollout step
(models/gp.moment_match_df, the TPU carry of reference gp_model.py:156-176):

  E[p, n, k]  = exp(a[p, n] (+) c[p, k] (+) sum_e U[p, n, e] Xj[p, k, e])
  S_p         = sum_{n,k} bi[p, n] E[p, n, k] bj[p, k]            (P,)
  corr_m      = sum_{n,k} iK[m, n, k] E[diag_m, n, k]             (Ns,)

with every quantity carried as a compensated-f32 (hi, lo) pair: the exponent
is a 1e4..1e5-magnitude cancellation and the S_p/corr reductions cancel from
+-1e3-magnitude terms to ~1e-2 once MLL training sharpens the GP
(PERFORMANCE.md precision boundary) — plain f32 drowns both.

Why a second kernel family next to ops/pallas_df_mm.py: the whole-step
kernel there performs full-(N, N) vector ops inside a single grid cell, and
Mosaic fully unrolls each op over (8, 128) vregs — its instruction count
(and compile time) scales as N^2. Measured on v5e: 14 s to compile at
bucket 128, > 9 min (unfinished) at 256, > 25 min (unfinished) at padded
512. These kernels instead follow the row-tiled design of
ops/pallas_moment_cov.py: grid (pair, row-tile), each cell computing one
(tile_n, N) E slab in VMEM, so the kernel BODY is bounded by the tile size
regardless of N — compile time stays flat from bucket 256 to 2048, and the
flagship N=300 (bucket 384) shape becomes compilable at all.

Layout rules inherited from pallas_moment_cov.py (each learned from a
Mosaic compile failure): no ``pl.program_id`` (these kernels run under two
levels of vmap — line-search candidates x restarts — which prepends grid
dims); every output block written exactly once (scalar contractions emit
one (8, 128) partial per cell, df-summed by XLA outside); column-side
operands are whole-(N,) blocks; no lane-dimension concatenation of
sub-tile pieces (per-column outputs are separate refs, joined by XLA).
df32-specific additions:

* N must be a multiple of 128: the compensated lane reduction halves
  contiguous 128-aligned chunks (Mosaic's one reliably-lowered reduction
  pattern; 1-D ops at 3*2^k lane counts mis-lower — see pallas_df_mm).
  Callers zero-pad to the next multiple (``pad128_slabs``) — EXACT here,
  because every reduction term carries a bi/bj (S_p) or iK (corr) factor
  that is zero on pad rows/cols, and pad exponents are 0 -> E = 1, finite.
* The backward runs ONE launch on role-swapped stacked operands:
  E^T is E with (a, U, bi) <-> (c, Xj, bj) swapped and iK transposed
  ( = iK, symmetric), so the col-side gradients are the row-side kernel
  applied to the swapped half of a (2P, ...) stack — grid (2P, T) in a
  single pallas_call.
* Gradients are emitted only for the action-dependent inputs (a, c, U,
  Xj). beta and iK come from the factorization cache, which is constant
  with respect to the actions being optimized (the planner never
  differentiates it) — their cotangents are structural zeros.
* Gradient cotangents live on the hi component only: the df32 custom JVPs
  (ops/df32.py) carry tangents as (dv, 0), so lo-cotangents never reach
  inputs; emitting (g, 0) is the exact transpose of that convention.

No reference-repo counterpart — the reference runs global float64 on CPU
(total_config.py:11).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .df32 import df_add, df_exp, df_mul, df_mul_f32, fast_two_sum, two_sum

_PAD = (8, 128)  # scalar-partial padding: min f32 tile


def supported(n: int, ns: int) -> bool:
    """Shape gate AFTER pad128: multiple of 128 in [256, 2048], Ns <= 3.

    The upper bound is scoped VMEM: the kernel body keeps O(10) (tn, N) df
    slabs live (Mosaic liveness over the unrolled compensated pipeline), so
    N scales only as far as the row tile can shrink — measured 121.9 MB
    stack at (128, 1536) tiles (OOM against the 109 MB ceiling) vs fitting
    at (64, 1536). Beyond 2048 even tn = 32 leaves the whole-(N,) column
    operands themselves too large to double-buffer comfortably; larger N
    falls back to the XLA df path (ops.df_cov_core dispatch).
    """
    return 256 <= n <= 2048 and n % 128 == 0 and ns <= 3


def _tile(n: int) -> int:
    # (tn, N) df E slabs (hi+lo) and their live temporaries must fit scoped
    # VMEM; Mosaic's liveness over the unrolled df pipeline keeps many
    # slabs alive at once (measured: 34 MB stack at (256, 256) tiles; 122 MB
    # at (128, 1536)), so the row tile shrinks as N grows and the kernels
    # also raise the compiler's scoped-vmem soft limit (same fix as
    # pallas_df_mm). Row counts stay powers of two (_df_reduce_rows).
    return 128 if n <= 768 else 64


# ---------------------------------------------------------------------------
# in-kernel df32 reductions (chunked lanes, halved sublanes)
# ---------------------------------------------------------------------------


def _df_reduce_lanes(h, l):
    """(r, N) df -> (r, 1) df. N = c * 128: pairwise tree over 128-aligned
    contiguous chunks, then contiguous halving inside the last chunk. Same
    binary-tree error bound as df32.df_sum."""
    n = h.shape[-1]
    assert n % 128 == 0, n
    chunks = [(h[..., i * 128:(i + 1) * 128], l[..., i * 128:(i + 1) * 128])
              for i in range(n // 128)]
    while len(chunks) > 1:
        nxt = []
        for i in range(0, len(chunks) - 1, 2):
            nxt.append(df_add(*chunks[i], *chunks[i + 1]))
        if len(chunks) % 2:
            nxt.append(chunks[-1])
        chunks = nxt
    h, l = chunks[0]
    m = 128
    while m > 1:
        half = m // 2
        h, l = df_add(h[..., :half], l[..., :half], h[..., half:m], l[..., half:m])
        m = half
    return h, l  # (r, 1)


def _df_reduce_rows(h, l):
    """(tn, c) df -> (1, c) df by contiguous sublane halving (tn pow2)."""
    m = h.shape[0]
    assert (m & (m - 1)) == 0, m
    while m > 1:
        half = m // 2
        h, l = df_add(h[:half], l[:half], h[half:m], l[half:m])
        m = half
    return h, l


# ---------------------------------------------------------------------------
# shared slab math
# ---------------------------------------------------------------------------


def _e_slab_df(ah, al, ch, cl, uh, ul, xjh, xjl, ns: int):
    """df E slab: a (tn,1), c (N,1), U (tn,ns), Xj (N,ns) -> (tn, N) df.

    The ns-contraction is unrolled VPU df multiply-adds (an MXU dot at K=ns
    would run bf16 passes whose error sits inside the exp — the same
    failure measured for the f32 cov kernels, pallas_moment_cov._e_slab)."""
    eh, el = two_sum(ah, ch.reshape(1, -1))  # (tn, N) via broadcast
    el = el + (al + cl.reshape(1, -1))
    eh, el = fast_two_sum(eh, el)
    for e in range(ns):
        th, tl = df_mul(
            uh[:, e:e + 1], ul[:, e:e + 1],
            xjh[:, e:e + 1].reshape(1, -1), xjl[:, e:e + 1].reshape(1, -1),
        )
        eh, el = df_add(eh, el, th, tl)
    # overflow guard mirroring cov_core_xla: healthy exponents are <= ~0
    return df_exp(jnp.minimum(eh, 60.0), el)


def _full128(v):
    """Broadcast an extracted scalar to a (128,) row (Mosaic-safe emit)."""
    return jnp.full((128,), v, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_cell(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl,
              ns: int):
    """One (pair, row-tile) cell: df E slab -> df (S_p, corr) partials.

    Pure jnp — shared by the pallas kernel and the CPU body-level tests
    (Mosaic interpret mode is far too slow for this body; the on-chip
    lowering is validated by scripts/check_df_cov.py). Shapes: a/bi
    (tn, 1); c/bj (N, 1); U (tn, ns); Xj (N, ns); iK (tn, N)."""
    eh, el = _e_slab_df(ah, al, ch, cl, uh, ul, xjh, xjl, ns)
    wh, wl = df_mul(eh, el, bih, bil)  # bi (tn, 1) broadcast
    wh, wl = df_mul(wh, wl, bjh.reshape(1, -1), bjl.reshape(1, -1))
    sh, sl = _df_reduce_lanes(wh, wl)
    sh, sl = _df_reduce_rows(sh, sl)  # (1, 1)
    qh, ql = df_mul(eh, el, ikh, ikl)
    th, tl = _df_reduce_lanes(qh, ql)
    th, tl = _df_reduce_rows(th, tl)
    return sh, sl, th, tl


def _fwd_kernel(ah_ref, al_ref, ch_ref, cl_ref, uh_ref, ul_ref, xjh_ref, xjl_ref,
                bih_ref, bil_ref, bjh_ref, bjl_ref, ikh_ref, ikl_ref,
                out_ref, *, ns: int):
    """The iK block arrives slot-indexed (valid-but-unused model slab on
    off-diagonal pairs; the corr partial is discarded outside) — same trick
    as pallas_moment_cov._cov_fwd_kernel."""
    sh, sl, th, tl = _fwd_cell(
        ah_ref[0], al_ref[0], ch_ref[0], cl_ref[0], uh_ref[0], ul_ref[0],
        xjh_ref[0], xjl_ref[0], bih_ref[0], bil_ref[0], bjh_ref[0], bjl_ref[0],
        ikh_ref[0], ikl_ref[0], ns)
    z = jnp.zeros((128,), jnp.float32)
    out_ref[0, 0] = jnp.stack([
        _full128(sh[0, 0]), _full128(sl[0, 0]),
        _full128(th[0, 0]), _full128(tl[0, 0]), z, z, z, z,
    ])


def _ik_slot(diag_pos: Tuple[int, ...], p: int):
    """Pair index -> owning iK model slot (number of diagonal pairs strictly
    before it); exact on diagonal pairs, in-bounds elsewhere. For the
    stacked backward grid, indices in [P, 2P) map to their pair b - P (iK
    is symmetric, so the col side reads the same slab). Scalar-prelude
    arithmetic only — no pl.program_id (vmap-safe)."""

    def slot(b):
        b = b % p  # stacked backward: col-side rows [P, 2P) -> pair b - P
        s = jnp.int32(0)
        for q in diag_pos:
            s = s + jnp.asarray(b > q, jnp.int32)
        return s

    return slot


def _specs(tn: int, nc: int, ns: int, diag_pos: Tuple[int, ...], p: int):
    row_vec = pl.BlockSpec((1, tn, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    col_vec = pl.BlockSpec((1, nc, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    row_mat = pl.BlockSpec((1, tn, ns), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    col_mat = pl.BlockSpec((1, nc, ns), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    partial = pl.BlockSpec((1, 1) + _PAD, lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    slot = _ik_slot(diag_pos, p)
    ik_spec = pl.BlockSpec((1, tn, nc), lambda b, i: (slot(b), i, 0), memory_space=pltpu.VMEM)
    return row_vec, col_vec, row_mat, col_mat, partial, ik_spec


def _df_tree(cols):
    """Pairwise df summation over a python list of (h, l) arrays."""
    while len(cols) > 1:
        nxt = []
        for i in range(0, len(cols) - 1, 2):
            nxt.append(df_add(*cols[i], *cols[i + 1]))
        if len(cols) % 2:
            nxt.append(cols[-1])
        cols = nxt
    return cols[0]


@functools.lru_cache(maxsize=None)
def _build_fwd(p: int, n: int, ns: int, diag_pos: Tuple[int, ...], interpret: bool):
    tn = _tile(n)
    t = n // tn
    kernel = functools.partial(_fwd_kernel, ns=ns)
    row_vec, col_vec, row_mat, col_mat, partial, ik_spec = _specs(tn, n, ns, diag_pos, p)
    kparams = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    }

    def call(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl):
        parts = pl.pallas_call(
            kernel,
            grid=(p, t),
            in_specs=[row_vec, row_vec, col_vec, col_vec, row_mat, row_mat,
                      col_mat, col_mat, row_vec, row_vec, col_vec, col_vec,
                      ik_spec, ik_spec],
            out_specs=partial,
            out_shape=jax.ShapeDtypeStruct((p, t) + _PAD, jnp.float32),
            interpret=interpret,
            **kparams,
        )(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl)
        # XLA-side df reduction over the t row-tile partials (t <= 16)
        s_h, s_l = _df_tree([(parts[:, i, 0, 0], parts[:, i, 1, 0]) for i in range(t)])
        c_h, c_l = _df_tree([(parts[:, i, 2, 0], parts[:, i, 3, 0]) for i in range(t)])
        diag = jnp.asarray(np.asarray(diag_pos))
        return s_h, s_l, c_h[diag], c_l[diag]

    return call


# ---------------------------------------------------------------------------
# backward: one launch, roles stacked (row side ++ col side)
# ---------------------------------------------------------------------------


def _bwd_cell(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl,
              ikh, ikl, gs, gco, ns: int):
    """Row-natural gradients of S_p and corr from one recomputed df E slab.

    w = gs * bi bj (+) gco * iK   (df; gco pre-scattered zero off-diagonal)
    gE = w * E                    (df)
    ga[n] = sum_k gE[n, k]                     -> (tn, 1) f32
    gU[n, e] = sum_k gE[n, k] Xj[k, e]         -> list of ns (tn, 1) f32

    All reductions compensated: the sums cancel exactly like S_p itself
    (beta terms are +-1e3 cancelling to ~1e-2 at cond(K) ~ 1e6); the
    collapse to f32 happens only after the reduction. Pure jnp — shared by
    the pallas kernel and the CPU body-level tests."""
    eh, el = _e_slab_df(ah, al, ch, cl, uh, ul, xjh, xjl, ns)
    wh, wl = df_mul(bih, bil, bjh.reshape(1, -1), bjl.reshape(1, -1))
    wh, wl = df_mul_f32(wh, wl, gs)
    th, tl = df_mul_f32(ikh, ikl, gco)
    wh, wl = df_add(wh, wl, th, tl)
    geh, gel = df_mul(wh, wl, eh, el)  # (tn, N) df
    sh, sl = _df_reduce_lanes(geh, gel)
    ga = sh + sl  # (tn, 1) f32 collapse after the compensated sum
    gu_cols = []
    for e in range(ns):
        ph, pl_ = df_mul(geh, gel, xjh[:, e:e + 1].reshape(1, -1),
                         xjl[:, e:e + 1].reshape(1, -1))
        qh, ql = _df_reduce_lanes(ph, pl_)
        gu_cols.append(qh + ql)
    return ga, gu_cols


def _bwd_kernel(ah_ref, al_ref, ch_ref, cl_ref, uh_ref, ul_ref, xjh_ref, xjl_ref,
                bih_ref, bil_ref, bjh_ref, bjl_ref, ikh_ref, ikl_ref,
                gs_ref, gco_ref, ga_ref, *gu_refs, ns: int):
    """The gU columns are separate output refs — a lane-dim concat of
    (tn, 1) pieces is the sub-tile tpu.concatenate pattern Mosaic rejects."""
    ga, gu_cols = _bwd_cell(
        ah_ref[0], al_ref[0], ch_ref[0], cl_ref[0], uh_ref[0], ul_ref[0],
        xjh_ref[0], xjl_ref[0], bih_ref[0], bil_ref[0], bjh_ref[0], bjl_ref[0],
        ikh_ref[0], ikl_ref[0], gs_ref[0, 0, 0], gco_ref[0, 0, 0], ns)
    ga_ref[0] = ga
    for e in range(ns):
        gu_refs[e][0] = gu_cols[e]


@functools.lru_cache(maxsize=None)
def _build_bwd(p: int, n: int, ns: int, diag_pos: Tuple[int, ...], interpret: bool):
    tn = _tile(n)
    t = n // tn
    kernel = functools.partial(_bwd_kernel, ns=ns)
    row_vec, col_vec, row_mat, col_mat, _partial, ik_spec = _specs(tn, n, ns, diag_pos, p)
    scalar = pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    kparams = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    }

    def call(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl, gs, gco):
        outs = pl.pallas_call(
            kernel,
            grid=(2 * p, t),
            in_specs=[row_vec, row_vec, col_vec, col_vec, row_mat, row_mat,
                      col_mat, col_mat, row_vec, row_vec, col_vec, col_vec,
                      ik_spec, ik_spec, scalar, scalar],
            out_specs=[row_vec] * (1 + ns),
            out_shape=[jax.ShapeDtypeStruct((2 * p, n, 1), jnp.float32)] * (1 + ns),
            interpret=interpret,
            **kparams,
        )(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl, gs, gco)
        ga = outs[0][..., 0]  # (2P, N)
        gu = jnp.stack([o[..., 0] for o in outs[1:]], axis=-1)  # (2P, N, ns)
        return ga, gu

    return call


# ---------------------------------------------------------------------------
# custom-vjp composite
# ---------------------------------------------------------------------------


def _col(v):
    return v[..., None]


@functools.lru_cache(maxsize=None)
def _make_core(p: int, n: int, ns: int, diag_pos: Tuple[int, ...], interpret: bool):
    fwd_call = _build_fwd(p, n, ns, diag_pos, interpret)
    bwd_call = _build_bwd(p, n, ns, diag_pos, interpret)
    diag = np.asarray(diag_pos)

    # Mixed sessions run with jax_enable_x64 on (the f64 master cache);
    # binding under disable_x64 keeps the auto-generated grid index maps
    # tracing as i32, which Mosaic requires (same fix as pallas_df_mm).
    def _no64():
        return jax.enable_x64(False)

    @jax.custom_vjp
    def core(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl):
        with _no64():
            return fwd_call(_col(ah), _col(al), _col(ch), _col(cl), uh, ul, xjh, xjl,
                            _col(bih), _col(bil), _col(bjh), _col(bjl), ikh, ikl)

    def fwd(*args):
        return core(*args), args

    def bwd(res, cts):
        ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl = res
        ct_sh, ct_sl, ct_ch, ct_cl = cts
        # hi cotangent ONLY: the df custom JVPs (ops/df32.py) carry tangents
        # as (dv, 0), so their transpose routes all value-gradient through
        # the hi component and DROPS lo cotangents. The XLA twin's autodiff
        # therefore computes dL/dx = ct_h * dv/dx; summing ct_h + ct_l here
        # double-counted losses of the form f(h + l) (measured on-chip:
        # exactly 2x the XLA-twin gradient).
        gs = ct_sh.astype(jnp.float32)  # (P,)
        gcor = ct_ch.astype(jnp.float32)  # (Ns,)
        gco = jnp.zeros((p,), jnp.float32).at[jnp.asarray(diag)].set(gcor)

        # stacked roles: [rows: (a, U, bi) | cols: (c, Xj, bj)] — E^T is E
        # with the roles swapped and iK transposed ( = iK, symmetric)
        def stk(x, y):
            return jnp.concatenate([x, y], axis=0)

        gs2 = stk(gs, gs)[:, None, None]
        gco2 = stk(gco, gco)[:, None, None]
        with _no64():
            ga_blk, gu_blk = bwd_call(
                _col(stk(ah, ch)), _col(stk(al, cl)), _col(stk(ch, ah)), _col(stk(cl, al)),
                stk(uh, xjh), stk(ul, xjl), stk(xjh, uh), stk(xjl, ul),
                _col(stk(bih, bjh)), _col(stk(bil, bjl)), _col(stk(bjh, bih)), _col(stk(bjl, bil)),
                ikh, ikl, gs2, gco2,
            )
        ga, gc = ga_blk[:p], ga_blk[p:]
        gu, gxj = gu_blk[:p], gu_blk[p:]
        z_vec = jnp.zeros_like(ah)
        z_ik = jnp.zeros_like(ikh)
        # hi-component cotangents only (df custom-JVP tangents are (dv, 0));
        # beta/iK are factorization-cache constants in the planner
        return (ga, jnp.zeros_like(ga), gc, jnp.zeros_like(gc),
                gu, jnp.zeros_like(gu), gxj, jnp.zeros_like(gxj),
                z_vec, z_vec, z_vec, z_vec, z_ik, z_ik)

    core.defvjp(fwd, bwd)
    return core


def pad128_slabs(n: int, arrays):
    """Zero-pad the given (array, n_axes) pairs along their N axes to the
    next multiple of 128. Exact for this core: every reduction term carries a
    bi/bj (S_p) or iK (corr) factor that is zero on pad rows/cols."""
    n_pad = ((n + 127) // 128) * 128
    if n_pad == n:
        return n, [a for a, _ in arrays]
    out = []
    for a, axes in arrays:
        pads = [(0, 0)] * a.ndim
        for ax in axes:
            pads[ax] = (0, n_pad - n)
        out.append(jnp.pad(a, pads))
    return n_pad, out


def df_cov_core_pallas(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl,
                       ikh, ikl, diag_pos: Tuple[int, ...]):
    """Tiled df32 (S_p, corr) with custom VJP.

    Shapes: a/c/bi/bj (P, N) df; U/Xj (P, N, ns) df; iK (Ns, N, N) df.
    Returns (Sp_h, Sp_l (P,), corr_h, corr_l (Ns,)). N is padded to a
    multiple of 128 internally (exact — see pad128_slabs)."""
    p, n = ah.shape
    ns = uh.shape[-1]
    n_pad, padded = pad128_slabs(n, [
        (ah, (1,)), (al, (1,)), (ch, (1,)), (cl, (1,)),
        (uh, (1,)), (ul, (1,)), (xjh, (1,)), (xjl, (1,)),
        (bih, (1,)), (bil, (1,)), (bjh, (1,)), (bjl, (1,)),
        (ikh, (1, 2)), (ikl, (1, 2)),
    ])
    assert supported(n_pad, ns), (n, n_pad, ns)
    core = _make_core(p, n_pad, ns, tuple(diag_pos), jax.default_backend() == "cpu")
    return core(*padded)
