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
* The VJP (default, round 5) emits 16 LINEARIZATION RESIDUALS from a single
  forward launch — the gradients are linear in the output cotangents, so
  the backward pass is tiny outside-kernel df math with NO slab recompute
  and no second launch (see the _fwdres block comment; profiled 49.8 ->
  ~(1 slab + 2x reductions) ms of cov-core time per value_and_grad).
  GPMPC_DF_COV_VJP=stacked restores the round-3 scheme: ONE backward
  launch on role-swapped stacked operands (E^T is E with (a, U, bi) <->
  (c, Xj, bj) swapped and iK transposed ( = iK, symmetric)) — grid
  (2P, T) in a single pallas_call; two launches with an explicit iK
  transpose in the rectangular case.
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
    """Square-shape gate AFTER pad128: multiple of 128 in [256, 2048], Ns <= 3.

    The upper bound is scoped VMEM: the kernel body keeps O(10) (tn, N) df
    slabs live (Mosaic liveness over the unrolled compensated pipeline), so
    N scales only as far as the row tile can shrink — measured 121.9 MB
    stack at (128, 1536) tiles (OOM against the 109 MB ceiling) vs fitting
    at (64, 1536). Beyond 2048 even tn = 32 leaves the whole-(N,) column
    operands themselves too large to double-buffer comfortably; larger N
    falls back to the XLA df path (ops.df_cov_core dispatch).
    """
    return supported_rect(n, n, ns)


def supported_rect(n_rows: int, n_cols: int, ns: int) -> bool:
    """Rectangular-shape gate AFTER pad128 (the shard-mapped multi-chip
    path: local row shard x full column extent). Both extents must be
    128-multiples — the compensated lane reduction runs over the column
    extent in the forward/row-backward AND over the row extent in the
    role-swapped column-side backward — and the larger extent carries the
    same VMEM ceiling as the square case. The 256 lower bound applies to
    the column extent only (below it the whole-step kernel of
    pallas_df_mm.py covers the square shapes; a row shard may be as small
    as one 128-row tile)."""
    return (
        256 <= n_cols <= 2048 and n_cols % 128 == 0
        and 128 <= n_rows <= 2048 and n_rows % 128 == 0
        and ns <= 3
    )


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
        if isinstance(b, int):
            # python grid index (the emulated-call tests, which may run
            # inside shard_map where jnp constants become mesh tracers)
            return sum(1 for q in diag_pos if b > q)
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
def _build_fwd(p: int, n_rows: int, n_cols: int, ns: int,
               diag_pos: Tuple[int, ...], interpret: bool):
    tn = _tile(n_cols)
    t = n_rows // tn
    kernel = functools.partial(_fwd_kernel, ns=ns)
    row_vec, col_vec, row_mat, col_mat, partial, ik_spec = _specs(tn, n_cols, ns, diag_pos, p)
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
# forward-with-residuals: the VJP as 16 linearization residuals, ONE launch
# ---------------------------------------------------------------------------
#
# The core's gradients are LINEAR in the output cotangents (gs, gco):
#
#   grad_a[p,n]    = gs[p] * bi[p,n] * A1[p,n] + gco[p] * A2[p,n]
#   grad_U[p,n,e]  = gs[p] * bi[p,n] * B1[p,n,e] + gco[p] * B2[p,n,e]
#   grad_c[p,k]    = gs[p] * bj[p,k] * C1[p,k] + gco[p] * C2[p,k]
#   grad_Xj[p,k,e] = gs[p] * bj[p,k] * D1[p,k,e] + gco[p] * D2[p,k,e]
#
# with tangent-independent residuals
#   A1 = sum_k bj E        A2 = sum_k iK E        (row side, lane reduce)
#   B1 = sum_k bj E Xj_e   B2 = sum_k iK E Xj_e
#   C1 = sum_n bi E        C2 = sum_n iK E        (col side, row reduce)
#   D1 = sum_n bi E U_e    D2 = sum_n iK E U_e
#
# and the primal outputs fall out for free: S_p = sum_n bi A1 (df, outside),
# corr_m = sum_n A2[diag_m]. So ONE launch per differentiated step computes
# the E slab ONCE plus 16 compensated reductions, and the backward pass is
# tiny outside-kernel df math — no slab recompute, no stacked second launch,
# and the rectangular (shard-mapped) path needs no iK transpose. Profiled
# motivation (v5e, N=384, scripts/probe_glue_share.py): the lean-fwd +
# stacked-bwd scheme spent 49.8 ms of the 54 ms value-and-grad device time
# in this core (17.2 fwd + 32.6 bwd ~ 3 slab computations); the residual
# launch does ~1 slab + 2x the reduction passes. All residuals stay df
# (hi, lo) pairs until after the cotangent combination: A-vs-corr-side
# terms cancel exactly like S_p - corr itself (PERFORMANCE.md precision
# boundary), so collapsing earlier would lose the gradient to f32 ulp.
# GPMPC_DF_COV_VJP=stacked restores the round-3 two-launch scheme for A/B.


def _fwdres_cell(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl,
                 ikh, ikl, ns: int):
    """One (pair, row-tile) cell -> the 16 df residual tensors.

    Shapes: a/bi (tn, 1); c/bj (N, 1); U (tn, ns); Xj (N, ns); iK (tn, N).
    Returns (row_outs, col_outs): row_outs = [A1h, A1l, A2h, A2l,
    B1h_0..B1l_{ns-1}, B2h_0..] each (tn, 1); col_outs = [C1h, C1l, C2h,
    C2l, D...] each (1, N). Pure jnp — shared by the pallas kernel and the
    CPU body-level tests."""
    eh, el = _e_slab_df(ah, al, ch, cl, uh, ul, xjh, xjl, ns)
    # b-weighted slab (E * bj along lanes) and iK-weighted slab
    wbh, wbl = df_mul(eh, el, bjh.reshape(1, -1), bjl.reshape(1, -1))
    qh, ql = df_mul(eh, el, ikh, ikl)
    # row side (lane reductions)
    a1 = _df_reduce_lanes(wbh, wbl)
    a2 = _df_reduce_lanes(qh, ql)
    b1 = [_df_reduce_lanes(*df_mul(wbh, wbl, xjh[:, e:e + 1].reshape(1, -1),
                                   xjl[:, e:e + 1].reshape(1, -1)))
          for e in range(ns)]
    b2 = [_df_reduce_lanes(*df_mul(qh, ql, xjh[:, e:e + 1].reshape(1, -1),
                                   xjl[:, e:e + 1].reshape(1, -1)))
          for e in range(ns)]
    # col side (row reductions; bi broadcasts along lanes)
    vbh, vbl = df_mul(eh, el, bih, bil)
    c1 = _df_reduce_rows(vbh, vbl)
    c2 = _df_reduce_rows(qh, ql)
    d1 = [_df_reduce_rows(*df_mul(vbh, vbl, uh[:, e:e + 1], ul[:, e:e + 1]))
          for e in range(ns)]
    d2 = [_df_reduce_rows(*df_mul(qh, ql, uh[:, e:e + 1], ul[:, e:e + 1]))
          for e in range(ns)]
    row_outs = [a1[0], a1[1], a2[0], a2[1]]
    for pair in b1 + b2:
        row_outs.extend(pair)
    col_outs = [c1[0], c1[1], c2[0], c2[1]]
    for pair in d1 + d2:
        col_outs.extend(pair)
    return row_outs, col_outs


def _fwdres_kernel(ah_ref, al_ref, ch_ref, cl_ref, uh_ref, ul_ref, xjh_ref,
                   xjl_ref, bih_ref, bil_ref, bjh_ref, bjl_ref, ikh_ref,
                   ikl_ref, *out_refs, ns: int):
    row_outs, col_outs = _fwdres_cell(
        ah_ref[0], al_ref[0], ch_ref[0], cl_ref[0], uh_ref[0], ul_ref[0],
        xjh_ref[0], xjl_ref[0], bih_ref[0], bil_ref[0], bjh_ref[0], bjl_ref[0],
        ikh_ref[0], ikl_ref[0], ns)
    n_row = len(row_outs)
    for r, v in zip(out_refs[:n_row], row_outs):
        r[0] = v  # (tn, 1)
    # the 4+4ns (1, N) col-side partials pack into ONE block via sublane
    # concatenation (Mosaic requires the last two block dims to be
    # (8k, 128k) or full-extent; a (1, N) block over a (p, t, N) array
    # violates the sublane rule — measured lowering failure), zero-padded
    # to the next multiple-of-8 sublane count (ns=2 -> 12 rows -> 16)
    pad_rows = (-len(col_outs)) % 8
    col_outs = col_outs + [jnp.zeros_like(col_outs[0])] * pad_rows
    out_refs[n_row][0, 0] = jnp.concatenate(col_outs, axis=0)


@functools.lru_cache(maxsize=None)
def _build_fwdres(p: int, n_rows: int, n_cols: int, ns: int,
                  diag_pos: Tuple[int, ...], interpret: bool):
    tn = _tile(n_cols)
    t = n_rows // tn
    kernel = functools.partial(_fwdres_kernel, ns=ns)
    row_vec, col_vec, row_mat, col_mat, _partial, ik_spec = _specs(tn, n_cols, ns, diag_pos, p)
    row_out = pl.BlockSpec((1, tn, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    n_row_outs = 4 + 4 * ns
    n_col_outs = 4 + 4 * ns
    n_col_pack = n_col_outs + ((-n_col_outs) % 8)  # sublane-padded rows
    col_out = pl.BlockSpec((1, 1, n_col_pack, n_cols), lambda b, i: (b, i, 0, 0),
                           memory_space=pltpu.VMEM)
    kparams = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    }

    def call(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl):
        outs = pl.pallas_call(
            kernel,
            grid=(p, t),
            in_specs=[row_vec, row_vec, col_vec, col_vec, row_mat, row_mat,
                      col_mat, col_mat, row_vec, row_vec, col_vec, col_vec,
                      ik_spec, ik_spec],
            out_specs=[row_out] * n_row_outs + [col_out],
            out_shape=(
                [jax.ShapeDtypeStruct((p, n_rows, 1), jnp.float32)] * n_row_outs
                + [jax.ShapeDtypeStruct((p, t, n_col_pack, n_cols), jnp.float32)]
            ),
            interpret=interpret,
            **kparams,
        )(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl)
        rows = [o[..., :, 0] for o in outs[:n_row_outs]]  # each (P, n_rows)
        # df-tree over the t row-tile partials of the packed col-side block
        packed = outs[n_row_outs]  # (P, t, 16, n_cols)
        cols = []
        for k in range(n_col_outs // 2):
            ch_, cl_ = _df_tree([(packed[:, i, 2 * k], packed[:, i, 2 * k + 1])
                                 for i in range(t)])
            cols.extend([ch_, cl_])  # each (P, n_cols)
        return rows, cols

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
def _build_bwd(p: int, n_rows: int, n_cols: int, ns: int,
               diag_pos: Tuple[int, ...], interpret: bool, sides: int = 2):
    """Row-natural backward launch over ``sides * p`` stacked pair rows.

    sides=2 is the square fast path: row side ++ role-swapped col side in
    ONE launch (iK symmetric, so both sides read the same slab). sides=1 is
    one role of the rectangular path (shard-mapped multi-chip operands,
    local rows x full columns): the col side runs as a second launch with
    the extents swapped and an explicitly transposed iK.
    """
    tn = _tile(n_cols)
    t = n_rows // tn
    kernel = functools.partial(_bwd_kernel, ns=ns)
    row_vec, col_vec, row_mat, col_mat, _partial, ik_spec = _specs(tn, n_cols, ns, diag_pos, p)
    scalar = pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    kparams = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    }

    def call(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl, gs, gco):
        outs = pl.pallas_call(
            kernel,
            grid=(sides * p, t),
            in_specs=[row_vec, row_vec, col_vec, col_vec, row_mat, row_mat,
                      col_mat, col_mat, row_vec, row_vec, col_vec, col_vec,
                      ik_spec, ik_spec, scalar, scalar],
            out_specs=[row_vec] * (1 + ns),
            out_shape=[jax.ShapeDtypeStruct((sides * p, n_rows, 1), jnp.float32)] * (1 + ns),
            interpret=interpret,
            **kparams,
        )(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl, gs, gco)
        ga = outs[0][..., 0]  # (sides*P, n_rows)
        gu = jnp.stack([o[..., 0] for o in outs[1:]], axis=-1)  # (sides*P, n_rows, ns)
        return ga, gu

    return call


# ---------------------------------------------------------------------------
# custom-vjp composite
# ---------------------------------------------------------------------------


def _col(v):
    return v[..., None]


import os as _os

# VJP scheme: "residual" (default — one fwd-with-residuals launch, tiny
# outside-kernel backward) or "stacked" (round-3 A/B fallback: lean fwd +
# role-swapped stacked backward launch that recomputes the E slab).
_VJP_MODE = _os.environ.get("GPMPC_DF_COV_VJP", "residual")


@functools.lru_cache(maxsize=None)
def _make_core(p: int, n_rows: int, n_cols: int, ns: int,
               diag_pos: Tuple[int, ...], interpret: bool):
    square = n_rows == n_cols
    residual = _VJP_MODE != "stacked"
    fwd_call = _build_fwd(p, n_rows, n_cols, ns, diag_pos, interpret)
    if residual:
        fwdres_call = _build_fwdres(p, n_rows, n_cols, ns, diag_pos, interpret)
    elif square:
        bwd_call = _build_bwd(p, n_rows, n_cols, ns, diag_pos, interpret, sides=2)
    else:
        # rectangular (shard-mapped) operands: iK is NOT symmetric, so the
        # col side runs as its own launch on role-swapped operands with an
        # explicitly transposed iK
        bwd_row = _build_bwd(p, n_rows, n_cols, ns, diag_pos, interpret, sides=1)
        bwd_col = _build_bwd(p, n_cols, n_rows, ns, diag_pos, interpret, sides=1)
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

    def fwd_residual(*args):
        from .df32 import df_sum

        ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl = args
        with _no64():
            rows, cols = fwdres_call(
                _col(ah), _col(al), _col(ch), _col(cl), uh, ul, xjh, xjl,
                _col(bih), _col(bil), _col(bjh), _col(bjl), ikh, ikl)
            a1h, a1l, a2h, a2l = rows[:4]
            # primal from the residuals: S_p = sum_n bi * A1 (df);
            # corr_m = sum_n A2[diag_m] (A2's iK slab is slot-indexed, so
            # off-diagonal rows hold an unused model's partial — discarded
            # by the diag gather, exactly like the lean forward kernel)
            sbh, sbl = df_mul(bih, bil, a1h, a1l)
            sp_h, sp_l = df_sum(sbh, sbl, axis=-1)
            co_h, co_l = df_sum(a2h, a2l, axis=-1)
            dg = jnp.asarray(diag)
            out = (sp_h, sp_l, co_h[dg], co_l[dg])
        return out, (tuple(rows), tuple(cols), bih, bil, bjh, bjl)

    def bwd_residual(res, cts):
        from .df32 import df_add

        rows, cols, bih, bil, bjh, bjl = res
        ct_sh, ct_sl, ct_ch, ct_cl = cts
        # hi cotangents only — see the stacked bwd note below
        gs = ct_sh.astype(jnp.float32)[:, None]  # (P, 1)
        gcor = ct_ch.astype(jnp.float32)
        gco = jnp.zeros((p,), jnp.float32).at[jnp.asarray(diag)].set(gcor)[:, None]

        a1h, a1l, a2h, a2l = rows[:4]
        c1h, c1l, c2h, c2l = cols[:4]

        def combine(w1h, w1l, r1h, r1l, r2h, r2l, g1, g2):
            # g1 * w1 * r1 (+) g2 * r2, all df until the final collapse
            th, tl = df_mul(w1h, w1l, r1h, r1l)
            th, tl = df_mul_f32(th, tl, g1)
            sh_, sl_ = df_mul_f32(r2h, r2l, g2)
            oh, ol = df_add(th, tl, sh_, sl_)
            return oh + ol  # f32 collapse after the compensated combine

        ga = combine(bih, bil, a1h, a1l, a2h, a2l, gs, gco)
        gc = combine(bjh, bjl, c1h, c1l, c2h, c2l, gs, gco)
        gu_cols, gxj_cols = [], []
        for e in range(ns):
            b1h, b1l = rows[4 + 2 * e], rows[5 + 2 * e]
            b2h, b2l = rows[4 + 2 * ns + 2 * e], rows[5 + 2 * ns + 2 * e]
            gu_cols.append(combine(bih, bil, b1h, b1l, b2h, b2l, gs, gco))
            d1h, d1l = cols[4 + 2 * e], cols[5 + 2 * e]
            d2h, d2l = cols[4 + 2 * ns + 2 * e], cols[5 + 2 * ns + 2 * e]
            gxj_cols.append(combine(bjh, bjl, d1h, d1l, d2h, d2l, gs, gco))
        gu = jnp.stack(gu_cols, axis=-1)
        gxj = jnp.stack(gxj_cols, axis=-1)

        # beta/iK are factorization-cache constants in the planner
        z_row = jnp.zeros_like(bih)
        z_col = jnp.zeros_like(bjh)
        z_ik = jnp.zeros((len(diag_pos), bih.shape[1], bjh.shape[1]), jnp.float32)
        return (ga, jnp.zeros_like(ga), gc, jnp.zeros_like(gc),
                gu, jnp.zeros_like(gu), gxj, jnp.zeros_like(gxj),
                z_row, z_row, z_col, z_col, z_ik, z_ik)

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

        if square:
            # stacked roles: [rows: (a, U, bi) | cols: (c, Xj, bj)] — E^T is
            # E with the roles swapped and iK transposed ( = iK, symmetric)
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
        else:
            gs1 = gs[:, None, None]
            gco1 = gco[:, None, None]
            with _no64():
                ga, gu = bwd_row(
                    _col(ah), _col(al), _col(ch), _col(cl), uh, ul, xjh, xjl,
                    _col(bih), _col(bil), _col(bjh), _col(bjl),
                    ikh, ikl, gs1, gco1,
                )
                ikh_t = jnp.swapaxes(ikh, 1, 2)
                ikl_t = jnp.swapaxes(ikl, 1, 2)
                gc, gxj = bwd_col(
                    _col(ch), _col(cl), _col(ah), _col(al), xjh, xjl, uh, ul,
                    _col(bjh), _col(bjl), _col(bih), _col(bil),
                    ikh_t, ikl_t, gs1, gco1,
                )
        z_row = jnp.zeros_like(ah)
        z_col = jnp.zeros_like(ch)
        z_ik = jnp.zeros_like(ikh)
        # hi-component cotangents only (df custom-JVP tangents are (dv, 0));
        # beta/iK are factorization-cache constants in the planner
        return (ga, jnp.zeros_like(ga), gc, jnp.zeros_like(gc),
                gu, jnp.zeros_like(gu), gxj, jnp.zeros_like(gxj),
                z_row, z_row, z_col, z_col, z_ik, z_ik)

    if residual:
        core.defvjp(fwd_residual, bwd_residual)
    else:
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

    Shapes: a/bi (P, Nr) df; c/bj (P, Nc) df; U (P, Nr, ns) / Xj (P, Nc, ns)
    df; iK (Ns, Nr, Nc) df. Nr == Nc on the single-chip path; under
    shard_map N-sharding the row extent is the local shard (Nr = N/n_dev)
    while the column operands stay full-length. Returns (Sp_h, Sp_l (P,),
    corr_h, corr_l (Ns,)). Both extents are padded to multiples of 128
    internally (exact — see pad128_slabs)."""
    p, n_rows = ah.shape
    n_cols = ch.shape[1]
    ns = uh.shape[-1]
    r_pad, row_padded = pad128_slabs(n_rows, [
        (ah, (1,)), (al, (1,)), (uh, (1,)), (ul, (1,)),
        (bih, (1,)), (bil, (1,)), (ikh, (1,)), (ikl, (1,)),
    ])
    ah, al, uh, ul, bih, bil, ikh, ikl = row_padded
    c_pad, col_padded = pad128_slabs(n_cols, [
        (ch, (1,)), (cl, (1,)), (xjh, (1,)), (xjl, (1,)),
        (bjh, (1,)), (bjl, (1,)), (ikh, (2,)), (ikl, (2,)),
    ])
    ch, cl, xjh, xjl, bjh, bjl, ikh, ikl = col_padded
    assert supported_rect(r_pad, c_pad, ns), (n_rows, n_cols, r_pad, c_pad, ns)
    core = _make_core(p, r_pad, c_pad, ns, tuple(diag_pos), jax.default_backend() == "cpu")
    return core(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl)
