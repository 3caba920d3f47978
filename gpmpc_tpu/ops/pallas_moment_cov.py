"""Fused Pallas TPU kernels for the moment-matching covariance core.

The hottest object in the whole planner is the pairwise kernel matrix

  E[p, n, k] = exp(a[p, n] + c[p, k] + U[p, n, :] . Xj[p, k, :])

(reference gp_model.py:156-176 — there ``torch.exp(k1 + k2 + maha)``), of
which only two tiny contractions are ever consumed:

  S_p    = sum_{n,k} bi[p, n] E[p, n, k] bj[p, k]          (P,)
  corr_m = sum_{m, n,k} iK[m, n, k] E[diag_m, n, k]        (Ns,)

XLA materializes E (and its VJP intermediates) in HBM every rollout step —
at N >= ~700 stored GP points this dominates planning latency
(PERFORMANCE.md scaling table). These kernels compute E one (row-tile, N)
slab at a time in VMEM and emit only the contractions; the backward kernels
recompute E from the (tiny) inputs instead of saving it, so no (N, N)
tensor ever touches HBM except a single streaming read of iK.

Kernel-design constraints honored here (learned the hard way):

* grid is (batch, row-tile) with every output block written exactly once —
  no accumulation across grid steps, no first-visit initialization;
  scalar contractions emit one (8, 128) padded partial per grid cell,
  reduced by XLA outside (a few KB).
* no ``pl.program_id`` anywhere: ``jax.vmap`` of a pallas_call prepends a
  grid dimension, which silently re-numbers program ids. These kernels are
  called under two levels of vmap (line-search candidates x restarts).
* column-side operands are whole-(N,) blocks (a few KB each); the E slab is
  (tile_n, N) f32 <= 2 MB — VMEM-safe at every bucket size up to 2048.
* grad(iK) is emitted by a separate pallas_call so XLA dead-code-eliminates
  it when the cotangent is unused (always, in the planner: the
  factorization cache is constant wrt the actions being optimized).

f32 only; any N that is a multiple of 8 is supported (bucket sizes from
memory/buffer.py all are). ops/__init__.py dispatches XLA elsewhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = (8, 128)  # scalar-partial padding: min f32 tile


def _tile(n: int) -> int:
    # (tn, N) E slabs and their elementwise temporaries must fit the 16 MB
    # scoped-VMEM budget with double buffering; 128-row slabs at the largest
    # buckets, 256 otherwise, measured fastest.
    if n >= 2048:
        return 128
    return 256 if n % 256 == 0 else n


def supported(n: int) -> bool:
    return n % 8 == 0


def _specs(tn: int, nc: int, ns: int):
    """Row-tiled and full-column block specs at grid (b, i).

    Row and column extents are independent (nc = column count): under the
    N-sharded multi-chip path each device's kernel sees its LOCAL row shard
    against the full column axis (parallel/sharding.py shard-mapped cov
    core), so the slabs are rectangular there."""
    row_vec = pl.BlockSpec((1, tn, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    col_vec = pl.BlockSpec((1, nc, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    row_mat = pl.BlockSpec((1, tn, ns), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    col_mat = pl.BlockSpec((1, nc, ns), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    partial = pl.BlockSpec((1, 1) + _PAD, lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    return row_vec, col_vec, row_mat, col_mat, scalar, partial


def _e_slab(a_ref, c_ref, u_ref, xj_ref):
    """E slab exp(a + c^T + U Xj^T): a (tn,1), c (N,1), U (tn,ns), Xj (N,ns).

    The ns-contraction is unrolled into f32 VPU multiply-adds on purpose: an
    MXU dot_general at K=ns runs in bf16 passes, and its ~1e-3 error sits
    INSIDE the exp, multiplying S by exp(err) (measured: 100x worse vs f64
    than XLA's elementwise lowering of the same tiny contraction).
    """
    u = u_ref[0]  # (tn, ns)
    xj = xj_ref[0]  # (N, ns)
    ns = u.shape[1]
    bilinear = a_ref[0] + c_ref[0].reshape(1, -1)  # (tn, N) via broadcast
    for e in range(ns):
        bilinear = bilinear + u[:, e:e + 1] * xj[:, e:e + 1].reshape(1, -1)
    # exponent cap mirroring cov_core_xla: overflow guard for f32 (healthy
    # exponents are <= ~0, so this never fires on good inputs)
    return jnp.exp(jnp.minimum(bilinear, 60.0))


def _emit_partial(out_ref, value):
    out_ref[0, 0] = jnp.full(_PAD, value, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _cov_fwd_kernel(a_ref, c_ref, u_ref, xj_ref, bi_ref, bj_ref, ik_ref, sp_ref, co_ref):
    """ONE pass per (pair, row-tile): the E slab is computed once and feeds
    BOTH contractions (S_p and corr). The iK block arrives slot-indexed
    (see _ik_slot): for non-diagonal pairs it is a valid-but-unused model
    slab and the corr partial is discarded outside — the extra
    multiply-reduce is far cheaper than the separate corr pass's E slab
    recompute + second kernel launch it replaces (VERDICT r2 item 3)."""
    e = _e_slab(a_ref, c_ref, u_ref, xj_ref)
    _emit_partial(sp_ref, jnp.sum(e * bi_ref[0] * bj_ref[0].reshape(1, -1)))
    _emit_partial(co_ref, jnp.sum(e * ik_ref[0]))


def _ik_slot(diag_pos: Tuple[int, ...]):
    """Grid-index map pair index -> iK model slot.

    For the b-th pair (triu order), the owning model slot is the number of
    diagonal pairs strictly before b — exact on diagonal pairs, in-bounds
    (and unused) on off-diagonal ones. Pure scalar arithmetic on the grid
    index, so it lowers in the TPU scalar prelude (no pl.program_id — these
    kernels run under two levels of vmap)."""

    def slot(b):
        s = jnp.int32(0)
        for p in diag_pos:
            s = s + (b > p).astype(jnp.int32)
        return s

    return slot


@functools.partial(jax.jit, static_argnames=("tn", "diag_pos"))
def _cov_fwd_call(a, c, u, xj, bi, bj, ik, tn: int, diag_pos: Tuple[int, ...]):
    b, nr, ns = u.shape
    nc = xj.shape[1]
    row_vec, col_vec, row_mat, col_mat, _, partial = _specs(tn, nc, ns)
    slot = _ik_slot(diag_pos)
    ik_spec = pl.BlockSpec((1, tn, nc), lambda bb, i: (slot(bb), i, 0), memory_space=pltpu.VMEM)
    sp_parts, co_parts = pl.pallas_call(
        _cov_fwd_kernel,
        grid=(b, nr // tn),
        in_specs=[row_vec, col_vec, row_mat, col_mat, row_vec, col_vec, ik_spec],
        out_specs=[partial, partial],
        out_shape=[
            jax.ShapeDtypeStruct((b, nr // tn) + _PAD, jnp.float32),
            jax.ShapeDtypeStruct((b, nr // tn) + _PAD, jnp.float32),
        ],
    )(a, c, u, xj, bi, bj, ik)
    s_p = jnp.sum(sp_parts[:, :, 0, 0], axis=1)
    corr = jnp.sum(co_parts[np.asarray(diag_pos), :, 0, 0], axis=1)
    return s_p, corr


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
# Row-side pass (grid b, i): for W = g * wr * wc^T * E, each row tile emits
# rowsum(W) -> ga, W @ Xj -> gU, g * (E @ wc) -> g_wr — all written exactly
# once. Col-side grads re-run the same kernels with tile roles swapped
# (a<->c, U<->Xj, wr<->wc): E^T is E with swapped roles. Keeping the two
# sides as separate row-natural passes (rather than emitting colsum partials
# from one pass) avoids the transposed MXU contractions whose relayout
# buffers blow the 16 MB scoped-VMEM limit at N >= 1536.


def _bwd_row_kernel(a_ref, c_ref, u_ref, xj_ref, wr_ref, wc_ref, g_ref, ik_ref, gco_ref,
                    ga_ref, gu_ref, gwr_ref):
    """Row-side grads of BOTH terms from one E slab: for W = g wr wc^T E and
    Wc = g_corr iK E (g_corr pre-scattered to zero on off-diagonal pairs, so
    the corr contribution vanishes exactly where it does not apply)."""
    e = _e_slab(a_ref, c_ref, u_ref, xj_ref)
    g = g_ref[0, 0, 0]
    ewc = e * wc_ref[0].reshape(1, -1)  # (tn, N)
    we = (g * wr_ref[0]) * ewc + gco_ref[0, 0, 0] * ik_ref[0] * e
    ga_ref[0] = jnp.sum(we, axis=1, keepdims=True)
    gu_ref[0] = jax.lax.dot_general(
        we, xj_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    gwr_ref[0] = g * jnp.sum(ewc, axis=1, keepdims=True)


def _gik_kernel(a_ref, c_ref, u_ref, xj_ref, g_ref, out_ref):
    out_ref[0] = g_ref[0, 0, 0] * _e_slab(a_ref, c_ref, u_ref, xj_ref)


@functools.partial(jax.jit, static_argnames=("tn", "diag_pos"))
def _bwd_row_call(g, a, c, u, xj, wr, wc, ik, gco, tn: int, diag_pos: Tuple[int, ...]):
    """(ga (B,N,1), gU (B,N,ns), g_wr (B,N,1)) — fused row-side grads of the
    S_p AND corr terms (one E slab). Also used for the col-side pass with
    tile roles swapped: iK is symmetric, so the row slab of iK^T equals the
    row slab of iK (in the rectangular sharded case the col-side pass gets
    the TRANSPOSED local iK shard instead — see the shard-mapped core)."""
    b, nr, ns = u.shape
    nc = xj.shape[1]
    row_vec, col_vec, row_mat, col_mat, scalar, _ = _specs(tn, nc, ns)
    slot = _ik_slot(diag_pos)
    ik_spec = pl.BlockSpec((1, tn, nc), lambda bb, i: (slot(bb), i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_row_kernel,
        grid=(b, nr // tn),
        in_specs=[row_vec, col_vec, row_mat, col_mat, row_vec, col_vec, scalar, ik_spec, scalar],
        out_specs=[row_vec, row_mat, row_vec],
        out_shape=[
            jax.ShapeDtypeStruct((b, nr, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, nr, ns), jnp.float32),
            jax.ShapeDtypeStruct((b, nr, 1), jnp.float32),
        ],
    )(a, c, u, xj, wr, wc, g, ik, gco)


@functools.partial(jax.jit, static_argnames=("tn",))
def _gik_call(g, a, c, u, xj, tn: int):
    b, nr, ns = u.shape
    nc = xj.shape[1]
    row_vec, col_vec, row_mat, col_mat, scalar, _ = _specs(tn, nc, ns)
    return pl.pallas_call(
        _gik_kernel,
        grid=(b, nr // tn),
        in_specs=[row_vec, col_vec, row_mat, col_mat, scalar],
        out_specs=pl.BlockSpec((1, tn, nc), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nr, nc), jnp.float32),
    )(a, c, u, xj, g)


# ---------------------------------------------------------------------------
# custom-vjp composite
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_cov_core(diag_pos: Tuple[int, ...], nr: int, nc: int):
    tn_r = _tile(nr)
    tn_c = _tile(nc)
    diag = np.asarray(diag_pos)

    def _col(v):  # (B, N) -> (B, N, 1)
        return v[..., None]

    def _scal(v):  # (B,) -> (B, 1, 1)
        return v[:, None, None]

    @jax.custom_vjp
    def cov_core(a, c, u, xj, bi, bj, ik):
        return _cov_fwd_call(_col(a), _col(c), u, xj, _col(bi), _col(bj), ik,
                             tn=tn_r, diag_pos=diag_pos)

    def fwd(a, c, u, xj, bi, bj, ik):
        return cov_core(a, c, u, xj, bi, bj, ik), (a, c, u, xj, bi, bj, ik)

    def bwd(res, cts):
        a, c, u, xj, bi, bj, ik = res
        g_s, g_corr = cts

        # corr cotangent scattered to the full pair axis (zero off-diagonal)
        # so ONE fused row pass per side covers both terms' grads
        g_co = jnp.zeros((a.shape[0],), jnp.float32).at[jnp.asarray(diag)].set(g_corr)

        # row side, then col side with tile roles swapped. Square slabs reuse
        # iK by symmetry; rectangular ones (N-sharded local shards) need the
        # explicit transpose — ik[R_d, :]^T == ik[:, R_d] by global symmetry.
        ik_col = ik if nr == nc else jnp.swapaxes(ik, 1, 2)
        ga, gu, gbi = _bwd_row_call(_scal(g_s), _col(a), _col(c), u, xj, _col(bi), _col(bj),
                                    ik, _scal(g_co), tn=tn_r, diag_pos=diag_pos)
        gc, gxj, gbj = _bwd_row_call(_scal(g_s), _col(c), _col(a), xj, u, _col(bj), _col(bi),
                                     ik_col, _scal(g_co), tn=tn_c, diag_pos=diag_pos)

        # grad wrt iK: separate call -> dead-code-eliminated when the
        # cotangent is not consumed (the planner's cache is constant).
        a_d, c_d, u_d, xj_d = _col(a[diag]), _col(c[diag]), u[diag], xj[diag]
        gik = _gik_call(_scal(g_corr), a_d, c_d, u_d, xj_d, tn=tn_r)

        return ga[..., 0], gc[..., 0], gu, gxj, gbi[..., 0], gbj[..., 0], gik

    cov_core.defvjp(fwd, bwd)
    return cov_core


def cov_core_pallas(a, c, u, xj, bi, bj, ik, diag_pos: Tuple[int, ...]):
    """Fused (S_p, corr) with custom VJP. See module docstring for shapes.

    Row/column extents may differ (a (P, nr) vs c (P, nc)) — the N-sharded
    multi-chip path calls this on each device's local row shard."""
    return _make_cov_core(tuple(diag_pos), a.shape[1], c.shape[1])(a, c, u, xj, bi, bj, ik)
