"""Row-tiled df32 covariance-core kernels (ops/pallas_df_cov.py) vs the XLA
twin (ops.df_cov_core_xla) — values and gradients.

The kernel BODIES (_fwd_cell / _bwd_cell, pure jnp) and the grid/stacking
logic are exercised here by emulating the (pair, row-tile) grid in Python —
the same split as test_df32.test_fused_stage23_math_matches_xla: Mosaic
interpret mode is far too slow for these bodies (> 9 min for one forward at
N = 256 on CPU), so the pallas_call lowering itself is validated on real
TPU hardware by scripts/check_df_cov.py instead.

The emulation runs with a small row tile (8) instead of the production 128,
and calls the cell bodies EAGERLY (one primitive per dispatch). Both choices
are load-bearing on a 1-core CPU host: the cell math and the
grid/stacking/slot logic are tile-size-agnostic (row-halving only needs a
power of two; the lane reduce only needs the column count to be a multiple
of 128), and jitting a cell lets XLA:CPU loop fusion DUPLICATE the producer
chain into every slice consumer of the halving reductions — with ~10 nested
df_adds the recompute factor is exponential (measured: one jitted (8, 256)
cell runs > 10 minutes; the same cell eager runs in 50 ms). Mosaic lowers
the real kernels without XLA fusion, so the TPU path is unaffected; the
production tile/lowering is exercised on-chip by scripts/check_df_cov.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpmpc_tpu.ops import df_cov_core_xla
from gpmpc_tpu.ops.df32 import split_f64
from gpmpc_tpu.ops.pallas_df_cov import (
    _bwd_cell, _df_tree, _fwd_cell, _ik_slot, pad128_slabs,
)

TEST_TILE = 8  # production is 128 — see module docstring

f32 = jnp.float32

# EAGER on purpose — see module docstring (jitting a cell triggers the
# XLA:CPU fusion-duplication blowup)
_fwd_cell_jit = _fwd_cell
_bwd_cell_jit = _bwd_cell


def _inputs(n, ns=3, seed=0, scale_beta=1e3):
    """Semi-realistic df operands: exponents <= 0 (healthy kernel rows),
    +-1e3 beta (the trained-GP cancellation regime), symmetric iK."""
    rng = np.random.default_rng(seed)
    ii, jj = np.triu_indices(ns)
    p = len(ii)
    diag_pos = tuple(int(q) for q in np.where(ii == jj)[0])

    def df(x):
        return split_f64(jnp.asarray(x, jnp.float64))

    a = -np.abs(rng.normal(2.0, 1.5, (p, n))) * 3.0  # in [-~15, 0]
    c = -np.abs(rng.normal(2.0, 1.5, (p, n))) * 3.0
    u = rng.normal(0.0, 0.4, (p, n, ns))
    xj = rng.normal(0.0, 0.4, (p, n, ns))
    bi = rng.normal(0.0, scale_beta, (p, n))
    bj = rng.normal(0.0, scale_beta, (p, n))
    ik = rng.normal(0.0, 30.0, (ns, n, n))
    ik = (ik + np.swapaxes(ik, 1, 2)) / 2.0  # the kernels rely on symmetry
    ops = [df(v) for v in (a, c, u, xj, bi, bj, ik)]
    flat = [comp for pair in ops for comp in pair]
    return flat, diag_pos


def _collapse(h, l):
    return np.asarray(h, np.float64) + np.asarray(l, np.float64)


def _pad(flat, n):
    n_pad, padded = pad128_slabs(n, [
        (flat[0], (1,)), (flat[1], (1,)), (flat[2], (1,)), (flat[3], (1,)),
        (flat[4], (1,)), (flat[5], (1,)), (flat[6], (1,)), (flat[7], (1,)),
        (flat[8], (1,)), (flat[9], (1,)), (flat[10], (1,)), (flat[11], (1,)),
        (flat[12], (1, 2)), (flat[13], (1, 2)),
    ])
    return n_pad, padded


def _emulate_fwd(flat, diag_pos, n):
    """The forward core with the pallas grid replaced by a Python loop —
    identical cell math, tiling, iK slot indexing, and XLA-side df tree."""
    n_pad, f = _pad(flat, n)
    ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl = f
    p = ah.shape[0]
    tn = TEST_TILE
    t = n_pad // tn
    slot = _ik_slot(diag_pos, p)

    def col(v):
        return v[..., None]

    sp_parts, co_parts = [], []
    for b in range(p):
        s = int(slot(b))
        row_s, row_l = [], []
        for i in range(t):
            r = slice(i * tn, (i + 1) * tn)
            sh, sl, th, tl = _fwd_cell_jit(
                col(ah[b, r]), col(al[b, r]), col(ch[b]), col(cl[b]),
                uh[b, r], ul[b, r], xjh[b], xjl[b],
                col(bih[b, r]), col(bil[b, r]), col(bjh[b]), col(bjl[b]),
                ikh[s, r], ikl[s, r], ns=uh.shape[-1])
            row_s.append((sh[0, 0], sl[0, 0]))
            row_l.append((th[0, 0], tl[0, 0]))
        sp_parts.append(_df_tree(row_s))
        co_parts.append(_df_tree(row_l))
    sp_h = jnp.stack([x[0] for x in sp_parts])
    sp_l = jnp.stack([x[1] for x in sp_parts])
    co_h = jnp.stack([co_parts[q][0] for q in diag_pos])
    co_l = jnp.stack([co_parts[q][1] for q in diag_pos])
    return sp_h, sp_l, co_h, co_l


@pytest.mark.parametrize(
    "n",
    [96,
     pytest.param(256, marks=pytest.mark.slow)])
def test_cell_forward_matches_xla(n):
    """n = 96 exercises the exact zero-padding to 128 (every reduction term
    carries a zero bi/bj/iK factor on pad rows/cols) and keeps the fast
    suite cheap; n = 256 (slow) exercises the multi-chunk lane-reduce tree
    (> one 128-column chunk), which scripts/check_df_cov.py also validates
    on real TPU hardware with the production tile."""
    flat, diag_pos = _inputs(n)
    out_x = jax.jit(lambda *a: df_cov_core_xla(*a, diag_pos))(*flat)
    out_p = _emulate_fwd(flat, diag_pos, n)
    sx, cx = _collapse(out_x[0], out_x[1]), _collapse(out_x[2], out_x[3])
    sp, cp = _collapse(out_p[0], out_p[1]), _collapse(out_p[2], out_p[3])
    # identical math, different reduction association: agreement far beyond
    # f32 (the compensated pairs resolve ~2^-45 relative)
    np.testing.assert_allclose(sp, sx, rtol=1e-8, atol=1e-8 * np.max(np.abs(sx)))
    np.testing.assert_allclose(cp, cx, rtol=1e-8, atol=1e-8 * np.max(np.abs(cx)))


def test_cell_backward_matches_xla_grad():
    """The hand-rolled role-swapped backward cells == autodiff of the XLA
    twin for the action-dependent inputs (a, c, U, Xj), including the
    stacked (row ++ col) operand construction of the custom VJP.

    n = 128 is the minimum the cell accepts (_df_reduce_lanes needs
    128-aligned columns) and keeps the XLA-twin grad compile tractable on a
    1-core CPU host; the multi-chunk lane-reduce tree is covered by the slow
    forward test and on-chip by scripts/check_df_cov.py."""
    n = 128
    ns = 3
    flat, diag_pos = _inputs(n, seed=1)
    ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl, ikh, ikl = flat
    p = ah.shape[0]

    # cotangents: weighted sums of the outputs
    w = np.arange(1.0, p + 1, dtype=np.float32)
    wc = np.arange(1.0, ns + 1, dtype=np.float32) * 0.7

    def loss_x(ah_, ch_, uh_, xjh_):
        args = list(flat)
        args[0], args[2], args[4], args[6] = ah_, ch_, uh_, xjh_
        sh, sl, co_h, co_l = df_cov_core_xla(*args, diag_pos)
        return jnp.sum(jnp.asarray(w) * (sh + sl)) + jnp.sum(jnp.asarray(wc) * (co_h + co_l))

    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3)))(ah, ch, uh, xjh)

    # emulate the stacked backward: rows [0, P) are the row side, [P, 2P)
    # the col side with (a, U, bi) <-> (c, Xj, bj) swapped
    gs = jnp.asarray(w)
    gco_full = jnp.zeros((p,), f32).at[jnp.asarray(np.asarray(diag_pos))].set(jnp.asarray(wc))

    def stk(x, y):
        return jnp.concatenate([x, y], axis=0)

    A2, Al2 = stk(ah, ch), stk(al, cl)
    C2, Cl2 = stk(ch, ah), stk(cl, al)
    U2, Ul2 = stk(uh, xjh), stk(ul, xjl)
    X2, Xl2 = stk(xjh, uh), stk(xjl, ul)
    BI2, BIl2 = stk(bih, bjh), stk(bil, bjl)
    BJ2, BJl2 = stk(bjh, bih), stk(bjl, bil)
    GS2 = stk(gs, gs)
    GCO2 = stk(gco_full, gco_full)

    tn = TEST_TILE
    t = n // tn
    slot = _ik_slot(diag_pos, p)

    def col(v):
        return v[..., None]

    ga_rows = np.zeros((2 * p, n))
    gu_rows = np.zeros((2 * p, n, ns))
    cell = _bwd_cell_jit
    for b in range(2 * p):
        s = int(slot(b))
        for i in range(t):
            r = slice(i * tn, (i + 1) * tn)
            ga, gu_cols = cell(
                col(A2[b, r]), col(Al2[b, r]), col(C2[b]), col(Cl2[b]),
                U2[b, r], Ul2[b, r], X2[b], Xl2[b],
                col(BI2[b, r]), col(BIl2[b, r]), col(BJ2[b]), col(BJl2[b]),
                ikh[s, r], ikl[s, r], GS2[b], GCO2[b], ns=ns)
            ga_rows[b, r] = np.asarray(ga[:, 0])
            for e in range(ns):
                gu_rows[b, r, e] = np.asarray(gu_cols[e][:, 0])

    names = ("a", "c", "U", "Xj")
    emulated = (ga_rows[:p], ga_rows[p:], gu_rows[:p], gu_rows[p:])
    for g_p, g_x, name in zip(emulated, gx, names):
        g_x = np.asarray(g_x)
        ref = np.max(np.abs(g_x)) + 1e-30
        np.testing.assert_allclose(
            g_p, g_x, rtol=0, atol=3e-6 * ref,
            err_msg=f"grad mismatch for {name}")


def test_dispatch_cpu_uses_xla():
    """ops.df_cov_core on the CPU backend must select the XLA twin at
    trace time (the pallas kernels are TPU-only by dispatch)."""
    from gpmpc_tpu.ops import df_cov_core

    flat, diag_pos = _inputs(128, seed=2)
    out_auto = jax.jit(lambda *a: df_cov_core(*a, diag_pos))(*flat)
    out_x = jax.jit(lambda *a: df_cov_core_xla(*a, diag_pos))(*flat)
    np.testing.assert_allclose(
        _collapse(out_auto[0], out_auto[1]), _collapse(out_x[0], out_x[1]),
        rtol=0, atol=0)
