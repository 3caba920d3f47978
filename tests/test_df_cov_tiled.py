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


# ---------------------------------------------------------------------------
# call-layer emulation: padding, BlockSpec index maps, grids, role swaps
# ---------------------------------------------------------------------------


class _BlockRef:
    """Minimal pallas Ref stand-in over a sliced block (read) or a deferred
    write record (the kernels write each output block exactly once)."""

    def __init__(self, block=None):
        self.block = block
        self.written = None  # (local_index, value)

    def __getitem__(self, idx):
        return self.block[idx]

    def __setitem__(self, idx, value):
        assert self.written is None, "kernel wrote an output block twice"
        self.written = (idx, value)


def _emulating_pallas_call(kernel, *, grid, in_specs, out_specs, out_shape,
                           interpret=False, **_kw):
    """pallas_call replacement: runs the kernel body EAGERLY per grid cell
    (see module docstring for why not interpret/jit) with real BlockSpec
    index maps and block shapes, assembling outputs with .at[].set — fully
    traceable, so custom-VJP gradients flow through the emulated launches.
    Validates everything except the Mosaic lowering itself (which
    scripts/check_df_cov.py covers on real TPU)."""
    import itertools

    single = not isinstance(out_shape, (list, tuple))
    oshapes = [out_shape] if single else list(out_shape)
    ospecs = [out_specs] if single else list(out_specs)

    def call(*arrays):
        outs = [jnp.zeros(s.shape, s.dtype) for s in oshapes]
        for cell in itertools.product(*[range(int(g)) for g in grid]):
            ins = []
            for a, spec in zip(arrays, in_specs):
                start = [int(v) for v in spec.index_map(*cell)]
                sl = tuple(slice(s * b, (s + 1) * b)
                           for s, b in zip(start, spec.block_shape))
                ins.append(_BlockRef(a[sl]))
            orefs = [_BlockRef() for _ in outs]
            kernel(*ins, *orefs)
            for k, (o, spec, ref) in enumerate(zip(outs, ospecs, orefs)):
                start = [int(v) for v in spec.index_map(*cell)]
                sl = tuple(slice(s * b, (s + 1) * b)
                           for s, b in zip(start, spec.block_shape))
                idx, val = ref.written
                block = jnp.zeros(spec.block_shape, o.dtype).at[idx].set(val)
                outs[k] = o.at[sl].set(block)
        return outs[0] if single else outs

    return call


def _rect_inputs(n_rows, n_cols, ns=3, seed=4, scale_beta=1e3):
    """Rectangular (shard-mapped multi-chip) operand layout: row operands
    length n_rows, column operands length n_cols, iK (Ns, n_rows, n_cols)
    deliberately NOT symmetric — the role-swapped col-side backward must
    transpose it explicitly."""
    rng = np.random.default_rng(seed)
    ii, jj = np.triu_indices(ns)
    p = len(ii)
    diag_pos = tuple(int(q) for q in np.where(ii == jj)[0])

    def df(x):
        return split_f64(jnp.asarray(x, jnp.float64))

    a = -np.abs(rng.normal(2.0, 1.5, (p, n_rows))) * 3.0
    c = -np.abs(rng.normal(2.0, 1.5, (p, n_cols))) * 3.0
    u = rng.normal(0.0, 0.4, (p, n_rows, ns))
    xj = rng.normal(0.0, 0.4, (p, n_cols, ns))
    bi = rng.normal(0.0, scale_beta, (p, n_rows))
    bj = rng.normal(0.0, scale_beta, (p, n_cols))
    ik = rng.normal(0.0, 30.0, (ns, n_rows, n_cols))
    ops = [df(v) for v in (a, c, u, xj, bi, bj, ik)]
    flat = [comp for pair in ops for comp in pair]
    return flat, diag_pos, p, ns


def test_rect_call_layer_matches_xla():
    """ADVICE r4 high: df_cov_core_pallas with RECTANGULAR operands (the
    shard-mapped layout: local row shard x full columns, non-symmetric iK)
    must match the XLA twin for values AND custom-VJP gradients. Exercises
    the real padding / BlockSpecs / grids / two-launch role-swapped backward
    through the emulated pallas_call (rows 96 -> pad 128, cols 256: uneven
    row pad + multi-chunk lane reduce)."""
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    from gpmpc_tpu.ops import pallas_df_cov as pdc

    n_rows, n_cols = 96, 256
    flat, diag_pos, p, ns = _rect_inputs(n_rows, n_cols)
    w = jnp.arange(1.0, p + 1, dtype=f32)
    wc = jnp.arange(1.0, ns + 1, dtype=f32) * 0.7

    def loss(core, ah_, ch_, uh_, xjh_):
        args = list(flat)
        args[0], args[2], args[4], args[6] = ah_, ch_, uh_, xjh_
        sh, sl, co_h, co_l = core(*args, diag_pos)
        return jnp.sum(w * (sh + sl)) + jnp.sum(wc * (co_h + co_l))

    args4 = (flat[0], flat[2], flat[4], flat[6])
    ref_v = loss(df_cov_core_xla, *args4)
    ref_g = jax.grad(lambda *t: loss(df_cov_core_xla, *t), argnums=(0, 1, 2, 3))(*args4)

    pdc._make_core.cache_clear()
    pdc._build_fwd.cache_clear()
    pdc._build_bwd.cache_clear()
    with mock.patch.object(pl, "pallas_call", _emulating_pallas_call):
        got_v = loss(pdc.df_cov_core_pallas, *args4)
        got_g = jax.grad(lambda *t: loss(pdc.df_cov_core_pallas, *t),
                         argnums=(0, 1, 2, 3))(*args4)
    pdc._make_core.cache_clear()
    pdc._build_fwd.cache_clear()
    pdc._build_bwd.cache_clear()

    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-7)
    for gg, gr, name in zip(got_g, ref_g, ("a", "c", "U", "Xj")):
        gr = np.asarray(gr)
        scale = np.max(np.abs(gr)) + 1e-30
        np.testing.assert_allclose(np.asarray(gg), gr, rtol=0, atol=3e-6 * scale,
                                   err_msg=f"grad mismatch for {name}")


def test_shardmapped_pallas_branch_shapes_and_values():
    """The pallas=True branch of make_shardmapped_df_cov_core on a 2-device
    CPU mesh (ADVICE r4 high — this branch previously misrouted rectangular
    shards into a square kernel that derived BOTH extents from the rows):

    * the kernel entry point must receive RECTANGULAR local operands —
      row operands of length n_loc = N / n_dev, column operands full-length,
      iK (Ns, n_loc, N) — and the supported_rect gate must accept them;
    * end-to-end values and gradients through shard_map's transpose rules
      must match the replicated XLA twin.

    The kernel entry point is mocked to record shapes and delegate to the
    XLA core (running the real Mosaic body per shard via the emulating
    pallas_call takes ~10 min under eager shard_map on this host — the
    rectangular KERNEL math itself, padding and the role-swapped two-launch
    backward included, is pinned by test_rect_call_layer_matches_xla above,
    and the on-chip lowering by scripts/check_df_cov.py ROWSxCOLS /
    --shardmap)."""
    from unittest import mock

    import pytest

    from gpmpc_tpu.ops import pallas_df_cov as pdc
    from gpmpc_tpu.parallel.sharding import make_mesh, make_shardmapped_df_cov_core

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")

    ns, n = 2, 256
    flat, diag_pos, p, _ = _rect_inputs(n, n, ns=ns, seed=9)
    # the shard-mapped core takes square GLOBAL operands; make iK symmetric
    # as the real factorization cache's is
    ikh64 = np.asarray(flat[12], np.float64) + np.asarray(flat[13], np.float64)
    ik_sym = (ikh64 + np.swapaxes(ikh64, 1, 2)) / 2.0
    flat[12], flat[13] = split_f64(jnp.asarray(ik_sym, jnp.float64))

    w = jnp.arange(1.0, p + 1, dtype=f32)
    wc = jnp.arange(1.0, ns + 1, dtype=f32) * 0.7

    def loss(core, ah_, ch_, uh_, xjh_):
        args = list(flat)
        args[0], args[2], args[4], args[6] = ah_, ch_, uh_, xjh_
        sh, sl, co_h, co_l = core(*args, diag_pos)
        return jnp.sum(w * (sh + sl)) + jnp.sum(wc * (co_h + co_l))

    args4 = (flat[0], flat[2], flat[4], flat[6])

    seen_shapes = []

    def fake_pallas_core(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil,
                         bjh, bjl, ikh, ikl, dpos):
        seen_shapes.append((ah.shape, ch.shape, ikh.shape))
        # the real entry point asserts this gate after padding; assert it
        # here on the raw local shapes the shard_map hands over
        r_pad = ((ah.shape[1] + 127) // 128) * 128
        c_pad = ((ch.shape[1] + 127) // 128) * 128
        assert pdc.supported_rect(r_pad, c_pad, uh.shape[-1]), (ah.shape, ch.shape)
        return df_cov_core_xla(ah, al, ch, cl, uh, ul, xjh, xjl,
                               bih, bil, bjh, bjl, ikh, ikl, dpos)

    mesh = make_mesh(2, axis="n")
    with mock.patch.object(pdc, "df_cov_core_pallas", fake_pallas_core), mesh:
        core = make_shardmapped_df_cov_core(mesh, axis="n", use_pallas=True)
        # trace-only (jax.eval_shape): the mock's shape recording and the
        # supported_rect gate both fire at trace time, which is all this
        # test pins. Numeric equality of the wrapper is covered by
        # tests/test_sharding.py::test_shardmapped_df_cov_core_matches_replicated
        # (same wrapper, use_pallas=False at N=64), the kernel-side values
        # and grads by test_rect_call_layer_matches_xla, and the on-chip
        # lowering by scripts/check_df_cov.py ROWSxCOLS / --shardmap;
        # executing the eager shard_map forward here costs ~3 min on this
        # host for no new coverage.
        out_shape = jax.eval_shape(lambda *t: loss(core, *t), *args4)

    assert out_shape.shape == (), out_shape
    assert seen_shapes, "pallas branch was not taken"
    n_loc = n // 2
    for a_shape, c_shape, ik_shape in seen_shapes:
        assert a_shape == (p, n_loc), a_shape  # local row shard
        assert c_shape == (p, n), c_shape  # full-length columns
        assert ik_shape == (ns, n_loc, n), ik_shape  # rectangular iK shard
