"""On-TPU validation of the row-tiled df32 covariance kernels vs the XLA twin.

The kernel BODIES are covered on CPU by tests/test_df_cov_tiled.py (grid
emulated in Python); this script validates the actual pallas_call LOWERING
on real hardware — forward values and custom-VJP gradients of
ops.pallas_df_cov.df_cov_core_pallas against ops.df_cov_core_xla — at the
shapes the online-learning episode visits (incl. the flagship N=300 ->
pad 384 and the non-multiple-of-128 pad path). Exits nonzero on mismatch.

Also prints per-shape wall-clock for the Mosaic compile (the whole reason
this kernel family exists: the whole-step kernel of ops/pallas_df_mm.py
has N^2-scaling compile time, unusable past bucket 128).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPMPC_TPU_X64"] = "1"

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpmpc_tpu.ops import df_cov_core_xla
from gpmpc_tpu.ops.df32 import split_f64
from gpmpc_tpu.ops.pallas_df_cov import df_cov_core_pallas

f32 = jnp.float32


def _inputs(n, ns=3, seed=0, scale_beta=1e3, n_cols=None):
    """Same operand regime as tests/test_df_cov_tiled.py: exponents <= 0,
    +-1e3 beta (the trained-GP cancellation), symmetric iK. n_cols != n
    builds the rectangular (shard-mapped multi-chip) operand layout: row
    operands length n, column operands length n_cols, iK (Ns, n, n_cols)
    deliberately NOT symmetric."""
    rng = np.random.default_rng(seed)
    ii, jj = np.triu_indices(ns)
    p = len(ii)
    diag_pos = tuple(int(q) for q in np.where(ii == jj)[0])
    nc = n if n_cols is None else n_cols

    def df(x):
        return split_f64(jnp.asarray(x, jnp.float64))

    a = -np.abs(rng.normal(2.0, 1.5, (p, n))) * 3.0
    c = -np.abs(rng.normal(2.0, 1.5, (p, nc))) * 3.0
    u = rng.normal(0.0, 0.4, (p, n, ns))
    xj = rng.normal(0.0, 0.4, (p, nc, ns))
    bi = rng.normal(0.0, scale_beta, (p, n))
    bj = rng.normal(0.0, scale_beta, (p, nc))
    ik = rng.normal(0.0, 30.0, (ns, n, nc))
    if n_cols is None:
        ik = (ik + np.swapaxes(ik, 1, 2)) / 2.0
    ops = [df(v) for v in (a, c, u, xj, bi, bj, ik)]
    flat = [comp for pair in ops for comp in pair]
    return flat, diag_pos, p, ns


def _collapse(h, l):
    return np.asarray(h, np.float64) + np.asarray(l, np.float64)


def check(n, n_cols=None):
    flat, diag_pos, p, ns = _inputs(n, seed=n, n_cols=n_cols)
    w = jnp.arange(1.0, p + 1, dtype=f32)
    wc = jnp.arange(1.0, ns + 1, dtype=f32) * 0.7

    def loss(core):
        def f(ah, ch, uh, xjh):
            args = list(flat)
            args[0], args[2], args[4], args[6] = ah, ch, uh, xjh
            sh, sl, co_h, co_l = core(*args, diag_pos)
            val = jnp.sum(w * (sh + sl)) + jnp.sum(wc * (co_h + co_l))
            return val, (sh + sl, co_h + co_l)
        return f

    args4 = (flat[0], flat[2], flat[4], flat[6])
    t0 = time.time()
    f_p = jax.jit(jax.value_and_grad(loss(df_cov_core_pallas), argnums=(0, 1, 2, 3), has_aux=True))
    (vp, (sp_p, co_p)), gp_ = f_p(*args4)
    jax.block_until_ready(gp_)
    t_pallas = time.time() - t0
    f_x = jax.jit(jax.value_and_grad(loss(df_cov_core_xla), argnums=(0, 1, 2, 3), has_aux=True))
    (vx, (sp_x, co_x)), gx = f_x(*args4)
    jax.block_until_ready(gx)

    def rel_max(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30))

    errs = {
        "Sp": rel_max(sp_p, sp_x), "corr": rel_max(co_p, co_x),
        "ga": rel_max(gp_[0], gx[0]), "gc": rel_max(gp_[1], gx[1]),
        "gU": rel_max(gp_[2], gx[2]), "gXj": rel_max(gp_[3], gx[3]),
    }
    # forward pairs resolve far beyond f32; gradients are f32-grade by
    # design (hi-only cotangents) — same bars as scripts/check_df_fused.py
    ok = errs["Sp"] < 1e-6 and errs["corr"] < 1e-6 and all(
        errs[k] < 1e-3 for k in ("ga", "gc", "gU", "gXj"))
    shape = f"{n}x{n_cols}" if n_cols else f"{n}"
    print(f"n={shape:>9s} ok={ok} compile+run={t_pallas:6.1f}s " +
          " ".join(f"{k}={v:.2e}" for k, v in errs.items()), flush=True)
    return ok


def check_shardmap(n, n_devices=1):
    """Validate the shard_map-wrapped Pallas df cov core on real hardware.

    With the single real chip this exercises the shard_map + Mosaic lowering
    of the square kernel (n_loc == n); the rectangular row-shard layout the
    multi-chip path produces is validated by the ROWSxCOLS direct checks
    (same kernel builds, explicit rectangular operands)."""
    from jax.sharding import Mesh

    from gpmpc_tpu.parallel.sharding import make_shardmapped_df_cov_core

    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devices), axis_names=("n",))
    core = make_shardmapped_df_cov_core(mesh, axis="n", use_pallas=True)
    flat, diag_pos, p, ns = _inputs(n, seed=n)
    with mesh:
        sh, sl, co_h, co_l = jax.jit(lambda *a: core(*a, diag_pos))(*flat)
        jax.block_until_ready(sh)
    sx_h, sx_l, cx_h, cx_l = jax.jit(lambda *a: df_cov_core_xla(*a, diag_pos))(*flat)
    sp_err = float(np.max(np.abs(_collapse(sh, sl) - _collapse(sx_h, sx_l))) /
                   max(np.max(np.abs(_collapse(sx_h, sx_l))), 1e-30))
    co_err = float(np.max(np.abs(_collapse(co_h, co_l) - _collapse(cx_h, cx_l))) /
                   max(np.max(np.abs(_collapse(cx_h, cx_l))), 1e-30))
    ok = sp_err < 1e-6 and co_err < 1e-6
    print(f"shardmap n={n} devices={n_devices} ok={ok} Sp={sp_err:.2e} corr={co_err:.2e}",
          flush=True)
    return ok


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--shardmap"]
    shardmap = "--shardmap" in sys.argv[1:]
    results = []
    if shardmap:
        for a in (args or ["256"]):
            results.append(check_shardmap(int(a)))
    else:
        # shapes: N (square) or ROWSxCOLS (rectangular, the shard-map layout)
        shapes = args or ["256", "300", "384", "512", "768"]
        for s in shapes:
            if "x" in s:
                r, c = s.split("x")
                results.append(check(int(r), n_cols=int(c)))
            else:
                results.append(check(int(s)))
    print(json.dumps({"ok": all(results)}))
    sys.exit(0 if all(results) else 1)
