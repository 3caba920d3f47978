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


def _inputs(n, ns=3, seed=0, scale_beta=1e3):
    """Same operand regime as tests/test_df_cov_tiled.py: exponents <= 0,
    +-1e3 beta (the trained-GP cancellation), symmetric iK."""
    rng = np.random.default_rng(seed)
    ii, jj = np.triu_indices(ns)
    p = len(ii)
    diag_pos = tuple(int(q) for q in np.where(ii == jj)[0])

    def df(x):
        return split_f64(jnp.asarray(x, jnp.float64))

    a = -np.abs(rng.normal(2.0, 1.5, (p, n))) * 3.0
    c = -np.abs(rng.normal(2.0, 1.5, (p, n))) * 3.0
    u = rng.normal(0.0, 0.4, (p, n, ns))
    xj = rng.normal(0.0, 0.4, (p, n, ns))
    bi = rng.normal(0.0, scale_beta, (p, n))
    bj = rng.normal(0.0, scale_beta, (p, n))
    ik = rng.normal(0.0, 30.0, (ns, n, n))
    ik = (ik + np.swapaxes(ik, 1, 2)) / 2.0
    ops = [df(v) for v in (a, c, u, xj, bi, bj, ik)]
    flat = [comp for pair in ops for comp in pair]
    return flat, diag_pos, p, ns


def _collapse(h, l):
    return np.asarray(h, np.float64) + np.asarray(l, np.float64)


def check(n):
    flat, diag_pos, p, ns = _inputs(n, seed=n)
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
    print(f"n={n:4d} ok={ok} compile+run={t_pallas:6.1f}s " +
          " ".join(f"{k}={v:.2e}" for k, v in errs.items()), flush=True)
    return ok


if __name__ == "__main__":
    shapes = [int(a) for a in sys.argv[1:]] or [256, 300, 384, 512, 768]
    results = [check(n) for n in shapes]
    print(json.dumps({"ok": all(results)}))
    sys.exit(0 if all(results) else 1)
