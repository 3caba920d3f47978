"""On-TPU validation of the fused df32 kernels vs the XLA df32 twin.

Checks forward values AND gradients (value_and_grad of a scalar functional
of the moment-matched step) at every supported bucket, incl. the
non-power-of-two 3*2^k buckets (192/384). Exits nonzero on mismatch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPMPC_TPU_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpmpc_tpu.models.gp import (
    GPBounds, masked_cholesky_factorize, moment_match_df, moment_match_df_fused,
    params_from_constrained, split_cache_df,
)

f32, f64 = jnp.float32, jnp.float64


def make_cache(n_active, bucket, ns=3, d=4, noise=1e-6, seed=0):
    rng = np.random.default_rng(seed)
    x = np.zeros((bucket, d))
    y = np.zeros((bucket, ns))
    mask = np.zeros((bucket,), bool)
    x[:n_active] = rng.uniform(0, 1, (n_active, d))
    y[:n_active] = rng.normal(0, 0.05, (n_active, ns))
    mask[:n_active] = True
    bounds = GPBounds(
        jnp.full((ns, d), 4e-3, f64), jnp.full((ns, d), 10.0, f64),
        jnp.full((ns,), 1e-2, f64), jnp.full((ns,), 0.95, f64),
        jnp.full((ns,), 1e-7, f64), jnp.full((ns,), 1e-4, f64),
    )
    params = params_from_constrained(
        jnp.full((ns, d), 0.3, f64), jnp.full((ns,), 0.9, f64),
        jnp.full((ns,), noise, f64), bounds,
    )
    cache64 = masked_cholesky_factorize(
        params, bounds, jnp.asarray(x, f64), jnp.asarray(y, f64), jnp.asarray(mask))
    return split_cache_df(cache64)


def check(bucket):
    n_active = bucket - bucket // 8
    dfc = make_cache(n_active, bucket)
    ns = 3
    mu = jnp.asarray([0.55, 0.48, 0.52, 0.5], f32)
    var = jnp.zeros((4, 4), f32).at[:ns, :ns].set(jnp.eye(ns, dtype=f32) * 1e-4)

    def f_xla(mu_, sv_):
        v = jnp.zeros((4, 4), f32).at[:ns, :ns].set(sv_)
        M, S, V = moment_match_df(dfc, mu_, v)
        return jnp.sum(M) + jnp.sum(S * S) + jnp.sum(V), (M, S, V)

    def f_fused(mu_, sv_):
        v = jnp.zeros((4, 4), f32).at[:ns, :ns].set(sv_)
        M, S, V = moment_match_df_fused(dfc, mu_, v)
        return jnp.sum(M) + jnp.sum(S * S) + jnp.sum(V), (M, S, V)

    sv = var[:ns, :ns]
    (vx, (Mx, Sx, Vx)), gx = jax.jit(jax.value_and_grad(f_xla, argnums=(0, 1), has_aux=True))(mu, sv)
    (vf, (Mf, Sf, Vf)), gf = jax.jit(jax.value_and_grad(f_fused, argnums=(0, 1), has_aux=True))(mu, sv)

    def rel(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(np.max(np.abs(a - b) / (np.maximum(np.abs(b), 1e-6))))

    def rel_max(a, b):
        # normalized by the LARGEST entry: gradients are f32-grade by design
        # (custom-JVP plain-sum tangents, see ops/df32.df_mul and
        # ops/pallas_df_mm._reduce_last) — per-entry relative error on a
        # near-zero component is not the quantity that steers L-BFGS.
        a, b = np.asarray(a), np.asarray(b)
        return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-6))

    errs = {
        "M": rel(Mf, Mx), "S": rel(Sf, Sx), "V": rel(Vf, Vx),
        "gmu": rel_max(gf[0], gx[0]), "gsv": rel_max(gf[1], gx[1]),
    }
    ok = all(e < 1e-3 for e in errs.values())
    print(f"bucket={bucket:4d} n={n_active:4d} ok={ok} " +
          " ".join(f"{k}={v:.2e}" for k, v in errs.items()), flush=True)
    return ok


if __name__ == "__main__":
    # whole-step kernel buckets only (N <= 128: its Mosaic compile time
    # scales as N^2 — see ops/pallas_df_mm.supported); larger buckets are
    # covered by the row-tiled family via scripts/check_df_cov.py
    buckets = [int(a) for a in sys.argv[1:]] or [32, 64, 96, 128]
    results = [check(b) for b in buckets]
    sys.exit(0 if all(results) else 1)
