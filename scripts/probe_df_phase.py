"""A/B probe: where do the milliseconds of the df32 planning step go?

Times, each as its own jitted program with per-call blocking:
  split      split_cache_df of the f64 master (per-plan cost in the fused call)
  extend     f64 extend_factorization (one appended point)
  mm_pallas  one moment_match_df forward with the row-tiled Pallas cov core FORCED
  mm_xla     same with the XLA df cov core FORCED
  vag_pallas value_and_grad of the full Nh-step objective, Pallas forced
  vag_xla    same, XLA forced

Usage: python scripts/probe_df_phase.py [--points 300] [--horizon 15]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPMPC_TPU_X64"] = "1"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=300)
    p.add_argument("--horizon", type=int, default=15)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--skip-vag", action="store_true")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from gpmpc_tpu.memory.buffer import bucket_size
    from gpmpc_tpu.models.gp import (
        GPBounds, extend_factorization, masked_cholesky_factorize,
        moment_match_df, params_from_constrained, split_cache_df,
    )
    from gpmpc_tpu.ops import df_cov_core_xla, override_df_cov_core
    from gpmpc_tpu.ops.pallas_df_cov import df_cov_core_pallas

    f32, f64 = jnp.float32, jnp.float64
    ns, na, nh = 3, 1, args.horizon
    d = ns + na
    n_points = args.points
    bucket = bucket_size(n_points + 2)
    rng = np.random.default_rng(0)

    bounds = GPBounds(
        jnp.full((ns, d), 4e-3, f64), jnp.full((ns, d), 10.0, f64),
        jnp.full((ns,), 1e-2, f64), jnp.full((ns,), 0.95, f64),
        jnp.full((ns,), 1e-7, f64), jnp.full((ns,), 1e-4, f64),
    )
    params = params_from_constrained(
        jnp.full((ns, d), 0.35, f64), jnp.full((ns,), 0.9, f64),
        jnp.full((ns,), 1e-6, f64), bounds,
    )

    x = np.zeros((bucket, d))
    y = np.zeros((bucket, ns))
    mask = np.zeros((bucket,), dtype=bool)
    x[:n_points] = rng.uniform(0, 1, (n_points, d))
    y[:n_points] = rng.normal(0, 0.02, (n_points, ns))
    mask[:n_points] = True

    cache64 = jax.jit(masked_cholesky_factorize, static_argnames=("upcast",))(
        params, bounds, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask), upcast=True)
    jax.block_until_ready(cache64)

    mu = jnp.asarray(rng.uniform(0, 1, ns), f32)
    var = jnp.asarray(np.eye(ns) * 1e-6, f32)
    mu_in = jnp.asarray(rng.uniform(0, 1, d), f32)
    var_in = jnp.zeros((d, d), f32).at[:ns, :ns].set(var)
    xn = jnp.asarray(rng.uniform(0, 1, d), f64)
    yn = jnp.asarray(rng.normal(0, 0.02, ns), f64)

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {np.median(ts)*1e3:.3f} ms (compile {compile_s:.1f}s)",
              flush=True)
        return out

    timeit("split", jax.jit(split_cache_df), cache64)
    timeit("extend", jax.jit(extend_factorization), cache64, xn, yn)

    dfc = jax.jit(split_cache_df)(cache64)

    def cov_pallas(*a):
        return df_cov_core_pallas(*a[:-1], tuple(int(v) for v in a[-1]))

    def cov_xla(*a):
        return df_cov_core_xla(*a)

    def mm(mu_, var_):
        m, s, v = moment_match_df(dfc, mu_, var_)
        return m, s, v

    def mk(fn, cov):
        jitted = jax.jit(fn)

        def wrapped(*a):
            # trace-time dispatch: the override only matters on the first
            # (tracing) call; subsequent calls hit the jit fast path
            with override_df_cov_core(cov):
                return jitted(*a)
        return wrapped

    timeit("mm_pallas", mk(mm, cov_pallas), mu_in, var_in)
    timeit("mm_xla", mk(mm, cov_xla), mu_in, var_in)

    if not args.skip_vag:
        def obj(actions):
            def body(carry, a_t):
                mu_, var_ = carry
                inp_mu = jnp.concatenate([mu_, a_t])
                inp_var = jnp.zeros((d, d), f32).at[:ns, :ns].set(var_)
                m, s, v = moment_match_df(dfc, inp_mu, inp_var)
                return (mu_ + m, s), jnp.sum(m)
            (_, _), outs = jax.lax.scan(body, (mu, var), actions, unroll=True)
            return jnp.sum(outs)

        acts = jnp.asarray(rng.uniform(0, 1, (nh, na)), f32)
        timeit("vag_pallas", mk(jax.value_and_grad(obj), cov_pallas), acts)
        timeit("vag_xla", mk(jax.value_and_grad(obj), cov_xla), acts)


if __name__ == "__main__":
    main()
