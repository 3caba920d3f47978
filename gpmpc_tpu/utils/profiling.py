"""Per-phase timing of the planning step (SURVEY.md §5.1: the reference has
no tracing at all; the north-star metric here is planning-step latency, so we
time factorize / single-eval / full-plan separately)."""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax


def time_fn(fn: Callable, *args, iters: int = 30, warmup: int = 2) -> float:
    """Median-free steady-state mean seconds per call (async-dispatch aware)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def phase_breakdown(make_args) -> Dict[str, float]:
    """Time the three phases of one MPC planning step on the current backend.

    ``make_args`` returns (spec, bounds, params, x, y, mask, state_mu,
    state_var, inits, action_prev).
    """
    import jax.numpy as jnp

    from ..controllers.planner import _objective_and_info, build_plan_fn
    from ..models.gp import masked_cholesky_factorize

    spec, bounds, params, x, y, mask, state_mu, state_var, inits, action_prev = make_args()

    fact = jax.jit(lambda p, xx, yy, mm: masked_cholesky_factorize(p, bounds, xx, yy, mm))

    @jax.jit
    def one_eval(p, xx, yy, mm, a):
        cache = masked_cholesky_factorize(p, bounds, xx, yy, mm)
        cost, _ = _objective_and_info(spec, cache, a, state_mu, state_var, action_prev, 0)
        return cost

    @jax.jit
    def one_vg(p, xx, yy, mm, a):
        cache = masked_cholesky_factorize(p, bounds, xx, yy, mm)

        def obj(av):
            c, _ = _objective_and_info(spec, cache, av, state_mu, state_var, action_prev, 0)
            return c

        return jax.value_and_grad(obj)(a)

    plan = build_plan_fn(spec)

    return {
        "factorize_s": time_fn(fact, params, x, y, mask),
        "objective_eval_s": time_fn(one_eval, params, x, y, mask, inits[0]),
        "objective_value_and_grad_s": time_fn(one_vg, params, x, y, mask, inits[0]),
        "full_plan_s": time_fn(plan, x, y, mask, params, bounds, state_mu, state_var, inits, action_prev, 0, iters=20),
    }
