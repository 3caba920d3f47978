"""On-device (box-constrained) L-BFGS in pure JAX.

The reference calls SciPy's Fortran L-BFGS-B with a torch-autograd jacobian,
crossing the host/framework boundary on every objective evaluation
(reference gp_mpc_controller.py:133-139, 229-285). Here the optimizer itself
is jit-compiled: fixed-shape (maxcor, n) curvature history, two-loop
recursion via lax.fori_loop, backtracking Armijo line search under
lax.while_loop, and gradient projection for box bounds. The entire MPC
planning step — rollout, cost, autodiff, optimizer — is one XLA program with
zero host round-trips, and restarts vmap into a single batched program.

Behavioral (not bitwise) parity with SciPy L-BFGS-B is the target: same tiny
iteration budgets (maxiter/maxcor/maxls from ControllerConfig), monotone
descent via Armijo, bound handling via projected gradients + box clipping.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_ARMIJO_C1 = 1e-4
_CURVATURE_EPS = 1e-10


class _LbfgsState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    s_hist: jnp.ndarray  # (m, n)
    y_hist: jnp.ndarray  # (m, n)
    rho: jnp.ndarray  # (m,)
    valid: jnp.ndarray  # (m,) bool
    head: jnp.ndarray  # int32 — next write slot
    gamma: jnp.ndarray  # H0 scaling
    best_x: jnp.ndarray
    best_f: jnp.ndarray
    evals: jnp.ndarray  # int32 — sequential-equivalent objective evals (SciPy nfev)


def _two_loop(state: _LbfgsState, q: jnp.ndarray, maxcor: int) -> jnp.ndarray:
    """Two-loop recursion computing H·q with the rolling history buffer.

    maxcor is static and tiny (<= ~10), so both loops are unrolled in Python:
    each trip is a couple of length-n dots, and on TPU the lax.fori_loop
    bookkeeping would cost more than the math itself.
    """
    alphas = [None] * maxcor
    q_ = q
    for i in range(maxcor):
        # i-th most recent pair lives at (head - 1 - i) mod m
        idx = (state.head - 1 - i) % maxcor
        ok = state.valid[idx]
        alpha = jnp.where(ok, state.rho[idx] * jnp.dot(state.s_hist[idx], q_), 0.0)
        q_ = q_ - alpha * state.y_hist[idx]
        alphas[i] = alpha

    r_ = state.gamma * q_
    for rec in range(maxcor - 1, -1, -1):  # oldest -> newest
        idx = (state.head - 1 - rec) % maxcor
        ok = state.valid[idx]
        beta = jnp.where(ok, state.rho[idx] * jnp.dot(state.y_hist[idx], r_), 0.0)
        r_ = r_ + jnp.where(ok, alphas[rec] - beta, 0.0) * state.s_hist[idx]
    return r_


def _line_search(
    fun: Callable,
    vg: Callable,
    x: jnp.ndarray,
    f: jnp.ndarray,
    g: jnp.ndarray,
    direction: jnp.ndarray,
    lower: Optional[jnp.ndarray],
    upper: Optional[jnp.ndarray],
    maxls: int,
    step_scale: Optional[float] = None,
):
    """Backtracking Armijo search with box clipping of each trial point.

    Two batched phases per L-BFGS iteration, still zero host round-trips:

      1. all maxls candidate steps (1, 1/2, 1/4, ...) are evaluated
         FORWARD-ONLY in one vmapped objective call and the first
         Armijo-accepting step is selected — identical semantics to
         sequential backtracking (which stops at the first accept);
      2. one value_and_grad at the single accepted point.

    The previous design ran value_and_grad on every trial; since the VJP of
    the moment-matched rollout costs ~3x its forward, forward-only trials +
    one grad cut the per-iteration cost by ~40% (for both the f32 and the
    heavier df32 rollouts) at the price of one extra sequential stage inside
    the same XLA program.

    Returns (x_new, f_new, g_new, success, consumed) where ``consumed`` is
    the number of objective evaluations an equivalent *sequential*
    backtracking search would have spent (first-accept index + 1, or maxls
    on failure) — used to honor SciPy's ``maxfun`` total-eval budget.
    On total failure keeps x.
    """

    def project(z):
        if lower is None:
            return z
        return jnp.clip(z, lower, upper)

    dtype = x.dtype
    if step_scale is None:
        steps = 0.5 ** jnp.arange(maxls, dtype=dtype)  # (maxls,) : 1, 1/2, 1/4, ...
    else:
        # torch-LBFGS ``lr`` semantics (reference gp_model.py:262-269 trains
        # with LBFGS(lr=lr_train, line_search_fn='strong_wolfe'): lr is the
        # base trial step, and the strong-wolfe bracketing may EXPAND it).
        # The batched equivalent: a geometric ladder with base step_scale and
        # doubling expansion candidates, largest first — first-accept then
        # picks the largest admissible step, mirroring the bracketing growth.
        steps = step_scale * (2.0 ** jnp.arange(maxls - 1, -1, -1, dtype=dtype))
    x_trials = jax.vmap(lambda s: project(x + s * direction))(steps)  # (maxls, n)
    f_trials = jax.vmap(fun)(x_trials)  # (maxls,)

    decrease = x_trials @ g - jnp.dot(x, g)  # (maxls,) = g . (x_try - x)
    accept = jnp.isfinite(f_trials) & (f_trials <= f + _ARMIJO_C1 * decrease) & (f_trials < f)
    success = jnp.any(accept)
    # index of the FIRST accepting step (largest step size)
    first = jnp.argmax(accept)  # argmax of bool picks first True
    idx = jnp.where(success, first, 0)

    x_acc = jnp.where(success, x_trials[idx], x)
    f_acc, g_acc = vg(x_acc)  # gradient only at the accepted point

    x_new = jnp.where(success, x_acc, x)
    f_new = jnp.where(success, f_acc, f)
    g_new = jnp.where(success, g_acc, g)
    consumed = jnp.where(success, first + 1, maxls).astype(jnp.int32)
    return x_new, f_new, g_new, success, consumed


def _line_search_grad_first(
    fun: Callable,
    vg: Callable,
    x: jnp.ndarray,
    f: jnp.ndarray,
    g: jnp.ndarray,
    direction: jnp.ndarray,
    lower: Optional[jnp.ndarray],
    upper: Optional[jnp.ndarray],
    maxls: int,
    step_scale: Optional[float] = None,
):
    """``_line_search`` restructured for the common case (single restart,
    no vmap): one value_and_grad at the LARGEST candidate step, which with a
    good L-BFGS direction Armijo-accepts nearly always — the remaining
    maxls-1 backtracking candidates run only inside the reject branch of a
    ``lax.cond``, which on TPU executes just the taken branch at runtime.

    Profiled motivation (v5e, df32 N=384, PERFORMANCE.md): the batched
    always-evaluate-all-maxls trial stage costs ~4x a single rollout per
    iteration while the first candidate accepts on essentially every
    planning step — the trials were the single largest share of the plan
    (~300 of 576 ms, more than all the backwards combined). Accepted point,
    Armijo test, and the sequential-equivalent ``consumed`` accounting are
    IDENTICAL to ``_line_search`` (first accept == largest accepted step);
    only the evaluation order changes. Under vmap (multi-restart) lax.cond
    degrades to both-branches-execute, so the planner selects this path
    only when restarts == 1 (controllers/planner._plan_from_cache).
    """

    def project(z):
        if lower is None:
            return z
        return jnp.clip(z, lower, upper)

    dtype = x.dtype
    if step_scale is None:
        steps = 0.5 ** jnp.arange(maxls, dtype=dtype)
    else:
        steps = step_scale * (2.0 ** jnp.arange(maxls - 1, -1, -1, dtype=dtype))

    gx = jnp.dot(x, g)
    x1 = project(x + steps[0] * direction)
    f1, g1 = vg(x1)
    acc1 = jnp.isfinite(f1) & (f1 <= f + _ARMIJO_C1 * (jnp.dot(x1, g) - gx)) & (f1 < f)

    def hot(_):
        return x1, f1, g1, jnp.asarray(True), jnp.asarray(1, jnp.int32)

    def cold(_):
        if maxls == 1:
            return x, f, g, jnp.asarray(False), jnp.asarray(1, jnp.int32)
        rest = steps[1:]
        x_trials = jax.vmap(lambda s: project(x + s * direction))(rest)
        f_trials = jax.vmap(fun)(x_trials)
        decrease = x_trials @ g - gx
        accept = jnp.isfinite(f_trials) & (f_trials <= f + _ARMIJO_C1 * decrease) & (f_trials < f)
        success = jnp.any(accept)
        first = jnp.argmax(accept)
        idx = jnp.where(success, first, 0)
        x_acc = jnp.where(success, x_trials[idx], x)
        f_acc, g_acc = vg(x_acc)
        x_new = jnp.where(success, x_acc, x)
        f_new = jnp.where(success, f_acc, f)
        g_new = jnp.where(success, g_acc, g)
        # sequential-equivalent eval count: candidate 0 spent 1 already
        consumed = jnp.where(success, first + 2, maxls).astype(jnp.int32)
        return x_new, f_new, g_new, success, consumed

    return lax.cond(acc1, hot, cold, operand=None)


def _lbfgs_core(
    fun: Callable,
    x0: jnp.ndarray,
    lower: Optional[jnp.ndarray],
    upper: Optional[jnp.ndarray],
    maxiter: int,
    maxcor: int,
    maxls: int,
    clip_grad_value: Optional[float],
    keep_best: bool,
    has_bounds: bool,
    maxfun: Optional[int] = None,
    init_step_scale: Optional[float] = None,
    grad_first: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    vg_raw = jax.value_and_grad(fun)

    def vg(x):
        f, g = vg_raw(x)
        if clip_grad_value is not None:
            g = jnp.clip(g, -clip_grad_value, clip_grad_value)
        return f, g

    n = x0.shape[0]
    dtype = x0.dtype
    if has_bounds:
        x0 = jnp.clip(x0, lower, upper)
    f0, g0 = vg(x0)

    def proj_grad(x, g):
        if not has_bounds:
            return g
        eps = jnp.asarray(1e-12, dtype)
        at_lo = jnp.logical_and(x <= lower + eps, g > 0)
        at_hi = jnp.logical_and(x >= upper - eps, g < 0)
        return jnp.where(jnp.logical_or(at_lo, at_hi), 0.0, g)

    state0 = _LbfgsState(
        x=x0,
        f=f0,
        g=g0,
        s_hist=jnp.zeros((maxcor, n), dtype=dtype),
        y_hist=jnp.zeros((maxcor, n), dtype=dtype),
        rho=jnp.zeros((maxcor,), dtype=dtype),
        valid=jnp.zeros((maxcor,), dtype=bool),
        head=jnp.asarray(0, jnp.int32),
        gamma=jnp.asarray(1.0, dtype),
        best_x=x0,
        best_f=f0,
        evals=jnp.asarray(1, jnp.int32),  # SciPy counts the initial (f, g) eval
    )

    search = _line_search_grad_first if grad_first else _line_search

    def step_fn(state: _LbfgsState, _):
        def do_search(_):
            pg = proj_grad(state.x, state.g)
            direction = -_two_loop(state, pg, maxcor)
            # guard: if not a descent direction, fall back to steepest descent
            descent = jnp.dot(direction, state.g) < 0
            direction = jnp.where(descent, direction, -pg)

            return search(
                fun, vg, state.x, state.f, state.g, direction,
                lower if has_bounds else None, upper if has_bounds else None,
                maxls, step_scale=init_step_scale,
            )

        # SciPy L-BFGS-B's `maxfun` total-evaluation budget (the reference
        # passes maxfun == maxiter in every example config, so it BINDS
        # before maxiter does): once the sequential-equivalent eval count
        # exceeds maxfun, further iterations leave the state untouched.
        # On the grad_first (non-vmapped) path the whole iteration sits
        # behind a lax.cond, so frozen trailing iterations cost ~nothing
        # at runtime; under vmap cond degrades to both-branches, so the
        # where-masking form is kept there.
        if maxfun is not None and grad_first:
            frozen = state.evals > maxfun

            def skip(_):
                return (state.x, state.f, state.g, jnp.asarray(False),
                        jnp.asarray(0, jnp.int32))

            x_new, f_new, g_new, success, consumed = lax.cond(
                frozen, skip, do_search, operand=None)
        else:
            x_new, f_new, g_new, success, consumed = do_search(None)
        if maxfun is not None and not grad_first:
            frozen = state.evals > maxfun
            x_new = jnp.where(frozen, state.x, x_new)
            f_new = jnp.where(frozen, state.f, f_new)
            g_new = jnp.where(frozen, state.g, g_new)
            success = jnp.logical_and(success, jnp.logical_not(frozen))
            consumed = jnp.where(frozen, 0, consumed)

        s = x_new - state.x
        y = g_new - state.g
        sy = jnp.dot(s, y)
        good_pair = jnp.logical_and(success, sy > _CURVATURE_EPS)
        slot = state.head % maxcor
        s_hist = state.s_hist.at[slot].set(jnp.where(good_pair, s, state.s_hist[slot]))
        y_hist = state.y_hist.at[slot].set(jnp.where(good_pair, y, state.y_hist[slot]))
        rho = state.rho.at[slot].set(jnp.where(good_pair, 1.0 / jnp.where(good_pair, sy, 1.0), state.rho[slot]))
        valid = state.valid.at[slot].set(jnp.where(good_pair, True, state.valid[slot]))
        head = jnp.where(good_pair, state.head + 1, state.head)
        yy = jnp.dot(y, y)
        gamma = jnp.where(good_pair, sy / jnp.maximum(yy, _CURVATURE_EPS), state.gamma)

        better = f_new < state.best_f
        best_x = jnp.where(better, x_new, state.best_x)
        best_f = jnp.where(better, f_new, state.best_f)

        new_state = _LbfgsState(
            x=x_new, f=f_new, g=g_new,
            s_hist=s_hist, y_hist=y_hist, rho=rho, valid=valid, head=head, gamma=gamma,
            best_x=best_x, best_f=best_f, evals=state.evals + consumed,
        )
        return new_state, None

    # NOTE: unroll=True here gains ~5% planning latency but multiplies the
    # XLA compile time ~2.5x (the body contains a vmapped value_and_grad of
    # the unrolled rollout); kept rolled on purpose.
    state, _ = lax.scan(step_fn, state0, None, length=maxiter)
    if keep_best:
        return state.best_x, state.best_f
    return state.x, state.f


def lbfgs_minimize(
    fun: Callable,
    x0: jnp.ndarray,
    maxiter: int,
    maxcor: int = 10,
    maxls: int = 12,
    clip_grad_value: Optional[float] = None,
    keep_best: bool = False,
    maxfun: Optional[int] = None,
    init_step_scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unconstrained L-BFGS. Returns (x, f) — best-ever if keep_best.

    ``init_step_scale`` is the torch-LBFGS ``lr`` equivalent: the base trial
    step of the line search (with doubling expansion candidates). None keeps
    the plain backtracking ladder starting at 1."""
    return _lbfgs_core(
        fun, x0, None, None, int(maxiter), int(maxcor), int(maxls), clip_grad_value, bool(keep_best), False,
        maxfun=None if maxfun is None else int(maxfun),
        init_step_scale=None if init_step_scale is None else float(init_step_scale),
    )


def lbfgs_b_minimize(
    fun: Callable,
    x0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    maxiter: int,
    maxcor: int = 10,
    maxls: int = 12,
    keep_best: bool = True,
    maxfun: Optional[int] = None,
    grad_first: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Box-constrained L-BFGS (projected). Returns (x, f).

    ``maxfun`` is SciPy's total-objective-evaluation cap (reference
    gp_mpc_controller.py:133-139 forwards it in actions_optimizer_params);
    ``eps`` has no equivalent here because the reference passes jac=True,
    which makes SciPy ignore eps as well (it is a finite-difference step).
    ``grad_first`` selects the lax.cond line search (identical accepted
    points; see _line_search_grad_first) — only valid OUTSIDE vmap."""
    return _lbfgs_core(
        fun, x0, lower, upper, int(maxiter), int(maxcor), int(maxls), None, bool(keep_best), True,
        maxfun=None if maxfun is None else int(maxfun),
        grad_first=bool(grad_first),
    )
