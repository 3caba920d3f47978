"""On-device L-BFGS(-B) optimizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize as scipy_minimize

from gpmpc_tpu.controllers.lbfgs import lbfgs_b_minimize, lbfgs_minimize


def quad(x):
    return jnp.sum((x - 0.3) ** 2) + 0.5 * jnp.sum(x[:-1] * x[1:])


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def test_unconstrained_quadratic():
    x0 = jnp.zeros(6)
    x, f = lbfgs_minimize(quad, x0, maxiter=50, maxcor=10, maxls=20)
    g = np.asarray(jax.grad(quad)(x))
    assert np.max(np.abs(g)) < 1e-5


def test_unconstrained_rosenbrock_progress():
    x0 = jnp.zeros(4)
    x, f = lbfgs_minimize(rosenbrock, x0, maxiter=200, maxcor=10, maxls=25)
    assert float(f) < 1e-3


def test_box_constrained_matches_scipy():
    """Interior solution: projected L-BFGS must find the same optimum as
    SciPy L-BFGS-B."""

    def fj(z):
        zz = jnp.asarray(z)
        return float(quad(zz)), np.asarray(jax.grad(quad)(zz))

    n = 6
    x0 = np.full(n, 0.5)
    ref = scipy_minimize(fj, x0, jac=True, method="L-BFGS-B", bounds=[(0, 1)] * n)
    x, f = lbfgs_b_minimize(quad, jnp.asarray(x0), jnp.zeros(n), jnp.ones(n), maxiter=60, maxcor=10, maxls=20)
    np.testing.assert_allclose(np.asarray(x), ref.x, atol=1e-4)


def test_box_constrained_active_bounds():
    """Optimum outside the box -> solution pinned at the bound."""

    def f(x):
        return jnp.sum((x - 2.0) ** 2)

    n = 4
    x, fv = lbfgs_b_minimize(f, jnp.full(n, 0.5), jnp.zeros(n), jnp.ones(n), maxiter=30, maxcor=5, maxls=15)
    np.testing.assert_allclose(np.asarray(x), np.ones(n), atol=1e-8)


def test_keep_best_under_nan():
    """NaN objective regions must not poison the result."""

    def f(x):
        val = jnp.sum(x**2)
        return jnp.where(x[0] > 0.8, jnp.nan, val)

    x, fv = lbfgs_b_minimize(f, jnp.full(3, 0.5), jnp.zeros(3), jnp.ones(3), maxiter=20, maxcor=5, maxls=10)
    assert np.isfinite(float(fv))
    assert float(fv) <= float(f(jnp.full(3, 0.5)))


def test_vmap_restarts():
    inits = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 5)))
    lo, hi = jnp.zeros(5), jnp.ones(5)

    def solve(x0):
        return lbfgs_b_minimize(quad, x0, lo, hi, maxiter=20, maxcor=5, maxls=10)

    xs, fs = jax.vmap(solve)(inits)
    assert xs.shape == (4, 5)
    assert np.all(np.isfinite(np.asarray(fs)))


def test_grad_clipping_applies():
    calls = []

    def f(x):
        return 1e6 * jnp.sum(x**2)

    # with aggressive clipping the first step should be bounded
    x, fv = lbfgs_minimize(f, jnp.ones(3), maxiter=3, maxcor=2, maxls=5, clip_grad_value=1e-3)
    assert np.all(np.isfinite(np.asarray(x)))


def test_maxfun_caps_evaluations():
    """maxfun (SciPy total-eval budget) freezes iteration once exceeded:
    a tight cap must leave the solution far short of the uncapped run."""
    x0 = jnp.zeros(6)
    x_cap, f_cap = lbfgs_minimize(quad, x0, maxiter=50, maxcor=10, maxls=20, maxfun=1)
    x_free, f_free = lbfgs_minimize(quad, x0, maxiter=50, maxcor=10, maxls=20, maxfun=None)
    assert float(f_cap) > float(f_free) + 1e-3  # cap bit
    # and a loose cap changes nothing
    x_loose, f_loose = lbfgs_minimize(quad, x0, maxiter=50, maxcor=10, maxls=20, maxfun=10_000)
    np.testing.assert_allclose(float(f_loose), float(f_free), rtol=1e-12)


def _mpc_objective():
    """The real planning objective on a small GP problem (same construction
    as __graft_entry__.entry)."""
    from gpmpc_tpu.controllers.planner import PlanSpec, _objective_and_info
    from gpmpc_tpu.mappers.action import ActionMapperSpec
    from gpmpc_tpu.mappers.reward import RewardSpec
    from gpmpc_tpu.models.gp import GPBounds, masked_cholesky_factorize, params_from_constrained

    ns, na, nh, n = 3, 1, 15, 64
    d = ns + na
    rng = np.random.default_rng(7)
    reward_spec = RewardSpec(
        target_state_action_norm=jnp.asarray([1.0, 0.5, 0.5, 0.5]),
        weight_matrix_cost=jnp.asarray(np.diag([1.0, 0.1, 0.1, 1e-3])),
        target_state_norm=jnp.asarray([1.0, 0.5, 0.5]),
        weight_matrix_cost_terminal=jnp.asarray(np.diag([5.0, 2.0, 2.0])),
        use_constraints=False,
        state_min=jnp.zeros(ns),
        state_max=jnp.ones(ns),
        area_multiplier=1.0,
        exploration_factor=1.0,
        clip_lower_bound_cost_to_0=False,
    )
    action_spec = ActionMapperSpec(
        limit_action_change=False,
        max_change_action_norm=jnp.asarray([0.3]),
        len_horizon=nh,
        dim_action=na,
    )
    spec = PlanSpec(
        reward=reward_spec, action=action_spec, include_time_model=False,
        len_horizon=nh, dim_action=na, dim_state=ns, maxiter=4, maxcor=4, maxls=4, maxfun=4,
    )
    bounds = GPBounds(
        min_lengthscale=jnp.full((ns, d), 4e-3), max_lengthscale=jnp.full((ns, d), 10.0),
        min_outputscale=jnp.full((ns,), 1e-2), max_outputscale=jnp.full((ns,), 0.95),
        min_noise=jnp.full((ns,), 1e-6), max_noise=jnp.full((ns,), 1e-4),
    )
    params = params_from_constrained(
        jnp.full((ns, d), 0.5), jnp.full((ns,), 5e-2), jnp.full((ns,), 1e-5), bounds
    )
    x = jnp.asarray(rng.uniform(0, 1, (n, d)))
    y = jnp.asarray(rng.normal(0, 0.02, (n, ns)))
    mask = jnp.ones((n,), dtype=bool)
    cache = masked_cholesky_factorize(params, bounds, x, y, mask)
    state_mu = jnp.asarray(rng.uniform(0, 1, ns))
    state_var = jnp.eye(ns) * 1e-6
    action_prev = jnp.asarray([0.5])

    def objective(a):
        cost, _ = _objective_and_info(spec, cache, a, state_mu, state_var, action_prev, 0)
        return cost

    x0 = rng.uniform(0, 1, nh * na)
    return objective, x0, spec


def test_mpc_objective_parity_with_scipy():
    """Behavioral parity on the FULL MPC objective with the reference's
    pendulum budget (maxiter=maxcor=maxls=maxfun=4, jac=True, bounds [0,1])
    — same init, comparable achieved objective (reference
    gp_mpc_controller.py:133-139)."""
    objective, x0, spec = _mpc_objective()
    obj_jit = jax.jit(objective)
    vg = jax.jit(jax.value_and_grad(objective))

    def fj(z):
        f, g = vg(jnp.asarray(z))
        return float(f), np.asarray(g, dtype=np.float64)

    n = len(x0)
    ref = scipy_minimize(
        fj, x0, jac=True, method="L-BFGS-B", bounds=[(0, 1)] * n,
        options={"maxiter": spec.maxiter, "maxcor": spec.maxcor, "maxls": spec.maxls, "maxfun": spec.maxfun},
    )
    x_ours, f_ours = lbfgs_b_minimize(
        objective, jnp.asarray(x0), jnp.zeros(n), jnp.ones(n),
        maxiter=spec.maxiter, maxcor=spec.maxcor, maxls=spec.maxls, maxfun=spec.maxfun, keep_best=True,
    )
    f0 = float(obj_jit(jnp.asarray(x0)))
    assert float(f_ours) < f0  # we improved on the init
    assert ref.fun < f0  # scipy improved too
    # achieved objective within 10% of the improvement scipy made
    improvement_ref = f0 - float(ref.fun)
    improvement_ours = f0 - float(f_ours)
    assert improvement_ours > 0.9 * improvement_ref


def test_grad_first_matches_batched_line_search():
    """The grad-first (lax.cond) line search must select the SAME accepted
    points as the batched always-evaluate-all form — it only reorders the
    evaluations (one value_and_grad at the largest step, backtracking
    trials behind the reject branch). Covers: easy descent (candidate 0
    accepts every iteration), backtracking-required (Rosenbrock), active
    bounds, and the maxfun freeze."""
    n = 6
    cases = [
        (quad, jnp.full(n, 0.5), dict(maxiter=8, maxcor=4, maxls=4)),
        (quad, jnp.zeros(n), dict(maxiter=8, maxcor=4, maxls=4, maxfun=4)),
        (rosenbrock, jnp.zeros(n), dict(maxiter=25, maxcor=6, maxls=6)),
        (lambda x: jnp.sum((x - 2.0) ** 2), jnp.full(n, 0.25),
         dict(maxiter=10, maxcor=4, maxls=4)),
    ]
    for fun, x0, kw in cases:
        x_b, f_b = lbfgs_b_minimize(fun, x0, jnp.zeros(n), jnp.ones(n),
                                    grad_first=False, **kw)
        x_g, f_g = lbfgs_b_minimize(fun, x0, jnp.zeros(n), jnp.ones(n),
                                    grad_first=True, **kw)
        np.testing.assert_allclose(np.asarray(x_g), np.asarray(x_b),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(float(f_g), float(f_b), rtol=0, atol=1e-12)


def test_grad_first_under_jit_cond():
    """grad_first path must be jittable (nested lax.cond) and still match."""
    n = 5
    run = jax.jit(lambda x0: lbfgs_b_minimize(
        quad, x0, jnp.zeros(n), jnp.ones(n), maxiter=6, maxcor=4, maxls=4,
        maxfun=6, grad_first=True))
    x, f = run(jnp.full(n, 0.4))
    x_b, f_b = lbfgs_b_minimize(quad, jnp.full(n, 0.4), jnp.zeros(n), jnp.ones(n),
                                maxiter=6, maxcor=4, maxls=4, maxfun=6)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_b), atol=1e-12)
