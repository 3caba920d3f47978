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
