"""Golden-value tests: JAX GP core vs the numpy float64 oracle.

Covers SURVEY.md §2 parity-critical behaviors 2, 4, 5, 6 — GP structure,
factorizations, one-step moment matching (including masked padding
equivalence), and variance propagation across time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.models.gp import (
    GPBounds,
    constrained_params,
    masked_cholesky_factorize,
    moment_match,
    negative_mll,
    params_from_constrained,
    predict_trajectory,
)
from tests.oracle import np_oracle

NS, NA = 3, 1
D = NS + NA


def make_problem(rng, n=24, ns=NS, d=D, pad_to=None):
    x = rng.uniform(0, 1, size=(n, d))
    y = rng.normal(0, 0.05, size=(n, ns))
    ls = rng.uniform(0.3, 2.0, size=(ns, d))
    outs = rng.uniform(0.02, 0.4, size=(ns,))
    noise = rng.uniform(1e-5, 1e-3, size=(ns,))

    bounds = GPBounds(
        min_lengthscale=jnp.full((ns, d), 1e-3),
        max_lengthscale=jnp.full((ns, d), 50.0),
        min_outputscale=jnp.full((ns,), 1e-6),
        max_outputscale=jnp.full((ns,), 2.0),
        min_noise=jnp.full((ns,), 1e-7),
        max_noise=jnp.full((ns,), 1.0),
    )
    params = params_from_constrained(jnp.asarray(ls), jnp.asarray(outs), jnp.asarray(noise), bounds)

    if pad_to is None:
        x_pad, y_pad, mask = x, y, np.ones(n, dtype=bool)
    else:
        x_pad = np.zeros((pad_to, d))
        y_pad = np.zeros((pad_to, ns))
        mask = np.zeros(pad_to, dtype=bool)
        x_pad[:n], y_pad[:n], mask[:n] = x, y, True

    return params, bounds, x, y, ls, outs, noise, x_pad, y_pad, mask


def test_constrain_roundtrip(rng):
    params, bounds, _, _, ls, outs, noise, *_ = make_problem(rng)
    ls2, outs2, noise2 = constrained_params(params, bounds)
    np.testing.assert_allclose(np.asarray(ls2), ls, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(outs2), outs, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(noise2), noise, rtol=1e-9)


@pytest.mark.parametrize("pad_to", [None, 40])
def test_factorizations_match_oracle(rng, pad_to):
    params, bounds, x, y, ls, outs, noise, x_pad, y_pad, mask = make_problem(rng, pad_to=pad_to)
    cache = masked_cholesky_factorize(params, bounds, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask))
    iK_ref, beta_ref = np_oracle.factorizations(x, y, ls, outs, noise)
    n = x.shape[0]
    np.testing.assert_allclose(np.asarray(cache.iK)[:, :n, :n], iK_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(cache.beta)[:, :n], beta_ref, atol=1e-8)
    if pad_to is not None:
        # padding must be exactly zero
        assert np.all(np.asarray(cache.iK)[:, n:, :] == 0)
        assert np.all(np.asarray(cache.beta)[:, n:] == 0)


@pytest.mark.parametrize("pad_to", [None, 40])
def test_moment_match_matches_oracle(rng, pad_to):
    params, bounds, x, y, ls, outs, noise, x_pad, y_pad, mask = make_problem(rng, pad_to=pad_to)
    cache = masked_cholesky_factorize(params, bounds, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask))

    input_mu = rng.uniform(0, 1, size=(D,))
    sv = rng.normal(0, 0.1, size=(NS, NS))
    state_var = sv @ sv.T * 0.01
    input_var = np.zeros((D, D))
    input_var[:NS, :NS] = state_var

    M, S, V = moment_match(cache, jnp.asarray(input_mu), jnp.asarray(input_var))

    iK_ref, beta_ref = np_oracle.factorizations(x, y, ls, outs, noise)
    M_ref, S_ref, V_ref = np_oracle.moment_match(x, iK_ref, beta_ref, ls, outs, input_mu, input_var)

    np.testing.assert_allclose(np.asarray(M), M_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(S), S_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(V), V_ref, atol=1e-9)


def test_trajectory_matches_oracle(rng):
    params, bounds, x, y, ls, outs, noise, x_pad, y_pad, mask = make_problem(rng, pad_to=32)
    cache = masked_cholesky_factorize(params, bounds, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask))

    nh = 6
    actions = rng.uniform(0, 1, size=(nh, NA))
    state_mu = rng.uniform(0, 1, size=(NS,))
    state_var = np.diag(rng.uniform(1e-6, 1e-4, size=(NS,)))

    mus, vars_ = predict_trajectory(cache, jnp.asarray(actions), jnp.asarray(state_mu), jnp.asarray(state_var), 0, False)

    iK_ref, beta_ref = np_oracle.factorizations(x, y, ls, outs, noise)
    mus_ref, vars_ref = np_oracle.predict_trajectory(x, iK_ref, beta_ref, ls, outs, actions, state_mu, state_var)

    np.testing.assert_allclose(np.asarray(mus), mus_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vars_), vars_ref, atol=1e-8)


def test_trajectory_with_time_feature(rng):
    """Time index appended raw (not normalized) — SURVEY §2 item 7."""
    d_time = D + 1
    n = 20
    x = rng.uniform(0, 1, size=(n, d_time))
    x[:, -1] = np.arange(n)  # raw time column
    y = rng.normal(0, 0.05, size=(n, NS))
    ls = np.concatenate([rng.uniform(0.3, 2.0, size=(NS, D)), np.full((NS, 1), 100.0)], axis=1)
    outs = rng.uniform(0.02, 0.4, size=(NS,))
    noise = rng.uniform(1e-5, 1e-3, size=(NS,))
    bounds = GPBounds(
        min_lengthscale=jnp.full((NS, d_time), 1e-3),
        max_lengthscale=jnp.full((NS, d_time), 10000.0),
        min_outputscale=jnp.full((NS,), 1e-6),
        max_outputscale=jnp.full((NS,), 2.0),
        min_noise=jnp.full((NS,), 1e-7),
        max_noise=jnp.full((NS,), 1.0),
    )
    params = params_from_constrained(jnp.asarray(ls), jnp.asarray(outs), jnp.asarray(noise), bounds)
    mask = np.ones(n, dtype=bool)
    cache = masked_cholesky_factorize(params, bounds, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))

    nh = 4
    actions = rng.uniform(0, 1, size=(nh, NA))
    state_mu = rng.uniform(0, 1, size=(NS,))
    state_var = np.diag(rng.uniform(1e-6, 1e-4, size=(NS,)))
    t0 = 17

    mus, vars_ = predict_trajectory(cache, jnp.asarray(actions), jnp.asarray(state_mu), jnp.asarray(state_var), t0, True)

    iK_ref, beta_ref = np_oracle.factorizations(x, y, ls, outs, noise)
    mus_ref, vars_ref = np_oracle.predict_trajectory(
        x, iK_ref, beta_ref, ls, outs, actions, state_mu, state_var, current_time_idx=t0, include_time_model=True
    )
    np.testing.assert_allclose(np.asarray(mus), mus_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vars_), vars_ref, atol=1e-8)


def test_predicted_covariance_symmetric_psd_diag(rng):
    """Property: predicted state covariances stay symmetric with nonneg diag."""
    params, bounds, x, y, ls, outs, noise, x_pad, y_pad, mask = make_problem(rng, pad_to=32)
    cache = masked_cholesky_factorize(params, bounds, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask))
    actions = rng.uniform(0, 1, size=(8, NA))
    state_mu = rng.uniform(0, 1, size=(NS,))
    state_var = np.diag(np.full(NS, 1e-6))
    _, vars_ = predict_trajectory(cache, jnp.asarray(actions), jnp.asarray(state_mu), jnp.asarray(state_var), 0, False)
    v = np.asarray(vars_)
    np.testing.assert_allclose(v, np.swapaxes(v, -1, -2), atol=1e-10)
    assert np.all(np.diagonal(v, axis1=-2, axis2=-1) > -1e-10)


def test_negative_mll_matches_oracle(rng):
    params, bounds, x, y, ls, outs, noise, x_pad, y_pad, mask = make_problem(rng, pad_to=40)
    losses = negative_mll(params, bounds, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask))
    for m in range(NS):
        ref = np_oracle.negative_mll(x, y[:, m], ls[m], outs[m], noise[m])
        np.testing.assert_allclose(float(losses[m]), ref, rtol=1e-9)


def test_jit_eager_equivalence(rng):
    params, bounds, x, y, ls, outs, noise, x_pad, y_pad, mask = make_problem(rng, pad_to=32)
    args = (params, bounds, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask))
    cache_e = masked_cholesky_factorize(*args)
    cache_j = jax.jit(masked_cholesky_factorize)(*args)
    np.testing.assert_allclose(np.asarray(cache_e.iK), np.asarray(cache_j.iK), atol=1e-12)
    np.testing.assert_allclose(np.asarray(cache_e.beta), np.asarray(cache_j.beta), atol=1e-12)


def test_extend_factorization_matches_full(rng):
    """Appending points one at a time (O(N^2) path) must equal the full
    refactorization on the grown active block."""
    from gpmpc_tpu.models.gp import extend_factorization

    params, bounds, x, y, ls, outs, noise, x_pad, y_pad, mask = make_problem(rng, n=20, pad_to=40)
    cache = masked_cholesky_factorize(params, bounds, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask))

    # append 6 fresh points sequentially
    x_new = rng.uniform(0, 1, size=(6, D))
    y_new = rng.normal(0, 0.05, size=(6, NS))
    for i in range(6):
        cache = extend_factorization(cache, jnp.asarray(x_new[i]), jnp.asarray(y_new[i]))

    x_pad2, y_pad2, mask2 = x_pad.copy(), y_pad.copy(), mask.copy()
    x_pad2[20:26], y_pad2[20:26], mask2[20:26] = x_new, y_new, True
    full = masked_cholesky_factorize(params, bounds, jnp.asarray(x_pad2), jnp.asarray(y_pad2), jnp.asarray(mask2))

    np.testing.assert_allclose(np.asarray(cache.x_mem), np.asarray(full.x_mem), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(cache.mask), np.asarray(full.mask))
    np.testing.assert_allclose(np.asarray(cache.L), np.asarray(full.L), atol=1e-8)
    np.testing.assert_allclose(np.asarray(cache.iK), np.asarray(full.iK), atol=1e-7)
    np.testing.assert_allclose(np.asarray(cache.beta), np.asarray(full.beta), atol=1e-7)

    # padding invariants survive extension
    np.testing.assert_allclose(np.asarray(cache.iK)[:, 26:, :], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cache.beta)[:, 26:], 0.0, atol=1e-12)

    # and downstream moment matching agrees
    input_mu = rng.uniform(0, 1, size=(D,))
    sv = rng.normal(0, 0.1, size=(NS, NS))
    state_var = sv @ sv.T * 0.01
    input_var = np.zeros((D, D))
    input_var[:NS, :NS] = state_var
    M1, S1, V1 = moment_match(cache, jnp.asarray(input_mu), jnp.asarray(input_var))
    M2, S2, V2 = moment_match(full, jnp.asarray(input_mu), jnp.asarray(input_var))
    np.testing.assert_allclose(np.asarray(M1), np.asarray(M2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V2), atol=1e-8)
