"""On-device MLL hyperparameter training tests (SURVEY.md §2 item 12)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.models.gp import (
    GPBounds,
    TrainConfigDevice,
    constrained_params,
    negative_mll,
    params_from_constrained,
    train_hyperparams,
)


def _setup(rng, ns=2, d=3, n=30):
    # data generated from a known smooth function so MLL training has signal
    x = rng.uniform(0, 1, (n, d))
    y = np.stack([np.sin(3 * x[:, 0]) * 0.1 + 0.05 * x[:, 1], 0.1 * x[:, 2] ** 2], axis=1)
    y += rng.normal(0, 1e-3, y.shape)

    bounds = GPBounds(
        min_lengthscale=jnp.full((ns, d), 4e-3),
        max_lengthscale=jnp.full((ns, d), 25.0),
        min_outputscale=jnp.full((ns,), 1e-5),
        max_outputscale=jnp.full((ns,), 0.95),
        min_noise=jnp.full((ns,), 1e-6),
        max_noise=jnp.full((ns,), 0.09),
    )
    # deliberately bad init
    params = params_from_constrained(
        jnp.full((ns, d), 20.0), jnp.full((ns,), 0.9), jnp.full((ns,), 0.05), bounds
    )
    mask = np.ones(n, dtype=bool)
    return params, bounds, x, y, mask


def test_training_improves_mll(rng):
    params, bounds, x, y, mask = _setup(rng)
    cfg = TrainConfigDevice(lr=7e-3, iters=60, clip_grad_value=1e-1)
    before = np.asarray(negative_mll(params, bounds, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)))
    new_params, losses = train_hyperparams(
        params, bounds, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask), jax.random.PRNGKey(0), cfg
    )
    after = np.asarray(losses)
    assert np.all(after <= before + 1e-9)
    assert np.any(after < before - 0.1)  # materially better than the bad init


def test_training_respects_interval_constraints(rng):
    params, bounds, x, y, mask = _setup(rng)
    cfg = TrainConfigDevice(lr=7e-3, iters=30, clip_grad_value=1e-1)
    new_params, _ = train_hyperparams(
        params, bounds, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask), jax.random.PRNGKey(1), cfg
    )
    ls, outs, noise = constrained_params(new_params, bounds)
    assert np.all(np.asarray(ls) >= np.asarray(bounds.min_lengthscale))
    assert np.all(np.asarray(ls) <= np.asarray(bounds.max_lengthscale))
    assert np.all(np.asarray(outs) >= np.asarray(bounds.min_outputscale))
    assert np.all(np.asarray(noise) <= np.asarray(bounds.max_noise))


def test_training_keeps_incumbent_when_better(rng):
    """If the random re-init converges worse, incumbents must be returned
    (reference gp_model.py:231-235 keep-best semantics)."""
    params, bounds, x, y, mask = _setup(rng)
    # first train long to get good params
    cfg_long = TrainConfigDevice(lr=7e-3, iters=80, clip_grad_value=1e-1)
    good_params, good_losses = train_hyperparams(
        params, bounds, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask), jax.random.PRNGKey(2), cfg_long
    )
    # then "train" with a 1-iteration budget: random re-init can't beat them
    cfg_short = TrainConfigDevice(lr=7e-3, iters=1, clip_grad_value=1e-3)
    kept_params, kept_losses = train_hyperparams(
        good_params, bounds, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask), jax.random.PRNGKey(3), cfg_short
    )
    assert np.all(np.asarray(kept_losses) <= np.asarray(good_losses) + 1e-9)


def test_training_restarts_vmap(rng):
    params, bounds, x, y, mask = _setup(rng)
    cfg = TrainConfigDevice(lr=7e-3, iters=20, clip_grad_value=1e-1)
    new_params, losses = train_hyperparams(
        params, bounds, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask), jax.random.PRNGKey(4), cfg, restarts=3
    )
    assert np.asarray(losses).shape == (2,)
