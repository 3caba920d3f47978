"""Phase breakdown of the flagship planning step on the current backend."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GPMPC_TPU_X64", "0")


def make_args():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpmpc_tpu.controllers.planner import PlanSpec
    from gpmpc_tpu.mappers.action import ActionMapperSpec
    from gpmpc_tpu.mappers.reward import RewardSpec
    from gpmpc_tpu.models.gp import GPBounds, params_from_constrained

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ns, na, nh = 3, 1, 15
    n_points, bucket = 300, 384
    d = ns + na
    rng = np.random.default_rng(0)

    reward_spec = RewardSpec(
        target_state_action_norm=jnp.asarray([1.0, 0.5, 0.5, 0.5], dtype=dtype),
        weight_matrix_cost=jnp.asarray(np.diag([1.0, 0.1, 0.1, 1e-3]), dtype=dtype),
        target_state_norm=jnp.asarray([1.0, 0.5, 0.5], dtype=dtype),
        weight_matrix_cost_terminal=jnp.asarray(np.diag([5.0, 2.0, 2.0]), dtype=dtype),
        use_constraints=False,
        state_min=jnp.zeros(ns, dtype=dtype),
        state_max=jnp.ones(ns, dtype=dtype),
        area_multiplier=1.0,
        exploration_factor=1.0,
        clip_lower_bound_cost_to_0=False,
    )
    action_spec = ActionMapperSpec(False, jnp.asarray([0.3], dtype=dtype), nh, na)
    spec = PlanSpec(reward_spec, action_spec, False, nh, na, ns, 4, 4, 4)
    bounds = GPBounds(
        jnp.full((ns, d), 4e-3, dtype=dtype), jnp.full((ns, d), 10.0, dtype=dtype),
        jnp.full((ns,), 1e-2, dtype=dtype), jnp.full((ns,), 0.95, dtype=dtype),
        jnp.full((ns,), 1e-6, dtype=dtype), jnp.full((ns,), 1e-4, dtype=dtype),
    )
    params = params_from_constrained(
        jnp.full((ns, d), 0.5, dtype=dtype), jnp.full((ns,), 5e-2, dtype=dtype), jnp.full((ns,), 1e-5, dtype=dtype), bounds
    )
    x = np.zeros((bucket, d)); y = np.zeros((bucket, ns)); mask = np.zeros(bucket, dtype=bool)
    x[:n_points] = rng.uniform(0, 1, (n_points, d)); y[:n_points] = rng.normal(0, 0.02, (n_points, ns)); mask[:n_points] = True
    return (
        spec, bounds, params, jnp.asarray(x, dtype=dtype), jnp.asarray(y, dtype=dtype), jnp.asarray(mask),
        jnp.asarray(rng.uniform(0, 1, ns), dtype=dtype), jnp.eye(ns, dtype=dtype) * 1e-6,
        jnp.asarray(rng.uniform(0, 1, (1, nh * na)), dtype=dtype), jnp.asarray([0.5], dtype=dtype),
    )


if __name__ == "__main__":
    from gpmpc_tpu.utils.profiling import phase_breakdown

    out = phase_breakdown(make_args)
    print(json.dumps({k: round(v * 1000, 3) for k, v in out.items()}, indent=0).replace("\n", " "))
