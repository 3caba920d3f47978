"""Action-space mappings: raw <-> model (normalized [0,1]) <-> mpc variables.

Equivalent of the reference action-mapper hierarchy (actions_mappers/*.py):

* Normalization mapping: mpc variables ARE the normalized actions; the
  mpc->model transform is a reshape (normalization_action_mapper.py:21-23).
* Derivative mapping (``limit_action_change``): mpc variables are per-step
  *deltas* in [0,1], affinely mapped to [-max_change, +max_change], cumsum'd
  from the previously applied action, and clamped to [0,1] with a
  straight-through-gradient clamp (derivative_action_mapper.py:28-35,
  pytorch_utils.py:4-13) so the optimizer's gradient flows at the bounds.

All transforms are pure and differentiable — they live inside the jitted MPC
objective.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def ste_clamp(x, lo, hi):
    """Clamp whose gradient passes straight through (reference Clamp,
    pytorch_utils.py:4-13) — prevents actions sticking at the 0/1 bounds."""
    return jnp.clip(x, lo, hi)


def _ste_clamp_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), None


def _ste_clamp_bwd(_, g):
    return g, None, None


ste_clamp.defvjp(_ste_clamp_fwd, _ste_clamp_bwd)


class ActionMapperSpec(NamedTuple):
    """Static description of the action mapping, baked into the jitted plan."""

    limit_action_change: bool
    max_change_action_norm: jnp.ndarray  # (Na,)
    len_horizon: int
    dim_action: int


def mpc_to_model_actions(spec: ActionMapperSpec, actions_mpc: jnp.ndarray, action_prev: jnp.ndarray) -> jnp.ndarray:
    """Map flat (Nh*Na,) optimizer variables in [0,1] to (Nh, Na) normalized actions.

    ``action_prev`` is the previously applied normalized action, used only by
    the derivative mapping as the cumsum anchor
    (derivative_action_mapper.py:28-35).
    """
    acts = actions_mpc.reshape(spec.len_horizon, spec.dim_action)
    if not spec.limit_action_change:
        return acts
    deltas = acts * 2.0 * spec.max_change_action_norm - spec.max_change_action_norm
    deltas = deltas.at[0].add(action_prev)
    cum = jnp.cumsum(deltas, axis=0)
    return ste_clamp(cum, 0.0, 1.0)


def norm_action(action_raw, action_low, action_high):
    return (np.asarray(action_raw, dtype=np.asarray(action_low).dtype) - action_low) / (action_high - action_low)


def denorm_action(action_model, action_low, action_high):
    return np.asarray(action_model) * (action_high - action_low) + action_low
