"""Controller state snapshot + disk checkpoint/resume.

The reference's ``SavedState`` (gp_model.py:13-36) is an in-memory pickle
used only to ship models to the training process and rebuild them for 3D
plots; nothing persists to disk (SURVEY.md §5.4). Here the snapshot is a
plain dict of numpy arrays covering the full controller state — GP
hyperparameters (raw + constraint boxes), the entire transition memory, and
the planner warm-start state — serialized with numpy's npz format (fast,
dependency-free; orbax would be overkill for <1 MB of state).

``save_state``/``restore_state`` on GpMpcController give exact resume: a
restored controller produces the same actions as the original (see
tests/test_checkpoint.py).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def controller_state_dict(ctrl) -> Dict[str, np.ndarray]:
    """Snapshot everything needed to resume a GpMpcController."""
    mem = ctrl.memory
    state = {
        # hyperparameters (raw space) — equivalent of SavedState.parameters
        "raw_lengthscales": np.asarray(ctrl.gp_params.raw_lengthscales),
        "raw_outputscale": np.asarray(ctrl.gp_params.raw_outputscale),
        "raw_noise": np.asarray(ctrl.gp_params.raw_noise),
        # memory — equivalent of SavedState.inputs/states_change plus the
        # bookkeeping the reference keeps implicitly in the live object
        "mem_inputs": mem.inputs[: mem.len_mem],
        "mem_states_next": mem.states_next[: mem.len_mem],
        "mem_rewards": mem.rewards[: mem.len_mem],
        "mem_iter_ctrls": mem.iter_ctrls[: mem.len_mem],
        "mem_errors": mem.errors[: mem.len_mem],
        "mem_stds": mem.stds[: mem.len_mem],
        "mem_active_mask": mem.active_data_mask[: mem.len_mem],
        "mem_model_inputs": mem.model_inputs[: mem.len_mem_model],
        "mem_model_targets": mem.model_targets[: mem.len_mem_model],
        "mem_counters": np.array([mem.len_mem, mem.len_mem_last_processed, mem.len_mem_model], dtype=np.int64),
        # controller host state
        "iter_ctrl": np.array(ctrl.iter_ctrl, dtype=np.int64),
        "action_model_previous_iter": np.asarray(ctrl.action_model_previous_iter),
        "train_key": np.asarray(ctrl._train_key),
    }
    # numpy Generator state (PCG64): two 128-bit ints -> decimal strings
    bg = ctrl._rng.bit_generator.state
    state["rng_state"] = np.array(
        [str(bg["state"]["state"]), str(bg["state"]["inc"]), str(int(bg["has_uint32"])), str(bg["uinteger"])]
    )
    if ctrl.past_action is not None:
        state["past_action"] = np.asarray(ctrl.past_action)
    if ctrl.actions_mpc_previous_iter is not None:
        state["actions_mpc_previous_iter"] = np.asarray(ctrl.actions_mpc_previous_iter)
    return state


def load_controller_state(ctrl, state: Dict[str, np.ndarray]) -> None:
    """Restore a controller from a snapshot produced by controller_state_dict."""
    import jax.numpy as jnp

    from ..models.gp import GPParams

    ctrl.gp_params = GPParams(
        raw_lengthscales=jnp.asarray(state["raw_lengthscales"]),
        raw_outputscale=jnp.asarray(state["raw_outputscale"]),
        raw_noise=jnp.asarray(state["raw_noise"]),
    )

    mem = ctrl.memory
    n, nlp, nm = (int(v) for v in state["mem_counters"])
    while len(mem.inputs) < n:
        mem._grow()
    while len(mem.model_inputs) < max(nm, 1):
        mem._grow_model()
    mem.inputs[:n] = state["mem_inputs"]
    mem.states_next[:n] = state["mem_states_next"]
    mem.rewards[:n] = state["mem_rewards"]
    mem.iter_ctrls[:n] = state["mem_iter_ctrls"]
    mem.errors[:n] = state["mem_errors"]
    mem.stds[:n] = state["mem_stds"]
    mem.active_data_mask[:n] = state["mem_active_mask"]
    mem.model_inputs[:nm] = state["mem_model_inputs"]
    mem.model_targets[:nm] = state["mem_model_targets"]
    mem.len_mem, mem.len_mem_last_processed, mem.len_mem_model = n, nlp, nm

    ctrl.iter_ctrl = int(state["iter_ctrl"])
    ctrl.action_model_previous_iter = np.asarray(state["action_model_previous_iter"])
    if "train_key" in state:
        ctrl._train_key = jnp.asarray(state["train_key"])
    if "rng_state" in state:
        s = [str(v) for v in state["rng_state"]]
        bg = ctrl._rng.bit_generator.state
        bg["state"]["state"] = int(s[0])
        bg["state"]["inc"] = int(s[1])
        bg["has_uint32"] = int(s[2])
        bg["uinteger"] = int(s[3])
        ctrl._rng.bit_generator.state = bg
    if "past_action" in state:
        ctrl.past_action = np.asarray(state["past_action"])
    if "actions_mpc_previous_iter" in state:
        ctrl.actions_mpc_previous_iter = np.asarray(state["actions_mpc_previous_iter"])
    # memory contents were replaced wholesale — the incremental factorization
    # cache can no longer assume an append-only history.
    ctrl.planner.invalidate_cache()


def save_checkpoint(ctrl, path: str) -> str:
    """Write the controller snapshot to ``path`` (.npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez_compressed(path, **controller_state_dict(ctrl))
    return path


def restore_checkpoint(ctrl, path: str) -> None:
    with np.load(path, allow_pickle=False) as data:
        load_controller_state(ctrl, dict(data))
