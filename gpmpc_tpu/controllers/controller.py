"""GP-MPC controller — host orchestration around the jitted compute core.

Public surface mirrors the reference GpMpcController
(gp_mpc_controller.py:21-317): ``get_action``, ``add_memory``,
``compute_cost_unnormalized``, ``get_iter_info``, ``store_iter_info``,
``check_and_close_processes``, constructed from gym-style space bounds and a
``Config``.

Differences by design (TPU-native):

* The entire planning step (factorization, rollout, cost, L-BFGS-B with
  restarts) is ONE jitted device call (controllers/planner.py) instead of a
  SciPy loop calling torch per evaluation.
* Hyperparameter training is a jitted on-device function
  (models/gp.py:train_hyperparams) dispatched asynchronously through JAX's
  async dispatch instead of a spawned OS process + Queue
  (reference gp_mpc_controller.py:201-227). Results are integrated between
  planning steps — same single-writer discipline as the reference.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.configs import Config
from ..mappers.action import ActionMapperSpec, denorm_action, norm_action
from ..mappers.observation import ObservationNormalizer
from ..mappers.reward import RewardSpec, reward_single
from ..memory.buffer import Memory
from ..models.gp import (
    GPBounds,
    GPParams,
    TrainConfigDevice,
    params_from_constrained,
    train_hyperparams,
)
from .planner import Planner, PlanSpec

NUM_DECIMALS_REPR = 3

# rng-domain separator for the MLL-training key schedule; shared by the host
# controller and the fused on-device episode (runner/jit_episode.py) so the
# two paths train with identical randomness given the same seed
TRAIN_KEY_TAG = 0x7A17


@dataclass
class IterationInformation:
    """Per-planning-step record (reference iteration_info_class.py:6-58)."""

    iteration: int
    state: np.ndarray
    cost: float
    cost_std: float
    mean_predicted_cost: float
    mean_predicted_cost_std: float
    lower_bound_mean_predicted_cost: float
    predicted_idxs: np.ndarray
    predicted_states: np.ndarray
    predicted_states_std: np.ndarray
    predicted_actions: np.ndarray
    predicted_costs: np.ndarray
    predicted_costs_std: np.ndarray

    def __str__(self) -> str:
        np.set_printoptions(precision=NUM_DECIMALS_REPR, suppress=True)
        parts = ["\n"]
        for key, item in self.__dict__.items():
            if isinstance(item, np.ndarray):
                rep = np.array2string(item, threshold=np.inf, max_line_width=np.inf, separator=",").replace("\n", "")
            else:
                rep = str(np.round(item, NUM_DECIMALS_REPR))
            parts.append(f"{key}: {rep}\n")
        return "".join(parts)


class GpMpcController:
    def __init__(self, observation_low, observation_high, action_low, action_high, config: Config, seed: int = 0):
        self.config = config
        self.dtype = np.float64 if config.dtype == "float64" else np.float32

        self.observation_state_mapper = ObservationNormalizer(
            observation_low, observation_high, np.asarray(config.observation.obs_var_norm), dtype=self.dtype
        )
        self.action_low = np.asarray(action_low, dtype=self.dtype)
        self.action_high = np.asarray(action_high, dtype=self.dtype)
        self.dim_action = len(self.action_low)
        self.dim_state = self.observation_state_mapper.dim_observation
        self.dim_input = self.dim_state + self.dim_action + (1 if config.model.include_time_model else 0)

        # --- model hyperparameters + interval constraints ----------------
        rm = config.model.resolved(self.dim_state, self.dim_input)
        self.bounds = GPBounds(
            min_lengthscale=jnp.asarray(rm.min_lengthscale, dtype=self.dtype),
            max_lengthscale=jnp.asarray(rm.max_lengthscale, dtype=self.dtype),
            min_outputscale=jnp.asarray(rm.min_outputscale, dtype=self.dtype),
            max_outputscale=jnp.asarray(rm.max_outputscale, dtype=self.dtype),
            min_noise=jnp.asarray(rm.min_noise_var, dtype=self.dtype),
            max_noise=jnp.asarray(rm.max_noise_var, dtype=self.dtype),
        )
        self.gp_params: GPParams = params_from_constrained(
            jnp.asarray(rm.init_lengthscale, dtype=self.dtype),
            jnp.asarray(rm.init_outputscale, dtype=self.dtype),
            jnp.asarray(rm.init_noise_var, dtype=self.dtype),
            self.bounds,
        )

        # --- memory -------------------------------------------------------
        self.memory = Memory(
            config.memory,
            dim_input=self.dim_input,
            dim_state=self.dim_state,
            include_time_model=config.model.include_time_model,
            step_model=config.controller.num_repeat_actions,
            dtype=self.dtype,
        )

        # --- reward / action specs (device constants) --------------------
        rc = config.reward
        w_state = np.asarray(rc.weight_state, dtype=self.dtype)
        w_action = np.asarray(rc.weight_action, dtype=self.dtype)
        weight_matrix = np.diag(np.concatenate([w_state, w_action]))
        self.reward_spec = RewardSpec(
            target_state_action_norm=jnp.asarray(
                np.concatenate(
                    [np.asarray(rc.target_state_norm, dtype=self.dtype), np.asarray(rc.target_action_norm, dtype=self.dtype)]
                )
            ),
            weight_matrix_cost=jnp.asarray(weight_matrix),
            target_state_norm=jnp.asarray(np.asarray(rc.target_state_norm, dtype=self.dtype)),
            weight_matrix_cost_terminal=jnp.asarray(np.diag(np.asarray(rc.weight_state_terminal, dtype=self.dtype))),
            use_constraints=bool(rc.use_constraints),
            state_min=jnp.asarray(np.asarray(rc.state_min, dtype=self.dtype)),
            state_max=jnp.asarray(np.asarray(rc.state_max, dtype=self.dtype)),
            area_multiplier=float(rc.area_multiplier),
            exploration_factor=float(rc.exploration_factor),
            clip_lower_bound_cost_to_0=bool(rc.clip_lower_bound_cost_to_0),
        )
        self.action_spec = ActionMapperSpec(
            limit_action_change=bool(config.actions.limit_action_change),
            max_change_action_norm=jnp.asarray(np.asarray(config.actions.max_change_action_norm, dtype=self.dtype)),
            len_horizon=config.controller.len_horizon,
            dim_action=self.dim_action,
        )

        opt = config.controller.actions_optimizer_params
        self.plan_spec = PlanSpec(
            reward=self.reward_spec,
            action=self.action_spec,
            include_time_model=bool(config.model.include_time_model),
            len_horizon=config.controller.len_horizon,
            dim_action=self.dim_action,
            dim_state=self.dim_state,
            maxiter=int(opt.get("maxiter", 30)),
            maxcor=int(opt.get("maxcor", 30)),
            maxls=int(opt.get("maxls", opt.get("maxiter", 30))),
            # `maxfun` (SciPy total-eval cap) is honored; `eps` is accepted
            # and unused BY THE REFERENCE TOO — it passes jac=True
            # (gp_mpc_controller.py:133-139), which makes SciPy skip
            # finite differences entirely.
            maxfun=int(opt["maxfun"]) if "maxfun" in opt else None,
        )
        self.planner = Planner(self.plan_spec)

        # --- training -----------------------------------------------------
        tc = config.training
        self.train_cfg = TrainConfigDevice(
            lr=float(tc.lr_train),
            # torch.optim.LBFGS performs up to 20 line-search-driven inner
            # iterations per .step() (its max_iter default); iter_train outer
            # steps in the reference therefore allow up to 20*iter_train
            # quasi-Newton iterations. We budget equivalently.
            iters=int(tc.iter_train) * 20,
            clip_grad_value=float(tc.clip_grad_value),
        )
        # Mixed precision: the exact-MLL objective factorizes K + sigma^2 I
        # whose conditioning grows as the optimizer shrinks the noise — in a
        # pure-f32 session the loss (and its gradients) degrade exactly when
        # training starts to succeed. Run training in f64 whenever x64 is
        # available and cast the (well-scaled, logit-space) raw params back.
        mixed_train = bool(jax.config.jax_enable_x64) and self.dtype == np.float32

        def _train(params, x, y, mask, key):
            bounds = self.bounds
            if mixed_train:
                params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)
                bounds = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), bounds)
                x, y = x.astype(jnp.float64), y.astype(jnp.float64)
            new_params, losses = train_hyperparams(
                params, bounds, x, y, mask, key, self.train_cfg, restarts=int(tc.restarts_train)
            )
            if mixed_train:
                new_params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), new_params)
            return new_params, losses

        self._train_fn = jax.jit(_train)
        self._pending_train = None  # (new_params, losses) device arrays in flight

        # On an accelerator session, dispatch MLL training to the HOST CPU
        # backend: f64 is native there (the TPU software-emulates it ~100x
        # slower), and the async CPU computation overlaps env stepping +
        # TPU planning — the same architecture as the reference's spawned
        # CPU training process (gp_mpc_controller.py:201-227), minus the
        # pickle boundary. Results are device_put back to the default
        # device at swap time (a few KB).
        self._train_device = None
        try:
            if jax.default_backend() != "cpu" and mixed_train:
                self._train_device = jax.devices("cpu")[0]
        except RuntimeError:
            self._train_device = None

        # --- misc state ---------------------------------------------------
        self.actions_mpc_previous_iter: Optional[np.ndarray] = None
        self.action_model_previous_iter = np.random.default_rng(seed).uniform(size=(self.dim_action,)).astype(self.dtype)
        self.past_action: Optional[np.ndarray] = None
        self.iter_ctrl = 0
        self.info_iters: Dict[str, List] = {}
        self.iter_info: Optional[IterationInformation] = None
        self._rng = np.random.default_rng(seed)
        # Deterministic training-key protocol SHARED with the fused on-device
        # episode (runner/jit_episode.py): per-dispatch key =
        # fold_in(fold_in(PRNGKey(seed), TRAIN_KEY_TAG), step_index). Makes
        # host-vs-fused training bit-comparable (tests/test_cross_path.py).
        self._train_key = jax.random.fold_in(jax.random.PRNGKey(seed), TRAIN_KEY_TAG)

        self.n_horizon_flat = config.controller.len_horizon * self.dim_action

    # ------------------------------------------------------------------
    def get_action(self, obs_mu, obs_var=None, random: bool = False):
        """One control step; plans only when iter_ctrl is a multiple of
        num_repeat_actions, else replays the cached action
        (reference gp_mpc_controller.py:52-112)."""
        self.check_and_close_processes()
        if self.iter_ctrl % self.config.controller.num_repeat_actions == 0:
            self.memory.prepare_for_model()
            state_mu, state_var = self.observation_state_mapper.get_state(obs_mu, obs_var)
            x_pad, y_pad, mask, _ = self.memory.get_padded()
            # dummy-placeholder flag from the Memory's OWN emptiness state —
            # never inferred from data values (a legitimate first transition
            # at the normalized origin must not be mistaken for the dummy)
            is_dummy = self.memory.len_mem_model == 0

            if random or not self.config.controller.optimize:
                actions_mpc = self._rng.uniform(size=(self.n_horizon_flat,)).astype(self.dtype)
                actions_model, info = self.planner.evaluate(
                    x_pad, y_pad, mask, self.gp_params, self.bounds,
                    jnp.asarray(state_mu), jnp.asarray(state_var),
                    jnp.asarray(actions_mpc), jnp.asarray(self.action_model_previous_iter),
                    self.iter_ctrl, is_dummy=is_dummy,
                )
                actions_mpc_opt = actions_mpc
            else:
                inits = self._make_inits()
                actions_mpc_opt, actions_model, info = self.planner.plan(
                    x_pad, y_pad, mask, self.gp_params, self.bounds,
                    jnp.asarray(state_mu), jnp.asarray(state_var),
                    jnp.asarray(inits), jnp.asarray(self.action_model_previous_iter),
                    self.iter_ctrl, is_dummy=is_dummy,
                )
                actions_mpc_opt = np.asarray(actions_mpc_opt)
            self.actions_mpc_previous_iter = np.asarray(actions_mpc_opt).copy()

            actions_model_np = np.asarray(actions_model)
            actions_raw = denorm_action(actions_model_np, self.action_low, self.action_high)
            next_action_raw = actions_raw[0]
            self.action_model_previous_iter = actions_model_np[0]

            self._record_iter_info(state_mu, state_var, actions_model_np, info)
            self.past_action = np.asarray(next_action_raw)
        else:
            next_action_raw = self.past_action

        self.iter_ctrl += 1
        return np.array(next_action_raw)

    def _make_inits(self) -> np.ndarray:
        """Restart initializations: warm start (shift-left-by-one-action) on
        restart 0 when available, random elsewhere
        (reference gp_mpc_controller.py:125-131, action_init_functions.py:4-10)."""
        restarts = max(1, int(self.config.controller.restarts_optim))
        inits = self._rng.uniform(size=(restarts, self.n_horizon_flat)).astype(self.dtype)
        if self.config.controller.init_from_previous_actions and self.actions_mpc_previous_iter is not None:
            warm = self.actions_mpc_previous_iter.copy()
            warm[: -self.dim_action] = warm[self.dim_action :]
            inits[0] = warm
        return inits

    def _record_iter_info(self, state_mu, state_var, actions_model, info) -> None:
        rewards_traj = np.asarray(info.rewards_traj)
        rewards_var = np.asarray(info.rewards_traj_var)
        states_mu_pred = np.asarray(info.states_mu_pred)
        states_var_pred = np.asarray(info.states_var_pred)
        states_std_pred = np.sqrt(np.maximum(np.diagonal(states_var_pred, axis1=-2, axis2=-1), 0.0))

        reward, reward_var = self._reward_single_host(state_mu, state_var, actions_model[0])
        nrep = self.config.controller.num_repeat_actions
        nh = self.config.controller.len_horizon
        idxs = np.arange(self.iter_ctrl, self.iter_ctrl + nh * nrep, nrep)

        self.iter_info = IterationInformation(
            iteration=self.iter_ctrl,
            state=states_mu_pred[0],
            cost=float(-reward),
            cost_std=float(np.sqrt(max(reward_var, 0.0))),
            mean_predicted_cost=float(np.min([-rewards_traj.mean(), 3])),
            mean_predicted_cost_std=float(np.sqrt(np.maximum(rewards_var, 0.0)).mean()),
            lower_bound_mean_predicted_cost=float(info.mean_reward_ucb),
            predicted_idxs=idxs,
            predicted_states=states_mu_pred,
            predicted_states_std=states_std_pred,
            predicted_actions=actions_model,
            predicted_costs=-rewards_traj,
            predicted_costs_std=np.sqrt(np.maximum(rewards_var, 0.0)),
        )
        self.store_iter_info(self.iter_info)

    def _reward_single_host(self, state_mu, state_var, action_model):
        r, rv = self._reward_jit(jnp.asarray(state_mu), jnp.asarray(state_var), jnp.asarray(action_model))
        return float(r), float(rv)

    @property
    def _reward_jit(self):
        if not hasattr(self, "_reward_jit_fn"):
            spec = self.reward_spec
            self._reward_jit_fn = jax.jit(lambda m, v, a: reward_single(spec, m, v, a))
        return self._reward_jit_fn

    # ------------------------------------------------------------------
    def add_memory(self, obs, action, obs_new, reward, predicted_state=None, predicted_state_std=None):
        """Store a transition; trigger training every training_frequency
        iterations (reference gp_mpc_controller.py:165-199)."""
        state_mu, _ = self.observation_state_mapper.get_state(obs)
        state_mu_new, _ = self.observation_state_mapper.get_state(obs_new)
        action_model = norm_action(action, self.action_low, self.action_high)

        self.memory.add(
            state_mu,
            action_model,
            state_mu_new,
            reward,
            iter_ctrl=self.iter_ctrl - 1,
            predicted_state=None if predicted_state is None else np.asarray(predicted_state),
            predicted_state_std=None if predicted_state_std is None else np.asarray(predicted_state_std),
        )

        if self.iter_ctrl % self.config.training.training_frequency == 0 and self._pending_train is None:
            self.start_training_process()

    def start_training_process(self):
        """Dispatch on-device MLL training asynchronously (replaces the
        reference's spawned process, gp_mpc_controller.py:201-214)."""
        self.memory.prepare_for_model()
        x_pad, y_pad, mask, _ = self.memory.get_padded()
        # iter_ctrl here equals (env step index + 1) at the firing condition
        # (add_memory fires when iter_ctrl % frequency == 0 after get_action
        # incremented it) — the fused path folds in the same (t + 1)
        sub = jax.random.fold_in(self._train_key, self.iter_ctrl)
        args = (self.gp_params, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask), sub)
        if self._train_device is not None:
            args = jax.device_put(args, self._train_device)
        result = self._train_fn(*args)
        self._pending_train = result  # device computation in flight

    def check_and_close_processes(self):
        """Integrate finished training results between planning steps
        (reference gp_mpc_controller.py:216-227). With JAX async dispatch the
        arrays may still be computing; we only block if they are ready or if
        a second training round is due."""
        if self._pending_train is None:
            return
        new_params, losses = self._pending_train
        try:
            ready = all(leaf.is_ready() for leaf in jax.tree_util.tree_leaves(new_params))
        except Exception:
            # No readiness probe on this array type/backend: integrate
            # synchronously and say so, instead of silently claiming the
            # dispatch was async (that would corrupt latency measurements).
            if not getattr(self, "_warned_no_is_ready", False):
                self._warned_no_is_ready = True
                import warnings

                warnings.warn(
                    "jax arrays expose no is_ready(); training results are "
                    "integrated with an explicit block_until_ready (synchronous)."
                )
            jax.block_until_ready(new_params)
            ready = True
        if ready:
            if self._train_device is not None:
                new_params = jax.device_put(new_params, jax.devices()[0])
            self.gp_params = jax.tree_util.tree_map(lambda x: x, new_params)
            self._last_train_losses = np.asarray(losses)
            self._pending_train = None
            if self.config.training.print_train:
                print(f"training done — losses per model: {self._last_train_losses}")

    # ------------------------------------------------------------------
    def compute_cost_unnormalized(self, obs, action, obs_var=None):
        """Cost mean/variance on raw (unnormalized) observation+action
        (reference gp_mpc_controller.py:287-305)."""
        state_mu, state_var = self.observation_state_mapper.get_state(obs, obs_var)
        action_model = norm_action(action, self.action_low, self.action_high)
        reward, reward_var = self._reward_single_host(state_mu, state_var, action_model)
        return -reward, reward_var

    def get_iter_info(self) -> IterationInformation:
        return self.iter_info

    def store_iter_info(self, iter_info: IterationInformation) -> None:
        for key, val in iter_info.__dict__.items():
            self.info_iters.setdefault(key, []).append(copy.deepcopy(val))

    # ------------------------------------------------------------------
    def save_state(self):
        """Controller state snapshot (reference save_state, gp_model.py:308-315 —
        extended to full controller state for real resume)."""
        from ..utils.checkpoint import controller_state_dict

        return controller_state_dict(self)

    def restore_state(self, state) -> None:
        from ..utils.checkpoint import load_controller_state

        load_controller_state(self, state)

    def save_checkpoint(self, path: str) -> str:
        """Persist to disk (.npz) — new capability vs the reference
        (SURVEY.md §5.4: nothing persisted except plots)."""
        from ..utils.checkpoint import save_checkpoint

        return save_checkpoint(self, path)

    def restore_checkpoint(self, path: str) -> None:
        from ..utils.checkpoint import restore_checkpoint

        restore_checkpoint(self, path)

    # ------------------------------------------------------------------
    def get_hyperparameters(self):
        """Constrained (lengthscales, outputscales, noise variances)."""
        from ..models.gp import constrained_params

        ls, os_, nz = constrained_params(self.gp_params, self.bounds)
        return np.asarray(ls), np.asarray(os_), np.asarray(nz)
