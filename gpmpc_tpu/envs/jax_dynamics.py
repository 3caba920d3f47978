"""Pure-JAX environment dynamics for fully on-device episodes.

These mirror the numpy envs in this package (pendulum.py, mountain_car.py,
process_control.py) as jit-compatible pure functions so the ENTIRE
online-learning control loop — planning, memory updates, hyperparameter
training, and the environment itself — can run as one lax.scan on the TPU
and be vmapped over seeds (the TPU-native run_env_multiple; the reference
loops episodes on the host, run_env_function.py:52-72).

Each env is a JaxEnvSpec: init_fn(key) -> env_state,
step_fn(env_state, action_raw, key) -> (env_state, obs, reward).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class JaxEnvSpec(NamedTuple):
    name: str
    obs_low: np.ndarray
    obs_high: np.ndarray
    act_low: np.ndarray
    act_high: np.ndarray
    init_fn: Callable  # key -> (env_state, obs)
    step_fn: Callable  # (env_state, action_raw, key) -> (env_state, obs, reward)


def _angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def pendulum_spec(dtype=jnp.float64) -> JaxEnvSpec:
    max_speed, max_torque, dt, g, m, l = 8.0, 2.0, 0.05, 10.0, 1.0, 1.0

    def init_fn(key):
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(k1, (), dtype, -jnp.pi, jnp.pi)
        thdot = jax.random.uniform(k2, (), dtype, -1.0, 1.0)
        state = jnp.stack([th, thdot])
        return state, _obs(state)

    def _obs(state):
        th, thdot = state[0], state[1]
        return jnp.stack([jnp.cos(th), jnp.sin(th), thdot])

    def step_fn(state, action_raw, key):
        th, thdot = state[0], state[1]
        u = jnp.clip(action_raw[0], -max_torque, max_torque)
        cost = _angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (-3 * g / (2 * l) * jnp.sin(th + jnp.pi) + 3.0 / (m * l**2) * u) * dt
        newth = th + newthdot * dt
        newthdot = jnp.clip(newthdot, -max_speed, max_speed)
        new_state = jnp.stack([newth, newthdot])
        return new_state, _obs(new_state), -cost

    return JaxEnvSpec(
        name="Pendulum-v0",
        obs_low=np.array([-1.0, -1.0, -max_speed]),
        obs_high=np.array([1.0, 1.0, max_speed]),
        act_low=np.array([-max_torque]),
        act_high=np.array([max_torque]),
        init_fn=init_fn,
        step_fn=step_fn,
    )


def mountain_car_spec(dtype=jnp.float64) -> JaxEnvSpec:
    min_pos, max_pos, max_speed, goal, power = -1.2, 0.6, 0.07, 0.45, 0.0015

    def init_fn(key):
        pos = jax.random.uniform(key, (), dtype, -0.6, -0.4)
        state = jnp.stack([pos, jnp.zeros((), dtype)])
        return state, state

    def step_fn(state, action_raw, key):
        pos, vel = state[0], state[1]
        force = jnp.clip(action_raw[0], -1.0, 1.0)
        vel = jnp.clip(vel + force * power - 0.0025 * jnp.cos(3 * pos), -max_speed, max_speed)
        new_pos = jnp.clip(pos + vel, min_pos, max_pos)
        vel = jnp.where((new_pos == min_pos) & (vel < 0), 0.0, vel)
        done = new_pos >= goal
        reward = jnp.where(done, 100.0, 0.0) - 0.1 * force**2
        new_state = jnp.stack([new_pos, vel])
        return new_state, new_state, reward

    return JaxEnvSpec(
        name="MountainCarContinuous-v0",
        obs_low=np.array([min_pos, -max_speed]),
        obs_high=np.array([max_pos, max_speed]),
        act_low=np.array([-1.0]),
        act_high=np.array([1.0]),
        init_fn=init_fn,
        step_fn=step_fn,
    )


def process_control_spec(
    dt=1.0,
    s_range=(20, 30),
    fi_range=(0.15, 0.3),
    ci_range=(0.15, 0.2),
    cr_range=(0.8, 1.0),
    noise_l_prop_range=(5e-3, 1e-2),
    noise_co_prop_range=(5e-3, 1e-2),
    sp_l_range=(0.4, 0.6),
    sp_co_range=(0.4, 0.6),
    change_params=False,
    period_change=200,
    dtype=jnp.float64,
) -> JaxEnvSpec:
    """Tank process env as pure dynamics. env_state is a dict carrying the
    physical state (v, r), the step counter, and the (re)drawable params —
    with change_params, params are re-randomized every period_change steps
    inside the scan (reference process_control.py:93-95)."""

    obs_low = np.array([0.0, 0.0])
    obs_high = np.array([10.0, 1.0])

    def _draw_params(key):
        ks = jax.random.split(key, 8)
        u = lambda k, lo, hi: jax.random.uniform(k, (), dtype, lo, hi)
        return {
            "s": u(ks[0], *s_range),
            "fi": u(ks[1], *fi_range),
            "ci": u(ks[2], *ci_range),
            "cr": u(ks[3], *cr_range),
            "noise_l": jnp.exp(u(ks[4], jnp.log(noise_l_prop_range[0]), jnp.log(noise_l_prop_range[1]))),
            "noise_co": jnp.exp(u(ks[5], jnp.log(noise_co_prop_range[0]), jnp.log(noise_co_prop_range[1]))),
            "sp_l": u(ks[6], *sp_l_range),
            "sp_co": u(ks[7], *sp_co_range),
        }

    def _obs(env_state, key):
        p = env_state["params"]
        l_mes = env_state["v"] / p["s"] + jax.random.normal(key, (), dtype) * p["noise_l"] * obs_high[0]
        k2 = jax.random.fold_in(key, 1)
        co_mes = env_state["r"] / (env_state["v"] + 1e-6) + jax.random.normal(k2, (), dtype) * p["noise_co"] * obs_high[1]
        return jnp.stack([
            jnp.clip(l_mes, obs_low[0], obs_high[0]),
            jnp.clip(co_mes, obs_low[1], obs_high[1]),
        ])

    def init_fn(key):
        kp, ko, ks = jax.random.split(key, 3)
        params = _draw_params(kp)
        frac = jax.random.uniform(ks, (2,), dtype, 0.3, 0.7)
        v = frac[0] * obs_high[0] * params["s"]
        r = frac[1] * obs_high[1] * v
        env_state = {"v": v, "r": r, "iter": jnp.zeros((), jnp.int32), "params": params}
        return env_state, _obs(env_state, ko)

    def step_fn(env_state, action_raw, key):
        p = env_state["params"]
        v, r = env_state["v"], env_state["r"]
        dv = p["fi"] + action_raw[1] - action_raw[0]
        dr = p["fi"] * p["ci"] + action_raw[1] * p["cr"] - action_raw[0] * r / (v + 1e-3)
        v = v + dv * dt
        r = r + dr * dt
        it = env_state["iter"] + 1
        v = jnp.clip(v, obs_low[0] * p["s"], obs_high[0] * p["s"])
        r = jnp.clip(r, obs_low[1] * v, obs_high[1] * v)
        reward = -((v / p["s"] - p["sp_l"]) ** 2 + (r / (v + 1e-6) - p["sp_co"]) ** 2)

        if change_params:
            kd, kn = jax.random.split(jax.random.fold_in(key, 2))
            new_p = _draw_params(kd)
            redraw = (it % period_change) == 0
            p2 = jax.tree_util.tree_map(lambda new, old: jnp.where(redraw, new, old), new_p, p)
            # clip v to 90% of new tank capacity on param change
            v_clipped = jnp.clip(v, 0.0, 0.9 * p2["s"] * obs_high[0])
            r = jnp.where(redraw & (v > 0), r * v_clipped / v, r)
            v = jnp.where(redraw, v_clipped, v)
            p = p2

        new_state = {"v": v, "r": r, "iter": it, "params": p}
        return new_state, _obs(new_state, jax.random.fold_in(key, 3)), reward

    return JaxEnvSpec(
        name="processcontrol",
        obs_low=obs_low,
        obs_high=obs_high,
        act_low=np.array([0.0, 0.0]),
        act_high=np.array([1.0, 1.0]),
        init_fn=init_fn,
        step_fn=step_fn,
    )
