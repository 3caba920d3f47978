"""NumPy float64 oracle for the GP-MPC math.

An independent, dense (unpadded) implementation of the equations the
framework must reproduce, written directly from the reference's documented
math (SURVEY.md §2 parity-critical list; reference file:line cited per
function). Used to generate golden values for the JAX implementation —
gpytorch is unavailable in this image, so the oracle replays the same
published PILCO/exact-GP formulas in plain numpy with LAPACK solves.
"""

from __future__ import annotations

import numpy as np


def kernel(ls, outputscale, x1, x2):
    """ARD-RBF kernel matrix for one model (reference gp_model.py:391)."""
    diff = (x1[:, None, :] - x2[None, :, :]) / ls[None, None, :]
    return outputscale * np.exp(-0.5 * np.sum(diff**2, axis=-1))


def factorizations(x, y, lengthscales, outputscales, noises):
    """Dense iK/beta (reference calculate_factorizations, gp_model.py:400-431)."""
    ns = y.shape[1]
    n = x.shape[0]
    iK = np.empty((ns, n, n))
    beta = np.empty((ns, n))
    for m in range(ns):
        K = kernel(lengthscales[m], outputscales[m], x, x) + noises[m] * np.eye(n)
        iK[m] = np.linalg.solve(K, np.eye(n))
        beta[m] = np.linalg.solve(K, y[:, m])
    return iK, beta


def moment_match(x_mem, iK, beta, lengthscales, outputscales, input_mu, input_var):
    """One-step PILCO moment matching (reference gp_model.py:112-180).

    Returns (M (Ns,), S (Ns,Ns), V (D,Ns)).
    """
    ns = beta.shape[0]
    n, d = x_mem.shape
    inp = x_mem - input_mu[None, :]

    M = np.empty(ns)
    V = np.empty((ns, d))
    lb_all = np.empty((ns, n))
    iN_all = np.empty((ns, n, d))
    for m in range(ns):
        iL = np.diag(1.0 / lengthscales[m])
        iN = inp @ iL
        B = iL @ input_var @ iL + np.eye(d)
        t = np.linalg.solve(B, iN.T).T
        lb = np.exp(-0.5 * np.sum(iN * t, axis=-1)) * beta[m]
        tiL = t @ iL
        c = outputscales[m] / np.sqrt(np.linalg.det(B))
        M[m] = np.sum(lb) * c
        V[m] = (tiL.T @ lb) * c
        lb_all[m] = lb
        iN_all[m] = iN

    S = np.empty((ns, ns))
    logk = np.log(outputscales)[:, None] - 0.5 * np.sum(iN_all**2, axis=-1)  # (Ns, N)
    diag_corr = np.empty(ns)
    det_R = np.empty((ns, ns))
    for i in range(ns):
        for j in range(ns):
            Rij = input_var @ np.diag(1.0 / lengthscales[i] ** 2 + 1.0 / lengthscales[j] ** 2) + np.eye(d)
            det_R[i, j] = np.linalg.det(Rij)
            Q = np.linalg.solve(Rij, input_var) / 2.0
            Xi = inp / lengthscales[i][None, :] ** 2
            X2j = -inp / lengthscales[j][None, :] ** 2
            Xs = np.sum((Xi @ Q) * Xi, axis=-1)
            X2s = np.sum((X2j @ Q) * X2j, axis=-1)
            maha = -2.0 * (Xi @ Q) @ X2j.T + Xs[:, None] + X2s[None, :]
            L = np.exp(logk[i][:, None] + logk[j][None, :] + maha)
            S[i, j] = beta[i] @ L @ beta[j]
            if i == j:
                diag_corr[i] = np.sum(iK[i] * L)
    S = S - np.diag(diag_corr)
    S = S / np.sqrt(det_R)
    S = S + np.diag(outputscales)
    S = S - M[:, None] * M[None, :]
    return M, S, V.T


def predict_trajectory(
    x_mem, iK, beta, lengthscales, outputscales, actions, state_mu, state_var,
    current_time_idx=0, include_time_model=False,
):
    """Horizon rollout (reference gp_model.py:60-110)."""
    nh = actions.shape[0]
    ns = state_mu.shape[0]
    d = x_mem.shape[1]
    mus = np.empty((nh + 1, ns))
    vars_ = np.empty((nh + 1, ns, ns))
    mus[0] = state_mu
    vars_[0] = state_var
    for t in range(1, nh + 1):
        input_var = np.zeros((d, d))
        input_var[:ns, :ns] = vars_[t - 1]
        parts = [mus[t - 1], actions[t - 1]]
        if include_time_model:
            parts.append(np.array([current_time_idx + t - 1]))
        input_mu = np.concatenate(parts)
        M, S, V = moment_match(x_mem, iK, beta, lengthscales, outputscales, input_mu, input_var)
        mus[t] = mus[t - 1] + M
        vars_[t] = S + vars_[t - 1] + input_var[:ns] @ V + V.T @ input_var[:ns].T
    return mus, vars_


def reward(state_mu, state_var, action, target_sa, W, use_constraints=False, state_min=None, state_max=None):
    """Stage reward (reference setpoint_distance_reward_mapper.py:12-68)."""
    ns = len(state_mu)
    na = len(action)
    error = np.concatenate([state_mu, action]) - target_sa
    sa_var = np.zeros((ns + na, ns + na))
    sa_var[:ns, :ns] = state_var
    cost_mu = np.trace(sa_var @ W) + error @ W @ error
    TS = W @ sa_var
    cost_var = 2.0 * np.trace(TS @ TS) + 4.0 * error @ TS @ W @ error
    if use_constraints:
        from scipy.special import erf

        sig = np.diag(state_var)
        cdf_min = 0.5 * (1 + erf((state_min - state_mu) / (sig * np.sqrt(2))))
        cdf_max = 0.5 * (1 + erf((state_max - state_mu) / (sig * np.sqrt(2))))
        # the live reference path adds penalties un-multiplied
        # (setpoint_distance_reward_mapper.py:66)
        cost_mu = cost_mu + np.sum(cdf_min) + np.sum(1 - cdf_max)
    return -cost_mu, cost_var


def reward_terminal(state_mu, state_var, target_s, W_term):
    """Terminal reward (reference setpoint_distance_reward_mapper.py:124-142)."""
    error = state_mu - target_s
    cost_mu = np.trace(state_var @ W_term) + error @ W_term @ error
    TS = W_term @ state_var
    cost_var = 2.0 * np.trace(TS @ TS) + 4.0 * error @ TS @ W_term @ error
    return -cost_mu, cost_var


def negative_mll(x, y_col, ls, outputscale, noise):
    """GPyTorch-convention per-model loss (reference gp_model.py:226-229)."""
    n = x.shape[0]
    K = kernel(ls, outputscale, x, x) + noise * np.eye(n)
    sign, logdet = np.linalg.slogdet(K)
    alpha = np.linalg.solve(K, y_col)
    return 0.5 * (y_col @ alpha + logdet + n * np.log(2 * np.pi)) / n
