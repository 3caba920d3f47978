"""Pallas TPU kernel: batched ARD-RBF Gram matrix.

The Gram construction K[m] = outputscale_m * exp(-0.5 * ||(x_i - x_j)/ls_m||^2)
is the memory-heaviest op of the factorization path (reference equivalent:
gpytorch kernel eval inside calculate_factorizations, gp_model.py:425). This
kernel fuses the per-model lengthscale pre-scale, the squared-distance
cross-term (on the MXU), and the exp into one VMEM-resident pass per
(model, row-tile, col-tile) grid cell — inputs stream to VMEM once and the
exp never round-trips to HBM.

f32 only (the TPU fast path). The f64 parity path uses the XLA implementation
models/gp.py:gram_ard_rbf; ops.gram() selects by dtype, and the two agree to
f32 tolerance (tests/test_pallas_ops.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def gram_ard_rbf_pallas(lengthscales: jnp.ndarray, outputscales: jnp.ndarray, x: jnp.ndarray, tile: int = 128):
    """Batched ARD-RBF Gram via Pallas.

    Shapes: lengthscales (Ns, D), outputscales (Ns,), x (N, D).
    Returns (Ns, N, N) float32. N is padded to the tile internally.
    """
    ns, d = lengthscales.shape
    n = x.shape[0]
    n_pad = _round_up(max(n, tile), tile)

    x32 = x.astype(jnp.float32)
    ls32 = lengthscales.astype(jnp.float32)
    xs = jnp.zeros((ns, n_pad, d), dtype=jnp.float32)
    xs = xs.at[:, :n, :].set(x32[None, :, :] / ls32[:, None, :])
    outs32 = outputscales.astype(jnp.float32).reshape(ns, 1)

    grid = (ns, n_pad // tile, n_pad // tile)

    def kernel(scale_ref, rows_ref, cols_ref, out_ref):
        # vmap-safety: no pl.program_id (vmap prepends a grid dim and
        # renumbers ids) — the per-model scale arrives as its own block.
        xi = rows_ref[0]  # (tile, D)
        xj = cols_ref[0]  # (tile, D)
        sq_i = jnp.sum(xi * xi, axis=-1, keepdims=True)  # (tile, 1)
        sq_j = jnp.sum(xj * xj, axis=-1, keepdims=True)  # (tile, 1)
        cross = jnp.dot(xi, xj.T, preferred_element_type=jnp.float32)  # MXU
        d2 = jnp.maximum(sq_i + sq_j.T - 2.0 * cross, 0.0)
        out_ref[0] = scale_ref[0, 0, 0] * jnp.exp(-0.5 * d2)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda m, i, j: (m, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda m, i, j: (m, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda m, i, j: (m, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, tile), lambda m, i, j: (m, i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, n_pad, n_pad), jnp.float32),
    )(outs32.reshape(ns, 1, 1), xs, xs)[:, :n, :n]
