"""TPU op library: Pallas kernels for the hot compute path with XLA fallbacks.

``gram`` dispatches to the Pallas ARD-RBF Gram kernel in the f32 fast path
(TPU backend only) and to the pure-XLA batched implementation otherwise
(f64 parity mode, CPU tests, interpret mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram(lengthscales, outputscales, x, use_pallas: bool | None = None):
    from ..models.gp import gram_ard_rbf

    if use_pallas is None:
        use_pallas = (
            x.dtype == jnp.float32
            and jax.default_backend() not in ("cpu",)
        )
    if use_pallas:
        from .pallas_gram import gram_ard_rbf_pallas

        return gram_ard_rbf_pallas(lengthscales, outputscales, x)
    return gram_ard_rbf(lengthscales, outputscales, x)


__all__ = ["gram"]
