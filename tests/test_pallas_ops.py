"""Pallas kernel vs XLA fallback agreement (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.models.gp import gram_ard_rbf


def test_gram_pallas_interpret_matches_xla(rng):
    from jax.experimental import pallas as pl

    # run the pallas kernel in interpreter mode on CPU
    from gpmpc_tpu.ops import pallas_gram

    ns, d, n = 3, 4, 100
    ls = rng.uniform(0.3, 2.0, (ns, d)).astype(np.float32)
    outs = rng.uniform(0.02, 0.4, (ns,)).astype(np.float32)
    x = rng.uniform(0, 1, (n, d)).astype(np.float32)

    ref = np.asarray(gram_ard_rbf(jnp.asarray(ls), jnp.asarray(outs), jnp.asarray(x)))

    import functools
    from unittest import mock

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        out = np.asarray(pallas_gram.gram_ard_rbf_pallas(jnp.asarray(ls), jnp.asarray(outs), jnp.asarray(x)))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_gram_dispatcher_cpu_uses_xla(rng):
    from gpmpc_tpu.ops import gram

    ns, d, n = 2, 3, 16
    ls = jnp.asarray(rng.uniform(0.3, 2.0, (ns, d)))
    outs = jnp.asarray(rng.uniform(0.02, 0.4, (ns,)))
    x = jnp.asarray(rng.uniform(0, 1, (n, d)))
    out = gram(ls, outs, x)
    ref = gram_ard_rbf(ls, outs, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)
