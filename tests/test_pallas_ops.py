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


def _cov_problem(rng, p=6, n=128, ns=3, m=3):
    diag = (0, 3, 5)
    a = rng.normal(-2, 0.5, (p, n)).astype(np.float32)
    c = rng.normal(-2, 0.5, (p, n)).astype(np.float32)
    u = rng.normal(0, 0.3, (p, n, ns)).astype(np.float32)
    xj = rng.normal(0, 0.3, (p, n, ns)).astype(np.float32)
    bi = rng.normal(0, 1, (p, n)).astype(np.float32)
    bj = rng.normal(0, 1, (p, n)).astype(np.float32)
    ikh = rng.normal(0, 0.1, (m, n, n))
    ik = ((ikh + ikh.transpose(0, 2, 1)) / 2).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (a, c, u, xj, bi, bj, ik)), diag


def test_cov_core_pallas_interpret_matches_xla(rng):
    """Fused moment-cov kernels (forward AND custom VJP) vs XLA, interpret mode."""
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    from gpmpc_tpu.ops import cov_core_xla
    from gpmpc_tpu.ops import pallas_moment_cov as pmc

    (a, c, u, xj, bi, bj, ik), diag = _cov_problem(rng)
    pmc._make_cov_core.cache_clear()

    s_ref, corr_ref = cov_core_xla(a, c, u, xj, bi, bj, ik, diag)

    def loss(fn, *args):
        s, co = fn(*args, ik, diag)
        return jnp.sum(s * jnp.arange(1.0, 7.0)) + 2.0 * jnp.sum(co * jnp.arange(1.0, 4.0))

    g_ref = jax.grad(lambda *t: loss(lambda *q: cov_core_xla(*q[:-1], q[-1]), *t), argnums=(0, 1, 2, 3, 4, 5))(
        a, c, u, xj, bi, bj, diag
    ) if False else jax.grad(
        lambda aa, cc, uu, xx, b1, b2: loss(cov_core_xla, aa, cc, uu, xx, b1, b2), argnums=(0, 1, 2, 3, 4, 5)
    )(a, c, u, xj, bi, bj)

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        s_pl, corr_pl = pmc.cov_core_pallas(a, c, u, xj, bi, bj, ik, diag)
        g_pl = jax.grad(
            lambda aa, cc, uu, xx, b1, b2: loss(pmc.cov_core_pallas, aa, cc, uu, xx, b1, b2), argnums=(0, 1, 2, 3, 4, 5)
        )(a, c, u, xj, bi, bj)
    pmc._make_cov_core.cache_clear()

    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(corr_pl), np.asarray(corr_ref), rtol=2e-4)
    for x_pl, x_ref in zip(g_pl, g_ref):
        scale = np.max(np.abs(np.asarray(x_ref))) + 1e-6
        np.testing.assert_allclose(np.asarray(x_pl) / scale, np.asarray(x_ref) / scale, atol=2e-4)


def test_cov_core_pallas_interpret_vmap_safe(rng):
    """The fused cov core must survive vmap (line-search candidates batch)."""
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    from gpmpc_tpu.ops import cov_core_xla
    from gpmpc_tpu.ops import pallas_moment_cov as pmc

    (a, c, u, xj, bi, bj, ik), diag = _cov_problem(rng)
    pmc._make_cov_core.cache_clear()
    B = 3
    scales = jnp.asarray(np.linspace(0.5, 1.5, B), jnp.float32)
    a_b = a[None] * scales[:, None, None]

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        s_pl, corr_pl = jax.vmap(lambda aa: pmc.cov_core_pallas(aa, c, u, xj, bi, bj, ik, diag))(a_b)
        g_pl = jax.vmap(
            jax.grad(lambda aa: jnp.sum(pmc.cov_core_pallas(aa, c, u, xj, bi, bj, ik, diag)[0]))
        )(a_b)
    pmc._make_cov_core.cache_clear()

    s_ref, corr_ref = jax.vmap(lambda aa: cov_core_xla(aa, c, u, xj, bi, bj, ik, diag))(a_b)
    g_ref = jax.vmap(jax.grad(lambda aa: jnp.sum(cov_core_xla(aa, c, u, xj, bi, bj, ik, diag)[0])))(a_b)

    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(corr_pl), np.asarray(corr_ref), rtol=2e-4)
    scale = np.max(np.abs(np.asarray(g_ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(g_pl) / scale, np.asarray(g_ref) / scale, atol=2e-4)


def test_cov_core_pallas_interpret_nested_vmap(rng):
    """Two vmap levels (restarts x line-search candidates) over the kernels."""
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    from gpmpc_tpu.ops import cov_core_xla
    from gpmpc_tpu.ops import pallas_moment_cov as pmc

    (a, c, u, xj, bi, bj, ik), diag = _cov_problem(rng, n=64)
    pmc._make_cov_core.cache_clear()
    R, L = 2, 3
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (R, L)), jnp.float32)
    a_b = a[None, None] * scales[:, :, None, None]

    def one(aa):
        s, co = pmc.cov_core_pallas(aa, c, u, xj, bi, bj, ik, diag)
        return jnp.sum(s) + jnp.sum(co)

    def one_ref(aa):
        s, co = cov_core_xla(aa, c, u, xj, bi, bj, ik, diag)
        return jnp.sum(s) + jnp.sum(co)

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        v_pl = jax.vmap(jax.vmap(one))(a_b)
        g_pl = jax.vmap(jax.vmap(jax.grad(one)))(a_b)
    pmc._make_cov_core.cache_clear()
    v_ref = jax.vmap(jax.vmap(one_ref))(a_b)
    g_ref = jax.vmap(jax.vmap(jax.grad(one_ref)))(a_b)

    np.testing.assert_allclose(np.asarray(v_pl), np.asarray(v_ref), rtol=2e-4)
    scale = np.max(np.abs(np.asarray(g_ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(g_pl) / scale, np.asarray(g_ref) / scale, atol=2e-4)
