"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import numpy as np
import pytest

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@requires_8
def test_dryrun_training_step_8_devices():
    from gpmpc_tpu.parallel.sharding import dryrun_training_step

    dryrun_training_step(8)


@requires_8
def test_dryrun_training_step_2_devices():
    from gpmpc_tpu.parallel.sharding import dryrun_training_step

    dryrun_training_step(2)


@requires_8
def test_graft_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    cost = out[0]
    assert np.isfinite(float(cost))

    ge.dryrun_multichip(8)
