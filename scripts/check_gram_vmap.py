"""Isolate the vmapped Pallas gram kernel on the real TPU.

The fused episode batch (run_episodes_batch) faults on-device at 150-step
episodes (memory cap 150 -> gram pad 256 -> 2x2 col/row tile grid) while
60-step episodes (pad 128, 1x1 tile grid) pass. Under vmap, pallas_call's
batching rule prepends a grid dimension; this script checks the kernel
alone at both shapes to pin whether the 4-D grid is the faulting program.

Usage: python scripts/check_gram_vmap.py [batch] [n ...]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.models.gp import gram_ard_rbf
from gpmpc_tpu.ops.pallas_gram import gram_ard_rbf_pallas


def main():
    args = [int(a) for a in sys.argv[1:]]
    batch = args[0] if args else 16
    ns_list = args[1:] or [128, 150, 256, 300]
    ns, d = 3, 4
    rng = np.random.default_rng(0)
    for n in ns_list:
        ls = jnp.asarray(rng.uniform(0.1, 1.0, (batch, ns, d)), jnp.float32)
        os_ = jnp.asarray(rng.uniform(0.1, 1.0, (batch, ns)), jnp.float32)
        x = jnp.asarray(rng.uniform(0, 1, (batch, n, d)), jnp.float32)
        try:
            out = jax.jit(jax.vmap(gram_ard_rbf_pallas))(ls, os_, x)
            out = jax.block_until_ready(out)
            ref = jax.jit(jax.vmap(gram_ard_rbf))(ls, os_, x)
            err = float(jnp.max(jnp.abs(out[..., :n, :n] - ref)))
            print(f"n={n} batch={batch} ok maxerr={err:.2e}", flush=True)
        except Exception as e:
            print(f"n={n} batch={batch} FAULT {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
