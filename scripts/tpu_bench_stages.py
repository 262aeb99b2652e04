"""Per-stage encoder breakdown on the real TPU (loop-bench harness).

Measures sa1/sa2/sa3 separately in eval mode at the flagship inference
shape to locate remaining HBM-bound stages.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jrandom
import numpy as np

from tpu_bench_ops import loop_bench


def main():
    from maskplanner_tpu.models.pointnet2 import SetAbstraction

    B, N = 64, 5120
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    sa1 = SetAbstraction(512, 0.2, 32, (64, 64, 128))
    sa2 = SetAbstraction(128, 0.4, 64, (128, 128, 256))
    sa3 = SetAbstraction(None, None, None, (256, 512, 1024), group_all=True)

    v1 = sa1.init(jrandom.PRNGKey(0), x[:1], None, False)
    x1, f1 = sa1.apply(v1, x, None, False)
    v2 = sa2.init(jrandom.PRNGKey(0), x1[:1], f1[:1], False)
    x2, f2 = sa2.apply(v2, x1, f1, False)
    v3 = sa3.init(jrandom.PRNGKey(0), x2[:1], f2[:1], False)

    results = {}
    results["sa1"] = loop_bench(lambda a: sa1.apply(v1, a, None, False), x,
                                iters=10)
    results["sa2"] = loop_bench(lambda a: sa2.apply(v2, a, f1, False), x1,
                                iters=10)
    results["sa2_feat_perturbed"] = loop_bench(
        lambda a: sa2.apply(v2, x1, a, False), f1, iters=10)
    results["sa3"] = loop_bench(lambda a: sa3.apply(v3, x2, a, False), f2,
                                iters=10)

    for k, val in results.items():
        print(f"{k}: {val * 1000:.2f} ms")


if __name__ == "__main__":
    main()
