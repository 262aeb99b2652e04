"""Fused-SA kernel: TPU parity check + loop-bench vs the unfused eval path."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jrandom

from tpu_bench_ops import loop_bench


def main():
    from maskplanner_tpu.models import pointnet2 as p2

    B, N = 64, 5120
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    sa1 = p2.SetAbstraction(512, 0.2, 32, (64, 64, 128))
    sa2 = p2.SetAbstraction(128, 0.4, 64, (128, 128, 256))

    v1 = sa1.init(jrandom.PRNGKey(0), x[:1], None, True)
    # sa1 has no input features, so the whole-level fused kernel never
    # applies to it (models/pointnet2.py:112-115 requires features) —
    # only sa2 has a fused/unfused comparison. sa1 runs once for input.
    p2._use_fused_sa_orig = p2._use_fused_sa
    rx, rf = sa1.apply(v1, x, None, False)

    x1, f1 = rx, rf
    v2 = sa2.init(jrandom.PRNGKey(0), x1[:1], f1[:1], True)
    p2._use_fused_sa = lambda: False
    _, rf2 = sa2.apply(v2, x1, f1, False)
    p2._use_fused_sa = p2._use_fused_sa_orig
    _, gf2 = sa2.apply(v2, x1, f1, False)
    err2 = float(jnp.max(jnp.abs(rf2 - gf2)))
    print(f"sa2 parity: max|diff|={err2:.3e} (scale "
          f"{float(jnp.max(jnp.abs(rf2))):.3e})")

    results = {}
    results["sa1 (always unfused: no input features)"] = loop_bench(
        lambda a: sa1.apply(v1, a, None, False), x, iters=10)
    results["sa2_fused"] = loop_bench(
        lambda a: sa2.apply(v2, x1, a, False), f1, iters=10)

    p2._use_fused_sa = lambda: False
    results["sa2_unfused"] = loop_bench(
        lambda a: sa2.apply(v2, x1, a, False), f1, iters=10)

    for k, val in results.items():
        print(f"{k}: {val * 1000:.2f} ms")


if __name__ == "__main__":
    main()
