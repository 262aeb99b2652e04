"""Loop-bench the fused Pallas chamfer NN path vs the XLA path on TPU.

Shapes are the containers-v2 training geometry (the worst case the loss
sees: B=64, ~1333 pred segments vs ~1333 GT segments, 24-d each), plus the
reverse point chamfer shape (pred points vs traj_as_pc).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bench_ops import loop_bench


def main():
    import maskplanner_tpu.ops.chamfer as cham

    rng = np.random.default_rng(0)
    B = 64
    cases = {
        "seg_1333x1333x24": ((B, 1333, 24), (B, 1333, 24)),
        "pts_4000x4000x3": ((B, 4000, 3), (B, 4000, 3)),
    }
    for name, (xs, ys) in cases.items():
        x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
        y_np = rng.normal(size=ys).astype(np.float32)
        y_np[:, int(ys[1] * 0.9):] = -100.0
        y = jnp.asarray(y_np)

        def fwd_bwd(a):
            f = lambda xx: cham.chamfer_distance(xx, y, padded=True)[0]
            v, g = jax.value_and_grad(f)(a)
            return v, g

        t_pallas = loop_bench(fwd_bwd, x, iters=10)
        orig = cham._pallas_nn_ok
        cham._pallas_nn_ok = lambda *a: False
        t_xla = loop_bench(fwd_bwd, x, iters=10)
        cham._pallas_nn_ok = orig
        print(f"{name}: pallas {t_pallas*1000:.2f} ms | "
              f"xla {t_xla*1000:.2f} ms | {t_xla/max(t_pallas,1e-9):.2f}x")


if __name__ == "__main__":
    main()
