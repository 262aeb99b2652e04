"""Per-stage f32 vs bf16 eval breakdown on the real TPU.

Locates where the bf16 inference path loses time vs f32 (round-2 finding:
whole-model bf16 eval was ~8% SLOWER than f32 despite being HBM-bound).
Measures each SA level and the head trunk separately in both dtypes.
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


def bench_dtype(dtype, B=64, N=5120):
    from maskplanner_tpu.models.pointnet2 import SetAbstraction

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    sa1 = SetAbstraction(512, 0.2, 32, (64, 64, 128), dtype=dtype)
    sa2 = SetAbstraction(128, 0.4, 64, (128, 128, 256), dtype=dtype)
    sa3 = SetAbstraction(None, None, None, (256, 512, 1024), group_all=True,
                         dtype=dtype)

    v1 = sa1.init(jrandom.PRNGKey(0), x[:1], None, False)
    x1, f1 = jax.jit(lambda a: sa1.apply(v1, a, None, False))(x)
    v2 = sa2.init(jrandom.PRNGKey(0), x1[:1], f1[:1], False)
    x2, f2 = jax.jit(lambda a, b: sa2.apply(v2, a, b, False))(x1, f1)
    v3 = sa3.init(jrandom.PRNGKey(0), x2[:1], f2[:1], False)

    out = {}
    out["sa1"] = loop_bench(lambda a: sa1.apply(v1, a, None, False), x,
                            iters=10)
    out["sa2"] = loop_bench(lambda a: sa2.apply(v2, x1, a, False), f1,
                            iters=10)
    out["sa3"] = loop_bench(lambda a: sa3.apply(v3, x2, a, False), f2,
                            iters=10)

    # head trunk: fc1/fc2 (1024x1024) + the three output heads at
    # windows_v2 sizes (out_vectors=450, lam=4, masks=22)
    from maskplanner_tpu.models.pointnet2 import RegressionHead
    import flax.linen as nn

    class Heads(nn.Module):
        dtype: jnp.dtype = jnp.float32

        @nn.compact
        def __call__(self, g):
            h = RegressionHead(dtype=self.dtype)(g, train=False)
            traj = nn.Dense(450 * 4 * 3, dtype=self.dtype)(h)
            orient = nn.Dense(450 * 4 * 3, dtype=self.dtype)(h)
            hm = RegressionHead(dtype=self.dtype)(g, train=False)
            masks = nn.Dense(450 * 22, dtype=self.dtype)(hm)
            conf = nn.Dense(22, dtype=self.dtype)(hm)
            return traj, orient, masks, conf

    heads = Heads(dtype=dtype)
    g = f2.reshape(B, -1)[:, :1024]
    vh = heads.init(jrandom.PRNGKey(0), g[:1])
    out["heads"] = loop_bench(lambda a: heads.apply(vh, a), g, iters=10)
    return out


def main():
    for dtype, tag in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16")):
        r = bench_dtype(dtype)
        tot = sum(r.values())
        parts = "  ".join(f"{k}={v*1000:7.2f}ms" for k, v in r.items())
        print(f"{tag}: {parts}  total={tot*1000:7.2f}ms")


if __name__ == "__main__":
    main()
