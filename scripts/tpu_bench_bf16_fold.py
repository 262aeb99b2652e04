"""Experiment: sa1/sa2 eval-mode variants to find the winning bf16 path.

Variants per level:
  f32        — current unfused eval (Dense f32 + BN f32)
  bf16       — current unfused eval (Dense bf16 + BN f32): casts churn
  bf16-fold  — BN folded into Dense (eval-only), whole MLP in bf16
  f32-fold   — BN folded, f32 compute (isolates fold vs dtype effects)
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


def fold_params(variables, n_layers):
    """Fold eval-mode BN (scale/shift with running stats) into Dense."""
    p = variables["params"]
    bs = variables["batch_stats"]
    layers = []
    for li in range(n_layers):
        k = np.asarray(p[f"Dense_{li}"]["kernel"], np.float64)
        b = np.asarray(p[f"Dense_{li}"]["bias"], np.float64)
        bn = p[f"BatchNorm_{li}"]
        mean = np.asarray(bs[f"BatchNorm_{li}"]["mean"], np.float64)
        var = np.asarray(bs[f"BatchNorm_{li}"]["var"], np.float64)
        g = np.asarray(bn["scale"], np.float64)
        beta = np.asarray(bn["bias"], np.float64)
        s = g / np.sqrt(var + 1e-5)
        layers.append((jnp.asarray((k * s).astype(np.float32)),
                       jnp.asarray(((b - mean) * s + beta).astype(np.float32))))
    return layers


def run_level(name, npoint, radius, K, mlp_ch, x, feats):
    from maskplanner_tpu.models.pointnet2 import SetAbstraction
    from maskplanner_tpu.ops.sampling import farthest_point_sample, index_points
    from maskplanner_tpu.ops.pallas.group_gather import ball_group_pallas

    res = {}
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        sa = SetAbstraction(npoint, radius, K, mlp_ch, dtype=dtype)
        v = sa.init(jrandom.PRNGKey(0), x[:1],
                    None if feats is None else feats[:1], False)
        res[tag] = loop_bench(
            lambda a: sa.apply(v, a, feats, False), x, iters=10)

    # folded variants: FPS + fused gather + plain Dense/relu chain
    sa_f32 = SetAbstraction(npoint, radius, K, mlp_ch, dtype=jnp.float32)
    v = sa_f32.init(jrandom.PRNGKey(0), x[:1],
                    None if feats is None else feats[:1], False)
    mlp_vars = {"params": v["params"]["PointMLP_0"],
                "batch_stats": v["batch_stats"]["PointMLP_0"]}
    folded = fold_params(mlp_vars, len(mlp_ch))

    def folded_level(a, dtype):
        fps_idx = farthest_point_sample(a, npoint)
        new_xyz = index_points(a, fps_idx)
        grouped, _ = ball_group_pallas(radius, K, a, new_xyz, feats)
        h = grouped.astype(dtype)
        for kern, bias in folded:
            h = jnp.maximum(
                jnp.matmul(h, kern.astype(dtype),
                           preferred_element_type=dtype)
                + bias.astype(dtype), 0)
        return jnp.max(h.astype(jnp.float32), axis=-2)

    res["f32-fold"] = loop_bench(
        lambda a: folded_level(a, jnp.float32), x, iters=10)
    res["bf16-fold"] = loop_bench(
        lambda a: folded_level(a, jnp.bfloat16), x, iters=10)

    print(f"{name}: " + "  ".join(f"{k}={v*1000:6.2f}ms"
                                  for k, v in res.items()), flush=True)


def main():
    B, N = 64, 5120
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    run_level("sa1", 512, 0.2, 32, (64, 64, 128), x, None)

    from maskplanner_tpu.models.pointnet2 import SetAbstraction
    sa1 = SetAbstraction(512, 0.2, 32, (64, 64, 128))
    v1 = sa1.init(jrandom.PRNGKey(0), x[:1], None, False)
    x1, f1 = jax.jit(lambda a: sa1.apply(v1, a, None, False))(x)
    x1, f1 = jax.block_until_ready((x1, f1))
    run_level("sa2", 128, 0.4, 64, (128, 128, 256), x1, f1)


if __name__ == "__main__":
    main()
