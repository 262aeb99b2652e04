"""Per-stage train-mode fwd+bwd breakdown (loop-bench harness).

Times sa1/sa2/sa3 and the head stack separately, each in train mode with
gradients, to locate where the 38 ms model fwd+bwd at batch 64 goes.
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


def gsum(g):
    return jax.tree_util.tree_reduce(
        lambda s, x: s + jnp.sum(jnp.abs(x)), g, 0.0)


def main():
    import argparse

    from maskplanner_tpu.models.pointnet2 import SetAbstraction

    ap = argparse.ArgumentParser()
    ap.add_argument("--norm", default="batch")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    kw = dict(dtype=dtype, norm=args.norm)

    B, N = 64, 5120
    rng = np.random.default_rng(0)
    key = jrandom.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    sa1 = SetAbstraction(512, 0.2, 32, (64, 64, 128), **kw)
    sa2 = SetAbstraction(128, 0.4, 64, (128, 128, 256), **kw)
    sa3 = SetAbstraction(None, None, None, (256, 512, 1024), group_all=True,
                         **kw)
    print(f"norm={args.norm} dtype={dtype.__name__}")

    v1 = sa1.init({"params": key, "fps": key}, x[:1], None, True)
    x1, f1 = sa1.apply(v1, x, None, False)
    v2 = sa2.init({"params": key, "fps": key}, x1[:1], f1[:1], True)
    x2, f2 = sa2.apply(v2, x1, f1, False)
    v3 = sa3.init({"params": key}, x2[:1], f2[:1], True)

    def stage_fb(mod, vars_, has_fps=True):
        def run(a, f):
            def lf(params):
                vv = {"params": params,
                      "batch_stats": vars_.get("batch_stats", {})}
                rngs = {"fps": key} if has_fps else {}
                (xo, fo), _ = mod.apply(vv, a, f, True,
                                        mutable=["batch_stats"], rngs=rngs)
                return jnp.sum(xo) + jnp.sum(fo)
            return gsum(jax.grad(lf)(vars_["params"]))
        return run

    r1 = stage_fb(sa1, v1)
    print(f"sa1 fwd+bwd: {loop_bench(lambda a: r1(a, None), x, iters=10)*1000:.2f} ms")
    r2 = stage_fb(sa2, v2)
    print(f"sa2 fwd+bwd: {loop_bench(lambda a: r2(a, f1), x1, iters=10)*1000:.2f} ms")
    r3 = stage_fb(sa3, v3, has_fps=False)
    print(f"sa3 fwd+bwd: {loop_bench(lambda a: r3(a, f2), x2, iters=10)*1000:.2f} ms")

    # forward-only for contrast
    def fwd_only(mod, vars_, has_fps=True):
        def run(a, f):
            rngs = {"fps": key} if has_fps else {}
            (xo, fo), _ = mod.apply(vars_, a, f, True,
                                    mutable=["batch_stats"], rngs=rngs)
            return jnp.sum(xo) + jnp.sum(fo)
        return run

    f1o = fwd_only(sa1, v1)
    print(f"sa1 fwd: {loop_bench(lambda a: f1o(a, None), x, iters=10)*1000:.2f} ms")
    f2o = fwd_only(sa2, v2)
    print(f"sa2 fwd: {loop_bench(lambda a: f2o(a, f1), x1, iters=10)*1000:.2f} ms")
    f3o = fwd_only(sa3, v3, has_fps=False)
    print(f"sa3 fwd: {loop_bench(lambda a: f3o(a, f2), x2, iters=10)*1000:.2f} ms")


if __name__ == "__main__":
    main()
