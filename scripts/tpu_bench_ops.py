"""Reliable on-device op benchmarking.

Wraps N iterations of an op inside ONE jitted fori_loop with an
iteration-dependent input perturbation (defeats CSE/result caching) and a
scalar accumulator dependency chain — one dispatch, one sync; per-iter
time = (total − null-loop) / N. This sidesteps the remote-execution
timing artifacts of the tunneled TPU backend.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def loop_bench_stats(fn, x, iters=20, reps=1):
    """Like loop_bench but with ``reps`` timed (run, null) pairs after a
    single compile+warm-up. Returns a dict with per-rep seconds/iter and
    the median — the repetition/spread record VERDICT r4 item 4 requires
    (single numbers through the tunnel cannot distinguish a real change
    from tunnel noise)."""
    reduce_out = lambda out: sum(
        jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))

    @jax.jit
    def run(x0):
        def body(i, acc):
            xi = x0 + (i.astype(jnp.float32) * 1e-6)
            out = fn(xi)
            return acc + reduce_out(out)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def null(x0):
        first = x0.ravel()[0].astype(jnp.float32)

        def body(i, acc):
            return acc + first + i.astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(x))  # compile + execute once
    float(null(x))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        t_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(null(x))
        t_null = time.perf_counter() - t0
        samples.append(max(t_run - t_null, 0.0) / iters)
    return {"median": float(np.median(samples)),
            "min": float(np.min(samples)), "max": float(np.max(samples)),
            "samples": samples}


def loop_bench(fn, x, iters=20, reduce_out=None):
    """fn: Array -> pytree. Returns seconds per iteration."""
    assert reduce_out is None, "custom reduce_out no longer used"
    return loop_bench_stats(fn, x, iters=iters, reps=1)["median"]


def main():
    from maskplanner_tpu.ops.pallas import ball_query_pallas, fps_pallas
    from maskplanner_tpu.ops import sampling

    B, N, S, K = 64, 5120, 512, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))



    # encoder with pallas kernels active (default on TPU)
    import jax.random as jrandom
    from maskplanner_tpu.models.pointnet2 import PointNet2Encoder

    enc = PointNet2Encoder()
    v = enc.init(jrandom.PRNGKey(0), np.zeros((1, N, 3), np.float32),
                 train=False)
    results = {}
    results["encoder_pallas"] = loop_bench(
        lambda a: enc.apply(v, a, train=False), x, iters=10)
    results["fps_pallas"] = loop_bench(lambda a: fps_pallas(a, S), x)
    results["ballquery_pallas"] = loop_bench(
        lambda a: ball_query_pallas(0.2, K, a, a[:, :S]), x)

    os.environ["MASKPLANNER_NO_PALLAS"] = "1"  # force XLA paths for baseline
    results["encoder_xla"] = loop_bench(
        lambda a: enc.apply(v, a, train=False), x, iters=10)
    results["fps_xla"] = loop_bench(
        lambda a: sampling.farthest_point_sample(a, S), x)
    results["ballquery_xla"] = loop_bench(
        lambda a: sampling.query_ball_point(0.2, K, a, a[:, :S]), x)

    for k, v in results.items():
        print(f"{k}: {v * 1000:.2f} ms")


if __name__ == "__main__":
    main()
