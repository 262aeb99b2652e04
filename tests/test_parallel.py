"""Multi-chip sharding validation (virtual 8-device CPU mesh).

Runs in a sanitized subprocess (see conftest) because the container's TPU
plugin breaks in-process virtual device forcing.
"""
import pytest


@pytest.mark.slow
class TestMultichip:
    def test_dryrun_8_devices(self, clean_subprocess):
        # ~440s alone on this 1-core box; leave headroom for a
        # contended core (the default 560s flaked under parallel jobs).
        # flagship=False: the full batch-64 flagship-shape parity takes
        # ~25 min on this CPU — the driver runs it once per round via
        # dryrun_multichip(8); the suite covers the same code path at
        # reduced size below.
        out = clean_subprocess(
            "import __graft_entry__ as g; g.dryrun_multichip(8, "
            "flagship=False)",
            n_devices=8, timeout=1500)
        assert "OK" in out

    def test_flagship_parity_reduced(self, clean_subprocess):
        """The flagship-shape per-step DP parity harness (loss rtol 1e-4,
        grad-norm ratio, NN-match flip fraction) at reduced batch — same
        windows_v2 tensor shapes (pc=5120, out_vectors=450, masks=22),
        smaller batch so the suite stays tractable on one core."""
        code = """
import os
os.environ['MASKPLANNER_DETERMINISTIC_NN'] = '1'
import __graft_entry__ as g
rep = g._flagship_parity(8, n_steps=1, global_batch=16)
print('FLAGSHIP-LITE OK', rep)
"""
        out = clean_subprocess(code, n_devices=8, timeout=1800)
        assert "FLAGSHIP-LITE OK" in out

    def test_multihost_loader_and_global_batch(self, clean_subprocess):
        """Host-sharded DataLoader slices are disjoint, cover the global
        permutation, and shard_batch_global reconstructs the same global
        batch a single host would build (single-process degenerate case)."""
        code = """
import numpy as np, jax
from maskplanner_tpu.utils.args import load_args
from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
from maskplanner_tpu.parallel import make_mesh
from maskplanner_tpu.parallel.mesh import (shard_batch_global, shard_batch,
                                           host_shard_bounds)

cfg = load_args(argv=['config=[maskplanner,cuboids_v2,longx_v2,debug]',
                      'pc_points=64', 'n_pred_traj_points=80', 'batch_size=8'])
ds = PaintDataset(cfg, split='train', size=16)

# 2-shard loaders reconstruct the 1-shard global batch
full = next(iter(DataLoader(ds, 8, shuffle=True, seed=3)))
parts = [next(iter(DataLoader(ds, 8, shuffle=True, seed=3,
                              num_shards=2, shard_index=i)))
         for i in range(2)]
rebuilt = {k: np.concatenate([p[k] for p in parts]) for k in full}
for k in full:
    np.testing.assert_array_equal(full[k], rebuilt[k])

# single-process global assembly == plain shard_batch
mesh = make_mesh(4)
a = shard_batch(full, mesh)
b = shard_batch_global(full, mesh)
for k in a:
    np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

s, e = host_shard_bounds(10, process_index=0, process_count=1)
assert (s, e) == (0, 10)
s, e = host_shard_bounds(10, process_index=2, process_count=3)
assert (s, e) == (6, 9)
print('MULTIHOST OK')
"""
        out = clean_subprocess(code, n_devices=4)
        assert "MULTIHOST OK" in out

    def test_data_parallel_matches_single_device(self, clean_subprocess):
        """Gradient all-reduce over the mesh must equal the single-device
        result (same global batch)."""
        code = """
import numpy as np, jax, jax.numpy as jnp
from maskplanner_tpu.utils.args import load_args
from maskplanner_tpu.models import get_model
from maskplanner_tpu.losses import LossHandler
from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
from maskplanner_tpu.parallel import make_mesh, shard_batch, replicate
from maskplanner_tpu.train import create_train_state, make_train_step

cfg = load_args(argv=['config=[maskplanner,cuboids_v2,longx_v2,debug]',
                      'pc_points=64', 'n_pred_traj_points=80', 'batch_size=4'])
ds = PaintDataset(cfg, split='train', size=4)
batch = next(iter(DataLoader(ds, 4, shuffle=False)))
model = get_model(cfg)
handler = LossHandler(cfg.loss, cfg)
weights = handler.init_weights()
rng = jax.random.PRNGKey(0)
state0 = create_train_state(model, cfg, rng, batch['point_cloud'][:1])
step = make_train_step(model, handler, cfg)

host_state = jax.tree.map(np.asarray, state0)  # snapshot: train_step donates
losses = []
for n in (1, 4):
    mesh = make_mesh(n)
    state = replicate(jax.tree.map(jnp.asarray, host_state), mesh)
    db = shard_batch(batch, mesh)
    state, loss, _ = step(state, db, weights, rng)
    state, loss2, _ = step(state, db, weights, rng)
    losses.append((float(loss), float(loss2)))
print('LOSSES', losses)
a, b = losses
# step 1: identical global batch + params -> tight match
assert abs(a[0] - b[0]) / abs(a[0]) < 1e-4, (a, b)
# step 2: cross-device reduction order perturbs params at ~1e-7, which can
# flip discrete chamfer/Hungarian matches -> only approximate agreement
assert abs(a[1] - b[1]) / abs(a[1]) < 0.05, (a, b)
print('MATCH OK')
"""
        out = clean_subprocess(code, n_devices=4)
        assert "MATCH OK" in out

    def test_two_process_distributed_dp(self):
        """TRUE multi-process data parallelism (VERDICT r3 item 6): two
        OS processes, each with 2 virtual CPU devices, joined through
        ``distributed_init`` (jax.distributed + gloo CPU collectives).
        Each process materializes only its dataset shard
        (DataLoader num_shards=2), assembles the global batch with
        ``shard_batch_global``, and runs ONE real train step over the
        4-device global mesh. Loss must agree across ranks (same global
        program) and with a single-process run of the identical global
        batch."""
        import re
        import socket

        with socket.socket() as s:  # free port for the coordinator
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        worker = """
import os, sys
pid = int(os.environ['JAX_PROCESS_ID'])
from maskplanner_tpu.parallel.mesh import (distributed_init, global_mesh,
                                           shard_batch_global)
pi, pc = distributed_init()
assert (pi, pc) == (pid, 2), (pi, pc)
import jax, jax.numpy as jnp, numpy as np
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2
from maskplanner_tpu.utils.args import load_args
from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
from maskplanner_tpu.losses import LossHandler
from maskplanner_tpu.models import get_model
from maskplanner_tpu.parallel import replicate
from maskplanner_tpu.train import create_train_state, make_train_step

cfg = load_args(argv=['config=[maskplanner,cuboids_v2,longx_v2,debug]',
                      'pc_points=64', 'n_pred_traj_points=80',
                      'batch_size=8'])
ds = PaintDataset(cfg, split='train', size=8)
local = next(iter(DataLoader(ds, 8, shuffle=False,   # 8 = GLOBAL batch
                             num_shards=2, shard_index=pid)))
assert local['point_cloud'].shape[0] == 4  # this host's shard
mesh = global_mesh()
batch = shard_batch_global(local, mesh)
assert batch['point_cloud'].shape[0] == 8  # global leading axis
model = get_model(cfg)
handler = LossHandler(cfg.loss, cfg)
rng = jax.random.PRNGKey(0)
state = create_train_state(model, cfg, rng, local['point_cloud'][:1])
state = replicate(state, mesh)
step = make_train_step(model, handler, cfg)
state, loss, _ = step(state, batch, handler.init_weights(), rng)
print(f'DISTLOSS rank={pid} {float(loss):.6f}', flush=True)
"""
        single = """
import jax, numpy as np
from maskplanner_tpu.utils.args import load_args
from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
from maskplanner_tpu.losses import LossHandler
from maskplanner_tpu.models import get_model
from maskplanner_tpu.parallel import make_mesh, replicate, shard_batch
from maskplanner_tpu.train import create_train_state, make_train_step

cfg = load_args(argv=['config=[maskplanner,cuboids_v2,longx_v2,debug]',
                      'pc_points=64', 'n_pred_traj_points=80',
                      'batch_size=8'])
ds = PaintDataset(cfg, split='train', size=8)
batch = next(iter(DataLoader(ds, 8, shuffle=False)))
mesh = make_mesh(1)
model = get_model(cfg)
handler = LossHandler(cfg.loss, cfg)
rng = jax.random.PRNGKey(0)
state = create_train_state(model, cfg, rng, batch['point_cloud'][:1])
state = replicate(state, mesh)
step = make_train_step(model, handler, cfg)
state, loss, _ = step(state, shard_batch(batch, mesh),
                      handler.init_weights(), rng)
print(f'REFLOSS {float(loss):.6f}', flush=True)
"""
        import subprocess as sp
        import sys as _sys

        from conftest import REPO_ROOT

        def env_for(pid):
            env = dict(__import__("os").environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["PYTHONPATH"] = ":".join(
                [REPO_ROOT, __import__("os").path.join(REPO_ROOT, "tests")]
                + [p for p in env.get("PYTHONPATH", "").split(":")
                   if p and "axon_site" not in p])
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                                + " --xla_force_host_platform_device_count=2"
                                ).strip()
            env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
            env["JAX_NUM_PROCESSES"] = "2"
            env["JAX_PROCESS_ID"] = str(pid)
            return env

        procs = [sp.Popen([_sys.executable, "-c", worker], env=env_for(i),
                          cwd=REPO_ROOT, stdout=sp.PIPE, stderr=sp.PIPE,
                          text=True) for i in range(2)]
        outs = [p.communicate(timeout=1200) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, f"rank failed:\n{out}\n{err[-4000:]}"
        losses = [float(re.search(r"DISTLOSS rank=\d ([0-9.]+)", o).group(1))
                  for o, _ in outs]
        assert abs(losses[0] - losses[1]) / abs(losses[0]) < 1e-6, losses

        env1 = env_for(0)
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                  "JAX_PROCESS_ID"):
            env1.pop(k)
        r = sp.run([_sys.executable, "-c", single], env=env1, cwd=REPO_ROOT,
                   capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, f"{r.stdout}\n{r.stderr[-4000:]}"
        ref = float(re.search(r"REFLOSS ([0-9.]+)", r.stdout).group(1))
        assert abs(losses[0] - ref) / abs(ref) < 1e-4, (losses, ref)

    def test_multislice_dp_matches_single_device(self, clean_subprocess):
        """2x4 (DCN x ICI) mesh: one full train step equals the 1-device
        result — XLA inserts the hierarchical gradient all-reduce from the
        sharding alone."""
        code = """
import numpy as np, jax, jax.numpy as jnp
from maskplanner_tpu.utils.args import load_args
from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
from maskplanner_tpu.losses import LossHandler
from maskplanner_tpu.models import get_model
from maskplanner_tpu.parallel import (make_multislice_mesh,
                                      shard_batch_multislice, replicate)
from maskplanner_tpu.train import create_train_state, make_train_step

cfg = load_args(argv=['config=[maskplanner,cuboids_v2,longx_v2,debug]',
                      'pc_points=64', 'n_pred_traj_points=80',
                      'batch_size=8'])
ds = PaintDataset(cfg, split='train', size=8)
batch = next(iter(DataLoader(ds, 8)))
model = get_model(cfg)
rng = jax.random.PRNGKey(0)
state = create_train_state(model, cfg, rng, batch['point_cloud'][:1])
handler = LossHandler(cfg['loss'], cfg)
w = handler.init_weights()
step = make_train_step(model, handler, cfg)

single = jax.tree.map(jnp.asarray, batch)
# train_step donates its state arg and replicate() may alias the input
# buffers, so run the single-device step first on the original state
s_state, s_loss, _ = step(state, single, w, rng)

mesh = make_multislice_mesh(2, 4)
assert mesh.devices.shape == (2, 4) and mesh.axis_names == ('dcn', 'ici')
sharded = shard_batch_multislice(batch, mesh)
fresh = create_train_state(model, cfg, rng, batch['point_cloud'][:1])
ms_state, ms_loss, _ = step(replicate(fresh, mesh), sharded, w, rng)
np.testing.assert_allclose(float(ms_loss), float(s_loss), rtol=2e-4)
p0 = np.asarray(jax.tree.leaves(ms_state.params)[0])
p1 = np.asarray(jax.tree.leaves(s_state.params)[0])
np.testing.assert_allclose(p0, p1, rtol=1e-3, atol=1e-5)
print('OK multislice')
"""
        out = clean_subprocess(code, n_devices=8)
        assert "OK multislice" in out
