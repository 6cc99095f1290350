"""Multi-host data parallelism (VERDICT r1 item 6; real 2-process run r3
item 1).

Validated here:
  * per-host batch sharding in BatchLoader (each process loads only its
    slice of every global batch, identical global order across processes);
  * jax.distributed.initialize exercised for real in a 1-process smoke
    subprocess, with jax.make_array_from_process_local_data assembling the
    globally-sharded batch and the jitted train step consuming it;
  * (slow) a REAL 2-OS-process training run via scripts/run_multihost.py —
    Gloo cross-process grad psum, process_allgather checkpointing,
    primary-only file writes — asserted equal to the 1-process run.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from polyphemus_tpu.data import BatchLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _IdxDS:
    """Dataset whose samples encode their own index."""

    def __len__(self):
        return 64

    def __getitem__(self, i):
        t = np.full((2, 4, 32, 16, 2), i, np.int16)
        return t, np.ones((2, 4, 32), bool)


def test_per_host_shards_partition_the_global_batch():
    loaders = [BatchLoader(_IdxDS(), 8, shuffle=True, seed=3, num_workers=1,
                           shard=(pid, 4)) for pid in range(4)]
    full = BatchLoader(_IdxDS(), 8, shuffle=True, seed=3, num_workers=1)
    got = [list(iter(ld)) for ld in loaders]
    want = list(iter(full))
    assert all(len(g) == len(want) for g in got)
    for b in range(len(want)):
        ids_global = sorted(want[b][0][:, 0, 0, 0, 0, 0].tolist())
        shard_ids = []
        for pid in range(4):
            toks, mask = got[pid][b]
            assert toks.shape[0] == 2  # 8 / 4 processes
            shard_ids += toks[:, 0, 0, 0, 0, 0].tolist()
        # the four per-host slices partition the global batch exactly
        assert sorted(shard_ids) == ids_global


_SMOKE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:57421",
                           num_processes=1, process_id=0)
assert jax.process_count() == 1
import numpy as np, jax.numpy as jnp
import sys
sys.path.insert(0, %r)
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.parallel import mesh as pmesh
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)

cfg = TrainConfig(batch_size=8, model=ModelConfig(
    d=16, gnn_n_layers=1, n_bars=2, resolution=8, batch_norm=False))
mesh = pmesh.make_mesh(1)
assert mesh.shape["data"] == 8
toks, mask = synthetic_batch(np.random.default_rng(0), 8, 2)
# exercise the process-local assembly API explicitly (process_count==1)
bsh = pmesh.batch_sharding(mesh)
gt = jax.make_array_from_process_local_data(bsh, np.asarray(toks),
                                            toks.shape)
gm = jax.make_array_from_process_local_data(bsh, np.asarray(mask),
                                            mask.shape)
model = VAE(cfg.model)
state = create_train_state(model, cfg, jax.random.key(0), gt, gm)
step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)))
state, losses, _ = step(state, gt, gm, jax.random.key(1))
tot = float(losses["tot"])
assert np.isfinite(tot)
jax.distributed.shutdown()
print("MULTIHOST_SMOKE_OK", tot)
""" % (REPO,)


def test_distributed_initialize_smoke():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # CPU subprocess; axon site not needed
    out = subprocess.run([sys.executable, "-c", _SMOKE], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MULTIHOST_SMOKE_OK" in out.stdout


def _run_multihost(tmp, nproc, steps=6):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_multihost.py"),
         "--out", str(tmp), "--nproc", str(nproc), "--ndev", "2",
         "--steps", str(steps)],
        env=env, capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, (out.stdout[-3000:], out.stderr[-3000:])
    results = [json.loads(line.split("MULTIHOST_RESULT ", 1)[1])
               for line in out.stdout.splitlines()
               if "MULTIHOST_RESULT" in line]
    assert len(results) == nproc, out.stdout[-3000:]
    return results


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    """The flagship divergence from the reference (train.py:120-122 is
    single-device): a REAL jax.distributed run with 2 OS processes must
    produce the same training trajectory as 1 process on the same 2-device
    global mesh, take the process_allgather checkpoint branch, and write
    files from the primary only."""
    base = _run_multihost(tmp_path / "p1", nproc=1)
    multi = _run_multihost(tmp_path / "p2", nproc=2)

    assert base[0]["process_count"] == 1
    assert not base[0]["allgather_branch"]
    for r in multi:
        assert r["process_count"] == 2
        assert r["allgather_branch"]  # replicated params not addressable
        assert r["steps"] == base[0]["steps"]
        # Same per-step global train losses: per-device batches are
        # identical, only the psum transport differs (in-process vs Gloo).
        np.testing.assert_allclose(r["tr_tot"], base[0]["tr_tot"],
                                   rtol=1e-5)
        # Validation reduces across processes: reduction order differs.
        np.testing.assert_allclose(r["val_tot"], base[0]["val_tot"],
                                   rtol=1e-3)
    # Both ranks observed identical global state.
    assert multi[0]["tr_tot"] == multi[1]["tr_tot"]
    assert multi[0]["val_tot"] == multi[1]["val_tot"]

    # Primary-only writes on the SHARED model_dir: checkpoints parse and
    # metrics.jsonl has every step exactly once (a second writer would
    # duplicate or interleave lines).
    for d in (tmp_path / "p1", tmp_path / "p2"):
        assert (d / "checkpoint.msgpack").exists()
        assert (d / "best_model.msgpack").exists()
        json.loads((d / "checkpoint.json").read_text())
        rows = [json.loads(line) for line in
                (d / "metrics.jsonl").read_text().splitlines()]
        steps = [r["batch"] for r in rows if "loss/tot" in r]
        assert len(steps) == len(set(steps)), steps
        assert len(steps) >= 6
