"""Real multi-process data-parallel training on a CPU device mesh.

The reference trainer is strictly single-device (/root/reference/
train.py:120-122 — one GPU picked by --gpu_id, no DDP anywhere); multi-host
execution is this framework's own flagship divergence, so it must actually
run, not just type-check. This driver launches N coordinated OS processes
(`jax.distributed.initialize` on localhost), each owning ndev//N fake CPU
devices, and runs the REAL training loop over the global ndev-device mesh
(cross-process collectives ride Gloo on CPU; on a real TPU pod the same
code takes ICI/DCN):

  * per-process `BatchLoader(shard=(pid, N))` slices of every global batch,
  * `jax.make_array_from_process_local_data` batch assembly
    (`parallel.mesh.global_batch_put`),
  * the jitted sharded train step with GSPMD's cross-process grad psum,
  * `process_allgather` checkpoint materialization
    (`trainer._host_replicated_state`'s non-addressable branch),
  * primary-only checkpoint/metrics/log gating on a SHARED model_dir.

`--nproc 1` runs the identical configuration in one process (the plain
device_put path); tests/test_multihost.py asserts the two produce the same
loss trajectory and that only process 0 ever writes files.

Usage:
  python scripts/run_multihost.py --out DIR --nproc 2 [--steps 6]
  python scripts/run_multihost.py --out DIR --nproc 2 --model_axis 2
(Worker mode, used internally: add --pid I --port P.)

The default is 2 global devices (1 per process): this sandbox has ONE
physical CPU core, and 4 fake devices per process starves XLA's in-process
collective rendezvous (hard 40 s termination timeout in rendezvous.cc ->
SIGABRT). One device per process exercises the exact same code paths —
distributed init, make_array_from_process_local_data, cross-process grad
psum, process_allgather checkpointing, primary-only gating — without the
thread oversubscription.
"""
import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args) -> None:
    ndev_local = args.ndev // args.nproc
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev_local}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nproc, process_id=args.pid)
        assert jax.process_count() == args.nproc
    assert len(jax.devices()) == args.ndev, jax.devices()

    import numpy as np

    sys.path.insert(0, REPO)
    from polyphemus_tpu.config import ModelConfig, TrainConfig
    from polyphemus_tpu.data import BatchLoader
    from polyphemus_tpu.data.dataset import synthetic_batch
    from polyphemus_tpu.models import VAE
    from polyphemus_tpu.parallel import mesh as pmesh
    from polyphemus_tpu.train.trainer import Trainer

    cfg = TrainConfig(
        batch_size=8, iters_to_accumulate=2,
        model=ModelConfig(d=16, gnn_n_layers=1, n_bars=2, resolution=8))
    mesh = pmesh.make_mesh(args.model_axis)
    model = VAE(cfg.model)

    # Deterministic 32-sample dataset, identical on every process.
    all_toks, all_mask = synthetic_batch(np.random.default_rng(0), 32,
                                         cfg.model.n_bars)

    class _DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return all_toks[i], all_mask[i]

    trainer = Trainer(args.out, model, cfg, mesh=mesh, print_every=2,
                      save_every=4, eval_every=4)
    put = trainer.make_device_put()
    shard = (args.pid, args.nproc)
    train_loader = BatchLoader(_DS(), cfg.batch_size, shuffle=True, seed=11,
                               num_workers=1, shard=shard, device_put_fn=put)
    val_loader = BatchLoader(_DS(), cfg.batch_size, shuffle=False, seed=0,
                             num_workers=1, shard=shard, device_put_fn=put)

    state = trainer.init_state(jax.random.key(cfg.seed),
                               all_toks[:1], all_mask[:1])
    # Prove the checkpoint path takes the collective branch under nproc>1:
    # replicated params over a multi-process mesh are NOT fully addressable.
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    expect_allgather = args.nproc > 1
    assert p0.is_fully_addressable == (not expect_allgather), (
        p0.sharding, p0.is_fully_addressable)

    state = trainer.fit(state, lambda: iter(train_loader), epochs=3,
                        valid_iter_fn=lambda: iter(val_loader),
                        early_exit=args.steps)

    # Every process reports its view; the harness compares them.
    result = {
        "pid": args.pid,
        "nproc": args.nproc,
        "process_count": jax.process_count(),
        "allgather_branch": bool(expect_allgather),
        "tr_tot": [round(v, 6) for v in trainer.tr_losses["tot"]],
        "val_tot": [round(v, 6) for v in trainer.val_losses["tot"]],
        "steps": trainer.tot_batches,
    }
    print("MULTIHOST_RESULT " + json.dumps(result), flush=True)
    if args.nproc > 1:
        jax.distributed.shutdown()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(args) -> int:
    """Spawn the workers, stream process-0 output, return max exit code."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # CPU subprocesses; axon site not needed
    procs = []
    for pid in range(args.nproc):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--out", args.out, "--nproc", str(args.nproc),
               "--steps", str(args.steps), "--ndev", str(args.ndev),
               "--model_axis", str(args.model_axis),
               "--pid", str(pid), "--port", str(port)]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=args.timeout)
        sys.stdout.write(out)
        if p.returncode != 0:
            rc = 1  # signals give negative returncodes; max() would hide them
            sys.stderr.write(f"[worker {pid}] exited {p.returncode}\n")
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--ndev", type=int, default=2,
                    help="global device count (ndev/nproc fake CPU devices "
                         "per process; keep small — one physical core)")
    ap.add_argument("--model_axis", type=int, default=1)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--pid", type=int, default=None,
                    help="internal: run as worker process PID")
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args(argv)
    if args.pid is not None:
        if args.nproc == 1:
            args.pid = 0
        worker(args)
        return 0
    if args.nproc == 1:
        args.pid = 0
        worker(args)
        return 0
    return launch(args)


if __name__ == "__main__":
    sys.exit(main())
