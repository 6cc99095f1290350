"""Training CLI — flag-compatible with the reference's train.py
(/root/reference/train.py:18-207), plus --resume (the reference saves
optimizer state but has no way to load it; SURVEY.md §5).

    python -m polyphemus_tpu.cli.train DATASET_DIR OUTPUT_DIR CONFIG.json \
        [--model_name NAME] [--save_every 10] [--print_every 1] [--eval]
        [--eval_every N] [--num_workers 10] [--tr_split 0.7]
        [--vl_split 0.1] [--max_epochs 100] [--seed N] [--resume]
        [--early_exit N]
"""
from __future__ import annotations

import argparse
import os
import uuid

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_train_config, save_train_config
from ..data import BatchLoader, PolyphemusDataset
from ..models import VAE
from ..parallel import make_mesh
from ..train import checkpoint as ckpt
from ..train.trainer import Trainer


def main(argv=None):
    p = argparse.ArgumentParser(description="Trains Polyphemus (TPU-native).")
    p.add_argument("dataset_dir", type=str)
    p.add_argument("output_dir", type=str)
    p.add_argument("config_file", type=str)
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--print_every", type=int, default=1)
    p.add_argument("--eval", action="store_true", default=False)
    p.add_argument("--eval_every", type=int, default=None)
    p.add_argument("--num_workers", type=int, default=10)
    p.add_argument("--tensorboard", action="store_true", default=False,
                   help="mirror metrics to TensorBoard (model_dir/tb)")
    p.add_argument("--tr_split", type=float, default=0.7)
    p.add_argument("--vl_split", type=float, default=0.1)
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true", default=False,
                   help="Resume from <model_dir>/checkpoint.")
    p.add_argument("--early_exit", type=int, default=None)
    p.add_argument("--profile", type=str, default=None,
                   help="Directory for a jax.profiler trace of steps 10-15.")
    args = p.parse_args(argv)

    from ..utils import enable_compile_cache

    enable_compile_cache()
    cfg = load_train_config(args.config_file)
    mc = cfg.model

    print("Preparing datasets and dataloaders...")
    if os.path.exists(os.path.join(args.dataset_dir, "shards.json")):
        # packed shard dir (cli.pack_dataset): mmapped shards + native C++
        # batch gather — the production fast path; per-sample .npz dirs
        # (the reference's on-disk format) keep working below
        from ..data.fastloader import FastShardedBatcher

        dataset = FastShardedBatcher(args.dataset_dir)
        if dataset.index.get("n_bars") != mc.n_bars:
            raise SystemExit(
                f"dataset packed with n_bars={dataset.index.get('n_bars')} "
                f"but config wants n_bars={mc.n_bars}")
    else:
        dataset = PolyphemusDataset(args.dataset_dir, mc.n_bars)
    n = len(dataset)
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(n)
    tr_len = int(args.tr_split * n)
    vl_len = int(args.vl_split * n) if args.eval else 0

    class _Subset:
        def __init__(self, ds, idxs):
            self.ds, self.idxs = ds, np.asarray(idxs)
            if hasattr(ds, "gather_batch"):
                # keep the batch-level fast path through the subset view
                self.gather_batch = (
                    lambda b: ds.gather_batch(self.idxs[np.asarray(b)]))

        def __len__(self):
            return len(self.idxs)

        def __getitem__(self, i):
            return self.ds[int(self.idxs[i])]

    tr_set = _Subset(dataset, order[:tr_len])
    vl_set = _Subset(dataset, order[tr_len:tr_len + vl_len]) \
        if args.eval else None

    train_loader = BatchLoader(tr_set, cfg.batch_size, shuffle=True,
                               seed=args.seed, num_workers=args.num_workers)
    valid_loader = (BatchLoader(vl_set, cfg.batch_size, shuffle=False,
                                num_workers=args.num_workers)
                    if vl_set is not None else None)
    # (device prefetch is attached after the Trainer/mesh exist)

    model_name = args.model_name or str(uuid.uuid1())
    model_dir = os.path.join(args.output_dir, model_name)
    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(model_dir, exist_ok=args.resume)
    save_train_config(cfg, os.path.join(model_dir, "config.json"))

    from ..parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    mesh = make_mesh(cfg.parallel.model_axis, batch_size=cfg.batch_size)
    print(f"Devices: {jax.device_count()} mesh={dict(mesh.shape)}")

    model = VAE(mc)
    eval_every = args.eval_every
    if args.eval and eval_every is None:
        eval_every = len(train_loader)
    trainer = Trainer(model_dir, model, cfg, mesh=mesh,
                      print_every=args.print_every,
                      save_every=args.save_every, eval_every=eval_every,
                      tensorboard=args.tensorboard)
    put = trainer.make_device_put()
    train_loader.device_put_fn = put
    # per-host batch sharding under jax.distributed (each process loads only
    # its slice of every global batch; same seed -> same global order)
    train_loader.shard = (jax.process_index(), jax.process_count())
    if valid_loader is not None:
        valid_loader.device_put_fn = put
        valid_loader.shard = (jax.process_index(), jax.process_count())

    toks0, mask0 = next(iter(BatchLoader(tr_set, min(2, cfg.batch_size),
                                         shuffle=False, num_workers=1)))
    state = trainer.init_state(jax.random.key(args.seed),
                               jnp.asarray(toks0), jnp.asarray(mask0))
    if args.resume and ckpt.latest_exists(model_dir):
        print("Resuming from checkpoint...")
        state = trainer.resume(state)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"Total Trainable Parameters: {n_params}")

    print("Starting training...")
    trainer.fit(state, lambda: iter(train_loader), args.max_epochs,
                valid_iter_fn=(lambda: iter(valid_loader))
                if valid_loader is not None else None,
                early_exit=args.early_exit,
                rng=jax.random.key(args.seed),
                profile_dir=args.profile)


if __name__ == "__main__":
    main()
