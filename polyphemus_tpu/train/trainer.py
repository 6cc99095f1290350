"""Training runtime: jitted data-parallel train/eval steps + host loop.

Reference counterpart: PolyphemusTrainer (/root/reference/training.py:78-296).
Differences by design:
  * the whole step (forward, losses, backward, Adam update, metrics) is one
    jit region, sharded over the device mesh (GSPMD inserts the grad psum);
  * gradient accumulation is a lax.scan over microbatches inside the step
    (reference: host-side loop with iters_to_accumulate, training.py:149-158);
  * bf16 is a compute-dtype policy — no loss scaling needed on TPU (the
    reference uses CUDA AMP + GradScaler, training.py:123-164);
  * checkpoints keep the reference's rolling `checkpoint` / `best_model`
    scheme and add resume.
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .. import utils
from ..config import TrainConfig
from ..models import VAE
from ..parallel import mesh as pmesh
from . import checkpoint as ckpt
from .losses import compute_losses, losses_from_stats
from .metrics import accuracies_from_stats, compute_accuracies
from .schedules import beta_schedule, lr_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array  # completed optimizer updates
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    opt = cfg.optimizer

    def lr_fn(count):
        # Reference order: update k=1 runs at the optimizer's init lr; the
        # scheduler overwrites lr after each update (training.py:161-170).
        sched = lr_schedule(cfg.lr_scheduler, count)
        return jnp.where(count == 0, opt.lr, sched)

    # weight_decay > 0 enables decoupled (AdamW-style) decay; at 0 the update
    # is identical to plain Adam, which is what the reference uses
    # (/root/reference/train.py:181 — torch.optim.Adam, no decay).
    return optax.adamw(learning_rate=lr_fn, b1=opt.betas[0], b2=opt.betas[1],
                       eps=opt.eps, weight_decay=opt.weight_decay)


def create_train_state(model: VAE, cfg: TrainConfig, rng,
                       sample_tokens, sample_mask) -> TrainState:
    # parameter shapes don't depend on batch: init on ONE sample so the
    # throwaway init forward stays tiny (a full-batch init compiles a
    # second big eval graph for nothing)
    variables = model.init(
        {"params": rng, "sample": jax.random.fold_in(rng, 1)},
        sample_tokens[:1], sample_mask[:1], deterministic=True)
    optimizer = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
    )


def _cast_floating(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def _forward_loss(model, cfg, params, batch_stats, tokens, mask, rng, beta,
                  train: bool, with_metrics: bool = True):
    if cfg.bf16:
        # bf16 compute / fp32 master params; gradients flow through the cast
        # back to fp32 (the TPU analogue of the reference's CUDA AMP,
        # training.py:123-164 — no loss scaling needed in bf16).
        params = _cast_floating(params, jnp.bfloat16)
        batch_stats = _cast_floating(batch_stats, jnp.bfloat16)
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"sample": rng}
    if cfg.model.dropout > 0 or cfg.model.message_dropout > 0:
        rngs["dropout"] = jax.random.fold_in(rng, 7)
    # Slot-scanned CE path: the content logits never materialize (the
    # logits path is kept for parity tests; dropout > 0 runs fused too —
    # slot-hidden dropout draws per-slot keys inside the scan).
    fused = cfg.fused_ce
    method = VAE.train_stats if fused else None
    if train:
        (head, mu, log_var), updates = model.apply(
            variables, tokens, mask, deterministic=False,
            rngs=rngs, mutable=["batch_stats"], method=method)
        new_stats = updates["batch_stats"]
        if cfg.bf16:
            # running stats are kept in fp32 master precision
            new_stats = _cast_floating(new_stats, jnp.float32)
    else:
        head, mu, log_var = model.apply(
            variables, tokens, mask, deterministic=True, rngs=rngs,
            method=method)
        new_stats = batch_stats
    if fused:
        s_logits, stats = head
        tot, losses = losses_from_stats(
            stats, s_logits, mask, mu, log_var, beta,
            ref_parity=cfg.ref_parity)
        accs = (accuracies_from_stats(stats, s_logits, mask,
                                      ref_parity=cfg.ref_parity)
                if with_metrics else {})
        return tot, (losses, accs, new_stats)
    s_logits, c_logits = head
    tot, losses = compute_losses(
        s_logits, c_logits, tokens, mask, mu, log_var, beta,
        ref_parity=cfg.ref_parity)
    if with_metrics:
        accs = compute_accuracies(s_logits, c_logits, tokens, mask,
                                  ref_parity=cfg.ref_parity)
    else:
        accs = {}
    return tot, (losses, accs, new_stats)


def make_train_step(model: VAE, cfg: TrainConfig,
                    optimizer: optax.GradientTransformation,
                    with_metrics: bool = True) -> Callable:
    """Returns step(state, tokens, mask, rng) -> (state, losses, accs).

    With cfg.iters_to_accumulate > 1, the global batch is split into
    microbatches scanned sequentially; gradients average across microbatches
    (matching loss/iters_to_accumulate accumulation, training.py:149).
    with_metrics=False skips the 9 accuracy metrics inside the step (the
    reference computes them every batch, training.py:175).
    """
    accum = max(cfg.iters_to_accumulate, 1)

    def step(state: TrainState, tokens, mask, rng):
        beta = (jnp.zeros((), jnp.float32) if cfg.ref_parity else
                beta_schedule(cfg.beta_scheduler, state.step))
        grad_fn = jax.value_and_grad(
            lambda p, bs, t, m, r: _forward_loss(
                model, cfg, p, bs, t, m, r, beta, True,
                with_metrics=with_metrics),
            has_aux=True)

        if accum == 1:
            (_, (losses, accs, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, tokens, mask, rng)
        else:
            b = tokens.shape[0]
            if b % accum:
                # The reference accumulates over whole dataloader batches
                # (training.py:149-158) and never drops samples; a silent
                # tokens[:mb*accum] truncation here would. Shapes are static
                # under jit, so this raises at trace time.
                raise ValueError(
                    f"batch size {b} is not divisible by "
                    f"iters_to_accumulate={accum}; every sample must land in "
                    f"a microbatch (pick batch_size % accum == 0)")
            mb = b // accum
            tok_mb = tokens.reshape((accum, mb) + tokens.shape[1:])
            msk_mb = mask.reshape((accum, mb) + mask.shape[1:])

            def scan_body(carry, xs):
                stats, gacc, i = carry
                t, m = xs
                r = jax.random.fold_in(rng, i)
                (_, (losses, accs, stats)), grads = grad_fn(
                    state.params, stats, t, m, r)
                gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
                return (stats, gacc, i + 1), (losses, accs)

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_stats, gsum, _), (losses_h, accs_h) = jax.lax.scan(
                scan_body, (state.batch_stats, zeros, 0), (tok_mb, msk_mb))
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            losses = jax.tree_util.tree_map(jnp.mean, losses_h)
            accs = jax.tree_util.tree_map(jnp.mean, accs_h)

        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, losses, accs

    return step


def make_eval_step(model: VAE, cfg: TrainConfig) -> Callable:
    def step(state: TrainState, tokens, mask, rng):
        beta = (jnp.zeros((), jnp.float32) if cfg.ref_parity else
                beta_schedule(cfg.beta_scheduler, state.step))
        _, (losses, accs, _) = _forward_loss(
            model, cfg, state.params, state.batch_stats, tokens, mask, rng,
            beta, False)
        return losses, accs

    return step


def _host_replicated_state(state):
    """Fetch every array of `state` to host memory on ALL processes.

    Single-process (the common case): plain device_get. Multi-host with
    arrays sharded across processes (e.g. tensor parallel over hosts):
    `process_allgather` assembles the global value everywhere — it is a
    collective, so the caller must invoke this on every process before any
    primary-only gating.
    """
    def to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return x

    return jax.device_get(jax.tree_util.tree_map(to_host, state))


class Trainer:
    """Host loop: epochs, periodic print/eval/save, early_exit, resume."""

    def __init__(self, model_dir: str, model: VAE, cfg: TrainConfig,
                 mesh=None, print_every: int = 1, save_every: int = 10,
                 eval_every: Optional[int] = None, log_fn=print,
                 jsonl_metrics: bool = True, tensorboard: bool = False):
        self.model_dir = model_dir
        self.model = model
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else pmesh.make_mesh(
            cfg.parallel.model_axis)
        self.print_every = print_every
        self.save_every = save_every
        self.eval_every = eval_every
        # Multi-host: every process runs the identical compute path (the
        # jitted step needs all hosts to participate in the collectives),
        # but only process 0 touches the shared filesystem / terminal —
        # checkpoints, metrics.jsonl, TensorBoard, and log output would
        # otherwise race N ways on a shared model_dir.
        self.is_primary = jax.process_index() == 0
        self.log = log_fn if self.is_primary else (lambda *a, **k: None)
        self.optimizer = make_optimizer(cfg)

        bsh = pmesh.batch_sharding(self.mesh)
        copts = utils.compiler_options()
        self._train_step = jax.jit(
            make_train_step(model, cfg, self.optimizer),
            in_shardings=(None, bsh, bsh, None),
            donate_argnums=(0,), compiler_options=copts)
        self._eval_step = jax.jit(make_eval_step(model, cfg),
                                  in_shardings=(None, bsh, bsh, None),
                                  compiler_options=copts)

        self._jsonl_path = (os.path.join(model_dir, "metrics.jsonl")
                            if jsonl_metrics and self.is_primary else None)
        if tensorboard and not self.is_primary:
            tensorboard = False
        # optional TensorBoard mirror of the JSONL metrics (the reference
        # has neither — SURVEY.md §5 metrics row; torch's SummaryWriter is
        # dependency-free here since torch-cpu is part of the toolchain)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(model_dir, "tb"))
            except Exception as e:  # pragma: no cover - env dependent
                log_fn(f"TensorBoard unavailable ({e}); JSONL only")

        self.tr_losses = defaultdict(list)
        self.tr_accuracies = defaultdict(list)
        self.val_losses = defaultdict(list)
        self.val_accuracies = defaultdict(list)
        self.lrs: list = []
        self.betas: list = []
        self.min_val_loss = float("inf")
        self.tot_batches = 0
        self.cur_epoch = 0
        # failure detection: abort after this many consecutive NaN/inf
        # losses instead of silently corrupting the checkpoint. Detection
        # runs at drain time, so its latency is bounded by _max_pending
        # below, not by print_every/save_every.
        self.max_nan_steps = 5
        self._nan_steps = 0
        # async metrics: device scalars buffer here per step and drain to
        # host floats only at print/eval/save boundaries — no per-step
        # device->host sync (round-1 cost: ~25 ms tunnel RTT per step).
        # The buffer is capped so NaN detection fires within _max_pending
        # steps even when print/eval/save boundaries are sparse.
        self._pending: list = []
        self._max_pending = 50
        # async checkpoint machinery (single-process path of _save)
        self._saver = ckpt.AsyncSaver()
        self._snap_jit = None

    # ------------------------------------------------------------------ setup
    def make_device_put(self):
        """Returns a (tokens, mask) -> device-sharded arrays fn for
        BatchLoader(device_put_fn=...): batches land sharded over the data
        axis while the host thread keeps loading (double buffering). Under
        multi-host (jax.distributed), each process feeds its local shard
        and the result is the globally-sharded batch."""

        def put(tokens, mask):
            return pmesh.global_batch_put(tokens, mask, self.mesh)

        return put

    def init_state(self, rng, sample_tokens, sample_mask) -> TrainState:
        state = create_train_state(self.model, self.cfg, rng,
                                   sample_tokens, sample_mask)
        shardings = pmesh.param_sharding(self.mesh, state)
        return jax.device_put(state, shardings)

    def resume(self, state_template: TrainState):
        state, meta = ckpt.load_checkpoint(self.model_dir, "checkpoint",
                                           state_template)
        self.tot_batches = int(meta.get("tot_batches", 0))
        self.min_val_loss = float(meta.get("min_val_loss", float("inf")))
        for k, v in meta.get("tr_losses", {}).items():
            self.tr_losses[k] = list(v)
        for k, v in meta.get("tr_accuracies", {}).items():
            self.tr_accuracies[k] = list(v)
        for k, v in meta.get("val_losses", {}).items():
            self.val_losses[k] = list(v)
        for k, v in meta.get("val_accuracies", {}).items():
            self.val_accuracies[k] = list(v)
        self.lrs = list(meta.get("lrs", []))
        self.betas = list(meta.get("betas", []))
        shardings = pmesh.param_sharding(self.mesh, state)
        return jax.device_put(state, shardings)

    # ------------------------------------------------------------------ loop
    def fit(self, state: TrainState, train_iter_fn, epochs: int,
            valid_iter_fn=None, early_exit: Optional[int] = None,
            rng=None, profile_dir: Optional[str] = None,
            profile_steps: tuple = (10, 15)) -> TrainState:
        from ..utils import StepTimer, profile_trace

        rng = rng if rng is not None else jax.random.key(self.cfg.seed)
        start = time.time()
        stop = False
        timer = StepTimer()
        self._timer = timer  # _print_stats reads rolling throughput
        profiling = False
        # one sync up front; afterwards the update count tracks on host so
        # logging never reads state.step back per step
        host_step = int(jax.device_get(state.step))
        for epoch in range(epochs):
            self.cur_epoch = epoch
            for tokens, mask in train_iter_fn():
                if profile_dir is not None:
                    if self.tot_batches == profile_steps[0] and not profiling:
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    elif self.tot_batches == profile_steps[1] and profiling:
                        jax.profiler.stop_trace()
                        profiling = False
                        self.log(f"Profiler trace written to {profile_dir}")
                step_rng = jax.random.fold_in(rng, self.tot_batches)
                state, losses, accs = self._train_step(
                    state, tokens, mask, step_rng)
                timer.tick()
                host_step += 1
                self._pending.append(
                    (self.tot_batches, self.cur_epoch, host_step,
                     losses, accs))

                n = self.tot_batches + 1
                if (n % self.print_every == 0
                        or (self.eval_every and n % self.eval_every == 0)
                        or (self.save_every > 0 and n % self.save_every == 0)
                        or (early_exit is not None and n > early_exit)
                        or len(self._pending) >= self._max_pending):
                    self._drain()
                if n % self.print_every == 0:
                    self._print_stats(epoch, epochs, start)
                if (valid_iter_fn is not None and self.eval_every
                        and n % self.eval_every == 0):
                    state = self._maybe_eval_and_save(state, valid_iter_fn,
                                                      rng)
                if self.save_every > 0 and n % self.save_every == 0:
                    self._save(state, "checkpoint", blocking=False)
                if early_exit is not None and n > early_exit:
                    stop = True
                    break
                self.tot_batches += 1
            if stop:
                break
        self._drain()
        elapsed = time.time() - start
        self.log(f"Training completed in {elapsed:.1f}s")
        self._save(state, "checkpoint")
        return state

    def evaluate(self, state: TrainState, valid_iter_fn, rng=None):
        rng = rng if rng is not None else jax.random.key(0)
        # enqueue every eval batch, then read everything back in ONE
        # stacked transfer (same no-per-step-sync policy as _drain)
        pending = []
        for i, (tokens, mask) in enumerate(valid_iter_fn()):
            pending.append(self._eval_step(state, tokens, mask,
                                           jax.random.fold_in(rng, i)))
        if not pending:
            return {}, {}
        leaves = []
        for losses, accs in pending:
            leaves.extend(jax.tree_util.tree_leaves((losses, accs)))
        per = len(leaves) // len(pending)
        flat = np.asarray(jnp.stack(leaves))
        losses_all = defaultdict(list)
        accs_all = defaultdict(list)
        struct = jax.tree_util.tree_structure(pending[0])
        for i in range(len(pending)):
            l_host, a_host = jax.tree_util.tree_unflatten(
                struct, flat[i * per:(i + 1) * per])
            for k, v in l_host.items():
                losses_all[k].append(float(v))
            for k, v in a_host.items():
                accs_all[k].append(float(v))
        return ({k: float(np.mean(v)) for k, v in losses_all.items()},
                {k: float(np.mean(v)) for k, v in accs_all.items()})

    # ------------------------------------------------------------------ internals
    def _drain(self):
        """Move buffered device scalars to the host histories in ONE
        transfer (stacked on device first so the tunnel pays one RTT, not
        one per scalar), then run NaN-streak failure detection and JSONL
        emission. Called at print/eval/save boundaries, not per step."""
        if not self._pending:
            return
        leaves_per = None
        all_leaves = []
        for _, _, _, losses, accs in self._pending:
            leaves = jax.tree_util.tree_leaves((losses, accs))
            leaves_per = len(leaves)
            all_leaves.extend(leaves)
        flat = np.asarray(jnp.stack(all_leaves)) if all_leaves else np.zeros(0)
        pending, self._pending = self._pending, []

        jsonl_lines = []
        for i, (batch_i, epoch_i, step, losses, accs) in enumerate(pending):
            vals = flat[i * leaves_per:(i + 1) * leaves_per]
            named = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure((losses, accs)), vals)
            l_host, a_host = named
            for k, v in l_host.items():
                self.tr_losses[k].append(float(v))
            for k, v in a_host.items():
                self.tr_accuracies[k].append(float(v))
            lr = float(lr_schedule(self.cfg.lr_scheduler, step, xp=np))
            beta = float(beta_schedule(self.cfg.beta_scheduler, step,
                                       ref_parity=self.cfg.ref_parity,
                                       xp=np))
            self.lrs.append(lr)
            self.betas.append(beta)
            if self._jsonl_path is not None:
                rec = {"batch": batch_i, "epoch": epoch_i,
                       "lr": lr, "beta": beta}
                timer = getattr(self, "_timer", None)
                if timer is not None and timer.times:
                    # rolling host-observed rate AT DRAIN TIME — every
                    # record flushed in one drain carries the same value,
                    # so rate changes appear quantized to drain boundaries
                    # (<= max_pending steps), not per-step
                    rec["seq_s"] = round(
                        timer.steps_per_sec * self.cfg.batch_size, 1)
                rec.update({f"loss/{k}": float(v) for k, v in l_host.items()})
                rec.update({f"acc/{k}": float(v) for k, v in a_host.items()})
                jsonl_lines.append(json.dumps(rec))
            if self._tb is not None:
                for k, v in l_host.items():
                    self._tb.add_scalar(f"loss/{k}", float(v), batch_i)
                for k, v in a_host.items():
                    self._tb.add_scalar(f"acc/{k}", float(v), batch_i)
                self._tb.add_scalar("lr", lr, batch_i)
                self._tb.add_scalar("beta", beta, batch_i)
            # failure detection on the drained trajectory
            if not np.isfinite(float(l_host["tot"])):
                self._nan_steps += 1
                if self._nan_steps >= self.max_nan_steps:
                    raise FloatingPointError(
                        f"non-finite loss for {self._nan_steps} "
                        f"consecutive steps (batch {batch_i})")
            else:
                self._nan_steps = 0
        if jsonl_lines:
            os.makedirs(self.model_dir, exist_ok=True)
            with open(self._jsonl_path, "a") as f:
                f.write("\n".join(jsonl_lines) + "\n")
        if self._tb is not None:
            self._tb.flush()

    def _maybe_eval_and_save(self, state, valid_iter_fn, rng):
        val_losses, val_accs = self.evaluate(state, valid_iter_fn, rng)
        for k, v in val_losses.items():
            self.val_losses[k].append(v)
        for k, v in val_accs.items():
            self.val_accuracies[k].append(v)
        self.log(f"Val losses: {val_losses}")
        self.log(f"Val accuracies: {val_accs}")
        if self._jsonl_path is not None and val_losses:
            rec = {"batch": self.tot_batches, "epoch": self.cur_epoch}
            rec.update({f"val_loss/{k}": v for k, v in val_losses.items()})
            rec.update({f"val_acc/{k}": v for k, v in val_accs.items()})
            os.makedirs(self.model_dir, exist_ok=True)
            with open(self._jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in val_losses.items():
                self._tb.add_scalar(f"val_loss/{k}", v, self.tot_batches)
            for k, v in val_accs.items():
                self._tb.add_scalar(f"val_acc/{k}", v, self.tot_batches)
            self._tb.flush()
        if val_losses.get("tot", float("inf")) < self.min_val_loss:
            self.log("Validation loss improved; saving best model.")
            self.min_val_loss = val_losses["tot"]
            self._save(state, "best_model", blocking=False)
        return state

    def _save(self, state, name, blocking: bool = True):
        meta = {
            "epoch": self.cur_epoch,
            "tot_batches": self.tot_batches,
            "min_val_loss": self.min_val_loss,
            # copy the histories: the async worker serializes them after
            # this method returns, while the loop keeps appending
            "lrs": list(self.lrs),
            "betas": list(self.betas),
            "tr_losses": {k: list(v) for k, v in self.tr_losses.items()},
            "tr_accuracies": {k: list(v)
                              for k, v in self.tr_accuracies.items()},
            "val_losses": {k: list(v) for k, v in self.val_losses.items()},
            "val_accuracies": {k: list(v)
                               for k, v in self.val_accuracies.items()},
        }
        if jax.process_count() > 1:
            # Materializing a multi-host-sharded state is a COLLECTIVE:
            # every process must take part in the allgather BEFORE the
            # primary-only gate, or process 0's device_get would hit
            # non-addressable shards (tensor parallel spanning hosts) and
            # raise / deadlock. Keep this path synchronous — a background
            # thread must not run collectives against the live step.
            state = _host_replicated_state(state)
            if not self.is_primary:
                return
            ckpt.save_checkpoint(self.model_dir, name, state, meta)
            return
        # Single process: snapshot on device (identity jit => fresh output
        # buffers, immune to the train step's donation of the live state),
        # then let the AsyncSaver overlap transfer+encode+write with
        # training. Blocking saves (final save, direct calls) just drain.
        if self._snap_jit is None:
            self._snap_jit = jax.jit(lambda s: s)
        snap = self._snap_jit(state)
        self._saver.submit(snap, self.model_dir, name, meta)
        if blocking:
            self._saver.wait()

    def _print_stats(self, epoch, epochs, start):
        k = self.print_every
        avg_l = {key: round(float(np.mean(v[-k:])), 3)
                 for key, v in self.tr_losses.items()}
        avg_a = {key: round(float(np.mean(v[-k:])), 3)
                 for key, v in self.tr_accuracies.items()}
        # host-observed throughput (per-step wall between enqueues over a
        # 50-step rolling window; syncs happen only at drain boundaries, so
        # this tracks the sustained rate, not per-step device time)
        thr = ""
        timer = getattr(self, "_timer", None)
        if timer is not None and timer.times:
            seq_s = timer.steps_per_sec * self.cfg.batch_size
            from .. import flops as _flops
            # seq_s is GLOBAL-batch throughput, so scale the peak by the
            # mesh's device count or multi-chip runs would report >100%
            n_dev = self.mesh.devices.size if self.mesh is not None else 1
            mfu = _flops.mfu(seq_s,
                             _flops.train_step_flops_per_seq(self.cfg.model),
                             peak=_flops.V5E_PEAK_FLOPS * max(n_dev, 1))
            thr = f" {seq_s:.0f} seq/s ({mfu:.1f}% MFU)"
        self.log(
            f"[{time.time() - start:8.1f}s] epoch {epoch + 1}/{epochs} "
            f"batch {self.tot_batches + 1}{thr} losses={avg_l} accs={avg_a}")
