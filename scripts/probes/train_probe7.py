"""Round-2 probe: isolate the depth-independent train-step overhead.

Variants at batch 256 / accum 4 / Pallas GCL (flagship training config):
  A. full step (losses + 9 metrics)           — round-1: 0.346 s
  B. with_metrics=False                       — round-1: ~1 ms cheaper
  C. surrogate content loss (mean of logits; no log_softmax / gather)
  D. logits tail skipped entirely (loss from s_logits + mu only) — upper
     bound on what a fused CE can buy.
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/polyphemus_jax"))
import jax.numpy as jnp, numpy as np
from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train import losses as L
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)

# fused_ce=False: these variants measure the round-1 logits path (the
# monkeypatched loss functions only apply there); the fused path is timed
# separately by scripts/probes/train_probe8.py.
cfg = TrainConfig(batch_size=256, iters_to_accumulate=4, fused_ce=False,
                  model=ModelConfig(d=512, gnn_n_layers=8, n_bars=2,
                                    resolution=8, dropout=0.0,
                                    batch_norm=True, use_pallas_gcl=True))
model = VAE(cfg.model)
toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)
state0 = create_train_state(model, cfg, jax.random.key(0), toks, mask)

orig_losses = L.compute_losses


def surrogate_losses(s_logits, c_logits, tokens, mask, mu, log_var, beta, *,
                     ref_parity=False):
    tot = (jnp.mean(c_logits.astype(jnp.float32))
           + jnp.mean(s_logits.astype(jnp.float32))
           + 1e-6 * jnp.mean(jnp.square(mu.astype(jnp.float32))))
    return tot, {"tot": tot}


def no_tail_losses(s_logits, c_logits, tokens, mask, mu, log_var, beta, *,
                   ref_parity=False):
    # c_logits unused -> XLA dead-codes the whole chord-decode/unembed tail
    tot = (jnp.mean(s_logits.astype(jnp.float32))
           + 1e-6 * jnp.mean(jnp.square(mu.astype(jnp.float32))))
    return tot, {"tot": tot}


def timeit(tag, with_metrics, loss_fn):
    L.compute_losses = loss_fn
    import polyphemus_tpu.train.trainer as T
    T.compute_losses = loss_fn
    try:
        step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg),
                                       with_metrics=with_metrics))
        state = state0
        s, l, _ = step(state, toks, mask, jax.random.key(1))
        float(l["tot"])
        t0 = time.perf_counter()
        N = 8
        for i in range(N):
            state, losses, _ = step(state, toks, mask, jax.random.key(i))
        float(losses["tot"])
        dt = (time.perf_counter() - t0) / N
        print(json.dumps({"variant": tag, "step_s": round(dt, 4)}),
              flush=True)
    finally:
        L.compute_losses = orig_losses
        T.compute_losses = orig_losses


VARIANTS = {
    "A": ("A_full", True, orig_losses),
    "B": ("B_no_metrics", False, orig_losses),
    "C": ("C_surrogate_ce", False, surrogate_losses),
    "D": ("D_no_logits_tail", False, no_tail_losses),
}
for key in (sys.argv[1:] or list(VARIANTS)):
    timeit(*VARIANTS[key])
