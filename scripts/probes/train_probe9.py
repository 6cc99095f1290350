"""Round-2 ablations on the fused-CE train step (batch 256, L=8, Pallas).

Variants (argv): acc1 acc2 nobn fce
  acc1/acc2 — gradient accumulation 1/2 instead of 4 (the fused CE loss no
              longer materializes logits, so larger microbatches may fit);
  nobn      — batch_norm=False (bounds what masked-BN fusion could buy);
  fce       — fused_content_encoder=True retest under fused CE.
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
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)


def run(tag, accum=4, batch_norm=True, fce=False):
    cfg = TrainConfig(batch_size=256, iters_to_accumulate=accum,
                      fused_ce=True,
                      model=ModelConfig(d=512, gnn_n_layers=8, n_bars=2,
                                        resolution=8, dropout=0.0,
                                        batch_norm=batch_norm,
                                        fused_content_encoder=fce,
                                        use_pallas_gcl=True))
    model = VAE(cfg.model)
    toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg)))
    try:
        s, l, _ = step(state, toks, mask, jax.random.key(1))
        float(l["tot"])
    except Exception as e:
        print(json.dumps({"variant": tag, "error": str(e)[:200]}), flush=True)
        return
    t0 = time.perf_counter()
    N = 8
    for i in range(N):
        state, losses, _ = step(state, toks, mask, jax.random.key(i))
    float(losses["tot"])
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"variant": tag, "step_s": round(dt, 4),
                      "seq_s": round(256 / dt, 1)}), flush=True)


VARIANTS = {
    "acc1": lambda: run("acc1", accum=1),
    "acc2": lambda: run("acc2", accum=2),
    "nobn": lambda: run("nobn", batch_norm=False),
    "fce": lambda: run("fce", fce=True),
}
for key in (sys.argv[1:] or ["acc2", "acc1"]):
    VARIANTS[key]()
