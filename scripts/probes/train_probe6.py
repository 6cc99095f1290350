import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/polyphemus_jax"))
import jax.numpy as jnp, numpy as np
from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import create_train_state, make_optimizer, make_train_step

cfg = TrainConfig(batch_size=256, iters_to_accumulate=4,
                  model=ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8,
                                    dropout=0.0, batch_norm=True, use_pallas_gcl=True))
model = VAE(cfg.model)
toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)
state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
for wm in (False, True):
    step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg), with_metrics=wm))
    s, l, _ = step(state, toks, mask, jax.random.key(99)); float(l["tot"])
    st = state
    t0 = time.perf_counter()
    N = 10
    for i in range(N):
        st, losses, _ = step(st, toks, mask, jax.random.key(i))
    tot = float(losses["tot"])
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"with_metrics": wm, "step_s": round(dt, 4)}), flush=True)
