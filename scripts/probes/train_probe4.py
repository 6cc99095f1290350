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

cfg = TrainConfig(batch_size=256, iters_to_accumulate=1,
                  model=ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8,
                                    dropout=0.0, batch_norm=True, use_pallas_gcl=True))
model = VAE(cfg.model)
toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)
state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg)))
state, losses, _ = step(state, toks, mask, jax.random.key(99))
print("first tot:", float(losses["tot"]))  # host transfer = real sync
t0 = time.perf_counter()
N = 20
for i in range(N):
    state, losses, _ = step(state, toks, mask, jax.random.key(i))
tot = float(losses["tot"])     # actual device->host readback
leaf = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
dt = (time.perf_counter() - t0) / N
print(json.dumps({"accum": 1, "true_step_s": round(dt, 4),
                  "seq_s": round(256/dt, 1), "tot": round(tot, 3),
                  "leaf0": float(leaf.ravel()[0])}))
