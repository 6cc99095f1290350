import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/polyphemus_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg)))
out = step(state, toks, mask, jax.random.key(99))
jax.block_until_ready(out)
losses_first = float(out[1]["tot"])
state = out[0]
ts = []
for i in range(5):
    t0 = time.perf_counter()
    state, losses, accs = step(state, toks, mask, jax.random.key(i))
    jax.block_until_ready((state, losses))
    ts.append(time.perf_counter() - t0)
# sanity: params actually changed and loss evolves over repeated steps
print(json.dumps({"per_step_s": [round(t, 4) for t in ts],
                  "tot_first": round(losses_first, 4),
                  "tot_last": round(float(losses["tot"]), 4)}))
