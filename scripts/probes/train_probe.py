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

for pallas, bf16 in [(True, False), (True, True)]:
    cfg = TrainConfig(batch_size=256, iters_to_accumulate=4, bf16=bf16,
                      model=ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8,
                                        dropout=0.0, batch_norm=True, use_pallas_gcl=pallas))
    model = VAE(cfg.model)
    toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg)))
    try:
        jax.block_until_ready(step(state, toks, mask, jax.random.key(1)))
        t0 = time.perf_counter()
        for i in range(5):
            state, losses, _ = step(state, toks, mask, jax.random.key(i))
        jax.block_until_ready(losses["tot"])
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({"pallas": pallas, "bf16": bf16, "step_s": round(dt, 4),
                          "seq_s": round(256 / dt, 1), "tot": round(float(losses["tot"]), 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"pallas": pallas, "bf16": bf16, "error": str(e)[-300:]}), flush=True)
