"""Generation timing with forced host readback (block_until_ready on the
axon backend can return early; np.asarray cannot)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/polyphemus_jax"))
import jax.numpy as jnp, numpy as np
from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.generate import make_generator
from polyphemus_tpu.models import VAE

cfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)
model = VAE(cfg)
toks0 = jnp.zeros((1, 2, 4, 32, 16, 2), jnp.int32)
mask0 = jnp.zeros((1, 2, 4, 32), bool).at[:, :, 0, 0].set(True)
variables = tpu_jit(lambda: model.init(
    {"params": jax.random.key(0), "sample": jax.random.key(1)},
    toks0, mask0, deterministic=True))()

for pallas in (True, False):
    gen = make_generator(model, variables, pallas=pallas)
    z = jax.random.normal(jax.random.key(7), (256, cfg.d))
    m, t = gen(z); np.asarray(m); np.asarray(t)  # compile + warm
    N = 10
    t0 = time.perf_counter()
    for i in range(N):
        m, t = gen(z)
        np.asarray(t)  # force completion via readback
        np.asarray(m)
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"pallas": pallas, "ms_per_batch": round(dt*1e3, 2),
                      "seq_s": round(256/dt, 1)}), flush=True)
