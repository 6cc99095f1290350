"""Generation timing forced by scalar readback (compute must finish; only
4 bytes cross the tunnel)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/polyphemus_jax"))
import jax.numpy as jnp, numpy as np
from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.models import VAE

cfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)
for pallas in (True, False):
    mcfg = cfg if not pallas else __import__("dataclasses").replace(cfg, use_pallas_gcl=True)
    model = VAE(mcfg)
    toks0 = jnp.zeros((1, 2, 4, 32, 16, 2), jnp.int32)
    mask0 = jnp.zeros((1, 2, 4, 32), bool).at[:, :, 0, 0].set(True)
    variables = tpu_jit(lambda m=model: m.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        toks0, mask0, deterministic=True))()

    @jax.jit
    def gen_sum(z):
        s_logits, tokens, mask = model.apply(variables, z,
                                             method=VAE.decode_tokens)
        return jnp.sum(tokens) + jnp.sum(mask)

    z = jax.random.normal(jax.random.key(7), (256, cfg.d))
    float(gen_sum(z))  # compile+warm
    N = 10
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(N):
        acc += float(gen_sum(z))  # scalar readback per round
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"pallas": pallas, "ms": round(dt*1e3, 2),
                      "seq_s": round(256/dt, 1)}), flush=True)
