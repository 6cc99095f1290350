"""Batch-scaling probe for generation throughput."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("POLY_COMPILE_CACHE", os.path.expanduser("~/.cache/polyphemus_jax"))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["POLY_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.generate import make_generator
from polyphemus_tpu.models import VAE

cfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8, dropout=0.0, batch_norm=True)
model = VAE(cfg)
toks0 = jnp.zeros((1, 2, 4, 32, 16, 2), jnp.int32)
mask0 = jnp.zeros((1, 2, 4, 32), bool).at[:, :, 0, 0].set(True)
variables = tpu_jit(lambda: model.init(
    {"params": jax.random.key(0), "sample": jax.random.key(1)},
    toks0, mask0, deterministic=True))()

def bench(batch, bf16, rounds=5):
    gen = make_generator(model, variables, bf16=bf16)
    z = jax.random.normal(jax.random.key(1), (batch, cfg.d))
    jax.block_until_ready(gen(z))
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = gen(z)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / rounds
    print(json.dumps({"batch": batch, "bf16": bf16,
                      "seq_s": round(batch / dt, 1)}), flush=True)

for batch, bf16 in [(1024, True), (1024, False), (2048, True)]:
    try:
        bench(batch, bf16)
    except Exception as e:
        print(json.dumps({"batch": batch, "bf16": bf16,
                          "error": str(e)[:200]}), flush=True)
