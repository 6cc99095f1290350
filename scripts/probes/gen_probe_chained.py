"""Pure device compute: 10 generation rounds chained in ONE jit via scan,
single scalar output. Removes all host/tunnel per-call overhead."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/polyphemus_jax"))
import jax.numpy as jnp, numpy as np
from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.models import VAE

N = 10
cfg0 = ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8,
                   dropout=0.0, batch_norm=True)
import dataclasses
for pallas in (True, False):
    cfg = dataclasses.replace(cfg0, use_pallas_gcl=pallas)
    model = VAE(cfg)
    toks0 = jnp.zeros((1, 2, 4, 32, 16, 2), jnp.int32)
    mask0 = jnp.zeros((1, 2, 4, 32), bool).at[:, :, 0, 0].set(True)
    variables = tpu_jit(lambda m=model: m.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        toks0, mask0, deterministic=True))()

    @jax.jit
    def chained(zs):
        def body(carry, z):
            s_logits, tokens, mask = model.apply(variables, z,
                                                 method=VAE.decode_tokens)
            return carry + jnp.sum(tokens) + jnp.sum(mask), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), zs)
        return acc

    zs = jax.random.normal(jax.random.key(7), (N, 256, cfg.d))
    float(chained(zs))  # compile + warm
    t0 = time.perf_counter()
    v = float(chained(zs))
    dt = (time.perf_counter() - t0) / N
    # also measure bare RTT for context
    t1 = time.perf_counter(); float(jnp.sum(zs[0, 0])); rtt = time.perf_counter() - t1
    print(json.dumps({"pallas": pallas, "ms_per_batch": round(dt*1e3, 2),
                      "seq_s": round(256/dt, 1), "rtt_ms": round(rtt*1e3, 1)}),
          flush=True)
