"""Full benchmark sweep over the BASELINE.json measurement configs.

  1. LMD2 unconditional generation, n=1 (single-sequence latency)
  2. LMD2 structure-conditioned generation (structure file)
  3. LMD16 (16 bars) generation with 4x host-side looping
  4. Batched generation n=256 (headline; = bench.py)
  5. Training step/s at the reference batch size

Merges results into bench_report.json (existing keys from other stages /
scripts/bench_train.py survive). Random-initialized weights (the published
torch checkpoints need network access; weight conversion is covered by
tests).

Stage selection (the full sweep recompiles everything after a model-graph
change and can blow the 10-min sandbox cap):

    python scripts/bench_all.py [gen] [lmd16] [serve] [train]

with no args = all stages. `gen` covers latency/batched/conditioned/lmd16
(+ bf16 batched + chained device-compute), `lmd16` just the 16-bar stage
(slowest compile), `serve` the per-tier p50/p95, `train` the fp32+bf16
step (also standalone as scripts/bench_train.py). Host-side preprocessing
throughput is its own CPU-only script, scripts/bench_preprocess.py.
"""
import json
import os
import sys
import time

# validate stage args BEFORE the jax import / TPU-tunnel wait: a typo must
# fail fast, not after minutes of backend setup (and an empty run must not
# silently rewrite bench_report.json)
_KNOWN_STAGES = {"gen", "lmd16", "serve", "train", "numerics"}
STAGES = set(sys.argv[1:]) or {"gen", "serve", "train", "numerics"}
_bad = STAGES - _KNOWN_STAGES
if _bad:
    sys.exit(f"unknown stage(s) {sorted(_bad)}; choose from "
             f"{sorted(_KNOWN_STAGES)}")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLY_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/polyphemus_jax"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["POLY_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.generate import (as_bf16, load_structure_file,
                                     make_generator, song_from_tokens,
                                     with_pallas)
from polyphemus_tpu.midi.song import loop_song
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)
from polyphemus_tpu.utils import wait_for_backend, tpu_jit

# a wedged TPU tunnel blocks the first device query indefinitely while it
# drains a killed compile (~30 min observed); wait it out, don't hang
wait_for_backend(float(os.environ.get("POLY_BENCH_TUNNEL_WAIT_S", 2400)))
PALLAS = jax.default_backend() == "tpu"
report = {"backend": jax.default_backend(), "pallas": PALLAS,
          "note": ("median-of-3 runs per metric with recorded relative "
                   "spread (tunnel variance documented in PERFORMANCE.md); "
                   "train_* keys also refreshable via scripts/bench_train.py")}


def checkpoint(stage):
    """Incremental progress: merge + dump the report after every stage so
    a timed-out run still keeps what it measured (10-min sandbox cap)."""
    print(f"[bench_all] {stage}: {report}", flush=True)
    merged = dict(report)
    if os.path.exists("bench_report.json"):
        with open("bench_report.json") as f:
            old = json.load(f)
        spread = {**old.get("spread", {}), **report.get("spread", {})}
        merged = {**old, **report}
        if spread:
            merged["spread"] = spread
    with open("bench_report.json", "w") as f:
        json.dump(merged, f, indent=2)


def build(n_bars):
    # kernel tile defaults (8/16) won the round-2 sweep at both 2 and 16
    # bars; kernels clamp to the actual bar count for tiny batches
    cfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=n_bars, resolution=8,
                      dropout=0.0, batch_norm=True)
    model = VAE(cfg)
    toks0 = jnp.zeros((1, n_bars, 4, 32, 16, 2), jnp.int32)
    mask0 = jnp.zeros((1, n_bars, 4, 32), bool).at[:, :, 0, 0].set(True)
    variables = tpu_jit(lambda: model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        toks0, mask0, deterministic=True))()
    return cfg, model, variables


def timed(fn, *args, rounds=5, reps=3, key=None):
    """Median of `reps` timing passes of `rounds` calls each (VERDICT r2:
    best-of-N flatters on a noisy tunnel; report median +/- spread).
    Records the relative spread (max-min)/median under report['spread']."""
    jax.block_until_ready(fn(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(rounds):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / rounds)
    med = float(np.median(times))
    if key is not None:
        report.setdefault("spread", {})[key] = round(
            (max(times) - min(times)) / med, 3)
    return med, out


from polyphemus_tpu import flops as F

cfg2, model2, vars2 = build(2)
gen1 = make_generator(model2, vars2, pallas=PALLAS)
z256 = jax.random.normal(jax.random.key(2), (256, cfg2.d))

if "gen" not in STAGES:
    pass
else:
    # 1. single-sequence latency
    z1 = jax.random.normal(jax.random.key(1), (1, cfg2.d))
    dt, _ = timed(gen1, z1, rounds=20, key="lmd2_uncond_n1_latency_ms")
    report["lmd2_uncond_n1_latency_ms"] = round(dt * 1e3, 3)
    checkpoint("latency")

    # 4. batched n=256 (headline)
    dt, out = timed(gen1, z256, key="lmd2_batched_n256_seq_s")
    report["lmd2_batched_n256_seq_s"] = round(256 / dt, 1)
    report["lmd2_gen_gflops_per_seq"] = round(
        F.generation_flops_per_seq(cfg2) / 1e9, 2)
    report["lmd2_gen_mfu_pct"] = round(
        F.mfu(256 / dt, F.generation_flops_per_seq(cfg2)), 1)
    checkpoint("batched")

    # 4b. batched n=256 under the bf16 compute policy
    gen_bf = make_generator(model2, vars2, pallas=PALLAS, bf16=True)
    dt, _ = timed(gen_bf, z256, key="lmd2_batched_n256_seq_s_bf16")
    report["lmd2_batched_n256_seq_s_bf16"] = round(256 / dt, 1)
    report["lmd2_gen_mfu_pct_bf16"] = round(
        F.mfu(256 / dt, F.generation_flops_per_seq(cfg2)), 1)
    checkpoint("batched_bf16")

    # 4c. device-compute throughput: 50 generation rounds chained inside
    # ONE jit (lax.scan), single scalar readback — the pure-device number
    # the profiler's module timeline confirms (back-to-back 17.6 ms
    # modules, zero inter-module gap; PERFORMANCE.md round 3). The 4/4b
    # per-call numbers additionally pay per-call dispatch + one ~25 ms
    # tunnel sync per 5-call pass, which a production host would not.
    from polyphemus_tpu.generate import as_bf16, with_pallas

    # the Pallas kernels live behind ModelConfig (make_generator swaps the
    # config in itself; here we apply the model directly, so swap explicitly
    # via the same helper it uses)
    model_ch = with_pallas(model2) if PALLAS else model2

    def chained_fn(variables, cast):
        def chained(zs):
            def body(carry, z):
                _s, tokens, mask = model_ch.apply(
                    variables, cast(z), method=VAE.decode_tokens)
                return carry + jnp.sum(tokens) + jnp.sum(mask), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), zs)
            return acc
        return tpu_jit(chained)

    zs50 = jax.random.normal(jax.random.key(5), (50, 256, cfg2.d))
    vars_bf = as_bf16(vars2)
    for suffix, variables, cast in (
            ("", vars2, lambda z: z),
            ("_bf16", vars_bf, lambda z: z.astype(jnp.bfloat16))):
        ch = chained_fn(variables, cast)
        float(ch(zs50))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(ch(zs50))
            times.append((time.perf_counter() - t0) / 50)
        dt = float(np.median(times))
        report.setdefault("spread", {})[
            f"lmd2_chained_n256_seq_s{suffix}"] = round(
            (max(times) - min(times)) / dt, 3)
        report[f"lmd2_chained_n256_seq_s{suffix}"] = round(256 / dt, 1)
        report[f"lmd2_gen_device_mfu_pct{suffix}"] = round(
            F.mfu(256 / dt, F.generation_flops_per_seq(cfg2)), 1)
    checkpoint("chained")

    # host-side MIDI rendering throughput for the batch
    mask_np, tok_np = np.asarray(out[0]), np.asarray(out[1])
    t0 = time.perf_counter()
    songs = [song_from_tokens(tok_np[i], mask_np[i], cfg2.resolution)
             for i in range(64)]
    report["midi_render_python_seq_s"] = round(
        64 / (time.perf_counter() - t0), 1)
    from polyphemus_tpu.midi.fast_render import render_midi_bytes
    if render_midi_bytes(tok_np[0], mask_np[0], cfg2.resolution) is not None:
        t0 = time.perf_counter()
        for i in range(256):
            render_midi_bytes(tok_np[i], mask_np[i], cfg2.resolution)
        report["midi_render_native_seq_s"] = round(
            256 / (time.perf_counter() - t0), 1)

    # 2. structure-conditioned
    s = load_structure_file("/root/reference/structure.json", 2, 4, 32)
    s_batch = jnp.asarray(np.broadcast_to(s, (256,) + s.shape))
    genc = make_generator(model2, vars2, conditioned=True, pallas=PALLAS)
    dt, _ = timed(genc, z256, s_batch, key="lmd2_conditioned_n256_seq_s")
    report["lmd2_conditioned_n256_seq_s"] = round(256 / dt, 1)
    checkpoint("conditioned")

if "gen" in STAGES or "lmd16" in STAGES:
    # 3. LMD16 + 4x looping (own stage flag: the 16-bar graph is the
    # slowest compile after a model change)
    cfg16, model16, vars16 = build(16)
    gen16 = make_generator(model16, vars16, pallas=PALLAS)
    z16 = jax.random.normal(jax.random.key(3), (64, cfg16.d))
    dt, out16 = timed(gen16, z16, key="lmd16_n64_seq_s")
    report["lmd16_n64_seq_s"] = round(64 / dt, 1)
    report["lmd16_gen_mfu_pct"] = round(
        F.mfu(64 / dt, F.generation_flops_per_seq(cfg16)), 1)
    m16, t16 = np.asarray(out16[0]), np.asarray(out16[1])
    t0 = time.perf_counter()
    song = song_from_tokens(t16[0], m16[0], cfg16.resolution)
    looped = loop_song(song, 4, 16, cfg16.resolution)
    report["lmd16_loop4_render_ms"] = round(
        (time.perf_counter() - t0) * 1e3, 2)
    checkpoint("lmd16")

    # chained device-compute at batch 256 (VERDICT r3 item 5): the same
    # dispatch-free methodology as lmd2_chained_*. Batch 256 beats the
    # legacy n=64 point by ~11% (round-4 sweep: 64->1490, 128->1559,
    # 256->1655 seq/s per-call; tile points 4..16 GCL x 8/16 tail all
    # within 1%, so batch size — not tiles — is the 16-bar lever).
    model16_ch = with_pallas(model16) if PALLAS else model16

    def chained16_fn(variables, cast):
        def chained(zs):
            def body(carry, z):
                _s, tokens, mask = model16_ch.apply(
                    variables, cast(z), method=VAE.decode_tokens)
                return carry + jnp.sum(tokens) + jnp.sum(mask), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), zs)
            return acc
        return tpu_jit(chained)

    zs16 = jax.random.normal(jax.random.key(6), (10, 256, cfg16.d))
    vars16_bf = as_bf16(vars16)
    for suffix, variables, cast in (
            ("", vars16, lambda z: z),
            ("_bf16", vars16_bf, lambda z: z.astype(jnp.bfloat16))):
        ch = chained16_fn(variables, cast)
        float(ch(zs16))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(ch(zs16))
            times.append((time.perf_counter() - t0) / 10)
        dt = float(np.median(times))
        report.setdefault("spread", {})[
            f"lmd16_chained_n256_seq_s{suffix}"] = round(
            (max(times) - min(times)) / dt, 3)
        report[f"lmd16_chained_n256_seq_s{suffix}"] = round(256 / dt, 1)
        report[f"lmd16_gen_device_mfu_pct{suffix}"] = round(
            F.mfu(256 / dt, F.generation_flops_per_seq(cfg16)), 1)
    checkpoint("lmd16_chained")

# 6. serving latency tiers: per-request wall time at each compiled tier
# batch size (serve.py routes n to the smallest tier >= n); p50/p95 over
# 20 calls each (VERDICT r2 item 8)
if "serve" in STAGES:
    for tier in (1, 8, 64):
        z_t = jax.random.normal(jax.random.key(40 + tier), (tier, cfg2.d))
        jax.block_until_ready(gen1(z_t))
        lat = []
        for _ in range(20):
            t0 = time.perf_counter()
            jax.block_until_ready(gen1(z_t))
            lat.append((time.perf_counter() - t0) * 1e3)
        report[f"serve_tier{tier}_p50_ms"] = round(
            float(np.percentile(lat, 50)), 3)
        report[f"serve_tier{tier}_p95_ms"] = round(
            float(np.percentile(lat, 95)), 3)
    checkpoint("serve_tiers")

    # concurrent mixed-tier throughput (VERDICT r3 item 7): 8 client
    # threads hammer the coalescing GenerationService with n in {1,3,20}
    # for a fixed wall window; rps/seq_s measured at the service layer
    # (the HTTP frame adds ~1 ms, covered by tests/test_serve.py).
    import tempfile
    import threading as _th

    from flax import serialization as _ser

    from polyphemus_tpu.config import save_train_config
    from polyphemus_tpu.serve import GenerationService

    _srv_dir = os.path.join(tempfile.gettempdir(), "bench_srv_model")
    os.makedirs(_srv_dir, exist_ok=True)
    with open(os.path.join(_srv_dir, "checkpoint.msgpack"), "wb") as f:
        f.write(_ser.to_bytes({"params": vars2["params"],
                               "batch_stats": vars2["batch_stats"]}))
    save_train_config(TrainConfig(model=cfg2),
                      os.path.join(_srv_dir, "config.json"))
    # round-5 (VERDICT r4 item 6): throughput-optimal default batch_cap
    # 256 — deep queues coalesce toward full-rate device calls while the
    # small tiers keep solo latency. Load-tested at 8 / 32 / 64 clients.
    svc = GenerationService(_srv_dir, batch_cap=256,
                            tiers=[1, 8, 64, 256], use_pallas=PALLAS)
    svc.warmup(all_tiers=True)

    for n_clients in (8, 32, 64):
        _stop = time.perf_counter() + 15.0
        _counts = [0] * n_clients
        _seqs = [0] * n_clients
        _lat: list = []
        _lat_lock = _th.Lock()

        def _client(i, stop=_stop, counts=_counts, seqs=_seqs, lat=_lat):
            sizes = [1, 1, 1, 1, 3, 3, 20, 20]
            n = sizes[i % len(sizes)]
            while time.perf_counter() < stop:
                q0 = time.perf_counter()
                svc.generate(n, seed=i * 1000 + counts[i])
                with _lat_lock:
                    lat.append((time.perf_counter() - q0) * 1e3)
                counts[i] += 1
                seqs[i] += n

        threads = [_th.Thread(target=_client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        sfx = "" if n_clients == 8 else f"_c{n_clients}"
        report[f"serve_throughput_rps{sfx}"] = round(sum(_counts) / dt, 2)
        report[f"serve_throughput_seq_s{sfx}"] = round(sum(_seqs) / dt, 1)
        report[f"serve_p95_ms{sfx}"] = round(
            float(np.percentile(_lat, 95)), 1) if _lat else None
        report[f"serve_coalesce_ratio{sfx}"] = round(
            svc.stats["requests"] / max(svc.stats["device_calls"], 1), 2)
    checkpoint("serve_concurrent")

    # Open-loop (offered-load) latency: the closed-loop numbers above are
    # Little's-law-bound (64 saturating clients MUST each wait ~clients/
    # throughput), so p95 there measures queue depth, not service quality.
    # The SLO question is p95 at an offered rate below capacity: 24
    # clients fire on fixed schedules totalling ~80 rps (~500 seq/s with
    # the same size mix); a client that falls behind skips to the next
    # future slot (counted) instead of compounding the backlog.
    _OL_CLIENTS, _OL_RPS, _OL_SECS = 24, 80.0, 15.0
    _period = _OL_CLIENTS / _OL_RPS
    _lat, _late = [], [0]
    _lat_lock = _th.Lock()
    _counts = [0] * _OL_CLIENTS
    _seqs = [0] * _OL_CLIENTS
    _t0 = time.perf_counter() + 0.5

    def _ol_client(i):
        sizes = [1, 1, 1, 1, 3, 3, 20, 20]
        n = sizes[i % len(sizes)]
        next_t = _t0 + (i / _OL_CLIENTS) * _period
        stop = _t0 + _OL_SECS
        while next_t < stop:
            now = time.perf_counter()
            if now < next_t:
                time.sleep(next_t - now)
            elif now - next_t > _period:  # fell behind: skip missed slots
                missed = int((now - next_t) / _period)
                with _lat_lock:
                    _late[0] += missed
                next_t += missed * _period
                continue
            q0 = time.perf_counter()
            svc.generate(n, seed=i * 7777 + _counts[i])
            with _lat_lock:
                _lat.append((time.perf_counter() - q0) * 1e3)
            _counts[i] += 1
            _seqs[i] += n
            next_t += _period

    threads = [_th.Thread(target=_ol_client, args=(i,))
               for i in range(_OL_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - _t0
    report["serve_openloop_offered_rps"] = _OL_RPS
    report["serve_openloop_rps"] = round(sum(_counts) / dt, 2)
    report["serve_openloop_seq_s"] = round(sum(_seqs) / dt, 1)
    report["serve_openloop_p50_ms"] = round(
        float(np.percentile(_lat, 50)), 1) if _lat else None
    report["serve_openloop_p95_ms"] = round(
        float(np.percentile(_lat, 95)), 1) if _lat else None
    report["serve_openloop_skipped_frac"] = round(
        _late[0] / max(_late[0] + sum(_counts), 1), 3)
    checkpoint("serve_openloop")


# 5. training step (fused Pallas kernels; accumulate to fit HBM)
import dataclasses

mcfg_tr = dataclasses.replace(cfg2, use_pallas_gcl=PALLAS)
model_tr = VAE(mcfg_tr)
tcfg = TrainConfig(batch_size=256, iters_to_accumulate=4, model=mcfg_tr)
toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)


def timed_train(cfg, key):
    """Median over 3 passes of 10 steps (scalar readback = the only
    reliable sync on the tunnel; 10/pass amortizes the fixed ~25 ms
    pass sync to ~2.5 ms/step — PERFORMANCE.md round-3 profile)."""
    state = create_train_state(model_tr, cfg, jax.random.key(0), toks, mask)
    step = tpu_jit(make_train_step(model_tr, cfg, make_optimizer(cfg)))
    float(step(state, toks, mask, jax.random.key(1))[1]["tot"])  # warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(10):
            state, losses, _ = step(state, toks, mask, jax.random.key(i))
        float(losses["tot"])
        times.append((time.perf_counter() - t0) / 10)
    med = float(np.median(times))
    report.setdefault("spread", {})[key] = round(
        (max(times) - min(times)) / med, 3)
    return med


if "train" in STAGES:
    dt = timed_train(tcfg, "train_step_s")
    report["train_step_s"] = round(dt, 4)
    report["train_seq_s"] = round(256 / dt, 1)
    report["train_gflops_per_seq"] = round(
        F.train_step_flops_per_seq(mcfg_tr) / 1e9, 2)
    report["train_mfu_pct"] = round(
        F.mfu(256 / dt, F.train_step_flops_per_seq(mcfg_tr)), 1)
    checkpoint("train_fp32")

    # 5b. bf16 training step (VERDICT r1 item 7). bf16 halves activation
    # HBM so microbatch 128 (accumulate 2) fits and beats accumulate 4
    # by ~8% (train_probe11); fp32 stays at 4.
    dt_bf = timed_train(dataclasses.replace(tcfg, bf16=True,
                                            iters_to_accumulate=2),
                        "train_step_s_bf16")
    report["train_step_s_bf16"] = round(dt_bf, 4)
    report["train_seq_s_bf16"] = round(256 / dt_bf, 1)
    report["train_mfu_pct_bf16"] = round(
        F.mfu(256 / dt_bf, F.train_step_flops_per_seq(mcfg_tr)), 1)

if "numerics" in STAGES and PALLAS:
    # On-hardware Pallas-vs-XLA numerical check (VERDICT r3 item 3). The
    # CPU suite only exercises interpret mode; Mosaic-compiled kernels can
    # miscompile in ways interpret mode can't see, so every bench run now
    # records (and BOUNDS) the deviation at the shipped tile sizes:
    # forward = the eval kernel at gcl_bars_per_block=8 chained 8 layers
    # (flagship depth, error compounds through the chain); backward = the
    # training custom_vjp's hand-written kernels via jax.grad. A breach
    # crashes the bench.
    from polyphemus_tpu.ops import lattice as _lat
    from polyphemus_tpu.ops.kernels import gcl_pallas as _gp

    # bounds = ~3x the round-4 on-hardware measurement (fwd 1.2e-2 bf16 /
    # 7.9e-3 f32 — both paths' fp32 matmuls are bf16-rounded on the MXU,
    # so "f32" deviation is accumulation-order noise, not kernel error;
    # bwd 7.4e-3 / 4.6e-3). A real miscompile produces O(1) errors.
    _TOL = {"fwd_bf16": 4e-2, "fwd_f32": 2.5e-2,
            "bwd_bf16": 2.5e-2, "bwd_f32": 1.5e-2}

    def _rel(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-9))

    _rng = np.random.default_rng(0)
    T_, S_, D_, NL = 4, 32, 512, 8
    _mask = _rng.random((256, 2, T_, S_)) < 0.15
    _mask[..., 0, 0] = True
    _x0 = (_rng.standard_normal((256, 2, T_, S_, D_)).astype(np.float32)
           * _mask[..., None])
    _gate = _rng.standard_normal((S_, D_)).astype(np.float32)
    _relw = (_rng.standard_normal((NL, 6, D_, D_)) * D_ ** -0.5
             ).astype(np.float32)
    _root = (_rng.standard_normal((NL, D_, D_)) * D_ ** -0.5
             ).astype(np.float32)
    _bias = (_rng.standard_normal((NL, D_)) * 0.1).astype(np.float32)
    _mj = jnp.asarray(_mask)

    def _fwd_xla(x, dt):
        x = x.astype(dt)
        nbr = _lat.build_neighbors(_mj)
        for i in range(NL):
            x = jax.nn.relu(_lat.gcl_apply(
                x, _mj, nbr, jnp.asarray(_gate, dt),
                jnp.asarray(_relw[i], dt), jnp.asarray(_root[i], dt),
                jnp.asarray(_bias[i], dt)))
        return x

    def _fwd_pal(x, dt):
        x = x.astype(dt)
        aux = _gp.build_kernel_aux(_mj)
        for i in range(NL):
            wbig = _gp.pack_weights(jnp.asarray(_relw[i], dt),
                                    jnp.asarray(_root[i], dt), T_, dt)
            x = jax.nn.relu(_gp.gcl_apply_pallas(
                x, aux, jnp.asarray(_gate, dt), wbig,
                jnp.asarray(_bias[i], dt), bars_per_block=8,
                interpret=False))
        return x

    # backward at a reduced batch (64) bounds the fresh grad-graph compile
    # inside the sandbox cap; the training kernels' internal tile sizes
    # depend on bars-per-block, not batch, so the shipped tiles still run
    _mask_b = jnp.asarray(_mask[:64])
    _x0_b = _x0[:64]
    _cot = _rng.standard_normal(_x0_b.shape).astype(np.float32)

    def _loss_xla(x, gate, rw, rt, bs, dt):
        nbr = _lat.build_neighbors(_mask_b)
        out = _lat.gcl_apply(x.astype(dt), _mask_b, nbr, gate.astype(dt),
                             rw.astype(dt), rt.astype(dt), bs.astype(dt))
        return jnp.sum(out.astype(jnp.float32) * _cot)

    def _loss_pal(x, gate, rw, rt, bs, dt):
        aux = _gp.build_kernel_aux(_mask_b)
        out = _gp.gcl_fused(x.astype(dt), gate.astype(dt), rw.astype(dt),
                            rt.astype(dt), bs.astype(dt), aux, _mask_b)
        return jnp.sum(out.astype(jnp.float32) * _cot)

    _xj = jnp.asarray(_x0)
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        ox = tpu_jit(_fwd_xla, static_argnums=1)(_xj, dt)
        op = tpu_jit(_fwd_pal, static_argnums=1)(_xj, dt)
        err = _rel(op, ox)
        report[f"pallas_fwd_rel_err_{dt_name}"] = round(err, 6)
        assert err <= _TOL[f"fwd_{dt_name}"], (
            f"Pallas forward {dt_name} rel_err {err} exceeds "
            f"{_TOL[f'fwd_{dt_name}']} — hardware-side kernel deviation")

        args = (jnp.asarray(_x0_b), jnp.asarray(_gate),
                jnp.asarray(_relw[0]), jnp.asarray(_root[0]),
                jnp.asarray(_bias[0]))
        gx = tpu_jit(jax.grad(_loss_xla, argnums=(0, 1, 2, 3, 4)),
                     static_argnums=5)(*args, dt)
        gp_ = tpu_jit(jax.grad(_loss_pal, argnums=(0, 1, 2, 3, 4)),
                      static_argnums=5)(*args, dt)
        errs = [_rel(a, b) for a, b in zip(gp_, gx)]
        err = max(errs)
        report[f"pallas_bwd_rel_err_{dt_name}"] = round(err, 6)
        report[f"pallas_bwd_rel_err_{dt_name}_per_arg"] = [
            round(e, 6) for e in errs]  # dx, dgate, drel, droot, dbias
        assert err <= _TOL[f"bwd_{dt_name}"], (
            f"Pallas backward {dt_name} rel_err {err} exceeds "
            f"{_TOL[f'bwd_{dt_name}']} — hardware-side kernel deviation")

    # bf16 decode deviation (VERDICT r3 item 6): same 256 z through the
    # fp32 and bf16 generators, then compare what a USER would get —
    # structure-mask cell flips and the note multiset (track, time, pitch,
    # duration) after full host decoding — so the headline bf16 generation
    # numbers carry a measured accuracy cost, not a "~1%" tilde.
    from collections import Counter

    gen16 = make_generator(model2, vars2, pallas=PALLAS, bf16=True)
    m32, t32 = jax.device_get(gen1(z256))
    m16, t16 = jax.device_get(gen16(z256))
    report["bf16_structure_flip_rate"] = round(
        float(np.mean(m32 != m16)), 6)

    def _note_multiset(tokens, mask):
        song = song_from_tokens(np.asarray(tokens), np.asarray(mask),
                                cfg2.resolution)
        c = Counter()
        for ti, tr in enumerate(song.tracks):
            for n in tr.notes:
                c[(ti, n.time, n.pitch, n.duration)] += 1
        return c

    n_diff = n_union = 0
    for i in range(z256.shape[0]):
        a = _note_multiset(t32[i], m32[i])
        b = _note_multiset(t16[i], m16[i])
        n_diff += sum(((a - b) + (b - a)).values())
        n_union += sum((a | b).values())
    report["bf16_note_multiset_diff_rate"] = round(
        n_diff / max(n_union, 1), 6)
    checkpoint("numerics")

print(json.dumps(report, indent=2))
checkpoint("final")
