"""Round-3 fix regressions (VERDICT.md r2 weak items + ADVICE.md):

  * Trainer.resume restores val_losses/val_accuracies histories;
  * the metric buffer drains at a bounded interval, so NaN detection
    latency is capped even with sparse print/eval/save boundaries;
  * preprocess_midi_dataset's n_files cap is exact across directories;
  * the fastloader parses npy headers with ast.literal_eval (no eval);
  * the serving layer routes requests to latency tiers and bounds the
    generator cache with quantized temperature keys.
"""
import dataclasses
import os

import numpy as np
import pytest

from polyphemus_tpu.config import TrainConfig

from .test_train import SMALL, _reconstruction_batch


# -------------------------------------------------------- resume val history
def test_resume_restores_val_histories(tmp_path):
    import jax

    from polyphemus_tpu.models import VAE
    from polyphemus_tpu.parallel import mesh as pmesh
    from polyphemus_tpu.train.trainer import Trainer, create_train_state

    mesh = pmesh.make_mesh(1)
    model = VAE(SMALL.model)
    trainer = Trainer(str(tmp_path), model, SMALL, mesh=mesh,
                      log_fn=lambda *a: None)
    rng = np.random.default_rng(0)
    toks, mask = _reconstruction_batch(rng, 4, SMALL)
    state = trainer.init_state(jax.random.key(0), toks, mask)
    trainer.val_losses["tot"] = [3.0, 2.5]
    trainer.val_accuracies["note"] = [0.1, 0.2]
    trainer._save(state, "checkpoint")

    t2 = Trainer(str(tmp_path), model, SMALL, mesh=mesh,
                 log_fn=lambda *a: None)
    template = create_train_state(model, SMALL, jax.random.key(1), toks, mask)
    t2.resume(template)
    assert t2.val_losses["tot"] == [3.0, 2.5]
    assert t2.val_accuracies["note"] == [0.1, 0.2]


# ------------------------------------------------------- bounded drain cadence
@pytest.mark.slow
def test_drain_cadence_bounded(tmp_path):
    import jax

    from polyphemus_tpu.models import VAE
    from polyphemus_tpu.parallel import mesh as pmesh
    from polyphemus_tpu.train.trainer import Trainer

    mesh = pmesh.make_mesh(1)
    model = VAE(SMALL.model)
    # print/save boundaries far beyond the run length: only the pending cap
    # can trigger drains
    trainer = Trainer(str(tmp_path), model, SMALL, mesh=mesh,
                      print_every=10_000, save_every=0,
                      log_fn=lambda *a: None)
    trainer._max_pending = 3
    rng = np.random.default_rng(1)
    toks, mask = _reconstruction_batch(rng, 8, SMALL)
    state = trainer.init_state(jax.random.key(0), toks, mask)

    def it():
        for _ in range(7):
            yield toks, mask

    trainer.fit(state, it, epochs=1)
    # all 7 steps drained (final drain flushes the tail) and the buffer
    # never grew past the cap mid-run
    assert len(trainer.tr_losses["tot"]) == 7
    assert len(trainer._pending) == 0


# ----------------------------------------------------------- n_files cap
def test_preprocess_n_files_cap_exact(tmp_path, capsys):
    from polyphemus_tpu.data.preprocess import preprocess_midi_dataset

    src = tmp_path / "midi"
    for sub in ("a", "b", "c"):
        os.makedirs(src / sub)
        for i in range(2):
            # invalid MIDI: gets skipped, but still counts as a visited file
            (src / sub / f"{sub}{i}.mid").write_bytes(b"not midi")
    dest = tmp_path / "out"
    preprocess_midi_dataset(str(src), str(dest), n_bars=2, resolution=8,
                            n_files=3)
    out = capsys.readouterr().out
    assert "Preprocessed 3 files" in out


# --------------------------------------------------------- fastloader header
def test_fastloader_header_parse_no_eval():
    import inspect

    from polyphemus_tpu.data import fastloader

    src = inspect.getsource(fastloader)
    assert "ast.literal_eval" in src
    assert "\neval(" not in src and " eval(" not in src


# ------------------------------------------------------------- serving tiers
def test_service_tier_routing_and_cache_bound(tmp_path):
    from polyphemus_tpu.serve import GenerationService

    from .test_generate_cli import save_native_model

    model_dir = save_native_model(tmp_path)
    svc = GenerationService(model_dir, batch_cap=8)
    assert svc.tiers == [1, 8]
    assert svc.tier_for(1) == 1
    assert svc.tier_for(2) == 8
    assert svc.tier_for(8) == 8
    with pytest.raises(ValueError):
        svc.tier_for(9)

    # n=1 rides the tier-1 program; outputs come back correctly sliced
    mask, tokens = svc.generate(1, seed=3)
    assert mask.shape[0] == 1 and tokens.shape[0] == 1
    assert (1, 0.0, 0.0, False) in svc._gens

    # temperature quantization: 0.500001 and 0.5 share one compiled program
    svc.generate(1, seed=3, content_temp=0.500001)
    svc.generate(1, seed=3, content_temp=0.5)
    keys = [k for k in svc._gens if k[2] == 0.5]
    assert len(keys) == 1

    # the cache is bounded (evicts oldest beyond the cap)
    import polyphemus_tpu.serve as serve_mod
    old = serve_mod._MAX_CACHED_GENERATORS
    try:
        serve_mod._MAX_CACHED_GENERATORS = 2
        svc.generate(1, seed=0, content_temp=0.1)
        svc.generate(1, seed=0, content_temp=0.2)
        svc.generate(1, seed=0, content_temp=0.3)
        assert len(svc._gens) <= 2
    finally:
        serve_mod._MAX_CACHED_GENERATORS = old


def test_bench_preprocess_script(tmp_path):
    """scripts/bench_preprocess.py runs the full host pipeline end-to-end
    and merges the BASELINE-tracked graphs/sec metric into bench_report.json
    (run in a tmp cwd with a tiny corpus)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, POLY_BENCH_PRE_FILES="4", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "bench_preprocess.py")],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads((tmp_path / "bench_report.json").read_text())
    assert report["preprocess_files_s"] > 0
    assert report["preprocess_graphs_s"] > 0
