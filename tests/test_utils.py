"""Utility coverage: param table, step timer, plotting from metadata."""
import json

import numpy as np

from polyphemus_tpu import plotting
from polyphemus_tpu.utils import StepTimer, param_count, print_params, set_seed


def test_print_params():
    tree = {"a": {"kernel": np.zeros((3, 4)), "bias": np.zeros(4)},
            "b": {"kernel": np.zeros((4, 2))}}
    lines = []
    total = print_params(tree, log_fn=lines.append)
    assert total == 12 + 4 + 8 == param_count(tree)
    assert any("a.kernel" in ln for ln in lines)
    assert any("24" in ln for ln in lines)


def test_step_timer():
    t = StepTimer(window=3)
    assert t.tick() is None
    for _ in range(5):
        dt = t.tick()
        assert dt is not None and dt >= 0
    assert len(t.times) == 3
    assert t.steps_per_sec > 0


def test_set_seed_reproducible():
    set_seed(7)
    a = np.random.rand(3)
    set_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_plot_losses_and_accs(tmp_path):
    meta = {
        "tr_losses": {"tot": [3.0, 2.5, 2.0], "pitch": [1.0, 0.9, 0.8]},
        "tr_accuracies": {"note": [0.1, 0.2, 0.3]},
        "val_losses": {"tot": [2.6]},
        "val_accuracies": {"note": [0.25]},
    }
    with open(tmp_path / "checkpoint.json", "w") as f:
        json.dump(meta, f)
    plotting.plot_losses(str(tmp_path), ["tot", "pitch"], plot_val=True,
                         save_path=str(tmp_path / "l.png"))
    plotting.plot_accuracies(str(tmp_path), ["note"], plot_val=True,
                             save_path=str(tmp_path / "a.png"))
    assert (tmp_path / "l.png").exists()
    assert (tmp_path / "a.png").exists()


def test_plot_structure_and_pianoroll(tmp_path):
    """Smoke: the two generation-side plots (reference plots.py:11-71)
    render and write their files for a random mask / a tiny Song."""
    from polyphemus_tpu.midi.song import Note, Song, Track

    rng = np.random.default_rng(0)
    mask = rng.random((2, 4, 32)) < 0.2
    plotting.plot_structure(mask, save_dir=str(tmp_path), name="s")
    assert (tmp_path / "s.svg").exists()

    song = Song(resolution=8, tracks=[
        Track(name="Bass", program=33, is_drum=False,
              notes=[Note(time=0, pitch=40, duration=8, velocity=64),
                     Note(time=8, pitch=43, duration=4, velocity=64)]),
        Track(name="Drums", program=0, is_drum=True,
              notes=[Note(time=0, pitch=36, duration=1, velocity=64)]),
    ])
    plotting.plot_pianoroll(song, save_dir=str(tmp_path), name="p")
    assert (tmp_path / "p.png").exists()


def test_generate_helpers_as_bf16_and_with_pallas():
    """as_bf16 casts only floating leaves; with_pallas preserves the param
    tree and is a no-op when already enabled (generate.py helpers shared by
    make_generator and the chained benchmark)."""
    import jax.numpy as jnp

    from polyphemus_tpu.config import ModelConfig
    from polyphemus_tpu.generate import as_bf16, with_pallas
    from polyphemus_tpu.models import VAE

    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "n": jnp.ones((2,), jnp.int32),
            "h": jnp.ones((2,), jnp.bfloat16)}
    out = as_bf16(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["n"].dtype == jnp.int32  # ints untouched
    assert out["h"].dtype == jnp.bfloat16

    m = VAE(ModelConfig(d=16, gnn_n_layers=1, n_bars=1, resolution=8))
    mp = with_pallas(m)
    assert mp.cfg.use_pallas_gcl and not m.cfg.use_pallas_gcl
    assert with_pallas(mp) is mp  # no-op when already enabled
    # identical param tree: everything except the pallas switch matches
    import dataclasses
    assert dataclasses.replace(mp.cfg, use_pallas_gcl=False) == m.cfg


def test_wait_for_backend_returns_device_count():
    # Responsive backend (conftest's 8 virtual CPU devices): returns the
    # count immediately, no TimeoutError. The wedged-tunnel path is
    # exercised for real by the dryrun (see __graft_entry__ and CLAUDE.md).
    import jax

    from polyphemus_tpu.utils import wait_for_backend

    assert wait_for_backend(deadline_s=60.0) == len(jax.devices())
