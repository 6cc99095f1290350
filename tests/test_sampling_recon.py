"""Temperature sampling + reconstruction/interpolation CLIs."""
import pytest
import numpy as np

from polyphemus_tpu.cli.interpolate import main as interp_main
from polyphemus_tpu.cli.reconstruct import main as recon_main
from polyphemus_tpu.data.preprocess import pack_track
from polyphemus_tpu.generate import make_generator
from polyphemus_tpu.midi import Note

from .test_generate_cli import CFG, save_native_model


@pytest.mark.slow
def test_temperature_sampling_varies(tmp_path):
    import jax

    from polyphemus_tpu.generate import load_model

    model_dir = save_native_model(tmp_path)
    model, variables, cfg = load_model(model_dir)
    z = jax.random.normal(jax.random.key(0), (4, cfg.model.d))

    det = make_generator(model, variables)
    m0, t0 = det(z)
    m0b, t0b = det(z)
    assert (np.asarray(m0) == np.asarray(m0b)).all()  # deterministic

    hot = make_generator(model, variables, structure_temp=1.0,
                         content_temp=1.0, sample_seed=7)
    m1, t1 = hot(z)
    hot2 = make_generator(model, variables, structure_temp=1.0,
                          content_temp=1.0, sample_seed=8)
    m2, t2 = hot2(z)
    # different seeds -> different structures (overwhelmingly likely)
    assert (np.asarray(m1) != np.asarray(m2)).any()
    # repeated calls to the SAME stochastic generator draw fresh noise
    # (per-call fold_in; a baked key would reuse identical noise)
    m1b, t1b = hot(z)
    assert ((np.asarray(m1) != np.asarray(m1b)).any()
            or (np.asarray(t1) != np.asarray(t1b)).any())
    # sampled content differs from argmax content somewhere active
    both = np.asarray(m0) & np.asarray(m1)
    if both.any():
        assert (np.asarray(t1)[both] != np.asarray(t0)[both]).any()


def _write_sample(path, n_bars=2):
    notes = [Note(0, 60, 4), Note(8, 64, 4), Note(33, 40, 8)]
    content, acts = pack_track(notes, n_bars * 32)
    c = np.stack([content] * 4)       # same content on all 4 tracks
    s = np.stack([acts] * 4)
    np.savez(path, c_tensor=c, s_tensor=s)


def test_reconstruct_cli(tmp_path):
    model_dir = save_native_model(tmp_path)
    sample = tmp_path / "sample.npz"
    _write_sample(str(sample))
    out = tmp_path / "rec"
    recon_main([model_dir, str(sample) + ".npz"
                if not str(sample).endswith(".npz") else str(sample),
                str(out)])
    assert (out / "0" / "original.mid").exists()
    assert (out / "0" / "reconstructed.mid").exists()


def test_interpolate_cli(tmp_path):
    model_dir = save_native_model(tmp_path)
    out = tmp_path / "interp"
    interp_main([model_dir, str(out), "--steps", "3", "--slerp"])
    for i in range(3):
        assert (out / f"step_{i:02d}.mid").exists()
