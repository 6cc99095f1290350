"""Training stack: smoke training decreases loss; schedules; checkpoints;
data-parallel + tensor-parallel train step on the 8-device CPU mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyphemus_tpu.config import (BetaSchedulerConfig, LRSchedulerConfig,
                                   ModelConfig, ParallelConfig, TrainConfig)
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.parallel import mesh as pmesh
from polyphemus_tpu.train import checkpoint as ckpt
from polyphemus_tpu.train.schedules import beta_schedule, lr_schedule
from polyphemus_tpu.train.trainer import (Trainer, create_train_state,
                                          make_optimizer, make_train_step)

SMALL = TrainConfig(
    batch_size=8,
    model=ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                      dropout=0.0, batch_norm=True),
)


def test_lr_schedule_semantics():
    cfg = LRSchedulerConfig(peak_lr=1e-4, warmup_steps=10,
                            final_lr_scale=0.01, decay_steps=100)
    # parity: constant peak during warmup
    assert float(lr_schedule(cfg, 1)) == pytest.approx(1e-4)
    assert float(lr_schedule(cfg, 10)) == pytest.approx(1e-4)
    # after decay_steps past warmup: peak * final_scale
    assert float(lr_schedule(cfg, 110)) == pytest.approx(1e-6, rel=1e-3)
    # fixed mode ramps
    cfg2 = dataclasses.replace(cfg, ramp_warmup=True)
    assert float(lr_schedule(cfg2, 5)) == pytest.approx(5e-5)


def test_beta_schedule_semantics():
    cfg = BetaSchedulerConfig(anneal_start=100, anneal_end=1000,
                              beta_max=0.01, step_size=0.001)
    assert float(beta_schedule(cfg, 50)) == 0.0
    assert float(beta_schedule(cfg, 100)) == pytest.approx(0.001)
    assert float(beta_schedule(cfg, 5000)) == pytest.approx(0.01)  # capped
    assert float(beta_schedule(cfg, 500, ref_parity=True)) == 0.0


def _reconstruction_batch(rng, bs, cfg):
    """Batch whose targets are learnable (repeated sample)."""
    toks, mask = synthetic_batch(rng, 1, cfg.model.n_bars, density=0.3)
    toks = np.repeat(toks, bs, axis=0)
    mask = np.repeat(mask, bs, axis=0)
    return jnp.asarray(toks), jnp.asarray(mask)


@pytest.mark.slow
def test_training_reduces_loss():
    cfg = dataclasses.replace(
        SMALL, lr_scheduler=LRSchedulerConfig(peak_lr=5e-3, warmup_steps=1000,
                                              final_lr_scale=0.01,
                                              decay_steps=10000),
        optimizer=dataclasses.replace(SMALL.optimizer, lr=5e-3))
    model = VAE(cfg.model)
    rng = np.random.default_rng(0)
    toks, mask = _reconstruction_batch(rng, 8, cfg)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)))
    first = None
    for i in range(60):
        state, losses, accs = step(state, toks, mask, jax.random.key(i))
        if first is None:
            first = float(losses["reconstruction"])
    last = float(losses["reconstruction"])
    assert np.isfinite(last)
    assert last < first * 0.6, (first, last)
    assert set(losses) == {"tot", "pitch", "dur", "structure",
                           "reconstruction", "kld", "beta*kld"}
    assert set(accs) == {"note", "pitch", "pitch_drums", "pitch_non_drums",
                         "dur", "s_acc", "s_precision", "s_recall", "s_f1"}


@pytest.mark.slow
def test_checkpoint_roundtrip_and_resume(tmp_path):
    model = VAE(SMALL.model)
    rng = np.random.default_rng(1)
    toks, mask = _reconstruction_batch(rng, 4, SMALL)
    state = create_train_state(model, SMALL, jax.random.key(0), toks, mask)
    step = jax.jit(make_train_step(model, SMALL, make_optimizer(SMALL)))
    state, losses, _ = step(state, toks, mask, jax.random.key(1))

    ckpt.save_checkpoint(str(tmp_path), "checkpoint", state,
                         {"tot_batches": 1, "min_val_loss": 2.5})
    template = create_train_state(model, SMALL, jax.random.key(9), toks, mask)
    restored, meta = ckpt.load_checkpoint(str(tmp_path), "checkpoint",
                                          template)
    assert meta["tot_batches"] == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # stepping the restored state gives identical results to the original
    s1, l1, _ = step(state, toks, mask, jax.random.key(2))
    s2, l2, _ = step(restored, toks, mask, jax.random.key(2))
    assert float(l1["tot"]) == pytest.approx(float(l2["tot"]), rel=1e-6)


@pytest.mark.slow
def test_async_save_survives_donation(tmp_path):
    """AsyncSaver writes the state AS OF the snapshot even while the
    donating train step recycles the live buffers underneath it."""
    model = VAE(SMALL.model)
    rng = np.random.default_rng(2)
    toks, mask = _reconstruction_batch(rng, 4, SMALL)
    state = create_train_state(model, SMALL, jax.random.key(0), toks, mask)
    step = jax.jit(make_train_step(model, SMALL, make_optimizer(SMALL)),
                   donate_argnums=(0,))

    ref_params = jax.device_get(state.params)
    snap = jax.jit(lambda s: s)(state)
    saver = ckpt.AsyncSaver()
    saver.submit(snap, str(tmp_path), "checkpoint", {"tot_batches": 3})
    for i in range(3):  # donation recycles state's buffers while in flight
        state, _, _ = step(state, toks, mask, jax.random.key(i))
    saver.wait()

    template = create_train_state(model, SMALL, jax.random.key(9), toks,
                                  mask)
    restored, meta = ckpt.load_checkpoint(str(tmp_path), "checkpoint",
                                          template)
    assert meta["tot_batches"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the snapshot is stale: live params have moved on
    live = jax.device_get(state.params)
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                                jax.tree_util.tree_leaves(live)))
    assert moved


def test_async_save_error_propagates(tmp_path):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file occupying the model_dir path")
    saver = ckpt.AsyncSaver()
    saver.submit({"x": np.zeros(3)}, str(blocker), "checkpoint", {})
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        saver.wait()


@pytest.mark.parametrize("model_axis", [1, 2, 4])
@pytest.mark.slow
def test_multichip_train_step(model_axis):
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    cfg = dataclasses.replace(
        SMALL, batch_size=16,
        model=dataclasses.replace(SMALL.model, d=64),
        parallel=ParallelConfig(model_axis=model_axis))
    mesh = pmesh.make_mesh(model_axis)
    model = VAE(cfg.model)
    rng = np.random.default_rng(2)
    toks, mask = _reconstruction_batch(rng, cfg.batch_size, cfg)

    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    state = jax.device_put(state, pmesh.param_sharding(mesh, state))
    bsh = pmesh.batch_sharding(mesh)
    toks_s = jax.device_put(toks, bsh)
    mask_s = jax.device_put(mask, bsh)
    step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)),
                   in_shardings=(None, bsh, bsh, None))
    new_state, losses, accs = step(state, toks_s, mask_s, jax.random.key(1))
    assert np.isfinite(float(losses["tot"]))

    # gradients match the single-device step
    cfg1 = dataclasses.replace(cfg, parallel=ParallelConfig(model_axis=1))
    state1 = create_train_state(model, cfg1, jax.random.key(0), toks, mask)
    step1 = jax.jit(make_train_step(model, cfg1, make_optimizer(cfg1)))
    _, losses1, _ = step1(state1, toks, mask, jax.random.key(1))
    assert float(losses["tot"]) == pytest.approx(float(losses1["tot"]),
                                                 rel=2e-4)


@pytest.mark.slow
def test_grad_accum_matches_reference_semantics():
    cfg_a = dataclasses.replace(SMALL, iters_to_accumulate=2)
    model = VAE(cfg_a.model)
    rng = np.random.default_rng(3)
    toks, mask = _reconstruction_batch(rng, 8, cfg_a)
    state = create_train_state(model, cfg_a, jax.random.key(0), toks, mask)
    step = jax.jit(make_train_step(model, cfg_a, make_optimizer(cfg_a)))
    new_state, losses, _ = step(state, toks, mask, jax.random.key(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(losses["tot"]))


def test_grad_accum_rejects_non_divisible_batch():
    """batch_size % iters_to_accumulate != 0 must raise, not silently drop
    the remainder samples (the reference never drops any,
    training.py:149-158). Round-5 fix: previously tokens[:mb*accum]
    truncated 2 of 10 samples without warning."""
    cfg = dataclasses.replace(SMALL, batch_size=10, iters_to_accumulate=4)
    model = VAE(cfg.model)
    rng = np.random.default_rng(7)
    toks, mask = synthetic_batch(rng, 10, cfg.model.n_bars)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)))
    with pytest.raises(ValueError, match="not divisible"):
        step(state, toks, mask, jax.random.key(1))


def test_grad_accum_every_sample_contributes():
    """With a divisible batch (10, accum=5) perturbing ONLY the last sample
    changes the gradients — i.e. no sample is dropped."""
    cfg = dataclasses.replace(SMALL, batch_size=10, iters_to_accumulate=5)
    model = VAE(cfg.model)
    rng = np.random.default_rng(8)
    toks, mask = synthetic_batch(rng, 10, cfg.model.n_bars)
    toks2 = np.array(toks)
    t2, m2 = synthetic_batch(np.random.default_rng(99), 1, cfg.model.n_bars)
    toks2[9:10] = t2
    mask2 = np.array(mask)
    mask2[9:10] = m2
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)))
    s_a, losses_a, _ = step(state, toks, mask, jax.random.key(1))
    s_b, losses_b, _ = step(state, jnp.asarray(toks2), jnp.asarray(mask2),
                            jax.random.key(1))
    # same first 9 samples, different 10th -> different loss AND params
    assert float(losses_a["tot"]) != pytest.approx(float(losses_b["tot"]))
    pd = max(float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                             jax.tree_util.tree_leaves(s_b.params)))
    assert pd > 0.0


@pytest.mark.slow
def test_trainer_fit_smoke(tmp_path):
    mesh = pmesh.make_mesh(1)
    model = VAE(SMALL.model)
    trainer = Trainer(str(tmp_path), model, SMALL, mesh=mesh,
                      print_every=2, save_every=4, log_fn=lambda *a: None)
    rng = np.random.default_rng(4)
    toks, mask = _reconstruction_batch(rng, 8, SMALL)
    state = trainer.init_state(jax.random.key(0), toks, mask)

    def it():
        for _ in range(3):
            yield toks, mask

    state = trainer.fit(state, it, epochs=2, early_exit=4)
    assert ckpt.latest_exists(str(tmp_path))
    assert len(trainer.tr_losses["tot"]) == 5  # early_exit after batch 5
    # resume restores counters
    t2 = Trainer(str(tmp_path), model, SMALL, mesh=mesh,
                 log_fn=lambda *a: None)
    template = create_train_state(model, SMALL, jax.random.key(1), toks, mask)
    restored = t2.resume(template)
    assert t2.tot_batches >= 4
