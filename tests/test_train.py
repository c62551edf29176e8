"""Training loop: convergence smoke test, NaN guard, checkpoint resume,
8-device data-parallel sharding (fake CPU mesh)."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.config import Config, DataConfig
from bayesian_yolov3_tpu.data import encode
from bayesian_yolov3_tpu.train import loop as train_loop
from bayesian_yolov3_tpu.train.checkpoints import CheckpointStore

import synth

IMG = (64, 96, 3)


def _config(tmp_path, rng, model="standard", batch_size=2, **kw):
    pattern = synth.write_dataset(str(tmp_path / "data"), rng, n_images=6, img_hw=IMG[:2])
    defaults = dict(
        model=model,
        full_img_size=IMG,
        batch_size=batch_size,
        max_boxes_per_img=8,
        lr=1e-3,
        train_steps=10,
        checkpoint_interval=5,
        ckp_max_to_keep=3,
        checkpoint_path=str(tmp_path / "ckpt"),
        darknet53_weights="",  # random init in tests
        train=DataConfig(file_pattern=pattern, shuffle_buffer_size=4),
        val=DataConfig(file_pattern=pattern, shuffle_buffer_size=4),
    )
    defaults.update(kw)
    os.makedirs(tmp_path / "data", exist_ok=True)
    return Config(**defaults)


@pytest.fixture
def tmp_data(tmp_path, rng):
    os.makedirs(tmp_path / "data", exist_ok=True)
    return tmp_path


def test_train_runs_and_loss_decreases(tmp_data, rng):
    cfg = _config(tmp_data, rng, train_steps=30, lr=3e-3)
    trainer = train_loop.Trainer(cfg, seed=0)
    out = trainer.run()
    assert out["step"] == 30
    import json

    with open(trainer.metrics_path) as f:
        rows = [json.loads(l) for l in f]
    train_rows = [r for r in rows if r["split"] == "train"]
    assert train_rows and all(np.isfinite(r["total"]) for r in rows)
    # checkpoints exist at interval steps + final
    steps = trainer.store.all_steps()
    assert 5 in steps or 30 in steps


def test_frozen_backbone_params_unchanged(tmp_data, rng):
    cfg = _config(tmp_data, rng, train_steps=3)
    trainer = train_loop.Trainer(cfg, seed=0)
    state0 = trainer.fresh_state()
    w0 = np.asarray(state0["frozen"]["backbone"]["conv_00"]["w"])
    batch = trainer._place_batch(
        {
            "image": np.zeros((2, *IMG), np.uint8),
            "bbox": np.zeros((2, 8, 4), np.float32),
            "label": np.zeros((2, 8), np.int32),
            "valid": np.zeros((2, 8), bool),
        }
    )
    state1, m = trainer._jit_train(state0, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(state1["frozen"]["backbone"]["conv_00"]["w"]), w0)
    # trainable head params did move
    h0 = np.asarray(trainer.fresh_state()["params"]["det1"]["b"])
    h1 = np.asarray(state1["params"]["det1"]["b"])
    assert not np.allclose(h0, h1)


def test_split_train_step_matches_fused(tmp_data, rng):
    """The split-program hot loop (preprocess dispatched separately so
    batch i+1's preprocess overlaps step i — round-4) reproduces the fused
    train_step exactly: identical key derivation, identical GT tensors,
    identical params/metrics trajectory."""
    cfg = _config(tmp_data, rng, model="bayesian", train_steps=3)
    trainer = train_loop.Trainer(cfg, seed=0)
    batch = trainer._place_batch(
        {
            "image": (rng.uniform(0, 255, (2, *IMG))).astype(np.uint8),
            "bbox": np.asarray([[[0.1, 0.1, 0.5, 0.4]] * 8] * 2, np.float32),
            "label": np.ones((2, 8), np.int32),
            "valid": np.ones((2, 8), bool),
        }
    )
    key = jax.random.PRNGKey(3)

    fused = trainer.fresh_state()
    split = jax.tree.map(jnp.copy, fused)
    for i in range(3):
        fused, mf = trainer._jit_train(fused, batch, key)
        # the preprocess program's GT must be bitwise what the fused step
        # computed internally — same fold_in(rng, step) derivation
        imgs, gts = trainer._jit_pre(batch, key, np.int32(i))
        split, ms = trainer._jit_apply(split, imgs, gts, key)
        np.testing.assert_array_equal(
            np.asarray(mf["total"]), np.asarray(ms["total"]), f"step {i}")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        fused["params"], split["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        fused["stats"], split["stats"])


def test_nan_guard_aborts_and_saves(tmp_data, rng, monkeypatch):
    cfg = _config(tmp_data, rng, train_steps=50)
    trainer = train_loop.Trainer(cfg, seed=0)
    orig = trainer.fresh_state

    def poisoned():
        state = orig()
        state["params"]["det1"]["w"] = state["params"]["det1"]["w"] * jnp.nan
        return state

    monkeypatch.setattr(trainer, "fresh_state", poisoned)
    out = trainer.run()
    assert out["step"] < 50  # aborted early
    assert trainer.store.latest_step() is not None  # best-effort save happened


def test_checkpoint_resume_continues_from_step(tmp_data, rng):
    cfg = _config(tmp_data, rng, train_steps=6, checkpoint_interval=3)
    trainer = train_loop.Trainer(cfg, seed=0)
    trainer.run()
    assert trainer.store.latest_step() == 6

    cfg2 = _config(tmp_data, rng, train_steps=8, checkpoint_interval=3,
                   resume_training=True, resume_checkpoint="last")
    cfg2.run_id = cfg.run_id
    trainer2 = train_loop.Trainer(cfg2, seed=0)
    out = trainer2.run()
    assert out["step"] == 8
    assert int(out["state"]["step"]) == 8


@pytest.mark.parametrize("model", ["aleatoric", "bayesian"])
def test_uncertainty_variants_train(tmp_data, rng, model):
    cfg = _config(tmp_data, rng, model=model, train_steps=2, aleatoric_loss=True)
    trainer = train_loop.Trainer(cfg, seed=0)
    out = trainer.run()
    assert out["step"] == 2


def test_data_parallel_8_devices(tmp_data, rng):
    assert len(jax.devices()) == 8
    cfg = _config(tmp_data, rng, batch_size=8, train_steps=2)
    trainer = train_loop.Trainer(cfg, seed=0)
    assert trainer.mesh is not None and trainer.mesh.shape["data"] == 8
    out = trainer.run()
    assert out["step"] == 2
    # params stayed replicated across the mesh
    w = out["state"]["params"]["det1"]["w"]
    assert len(w.sharding.device_set) == 8


def test_warm_start_pretrain_to_uncertainty(tmp_data, rng):
    """Reference warm-start flow: pretraining checkpoint -> uncertainty
    fine-tune reusing ALL variables (uncertainty_training.py:11-12) —
    works because both variants share the aleatoric head structure."""
    cfg = _config(tmp_data, rng, model="aleatoric", train_steps=2)
    t1 = train_loop.Trainer(cfg, seed=0)
    out1 = t1.run()

    cfg2 = _config(tmp_data, rng, model="bayesian", train_steps=2, aleatoric_loss=True)
    cfg2.run_id = cfg.run_id
    t2 = train_loop.Trainer(cfg2, seed=1)
    state = t2.fresh_state()
    restored, step = t2.store.restore(jax.tree.map(np.asarray, state), step="last")
    assert step == 2
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["det1"]["w"]),
        np.asarray(out1["state"]["params"]["det1"]["w"]),
    )
