"""qualitative_eval tests: stacked-same-image mode, all three variants.

Reference parity: lib_yolo/utils.qualitative_eval (:126-153) reads the
val split through ValDataset, which stacks the SAME image batch_size x
into one batch (lib_yolo/dataset_utils.py:88-95, applied at :177) so MC
dropout variation is visible across the stacked copies.  These tests run
the public qualitative_eval API (no private runner internals) for the
standard / aleatoric / bayesian variants, with and without cropping.
"""

import os

import numpy as np
import pytest

from bayesian_yolov3_tpu.config import Config, DataConfig
from bayesian_yolov3_tpu.infer.qualitative import qualitative_eval
from bayesian_yolov3_tpu.train import loop as train_loop

import synth


def _train_tiny(tmp_path, rng, model, run_id, **cfg_kw):
    img_hw = cfg_kw.pop("img_hw", (64, 96))
    pattern = synth.write_dataset(
        str(tmp_path / f"data_{run_id}"), rng, n_images=4, img_hw=img_hw
    )
    cfg = Config(
        model=model,
        full_img_size=(*img_hw, 3),
        batch_size=2,
        max_boxes_per_img=8,
        train_steps=2,
        checkpoint_interval=2,
        checkpoint_path=str(tmp_path / "ckpt"),
        darknet53_weights="",
        run_id=run_id,
        thresh=0.0,
        nms_max_boxes=10,
        train=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        val=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        **cfg_kw,
    )
    train_loop.Trainer(cfg, seed=0).run()
    return cfg


def _png(path):
    from PIL import Image

    return np.asarray(Image.open(path))


def test_stacked_standard_no_crop(tmp_path, rng):
    """Standard variant, no crop: the stack goes through ONE batched
    dispatch; with dropout inactive at test time the copies must be
    bit-identical (the reference's stacked graph is equally deterministic
    for this variant)."""
    cfg = _train_tiny(tmp_path, rng, "standard", "qstd")
    out = qualitative_eval(cfg, n_images=2, out_dir=str(tmp_path / "q"))
    # batch_size=2 -> 2 stacked copies per image
    assert len(out) == 2 * 2
    assert all(os.path.exists(p) for p in out)
    assert "_s0_" in out[0] and "_s1_" in out[1]
    assert np.array_equal(_png(out[0]), _png(out[1]))


def test_stacked_aleatoric_with_crop(tmp_path, rng):
    """Aleatoric variant through the crop path: qualitative_eval rebuilds
    the device config at crop size with crop-rescaled priors (reference
    utils.py:127-129) and center-crops each val image on the host."""
    cfg = _train_tiny(
        tmp_path, rng, "aleatoric", "qalea",
        img_hw=(128, 192), crop=True, crop_img_size=(64, 96, 3),
    )
    out = qualitative_eval(cfg, n_images=2, out_dir=str(tmp_path / "q"))
    assert len(out) == 2 * 2
    # drawn images are crop-sized
    assert _png(out[0]).shape == (64, 96, 3)


def test_stacked_bayesian_copies_vary(tmp_path, rng):
    """Bayesian variant (epistemic inference): stacked copies draw
    independent MC-dropout masks, so their rendered detections differ —
    the visible-variation property the reference's stacking exists for."""
    cfg = _train_tiny(tmp_path, rng, "bayesian", "qbay", T=3)
    out = qualitative_eval(cfg, n_images=1, out_dir=str(tmp_path / "q"))
    assert len(out) == 2
    assert not np.array_equal(_png(out[0]), _png(out[1]))


def test_stack_disabled_batch1(tmp_path, rng):
    """stack_same_image=False keeps the one-PNG-per-image behavior."""
    cfg = _train_tiny(tmp_path, rng, "standard", "qflat")
    out = qualitative_eval(
        cfg, n_images=2, out_dir=str(tmp_path / "q"), stack_same_image=False
    )
    assert len(out) == 2
    assert "_s0_" not in out[0]
