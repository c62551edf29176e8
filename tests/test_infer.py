"""End-to-end inference runner tests: train a couple of steps, write a
checkpoint, run tfrecords -> ECP JSON for all three variants."""

import copy
import glob
import json
import os

import numpy as np
import pytest

from bayesian_yolov3_tpu.config import Config, DataConfig
from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
from bayesian_yolov3_tpu.infer import ecp
from bayesian_yolov3_tpu.infer.runner import InferenceRunner
from bayesian_yolov3_tpu.train import loop as train_loop

import synth

IMG = (64, 96, 3)


def _trained_checkpoint(tmp_path, rng, model, **kw):
    pattern = synth.write_dataset(str(tmp_path / "data"), rng, n_images=4, img_hw=IMG[:2])
    cfg = Config(
        model=model,
        full_img_size=IMG,
        batch_size=2,
        max_boxes_per_img=8,
        train_steps=2,
        checkpoint_interval=2,
        checkpoint_path=str(tmp_path / "ckpt"),
        darknet53_weights="",
        run_id=f"{model}_run",
        train=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        val=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        data=DataConfig(file_pattern=pattern),
        **kw,
    )
    train_loop.Trainer(cfg, seed=0).run()
    return cfg, pattern


@pytest.mark.parametrize("model,inference_mode,width", [
    ("standard", False, 9),
    ("aleatoric", False, 16),
    ("bayesian", True, 23),
])
def test_runner_writes_ecp_json(tmp_path, rng, model, inference_mode, width):
    cfg, pattern = _trained_checkpoint(tmp_path, rng, model)
    cfg.inference_mode = inference_mode
    cfg.T = 4
    cfg.batch_size = 2
    cfg.nms_max_boxes = 50
    cfg.out_path = str(tmp_path / "out" / model)
    os.makedirs(os.path.dirname(cfg.out_path), exist_ok=True)

    runner = InferenceRunner(cfg)
    out_dir = runner.run()
    assert out_dir.endswith("_2")  # step suffix parity

    files = sorted(glob.glob(os.path.join(out_dir, "*.json")))
    assert len(files) == 4  # one JSON per input image
    dets = json.load(open(files[0]))["children"]
    assert isinstance(dets, list)
    if dets:
        d = dets[0]
        assert {"y0", "x0", "y1", "x1", "score", "identity", "cls_scores"} <= set(d)
        if model == "standard":
            # quirk-fixed keys the reference emits from wrong columns
            assert {"layer_id", "prior_id"} <= set(d)
            assert d["layer_id"] in (0.0, 1.0, 2.0)
            assert d["prior_id"] in (0.0, 1.0, 2.0)
        if model == "aleatoric":
            assert {"x_var", "total_var", "obj_entropy", "cls_entropy",
                    "layer_id", "prior_id"} <= set(d)
        if model == "bayesian":
            assert {"x_var_epi", "x_var_ale", "obj_mutual_info", "cls_mutual_info",
                    "ped_score", "rider_score", "total_var_epi"} <= set(d)
        # coordinates are in pixels
        assert -64 <= d["y0"] <= 128 and -96 <= d["x0"] <= 192


def test_ecp_format_epistemic_columns(rng):
    spec = VariantSpec(Variant.BAYESIAN, 2)
    row = np.arange(23, dtype=np.float32) / 23.0
    d = ecp.bbox_to_ecp_format(row, (100, 200, 3), spec, epistemic=True)
    assert d["y0"] == pytest.approx(row[0] * 100)
    assert d["x1"] == pytest.approx(row[3] * 200)
    assert d["x_var_epi"] == pytest.approx(row[4])
    assert d["x_var_ale"] == pytest.approx(row[8])
    assert d["obj_mutual_info"] == pytest.approx(row[15])
    assert d["ped_score"] == pytest.approx(row[17])
    assert d["rider_score"] == pytest.approx(row[18])
    assert d["cls_mutual_info"] == pytest.approx(row[19])
    assert d["layer_id"] == pytest.approx(row[21])
    assert d["prior_id"] == pytest.approx(row[22])
    # identity: argmax class (rider, idx 1) shifted +1 -> 'rider'
    assert d["identity"] == "rider"
    assert d["score"] == pytest.approx(row[14] * row[18])


def test_ecp_format_standard_no_uncertainty_fields():
    spec = VariantSpec(Variant.STANDARD, 2)
    row = np.asarray([0.1, 0.2, 0.3, 0.4, 0.9, 0.8, 0.2, 1.0, 2.0], np.float32)
    d = ecp.bbox_to_ecp_format(row, (64, 96, 3), spec)
    assert "x_var" not in d and "obj_entropy" not in d
    assert d["identity"] == "pedestrian"
    assert d["score"] == pytest.approx(0.9 * 0.8)
    # the keys the reference writes (from wrong columns) — here correct
    assert d["layer_id"] == 1.0 and d["prior_id"] == 2.0


def test_packed_host_input_guard(tmp_path, rng):
    """packed_host_input demands the fused single-device TPU path; on CPU
    (and any other ineligible configuration) the runner refuses loudly
    instead of silently falling back to a different device program."""
    cfg, _ = _trained_checkpoint(tmp_path, rng, "aleatoric")
    cfg.packed_host_input = True
    cfg.out_path = str(tmp_path / "out" / "packed")
    os.makedirs(os.path.dirname(cfg.out_path), exist_ok=True)
    runner = InferenceRunner(cfg)
    with pytest.raises(ValueError, match="packed_host_input"):
        runner.run()


def test_fixed_mc_masks_runner_deterministic(tmp_path, rng):
    """fixed_mc_masks: two full runner passes (fresh runner objects, fresh
    rng streams) over the same tfrecords produce byte-identical ECP JSON.
    Round 5: the mc-sharded FUSED path now composes (determinism held on
    the mesh too — full parity in test_mc_sharded); the GSPMD fallback
    and the sp mesh still reject the flag instead of silently ignoring it."""
    cfg, _ = _trained_checkpoint(tmp_path, rng, "bayesian")
    cfg.inference_mode = True
    cfg.T = 4
    cfg.batch_size = 1
    cfg.nms_max_boxes = 20
    cfg.fixed_mc_masks = 3

    def run_once(tag, seed):
        cfg.out_path = str(tmp_path / "out" / tag)
        os.makedirs(os.path.dirname(cfg.out_path), exist_ok=True)
        out_dir = InferenceRunner(cfg, seed=seed).run()
        files = sorted(glob.glob(os.path.join(out_dir, "*.json")))
        return [open(f, "rb").read() for f in files]

    a = run_once("fixed_a", seed=1)
    b = run_once("fixed_b", seed=2)  # different rng seed must not matter
    assert a and a == b

    cfg.T = 8  # divides the mc axis (mesh must cover all 8 test devices)
    cfg.mesh_shape = {"mc": 8}
    # the fused mc-sharded pipeline composes with fixed masks (round 5):
    # same determinism contract — two sharded passes, different seeds,
    # byte-identical JSON
    sa = run_once("fixed_mc_a", seed=3)
    sb = run_once("fixed_mc_b", seed=4)
    assert sa and sa == sb

    # the GSPMD fallback (use_pallas=False) still rejects the flag
    cfg.use_pallas = False
    cfg.out_path = str(tmp_path / "out" / "fixed_mc_xla")
    with pytest.raises(ValueError, match="fixed_mc_masks"):
        InferenceRunner(cfg)
    cfg.use_pallas = True


def test_wrong_variant_checkpoint_fails_loudly(tmp_path, rng):
    """Loading a standard-trained checkpoint into an aleatoric inference
    config must raise a clear shape-mismatch error at restore (the det
    convs are 21 vs 42 wide), not a shape assert deep inside the first
    compiled kernel.  Orbax restores saved shapes when untargeted, so
    the check lives in CheckpointStore.restore_partial (round 5; the
    reference's tf.train.Saver fails loudly at the same point)."""
    cfg, _ = _trained_checkpoint(tmp_path, rng, "standard")
    cfg_bad = copy.deepcopy(cfg)
    cfg_bad.model = "aleatoric"
    runner = InferenceRunner(cfg_bad)
    with pytest.raises(ValueError, match="does not match this model"):
        runner.load_state()
