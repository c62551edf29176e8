"""Data-parallel batched inference over a fake 8-device mesh (CPU).

parallel/batch.py: mesh_shape={'dp': N} runs the complete fused
single-device pipeline per device on batch/N local images — zero
collectives, so sharded results must match single-device EXACTLY for
deterministic variants (same convs, same decode, same NMS per image).
"""

import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import synth
from bayesian_yolov3_tpu.config import Config, DataConfig
from bayesian_yolov3_tpu.core.priors import priors_as_array
from bayesian_yolov3_tpu.infer.runner import InferenceRunner
from bayesian_yolov3_tpu.models.yolov3 import YoloV3, forward_cf
from bayesian_yolov3_tpu.ops import nms
from bayesian_yolov3_tpu.ops.pallas_decode import fused_box_decode_all_scales
from bayesian_yolov3_tpu.parallel import mesh as mesh_lib
from bayesian_yolov3_tpu.parallel.batch import make_dp_batched_pipeline

IMG = (64, 96, 3)


def _single_device_batched(m, params, stats, imgs, pri, obj_idx, qh=None,
                           max_out=20):
    """The fused pipeline run image-by-image at batch 1 — exactly the
    program each dp device executes on its local shard (XLA:CPU conv
    reduction order depends on batch size, so a batch-N comparison
    target would differ by ~1e-7 and reorder near-tie NMS picks)."""
    rows, valid = [], []
    for b in range(imgs.shape[0]):
        img = imgs[b : b + 1]
        if qh is not None:
            from bayesian_yolov3_tpu.models.quant import forward_cf_q

            outs = forward_cf_q(qh, params, stats, img, spec=m.spec,
                                compute_dtype=jnp.float32)
        else:
            outs = forward_cf(params, stats, img, spec=m.spec,
                              compute_dtype=jnp.float32)
        flat = fused_box_decode_all_scales(outs, pri, spec=m.spec,
                                           interpret=True)
        r_, v_ = nms.nms_select_batch(flat, obj_idx, max_out, 0.5,
                                      pre_top_k=0, use_pallas=True,
                                      interpret=True)[:2]
        rows.append(np.asarray(r_[0]))
        valid.append(np.asarray(v_[0]))
    return np.stack(rows), np.stack(valid)


def test_dp_batched_matches_single_device():
    """8-way dp sharding of an aleatoric batch-8 forward: per-image
    results identical to the single-device pipeline (no collectives, no
    cross-image math — exact agreement expected)."""
    assert len(jax.devices()) == 8
    cfg = Config(model="aleatoric", full_img_size=IMG,
                 compute_dtype="float32", darknet53_weights="")
    m = YoloV3.from_config(cfg)
    params, stats = m.init(jax.random.PRNGKey(0))
    pri = priors_as_array(m.priors)
    obj_idx = m.spec.obj_idx(False)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (8, *IMG)).astype(np.float32))

    want_rows, want_valid = _single_device_batched(
        m, params, stats, imgs, pri, obj_idx)

    mesh = mesh_lib.make_mesh({"dp": 8})
    fn = make_dp_batched_pipeline(
        m, mesh, priors_by_stride=pri, obj_idx=obj_idx, nms_max_boxes=20,
        interpret=True,
    )
    params_r = jax.device_put(params, mesh_lib.replicated(mesh))
    stats_r = jax.device_put(stats, mesh_lib.replicated(mesh))
    got_rows, got_valid = fn(params_r, stats_r, imgs, None)

    np.testing.assert_array_equal(np.asarray(got_valid),
                                  np.asarray(want_valid))
    np.testing.assert_allclose(np.asarray(got_rows), np.asarray(want_rows),
                               rtol=1e-5, atol=1e-6)


def test_dp_batched_bayesian_dropout_runs():
    """The bayesian (non-inference-mode) variant draws per-device folded
    dropout keys — executability + finiteness (masks differ from single
    device by design; parity is covered by the deterministic variant)."""
    assert len(jax.devices()) == 8
    cfg = Config(model="bayesian", full_img_size=IMG,
                 compute_dtype="float32", darknet53_weights="")
    m = YoloV3.from_config(cfg)
    params, stats = m.init(jax.random.PRNGKey(0))
    pri = priors_as_array(m.priors)
    mesh = mesh_lib.make_mesh({"dp": 8})
    fn = make_dp_batched_pipeline(
        m, mesh, priors_by_stride=pri, obj_idx=m.spec.obj_idx(False),
        nms_max_boxes=20, interpret=True,
    )
    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (8, *IMG)).astype(np.float32))
    rows, valid = fn(params, stats, imgs, jax.random.PRNGKey(7))
    assert rows.shape[0] == 8
    assert np.isfinite(np.asarray(rows)[np.asarray(valid)].sum())


def test_runner_dp_end_to_end_with_int8(tmp_path, rng):
    """mesh_shape={'dp': 8} through the production runner, with and
    without int8: ECP JSON out, and dp+int8 predict matches the
    single-device int8 runner on the same calibration."""
    pattern = synth.write_dataset(str(tmp_path / "data"), rng, n_images=8,
                                  img_hw=IMG[:2])
    base = dict(
        model="aleatoric", full_img_size=IMG, batch_size=8,
        max_boxes_per_img=8, train_steps=2, checkpoint_interval=2,
        checkpoint_path=str(tmp_path / "ckpt"), darknet53_weights="",
        run_id="dprun", nms_max_boxes=20, compute_dtype="float32",
        train=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        val=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        data=DataConfig(file_pattern=pattern),
    )
    from bayesian_yolov3_tpu.train import loop as train_loop

    train_loop.Trainer(Config(**base), seed=0).run()

    cfg = Config(**base)
    cfg.mesh_shape = {"dp": 8}
    cfg.out_path = str(tmp_path / "out")
    runner = InferenceRunner(cfg)
    assert runner.dp_mesh is not None
    out_dir = runner.run()
    files = sorted(glob.glob(os.path.join(out_dir, "*.json")))
    assert len(files) == 8
    for f in files:
        for d in json.load(open(f))["children"]:
            assert np.isfinite(d["score"])

    # int8 over dp: calibrate once, compare against the SAME fused
    # per-device program run on one device (comparing against the CPU
    # runner's XLA decode path instead would reorder NMS picks on this
    # random-ish model's near-tie scores — different decode
    # implementation, not a dp defect)
    params, stats, _ = runner.load_state()
    img_u8 = (rng.uniform(0, 255, (8, *IMG))).astype(np.uint8)

    cfg_q = Config(**base)
    cfg_q.mesh_shape = {"dp": 8}
    cfg_q.quantize = "int8"
    dp_q = InferenceRunner(cfg_q)
    dp_q.calibrate_int8(params, stats, img_u8[:1])
    rows_m, valid_m = dp_q.predict(params, stats, img_u8,
                                   jax.random.PRNGKey(3))

    m = dp_q.model
    pri = priors_as_array(m.priors)
    imgs_f = jnp.asarray(img_u8).astype(jnp.float32) / 255.0
    rows_s, valid_s = _single_device_batched(
        m, params, stats, imgs_f, pri, m.spec.obj_idx(False),
        qh=dp_q._qheads, max_out=base["nms_max_boxes"])
    np.testing.assert_array_equal(valid_m, valid_s)
    np.testing.assert_allclose(rows_m, rows_s, rtol=1e-5, atol=1e-6)


def test_dp_use_pallas_false_xla_twin():
    """use_pallas=False on the dp path runs the XLA decode/NMS twin per
    device (the kernel-bisection escape hatch every other path honors)."""
    assert len(jax.devices()) == 8
    cfg = Config(model="aleatoric", full_img_size=IMG,
                 compute_dtype="float32", darknet53_weights="")
    m = YoloV3.from_config(cfg)
    params, stats = m.init(jax.random.PRNGKey(0))
    pri = priors_as_array(m.priors)
    mesh = mesh_lib.make_mesh({"dp": 8})
    fn = make_dp_batched_pipeline(
        m, mesh, priors_by_stride=pri, obj_idx=m.spec.obj_idx(False),
        nms_max_boxes=20, use_pallas=False, interpret=True,
    )
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (8, *IMG)).astype(np.float32))
    rows, valid = fn(params, stats, imgs, None)
    assert rows.shape[0] == 8
    assert np.isfinite(np.asarray(rows)[np.asarray(valid)].sum())


def test_dp_validation_errors():
    """dp is the batched throughput axis: epistemic, mixed axes,
    non-divisible batches, and the packed feed all reject."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    with pytest.raises(ValueError, match="batch-1"):
        InferenceRunner(Config(model="bayesian", inference_mode=True,
                               full_img_size=IMG, T=8,
                               mesh_shape={"dp": 8},
                               darknet53_weights=""))
    with pytest.raises(ValueError, match="compose"):
        InferenceRunner(Config(model="aleatoric", full_img_size=IMG,
                               mesh_shape={"dp": 4, "sp": 2},
                               darknet53_weights=""))
    with pytest.raises(ValueError, match="divide"):
        InferenceRunner(Config(model="aleatoric", full_img_size=IMG,
                               batch_size=11, mesh_shape={"dp": 8},
                               darknet53_weights=""))
    with pytest.raises(ValueError, match="packed"):
        InferenceRunner(Config(model="aleatoric", full_img_size=IMG,
                               batch_size=8, mesh_shape={"dp": 8},
                               packed_host_input=True,
                               darknet53_weights=""))