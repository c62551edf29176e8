"""MC-sample-parallel inference over a fake 8-device mesh (CPU)."""

import glob
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.config import Config, DataConfig
from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
from bayesian_yolov3_tpu.core.priors import ECP_9_PRIORS
from bayesian_yolov3_tpu.models.yolov3 import YoloV3
from bayesian_yolov3_tpu.parallel import mesh as mesh_lib
from bayesian_yolov3_tpu.parallel.epistemic import make_mc_sharded_forward

import synth

IMG = (64, 96, 3)


def test_mc_sharded_forward_matches_single_device():
    """Sharding T over 8 devices must not change the samples: the same
    per-sample keys drive the same dropout masks."""
    assert len(jax.devices()) == 8
    m = YoloV3(spec=VariantSpec(Variant.BAYESIAN, 2), priors=ECP_9_PRIORS, img_size=IMG)
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, *IMG)).astype(np.float32)
    )
    T = 8
    key = jax.random.PRNGKey(3)

    want = m.mc_forward(params, stats, img, T=T, rng=key)

    mesh = mesh_lib.make_mesh({"mc": 8})
    params_r = jax.device_put(params, mesh_lib.replicated(mesh))
    stats_r = jax.device_put(stats, mesh_lib.replicated(mesh))
    img_r = jax.device_put(img, mesh_lib.replicated(mesh))
    fwd = make_mc_sharded_forward(m, mesh, T=T)
    got = fwd(params_r, stats_r, img_r, key)

    for g, w in zip(got, want):
        assert len(g.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)


def test_runner_mc_sharded_end_to_end(tmp_path, rng):
    """Full epistemic inference with mesh_shape={'mc': 8} -> ECP JSON."""
    from bayesian_yolov3_tpu.infer.runner import InferenceRunner
    from bayesian_yolov3_tpu.train import loop as train_loop

    pattern = synth.write_dataset(str(tmp_path / "data"), rng, n_images=2, img_hw=IMG[:2])
    cfg = Config(
        model="bayesian",
        full_img_size=IMG,
        batch_size=1,
        max_boxes_per_img=8,
        train_steps=2,
        checkpoint_interval=2,
        checkpoint_path=str(tmp_path / "ckpt"),
        darknet53_weights="",
        run_id="mcshard",
        T=8,
        inference_mode=True,
        nms_max_boxes=20,
        mesh_shape={"mc": 8},
        train=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        val=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        data=DataConfig(file_pattern=pattern),
    )
    cfg.inference_mode = False
    train_loop.Trainer(cfg, seed=0).run()
    cfg.inference_mode = True
    cfg.out_path = str(tmp_path / "out")

    runner = InferenceRunner(cfg)
    assert runner.mesh is not None and runner.mesh.shape["mc"] == 8
    out_dir = runner.run()
    files = sorted(glob.glob(os.path.join(out_dir, "*.json")))
    assert len(files) == 2
    dets = json.load(open(files[0]))["children"]
    assert dets and "obj_mutual_info" in dets[0]

def test_runner_mc_sharded_xla_fallback(tmp_path, rng):
    """mesh_shape={'mc':8} with use_pallas=False takes the GSPMD (XLA
    decode) branch of the runner's device program — the non-Pallas
    multi-chip route (runner._device_pipeline mesh branch)."""
    from bayesian_yolov3_tpu.infer.runner import InferenceRunner
    from bayesian_yolov3_tpu.train import loop as train_loop

    pattern = synth.write_dataset(str(tmp_path / "data"), rng, n_images=2, img_hw=IMG[:2])
    cfg = Config(
        model="bayesian",
        full_img_size=IMG,
        batch_size=1,
        max_boxes_per_img=8,
        train_steps=2,
        checkpoint_interval=2,
        checkpoint_path=str(tmp_path / "ckpt"),
        darknet53_weights="",
        run_id="mcxla",
        T=8,
        nms_max_boxes=20,
        mesh_shape={"mc": 8},
        use_pallas=False,
        train=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        val=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        data=DataConfig(file_pattern=pattern),
    )
    train_loop.Trainer(cfg, seed=0).run()
    cfg.inference_mode = True
    cfg.out_path = str(tmp_path / "out")

    runner = InferenceRunner(cfg)
    assert runner.mesh is not None and runner._mc_fused is None  # XLA branch
    out_dir = runner.run()
    files = sorted(glob.glob(os.path.join(out_dir, "*.json")))
    assert len(files) == 2
    dets = json.load(open(files[0]))["children"]
    assert dets and "obj_mutual_info" in dets[0]


def test_mc_sharded_fused_pipeline_matches_single_device():
    """The shard_map fused path (partial moments -> psum -> finalize -> NMS)
    must reproduce the single-device fused pipeline: same per-sample keys,
    same dropout masks, moments differ only by summation order.

    Uses threefry keys: threefry random bits are invariant to the vmap batch
    layout, so T-vmap-on-one-device == (T/N)-vmap-per-device exactly.  The
    production rbg PRNG is NOT layout-invariant (its bits depend on the
    batch shape) — with rbg the sharded path draws different, statistically
    equivalent masks, which is fine for MC-dropout but untestable bit-wise."""
    from bayesian_yolov3_tpu.core.priors import priors_as_array
    from bayesian_yolov3_tpu.models.yolov3 import mc_forward_cf
    from bayesian_yolov3_tpu.ops import decode as decode_ops
    from bayesian_yolov3_tpu.ops import nms as nms_lib
    from bayesian_yolov3_tpu.ops.pallas_epistemic import fused_epistemic_decode_cf_batched
    from bayesian_yolov3_tpu.parallel.epistemic import make_mc_sharded_fused_pipeline

    assert len(jax.devices()) == 8
    m = YoloV3(spec=VariantSpec(Variant.BAYESIAN, 2), priors=ECP_9_PRIORS, img_size=IMG)
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, *IMG)).astype(np.float32)
    )
    T = 8
    key = jax.random.PRNGKey(3)  # threefry: vmap-layout-invariant bits
    pri = priors_as_array(m.priors)
    obj_idx = m.spec.obj_idx(epistemic=True)

    # single-device fused reference
    outs = mc_forward_cf(params, stats, img, spec=m.spec, T=T, rng=key)
    flat = jnp.concatenate(
        [
            fused_epistemic_decode_cf_batched(
                r, jnp.asarray(pri[st]), n_imgs=1, h=hw[0], w=hw[1],
                cls_cnt=2, layer_id=i, interpret=True,
            )
            for i, ((r, hw), st) in enumerate(zip(outs, (32, 16, 8)))
        ],
        axis=1,
    )
    want_rows, want_valid, _ = nms_lib.nms_select(
        flat[0], obj_idx, 20, 0.5, use_pallas=True, interpret=True
    )

    mesh = mesh_lib.make_mesh({"mc": 8})
    fn = make_mc_sharded_fused_pipeline(
        m, mesh, T=T, priors_by_stride=pri, obj_idx=obj_idx,
        nms_max_boxes=20, interpret=True,
    )
    params_r = jax.device_put(params, mesh_lib.replicated(mesh))
    stats_r = jax.device_put(stats, mesh_lib.replicated(mesh))
    img_r = jax.device_put(img, mesh_lib.replicated(mesh))
    got_rows, got_valid = fn(params_r, stats_r, img_r, key)

    np.testing.assert_array_equal(np.asarray(got_valid[0]), np.asarray(want_valid))
    np.testing.assert_allclose(
        np.asarray(got_rows[0]), np.asarray(want_rows), rtol=1e-4, atol=1e-5
    )


SEED = 123  # fixed_mc_masks seed shared with the single-device quant tests


def _single_device_fused_reference(m, params, stats, img, T, pri, obj_idx,
                                   qh=None, fixed_masks=None, key=None):
    """Single-device fused pipeline (the runner's fused branch, interpret
    mode) — the parity target for the sharded variants below."""
    from bayesian_yolov3_tpu.models.quant import mc_forward_cf_q
    from bayesian_yolov3_tpu.models.yolov3 import mc_forward_cf
    from bayesian_yolov3_tpu.ops import nms as nms_lib
    from bayesian_yolov3_tpu.ops.pallas_epistemic import (
        fused_epistemic_decode_cf_batched,
    )

    if qh is not None:
        outs = mc_forward_cf_q(qh, params, stats, img, spec=m.spec, T=T,
                               rng=key, fixed_masks=fixed_masks,
                               compute_dtype=jnp.float32)
    else:
        outs = mc_forward_cf(params, stats, img, spec=m.spec, T=T, rng=key,
                             fixed_masks=fixed_masks)
    flat = jnp.concatenate(
        [
            fused_epistemic_decode_cf_batched(
                r, jnp.asarray(pri[st]), n_imgs=1, h=hw[0], w=hw[1],
                cls_cnt=2, layer_id=i, interpret=True,
            )
            for i, ((r, hw), st) in enumerate(zip(outs, (32, 16, 8)))
        ],
        axis=1,
    )
    return nms_lib.nms_select(flat[0], obj_idx, 20, 0.5, use_pallas=True,
                              interpret=True)[:2]


def test_mc_sharded_fused_fixed_masks_matches_single_device():
    """fixed_mc_masks over the mc mesh (VERDICT r4 #4): the sharded
    constant-key table draws the SAME masks as the single-device
    fixed-mask run — deterministic serving survives sharding."""
    from bayesian_yolov3_tpu.core.priors import priors_as_array
    from bayesian_yolov3_tpu.parallel.epistemic import (
        make_mc_sharded_fused_pipeline,
    )

    assert len(jax.devices()) == 8
    m = YoloV3(spec=VariantSpec(Variant.BAYESIAN, 2), priors=ECP_9_PRIORS,
               img_size=IMG, compute_dtype="float32")
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, *IMG)).astype(np.float32)
    )
    T = 8
    pri = priors_as_array(m.priors)
    obj_idx = m.spec.obj_idx(epistemic=True)

    want_rows, want_valid = _single_device_fused_reference(
        m, params, stats, img, T, pri, obj_idx, fixed_masks=SEED)

    mesh = mesh_lib.make_mesh({"mc": 8})
    fn = make_mc_sharded_fused_pipeline(
        m, mesh, T=T, priors_by_stride=pri, obj_idx=obj_idx,
        nms_max_boxes=20, interpret=True, fixed_masks=SEED,
    )
    params_r = jax.device_put(params, mesh_lib.replicated(mesh))
    stats_r = jax.device_put(stats, mesh_lib.replicated(mesh))
    img_r = jax.device_put(img, mesh_lib.replicated(mesh))
    got_rows, got_valid = fn(params_r, stats_r, img_r, None)
    # determinism across calls (rng arg is ignored with fixed masks)
    again_rows, again_valid = fn(params_r, stats_r, img_r, None)
    np.testing.assert_array_equal(np.asarray(got_rows), np.asarray(again_rows))
    np.testing.assert_array_equal(np.asarray(got_valid), np.asarray(again_valid))

    np.testing.assert_array_equal(np.asarray(got_valid[0]),
                                  np.asarray(want_valid))
    np.testing.assert_allclose(
        np.asarray(got_rows[0]), np.asarray(want_rows), rtol=1e-4, atol=1e-5
    )


def test_mc_sharded_fused_int8_matches_single_device():
    """quantize="int8" over the mc mesh (VERDICT r4 #4): per-device int8
    head sections + psum'd f32 moments reproduce the single-device int8
    pipeline (fixed masks pin identical dropout in both)."""
    from bayesian_yolov3_tpu.core.priors import priors_as_array
    from bayesian_yolov3_tpu.ops.quant import calibrate_mc_amax, quantize_heads
    from bayesian_yolov3_tpu.parallel.epistemic import (
        make_mc_sharded_fused_pipeline,
    )

    assert len(jax.devices()) == 8
    m = YoloV3(spec=VariantSpec(Variant.BAYESIAN, 2), priors=ECP_9_PRIORS,
               img_size=IMG, compute_dtype="float32")
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, *IMG)).astype(np.float32)
    )
    T = 8
    pri = priors_as_array(m.priors)
    obj_idx = m.spec.obj_idx(epistemic=True)
    amax = calibrate_mc_amax(params, stats, img, spec=m.spec, T=T,
                             rng=jax.random.PRNGKey(1))
    qh = quantize_heads(params, stats, m.spec, amax)

    want_rows, want_valid = _single_device_fused_reference(
        m, params, stats, img, T, pri, obj_idx, qh=qh, fixed_masks=SEED)

    mesh = mesh_lib.make_mesh({"mc": 8})
    fn = make_mc_sharded_fused_pipeline(
        m, mesh, T=T, priors_by_stride=pri, obj_idx=obj_idx,
        nms_max_boxes=20, interpret=True, fixed_masks=SEED,
    )
    params_r = jax.device_put(params, mesh_lib.replicated(mesh))
    stats_r = jax.device_put(stats, mesh_lib.replicated(mesh))
    img_r = jax.device_put(img, mesh_lib.replicated(mesh))
    got_rows, got_valid = fn(params_r, stats_r, img_r, None, qh)

    np.testing.assert_array_equal(np.asarray(got_valid[0]),
                                  np.asarray(want_valid))
    np.testing.assert_allclose(
        np.asarray(got_rows[0]), np.asarray(want_rows), rtol=1e-4, atol=1e-5
    )


def test_runner_mc_sharded_int8_fixed_end_to_end(tmp_path, rng):
    """mesh_shape={'mc':8} + quantize='int8' + fixed_mc_masks through the
    production runner (the VERDICT r4 #4 composition): runs, writes ECP
    JSON, and predict() matches the single-device int8+fixed runner."""
    from bayesian_yolov3_tpu.infer.runner import InferenceRunner
    from bayesian_yolov3_tpu.train import loop as train_loop

    pattern = synth.write_dataset(str(tmp_path / "data"), rng, n_images=2,
                                  img_hw=IMG[:2])
    base = dict(
        model="bayesian", full_img_size=IMG, batch_size=1,
        max_boxes_per_img=8, train_steps=2, checkpoint_interval=2,
        checkpoint_path=str(tmp_path / "ckpt"), darknet53_weights="",
        run_id="mcq", T=8, nms_max_boxes=20, compute_dtype="float32",
        train=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        val=DataConfig(file_pattern=pattern, shuffle_buffer_size=2),
        data=DataConfig(file_pattern=pattern),
    )
    train_loop.Trainer(Config(**base), seed=0).run()

    cfg = Config(**base)
    cfg.inference_mode = True
    cfg.quantize = "int8"
    cfg.quant_calib_images = 1
    cfg.fixed_mc_masks = SEED
    cfg.mesh_shape = {"mc": 8}
    cfg.out_path = str(tmp_path / "out")
    runner = InferenceRunner(cfg)
    assert runner._mc_fused is not None
    out_dir = runner.run()
    files = sorted(glob.glob(os.path.join(out_dir, "*.json")))
    assert len(files) == 2
    dets = json.load(open(files[0]))["children"]
    assert dets and "obj_mutual_info" in dets[0]

    # predict() parity vs the single-device int8+fixed runner
    params, stats, _ = runner.load_state()
    img_u8 = (rng.uniform(0, 255, (1, *IMG))).astype(np.uint8)
    rows_m, valid_m = runner.predict(params, stats, img_u8,
                                     jax.random.PRNGKey(5))

    cfg1 = Config(**base)
    cfg1.inference_mode = True
    cfg1.quantize = "int8"
    cfg1.fixed_mc_masks = SEED
    single = InferenceRunner(cfg1)
    single._qheads = runner._qheads  # same calibration
    rows_s, valid_s = single.predict(params, stats, img_u8,
                                     jax.random.PRNGKey(5))
    np.testing.assert_array_equal(valid_m, valid_s)
    np.testing.assert_allclose(rows_m[valid_m], rows_s[valid_s],
                               rtol=1e-4, atol=1e-5)
