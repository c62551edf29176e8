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
