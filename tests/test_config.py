"""Config surface: reference-key compatibility, JSON round-trips."""

import json

import numpy as np
import pytest

from bayesian_yolov3_tpu.config import Config, DataConfig


def test_reference_config_dict_loads():
    """A config dict written for the reference (pretraining.py:9-45 key
    surface) loads as-is."""
    ref_style = {
        "run_id": "pretrain",
        "ckp_max_to_keep": 102,
        "checkpoint_interval": 5000,
        "ign_thresh": 0.7,
        "crop_img_size": [768, 1440, 3],
        "full_img_size": [1024, 1920, 3],
        "train_steps": 500000,
        "darknet53_weights": "./darknet53.conv.74",
        "batch_size": 8,
        "lr": 1e-5,
        "cpu_thread_cnt": 24,
        "crop": True,
        "freeze_darknet53": True,
        "aleatoric_loss": False,
        "cls_cnt": 2,
        "implicit_background_class": True,
        "training": True,
        "priors": "ecp",
        "train": {"file_pattern": "x-*", "num_shards": 20,
                  "shuffle_buffer_size": 2000, "cache": False},
        "val": {"file_pattern": "y-*", "num_shards": 4,
                "shuffle_buffer_size": 10, "cache": False},
        "unknown_key_is_ignored": 42,
    }
    cfg = Config.from_dict(ref_style)
    assert cfg.batch_size == 8 and cfg.crop and cfg.ign_thresh == 0.7
    assert cfg.train.file_pattern == "x-*" and cfg.val.num_shards == 4
    assert not hasattr(cfg, "unknown_key_is_ignored")
    bp = cfg.blueprint()
    assert bp.img_size == (768, 1440)


def test_config_json_snapshot_roundtrip():
    cfg = Config(model="bayesian", T=42, mesh_shape={"mc": 4})
    blob = cfg.to_json()
    d = json.loads(blob)
    cfg2 = Config.from_dict(d)
    assert cfg2.T == 42 and cfg2.model == "bayesian"
    assert cfg2.mesh_shape == {"mc": 4}


def test_variant_spec_indices_match_reference():
    """obj_idx / cls_start_idx magic numbers (yolov3.py:183-184,321-322,
    464-465)."""
    std = Config(model="standard").variant_spec
    ale = Config(model="aleatoric").variant_spec
    bay = Config(model="bayesian").variant_spec
    assert (std.obj_idx(), std.cls_start_idx()) == (4, 5)
    assert (ale.obj_idx(), ale.cls_start_idx()) == (9, 11)
    assert (bay.obj_idx(), bay.cls_start_idx()) == (9, 11)  # training decode
    assert (bay.obj_idx(True), bay.cls_start_idx(True)) == (14, 17)
    assert std.head_channels_per_prior == 7
    assert ale.head_channels_per_prior == 14
