#!/usr/bin/env python
"""Standard YOLOv3 training (parity with the reference yolov3_training.py)."""

from _common import build_config, setup_logging

from bayesian_yolov3_tpu.infer.qualitative import qualitative_eval
from bayesian_yolov3_tpu.train import Trainer
from bayesian_yolov3_tpu.utils import add_file_logging

DEFAULTS = {
    "model": "standard",
    "run_id": "yolo",  # edit
    "priors": "ecp",  # edit
    "checkpoint_path": "./checkpoints",
    "log_path": "./log",
    "ckp_max_to_keep": 102,
    "checkpoint_interval": 5000,
    "ign_thresh": 0.7,
    "crop_img_size": [768, 1440, 3],
    "full_img_size": [1024, 1920, 3],  # edit if not ECP dataset
    "train_steps": 500000,  # edit
    "darknet53_weights": "./darknet53.conv.74",
    "batch_size": 8,  # edit
    "lr": 1e-5,
    "crop": True,
    "freeze_darknet53": True,
    "aleatoric_loss": False,
    "cls_cnt": 2,
    "implicit_background_class": True,
    "train": {  # edit
        "file_pattern": "./data/ecp-day-train-*-of-*",
        "num_shards": 20,
        "shuffle_buffer_size": 2000,
        "cache": False,
    },
    "val": {  # edit
        "file_pattern": "./data/ecp-day-val-*-of-*",
        "num_shards": 4,
        "shuffle_buffer_size": 10,
        "cache": False,
    },
}


def main():
    setup_logging()
    config = build_config(DEFAULTS)
    add_file_logging(config, override_existing=True)
    if config.training:
        Trainer(config).run()
    else:
        # parity: training=False runs the qualitative eval loop
        qualitative_eval(config)


if __name__ == "__main__":
    main()
