#!/usr/bin/env python
"""Aleatoric pretraining on crops (parity with the reference pretraining.py).

Trains `yolov3_aleatoric` WITHOUT the aleatoric loss on random crops — the
warm-start stage before uncertainty_training.py.
"""

from _common import build_config, setup_logging

from bayesian_yolov3_tpu.infer.qualitative import qualitative_eval
from bayesian_yolov3_tpu.train import Trainer
from bayesian_yolov3_tpu.utils import add_file_logging

DEFAULTS = {
    "model": "aleatoric",
    "run_id": "pretrain",  # edit
    "priors": "ecp",  # edit
    "checkpoint_path": "./checkpoints",  # edit
    "tensorboard_path": "./tensorboard",  # edit
    "log_path": "./log",  # edit
    "ckp_max_to_keep": 102,  # edit
    "checkpoint_interval": 5000,
    "ign_thresh": 0.7,
    "crop_img_size": [768, 1440, 3],
    "full_img_size": [1024, 1920, 3],  # edit if not ECP dataset
    "train_steps": 500000,  # edit
    "darknet53_weights": "./darknet53.conv.74",  # edit
    "batch_size": 8,  # edit
    "lr": 1e-5,
    "cpu_thread_cnt": 24,  # edit
    "crop": True,  # edit
    "freeze_darknet53": True,  # edit
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
