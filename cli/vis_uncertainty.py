#!/usr/bin/env python
"""Per-anchor uncertainty heatmaps (parity with the reference vis_uncertainty.py).

Renders plasma-colormap heatmaps of epistemic/aleatoric localization
variance, mutual information, and objectness over input images, one PNG
per (key, scale, prior).
"""

import argparse
import logging

from _common import build_config, setup_logging

from bayesian_yolov3_tpu.infer.detect import load_img
from bayesian_yolov3_tpu.infer.runner import InferenceRunner
from bayesian_yolov3_tpu.infer.vis import UncertaintyVisualizer

DEFAULTS = {
    "model": "bayesian",
    "checkpoint_path": "./checkpoints",  # edit
    "run_id": "epi_ale",  # edit
    "step": "last",  # edit
    "full_img_size": [1024, 1920, 3],  # edit
    "cls_cnt": 2,
    "T": 30,  # edit (vis_uncertainty.py:214)
    "inference_mode": True,
    "crop": False,
    "aleatoric_loss": False,
    "priors": "ecp",  # edit
    "implicit_background_class": True,
    "batch_size": 1,
}


def main():
    setup_logging()
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="+")
    p.add_argument("--out-dir", default="./vis_uncertainty")
    args, rest = p.parse_known_args()
    config = build_config(DEFAULTS, rest)

    runner = InferenceRunner(config)
    params, stats, _ = runner.load_state()
    vis = UncertaintyVisualizer(config, params, stats)
    for i, path in enumerate(args.files):
        img = load_img(path)
        written = vis.render(img, args.out_dir, tag=f"img{i:03d}")
        logging.info("%s -> %d heatmaps", path, len(written))


if __name__ == "__main__":
    main()
