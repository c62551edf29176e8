#!/usr/bin/env python
"""Image-file detection demo (parity with the reference detect.py).

Usage: python cli/detect.py IMG [IMG...] [--out-dir DIR] [--show]
"""

import argparse
import logging

from _common import build_config, setup_logging

from bayesian_yolov3_tpu.infer.detect import Detector

DEFAULTS = {
    "model": "bayesian",  # edit: standard | aleatoric | bayesian
    "checkpoint_path": "./checkpoints",  # edit
    "run_id": "epi_ale",  # edit
    "step": "last",  # edit
    "thresh": 0.1,  # edit: objectness threshold (detect.py:143)
    "full_img_size": [1024, 1920, 3],  # edit
    "crop_img_size": [768, 1440, 3],
    "crop": False,  # edit: center-crop files before detection
    "cls_cnt": 2,
    "T": 35,  # edit if OOM errors (detect.py:146)
    "inference_mode": True,
    "aleatoric_loss": False,
    "priors": "ecp",  # edit
    "implicit_background_class": True,
}


def main():
    setup_logging()
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="+")
    p.add_argument("--out-dir", default="./detections")
    p.add_argument("--show", action="store_true",
                   help="blocking matplotlib windows like the reference")
    args, rest = p.parse_known_args()
    config = build_config(DEFAULTS, rest)
    results = Detector(config).run(args.files, out_dir=args.out_dir, show=args.show)
    total = sum(len(r["boxes"]) for r in results)
    logging.info("%d detections over %d files", total, len(args.files))


if __name__ == "__main__":
    main()
