#!/usr/bin/env python
"""Score an inference output directory (ECP-format JSON) against GT tfrecords.

The reference delegates mAP/LAMR scoring to the external ECP toolkit; this
closes the loop in-framework: per-class AP@0.5 and LAMR (MR-2) plus mAP.

Usage:
  python cli/evaluate_detections.py JSON_DIR --set data.file_pattern='...-val-*'
"""

import argparse
import glob
import json
import logging
import os

import numpy as np

from _common import build_config, setup_logging

from bayesian_yolov3_tpu.data import pipeline, tfrecord
from bayesian_yolov3_tpu.eval import evaluate_detections

DEFAULTS = {
    "full_img_size": [1024, 1920, 3],  # edit
    "cls_cnt": 2,
    "implicit_background_class": True,
    "crop": False,
    "data": {"file_pattern": "./data/ecp-day-val-*-of-*"},  # edit
}


def main():
    setup_logging()
    p = argparse.ArgumentParser()
    p.add_argument("json_dir")
    p.add_argument("--score-thresh", type=float, default=0.0)
    args, rest = p.parse_known_args()
    config = build_config(DEFAULTS, rest)
    h, w = config.full_img_size[:2]

    ground_truth = {}
    for rec in tfrecord.read_shards(config.data.file_pattern):
        ex = pipeline.parse_example(rec, config, with_filename=True)
        name = os.path.splitext(os.path.basename(ex["filename"].decode()))[0]
        ground_truth[name] = (ex["bbox"] * [h, w, h, w], ex["label"])

    predictions = {}
    for f in glob.glob(os.path.join(args.json_dir, "*.json")):
        name = os.path.splitext(os.path.basename(f))[0]
        dets = json.load(open(f))["children"]
        boxes, scores, labels = [], [], []
        for d in dets:
            if d["score"] <= args.score_thresh:
                continue
            boxes.append([d["y0"], d["x0"], d["y1"], d["x1"]])
            scores.append(d["score"])
            cls = int(np.argmax(d["cls_scores"]))
            labels.append(cls)
        predictions[name] = (
            np.asarray(boxes, float).reshape(-1, 4),
            np.asarray(scores),
            np.asarray(labels),
        )

    missing = set(ground_truth) - set(predictions)
    if missing:
        logging.warning("%d GT images have no prediction file", len(missing))
    out = evaluate_detections(predictions, ground_truth, cls_ids=range(config.cls_cnt))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
