#!/usr/bin/env python
"""Epistemic (MC-dropout) inference -> ECP JSON (parity inference_epistemic.py).

T MC samples per image, batch size 1; output JSON fields include epistemic
and aleatoric variances, mutual information, and entropies.
"""

import logging
import time

from _common import build_config, setup_logging

from bayesian_yolov3_tpu.infer import InferenceRunner

DEFAULTS = {
    "model": "bayesian",
    "checkpoint_path": "./checkpoints",  # edit
    "run_id": "epi_ale",  # edit
    "step": "last",  # edit: or an explicit step number
    "full_img_size": [1024, 1920, 3],  # edit if not ECP dataset
    "cls_cnt": 2,  # edit if not ECP dataset
    "batch_size": 1,
    "T": 50,  # edit if OOM errors
    "inference_mode": True,
    "cpu_thread_cnt": 24,  # edit
    "crop": False,
    "aleatoric_loss": False,
    "priors": "ecp",  # edit
    "implicit_background_class": True,
    "data": {
        "file_pattern": "./data/ecp-day-val-*-of-*",  # edit
        "num_shards": 4,
        "shuffle_buffer_size": 1,
        "cache": False,
    },
    "out_path": "./inference/epi_ale",  # edit
}


def main():
    setup_logging()
    config = build_config(DEFAULTS)
    # batch_size > 1 is supported through the fused TPU path (the
    # reference enforces 1); the XLA fallback clamps to 1 in the runner
    assert not config.crop and config.inference_mode
    logging.info("----- START -----")
    start = time.time()
    out_dir = InferenceRunner(config).run()
    elapsed = int(time.time() - start)
    logging.info("----- FINISHED in %02d:%02d:%02d -----",
                 elapsed // 3600, (elapsed // 60) % 60, elapsed % 60)
    logging.info("results: %s", out_dir)


if __name__ == "__main__":
    main()
