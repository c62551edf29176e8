"""Qualitative evaluation: draw NMS'd detections on val images.

Parity with lib_yolo/utils.qualitative_eval (:126-153): center-crop when
cropping is configured, bayesian models switch to inference mode
(T defaults to 20, utils.py:131-133), boxes above the objectness
threshold are drawn on the image.  Instead of a blocking matplotlib
window per image (the reference loops 1000 interactive figures), images
are written as PNGs (pass ``show=True`` for the interactive behavior).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import numpy as np

from ..config import Config
from ..data import pipeline
from .detect import center_crop, draw_boxes, filter_and_score
from .runner import InferenceRunner

log = logging.getLogger("byolo.qualitative")


def qualitative_eval(
    config: Config,
    n_images: int = 20,
    out_dir: str = "./qualitative",
    show: bool = False,
):
    if config.model == "bayesian":
        config = dataclasses.replace(config, inference_mode=True)
        if not config.T:
            config = dataclasses.replace(config, T=20)

    device_cfg = config
    if config.crop:
        device_cfg = dataclasses.replace(
            config,
            crop=False,
            full_img_size=tuple(config.crop_img_size),
            priors=config.resolved_priors(),
        )
    runner = InferenceRunner(device_cfg)
    params, stats, step = runner.load_state()

    # read from the val split (reference dataset_key='val')
    data_cfg = dataclasses.replace(device_cfg, data=config.val)
    loader = pipeline.TestLoader(data_cfg, batch_size=1)

    os.makedirs(out_dir, exist_ok=True)
    import jax
    import jax.numpy as jnp

    written = []
    for i, batch in enumerate(loader.batches()):
        if i >= n_images:
            break
        img = batch["image"][0].astype(np.float32) / 255.0
        if config.crop:
            img = center_crop(img, config.crop_img_size)
        rows, valid = runner._jit(
            params, stats, jnp.asarray((img[None] * 255).astype(np.uint8)),
            jax.random.PRNGKey(i),
        )
        boxes = filter_and_score(
            np.asarray(rows)[0], np.asarray(valid)[0], runner.spec,
            runner.epistemic, config.thresh, img.shape[:2],
        )
        drawn = draw_boxes(img, boxes)
        if show:
            import matplotlib.pyplot as plt

            plt.imshow(drawn)
            plt.show()
        from PIL import Image

        path = os.path.join(out_dir, f"qual_{i:04d}_step{step}.png")
        Image.fromarray(drawn).save(path)
        written.append(path)
        log.info("%s: %d boxes", path, len(boxes))
    return written
