"""Qualitative evaluation: draw NMS'd detections on val images.

Parity with lib_yolo/utils.qualitative_eval (:126-153): center-crop when
cropping is configured, bayesian models switch to inference mode
(T defaults to 20, utils.py:131-133), boxes above the objectness
threshold are drawn on the image.  Instead of a blocking matplotlib
window per image (the reference loops 1000 interactive figures), images
are written as PNGs (pass ``show=True`` for the interactive behavior).

Stacked-same-image mode (``stack_same_image=True``, the default): the
reference's ValDataset feeds the SAME image ``batch_size``x through one
batched graph (lib_yolo/dataset_utils.py:88-95, applied at :177) so that
MC-dropout variation is visible across the stacked copies of a batch.
Here the copies go through the batched device program in one dispatch
where the program is batched (every non-epistemic path); the epistemic
XLA/mc-sharded fallbacks keep the reference's batch-1 device contract
(inference_epistemic.py:49), so their copies run as batch-1 dispatches
with per-copy RNG keys — equivalent, since dropout noise is independent
per batch element either way.  One PNG is written per copy.
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
    stack_same_image: bool = True,
):
    if config.model == "bayesian":
        config = dataclasses.replace(config, inference_mode=True)
        if not config.T:
            config = dataclasses.replace(config, T=20)

    device_cfg = dataclasses.replace(config, packed_host_input=False)
    if config.crop:
        device_cfg = dataclasses.replace(
            device_cfg,
            crop=False,
            full_img_size=tuple(config.crop_img_size),
            priors=config.resolved_priors(),
        )
    runner = InferenceRunner(device_cfg)
    params, stats, step = runner.load_state()

    # read from the val split (reference dataset_key='val')
    data_cfg = dataclasses.replace(device_cfg, data=config.val)
    loader = pipeline.TestLoader(data_cfg, batch_size=1)

    n_stack = max(1, config.batch_size) if stack_same_image else 1
    batched = runner.device_batch_size() >= n_stack

    os.makedirs(out_dir, exist_ok=True)
    import jax

    written = []
    for i, batch in enumerate(loader.batches()):
        if i >= n_images:
            break
        img = batch["image"][0].astype(np.float32) / 255.0
        if config.crop:
            img = center_crop(img, config.crop_img_size)
        u8 = (img[None] * 255).astype(np.uint8)
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)
        if batched:
            # one batched dispatch over the stacked copies; the dropout
            # mask is drawn per batch element, so copies vary like the
            # reference's stacked val batch
            rows, valid = runner.predict(
                params, stats, np.repeat(u8, n_stack, axis=0), key
            )
        else:
            per = [
                runner.predict(params, stats, u8, jax.random.fold_in(key, b))
                for b in range(n_stack)
            ]
            rows = np.concatenate([r for r, _ in per], axis=0)
            valid = np.concatenate([v for _, v in per], axis=0)
        for b in range(n_stack):
            boxes = filter_and_score(
                rows[b], valid[b], runner.spec,
                runner.epistemic, config.thresh, img.shape[:2],
            )
            drawn = draw_boxes(img, boxes)
            if show:
                import matplotlib.pyplot as plt

                plt.imshow(drawn)
                plt.show()
            from PIL import Image

            stem = (f"qual_{i:04d}_s{b}_step{step}.png" if n_stack > 1
                    else f"qual_{i:04d}_step{step}.png")
            path = os.path.join(out_dir, stem)
            Image.fromarray(drawn).save(path)
            written.append(path)
            log.info("%s: %d boxes", path, len(boxes))
    return written
