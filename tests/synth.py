"""Synthetic tiny ECP-style tfrecord datasets for tests."""

import io
import os

import numpy as np

from bayesian_yolov3_tpu.data import proto, tfrecord


def make_png(rng, h, w, boxes=None):
    """Random RGB PNG with optional bright rectangles at the given boxes."""
    from PIL import Image

    img = (rng.uniform(0, 0.4, (h, w, 3)) * 255).astype(np.uint8)
    for b in (boxes if boxes is not None else []):
        y0, x0, y1, x1 = (np.asarray(b) * [h, w, h, w]).astype(int)
        img[y0:y1, x0:x1] = [230, 60, 60]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def write_dataset(path, rng, n_images=6, img_hw=(64, 96), shards=2,
                  implicit_background=True):
    """Write a sharded TF-ODAPI-format dataset; returns the file pattern."""
    os.makedirs(path, exist_ok=True)
    h, w = img_hw
    per_shard = (n_images + shards - 1) // shards
    idx = 0
    for s in range(shards):
        fname = os.path.join(path, f"synth-{s:05d}-of-{shards:05d}.tfrecord")
        with tfrecord.TFRecordWriter(fname) as wr:
            for _ in range(min(per_shard, n_images - idx)):
                n_boxes = int(rng.integers(1, 4))
                yx = rng.uniform(0.05, 0.6, (n_boxes, 2))
                hw = rng.uniform(0.1, 0.35, (n_boxes, 2))
                boxes = np.concatenate([yx, np.minimum(yx + hw, 0.98)], axis=1)
                labels = rng.integers(0, 2, n_boxes)
                png = make_png(rng, h, w, boxes)
                shift = 1 if implicit_background else 0
                wr.write(proto.encode_example({
                    "image/encoded": [png],
                    "image/height": np.asarray([h], np.int64),
                    "image/width": np.asarray([w], np.int64),
                    "image/filename": [f"img_{idx:04d}.png".encode()],
                    "image/object/bbox/ymin": boxes[:, 0].astype(np.float32),
                    "image/object/bbox/xmin": boxes[:, 1].astype(np.float32),
                    "image/object/bbox/ymax": boxes[:, 2].astype(np.float32),
                    "image/object/bbox/xmax": boxes[:, 3].astype(np.float32),
                    "image/object/class/label": (labels + shift).astype(np.int64),
                }))
                idx += 1
    return os.path.join(path, f"synth-*-of-{shards:05d}.tfrecord")
