"""Training-time augmentation and cropping, as jittable JAX transforms.

Behavior parity with lib_yolo/data_augmentation.py:

* ``augment`` (:20-36): 50% horizontal flip (bbox-aware), 5% blur (2x2 or
  3x3 box filter), 5% color (one of saturation 0.5-1.5 / brightness +-0.2 /
  hue +-0.2), 5% noise (one of colored salt&pepper / gray salt&pepper /
  additive Gaussian sigma in [0.001, 0.05]).  Probabilities hard-coded like
  the reference.
* ``ImageCropper`` (:136-228): random crop with y ~ N(center, range/4)
  clipped (prefers the vertical middle), x ~ uniform; 33% of the time the
  crop window is randomly rescaled (scale = clip(N(0, 0.5), -0.7, 0.7))
  and resampled back to crop size; ``center_crop`` for eval.  ``crop_boxes``
  clips boxes to the window and DROPS boxes keeping < 25% of their original
  area (:231-251) — with static shapes "dropping" clears the validity mask.

TPU-first deviations (documented):

* every branch is a ``lax.cond``/``where`` so one compiled program covers
  all augmentation draws;
* the rescaled crop is a single bilinear gather at the final static
  ``crop_img_size`` (dynamic crop extents as traced scalars) instead of a
  dynamic-shape crop + TF1 ``resize_images`` (whose legacy non-half-pixel
  sampling we do not replicate).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# color space helpers
# --------------------------------------------------------------------------


def rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    rng = maxc - minc
    safe_rng = jnp.where(rng > 0, rng, 1.0)
    s = jnp.where(maxc > 0, rng / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    rc = (maxc - r) / safe_rng
    gc = (maxc - g) / safe_rng
    bc = (maxc - b) / safe_rng
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(rng > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(img):
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def pick(c0, c1, c2, c3, c4, c5):
        # select chain instead of jnp.choose: choose lowers to per-element
        # gathers, ~15x slower on the VPU at image sizes
        out = c5
        for idx, c in ((4, c4), (3, c3), (2, c2), (1, c1), (0, c0)):
            out = jnp.where(i == idx, c, out)
        return out

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------
# individual augmentations
# --------------------------------------------------------------------------


def flip_lr(img, bbox):
    """Horizontal flip; bbox [ymin,xmin,ymax,xmax] -> xmin'=1-xmax (:74-82)."""
    img = img[:, ::-1, :]
    bbox = jnp.stack(
        [bbox[:, 0], 1.0 - bbox[:, 3], bbox[:, 2], 1.0 - bbox[:, 1]], axis=1
    )
    return img, bbox


def _box_blur(img, k: int):
    """Depthwise k x k box filter, SAME zero padding (:110-126).

    Implemented as k^2 shift-adds (pure VPU) — a conv with a single input
    channel wastes the whole MXU contraction dimension."""
    h, w, _ = img.shape
    lo, hi = (k - 1) // 2, k // 2  # TF 'SAME' padding split
    x = jnp.pad(img, ((lo, hi), (lo, hi), (0, 0)))
    acc = None
    for dy in range(k):
        for dx in range(k):
            window = x[dy : dy + h, dx : dx + w]
            acc = window if acc is None else acc + window
    return acc / float(k * k)


def blur(img, key):
    k = jax.random.randint(key, (), 2, 4)  # 2 or 3
    return jax.lax.cond(k == 2, lambda x: _box_blur(x, 2), lambda x: _box_blur(x, 3), img)


def color_augment(img, key):
    """One of saturation [0.5,1.5] / brightness +-0.2 / hue +-0.2 (:38-54).

    Under a vmapped pipeline every branch executes (lax control flow
    becomes select), so the saturation and hue branches share a single
    rgb->hsv->rgb round trip with their adjustments gated by the choice.
    """
    kc, ks, kb, kh = jax.random.split(key, 4)
    choice = jax.random.randint(kc, (), 0, 3)

    factor = jnp.where(
        choice == 0, jax.random.uniform(ks, (), minval=0.5, maxval=1.5), 1.0
    )
    hue_delta = jnp.where(
        choice == 2, jax.random.uniform(kh, (), minval=-0.2, maxval=0.2), 0.0
    )
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * factor, 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + hue_delta) % 1.0)
    via_hsv = hsv_to_rgb(hsv)

    # tf.image.adjust_brightness adds the delta without clipping
    bright = img + jax.random.uniform(kb, (), minval=-0.2, maxval=0.2)
    return jnp.where(choice == 1, bright, via_hsv)


def noise_augment(img, key):
    """One of colored s&p / gray s&p / additive Gaussian (:56-72,84-133)."""
    kc, k1, k2, k3, k4 = jax.random.split(key, 5)
    choice = jax.random.randint(kc, (), 0, 3)

    def colored_snp(x):
        amount = jax.random.uniform(k3, (), minval=0.0005, maxval=0.008)
        salt = jax.random.uniform(k1, x.shape) < amount
        pepper = jax.random.uniform(k2, x.shape) < amount
        return jnp.where(pepper, 0.0, jnp.where(salt, 1.0, x))

    def gray_snp(x):
        amount = jax.random.uniform(k3, (), minval=0.0005, maxval=0.008)
        hw = x.shape[:2]
        salt = (jax.random.uniform(k1, hw) < amount).astype(x.dtype)
        pepper = (jax.random.uniform(k2, hw) < amount).astype(x.dtype)
        # salt and pepper on the same pixel cancel (reference :104-105)
        return jnp.clip(x + (salt - pepper)[..., None], 0.0, 1.0)

    def gaussian(x):
        stddev = jax.random.uniform(k3, (), minval=0.001, maxval=0.05)
        return x + stddev * jax.random.normal(k4, x.shape, x.dtype)

    return jax.lax.switch(choice, [colored_snp, gray_snp, gaussian], img)


def augment(img, bbox, label, key):
    """Full augmentation chain (parity DataAugmenter.augment, :20-36)."""
    kf, kfb, kb, kbb, kcp, kc, knp, kn = jax.random.split(key, 8)
    img, bbox = jax.lax.cond(
        jax.random.uniform(kf) < 0.5,
        lambda i, b: flip_lr(i, b),
        lambda i, b: (i, b),
        img, bbox,
    )
    img = jax.lax.cond(jax.random.uniform(kfb) < 0.05, lambda x: blur(x, kb), lambda x: x, img)
    img = jax.lax.cond(
        jax.random.uniform(kbb) < 0.05, lambda x: color_augment(x, kcp), lambda x: x, img
    )
    img = jax.lax.cond(
        jax.random.uniform(kc) < 0.05, lambda x: noise_augment(x, knp), lambda x: x, img
    )
    return img, bbox, label


# --------------------------------------------------------------------------
# cropping
# --------------------------------------------------------------------------


def crop_boxes(bbox, valid, y_min, x_min, y_max, x_max, thresh: float = 0.25):
    """Clip padded boxes to a window; invalidate boxes keeping < 25% area.

    Parity data_augmentation.crop_boxes (:231-251), with gather-compaction
    replaced by clearing the validity mask (static shapes).
    """
    y0, x0, y1, x1 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    areas = (y1 - y0) * (x1 - x0)
    y0c = jnp.clip(y0, y_min, y_max)
    y1c = jnp.clip(y1, y_min, y_max)
    x0c = jnp.clip(x0, x_min, x_max)
    x1c = jnp.clip(x1, x_min, x_max)
    clipped = jnp.stack(
        [
            (y0c - y_min) / (y_max - y_min),
            (x0c - x_min) / (x_max - x_min),
            (y1c - y_min) / (y_max - y_min),
            (x1c - x_min) / (x_max - x_min),
        ],
        axis=1,
    )
    areas_c = (y1c - y0c) * (x1c - x0c)
    keep = valid & (areas_c / jnp.where(areas > 0, areas, 1.0) > thresh) & (areas > 0)
    return clipped, keep


@dataclasses.dataclass(frozen=True)
class ImageCropper:
    """Crop policies (parity data_augmentation.ImageCropper, :136-228)."""

    full_img_size: Tuple[int, int, int]
    crop_img_size: Tuple[int, int, int]

    def __post_init__(self):
        fh, fw = self.full_img_size[:2]
        ch, cw = self.crop_img_size[:2]
        assert fw / float(fh) == cw / float(ch), (
            "invalid crop aspect ratio, must match the full image (:148)"
        )

    def _window_random(self, key, crop_h, crop_w):
        """y ~ clipped N(center, range/4); x ~ uniform (:166-177,193-203)."""
        fh, fw = self.full_img_size[:2]
        ky, kx = jax.random.split(key)
        y_maxval = (fh - crop_h).astype(jnp.float32)
        y = jax.random.normal(ky) * (y_maxval / 4.0) + y_maxval / 2.0
        y = jnp.clip(y, 0.0, y_maxval).astype(jnp.int32)
        x = jax.random.randint(kx, (), 0, fw - crop_w + 1)
        return y, x

    def random_crop(self, img, bbox, valid, key):
        ch, cw = self.crop_img_size[:2]
        fh, fw = self.full_img_size[:2]
        y, x = self._window_random(key, jnp.asarray(ch), jnp.asarray(cw))
        out = jax.lax.dynamic_slice(img, (y, x, 0), (ch, cw, img.shape[2]))
        y_min, x_min = y / fh, x / fw
        bbox, valid = crop_boxes(bbox, valid, y_min, x_min, y_min + ch / fh, x_min + cw / fw)
        return out, bbox, valid

    def random_crop_with_rescale(self, img, bbox, valid, key):
        """Random-size crop resampled to crop size (:157-189).

        scale = clip(N(0, 0.5), -0.7, 0.7); window = min((1+scale)*crop,
        full); implemented as one bilinear gather at static output size.
        """
        ch, cw = self.crop_img_size[:2]
        fh, fw = self.full_img_size[:2]
        ks, kw = jax.random.split(key)
        scale = jnp.clip(jax.random.normal(ks) * 0.5, -0.7, 0.7)
        crop_h = jnp.minimum((1.0 + scale) * ch, fh).astype(jnp.int32)
        crop_w = jnp.minimum((1.0 + scale) * cw, fw).astype(jnp.int32)
        y, x = self._window_random(kw, crop_h, crop_w)
        out = _bilinear_window_resample(img, y, x, crop_h, crop_w, (ch, cw))
        y_min, x_min = y / fh, x / fw
        bbox, valid = crop_boxes(
            bbox, valid, y_min, x_min, y_min + crop_h / fh, x_min + crop_w / fw
        )
        return out, bbox, valid

    def random_crop_and_sometimes_rescale(self, img, bbox, valid, key):
        """33% rescaled crop, else plain random crop (:150-155)."""
        kc, kk = jax.random.split(key)
        return jax.lax.cond(
            jax.random.uniform(kc) < 0.33,
            lambda a: self.random_crop_with_rescale(*a),
            lambda a: self.random_crop(*a),
            (img, bbox, valid, kk),
        )

    def center_crop(self, img, bbox, valid, key=None):
        ch, cw = self.crop_img_size[:2]
        fh, fw = self.full_img_size[:2]
        y, x = (fh - ch) // 2, (fw - cw) // 2
        out = jax.lax.dynamic_slice(img, (y, x, 0), (ch, cw, img.shape[2]))
        bbox, valid = crop_boxes(
            bbox, valid, y / fh, x / fw, (y + ch) / fh, (x + cw) / fw
        )
        return out, bbox, valid


def _hat_weights(src, n: int):
    """(len(src), n) two-tap bilinear weight rows: relu(1 - |i - src|).

    ``src`` is clamped to [0, n-1]; each row then holds exactly the clamped
    two-tap weights of classic bilinear sampling — interior sources weight
    rows floor(src)/floor(src)+1 with (1-frac, frac), out-of-range sources
    collapse onto the boundary pixel with weight 1."""
    src = jnp.clip(src, 0.0, float(n - 1))
    idx = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx[None, :] - src[:, None]))


def _bilinear_window_resample(img, y0, x0, win_h, win_w, out_hw):
    """Sample an (out_h, out_w) grid bilinearly from window [y0:y0+win_h, ...].

    Half-pixel-center sampling (align with jax.image/TF2 'linear').

    TPU-first: the two-tap interpolation contracts the image against dense
    hat-function weight matrices (one matmul per axis) instead of
    fancy-index gathers — row/lane-dim gathers lower to per-element loops
    on TPU (see CLAUDE.md), and under the vmapped train pipeline this runs
    every step (lax.cond becomes select).  The weight rows reproduce the
    clamped gather formulation's two-tap weights exactly (zero-weight terms
    contribute exact f32 zeros), so outputs match to float-associativity."""
    oh, ow = out_hw
    h, w, c = img.shape
    sy = win_h.astype(jnp.float32) / oh
    sx = win_w.astype(jnp.float32) / ow
    yy = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * sy - 0.5 + y0
    xx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5 + x0
    wy = _hat_weights(yy, h)  # (oh, h)
    wx = _hat_weights(xx, w)  # (ow, w)
    # x-interp then y-interp, matching the gather formulation's order
    tmp = jnp.einsum("Ww,hwc->hWc", wx, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("Hh,hWc->HWc", wy, tmp, precision=jax.lax.Precision.HIGHEST)
