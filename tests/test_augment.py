"""Augmentation / cropping behavior tests (+ TF oracles where meaningful)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.data import augment


def _img(rng, h=32, w=48):
    return jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))


def test_flip_lr_is_involution_and_flips_boxes(rng):
    img = _img(rng)
    bbox = jnp.asarray([[0.1, 0.2, 0.5, 0.6]], jnp.float32)
    f_img, f_bbox = augment.flip_lr(img, bbox)
    np.testing.assert_allclose(np.asarray(f_bbox), [[0.1, 0.4, 0.5, 0.8]], rtol=1e-6)
    ff_img, ff_bbox = augment.flip_lr(f_img, f_bbox)
    np.testing.assert_array_equal(np.asarray(ff_img), np.asarray(img))
    np.testing.assert_allclose(np.asarray(ff_bbox), np.asarray(bbox), rtol=1e-6)


def test_hsv_roundtrip(rng):
    img = _img(rng)
    back = augment.hsv_to_rgb(augment.rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), rtol=1e-4, atol=1e-5)


def test_saturation_matches_tf(rng):
    tf = pytest.importorskip("tensorflow")
    img = np.asarray(_img(rng))
    hsv = augment.rgb_to_hsv(jnp.asarray(img))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * 1.3, 0.0, 1.0))
    got = np.asarray(augment.hsv_to_rgb(hsv))
    want = tf.image.adjust_saturation(img, 1.3).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_hue_matches_tf(rng):
    tf = pytest.importorskip("tensorflow")
    img = np.asarray(_img(rng))
    hsv = augment.rgb_to_hsv(jnp.asarray(img))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + 0.1) % 1.0)
    got = np.asarray(augment.hsv_to_rgb(hsv))
    want = tf.image.adjust_hue(img, 0.1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_blur_is_box_filter(rng):
    img = jnp.ones((8, 8, 3), jnp.float32)
    out = augment._box_blur(img, 3)
    # interior of a constant image is unchanged by a box filter
    np.testing.assert_allclose(np.asarray(out)[1:-1, 1:-1], 1.0, rtol=1e-6)


def test_augment_is_jittable_and_deterministic(rng):
    img = _img(rng)
    bbox = jnp.asarray([[0.1, 0.2, 0.5, 0.6]], jnp.float32)
    label = jnp.asarray([1], jnp.int32)
    fn = jax.jit(augment.augment)
    a1 = fn(img, bbox, label, jax.random.PRNGKey(5))
    a2 = fn(img, bbox, label, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    # some key flips (p=0.5): find one and check boxes moved
    for k in range(8):
        out = fn(img, bbox, label, jax.random.PRNGKey(k))
        if not np.allclose(np.asarray(out[1]), np.asarray(bbox)):
            break
    else:
        pytest.fail("no flip observed in 8 keys")


def test_crop_boxes_drops_small_remnants():
    bbox = jnp.asarray(
        [[0.4, 0.4, 0.6, 0.6],   # fully inside
         [0.0, 0.0, 0.2, 0.2],   # fully outside window
         [0.1, 0.4, 0.28, 0.6]], # mostly outside -> < 25% area kept
        jnp.float32,
    )
    valid = jnp.asarray([True, True, True])
    clipped, keep = augment.crop_boxes(bbox, valid, 0.25, 0.25, 0.75, 0.75)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, False])
    np.testing.assert_allclose(np.asarray(clipped)[0], [0.3, 0.3, 0.7, 0.7], rtol=1e-5)


def test_center_crop_geometry(rng):
    cropper = augment.ImageCropper((64, 96, 3), (32, 48, 3))
    img = _img(rng, 64, 96)
    bbox = jnp.asarray([[0.25, 0.25, 0.75, 0.75]], jnp.float32)
    out, cbox, keep = cropper.center_crop(img, bbox, jnp.asarray([True]))
    assert out.shape == (32, 48, 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img)[16:48, 24:72])
    np.testing.assert_allclose(np.asarray(cbox)[0], [0.0, 0.0, 1.0, 1.0], atol=1e-6)
    assert bool(keep[0])


def test_random_crop_jit_and_shapes(rng):
    cropper = augment.ImageCropper((64, 96, 3), (32, 48, 3))
    img = _img(rng, 64, 96)
    bbox = jnp.asarray([[0.4, 0.4, 0.6, 0.6]], jnp.float32)
    fn = jax.jit(cropper.random_crop_and_sometimes_rescale)
    for k in range(6):
        out, cbox, keep = fn(img, bbox, jnp.asarray([True]), jax.random.PRNGKey(k))
        assert out.shape == (32, 48, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_rescale_window_resample_identity(rng):
    """Resampling the full window at identical size reproduces the image."""
    img = _img(rng, 16, 24)
    out = augment._bilinear_window_resample(
        img, jnp.asarray(0), jnp.asarray(0), jnp.asarray(16), jnp.asarray(24), (16, 24)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), rtol=1e-5, atol=1e-6)


def test_box_blur_matches_tf_conv(rng):
    tf = pytest.importorskip("tensorflow")
    img = np.asarray(_img(rng, 9, 11))
    for k in (2, 3):
        got = np.asarray(augment._box_blur(jnp.asarray(img), k))
        kernel = np.ones((k, k, 1, 1), np.float32) / (k * k)
        want = np.concatenate(
            [
                tf.nn.conv2d(img[None, ..., c : c + 1], kernel, 1, "SAME").numpy()[0]
                for c in range(3)
            ],
            axis=-1,
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _resample_gather_oracle(img, y0, x0, win_h, win_w, out_hw):
    """Numpy oracle: the classic clamped-gather bilinear formulation that the
    shipped matmul form (augment._bilinear_window_resample) must reproduce."""
    oh, ow = out_hw
    h, w, _ = img.shape
    yy = (np.arange(oh, dtype=np.float32) + 0.5) * (win_h / oh) - 0.5 + y0
    xx = (np.arange(ow, dtype=np.float32) + 0.5) * (win_w / ow) - 0.5 + x0
    y0i = np.clip(np.floor(yy).astype(np.int32), 0, h - 1)
    x0i = np.clip(np.floor(xx).astype(np.int32), 0, w - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)
    x1i = np.clip(x0i + 1, 0, w - 1)
    fy = np.clip(yy - y0i, 0.0, 1.0)[:, None, None]
    fx = np.clip(xx - x0i, 0.0, 1.0)[None, :, None]
    top = img[y0i][:, x0i] * (1 - fx) + img[y0i][:, x1i] * fx
    bot = img[y1i][:, x0i] * (1 - fx) + img[y1i][:, x1i] * fx
    return top * (1 - fy) + bot * fy


@pytest.mark.parametrize(
    "y0,x0,win_h,win_w",
    [
        (0, 0, 16, 24),       # identity-size window
        (3, 5, 10, 14),       # shrink (upsample to output)
        (1, 2, 15, 21),       # non-integer scale
        (0, 0, 16, 24),
        (6, 12, 8, 12),       # small window, large magnification
    ],
)
def test_resample_matmul_matches_gather_oracle(rng, y0, x0, win_h, win_w):
    img = _img(rng, 16, 24)
    got = augment._bilinear_window_resample(
        img, jnp.asarray(y0), jnp.asarray(x0),
        jnp.asarray(win_h), jnp.asarray(win_w), (12, 18)
    )
    want = _resample_gather_oracle(
        np.asarray(img), y0, x0, win_h, win_w, (12, 18)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_resample_window_beyond_edge_clamps(rng):
    """A window extending past the image samples the boundary pixels."""
    img = _img(rng, 8, 12)
    out = augment._bilinear_window_resample(
        img, jnp.asarray(6), jnp.asarray(10), jnp.asarray(8), jnp.asarray(8), (8, 8)
    )
    want = _resample_gather_oracle(np.asarray(img), 6, 10, 8, 8, (8, 8))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)
