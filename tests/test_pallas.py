"""Pallas fused epistemic decode: parity vs the XLA reference path.

Runs in interpreter mode on CPU (the kernel itself is exercised compiled
on real TPU by bench.py / the inference runner).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
from bayesian_yolov3_tpu.ops import decode
from bayesian_yolov3_tpu.ops.pallas_epistemic import fused_epistemic_decode

C = 2
PRIORS = np.array([[0.3, 0.1], [0.15, 0.05], [0.08, 0.02]], np.float32)


@pytest.mark.parametrize("h,w,T", [(2, 3, 4), (4, 8, 7)])
def test_fused_epistemic_decode_matches_xla_path(rng, h, w, T):
    spec = VariantSpec(Variant.BAYESIAN, C)
    raw = rng.standard_normal((T, h, w, 3 * spec.head_channels_per_prior)).astype(np.float32)

    det = decode.split_detection(jnp.asarray(raw), spec)
    stats = decode.decode_epistemic_stats(det)
    want = np.asarray(decode.decode_bbox_epistemic(stats, jnp.asarray(PRIORS), layer_id=1))

    got = np.asarray(
        fused_epistemic_decode(
            jnp.asarray(raw), jnp.asarray(PRIORS), cls_cnt=C, layer_id=1,
            interpret=True,
        )
    )
    assert got.shape == want.shape == (h, w, 3, 21 + C)
    # det of covariance is the most cancellation-prone column (12)
    np.testing.assert_allclose(got[..., :12], want[..., :12], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[..., 12], want[..., 12], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(got[..., 13:], want[..., 13:], rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("aleatoric", [True, False])
def test_fused_box_decode_matches_xla_path(rng, aleatoric):
    from bayesian_yolov3_tpu.ops.pallas_decode import fused_box_decode_cf

    variant = Variant.ALEATORIC if aleatoric else Variant.STANDARD
    spec = VariantSpec(variant, C)
    nb, h, w = 2, 4, 8
    chpp = spec.head_channels_per_prior
    raw = rng.standard_normal((nb, h, w, 3 * chpp)).astype(np.float32)

    det = decode.split_detection(jnp.asarray(raw), spec)
    if aleatoric:
        ref = decode.decode_bbox_aleatoric(det, jnp.asarray(PRIORS), layer_id=1)
    else:
        ref = decode.decode_bbox_standard(det, jnp.asarray(PRIORS), layer_id=1)
    # per-element flatten in reference concat order: (nb, B*hw, width)
    want = np.stack([
        np.asarray(ref[b]).transpose(2, 0, 1, 3).reshape(3 * h * w, -1)
        for b in range(nb)
    ])

    # channels-first input: (ch, nb, hw)
    raw_cf = jnp.asarray(raw.reshape(nb, h * w, 3 * chpp).transpose(2, 0, 1))
    got = np.asarray(
        fused_box_decode_cf(
            raw_cf, jnp.asarray(PRIORS), h=h, w=w, cls_cnt=C, layer_id=1,
            aleatoric=aleatoric, interpret=True,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batched_epistemic_decode_matches_per_image(rng):
    from bayesian_yolov3_tpu.ops.pallas_epistemic import (
        fused_epistemic_decode_cf_batched,
    )

    spec = VariantSpec(Variant.BAYESIAN, C)
    T, nb, h, w = 5, 3, 2, 4
    chpp = spec.head_channels_per_prior
    # channels-first raws, anchors image-major: (ch, T, nb*hw)
    raw = rng.standard_normal((3 * chpp, T, nb * h * w)).astype(np.float32)

    got = np.asarray(
        fused_epistemic_decode_cf_batched(
            jnp.asarray(raw), jnp.asarray(PRIORS), n_imgs=nb, h=h, w=w,
            cls_cnt=C, layer_id=0, interpret=True,
        )
    )
    assert got.shape == (nb, 3 * h * w, 21 + C)

    for b in range(nb):
        # slice image b's anchors out of the folded axis and run the
        # reference XLA path on them
        raw_b = raw[:, :, b * h * w : (b + 1) * h * w]  # (ch, T, hw)
        raw_thwc = raw_b.transpose(1, 2, 0).reshape(T, h, w, 3 * chpp)
        det = decode.split_detection(jnp.asarray(raw_thwc), spec)
        stats = decode.decode_epistemic_stats(det)
        ref = decode.decode_bbox_epistemic(stats, jnp.asarray(PRIORS), layer_id=0)
        want = np.asarray(ref).transpose(2, 0, 1, 3).reshape(3 * h * w, 21 + C)
        np.testing.assert_allclose(got[b, :, :12], want[:, :12], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got[b, :, 12], want[:, 12], rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(got[b, :, 13:], want[:, 13:], rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("n_shards", [1, 4])
def test_moments_plus_finalize_matches_fused_decode(rng, n_shards):
    """The split formulation (per-shard partial moments -> sum -> finalize),
    used by the multi-chip mc path, must reproduce the one-shot fused
    kernel up to psum summation order."""
    from bayesian_yolov3_tpu.ops.pallas_epistemic import (
        epistemic_moments_cf,
        epistemic_finalize,
        fused_epistemic_decode_cf,
    )

    spec = VariantSpec(Variant.BAYESIAN, C)
    h, w, T = 4, 8, 8
    chpp = spec.head_channels_per_prior
    raw_cf = rng.standard_normal((3 * chpp, T, h * w)).astype(np.float32)

    want = np.asarray(
        fused_epistemic_decode_cf(
            jnp.asarray(raw_cf), jnp.asarray(PRIORS), h=h, w=w, cls_cnt=C,
            layer_id=2, interpret=True,
        )
    )  # (h, w, 3, width)

    # shard the T axis, sum the per-shard moments (psum stand-in), finalize
    shard_T = T // n_shards
    moments = sum(
        np.asarray(
            epistemic_moments_cf(
                jnp.asarray(raw_cf[:, s * shard_T : (s + 1) * shard_T]),
                cls_cnt=C, interpret=True,
            )
        )
        for s in range(n_shards)
    )
    got = np.asarray(
        epistemic_finalize(
            jnp.asarray(moments), jnp.asarray(PRIORS), T=T, h=h, w=w,
            cls_cnt=C, layer_id=2, interpret=True,
        )
    )  # (1, 3*h*w, width)
    want_flat = np.asarray(
        decode.concat_all_scales([jnp.asarray(want)])
    )
    np.testing.assert_allclose(got[0, :, :12], want_flat[:, :12], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[0, :, 12], want_flat[:, 12], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(got[0, :, 13:], want_flat[:, 13:], rtol=1e-4, atol=2e-4)


def test_fused_box_decode_large_batch_tile_halving(rng):
    """The nb-aware VMEM tile halving (round 5: unlocks inference batches
    > 22 at ECP resolution) must not change values.

    Geometry chosen to TRIGGER the halving in interpret mode: aleatoric
    C=2 has (chpp + width) = 30, so the 8M block budget halves the
    hw=2048 tile once nb >= 18 (30 * nb * 8 * 2048 > 8Mi).  Parity is
    asserted against the per-image XLA decode oracle, same as the small
    geometry test above.
    """
    from bayesian_yolov3_tpu.ops.pallas_decode import fused_box_decode_cf

    spec = VariantSpec(Variant.ALEATORIC, C)
    nb, h, w = 18, 16, 128  # hw = 2048 exactly one _pick_tile tile
    chpp = spec.head_channels_per_prior
    assert (chpp + 14 + C) * nb * 4 * 2 * 2048 > 8 * 1024 * 1024
    raw = rng.standard_normal((nb, h, w, 3 * chpp)).astype(np.float32)

    det = decode.split_detection(jnp.asarray(raw), spec)
    ref = decode.decode_bbox_aleatoric(det, jnp.asarray(PRIORS), layer_id=2)
    want = np.stack([
        np.asarray(ref[b]).transpose(2, 0, 1, 3).reshape(3 * h * w, -1)
        for b in range(nb)
    ])
    raw_cf = jnp.asarray(raw.reshape(nb, h * w, 3 * chpp).transpose(2, 0, 1))
    got = np.asarray(
        fused_box_decode_cf(
            raw_cf, jnp.asarray(PRIORS), h=h, w=w, cls_cnt=C, layer_id=2,
            aleatoric=True, interpret=True,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
