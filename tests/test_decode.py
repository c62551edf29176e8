"""Parity tests: JAX decode / entropy / epistemic reducers vs numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
from bayesian_yolov3_tpu.ops import decode

import oracles

C = 2
PRIORS = np.array([[0.3, 0.1], [0.15, 0.05], [0.08, 0.02]], np.float32)


def _raw(rng, h, w, spec, lead=()):
    ch = 3 * spec.head_channels_per_prior
    return rng.standard_normal((*lead, h, w, ch)).astype(np.float32) * 2.0


def test_decode_standard_matches_oracle(rng):
    spec = VariantSpec(Variant.STANDARD, C)
    raw = _raw(rng, 4, 6, spec, lead=(2,))
    det = decode.split_detection(jnp.asarray(raw), spec)
    got = np.asarray(decode.decode_bbox_standard(det, jnp.asarray(PRIORS), layer_id=1))
    want = oracles.decode_standard(raw, C, PRIORS)
    # columns 0..4+C are the reference layout (width 5+C); the trailing
    # layer_id/prior_id columns are the documented quirk fix
    assert got.shape == (2, 4, 6, 3, 7 + C)
    np.testing.assert_allclose(got[..., : 5 + C], want, rtol=1e-5, atol=1e-6)
    assert np.all(got[..., -2] == 1)
    assert np.all(got[..., 0, -1] == 0) and np.all(got[..., 2, -1] == 2)


def test_decode_aleatoric_matches_oracle(rng):
    spec = VariantSpec(Variant.ALEATORIC, C)
    raw = _raw(rng, 3, 5, spec)
    det = decode.split_detection(jnp.asarray(raw), spec)
    got = np.asarray(decode.decode_bbox_aleatoric(det, jnp.asarray(PRIORS), layer_id=1))
    want = oracles.decode_aleatoric(raw, C, PRIORS, layer_id=1)
    assert got.shape == (3, 5, 3, 14 + C)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # layer/prior id columns
    assert np.all(got[..., -2] == 1)
    assert np.all(got[..., 0, -1] == 0) and np.all(got[..., 2, -1] == 2)


def test_epistemic_stats_and_decode_match_oracle(rng):
    spec = VariantSpec(Variant.BAYESIAN, C)
    T = 7
    raw = _raw(rng, 2, 3, spec, lead=(T,))
    det = decode.split_detection(jnp.asarray(raw), spec)
    got = decode.decode_epistemic_stats(det)
    want = oracles.epistemic_stats(raw, C)
    for k in want:
        # mutual info is a difference of entropies: f32 cancellation needs
        # a looser absolute tolerance than the direct quantities.
        atol = 2e-4 if "mutual_info" in k else 1e-5
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k], rtol=1e-4, atol=atol, err_msg=k
        )

    bbox = np.asarray(decode.decode_bbox_epistemic(got, jnp.asarray(PRIORS), layer_id=2))
    assert bbox.shape == (2, 3, 3, 21 + C)
    # spot-check column layout against the oracle pieces
    corners = oracles.decode_corners(want["ev_loc"], PRIORS)
    np.testing.assert_allclose(bbox[..., :4], corners, rtol=1e-4, atol=1e-5)
    epi_diag = np.diagonal(want["epi_covar_loc"], axis1=-2, axis2=-1)
    np.testing.assert_allclose(bbox[..., 4:8], epi_diag, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(bbox[..., 8:12], want["ale_var_loc"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        bbox[..., 12], np.linalg.det(want["epi_covar_loc"]), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(bbox[..., 13], want["ale_var_loc"].sum(-1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(bbox[..., 14], want["obj_mean"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(bbox[..., 15], want["obj_mutual_info"], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(bbox[..., 16], want["obj_entropy"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(bbox[..., 17:19], want["cls_mean"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(bbox[..., 19], want["cls_mutual_info"], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(bbox[..., 20], want["cls_entropy"], rtol=1e-4, atol=1e-5)
    assert np.all(bbox[..., 21] == 2)


def test_entropy_saturation_is_finite():
    # deviation from the reference documented in ops/decode.py: entropy at
    # p in {0, 1} is 0, not NaN.
    p = jnp.asarray([0.0, 1.0, 0.5])
    ent = np.asarray(decode.logistic_entropy(p))
    assert np.isfinite(ent).all()
    np.testing.assert_allclose(ent[2], np.log(2.0), rtol=1e-6)


def test_concat_all_scales_ordering(rng):
    spec = VariantSpec(Variant.STANDARD, C)
    d1 = jnp.asarray(rng.standard_normal((2, 2, 3, 7)).astype(np.float32))
    d2 = jnp.asarray(rng.standard_normal((4, 4, 3, 7)).astype(np.float32))
    out = np.asarray(decode.concat_all_scales([d1, d2]))
    assert out.shape == (2 * 2 * 3 + 4 * 4 * 3, 7)
    # layer-major then prior-major then row-major (reference concat_bbox)
    np.testing.assert_array_equal(out[0], np.asarray(d1)[0, 0, 0])
    np.testing.assert_array_equal(out[1], np.asarray(d1)[0, 1, 0])
    np.testing.assert_array_equal(out[2], np.asarray(d1)[1, 0, 0])
    np.testing.assert_array_equal(out[4], np.asarray(d1)[0, 0, 1])
    np.testing.assert_array_equal(out[12], np.asarray(d2)[0, 0, 0])
