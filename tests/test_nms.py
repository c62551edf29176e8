"""NMS parity: JAX greedy NMS vs numpy oracle and vs tf.image NMS.

TF is used here ONLY as a golden oracle (it is the kernel the reference
delegates to); the framework itself never imports it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.ops import nms

import oracles


def _random_boxes(rng, n):
    yx = rng.uniform(0, 0.9, (n, 2))
    hw = rng.uniform(0.01, 0.3, (n, 2))
    boxes = np.concatenate([yx, yx + hw], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n,max_out", [(50, 10), (300, 100), (500, 1000)])
def test_greedy_nms_matches_numpy_oracle(rng, n, max_out):
    boxes, scores = _random_boxes(rng, n)
    idx, count = nms.greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), max_out, 0.5)
    idx = np.asarray(idx)
    want = oracles.greedy_nms(boxes, scores, max_out, 0.5)
    assert int(count) == len(want)
    np.testing.assert_array_equal(idx[: len(want)], want)
    assert np.all(idx[len(want):] == -1)


def test_greedy_nms_matches_tf_kernel(rng):
    tf = pytest.importorskip("tensorflow")
    boxes, scores = _random_boxes(rng, 400)
    want = tf.image.non_max_suppression(boxes, scores, 1000).numpy()
    idx, count = nms.greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 1000, 0.5)
    np.testing.assert_array_equal(np.asarray(idx)[: int(count)], want)


def test_nms_select_padding(rng):
    boxes, scores = _random_boxes(rng, 40)
    width = 9
    decoded = np.zeros((40, width), np.float32)
    decoded[:, :4] = boxes
    decoded[:, 4] = scores
    rows, valid, count = nms.nms_select(jnp.asarray(decoded), obj_idx=4, max_out=50)
    rows, valid = np.asarray(rows), np.asarray(valid)
    assert rows.shape == (50, width)
    assert valid.sum() == int(count) <= 40
    assert np.all(rows[~valid] == 0)
    # selected rows are in descending score order
    sel = rows[valid]
    assert np.all(np.diff(sel[:, 4]) <= 1e-7)


def test_per_class_nms(rng):
    boxes, scores = _random_boxes(rng, 100)
    decoded = np.zeros((100, 8), np.float32)
    decoded[:, :4] = boxes
    decoded[:, 4] = scores
    decoded[:, 5:7] = rng.uniform(0, 1, (100, 2))
    rows, valid, count = nms.per_class_nms(
        jnp.asarray(decoded), obj_idx=4, cls_start_idx=5, cls_cnt=2, max_out=50
    )
    winner = np.argmax(decoded[:, 5:7], axis=1)
    for c in range(2):
        member = winner == c
        want = oracles.greedy_nms(boxes[member], scores[member], 50, 0.5)
        got = np.asarray(rows)[c * 50 : c * 50 + 50][np.asarray(valid)[c * 50 : c * 50 + 50]]
        assert len(got) == len(want)
        np.testing.assert_allclose(got[:, :4], boxes[member][want], rtol=1e-6)


def test_pre_top_k_matches_full_nms(rng):
    boxes, scores = _random_boxes(rng, 2000)
    decoded = np.zeros((2000, 6), np.float32)
    decoded[:, :4] = boxes
    decoded[:, 4] = scores
    full_rows, full_valid, full_count = nms.nms_select(
        jnp.asarray(decoded), obj_idx=4, max_out=100
    )
    fast_rows, fast_valid, fast_count = nms.nms_select(
        jnp.asarray(decoded), obj_idx=4, max_out=100, pre_top_k=800
    )
    assert int(full_count) == int(fast_count)
    np.testing.assert_array_equal(np.asarray(full_rows), np.asarray(fast_rows))


def test_pallas_nms_matches_xla(rng):
    from bayesian_yolov3_tpu.ops.pallas_nms import greedy_nms_pallas

    boxes, scores = _random_boxes(rng, 256)
    want_idx, want_cnt = nms.greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 100, 0.5)
    got_idx, got_cnt = greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), 100, 0.5, interpret=True
    )
    assert int(got_cnt) == int(want_cnt)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
