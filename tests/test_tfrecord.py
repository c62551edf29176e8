"""tfrecord + Example proto parity against TensorFlow's own implementations
(TF used only as a golden oracle)."""

import numpy as np
import pytest

from bayesian_yolov3_tpu.data import proto, tfrecord


def test_crc32c_known_vectors():
    # RFC 3720 test vector: crc32c of 32 zero bytes
    assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_crc32c_native_matches_python_fallback(rng):
    data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    assert tfrecord.crc32c(data) == tfrecord._crc32c_py(data)
    got = tfrecord.masked_crc32c(data)
    crc = tfrecord._crc32c_py(data)
    want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert got == want


def _example_dict():
    return {
        "image/encoded": [b"\x89PNG-fake-bytes"],
        "image/height": np.asarray([1024], np.int64),
        "image/width": np.asarray([1920], np.int64),
        "image/object/bbox/xmin": np.asarray([0.1, 0.5], np.float32),
        "image/object/bbox/ymin": np.asarray([0.2, 0.6], np.float32),
        "image/object/bbox/xmax": np.asarray([0.3, 0.7], np.float32),
        "image/object/bbox/ymax": np.asarray([0.4, 0.8], np.float32),
        "image/object/class/label": np.asarray([1, 2], np.int64),
        "image/filename": [b"img_0001.png"],
    }


def test_example_roundtrip_ours():
    feats = _example_dict()
    buf = proto.encode_example(feats)
    got = proto.decode_example(buf)
    assert got["image/encoded"] == [b"\x89PNG-fake-bytes"]
    np.testing.assert_array_equal(got["image/height"], [1024])
    np.testing.assert_allclose(got["image/object/bbox/xmin"], [0.1, 0.5], rtol=1e-6)
    np.testing.assert_array_equal(got["image/object/class/label"], [1, 2])


def test_example_parses_with_tf():
    tf = pytest.importorskip("tensorflow")
    buf = proto.encode_example(_example_dict())
    ex = tf.train.Example.FromString(buf)
    f = ex.features.feature
    assert f["image/encoded"].bytes_list.value[0] == b"\x89PNG-fake-bytes"
    assert list(f["image/height"].int64_list.value) == [1024]
    np.testing.assert_allclose(
        list(f["image/object/bbox/xmin"].float_list.value), [0.1, 0.5], rtol=1e-6
    )


def test_example_decodes_tf_encoding():
    tf = pytest.importorskip("tensorflow")
    ex = tf.train.Example(
        features=tf.train.Features(
            feature={
                "image/encoded": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[b"payload"])
                ),
                "image/object/bbox/xmin": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[0.25, 0.75])
                ),
                "image/object/class/label": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[2, 1])
                ),
            }
        )
    )
    got = proto.decode_example(ex.SerializeToString())
    assert got["image/encoded"] == [b"payload"]
    np.testing.assert_allclose(got["image/object/bbox/xmin"], [0.25, 0.75])
    np.testing.assert_array_equal(got["image/object/class/label"], [2, 1])


def test_our_records_readable_by_tf(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "ours.tfrecord")
    payloads = [b"alpha", b"beta" * 100, b"gamma"]
    with tfrecord.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    got = [r.numpy() for r in tf.data.TFRecordDataset(path)]
    assert got == payloads


def test_tf_records_readable_by_us(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "tf.tfrecord")
    payloads = [b"one", b"two" * 50]
    with tf.io.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    assert list(tfrecord.read_records(path, verify=True)) == payloads


def test_interleaved_shard_reader(tmp_path):
    for i in range(3):
        with tfrecord.TFRecordWriter(str(tmp_path / f"data-{i}-of-3.tfrecord")) as w:
            for j in range(2):
                w.write(f"shard{i}rec{j}".encode())
    got = [r.decode() for r in tfrecord.read_shards(str(tmp_path / "data-*-of-3.tfrecord"))]
    # cycle_length=2, block_length=1 round robin (reference dataset_utils.py:104)
    assert got == ["shard0rec0", "shard1rec0", "shard0rec1", "shard1rec1",
                   "shard2rec0", "shard2rec1"]
