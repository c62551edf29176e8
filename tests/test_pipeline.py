"""Host input pipeline tests over a synthetic tfrecord dataset."""

import numpy as np
import pytest

from bayesian_yolov3_tpu.config import Config, DataConfig
from bayesian_yolov3_tpu.data import pipeline

import synth


@pytest.fixture
def dataset(tmp_path, rng):
    pattern = synth.write_dataset(str(tmp_path), rng, n_images=6, img_hw=(64, 96))
    return pattern


def _config(pattern):
    return Config(
        model="standard",
        full_img_size=(64, 96, 3),
        batch_size=2,
        max_boxes_per_img=8,
        train=DataConfig(file_pattern=pattern, num_shards=2, shuffle_buffer_size=4),
        val=DataConfig(file_pattern=pattern, num_shards=2, shuffle_buffer_size=4),
        data=DataConfig(file_pattern=pattern),
    )


def test_train_loader_batches(dataset):
    cfg = _config(dataset)
    loader = pipeline.TrainLoader(cfg, "train", seed=1)
    it = loader.batches()
    for _ in range(5):  # > one epoch: repeat works
        batch = next(it)
        assert batch["image"].shape == (2, 64, 96, 3)
        assert batch["image"].dtype == np.uint8
        assert batch["bbox"].shape == (2, 8, 4)
        assert batch["label"].shape == (2, 8)
        assert batch["valid"].any()
        # background shift applied: labels in {0,1} at valid slots
        assert set(batch["label"][batch["valid"]]) <= {0, 1}
    loader.close()


def test_test_loader_one_epoch_with_filenames(dataset):
    cfg = _config(dataset)
    batches = list(pipeline.TestLoader(cfg, batch_size=4).batches())
    n = sum(b["image"].shape[0] for b in batches)
    assert n == 6  # exactly one epoch, partial final batch included
    names = [f for b in batches for f in b["filename"]]
    assert all(name.endswith(b".png") for name in names)
    assert len(set(names)) == 6


def test_parse_example_label_shift(dataset, rng):
    from bayesian_yolov3_tpu.data import tfrecord

    cfg = _config(dataset)
    rec = next(tfrecord.read_shards(dataset))
    with_shift = pipeline.parse_example(rec, cfg)
    cfg2 = _config(dataset)
    cfg2.implicit_background_class = False
    without = pipeline.parse_example(rec, cfg2)
    np.testing.assert_array_equal(with_shift["label"] + 1, without["label"])
    assert with_shift["image"].shape == (64, 96, 3)


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    it = iter(pipeline._Prefetcher(gen))
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_parallel_parse_is_deterministic(dataset):
    """cpu_thread_cnt is live (parity dataset_utils.py:106) and the
    order-preserving pool yields byte-identical batches vs 1 thread."""
    def take(threads, n=4):
        cfg = _config(dataset)
        cfg.cpu_thread_cnt = threads
        loader = pipeline.TrainLoader(cfg, "train", seed=3)
        it = loader.batches()
        out = [next(it) for _ in range(n)]
        loader.close()
        return out

    a, b = take(1), take(4)
    for ba, bb in zip(a, b):
        for k in ("image", "bbox", "label", "valid"):
            np.testing.assert_array_equal(ba[k], bb[k])


def test_parallel_map_preserves_order_and_errors():
    got = list(pipeline.parallel_map(lambda x: x * x, range(100), workers=8))
    assert got == [x * x for x in range(100)]

    def boom(x):
        if x == 5:
            raise ValueError("boom")
        return x

    with pytest.raises(ValueError):
        list(pipeline.parallel_map(boom, range(10), workers=4))


def test_cache_skips_decode_after_first_epoch(dataset, monkeypatch):
    """cache=True holds PARSED elements (reference caches post-parse,
    dataset_utils.py:98-110): PNG decode must run exactly once per image
    across many epochs, and later epochs must replay the same element set."""
    cfg = _config(dataset)
    cfg.train.cache = True
    calls = {"n": 0}
    real = pipeline.decode_png

    def counting(data):
        calls["n"] += 1
        return real(data)

    monkeypatch.setattr(pipeline, "decode_png", counting)
    loader = pipeline.TrainLoader(cfg, "train", seed=3)
    it = loader.batches()
    seen = [next(it) for _ in range(9)]  # 3 epochs of 6 imgs at batch 2
    loader.close()
    assert calls["n"] == 6, calls["n"]
    # every epoch yields the same image multiset (shuffled order)
    sums = sorted(int(b["image"][i].sum()) for b in seen[:3] for i in range(2))
    sums2 = sorted(int(b["image"][i].sum()) for b in seen[3:6] for i in range(2))
    assert sums == sums2


def test_native_png_decode_matches_pil(rng):
    """The libpng kernel (native/png_decode.c) must produce byte-identical
    RGB output to the PIL fallback, including gray->RGB expansion; skips if
    the native lib was built without libpng."""
    import io

    from PIL import Image

    if not pipeline._png_native():
        pytest.skip("native lib built without libpng")

    def png_bytes(img, mode):
        b = io.BytesIO()
        Image.fromarray(img, mode).save(b, "PNG")
        return b.getvalue()

    for mode, shape in (("RGB", (40, 56, 3)), ("L", (40, 56))):
        data = png_bytes(rng.integers(0, 255, shape, dtype=np.uint8), mode)
        got = pipeline.decode_png(data)
        want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=mode)

    # palette (8-bit, no alpha): also on the native path, PIL-identical
    pal_src = Image.fromarray(
        rng.integers(0, 255, (40, 56, 3), dtype=np.uint8), "RGB"
    ).quantize(colors=32)
    b = io.BytesIO()
    pal_src.save(b, "PNG")
    data = b.getvalue()
    got = pipeline.decode_png(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(got, want, err_msg="P")

    # alpha and 16-bit inputs must NOT take the native path (libpng's
    # simplified API composites alpha / rescales 16-bit differently from
    # PIL): decode_png must return exactly what the PIL fallback returns,
    # so training pixels never depend on whether the kernel was built
    rgba = rng.integers(0, 255, (40, 56, 4), dtype=np.uint8)
    data = png_bytes(rgba, "RGBA")
    got = pipeline.decode_png(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(got, want, err_msg="RGBA")

    g16 = rng.integers(0, 65535, (40, 56), dtype=np.uint16)
    b = io.BytesIO()
    Image.fromarray(g16, "I;16").save(b, "PNG")
    data = b.getvalue()
    got = pipeline.decode_png(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(got, want, err_msg="16-bit")

    # corrupt input: falls back to PIL, which raises -> decode_png raises
    with pytest.raises(Exception):
        pipeline.decode_png(b"not a png")
