"""Host-side input pipeline: tfrecords -> decoded, padded, batched numpy.

The reference builds its input graph in TF's C++ tf.data runtime
(dataset_utils.py:98-160: list_files -> shuffle -> interleave -> parse ->
cache -> crop -> augment -> GT-encode -> shuffle -> repeat -> batch ->
prefetch).  The TPU-native split is different on purpose:

* HOST (this module): record reading, PNG decode, GT padding, shuffle
  buffer, batching, and a prefetch thread — the irreducibly host-side work,
  overlapped with device steps (parity with the reference's host-side
  pipelining, SURVEY §2.9).
* DEVICE (train step): [0,1) scaling, crop, augmentation, and the
  vectorized GT encoder run jitted on the accelerator, fused into the
  training step — instead of burning host CPUs per element.

Output batches are dicts of numpy arrays::

    image  (B, H, W, 3) uint8
    bbox   (B, M, 4)    float32  [ymin, xmin, ymax, xmax] normalized
    label  (B, M)       int32    (background shift already applied)
    valid  (B, M)       bool
    filename (B,) bytes          (testing pipeline only)
"""

from __future__ import annotations

import collections
import io
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

from ..config import Config
from . import proto, tfrecord


def parallel_map(
    fn: Callable, it: Iterable, workers: int, depth_factor: int = 4
) -> Iterator:
    """Order-preserving parallel map over an iterator (thread pool).

    The TPU-native counterpart of the reference's
    ``num_parallel_calls=cpu_thread_cnt`` record parse
    (dataset_utils.py:106): record parse + PNG decode fan out over
    ``workers`` threads (PIL and zlib release the GIL), with a bounded
    in-flight window so memory stays flat.  Results come back in input
    order, so pipelines stay deterministic for a fixed seed.
    """
    if workers <= 1:
        for x in it:
            yield fn(x)
        return
    pending: "collections.deque" = collections.deque()
    with ThreadPoolExecutor(max_workers=workers) as ex:
        try:
            for x in it:
                pending.append(ex.submit(fn, x))
                if len(pending) >= workers * depth_factor:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            for f in pending:
                f.cancel()


_PNG_NATIVE = None


def _png_native():
    """The libpng decode kernel from native/libbyolo_native.so, or False.

    ctypes releases the GIL during the call, so the cpu_thread_cnt parse
    pool decodes on real cores in parallel.  A library built without
    libpng (see native/build.sh) simply lacks the symbols -> PIL fallback.
    """
    global _PNG_NATIVE
    if _PNG_NATIVE is None:
        import ctypes

        lib = tfrecord._load_native()
        if lib and hasattr(lib, "byolo_png_decode_rgb") and hasattr(
            lib, "byolo_png_probe"
        ):
            lib.byolo_png_probe.restype = ctypes.c_int
            lib.byolo_png_probe.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.byolo_png_decode_rgb.restype = ctypes.c_int
            lib.byolo_png_decode_rgb.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t,
            ]
            _PNG_NATIVE = lib
        else:
            _PNG_NATIVE = False
    return _PNG_NATIVE


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 (parity dataset_utils.decode_img :6-11,
    minus the [0,1) scaling which happens on device).

    Decodes through the native libpng kernel (native/png_decode.c) when
    built, PIL otherwise — outputs are identical for the color types the
    native path accepts (8-bit gray/palette/RGB, tested).  Alpha and
    16-bit PNGs always decode through PIL: libpng's simplified API
    composites alpha against a background and rescales 16-bit samples
    differently from PIL's convert("RGB"), and training pixels must not
    depend on whether the native kernel was built."""
    lib = _png_native()
    if lib:
        import ctypes

        h = ctypes.c_int32()
        w = ctypes.c_int32()
        flags = ctypes.c_int32()
        if (
            lib.byolo_png_probe(
                data, len(data), ctypes.byref(h), ctypes.byref(w),
                ctypes.byref(flags),
            ) == 0
            and flags.value == 0  # no alpha, not 16-bit
        ):
            out = np.empty((h.value, w.value, 3), np.uint8)
            rc = lib.byolo_png_decode_rgb(
                data, len(data), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
            )
            if rc == 0:
                return out
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def parse_example(
    record: bytes, config: Config, with_filename: bool = False
) -> Dict[str, np.ndarray]:
    """TF Object Detection API schema parse (dataset_utils.py:16-55).

    Applies the implicit-background-class label shift (labels start at 1 in
    the tfrecords -> shift to 0-based, dataset_utils.py:43-51).
    """
    feats = proto.decode_example(record)
    img = decode_png(feats["image/encoded"][0])
    xmin = np.asarray(feats.get("image/object/bbox/xmin", []), np.float32)
    ymin = np.asarray(feats.get("image/object/bbox/ymin", []), np.float32)
    xmax = np.asarray(feats.get("image/object/bbox/xmax", []), np.float32)
    ymax = np.asarray(feats.get("image/object/bbox/ymax", []), np.float32)
    bbox = np.stack([ymin, xmin, ymax, xmax], axis=1) if len(xmin) else np.zeros((0, 4), np.float32)
    label = np.asarray(feats.get("image/object/class/label", []), np.int64).astype(np.int32)
    if config.implicit_background_class:
        label = label - 1
    out = {"image": img, "bbox": bbox, "label": label}
    if with_filename:
        names = feats.get("image/filename", [b""])
        out["filename"] = names[0] if names else b""
    return out


def zero_center(img):
    """[0,1) -> [-1,1) (parity dataset_utils.zero_center :66-68 — present in
    the reference but not wired into any pipeline; kept for API parity).
    The networks consume [0,1) images (reference detect.py:77)."""
    return 2.0 * (img - 0.5)


def _pad(parsed: Dict, max_boxes: int) -> Dict:
    m = min(len(parsed["bbox"]), max_boxes)
    bbox = np.zeros((max_boxes, 4), np.float32)
    label = np.zeros((max_boxes,), np.int32)
    valid = np.zeros((max_boxes,), bool)
    bbox[:m] = parsed["bbox"][:m]
    label[:m] = parsed["label"][:m]
    valid[:m] = True
    return {**parsed, "bbox": bbox, "label": label, "valid": valid}


class ShuffleBuffer:
    """Reservoir-style shuffle buffer (tf.data.Dataset.shuffle semantics)."""

    def __init__(self, size: int, rng: np.random.Generator):
        self.size = max(1, size)
        self.rng = rng
        self.buf: List = []

    def __call__(self, it: Iterator) -> Iterator:
        for item in it:
            if len(self.buf) < self.size:
                self.buf.append(item)
                continue
            j = int(self.rng.integers(0, self.size))
            out, self.buf[j] = self.buf[j], item
            yield out
        self.rng.shuffle(self.buf)
        while self.buf:
            yield self.buf.pop()


def _batch(items: List[Dict]) -> Dict[str, np.ndarray]:
    keys = items[0].keys()
    out = {}
    for k in keys:
        if k == "filename":
            out[k] = np.asarray([it[k] for it in items], dtype=object)
        else:
            out[k] = np.stack([it[k] for it in items])
    return out


class _Prefetcher:
    """Background-thread prefetch (parity: .prefetch(1) + the reference's
    async worker threads, dataset_utils.py:137-144)."""

    def __init__(self, gen_fn, depth: int = 2):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def run():
            try:
                for item in gen_fn():
                    if self._stop.is_set():
                        return
                    self.q.put(item)
            except BaseException as e:  # surface worker errors to the consumer
                self.q.put(e)
            self.q.put(None)

        self.thread = threading.Thread(target=run, daemon=True)
        self.thread.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self):
        self._stop.set()
        while not self.q.empty():
            self.q.get_nowait()


class TrainLoader:
    """Infinite shuffled train/val batches (parity TrainValDataset :113-160).

    Multi-host: pass ``host_index``/``host_count`` (jax.process_index/count)
    — each host reads a disjoint stripe of the shard files and yields LOCAL
    batches of ``batch_size / host_count`` rows, assembled into the global
    batch by parallel.mesh.shard_batch.
    """

    def __init__(self, config: Config, split: str = "train", seed: int = 0,
                 host_index: int = 0, host_count: int = 1):
        self.config = config
        self.split_cfg = getattr(config, split)
        self.split = split
        self.host_index = host_index
        self.host_count = host_count
        assert config.batch_size % host_count == 0, (
            f"global batch {config.batch_size} not divisible by "
            f"{host_count} hosts"
        )
        self.local_batch_size = config.batch_size // host_count
        self.rng = np.random.default_rng(seed + 1031 * host_index)
        self._prefetcher: Optional[_Prefetcher] = None

    def _epochs(self) -> Iterator[Dict]:
        """parse -> [cache] -> shuffle -> repeat, the reference's stage order
        (create_dataset parses then ``.cache()``, dataset_utils.py:98-110;
        TrainValDataset shuffles after).  The cache therefore holds PARSED
        elements — decoded uint8 images + padded GT — so steady-state epochs
        skip record parse and PNG decode entirely (the reference caches the
        decoded f32 image, ~4x more host RAM than our uint8)."""
        cache: Optional[List[Dict]] = [] if self.split_cfg.cache else None
        first = True
        while True:  # .repeat()
            if cache is not None and not first:
                parsed_it: Iterator[Dict] = iter(cache)
            else:
                records = tfrecord.read_shards(
                    self.split_cfg.file_pattern, shuffle_rng=self.rng,
                    shard_index=self.host_index, shard_count=self.host_count,
                )
                # parse + PNG decode fan out over cpu_thread_cnt threads
                # (parity dataset_utils.py:106 num_parallel_calls)
                parsed_it = parallel_map(
                    lambda rec: _pad(
                        parse_example(rec, self.config),
                        self.config.max_boxes_per_img,
                    ),
                    records,
                    self.config.cpu_thread_cnt,
                )
                if cache is not None:
                    parsed_it = self._caching_iter(parsed_it, cache)
            yield from ShuffleBuffer(
                self.split_cfg.shuffle_buffer_size, self.rng
            )(parsed_it)
            first = False

    @staticmethod
    def _caching_iter(records, cache):
        for r in records:
            cache.append(r)
            yield r

    def batches(self) -> Iterator[Dict[str, np.ndarray]]:
        def gen():
            buf = []
            for item in self._epochs():
                buf.append(item)
                if len(buf) == self.local_batch_size:
                    yield _batch(buf)
                    buf = []

        self._prefetcher = _Prefetcher(gen)
        return iter(self._prefetcher)

    def close(self):
        if self._prefetcher:
            self._prefetcher.close()


_PACK_PAD = 8  # row pad of the flat channels-first chain (pallas_conv.PAD)


def pack_planes_host(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (16, (H/2 + 2*PAD) * wp) uint8 s2d CF planes.

    The host-side twin of the device input pack
    ``pack_nhwc_to_flat_cf(_space_to_depth(x), wp, c_pad=16)`` (same
    channel order (pi*2+pj)*3 + c, same row/lane pads), in uint8 — the
    device only casts and scales by 1/255.  WHY on the host: the
    NHWC->channels-first relayout of a full-resolution image costs a
    measured, XLA-irreducible ~4 ms/img on the TPU (BENCH_NOTES.md
    round-3 dead-end log) but is a trivial strided copy on a multi-core
    host loader thread; shipping u8 planes also cuts host->device
    transfer ~2.7x vs f32 NHWC.
    """
    H, W, C = img.shape
    assert C == 3 and H % 2 == 0 and W % 2 == 0
    h2, w2 = H // 2, W // 2
    wp = -(-w2 // 256) * 256
    y = img.reshape(h2, 2, w2, 2, C).transpose(1, 3, 4, 0, 2)
    y = np.ascontiguousarray(y).reshape(4 * C, h2, w2)
    out = np.zeros((16, h2 + 2 * _PACK_PAD, wp), np.uint8)
    out[:12, _PACK_PAD:_PACK_PAD + h2, :w2] = y
    return out.reshape(16, -1)


class TestLoader:
    """One-epoch, ordered (img, filename) batches (parity TestingDataset
    :188-219).

    ``pack_planes=True``: each image is additionally emitted as s2d
    channels-first u8 planes under the ``"packed"`` key
    (``pack_planes_host``) — computed on the parser thread pool, for the
    runner's packed-input device pipeline.
    """

    def __init__(self, config: Config, batch_size: Optional[int] = None,
                 pack_planes: bool = False):
        self.config = config
        self.batch_size = batch_size or config.batch_size
        self.pack_planes = pack_planes

    def batches(self) -> Iterator[Dict[str, np.ndarray]]:
        def parse(rec):
            parsed = parse_example(rec, self.config, with_filename=True)
            parsed.pop("bbox"), parsed.pop("label")
            if self.pack_planes:
                parsed["packed"] = pack_planes_host(parsed["image"])
            return parsed

        def gen():
            buf = []
            parsed_it = parallel_map(
                parse,
                tfrecord.read_shards(self.config.data.file_pattern),
                self.config.cpu_thread_cnt,
            )
            for parsed in parsed_it:
                buf.append(parsed)
                if len(buf) == self.batch_size:
                    yield _batch(buf)
                    buf = []
            if buf:
                yield _batch(buf)  # final partial batch

        return iter(_Prefetcher(gen))
