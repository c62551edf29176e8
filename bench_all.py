#!/usr/bin/env python
"""Detailed multi-config benchmark (bench.py stays the one-line headline).

Measures the BASELINE.json config list on the current device and writes
BENCH_DETAIL.json:
  * epistemic inference T=30, batch 1 (headline)
  * aleatoric batched inference (reference batch 11)
  * standard batched inference
  * training step at the reference pretrain config
"""

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

FULL = (1024, 1920, 3)


def _pipe_time(dispatch, iters=8, depth=2):
    infl = collections.deque()
    t0 = time.time()
    for i in range(iters):
        infl.append(dispatch(i))
        if len(infl) >= depth:
            int(infl.popleft())
    while infl:
        int(infl.popleft())
    return (time.time() - t0) / iters


def bench_epistemic(packed=False, nb=1, quantize=False, fixed_masks=None,
                    T=30):
    import jax, jax.numpy as jnp
    from bayesian_yolov3_tpu.config import Config
    from bayesian_yolov3_tpu.core.priors import priors_as_array
    from bayesian_yolov3_tpu.models.yolov3 import YoloV3, mc_forward_cf
    from bayesian_yolov3_tpu.ops import decode, nms
    from bayesian_yolov3_tpu.ops.pallas_epistemic import (
        fused_epistemic_decode_cf,
        fused_epistemic_decode_cf_batched,
    )

    cfg = Config(model="bayesian", full_img_size=FULL, T=T, inference_mode=True)
    m = YoloV3.from_config(cfg)
    pri = priors_as_array(m.priors)
    params, stats = m.init(jax.random.PRNGKey(0))
    if packed:
        # host-packed u8 planes feed (config.packed_host_input): the
        # ~4 ms/img on-device input relayout moves to the host loader
        from bayesian_yolov3_tpu.data.pipeline import pack_planes_host

        img8 = np.random.default_rng(0).integers(
            0, 256, (nb, *FULL), dtype=np.uint8)
        img = jnp.asarray(np.stack([pack_planes_host(im) for im in img8]))
    else:
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (nb, *FULL)), jnp.float32)

    qh = None
    if quantize:
        # int8 PTQ head section (Config.quantize="int8"): calibrate on one
        # random image, then run the quantized forward in place of bf16
        from bayesian_yolov3_tpu.ops.quant import (
            calibrate_mc_amax, quantize_heads)

        calib = np.random.default_rng(2).uniform(0, 1, (1, *FULL))
        amax = calibrate_mc_amax(
            params, stats, jnp.asarray(calib, jnp.float32), spec=m.spec,
            T=4, rng=jax.random.PRNGKey(3), compute_dtype=m._dtype)
        qh = quantize_heads(params, stats, m.spec, amax)

    def fn(p, s, x, k):
        if qh is not None:
            from bayesian_yolov3_tpu.models.quant import mc_forward_cf_q

            outs = mc_forward_cf_q(
                qh, p, s, x, spec=m.spec, T=T, rng=k,
                compute_dtype=m._dtype,
                packed_hw=FULL[:2] if packed else None,
                fixed_masks=fixed_masks)
        else:
            outs = mc_forward_cf(p, s, x, spec=m.spec, T=T, rng=k, compute_dtype=m._dtype,
                                 packed_hw=FULL[:2] if packed else None,
                                 fixed_masks=fixed_masks)
        if nb == 1:
            decoded = [
                fused_epistemic_decode_cf(r, jnp.asarray(pri[st]), h=hw[0], w=hw[1],
                                          cls_cnt=2, layer_id=i)
                for i, ((r, hw), st) in enumerate(zip(outs, (32, 16, 8)))
            ]
            flat = decode.concat_all_scales(decoded)
            return nms.nms_select(flat, 14, 1000, 0.5, pre_top_k=8192,
                                  use_pallas=True)[2]
        # image batch > 1: the runner's anchor-folding epistemic path
        # (VERDICT r3 #8 — measure whether batching beats the batch-1
        # headline config or confirms batch 1 saturates the chip)
        flat = jnp.concatenate(
            [
                fused_epistemic_decode_cf_batched(
                    r, jnp.asarray(pri[st]), n_imgs=nb, h=hw[0], w=hw[1],
                    cls_cnt=2, layer_id=i)
                for i, ((r, hw), st) in enumerate(zip(outs, (32, 16, 8)))
            ],
            axis=1,
        )
        return jnp.sum(nms.nms_select_batch(
            flat, 14, 1000, 0.5, pre_top_k=8192, use_pallas=True)[2])

    j = jax.jit(fn)
    key = jax.random.key(1, impl="rbg")
    for i in range(3):
        int(j(params, stats, img, jax.random.fold_in(key, i)))
    dt = _pipe_time(lambda i: j(params, stats, img, jax.random.fold_in(key, 100 + i)),
                    iters=8 if nb == 1 else 5)
    return {"img_per_sec": nb / dt, "ms_per_img": dt * 1000 / nb, "batch": nb}


def bench_batched(model, nb, packed=False, quantize=False):
    import jax, jax.numpy as jnp
    from bayesian_yolov3_tpu.config import Config
    from bayesian_yolov3_tpu.core.priors import priors_as_array
    from bayesian_yolov3_tpu.models.yolov3 import YoloV3, forward_cf
    from bayesian_yolov3_tpu.ops import nms
    from bayesian_yolov3_tpu.ops.pallas_decode import fused_box_decode_all_scales

    cfg = Config(model=model, full_img_size=FULL)
    m = YoloV3.from_config(cfg)
    pri = priors_as_array(m.priors)
    params, stats = m.init(jax.random.PRNGKey(0))
    if packed:
        # host-packed u8 planes feed (config.packed_host_input): the
        # ~4 ms/img on-device input relayout moves to the host loader
        from bayesian_yolov3_tpu.data.pipeline import pack_planes_host

        img8 = np.random.default_rng(0).integers(
            0, 256, (nb, *FULL), dtype=np.uint8)
        img = jnp.asarray(np.stack([pack_planes_host(im) for im in img8]))
    else:
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (nb, *FULL)), jnp.float32)
    obj_idx = m.spec.obj_idx(False)

    qh = None
    if quantize:
        # int8 PTQ of the batched head section (VERDICT r4 #1: the
        # reference's own batch-11 headline config)
        from bayesian_yolov3_tpu.ops.quant import (
            calibrate_forward_amax, quantize_heads)

        calib = np.random.default_rng(2).uniform(0, 1, (1, *FULL))
        amax = calibrate_forward_amax(
            params, stats, jnp.asarray(calib, jnp.float32), spec=m.spec,
            compute_dtype=m._dtype)
        qh = quantize_heads(params, stats, m.spec, amax)

    def fn(p, s, x):
        if qh is not None:
            from bayesian_yolov3_tpu.models.quant import forward_cf_q

            outs = forward_cf_q(qh, p, s, x, spec=m.spec,
                                compute_dtype=m._dtype,
                                packed_hw=FULL[:2] if packed else None)
        else:
            outs = forward_cf(p, s, x, spec=m.spec, compute_dtype=m._dtype,
                              packed_hw=FULL[:2] if packed else None)
        flat = fused_box_decode_all_scales(outs, pri, spec=m.spec)
        # production path: batched Pallas NMS (images on the kernel grid)
        return jnp.sum(nms.nms_select_batch(
            flat, obj_idx, 1000, 0.5, pre_top_k=8192, use_pallas=True)[2])

    j = jax.jit(fn)
    int(j(params, stats, img))
    dt = _pipe_time(lambda i: j(params, stats, img), iters=5)
    return {"img_per_sec": nb / dt, "ms_per_img": dt * 1000 / nb, "batch": nb}


def bench_train():
    import jax, jax.numpy as jnp
    from bayesian_yolov3_tpu.config import Config
    from bayesian_yolov3_tpu.data import encode
    from bayesian_yolov3_tpu.models.yolov3 import YoloV3
    from bayesian_yolov3_tpu.train import loop as L

    cfg = Config(model="aleatoric", crop=True, full_img_size=FULL,
                 crop_img_size=(768, 1440, 3), batch_size=8, max_boxes_per_img=60,
                 darknet53_weights="")
    m = YoloV3.from_config(cfg)
    tables = encode.build_prior_tables(m.blueprint)
    step_fn, _, opt = L.make_train_step(m, cfg, tables)
    state = L.init_state(m, cfg, jax.random.PRNGKey(0), opt)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(0, 255, (8, *FULL), dtype=np.uint8)),
        "bbox": jnp.asarray(np.tile(np.asarray([[0.2, 0.2, 0.6, 0.5]], np.float32), (8, 60, 1))),
        "label": jnp.ones((8, 60), jnp.int32),
        "valid": jnp.ones((8, 60), bool),
    }
    # the production Trainer's split-program hot loop (round 4): the
    # preprocess program for step i+1 is dispatched while step i executes,
    # and metrics are fetched one step behind (train/loop.py run()) — the
    # old fused-step sync-fetch pattern serialized a ~27 ms tunnel sync
    # plus the preprocess segment into every measured step
    j_pre = jax.jit(step_fn.preprocess)
    j_apply = jax.jit(step_fn.apply, donate_argnums=(0,))
    key = jax.random.key(0, impl="rbg")
    pending = j_pre(batch, key, np.int32(0))
    state, metrics = j_apply(state, *pending, key)
    float(metrics["total"])
    t0 = time.time()
    iters = 12
    pending = j_pre(batch, key, np.int32(1))
    last = None
    for i in range(iters):
        state, metrics = j_apply(state, *pending, key)
        pending = j_pre(batch, key, np.int32(i + 2))
        if last is not None:
            float(last["total"])
        last = metrics
    float(last["total"])
    dt = (time.time() - t0) / iters
    return {"ms_per_step": dt * 1000, "img_per_sec": 8 / dt,
            "config": "aleatoric crop 768x1440 batch 8 frozen backbone, "
                      "split preprocess/apply programs, drain-1 fetch"}


def _write_ecp_res_dataset(path, n_images, img_hw=(1024, 1920)):
    """Synthetic ECP-resolution tfrecords (smooth images -> fast PNG encode)."""
    import io

    from PIL import Image

    from bayesian_yolov3_tpu.data import proto, tfrecord

    os.makedirs(path, exist_ok=True)
    h, w = img_hw
    base = (
        np.linspace(0, 160, w, dtype=np.float32)[None, :, None]
        + np.linspace(0, 60, h, dtype=np.float32)[:, None, None]
    ).astype(np.uint8).repeat(3, axis=2)
    fname = os.path.join(path, "bench-00000-of-00001.tfrecord")
    with tfrecord.TFRecordWriter(fname) as wr:
        for i in range(n_images):
            img = base.copy()
            img[100 + 7 * i : 400 + 7 * i, 200 + 11 * i : 350 + 11 * i] = [220, 60, 60]
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            wr.write(proto.encode_example({
                "image/encoded": [buf.getvalue()],
                "image/height": np.asarray([h], np.int64),
                "image/width": np.asarray([w], np.int64),
                "image/filename": [f"bench_{i:04d}.png".encode()],
                "image/object/bbox/ymin": np.asarray([0.1], np.float32),
                "image/object/bbox/xmin": np.asarray([0.1], np.float32),
                "image/object/bbox/ymax": np.asarray([0.4], np.float32),
                "image/object/bbox/xmax": np.asarray([0.2], np.float32),
                "image/object/class/label": np.asarray([1], np.int64),
            }))
    return os.path.join(path, "bench-*-of-00001.tfrecord")


def bench_runner_aleatoric(nb=11, n_images=22):
    """End-to-end through the production InferenceRunner (VERDICT #1):
    tfrecords -> batched forward -> fused decode -> batched Pallas NMS ->
    ECP JSON files, including the host loop and the async writer."""
    import shutil
    import tempfile

    import jax

    from bayesian_yolov3_tpu.config import Config, DataConfig
    from bayesian_yolov3_tpu.infer.runner import InferenceRunner
    from bayesian_yolov3_tpu.train import loop as train_loop

    tmp = tempfile.mkdtemp(prefix="bench_runner_")
    try:
        pattern = _write_ecp_res_dataset(os.path.join(tmp, "data"), n_images)
        cfg = Config(model="aleatoric", full_img_size=FULL, batch_size=nb,
                     darknet53_weights="", checkpoint_path=os.path.join(tmp, "ckpt"),
                     run_id="bench", data=DataConfig(file_pattern=pattern))
        # seed a checkpoint (random weights; the bench measures throughput)
        trainer_state = train_loop.init_state(
            train_loop.YoloV3.from_config(cfg), cfg, jax.random.PRNGKey(0),
            train_loop.optax.adam(cfg.lr))
        from bayesian_yolov3_tpu.train.checkpoints import CheckpointStore
        store = CheckpointStore(cfg.checkpoint_path, cfg.run_id, 1)
        store.save(1, jax.tree_util.tree_map(np.asarray, trainer_state), force=True)
        store.close()

        runner = InferenceRunner(cfg)
        cfg.out_path = os.path.join(tmp, "warm")
        runner.run()  # compile + warm
        cfg.out_path = os.path.join(tmp, "out")
        t0 = time.time()
        out_dir = runner.run()
        dt = time.time() - t0
        import glob as globlib
        n_json = len(globlib.glob(os.path.join(out_dir, "*.json")))
        assert n_json == n_images, (n_json, n_images)
        return {"img_per_sec": n_images / dt, "ms_per_img": dt * 1000 / n_images,
                "batch": nb, "ecp_json_files": n_json,
                "host_bound": True,  # ~200x below the device path on this
                # 1-core / ~34 MB/s-tunnel dev host — a floor of THIS host,
                # not a framework ceiling (BENCH_NOTES.md, VERDICT r4 #5)
                "note": "production InferenceRunner.run() incl. host pipeline"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_train_from_tfrecords(steps=8, n_images=16):
    """Training fed from real tfrecords through TrainLoader (VERDICT #3):
    host parse/decode (cpu_thread_cnt pool) + device step, steady state."""
    import shutil
    import tempfile

    import jax

    from bayesian_yolov3_tpu.config import Config, DataConfig
    from bayesian_yolov3_tpu.train import loop as train_loop
    from bayesian_yolov3_tpu.data import pipeline

    tmp = tempfile.mkdtemp(prefix="bench_traintf_")
    try:
        pattern = _write_ecp_res_dataset(os.path.join(tmp, "data"), n_images)
        cfg = Config(model="aleatoric", crop=True, full_img_size=FULL,
                     crop_img_size=(768, 1440, 3), batch_size=8,
                     max_boxes_per_img=60, darknet53_weights="",
                     train=DataConfig(file_pattern=pattern, shuffle_buffer_size=8,
                                      cache=True),
                     val=DataConfig(file_pattern=pattern, shuffle_buffer_size=2))
        from bayesian_yolov3_tpu.data import encode
        from bayesian_yolov3_tpu.models.yolov3 import YoloV3
        m = YoloV3.from_config(cfg)
        tables = encode.build_prior_tables(m.blueprint)
        step_fn, _, opt = train_loop.make_train_step(m, cfg, tables)
        state = train_loop.init_state(m, cfg, jax.random.PRNGKey(0), opt)
        loader = pipeline.TrainLoader(cfg, "train", seed=1)
        it = loader.batches()
        j = jax.jit(step_fn, donate_argnums=(0,))
        key = jax.random.key(0, impl="rbg")
        for _ in range(2):  # compile + warm the parsed-element cache
            state, metrics = j(state, jax.device_put(next(it)), key)
        float(metrics["total"])
        t0 = time.time()
        last = None
        # Trainer-style feed: next batch device_put'd while the current
        # step runs; metric fetch one step behind
        pending = jax.device_put(next(it))
        for _ in range(steps):
            state, metrics = j(state, pending, key)
            pending = jax.device_put(next(it))
            if last is not None:
                float(last["total"])
            last = metrics
        float(last["total"])
        dt = (time.time() - t0) / steps
        loader.close()
        return {"ms_per_step": dt * 1000, "img_per_sec": 8 / dt,
                "host_bound": True,  # PNG decode on a 1-core host; the
                # device step is 59.3 ms (train_step row) — this row
                # measures THIS host's loader floor, not the framework
                "note": f"fed from tfrecords (cpu_thread_cnt={cfg.cpu_thread_cnt} "
                        f"on a {os.cpu_count()}-core host)"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_nms_full_anchor():
    """Exact full-anchor Pallas NMS (VERDICT #6): all ~121k ECP anchors in
    VMEM, no pre-top-k, vs the 8192 pre-top-k default."""
    import jax
    import jax.numpy as jnp
    from bayesian_yolov3_tpu.ops import nms

    n = 120960
    rng = np.random.default_rng(0)
    decoded = np.zeros((n, 6), np.float32)
    yx = rng.uniform(0, 0.95, (n, 2))
    hw = rng.uniform(0.02, 0.1, (n, 2))
    decoded[:, :4] = np.concatenate([yx, yx + hw], axis=1)
    decoded[:, 4] = 1.0 / (1.0 + np.exp(-rng.normal(-4.0, 1.5, n)))
    d = jnp.asarray(decoded)
    out = {}
    for name, k in (("full_anchor_exact", 0), ("pre_top_k_8192", 8192)):
        fn = jax.jit(lambda x, k=k: nms.nms_select(
            x, obj_idx=4, max_out=1000, pre_top_k=k, use_pallas=True)[2])
        int(fn(d))
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            int(fn(d))
        out[name] = {"ms": (time.time() - t0) / iters * 1000}
    return out


ROWS = {
    "epistemic_T30_batch1": bench_epistemic,
    # the reference's own epistemic inference default is T=50
    # (inference_epistemic.py:221); T=30 is the BASELINE.json north-star
    # config — both stay on the record
    "epistemic_T50_batch1_packed": lambda: bench_epistemic(packed=True,
                                                           T=50),
    "epistemic_T30_batch1_packed": lambda: bench_epistemic(packed=True),
    "epistemic_T30_batch2": lambda: bench_epistemic(packed=True, nb=2),
    "epistemic_T30_int8": lambda: bench_epistemic(packed=True, quantize=True),
    # deterministic serving modes (Config.fixed_mc_masks): constant-key
    # mask tables -> same image, same uncertainties.  Measured
    # throughput-NEUTRAL vs keyed masks (the ~8.7 ms/img mask pass is the
    # per-element draw itself, not key plumbing — BENCH_NOTES.md round 3);
    # these rows keep the deterministic configs on the measured record.
    "epistemic_T30_fixed_masks": lambda: bench_epistemic(
        packed=True, fixed_masks=123),
    "epistemic_T30_int8_fixed": lambda: bench_epistemic(
        packed=True, quantize=True, fixed_masks=123),
    "aleatoric_batch11": lambda: bench_batched("aleatoric", 11),
    "standard_batch11": lambda: bench_batched("standard", 11),
    "standard_batch11_packed": lambda: bench_batched("standard", 11,
                                                     packed=True),
    "aleatoric_batch11_packed": lambda: bench_batched("aleatoric", 11,
                                                      packed=True),
    # batch headroom beyond the reference's pinned batch-11 config
    # (round 5: the decode kernel's nb-aware tiling unlocked nb > 22)
    "aleatoric_batch22_packed": lambda: bench_batched("aleatoric", 22,
                                                      packed=True),
    "aleatoric_batch44_packed": lambda: bench_batched("aleatoric", 44,
                                                      packed=True),
    # int8 PTQ of the batched heads (VERDICT r4 #1: point the measured
    # 1.57-1.86x head-section lever at the reference's batch-11 config)
    "aleatoric_batch11_int8": lambda: bench_batched("aleatoric", 11,
                                                    packed=True,
                                                    quantize=True),
    "standard_batch11_int8": lambda: bench_batched("standard", 11,
                                                   packed=True,
                                                   quantize=True),
    # int8 at the batch-44 headroom config: does the head-section win
    # reappear once dispatch overheads amortize? (BENCH_NOTES r5)
    "aleatoric_batch44_int8": lambda: bench_batched("aleatoric", 44,
                                                    packed=True,
                                                    quantize=True),
    "train_step": bench_train,
    "runner_aleatoric_batch11_e2e": bench_runner_aleatoric,
    "train_from_tfrecords": bench_train_from_tfrecords,
    "nms_full_anchor": bench_nms_full_anchor,
}


def main(only=()):
    """Run all rows, or only the named ones (argv) MERGED into the
    existing BENCH_DETAIL.json — partial re-measures after a targeted
    change don't clobber unaffected rows.

    int8 rows each get their OWN process when run alongside any other
    row: two resident int8 executables (+ quantized weight buffers)
    poison the second program's steady state 2.4x (BENCH_NOTES.md round
    4); the rule is enforced here, not just prose (ADVICE r4).  A
    single-row invocation (`bench_all.py <int8_row>`) runs in-process —
    that is exactly the isolated measurement.

    Subprocess rows run FIRST, before any in-process row initializes
    this process's JAX client: the axon TPU allows ONE process at a
    time (CLAUDE.md), so a child spawned after the parent holds the
    device lock would block forever.  Results always MERGE into the
    existing BENCH_DETAIL.json (never start from empty), and the file
    is updated after every row, so a crash or hang mid-run cannot lose
    previously committed rows.
    """
    import subprocess

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_DETAIL.json")
    selected = [n for n in ROWS if not only or n in only]
    results = {}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    isolate_int8 = len(selected) > 1
    sub_rows = [n for n in selected if "int8" in n and isolate_int8]
    for name in sub_rows:
        print(f"{name}: own process (int8 isolation, BENCH_NOTES r4; "
              "runs before this process touches the TPU)")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), name], check=True)
        with open(out) as f:
            results[name] = json.load(f)[name]
        print(name, json.dumps(results[name]))
    for name in selected:
        if name in sub_rows:
            continue
        results[name] = ROWS[name]()
        print(name, json.dumps(results[name]))
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    import sys

    unknown = set(sys.argv[1:]) - set(ROWS)
    assert not unknown, f"unknown rows {unknown}; have {list(ROWS)}"
    main(tuple(sys.argv[1:]))
