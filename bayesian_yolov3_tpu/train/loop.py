"""Training driver: device-fused preprocessing, pjit-sharded Adam steps,
NaN guard, checkpoint/resume, train/val metric streams.

Behavior parity with lib_yolo/train.py:

* Adam(lr) over trainable variables only; the frozen Darknet-53 backbone
  receives no gradients and its BN runs on moving stats
  (train.py:84-88, yolov3.py:240-243).  Freezing is structural here: the
  loss is differentiated w.r.t. the trainable partition only, so XLA never
  even builds the backbone backward pass.
* abort on NaN/Inf total loss (train.py:56-60).
* train losses logged every 25 steps; a val batch evaluated every 100
  steps on the same weights (train.py:62-77); checkpoint every
  ``checkpoint_interval`` and at exit, best-effort on errors/interrupt
  (train.py:79-80,114-135); resume from 'last' or explicit step
  (train.py:97-102); fresh start loads darknet53.conv.74 AFTER init
  (train.py:104-108).

TPU-native differences: crop/augment/GT-encode run inside the jitted step
(one fused device program per step instead of a host tf.data graph), and
the step is sharded over a ``data`` mesh axis — the reference is
single-GPU only.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data import augment as aug
from ..data import encode
from ..data import pipeline
from ..models.yolov3 import YoloV3
from ..ops import decode, loss as loss_ops
from ..parallel import mesh as mesh_lib
from ..utils.profiling import StepTimer
from .checkpoints import CheckpointStore

log = logging.getLogger("byolo.train")


def partition_params(params: Dict, freeze_backbone: bool) -> Tuple[Dict, Dict]:
    if freeze_backbone:
        trainable = {k: v for k, v in params.items() if k != "backbone"}
        frozen = {"backbone": params["backbone"]}
    else:
        trainable, frozen = dict(params), {}
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    return {**frozen, **trainable}


def make_preprocess(config: Config, tables: encode.PriorTables, split: str):
    """Device-side per-batch preprocessing: [0,1) scale -> crop -> augment
    (train only) -> GT encode.  Returns (imgs, [gt1, gt2, gt3])."""
    cropper = (
        aug.ImageCropper(tuple(config.full_img_size), tuple(config.crop_img_size))
        if config.crop
        else None
    )
    augment_on = split == "train"

    def per_example(img, bbox, label, valid, key):
        kc, ka = jax.random.split(key)
        img = img.astype(jnp.float32) / 255.0  # convert_image_dtype parity
        if cropper is not None:
            # both train and val use the random crop fn (train.py:26-29)
            img, bbox, valid = cropper.random_crop_and_sometimes_rescale(
                img, bbox, valid, kc
            )
        if augment_on:
            img, bbox, label = aug.augment(img, bbox, label, ka)
        gts = encode.encode_boxes(bbox, label, valid, tables, config.ign_thresh)
        return img, gts

    def preprocess(batch, key):
        b = batch["image"].shape[0]
        keys = jax.random.split(key, b)
        imgs, gts = jax.vmap(per_example)(
            batch["image"], batch["bbox"], batch["label"], batch["valid"], keys
        )
        return imgs, gts

    return preprocess


def make_train_step(
    model: YoloV3, config: Config, tables: encode.PriorTables
) -> Tuple[Callable, Callable, optax.GradientTransformation]:
    """Build (train_step, eval_step, optimizer)."""
    optimizer = optax.adam(config.lr)  # TF AdamOptimizer defaults (train.py:87)
    preprocess_train = make_preprocess(config, tables, "train")
    preprocess_val = make_preprocess(config, tables, "val")
    aleatoric = bool(config.aleatoric_loss) and model.spec.aleatoric_head

    def loss_fn(trainable, frozen, stats, imgs, gts, rng):
        params = merge_params(trainable, frozen)
        raws, new_stats = model.forward(
            params, stats, imgs, training=True, rng=rng
        )
        dets = [decode.split_detection(raw, model.spec) for raw in raws]
        total, metrics = loss_ops.total_loss(dets, gts, params, aleatoric)
        return total, (metrics, new_stats)

    def _apply(state, imgs, gts, kd):
        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state["params"], state["frozen"], state["stats"], imgs, gts, kd
        )
        updates, opt = optimizer.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {
            "params": params,
            "frozen": state["frozen"],
            "stats": new_stats,
            "opt": opt,
            "step": state["step"] + 1,
        }, metrics

    def train_step(state, batch, rng):
        kp, kd = jax.random.split(jax.random.fold_in(rng, state["step"]))
        imgs, gts = preprocess_train(batch, kp)
        return _apply(state, imgs, gts, kd)

    # -- split-program twins (round-4: overlap preprocess with compute) --
    # The fused train_step serializes ~1/3 of the step into preprocess
    # (BENCH_NOTES round-3 attribution: 31.6 preprocess / 31.8 fwd+loss /
    # 11.8 bwd).  preprocess(batch i+1) is independent of step i, so the
    # Trainer dispatches it as its OWN program right after dispatching
    # step i: the host's batch transfer + dispatch overlap the in-flight
    # step, and the queued programs run back to back on device.  Key
    # derivation is IDENTICAL to the fused step (same fold_in(rng, step)
    # split), so GT tensors and metrics are unchanged — asserted by
    # tests/test_train.py::test_split_train_step_matches_fused.

    def preprocess_step(batch, rng, step):
        """The fused step's preprocess half, as its own program.

        ``step`` must equal the ``state['step']`` of the train step that
        will consume the output (the host loop knows it without a device
        fetch)."""
        kp, _ = jax.random.split(jax.random.fold_in(rng, step))
        return preprocess_train(batch, kp)

    def apply_step(state, imgs, gts, rng):
        """The fused step's gradient half: consumes preprocess_step output."""
        _, kd = jax.random.split(jax.random.fold_in(rng, state["step"]))
        return _apply(state, imgs, gts, kd)

    train_step.preprocess = preprocess_step
    train_step.apply = apply_step

    def eval_step(state, batch, rng):
        kp, kd = jax.random.split(jax.random.fold_in(rng, state["step"]))
        imgs, gts = preprocess_val(batch, kp)
        _, (metrics, _) = loss_fn(
            state["params"], state["frozen"], state["stats"], imgs, gts, kd
        )
        return metrics

    return train_step, eval_step, optimizer


def init_state(model: YoloV3, config: Config, rng, optimizer) -> Dict[str, Any]:
    params, stats = model.init(rng)
    if config.darknet53_weights and os.path.exists(config.darknet53_weights):
        # init order parity: global init THEN darknet assign (train.py:104-108)
        params, stats = model.load_darknet53_weights(
            config.darknet53_weights, params, stats
        )
        log.info("loaded darknet53 weights from %s", config.darknet53_weights)
    trainable, frozen = partition_params(params, config.freeze_darknet53)
    return {
        "params": trainable,
        "frozen": frozen,
        "stats": stats,
        "opt": optimizer.init(trainable),
        "step": jnp.zeros((), jnp.int32),
    }


class Trainer:
    """End-to-end training driver (parity train.start/train, :25-135)."""

    def __init__(self, config: Config, seed: int = 0):
        self.config = config
        # multi-host bring-up first — device queries below must see the
        # global (all-hosts) device set (SURVEY §5.8)
        mesh_lib.maybe_initialize_from_config(config)
        self._is_main = jax.process_index() == 0
        self.model = YoloV3.from_config(config)
        self.tables = encode.build_prior_tables(self.model.blueprint)
        self.train_step_fn, self.eval_step_fn, self.optimizer = make_train_step(
            self.model, config, self.tables
        )
        self.rng = jax.random.PRNGKey(seed)
        self.store = CheckpointStore(
            config.checkpoint_path, config.run_id, config.ckp_max_to_keep
        )
        self.metrics_path = os.path.join(self.store.dir, "metrics.jsonl")
        self.mesh = None
        ndev = len(jax.devices())
        if config.mesh_shape.get("data", 0) > 1:
            self.mesh = mesh_lib.make_mesh({"data": config.mesh_shape["data"]})
        elif not config.mesh_shape and ndev > 1 and config.batch_size % ndev == 0:
            self.mesh = mesh_lib.make_mesh({"data": ndev})
        self._jit_train = jax.jit(self.train_step_fn, donate_argnums=(0,))
        self._jit_eval = jax.jit(self.eval_step_fn)
        # split-program hot loop: preprocess(batch i+1) is dispatched while
        # step i executes (see make_train_step.preprocess)
        self._jit_pre = jax.jit(self.train_step_fn.preprocess)
        # donate state only: imgs/gts shapes never alias the outputs, so
        # donating them just triggers the unusable-donation warning
        self._jit_apply = jax.jit(self.train_step_fn.apply,
                                  donate_argnums=(0,))

    # -- state ----------------------------------------------------------

    def fresh_state(self):
        state = init_state(self.model, self.config, self.rng, self.optimizer)
        if self.mesh is not None:
            # every host computes the same init (shared seed), so replication
            # is safe multi-host (mesh_lib.replicate assembles global arrays)
            state = mesh_lib.replicate(self.mesh, state)
        return state

    def _place_batch(self, batch):
        """Start the (asynchronous) host->device placement of a batch.

        ``jax.device_put`` returns immediately; issuing it one step ahead of
        the dispatch that consumes it (see the prefetch in ``run``) overlaps
        the batch transfer with the in-flight training step — full-frame
        uint8 batches are tens of MB, which a synchronous transfer would
        serialize into every step.
        """
        batch = {k: v for k, v in batch.items() if k != "filename"}
        if self.mesh is not None:
            return mesh_lib.shard_batch(self.mesh, batch)
        return jax.device_put(batch)

    # -- loop -----------------------------------------------------------

    def run(self) -> Dict[str, Any]:
        cfg = self.config
        if self._is_main:
            self.store.save_config_snapshot(cfg)
        state = self.fresh_state()
        step = 0
        if cfg.resume_training:
            state, step = self.store.restore(
                jax.tree.map(np.asarray, state), step=cfg.resume_checkpoint
            )
            log.info("resumed from step %d", step)

        # each host loads its own shard stripe and local batch slice
        pi, pc = jax.process_index(), jax.process_count()
        train_loader = pipeline.TrainLoader(cfg, "train", seed=1,
                                            host_index=pi, host_count=pc)
        val_loader = pipeline.TrainLoader(cfg, "val", seed=2,
                                          host_index=pi, host_count=pc)
        train_it = train_loader.batches()
        val_it = val_loader.batches()
        # metrics/TensorBoard files are written by process 0 only (every
        # process still computes the metrics: the NaN guard must fire
        # identically everywhere)
        mfile = open(self.metrics_path if self._is_main else os.devnull, "a")
        self._tb_writers = self._make_tb_writers() if self._is_main else None

        def save(step_):
            self.store.save(step_, jax.tree.map(np.asarray, state), force=True)
            log.info("checkpoint saved at step %d", step_)

        key = jax.random.fold_in(self.rng, 7)
        timer = StepTimer(window=100)
        # Metric fetch runs one step behind dispatch: each device->host
        # transfer costs ~27 ms through the tunnel (BENCH_NOTES.md), which a
        # per-step synchronous fetch would serialize into the hot loop (~20%
        # of the step).  The NaN guard (parity train.py:56-60) therefore
        # checks step i-1 while step i is in flight — it still aborts, one
        # dispatched step later.
        import collections

        inflight: "collections.deque" = collections.deque()
        t0 = time.time()

        def drain_one() -> bool:
            """Fetch the oldest in-flight metrics; True => non-finite loss."""
            nonlocal t0
            s, m = inflight.popleft()
            tloss = float(m["total"])
            if np.isnan(tloss) or np.isinf(tloss):
                log.error(
                    "step %d: non-finite total loss %r — aborting "
                    "(detected with one step in flight)", s, tloss,
                )
                return True
            if s % 25 == 0:
                self._log_metrics(mfile, "train", s, m, t0)
                t0 = time.time()
            return False

        try:
            # one batch prefetched to device AND preprocessed ahead of its
            # step (the loader repeats forever, so the extra pull past
            # train_steps is fine).  The preprocess program for step i+1 is
            # dispatched immediately after step i: its transfer + dispatch
            # overlap the in-flight step and the two queued programs run
            # back to back on device — the fused step serialized them.
            pending = self._jit_pre(self._place_batch(next(train_it)), key,
                                    np.int32(step))
            while step < cfg.train_steps:
                step += 1
                timer.tick()
                state, metrics = self._jit_apply(state, *pending, key)
                pending = self._jit_pre(self._place_batch(next(train_it)),
                                        key, np.int32(step))
                inflight.append((step, metrics))
                if len(inflight) >= 2 and drain_one():
                    break
                if step % 100 == 0:
                    vmetrics = self._jit_eval(state, self._place_batch(next(val_it)), key)
                    self._log_metrics(mfile, "val", step, vmetrics, None)
                if step % cfg.checkpoint_interval == 0:
                    save(step)
                    timer.write(os.path.join(self.store.dir, "step_timing.jsonl"))
            while inflight:
                if drain_one():
                    break
        except KeyboardInterrupt:
            log.warning("interrupted at step %d — saving checkpoint", step)
            save(step)
            raise
        except Exception:
            log.exception("training error at step %d — best-effort save", step)
            save(step)
            raise
        finally:
            mfile.close()
            train_loader.close()
            val_loader.close()
        save(step)
        return {"state": state, "step": step}

    def _make_tb_writers(self):
        """TensorBoard train/val writers (parity train.py:111-113), via
        tensorboardX when available; silently disabled otherwise."""
        try:
            from tensorboardX import SummaryWriter
        except ImportError:
            return None
        base = os.path.join(self.config.tensorboard_path, self.config.run_id)
        return {
            "train": SummaryWriter(os.path.join(base, "train")),
            "val": SummaryWriter(os.path.join(base, "val")),
        }

    def _log_metrics(self, mfile, split, step, metrics, t0):
        m = {k: float(v) for k, v in metrics.items()}
        line = {"split": split, "step": step, **m}
        if t0 is not None:
            line["sec_per_step"] = (time.time() - t0) / 25.0
        mfile.write(json.dumps(line) + "\n")
        mfile.flush()
        if getattr(self, "_tb_writers", None):
            w = self._tb_writers[split]
            for k, v in m.items():
                w.add_scalar(f"loss/{k}", v, step)
            if "sec_per_step" in line:
                w.add_scalar("perf/sec_per_step", line["sec_per_step"], step)
        log.info(
            "%5d %s >>> total: %8.2f det: %8.2f loc: %8.2f obj: %8.2f cls: %8.2f reg: %8.5f",
            step, split, m["total"], m["detection"], m["loc"], m["obj"], m["cls"],
            m["l2_weight_reg"],
        )
