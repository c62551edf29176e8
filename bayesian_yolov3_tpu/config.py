"""Typed configuration with the reference's config-dict key surface.

The reference configures every entry script through a hand-edited Python
dict (README.md:28,43; pretraining.py:9-45).  We keep the same keys as
dataclass fields so a reference user can carry their config over 1:1, and
add the TPU-specific knobs (mesh shape, compute dtype) the reference has no
counterpart for.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple

from .core.blueprint import ModelBlueprint, Variant, VariantSpec
from .core.priors import PRIOR_SETS, PriorSet, scale_priors_for_crop


@dataclasses.dataclass
class DataConfig:
    """One dataset split (reference config['train'|'val'|'data'])."""

    file_pattern: str = ""
    # writer-only: shard count for the CityPersons tfrecord creator
    # (data/citypersons.py); readers glob file_pattern and ignore this
    num_shards: int = 1
    shuffle_buffer_size: int = 64
    cache: bool = False


@dataclasses.dataclass
class Config:
    # --- model -----------------------------------------------------------
    model: str = "bayesian"  # standard | aleatoric | bayesian
    cls_cnt: int = 2
    priors: Any = "ecp"  # name in PRIOR_SETS or a PriorSet dict
    full_img_size: Tuple[int, int, int] = (1024, 1920, 3)
    crop: bool = False
    crop_img_size: Tuple[int, int, int] = (768, 1440, 3)
    freeze_darknet53: bool = True
    aleatoric_loss: bool = False
    inference_mode: bool = False
    T: int = 20  # MC-dropout sample count (reference config['T'])
    standard_test_dropout: bool = False
    implicit_background_class: bool = True

    # --- training --------------------------------------------------------
    training: bool = True  # False -> qualitative eval (reference pretraining.py:54-60)
    run_id: str = "run"
    train_steps: int = 500000
    batch_size: int = 8
    lr: float = 1e-5
    ign_thresh: float = 0.7
    checkpoint_interval: int = 5000
    ckp_max_to_keep: int = 1
    resume_training: bool = False
    resume_checkpoint: str = "last"
    darknet53_weights: str = "./darknet53.conv.74"
    checkpoint_path: str = "./checkpoints"
    tensorboard_path: str = "./tensorboard"
    log_path: str = "./log"

    # --- data ------------------------------------------------------------
    train: DataConfig = dataclasses.field(default_factory=DataConfig)
    val: DataConfig = dataclasses.field(default_factory=DataConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    cpu_thread_cnt: int = 4

    # --- inference -------------------------------------------------------
    thresh: float = 0.1
    step: Any = "last"
    out_path: str = "./inference"
    nms_max_boxes: int = 1000  # reference: tf.image.non_max_suppression(..., 1000)
    nms_iou_thresh: float = 0.5  # TF default iou_threshold
    # Pre-NMS candidate cap.  The restriction is OPTIMISTIC, not lossy:
    # every NMS call emits a per-image exactness certificate (ops/nms.py —
    # selection filled AND min selected score >= max excluded score, sound
    # incl. ties) and the inference runner re-runs uncertified batches
    # through an exact pre_top_k=0 program (lazily compiled).  Trained
    # models certify essentially always; diffuse surfaces (random weights)
    # measurably don't (984/1000 selections) and get the exact re-run.
    # 0 = always-exact full-anchor NMS (~2.5 ms/img dearer at ECP res).
    nms_pre_top_k: int = 8192

    # --- TPU-native knobs (no reference counterpart) ----------------------
    compute_dtype: str = "bfloat16"  # conv/matmul compute dtype on TPU
    use_pallas: bool = True  # fused Pallas decode kernels (TPU backend only)
    # host loader emits s2d channels-first u8 planes instead of NHWC
    # images (data.pipeline.pack_planes_host): skips the measured
    # XLA-irreducible ~4 ms/img on-device input relayout and cuts
    # host->device transfer ~2.7x.  Inference runner only; requires the
    # fused-kernel path (use_pallas, TPU, no sp/mc mesh).
    packed_host_input: bool = False
    # deterministic epistemic inference: reuse the SAME T dropout-mask sets
    # (derived from this int seed) for every image — MC integration with T
    # fixed posterior samples; same per-image statistics distribution,
    # reproducible outputs (same image -> same uncertainties).  None = the
    # reference behavior (fresh masks per image).  Applies to the fused
    # single-device epistemic path (models.yolov3.mc_forward_cf); measured
    # throughput-neutral (BENCH_NOTES.md).
    fixed_mc_masks: Any = None
    # int8 post-training quantization of the detection-head section
    # (ops.quant): the MXU runs int8 at ~2x bf16.  Covers the T-sample
    # epistemic section (measured 1.6x section win, BENCH_NOTES.md round
    # 4) AND the batched standard/aleatoric heads (round 5).  "int8" or
    # None.  Requires calibration: InferenceRunner.run() calibrates on
    # the first quant_calib_images images of the dataset automatically;
    # predict() users call InferenceRunner.calibrate_int8() first.
    quantize: Optional[str] = None
    quant_calib_images: int = 2
    # activation-calibration reduction: None = max-abs (default), or a
    # percentile of |activation| (e.g. 99.9) — outliers beyond it saturate
    # at +-127 while the bulk gets a finer grid (ablation in
    # tests/test_quant.py)
    quant_calib_percentile: Optional[float] = None
    mesh_shape: Dict[str, int] = dataclasses.field(default_factory=dict)
    max_boxes_per_img: int = 60  # static GT padding for the vectorized encoder
    # multi-host (DCN) bring-up (SURVEY §5.8): set coordinator_address to
    # "host:port" on every process to span hosts; meshes then cover all
    # hosts' devices and each host's input pipeline reads its own shard
    # subset (data/tfrecord.list_shards striping)
    coordinator_address: str = ""
    num_processes: int = 1
    process_id: int = 0

    # ----------------------------------------------------------------------
    @property
    def variant(self) -> Variant:
        return Variant(self.model)

    @property
    def variant_spec(self) -> VariantSpec:
        return VariantSpec(variant=self.variant, cls_cnt=self.cls_cnt)

    @property
    def img_size(self) -> Tuple[int, int, int]:
        """Active input size (crop-aware), reference model.py:6-17."""
        return tuple(self.crop_img_size) if self.crop else tuple(self.full_img_size)

    def resolved_priors(self) -> PriorSet:
        priors = PRIOR_SETS[self.priors] if isinstance(self.priors, str) else self.priors
        if self.crop:
            priors = scale_priors_for_crop(priors, self.full_img_size, self.crop_img_size)
        return priors

    def blueprint(self) -> ModelBlueprint:
        return ModelBlueprint.build(self.img_size, self.resolved_priors(), self.cls_cnt)

    # config snapshots, parity with train.save_config (train.py:12-22)
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=4, default=str)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        d = dict(d)
        for k in ("train", "val", "data"):
            if k in d and isinstance(d[k], dict):
                d[k] = DataConfig(**{f: v for f, v in d[k].items()
                                     if f in {x.name for x in dataclasses.fields(DataConfig)}})
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
