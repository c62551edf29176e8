"""utils subsystem tests: logging (reference parity) + profiling.

The refuse-to-overwrite log contract (lib_yolo/utils.py:164-166) was
claimed in PARITY.md §2.8 but only ever exercised manually; these pin
it, plus the StepTimer rolling stats the Trainer's hot loop writes.
"""

import json
import logging
import os

import pytest

from bayesian_yolov3_tpu.config import Config
from bayesian_yolov3_tpu.utils.logging_utils import add_file_logging
from bayesian_yolov3_tpu.utils.profiling import StepTimer


def _drop_handler(path):
    root = logging.getLogger("")
    for h in list(root.handlers):
        if isinstance(h, logging.FileHandler) and h.baseFilename == os.path.abspath(path):
            root.removeHandler(h)
            h.close()


def test_add_file_logging_refuses_overwrite(tmp_path):
    cfg = Config(model="standard", full_img_size=(64, 96, 3),
                 darknet53_weights="", log_path=str(tmp_path / "logs"),
                 run_id="runA")
    path = add_file_logging(cfg)
    try:
        log = logging.getLogger("byolo.test")
        log.setLevel(logging.INFO)
        log.info("hello log")
        for h in logging.getLogger("").handlers:
            h.flush()
        assert os.path.exists(path)
        with open(path) as f:
            assert "hello log" in f.read()
        # parity utils.py:164-166: an existing per-run log refuses to be
        # clobbered unless explicitly overridden
        with pytest.raises(RuntimeError, match="already exists"):
            add_file_logging(cfg)
        # override re-opens (mode "w") the same per-run path
        path2 = add_file_logging(cfg, override_existing=True)
        assert path2 == path
        _drop_handler(path)
    finally:
        _drop_handler(path)


def test_step_timer_rolling_stats(tmp_path):
    t = StepTimer(window=4)
    assert t.stats() == {"steps": 0}
    assert t.tick() is None  # first tick only arms the timer
    for _ in range(6):
        dt = t.tick()
        assert dt is not None and dt >= 0
    s = t.stats()
    assert s["steps"] == 6  # total steps keeps counting...
    assert len(t.samples) == 4  # ...while the window stays bounded
    assert s["p50_s"] <= s["max_s"]
    assert s["steps_per_sec"] > 0
    out = tmp_path / "steps.jsonl"
    t.write(str(out))
    t.write(str(out))  # appends
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["steps"] == 6 and "ts" in rec
