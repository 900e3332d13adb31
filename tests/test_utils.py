"""Profiling/observability utility tests."""

import json
import time

from cmgan_tpu.utils import MetricsLogger, StepTimer


def test_step_timer():
    t = StepTimer(window=4)
    t.tick()
    for _ in range(3):
        time.sleep(0.01)
        t.tick()
    assert 0.005 < t.mean_step_seconds < 0.2
    assert t.steps_per_second() > 5


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path)
    logger.log(1, loss=0.5, note="a")
    logger.log(2, loss=0.25)
    logger.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[0]["note"] == "a"
    assert lines[1]["step"] == 2
