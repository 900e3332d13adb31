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


def test_compile_cache_helpers(tmp_path, monkeypatch):
    from cmgan_tpu.utils import cache as c

    # env override wins
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
    assert c.compile_cache_dir() == str(tmp_path / "env")
    # default is the durable repo-local dir (this checkout is writable)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
    assert c.compile_cache_dir().endswith("/.jax_cache")

    # seeding copies only the missing entries and never overwrites
    seed = tmp_path / "seed"
    live = tmp_path / "live"
    seed.mkdir(), live.mkdir()
    (seed / "a-cache").write_bytes(b"seeded-a")
    (seed / "b-cache").write_bytes(b"seeded-b")
    (live / "b-cache").write_bytes(b"live-b")
    n = c.seed_cache(str(live), seed_dir=str(seed))
    assert n == 1
    assert (live / "a-cache").read_bytes() == b"seeded-a"
    assert (live / "b-cache").read_bytes() == b"live-b"
    # opt-out env var disables it
    monkeypatch.setenv("CMGAN_NO_CACHE_SEED", "1")
    assert c.seed_cache(str(live), seed_dir=str(seed)) == 0
    # a missing seed dir is a no-op
    monkeypatch.delenv("CMGAN_NO_CACHE_SEED")
    assert c.seed_cache(str(live), seed_dir=str(tmp_path / "nope")) == 0
