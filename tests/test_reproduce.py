"""CI smoke of the one-command best-recipe reproduction (VERDICT r4
item 6): `SMOKE=1 tools/reproduce.sh` drives the EXACT pipeline of the
headline quality run — corpus build, bf16 training with normalized time
loss + device PESQ labels + EMA, held-out eval, EMA export — at tiny
scale (reduced model, CPU, 1 epoch). Asserts the command completes and
produces the eval curve and the exported inference checkpoint."""

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reproduce_smoke(tmp_path):
    out = tmp_path / "repro"
    env = dict(os.environ, SMOKE="1", OUT=str(out))
    # the conftest's CPU/virtual-device env is inherited; reproduce.sh
    # additionally passes --platform cpu --tiny_model itself
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "reproduce.sh")],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    eval_rows = [
        json.loads(ln)
        for ln in (out / "eval.jsonl").read_text().splitlines()
        if ln.strip()
    ]
    assert len(eval_rows) >= 2  # init + final
    final = eval_rows[-1]
    assert final["agg"]["enh"]["pesq"] > 0
    assert final.get("agg_ema"), "EMA eval missing — recipe drifted"
    # exported inference checkpoint restores as Enhancer input
    assert (out / "generator_ema").is_dir()
    from cmgan_tpu.checkpoint import restore_variables

    tree = restore_variables(str(out / "generator_ema"))
    assert "params" in tree and "batch_stats" in tree
