"""The modelzoo CLI driver (tools/train_zoo.py) must run a featured
train end-to-end: EV options + micro-batch + checkpoint + resume.

Reference analog: ``modelzoo/WDL/train.py`` CLI flags
(``:375-412,525-526``).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_zoo.py"),
         *args], capture_output=True, text=True, timeout=540,
        cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line), r.stderr


def test_train_zoo_cli_features_and_resume(tmp_path):
    ckpt = str(tmp_path / "run")
    base = ["wdl", "--batch_size", "64", "--cpu", "--eval_steps", "0",
            "--log_steps", "100", "--checkpoint", ckpt,
            "--save_steps", "3", "--incremental_ckpt", "2",
            "--ev", "--filter_freq", "1", "--steps_to_live", "50",
            "--micro_batch", "2"]
    out, _ = _run(base + ["--steps", "4"])
    assert out["model"] == "wdl" and out["steps"] == 4
    assert out["final_loss"] == out["final_loss"]  # not NaN

    out2, err2 = _run(base + ["--steps", "6"])
    assert out2.get("resumed_from") == 4, (out2, err2[-500:])
