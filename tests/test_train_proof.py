"""train_proof orchestration: hard-kill + byte-identical resume, in CI.

Runs the real two-phase subprocess orchestration (scripts/train_proof.py)
at smoke size: phase 1 trains, checkpoints, and dies with os._exit(9);
phase 2 restores, verifies the sha256 state digest recorded at save time,
and continues to completion. Descent is not asserted at this step count
(orchestration is under test; the descent artifact lives in
benchmarks/records/)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_kill_resume_roundtrip(tmp_path):
    out = tmp_path / "proof.jsonl"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    # conftest's 8-virtual-device XLA_FLAGS is inherited: batch 8 shards
    # one sample per fsdp rank, so the proof also covers the SHARDED
    # state save -> hard kill -> restore round trip
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_proof.py"),
         "--model", "BitDance-S", "--batch", "8", "--steps", "6",
         "--kill-at", "4", "--ckpt-every", "2", "--warmup", "2",
         "--out", str(out), "--workdir", str(tmp_path / "wd"),
         "--no-require-descent"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "TRAIN_PROOF OK" in r.stdout

    events = [json.loads(ln) for ln in out.read_text().splitlines()
              if '"event"' in ln]
    resume = [e for e in events if e["event"] == "resume"]
    assert len(resume) == 1
    assert resume[0]["step"] == 4
    assert resume[0]["bit_identical"] is True
    steps = [json.loads(ln)["step"] for ln in out.read_text().splitlines()
             if '"loss"' in ln and '"event"' not in ln]
    # phase 1 logged 1..4, phase 2 logged 5..6 — no gaps, no repeats
    assert steps == [1, 2, 3, 4, 5, 6]
