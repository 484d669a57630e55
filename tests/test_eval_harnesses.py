"""DPG / GenEval harnesses end-to-end with a stub pipeline + stub assets.

Verifies the full IO contract the external scorers expect:
DPG: one 2x2 grid png per prompt id (eval/eval_dpg.py:30-45);
GenEval: NNNNN/metadata.jsonl + samples/000i.png + grid.png
(eval/eval_geneval.py:30-57).
"""

import json
import os

import numpy as np

from bitdance_tpu.eval.dpg import DPGEvaluator
from bitdance_tpu.eval.geneval import GenevalEvaluator

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval_assets")


class StubPipeline:
    def __init__(self):
        self.calls = []

    def generate(self, prompt, height, width, num_sampling_steps,
                 guidance_scale, num_images, seed):
        self.calls.append((prompt, guidance_scale, num_sampling_steps, seed))
        rng = np.random.default_rng(seed)
        return rng.integers(0, 255, (num_images, height, width, 3),
                            dtype=np.uint8)


def test_dpg_harness_layout(tmp_path):
    pipe = StubPipeline()
    ev = DPGEvaluator("unused", pipeline=pipe)
    out = str(tmp_path / "dpg")
    ev.eval(os.path.join(ASSETS, "dpg_stub_prompts.json"), out,
            guidance_scale=7.5, num_sampling_steps=4, image_size=(16, 16))

    prompts = json.load(open(os.path.join(ASSETS, "dpg_stub_prompts.json")))
    for pid in prompts:
        path = os.path.join(out, f"{pid}.png")
        assert os.path.exists(path), path
        from PIL import Image

        img = Image.open(path)
        assert img.size == (32, 32)            # 2x2 grid of 16x16
    assert all(c[1] == 7.5 for c in pipe.calls)
    assert len(pipe.calls) == len(prompts)


def test_geneval_harness_layout(tmp_path):
    pipe = StubPipeline()
    ev = GenevalEvaluator("unused", pipeline=pipe)
    out = str(tmp_path / "geneval")
    data = os.path.join(ASSETS, "geneval_stub_metadata.jsonl")
    ev.eval(data, out, guidance_scale=13.0, num_sampling_steps=4,
            image_size=(16, 16))

    n = sum(1 for _ in open(data))
    for i in range(n):
        d = os.path.join(out, f"{i:05d}")
        meta = os.path.join(d, "metadata.jsonl")
        assert os.path.exists(meta)
        rec = json.loads(open(meta).read())
        assert "prompt" in rec and "tag" in rec
        for j in range(4):
            assert os.path.exists(os.path.join(d, "samples", f"{j:04d}.png"))
        assert os.path.exists(os.path.join(d, "grid.png"))


def test_vendored_real_prompt_sets():
    """The REAL benchmark prompt sets are checked in (public data: DPG-Bench
    from ELLA — 1065 prompts; GenEval evaluation metadata — 553 lines; the
    same assets the reference vendors under eval/) and match the default /
    eval-script paths."""
    dpg = os.path.join(ASSETS, "dpg", "prompts.json")
    assert os.path.exists(dpg), "run scripts/fetch_eval_assets.py"
    prompts = json.load(open(dpg))
    assert len(prompts) == 1065

    for name in ("evaluation_metadata.jsonl", "evaluation_metadata_long.jsonl"):
        p = os.path.join(ASSETS, "geneval", name)
        assert os.path.exists(p), p
        lines = [json.loads(x) for x in open(p)]
        assert len(lines) == 553
        assert all("prompt" in r and "tag" in r for r in lines)

    # scripts/eval/*.sh point at these exact paths
    sh = os.path.join(os.path.dirname(ASSETS), "scripts", "eval",
                      "eval_bitdance_14b_64x.sh")
    text = open(sh).read()
    assert "eval_assets/dpg/prompts.json" in text
    assert "eval_assets/geneval/evaluation_metadata_long.jsonl" in text


def test_dpg_harness_on_real_prompts(tmp_path):
    """The DPG harness consumes the real 1065-prompt set (subset for CI
    speed via max_prompts)."""
    pipe = StubPipeline()
    ev = DPGEvaluator("unused", pipeline=pipe)
    out = str(tmp_path / "dpg_real")
    ev.eval(os.path.join(ASSETS, "dpg", "prompts.json"), out,
            guidance_scale=7.5, num_sampling_steps=2, image_size=(16, 16),
            max_prompts=3)
    assert len(pipe.calls) == 3
