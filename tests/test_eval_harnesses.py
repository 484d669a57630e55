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
