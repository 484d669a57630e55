"""DPG-Bench image generation harness (eval/eval_dpg.py:11-52).

Generates 4 images/prompt saved as a 2x2 grid per prompt id; prompts
sharded across hosts. Reference eval config: cfg 7.5, 50 steps, 1024²
(scripts/eval/eval_bitdance_14b_64x.sh:10-16). Scoring uses the external
ELLA DPG scorer on the output directory (README.md:175).
"""

from __future__ import annotations

import json
import os

from bitdance_tpu.eval.base import BaseEvaluator, save_grid


class DPGEvaluator(BaseEvaluator):
    def build_dataset(self, data_path: str):
        lines = json.load(open(data_path))
        datasets = [{"id": pid, "prompt": prompt}
                    for pid, prompt in lines.items()]
        self.datasets = self.shard(datasets)

    def eval(self, data_path: str, save_dir: str, guidance_scale: float = 7.5,
             num_sampling_steps: int = 50, image_size=(1024, 1024),
             max_prompts: int = 0):
        os.makedirs(save_dir, exist_ok=True)
        self.build_dataset(data_path)
        if max_prompts:
            self.datasets = self.datasets[:max_prompts]
        for data in self.datasets:
            images = self.model.generate(
                data["prompt"],
                height=image_size[0], width=image_size[1],
                num_sampling_steps=num_sampling_steps,
                guidance_scale=guidance_scale,
                num_images=4,
                seed=self.seed,
            )
            save_grid(images, os.path.join(save_dir, f"{data['id']}.png"),
                      nrow=2)
        self.logger.info(f"rank {self.rank}: wrote {len(self.datasets)} grids")


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--data_path", type=str,
               default="eval_assets/dpg/prompts.json",
               help="scripts/fetch_eval_assets.py fetches the real set; "
                    "eval_assets/dpg_stub_prompts.json is the CI stub")
    p.add_argument("--save_dir", type=str, default="results/dpg")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--num_sampling_steps", type=int, default=50)
    p.add_argument("--image_size", type=int, nargs=2, default=[1024, 1024])
    args = p.parse_args()
    DPGEvaluator(args.model_path).eval(
        args.data_path, args.save_dir, args.guidance_scale,
        args.num_sampling_steps, tuple(args.image_size))


if __name__ == "__main__":
    main()
