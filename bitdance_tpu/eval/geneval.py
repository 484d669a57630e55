"""GenEval generation harness (eval/eval_geneval.py:11-62).

Writes the geneval directory layout per prompt: NNNNN/metadata.jsonl +
samples/000i.png + grid.png. Reference eval config: cfg 13.0, 50 steps,
1024², long prompts (scripts/eval/eval_bitdance_14b_64x.sh:21-30).
"""

from __future__ import annotations

import json
import os

from bitdance_tpu.eval.base import BaseEvaluator, save_grid, save_images


class GenevalEvaluator(BaseEvaluator):
    def build_dataset(self, data_path: str):
        datasets = []
        with open(data_path) as f:
            for i, line in enumerate(f):
                rec = json.loads(line)
                datasets.append({"id": i, "prompt": rec["prompt"],
                                 "metadata": line})
        self.datasets = self.shard(datasets)

    def eval(self, data_path: str, save_dir: str, guidance_scale: float = 13.0,
             num_sampling_steps: int = 50, image_size=(1024, 1024)):
        os.makedirs(save_dir, exist_ok=True)
        self.build_dataset(data_path)
        for data in self.datasets:
            save_path = os.path.join(save_dir, f"{data['id']:05d}")
            os.makedirs(os.path.join(save_path, "samples"), exist_ok=True)
            with open(os.path.join(save_path, "metadata.jsonl"), "w") as f:
                f.write(data["metadata"])
            images = self.model.generate(
                data["prompt"],
                height=image_size[0], width=image_size[1],
                num_sampling_steps=num_sampling_steps,
                guidance_scale=guidance_scale,
                num_images=4,
                seed=self.seed,
            )
            save_images(images, [
                os.path.join(save_path, f"samples/{i:04d}.png")
                for i in range(images.shape[0])])
            save_grid(images, os.path.join(save_path, "grid.png"), nrow=2)
        self.logger.info(f"rank {self.rank}: wrote {len(self.datasets)} dirs")


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--data_path", type=str,
                   default="eval_assets/geneval/evaluation_metadata.jsonl",
                   help="scripts/fetch_eval_assets.py fetches the real set; "
                        "eval_assets/geneval_stub_metadata.jsonl is the CI stub")
    p.add_argument("--save_dir", type=str, default="results/geneval")
    p.add_argument("--guidance_scale", type=float, default=13.0)
    p.add_argument("--num_sampling_steps", type=int, default=50)
    p.add_argument("--image_size", type=int, nargs=2, default=[1024, 1024])
    args = p.parse_args()
    GenevalEvaluator(args.model_path).eval(
        args.data_path, args.save_dir, args.guidance_scale,
        args.num_sampling_steps, tuple(args.image_size))


if __name__ == "__main__":
    main()
