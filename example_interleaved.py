"""Quickstart: any-to-any interleaved generation.

Equivalent of the reference's MLLModel.forward_inference entry point
(/root/reference/modeling/mllm.py:504-523), which consumes a sequence_plan
of {"type": text|image, "from": user|model} items plus parallel text/image
lists. Here the plan items carry their own payloads (PlanItem), and the
generator returns {"generated_text": [...], "generated_image": [...]} —
the reference's generated_sequence dict (mllm.py:544-547).
"""

import numpy as np
from PIL import Image

from bitdance_tpu.pipelines.interleaved import InterleavedGenerator, PlanItem
from bitdance_tpu.pipelines.loader import load_t2i_pipeline

if __name__ == "__main__":
    pipe = load_t2i_pipeline("models/BitDance-14B-64x")
    gen = InterleavedGenerator(pipe.bundle, pipe.tokenizer,
                               max_seq_len=8192)
    user_img = np.asarray(Image.open("example_t2i.png"), np.float32)
    user_img = user_img / 127.5 - 1.0                    # NHWC [-1, 1]
    plan = [
        PlanItem(type="text", source="user",
                 text="<|im_start|>user\nDescribe this image, then draw a "
                      "night-time version of it.<|im_end|>\n"
                      "<|im_start|>assistant\n"),
        PlanItem(type="image", source="user", image=user_img),
        PlanItem(type="text", source="model"),           # the description
        PlanItem(type="image", source="model",           # the re-render
                 image_size=(1024, 1024)),
    ]
    out = gen.generate(plan, cfg_scale=7.5, sample_steps=50,
                       max_length_text=256, seed=0)
    print("model said:", out["generated_text"][0])
    img = np.clip((out["generated_image"][0] + 1.0) * 127.5, 0, 255)
    Image.fromarray(img.astype(np.uint8)).save("example_interleaved.png")
    print("saved example_interleaved.png")
