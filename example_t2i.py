"""Quickstart: canonical T2I usage (parity with reference example_t2i.py)."""

from PIL import Image

from bitdance_tpu.pipelines.loader import load_t2i_pipeline

if __name__ == "__main__":
    pipe = load_t2i_pipeline("models/BitDance-14B-64x")
    images = pipe.generate(
        prompt="A fluffy corgi sitting on a skateboard in Times Square",
        height=1024,
        width=1024,
        num_sampling_steps=50,
        guidance_scale=7.5,
        num_images=1,
        seed=1234,
    )
    Image.fromarray(images[0]).save("example_t2i.png")
    print("saved example_t2i.png")
