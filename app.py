"""Gradio demo (parity with reference app.py:1-211).

Resolution dropdown over the 18 aspect-ratio buckets, seed/steps/cfg
sliders, gallery output. Gradio isn't baked into every image — the import
is gated with a clear message.
"""

import argparse

from bitdance_tpu.data.special_tokens import IMAGE_SIZE_LIST


def build_demo(pipe):
    try:
        import gradio as gr
    except ImportError as e:
        raise SystemExit(
            "gradio is not installed in this environment; "
            "use example_t2i.py or the eval harnesses instead") from e

    resolutions = [f"{h}x{w}" for h, w in IMAGE_SIZE_LIST]

    def generate(prompt, resolution, steps, cfg, num_images, seed):
        h, w = map(int, resolution.split("x"))
        images = pipe.generate(
            prompt, height=h, width=w, num_sampling_steps=int(steps),
            guidance_scale=float(cfg), num_images=int(num_images),
            seed=int(seed))
        return [img for img in images]

    with gr.Blocks(title="BitDance-TPU") as demo:
        gr.Markdown("# BitDance-TPU text-to-image")
        with gr.Row():
            with gr.Column():
                prompt = gr.Textbox(label="Prompt", lines=3)
                resolution = gr.Dropdown(resolutions, value="1024x1024",
                                         label="Resolution (HxW)")
                steps = gr.Slider(10, 100, value=50, step=1,
                                  label="Sampling steps")
                cfg = gr.Slider(1.0, 20.0, value=7.5, step=0.5,
                                label="Guidance scale")
                num_images = gr.Slider(1, 4, value=1, step=1,
                                       label="Images")
                seed = gr.Number(value=1234, label="Seed", precision=0)
                btn = gr.Button("Generate", variant="primary")
            gallery = gr.Gallery(label="Results", columns=2)
        btn.click(generate, [prompt, resolution, steps, cfg, num_images, seed],
                  gallery)
    return demo


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default="models/BitDance-14B-64x")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()

    from bitdance_tpu.pipelines.loader import load_t2i_pipeline

    pipe = load_t2i_pipeline(args.model_path)
    build_demo(pipe).launch(server_name="0.0.0.0", server_port=args.port)
