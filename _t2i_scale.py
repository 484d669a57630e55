"""Mid-scale T2I generation drive: ~0.7B LLM, 512px, p=16, 50 diff steps."""
import time
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.models.connector import MLPConnector
from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.models.tokenizer import VQModel
from bitdance_tpu.pipelines.t2i import T2IModelBundle, T2IPipeline

t0 = time.time()
def mark(s): print(f"[{time.time()-t0:6.1f}s] {s}", flush=True)

hidden, z, p = 1024, 32, 16
llm_cfg = q3.Qwen3Config(vocab_size=4096, hidden_size=hidden,
                         intermediate_size=4096, num_hidden_layers=16,
                         num_attention_heads=16, num_key_value_heads=8,
                         head_dim=64)
llm_params = q3.init_qwen3_params(jax.random.PRNGKey(0), llm_cfg, jnp.bfloat16)
dd = dict(z_channels=z, in_channels=3, out_ch=3, ch=256, ch_mult=[1,1,2,2,4], num_res_blocks=4)
ae = VQModel(ddconfig=dd, dtype=jnp.bfloat16)
ae_params = jax.jit(lambda k, x: ae.init(k, x, method=VQModel.decode,
                                         noise_rng=jax.random.PRNGKey(9)))(
    jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, z), jnp.bfloat16))
mark("ae init")
head = DiffHead(ch_target=z, ch_cond=hidden, ch_latent=1024, depth_latent=6,
                depth_adanln=2, parallel_num=p, use_swiglu=True,
                P_mean=-0.8, P_std=0.8, dtype=jnp.bfloat16)
hp = jax.jit(head.init)(jax.random.PRNGKey(2), jnp.zeros((2, p, z)),
                        jnp.zeros((2, p, hidden)), jax.random.PRNGKey(3))
proj = MLPConnector(out_dim=hidden, dtype=jnp.bfloat16)
pp = proj.init(jax.random.PRNGKey(4), jnp.zeros((1, z)))
mark("params ready")

class StubTok:
    def __init__(self):
        self.special = {}
        base = 2000
        for i, t in enumerate(["<|vision_start|>"]
                              + [f"<|res_{j}|>" for j in range(1, 65)]
                              + [f"<|query_{j}|>" for j in range(1, p)]):
            self.special[t] = base + i
    def encode(self, text): return [min(ord(c), 1999) for c in text][:48]
    def convert_tokens_to_ids(self, tok): return self.special[tok]

bundle = T2IModelBundle(llm_cfg=llm_cfg, llm_params=llm_params, ae=ae,
                        ae_params=ae_params, head=head, head_params=hp,
                        projector=proj, projector_params=pp, parallel_num=p,
                        hidden_size=hidden, vae_patch_size=16, pe_max_len=2048)
pipe = T2IPipeline(bundle, tokenizer=StubTok())
imgs = pipe.generate("a serene mountain lake at sunset", height=512, width=512,
                     num_sampling_steps=50, guidance_scale=7.5, num_images=1,
                     seed=7)
mark(f"512px generate #1 (incl compile): {imgs.shape}")
t1 = time.time()
imgs = pipe.generate("a bustling city street at night", 512, 512, 50, 7.5, 1, seed=8)
dt = time.time() - t1
mark(f"512px generate #2 (cached): {dt:.2f}s/image | {1.0/dt:.3f} img/s")
assert imgs.shape == (1, 512, 512, 3) and imgs.dtype == np.uint8
print("T2I SCALE DRIVE PASSED", flush=True)
