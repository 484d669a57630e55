#!/bin/bash
# TPU measurement campaign for this session — run steps IN ORDER, one TPU
# process at a time. Each step's log goes to /tmp/camp_<step>.log.
set -u
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a /tmp/campaign.log
  timeout "$tmo" "$@" > "/tmp/camp_$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc end $(date +%H:%M:%S)" | tee -a /tmp/campaign.log
  tail -3 "/tmp/camp_$name.log" | sed 's/^/    /' | tee -a /tmp/campaign.log
  return $rc
}

# 0. grant probe (cheap; bail early if still down)
run probe 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128))
print('grant ok', float(jnp.sum(x@x)))" || exit 1

# 1. verify drive (includes streamed-EM small drive)
run smoke 580 python scripts/smoke_tpu.py

# 2. streamed kernel at 14B-head geometry vs stacked XLA (the decision metric)
run streamed_big 1500 python -m benchmarks.bench_streamed_head big

# 2b. int4-packed streamed kernel at 14B-head geometry (W4A8; halves the
#     weight DMA vs int8 — the head's remaining lever)
run streamed_big4 1500 python -m benchmarks.bench_streamed_head big4

# 2c. int4 parity drive (small geometry, real Mosaic compile + rel err)
run streamed_small 900 python -m benchmarks.bench_streamed_head small

# 3. int8 conv MXU rate (gates --vae-int8)
run int8conv 580 python -m benchmarks.bench_int8_conv

# 4. T2I flagship with streamed head, 2 images (compare vs 6.91 s/image)
run t2i_2img 1500 python -m benchmarks.bench_t2i --real-14b --layers 28 \
    --quant-llm --quant-head --images 2 --iters 2

# 5. T2I 3-image (streamed head amortizes weight DMA over more rows)
run t2i_3img 1500 python -m benchmarks.bench_t2i --real-14b --layers 28 \
    --quant-llm --quant-head --images 3 --iters 2

# 5b. T2I with the int4-packed head (gated on step 2b/2c results)
run t2i_2img_i4 1500 python -m benchmarks.bench_t2i --real-14b --layers 28 \
    --quant-llm --head-int4 --images 2 --iters 2

# 5c. FULL-DEPTH 40L capacity config: int4 LLM + int4 head, bf16 KV
#     (~13.4GB resident; if OOM, retry with --kv-int8)
run t2i_full40 1800 python -m benchmarks.bench_t2i --real-14b --layers 40 \
    --quant-llm-int4 --head-int4 --images 2 --iters 2 \
 || run t2i_full40_kv8 1800 python -m benchmarks.bench_t2i --real-14b \
    --layers 40 --quant-llm-int4 --head-int4 --kv-int8 --images 2 --iters 2

# 6. ImageNet: VAE int8 A/B at the standard b256 serving config
run in_vae8 1200 python bench.py --skip-t2i --vae-int8

# 7. ImageNet: does b384 fit now that weights/KV/head are int8?
#    (b512 OOM'd at 24.3G pre-int8; cache at b384 ~9GB)
run in_b384 1200 python bench.py --skip-t2i --batch 384 --vae-int8

echo "CAMPAIGN DONE $(date +%H:%M:%S)" | tee -a /tmp/campaign.log
