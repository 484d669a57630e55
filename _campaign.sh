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

# 0. grant probe (cheap; bail early if still down). A crashed TPU client
#    wedges the grant ~2-3 min; this eats the wait so steps don't.
run probe 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128))
print('grant ok', float(jnp.sum(x@x)))" || exit 1

# 1. verify drive (Pallas kernels, tokenizer roundtrip, EM sampler)
run smoke 580 python scripts/smoke_tpu.py

# 2. FLAGSHIP serving config (bench.py ladder step 1): 28L int8 W8A8 +
#    int8 KV, 2 images. bf16-KV at this geometry plans to ~15.1G of 15.75G
#    and runtime-OOMs — do not lead with it.
run t2i_28l_kv8 1500 python -m benchmarks.bench_t2i --real-14b --layers 28 \
    --quant-llm --quant-head --kv-int8 --images 2 --iters 2

# 3. FULL-DEPTH capacity config: 40L int4 W4A8 LLM + int4 head, int8 KV
#    (bf16-KV 2-image OOMs on-device at this depth — measured r3)
run t2i_full40_kv8 1800 python -m benchmarks.bench_t2i --real-14b \
    --layers 40 --quant-llm-int4 --head-int4 --kv-int8 --images 2 --iters 2

# 4. 3-image int8-KV: head weight-DMA amortization vs KV dequant cost
#    (4-image was 9.37 vs 8.34 in r2; 3 may sit on the other side)
run t2i_3img_kv8 1500 python -m benchmarks.bench_t2i --real-14b --layers 28 \
    --quant-llm --quant-head --kv-int8 --images 3 --iters 2

# 5. packed-MLLM train step at the production 33k budget (sparse attention)
run train33k 1200 python -m benchmarks.bench_train --skip-imagenet \
    --mllm-budget 33280 --steps 4

# 6. imagenet headline (regression watch)
run imagenet 1200 python bench.py --skip-t2i --skip-train

echo "CAMPAIGN DONE $(date +%H:%M:%S)" | tee -a /tmp/campaign.log
