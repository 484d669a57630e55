#!/bin/bash
# One-shot cache re-warm for the families still cold after the r5 kernel
# prune (run when the TPU tunnel is healthy; ~60-90 min). Priority order =
# bench.py family order. Each step logs to /tmp/rewarm_<name>.log.
set -u
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a /tmp/rewarm.log
  timeout "$tmo" "$@" > "/tmp/rewarm_$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc end $(date +%H:%M:%S)" | tee -a /tmp/rewarm.log
  tail -2 "/tmp/rewarm_$name.log" | cut -c1-150 | sed 's/^/    /' | tee -a /tmp/rewarm.log
  return $rc
}
run probe 300 python -c "import jax, jax.numpy as jnp; print('ok', float(jnp.sum(jnp.ones((256,256)))))" || exit 1
run imagenet 1800 python -m benchmarks.bench_imagenet --batch 256
run quant 1800 python -m benchmarks.bench_quant_quality --hidden 512 --layers 4 --parallel 16 --height 256 --steps 50 --seeds 2
run train33k 1500 python -m benchmarks.bench_train --skip-imagenet --mllm-budget 33280 --steps 4
run train5120 1500 python -m benchmarks.bench_train --skip-imagenet --mllm-real-width --mllm-layers 2 --head-blocks 2 --mllm-budget 8192 --steps 4 --bf16-state
run trainimg 1500 python -m benchmarks.bench_train --skip-mllm --imagenet-batch 128 --steps 4
run x16_512 1200 python -m benchmarks.bench_t2i --iters 2 --parallel 16 --height 512 --quant-llm --quant-head --kv-int8 --vae-int8
run x16_1024 1200 python -m benchmarks.bench_t2i --iters 2 --parallel 16 --height 1024 --quant-llm --quant-head --kv-int8 --vae-int8
echo "=== rewarm done $(date +%H:%M:%S)" | tee -a /tmp/rewarm.log
