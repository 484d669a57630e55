"""Benchmark orchestrator: one JSON line with every recorded metric family.

Headline = ImageNet-256 class-conditional sampling throughput (BASELINE.json
config 3); alongside it the T2I flagship ladders (0.7B, 14B-width, 14B
full-depth, 16x variants), tokenizer throughput, and three train-step
families. No reference wall-clock numbers are published (BASELINE.json
"published": {}), so vs_baseline is reported against the driver-recorded
history (1.0 on first run).

Round-5 restructure (BENCH_r04 rc=124 postmortem — the suite exceeded the
driver's wall clock and, because results printed only once at the end,
recorded NOTHING):
  * a GLOBAL DEADLINE (--budget-s / BITDANCE_BENCH_BUDGET, default 3300s):
    every subprocess timeout is capped by the time remaining, families that
    can't fit are skipped with a "skipped(deadline)" config note, and the
    final JSON ALWAYS prints with rc=0 inside the budget;
  * the headline imagenet metric runs FIRST (it is also the cheapest);
  * every family runs in a child process (one TPU client at a time — this
    process never claims the device), and after each family the cumulative
    result is flushed to stderr (`PARTIAL ...`) and to BENCH_PARTIAL.json
    on disk, so even a hard kill preserves everything measured so far;
  * stdout still carries exactly ONE final JSON line (the r1-r3 contract);
    a SIGTERM also triggers a best-effort dump of the cumulative JSON;
  * the no-cache insurance rungs (cache-poisoning postmortem, r4) run only
    when enough budget remains for their ~1100s cold compile.

Usage: python bench.py [--quick] [--budget-s N] [--batch N] [--model B|L|H]
"""

import argparse
import glob
import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# global deadline state (set in main); RESULT is dumped on SIGTERM
DEADLINE = None
RESULT = {}


def remaining():
    return DEADLINE - time.monotonic() if DEADLINE else 1e9


def emit_partial(stage):
    """Flush the cumulative result after every metric family: stderr is
    unbuffered so the line survives a timeout kill in the driver's captured
    tail, and BENCH_PARTIAL.json survives on disk either way."""
    line = json.dumps(RESULT)
    print(f"PARTIAL after {stage} (remaining {int(remaining())}s): {line}",
          file=sys.stderr, flush=True)
    try:
        with open(os.path.join(REPO, "BENCH_PARTIAL.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def _term_handler(signum, frame):
    # best effort: if the driver's timeout fires anyway, put the cumulative
    # JSON on stdout before dying so the captured tail still has the data
    try:
        print(json.dumps(RESULT), flush=True)
    finally:
        os._exit(0)


def prior_value(metric: str, key: str = None):
    """Latest driver-recorded value for `metric` from BENCH_r*.json history.

    With `key`, look up that sub-key of the parsed JSON line instead of the
    headline value (the t2i metrics live alongside the imagenet headline)."""
    found = None
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, ValueError):
            continue
        if key is not None:
            if isinstance(parsed.get(key), (int, float)):
                found = float(parsed[key])
        elif parsed.get("metric") == metric and isinstance(
                parsed.get("value"), (int, float)):
            found = float(parsed["value"])
    return found


def probe_grant():
    # a crashed TPU client wedges the device grant for ~2-3 min; every
    # new client then hangs on its first op. Probe with a trivial
    # matmul before the next attempt so the wait doesn't eat the
    # attempt's own timeout (measured: 158s recovery). Returns True when
    # the device answered — recorded as RESULT["device_probe"] so a
    # null-filled result is self-explaining (r5 tunnel outage postmortem).
    import subprocess

    for _ in range(2):
        tmo = min(300.0, max(30.0, remaining() - 30.0))
        if remaining() < 60:
            return False
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones((128,128)))))"],
                cwd=REPO, env=dict(os.environ), capture_output=True,
                text=True, timeout=tmo)
            if r.returncode == 0:
                RESULT["device_probe"] = "ok"
                return True
        except subprocess.TimeoutExpired:
            pass
    RESULT.setdefault("device_probe", "unreachable")
    return False


def run_t2i_ladder(ladder, timeout_s=480):
    """Run benchmarks/bench_t2i.py configs in a child process (one TPU
    client at a time) and parse s/image.

    `ladder` is a list of (label, extra_args, env_overrides) tried IN ORDER
    until one produces a number: the escalation steps are materially
    different configs (streamed-EM kernel off, int8 KV cache, one-program
    trace), so a fault in the fast path still records a (slower) flagship
    number instead of null (VERDICT r2 ask #2). Every attempt's timeout is
    capped by the global deadline; rungs that can't fit are skipped.
    Returns (s_per_image, label, attribution_dict) or (None, None, None)."""
    import re
    import subprocess

    for label, extra_args, env_over in ladder:
        # a no-cache rung cold-compiles the full program (~1100s for the
        # 14B configs through the tunnel): only worth attempting with a
        # comfortable budget, never under deadline pressure
        if env_over.get("BITDANCE_COMPILE_CACHE") == "0" \
                and remaining() < 1500:
            print(f"# t2i bench [{label}]: skipped(deadline) — no-cache "
                  f"rung needs >1500s, {int(remaining())}s left",
                  file=sys.stderr, flush=True)
            continue
        if remaining() - 45.0 < 120:
            print(f"# t2i bench [{label}]: skipped(deadline) — "
                  f"{int(remaining())}s left", file=sys.stderr, flush=True)
            continue
        # probe before every attempt: a previous ladder step (or an earlier
        # metric's crashed run) may have wedged the grant
        probe_grant()
        # budget AFTER the probe — a slow/unreachable-device probe can eat
        # ~10 min, and a stale pre-probe budget would overshoot DEADLINE
        tmo = min(float(timeout_s), remaining() - 45.0)
        if tmo < 120:
            print(f"# t2i bench [{label}]: skipped(deadline after probe)",
                  file=sys.stderr, flush=True)
            continue
        # keep the environment intact: the axon PJRT plugin is registered
        # by sitecustomize.py on PYTHONPATH (/root/.axon_site) — removing
        # or extending PYTHONPATH both break plugin discovery
        env = dict(os.environ)
        env.update(env_over)
        try:
            r = subprocess.run(
                [sys.executable, "-m", "benchmarks.bench_t2i", "--iters", "2"]
                + extra_args,
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=tmo)
        except subprocess.TimeoutExpired:
            print(f"# t2i bench [{label}] {extra_args}: timeout after "
                  f"{int(tmo)}s", file=sys.stderr, flush=True)
            continue
        m = re.search(r"([0-9.]+) s/image", r.stdout)
        if m:
            attribution = None
            am = re.search(r"^ATTRIBUTION (.*)$", r.stdout, re.MULTILINE)
            if am:
                try:
                    attribution = json.loads(am.group(1))
                except ValueError:
                    pass
            return float(m.group(1)), label, attribution
        tail = "\n".join((r.stdout + "\n" + r.stderr).strip().splitlines()[-8:])
        print(f"# t2i bench [{label}] {extra_args}: rc={r.returncode}, "
              f"no s/image in output; tail:\n{tail}", file=sys.stderr,
              flush=True)
    return None, None, None


def run_json_line_bench(module, marker, extra_args=None, timeout_s=600,
                        probe=True):
    """Run a benchmarks/ module in a child process and parse its
    `MARKER {json}` line. Timeout capped by the global deadline.
    Returns the parsed dict or None."""
    import re
    import subprocess

    if remaining() - 45.0 < 120:
        print(f"# {module}: skipped(deadline) — {int(remaining())}s left",
              file=sys.stderr, flush=True)
        return None
    if probe:
        probe_grant()
    # budget AFTER the probe (see run_t2i_ladder)
    tmo = min(float(timeout_s), remaining() - 45.0)
    if tmo < 120:
        print(f"# {module}: skipped(deadline after probe)",
              file=sys.stderr, flush=True)
        return None
    try:
        r = subprocess.run(
            [sys.executable, "-m", module] + (extra_args or []),
            cwd=REPO, env=dict(os.environ), capture_output=True, text=True,
            timeout=tmo)
    except subprocess.TimeoutExpired:
        print(f"# {module}: timeout after {int(tmo)}s", file=sys.stderr,
              flush=True)
        return None
    m = re.search(rf"^{marker} (.*)$", r.stdout, re.MULTILINE)
    if m:
        try:
            return json.loads(m.group(1))
        except ValueError:
            pass
    tail = "\n".join((r.stdout + "\n" + r.stderr).strip().splitlines()[-8:])
    print(f"# {module}: rc={r.returncode}, no {marker} line; tail:\n{tail}",
          file=sys.stderr, flush=True)
    return None


def main():
    global DEADLINE

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes to smoke-test the bench path")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("BITDANCE_BENCH_BUDGET",
                                                 "3300")),
                    help="global wall-clock budget; families that can't fit "
                         "are skipped so the final JSON always prints")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--model", type=str, default="BitDance-B")
    ap.add_argument("--parallel", type=int, default=1)
    ap.add_argument("--skip-t2i", action="store_true",
                    help="skip the T2I flagship measurements")
    ap.add_argument("--skip-train", action="store_true",
                    help="skip the packed-MLLM train-step measurement")
    args, passthrough = ap.parse_known_args()

    DEADLINE = time.monotonic() + args.budget_s
    signal.signal(signal.SIGTERM, _term_handler)

    metric = f"imagenet256_{args.model}_{args.parallel}x_images_per_sec_per_chip"
    RESULT.update({
        "metric": metric,
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
    })

    # ---- family 1: the headline imagenet metric, FIRST (also cheapest) ----
    imgnet_args = (["--batch", str(args.batch), "--model", args.model,
                    "--parallel", str(args.parallel)]
                   + (["--quick"] if args.quick else []) + passthrough)
    # generous timeout: the headline runs FIRST with the whole budget
    # ahead of it, and a cold compile of the 242M sample program through
    # the tunnel exceeds 900s (measured r5)
    rec = run_json_line_bench("benchmarks.bench_imagenet", "IMAGENET",
                              imgnet_args,
                              timeout_s=600 if args.quick else 1500)
    if rec and isinstance(rec.get("imgs_per_sec"), (int, float)):
        prev = prior_value(metric)
        RESULT["value"] = rec["imgs_per_sec"]
        # no published reference wall-clock exists (BASELINE.json
        # "published": {}), so the baseline is the last driver-recorded
        # round: a regression shows up as vs_baseline < 1.
        RESULT["vs_baseline"] = (round(rec["imgs_per_sec"] / prev, 4)
                                 if prev else 1.0)
        RESULT["config"] = rec.get("config")
    emit_partial("imagenet")

    if args.quick:
        print(json.dumps(RESULT))
        print(f"# quick bench, budget {args.budget_s:.0f}s, "
              f"{int(remaining())}s unused", file=sys.stderr, flush=True)
        return

    def vs_prior(key, val):
        # s/image: LOWER is better, so vs_baseline = prior / current
        prev = prior_value(None, key=key)
        if prev and val:
            return round(prev / val, 4)
        return 1.0 if val else None

    t2i_attr = {}

    # ---- family 2: T2I 0.7B flagship (1024px, p=64) ----
    if not args.skip_t2i:
        # int8 serving config leads (measured 1.16 vs 1.35 s/image bf16);
        # --vae-int8 joins it in r4 (VERDICT r3 ask #4); bf16 one-program
        # is the escalation fallback
        t2i, lbl, t2i_attr["t2i_1024px"] = run_t2i_ladder(
            [("int8+int8vae",
              ["--quant-llm", "--quant-head", "--kv-int8", "--vae-int8"], {}),
             ("bf16", [], {}),
             ("bf16+one-program", [], {"BITDANCE_ONE_PROGRAM": "1"})],
            timeout_s=900)
        RESULT["t2i_1024px_s_per_image"] = t2i
        RESULT["t2i_1024px_vs_baseline"] = vs_prior(
            "t2i_1024px_s_per_image", t2i)
        RESULT["t2i_config"] = f"0.7B-class LLM (16L/1024d) [{lbl}]"
        # attribution flushed per family — a mid-run kill must not lose
        # already-measured attribution blocks (r5 review finding)
        RESULT["t2i_attribution"] = {k: v for k, v in t2i_attr.items()
                                     if v is not None}
        emit_partial("t2i_1024px")

        # ---- family 3: TRUE 14B width, 28/40 layers int8 (single-chip
        # int8 maximum; bf16 stops at 13L) — see bench_t2i.py MEMORY_PLAN.
        # r4: manual-DMA streamed head kernel leads, 3-image batch wins
        # (5.74 s/image, MFU 0.699). BITDANCE_STREAMED_EM=0 rung = the
        # r3-proven stacked-XLA sampler if the kernel path regresses.
        # int8-KV everywhere: bf16-KV at this geometry plans to within
        # ~0.6G of the HBM ceiling and runtime-OOMs — measured r3.
        base_28 = ["--real-14b", "--layers", "28", "--quant-llm",
                   "--quant-head", "--vae-int8", "--kv-int8"]
        t2i_14b, lbl, t2i_attr["t2i_14b_geom"] = run_t2i_ladder(
            [("int8+3img", base_28 + ["--images", "3"], {}),
             ("int8+2img", base_28 + ["--images", "2"], {}),
             ("int8+2img+stacked-sampler", base_28 + ["--images", "2"],
              {"BITDANCE_STREAMED_EM": "0"}),
             # no-cache rung: a poisoned persistent-cache entry surfaced
             # as an async InvalidArgument in r4 (fresh compile of the
             # identical config passed) — only attempted when >1500s of
             # budget remain (cold compile ~1100s)
             ("int8+3img+nocache", base_28 + ["--images", "3"],
              {"BITDANCE_COMPILE_CACHE": "0"}),
             ("int8+bf16kv-1img", ["--real-14b", "--layers", "28",
                                   "--quant-llm", "--quant-head",
                                   "--images", "1"], {})],
            timeout_s=1500)
        RESULT["t2i_14b_geom_s_per_image"] = t2i_14b
        RESULT["t2i_14b_geom_vs_baseline"] = vs_prior(
            "t2i_14b_geom_s_per_image", t2i_14b)
        RESULT["t2i_14b_geom_config"] = (
            "5120d LLM 28/40 layers + full 14B head, int8 W8A8, "
            f"dma head kernel [{lbl}]")
        RESULT["t2i_attribution"] = {k: v for k, v in t2i_attr.items()
                                     if v is not None}
        emit_partial("t2i_14b_geom")

        # ---- family 4: COMPLETE-model capacity config: all 40 layers at
        # true 14B width via packed int4 W4A8 (ops/int4.py) — the only
        # single-chip config that serves the full-depth model.
        # int8-KV leads: 40L bf16-KV 2-image OOMs on-device (measured r3).
        # r4 kernel: 9.75 -> 7.05 s/image at 2 images, 6.93 at 3.
        base_40 = ["--real-14b", "--layers", "40", "--quant-llm-int4",
                   "--head-int4", "--vae-int8", "--kv-int8"]
        t2i_14b_full, lbl, t2i_attr["t2i_14b_full_depth"] = run_t2i_ladder(
            [("int4+3img", base_40 + ["--images", "3"], {}),
             ("int4+2img", base_40 + ["--images", "2"], {}),
             ("int4+2img+stacked-sampler", base_40 + ["--images", "2"],
              {"BITDANCE_STREAMED_EM": "0"}),
             # cache-poisoning insurance (see the geom ladder comment)
             ("int4+3img+nocache", base_40 + ["--images", "3"],
              {"BITDANCE_COMPILE_CACHE": "0"}),
             ("int4+int8kv-1img", ["--real-14b", "--layers", "40",
                                   "--quant-llm-int4", "--head-int4",
                                   "--kv-int8", "--images", "1"], {})],
            timeout_s=1500)
        RESULT["t2i_14b_full_depth_s_per_image"] = t2i_14b_full
        RESULT["t2i_14b_full_depth_vs_baseline"] = vs_prior(
            "t2i_14b_full_depth_s_per_image", t2i_14b_full)
        RESULT["t2i_14b_full_depth_config"] = (
            "COMPLETE 40-layer 5120d LLM + full 14B head, packed int4 "
            f"W4A8, dma head kernel [{lbl}]")
        RESULT["t2i_attribution"] = {k: v for k, v in t2i_attr.items()
                                     if v is not None}
        emit_partial("t2i_14b_full_depth")

    # ---- family 5: tokenizer enc+dec throughput (the BASELINE.md
    # north-star metric's throughput side; PSNR parity is covered by the
    # golden tests) — d16c32 production geometry, 256px ----
    tok = run_json_line_bench("benchmarks.bench_tokenizer", "TOKENIZER",
                              timeout_s=900)
    RESULT["tokenizer_enc_dec_imgs_per_sec"] = (
        tok.get("enc_dec_imgs_per_sec") if tok else None)
    prev_tok = prior_value(None, key="tokenizer_enc_dec_imgs_per_sec")
    v = RESULT["tokenizer_enc_dec_imgs_per_sec"]
    RESULT["tokenizer_vs_baseline"] = (
        round(v / prev_tok, 4) if (v and prev_tok) else (1.0 if v else None))
    RESULT["tokenizer_attribution"] = tok
    emit_partial("tokenizer")

    # ---- family 6: quantization quality (VERDICT r4 ask #3) — every
    # quantized headline's quality cost: same-weights bf16 vs int8 vs int4
    # pipelines, +-1 token agreement + decoded-image PSNR ----
    if not args.skip_t2i:
        qq = run_json_line_bench(
            "benchmarks.bench_quant_quality", "QUANTQUALITY",
            ["--hidden", "512", "--layers", "4", "--parallel", "16",
             "--height", "256", "--steps", "50", "--seeds", "2"],
            timeout_s=900)
        RESULT["quant_quality"] = qq
        emit_partial("quant_quality")

    # ---- families 7-9: train-step throughput ----
    #  - packed MLLM at the PRODUCTION 33k token budget
    #    (bitdance_14b_64x.yaml:45-47), sparse-iteration attention
    #  - the same step at TRUE 14B width (5120d Qwen3-14B layer geometry +
    #    5120-wide head), reduced depth to fit one chip
    #  - ImageNet AR train step
    if not args.skip_train:
        def train_keys(prefix, rec, value_key, legacy_key=None):
            val = rec.get(value_key) if rec else None
            RESULT[f"{prefix}_{value_key}"] = val
            prev_t = prior_value(None, key=f"{prefix}_{value_key}")
            if prev_t is None and legacy_key:
                # r2/r3 recorded this metric under a different key name
                prev_t = prior_value(None, key=legacy_key)
            RESULT[f"{prefix}_vs_baseline"] = (
                round(val / prev_t, 4) if (val and prev_t)
                else (1.0 if val else None))
            if rec:
                RESULT[f"{prefix}_attribution"] = rec

        train_mllm = run_json_line_bench(
            "benchmarks.bench_train", "TRAIN_MLLM",
            ["--skip-imagenet", "--mllm-budget", "33280", "--steps", "4"],
            timeout_s=900)
        train_keys("mllm_train_33k", train_mllm, "tokens_per_sec_per_chip",
                   legacy_key="mllm_train_33k_tokens_per_sec")
        # continuity with the r2/r3 key name
        RESULT["mllm_train_33k_tokens_per_sec"] = (
            train_mllm.get("tokens_per_sec_per_chip") if train_mllm else None)
        emit_partial("train_mllm_33k")

        train_5120 = run_json_line_bench(
            "benchmarks.bench_train", "TRAIN_MLLM",
            ["--skip-imagenet", "--mllm-real-width", "--mllm-layers", "2",
             "--head-blocks", "2", "--mllm-budget", "8192", "--steps", "4",
             "--bf16-state"],
            timeout_s=900)
        train_keys("mllm_train_5120d", train_5120, "tokens_per_sec_per_chip")
        emit_partial("train_mllm_5120d")

        # b128: b256 HLO-temp-OOMs the remat'd train step (measured r4);
        # the serving bench runs b256 because inference has no adamw state
        train_imgnet = run_json_line_bench(
            "benchmarks.bench_train", "TRAIN_IMAGENET",
            ["--skip-mllm", "--imagenet-batch", "128", "--steps", "4"],
            timeout_s=900)
        train_keys("imagenet_train", train_imgnet, "imgs_per_sec_per_chip")
        emit_partial("train_imagenet")

    # ---- families 10-11: 16x model variant (reference ships 14B-16x
    # alongside 64x and claims 64x ~3x faster, README.md:78,182): same
    # 0.7B-class geometry as t2i_1024px but parallel_num=16, at 512px and
    # 1024px. LAST: least headline weight, first to go under deadline. ----
    if not args.skip_t2i:
        for res in (512, 1024):
            k = f"t2i_16x_{res}px"
            val, lbl, attr = run_t2i_ladder(
                [("int8+int8vae",
                  ["--parallel", "16", "--height", str(res), "--quant-llm",
                   "--quant-head", "--kv-int8", "--vae-int8"], {}),
                 ("bf16", ["--parallel", "16", "--height", str(res)], {})],
                timeout_s=700)
            RESULT[f"{k}_s_per_image"] = val
            RESULT[f"{k}_vs_baseline"] = vs_prior(f"{k}_s_per_image", val)
            RESULT[f"{k}_config"] = (
                f"0.7B-class LLM, parallel_num=16 [{lbl}]")
            if attr is not None:
                RESULT.setdefault("t2i_attribution", {})[k] = attr
            emit_partial(k)

    print(json.dumps(RESULT))
    print(f"# budget {args.budget_s:.0f}s, {int(remaining())}s unused",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
