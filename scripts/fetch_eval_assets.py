"""Fetch/copy the DPG-Bench and GenEval prompt assets.

The real benchmark prompt sets are public but not vendored here:
  - DPG-Bench prompts.json (1065 prompts): from the ELLA repository,
    https://github.com/TencentQQGYLab/ELLA (dpg_bench/prompts/…), or the
    HuggingFace mirror of DPG-Bench. Target path: eval_assets/dpg/prompts.json
  - GenEval evaluation metadata (553 prompts): from
    https://github.com/djghosh13/geneval (prompts/evaluation_metadata.jsonl;
    the reference also ships a *_long.jsonl rewrite). Target path:
    eval_assets/geneval/evaluation_metadata.jsonl

Usage:
  python scripts/fetch_eval_assets.py --from-dir /path/with/assets
      copies prompts.json / *.jsonl found under --from-dir (e.g. an existing
      BitDance checkout's eval/ tree) into eval_assets/.
  python scripts/fetch_eval_assets.py --download
      fetches from the public URLs above (requires network egress).

The harnesses accept any path via --data_path; tiny stub sets with the same
schemas are vendored at eval_assets/{dpg_stub_prompts.json,
geneval_stub_metadata.jsonl} so CI exercises the full IO layout offline.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "eval_assets")

DPG_URL = ("https://raw.githubusercontent.com/TencentQQGYLab/ELLA/main/"
           "dpg_bench/prompts.json")
GENEVAL_URL = ("https://raw.githubusercontent.com/djghosh13/geneval/main/"
               "prompts/evaluation_metadata.jsonl")


def from_dir(src: str) -> int:
    found = 0
    for root, _, files in os.walk(src):
        for name in files:
            p = os.path.join(root, name)
            if name == "prompts.json" and "dpg" in root.lower():
                dst = os.path.join(OUT, "dpg", "prompts.json")
            elif name.endswith(".jsonl") and "geneval" in root.lower():
                dst = os.path.join(OUT, "geneval", name)
            else:
                continue
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy(p, dst)
            print(f"copied {p} -> {dst}")
            found += 1
    return found


def download() -> None:
    import urllib.request

    for url, dst in [
        (DPG_URL, os.path.join(OUT, "dpg", "prompts.json")),
        (GENEVAL_URL, os.path.join(OUT, "geneval",
                                   "evaluation_metadata.jsonl")),
    ]:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        print(f"fetching {url}")
        urllib.request.urlretrieve(url, dst)
        print(f"wrote {dst}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-dir", type=str, default="")
    ap.add_argument("--download", action="store_true")
    args = ap.parse_args()
    if args.from_dir:
        n = from_dir(args.from_dir)
        print(f"{n} asset file(s) copied")
        sys.exit(0 if n else 1)
    if args.download:
        download()
        sys.exit(0)
    ap.print_help()


if __name__ == "__main__":
    main()
