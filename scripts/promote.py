"""Promote an experiment checkpoint to the production directory.

Round-5 workflow (MANIFEST.md provenance rules): retrains land in
``checkpoints/<cat>_r5*`` experiment dirs and are promoted only after the
head-to-head eval (``round5_end.sh`` phase 1) shows them beating the
committed production weights.  This script performs the copy step —
MANIFEST.md must be updated in the same commit (by hand, with the eval
numbers that justified the promotion).

The experiment dir is never modified; the production dir's previous state
remains recoverable from git.  Drivers load ``<prod>/params_best`` +
``<prod>/config.yaml`` (cppf_tpu/eval/nocs_inference.py:54-66), so the
promoted state — whichever arm won, ``params_best`` (best-loss) or
``best_decode`` (decode-quality-selected) — is installed under the
``params_best`` name.

Usage:
    python scripts/promote.py bathtub checkpoints/bathtub_r5 --name best_decode
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys


def promote(category: str, exp_dir: str, name: str, ckpt_root: str) -> None:
    src_state = os.path.join(exp_dir, name)
    if not os.path.isdir(src_state):
        sys.exit(f"promote: {src_state} does not exist")
    prod = os.path.join(ckpt_root, category)
    os.makedirs(prod, exist_ok=True)
    dst_state = os.path.join(prod, "params_best")
    if os.path.isdir(dst_state):
        shutil.rmtree(dst_state)  # previous production state lives in git
    shutil.copytree(src_state, dst_state)
    for aux in ("config.yaml", "metrics.jsonl", "decode_metrics.jsonl"):
        src = os.path.join(exp_dir, aux)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(prod, aux))
    print(f"promoted {src_state} -> {dst_state} (+ config/metrics)")
    print("now: update checkpoints/MANIFEST.md and commit both together")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("category")
    ap.add_argument("exp_dir")
    ap.add_argument("--name", default="best_decode",
                    help="which saved state to promote (best_decode | params_best)")
    ap.add_argument("--ckpt_root", default="checkpoints")
    a = ap.parse_args()
    promote(a.category, a.exp_dir, a.name, a.ckpt_root)
