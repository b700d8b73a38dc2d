"""Multi-category training sweep.

Replaces the reference's Hydra multirun (``python train.py -m
category=bowl,mug,...`` — independent processes, reference README.md:102):
train several categories either sequentially in-process or as one subprocess
per category (useful on multi-chip hosts where each process grabs one chip
via JAX_DEFAULT_DEVICE / separate tunnels).

Usage:
    python -m cppf_tpu.train.multirun categories=bowl,mug,can [max_epoch=...]
        [parallel=true] [out_root=checkpoints]
"""
from __future__ import annotations

import logging
import os
import subprocess
import sys

from cppf_tpu.config import load_config, parse_cli_overrides

log = logging.getLogger("cppf_tpu.multirun")

NOCS_DEFAULT = ["bottle", "bowl", "camera", "can", "laptop", "mug"]


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    overrides = parse_cli_overrides([a for a in (argv or sys.argv[1:]) if "=" in a])
    cats = overrides.pop("categories", None)
    if isinstance(cats, str):
        cats = cats.split(",")
    cats = cats or NOCS_DEFAULT
    out_root = overrides.pop("out_root", "checkpoints")
    run_parallel = bool(overrides.pop("parallel", False))

    if run_parallel:
        procs = []
        for cat in cats:
            cmd = [sys.executable, "-m", "cppf_tpu.train.loop", f"category={cat}",
                   f"out_dir={os.path.join(out_root, cat)}"]
            cmd += [f"{k}={v}" for k, v in overrides.items()]
            log.info("spawn: %s", " ".join(cmd))
            procs.append(subprocess.Popen(cmd))
        rc = 0
        for p in procs:
            rc |= p.wait()
        sys.exit(rc)

    from cppf_tpu.train.loop import train

    for cat in cats:
        cfg = load_config(cat, dict(overrides))
        log.info("=== training %s ===", cat)
        train(cfg, out_dir=os.path.join(out_root, cat),
              epoch_len=overrides.get("epoch_len"))


if __name__ == "__main__":
    main()
