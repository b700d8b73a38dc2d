"""Summarize translation-bias A/B arms (scripts/ab_translation.sh output).

Reads /tmp/ab_translation/<arm>.json (eval_checkpoints JSON blobs) and
prints one table per category with the metrics that decide the flags:
T median (total / up / lateral), up axis, right line, scale.

Usage: python scripts/ab_summarize.py [--dir /tmp/ab_translation]
"""
from __future__ import annotations

import argparse
import json
import os

ARMS = ["base", "hs", "pb", "both"]
COLS = [
    ("t_err_mm_median", "T mm"),
    ("t_err_up_mm_median", "T-up"),
    ("t_err_perp_mm_median", "T-lat"),
    ("up_err_deg_median", "up°"),
    ("right_line_deg_median", "right-line°"),
    ("scale_err_pct_median", "scale%"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ab_translation")
    args = ap.parse_args()

    data = {}
    for arm in ARMS:
        path = os.path.join(args.dir, f"{arm}.json")
        if not os.path.exists(path):
            continue
        # eval_checkpoints tees human lines + one JSON blob; take the last
        # line that parses as a dict
        blob = None
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        blob = json.loads(line)
                    except json.JSONDecodeError:
                        pass
        if blob:
            data[arm] = blob

    if not data:
        print("no arm results found in", args.dir)
        return

    cats = sorted({c for blob in data.values() for c in blob})
    for cat in cats:
        print(f"\n== {cat}")
        hdr = f"{'arm':6s}" + "".join(f"{label:>13s}" for _, label in COLS)
        print(hdr)
        for arm in ARMS:
            row = data.get(arm, {}).get(cat)
            if not row:
                continue
            cells = "".join(
                f"{row.get(key, float('nan')):13.1f}" for key, _ in COLS)
            print(f"{arm:6s}{cells}")


if __name__ == "__main__":
    main()
