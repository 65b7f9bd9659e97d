#!/usr/bin/env python
"""Re-run one BENCH_MATRIX.json quality cell and patch it in place.

Round-5 use: the Fast x6 `serve_psnr_vs_f32_db` cell failed with a
transient remote-compile HTTP 500 during the full matrix regeneration
(tools/bench_matrix.py keeps the fps number and records `quality_error`
rather than discarding the row). This re-runs just that cell's
quality_delta and replaces the error with the measured value.

Usage: python tools/patch_matrix_cell.py [model] [scale] [--json F]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="FastTransformer")
    ap.add_argument("scale", nargs="?", type=int, default=6)
    ap.add_argument("--json", default="BENCH_MATRIX.json")
    ap.add_argument("--serve", default="fast")
    args = ap.parse_args()

    from tools.bench_matrix import quality_delta

    q = quality_delta(args.model, args.scale, args.serve)
    print(f"{args.model} x{args.scale}: serve_psnr_vs_f32_db = {q}")
    with open(args.json) as f:
        rows = json.load(f)
    for row in rows:
        if row["model"] == args.model and row["scale"] == args.scale:
            row.pop("quality_error", None)
            row["serve_psnr_vs_f32_db"] = None if q is None else round(q, 2)
    with open(args.json, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"patched {args.json}")


if __name__ == "__main__":
    main()
