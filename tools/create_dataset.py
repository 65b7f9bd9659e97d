#!/usr/bin/env python
"""Dataset creation pipeline: pull 4K-plus photos, center-crop to 3840x2160,
save as images/training_set/image_N.png.

Parity: reference data_handling/dataset_creation.ipynb (cells 1-3): reads the
HuggingFace ``bghira/photo-concept-bucket`` parquet listing, downloads images
with width >= 3840 and height >= 2160, center-crops to exactly 4K, and writes
sequentially numbered PNGs. Network access is required for the default mode;
``--from_dir`` crops already-downloaded images offline.

Usage:
    python tools/create_dataset.py --count 150 [--out images/training_set]
    python tools/create_dataset.py --from_dir raw_photos/ --out images/training_set
"""

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

TARGET_W, TARGET_H = 3840, 2160


def center_crop_4k(img: Image.Image) -> Image.Image | None:
    """Center-crop to 3840x2160; None if the source is too small."""
    w, h = img.size
    if w < TARGET_W or h < TARGET_H:
        return None
    left = (w - TARGET_W) // 2
    top = (h - TARGET_H) // 2
    return img.crop((left, top, left + TARGET_W, top + TARGET_H))


def from_dir(src: str, out: str, start: int) -> int:
    os.makedirs(out, exist_ok=True)
    n = start
    for f in sorted(os.listdir(src)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        img = Image.open(os.path.join(src, f)).convert("RGB")
        cropped = center_crop_4k(img)
        if cropped is None:
            print(f"skip {f}: {img.size} below 4K")
            continue
        path = os.path.join(out, f"image_{n}.png")
        cropped.save(path)
        print(f"wrote {path}")
        n += 1
    return n - start


def from_huggingface(count: int, out: str, start: int) -> int:
    import pandas as pd
    import requests

    url = ("https://huggingface.co/datasets/bghira/photo-concept-bucket/"
           "resolve/main/photo-concept-bucket.parquet")
    print(f"fetching listing: {url}")
    df = pd.read_parquet(url)
    df = df[(df["width"] >= TARGET_W) & (df["height"] >= TARGET_H)]
    os.makedirs(out, exist_ok=True)
    n = start
    for _, row in df.iterrows():
        if n - start >= count:
            break
        try:
            resp = requests.get(row["url"], timeout=30)
            resp.raise_for_status()
            img = Image.open(io.BytesIO(resp.content)).convert("RGB")
        except Exception as e:
            print(f"skip {row['url']}: {e}")
            continue
        cropped = center_crop_4k(img)
        if cropped is None:
            continue
        path = os.path.join(out, f"image_{n}.png")
        cropped.save(path)
        print(f"wrote {path}")
        n += 1
    return n - start


def main():
    parser = argparse.ArgumentParser(description="Build the 4K training set")
    parser.add_argument("--count", type=int, default=150)
    parser.add_argument("--out", type=str, default="images/training_set")
    parser.add_argument("--start", type=int, default=0,
                        help="First image number")
    parser.add_argument("--from_dir", type=str, default=None,
                        help="Crop local images instead of downloading")
    args = parser.parse_args()
    if args.from_dir:
        n = from_dir(args.from_dir, args.out, args.start)
    else:
        n = from_huggingface(args.count, args.out, args.start)
    print(f"done: {n} images")


if __name__ == "__main__":
    main()
