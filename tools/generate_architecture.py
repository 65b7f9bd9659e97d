#!/usr/bin/env python
"""Generate architecture diagrams for each model variant as SVG.

Parity target: the reference ships TikZ sources + a pdflatex/ImageMagick
build script (tools/generate_architecture_png.sh, models/*/architecture.tex).
This environment has no LaTeX; the same artifact (a per-model architecture
diagram under models/{name}/architecture.svg) is produced directly.

Usage: python tools/generate_architecture.py [--out models]
"""

import argparse
import html
import os

STAGES = {
    "FastTransformer": [
        ("input", "LR image (B, H, W, 3)"),
        ("conv", "Encoder: conv3x3 64 + ReLU x2"),
        ("pad", "reflect-pad to multiple of 8"),
        ("split", "Branch A: Upsampler(64) pixel-shuffle -> conv -> RGB"),
        ("embed", "Branch B: patch embed k8 s8 -> 192-d tokens"),
        ("attn", "6x WindowBlock (MSA ws=8, 12 heads, rel-pos bias; MLP 4x)"),
        ("unembed", "patch unembed convT k8 s8 + crop + skip"),
        ("conv", "Decoder: conv3x3 64 + ReLU, conv3x3 -> residual RGB"),
        ("up", "Upsampler(3) pixel-shuffle -> conv"),
        ("add", "out = upscaled_input + residual_up"),
        ("out", "squash to res_out (require_ratio), clamp [0,1]"),
    ],
    "WindowTransformer": [
        ("input", "LR image (B, H, W, 3)"),
        ("conv", "Encoder: conv3x3 64 + ReLU x2"),
        ("down", "stride-2 downsample conv"),
        ("embed", "patch embed k8 s8 -> 128-d tokens"),
        ("attn", "8x WindowBlock (MSA ws=8, 8 heads, rel-pos bias; MLP 4x)"),
        ("unembed", "patch unembed convT k8 s8, crop-to-min + skip"),
        ("conv", "Decoder: conv3x3 64 + ReLU, conv3x3 -> residual RGB"),
        ("up", "bicubic residual upsample"),
        ("add", "out = bicubic(input) + residual_up, clamp [0,1]"),
    ],
    "ResidualTransformer": [
        ("input", "LR image (B, 720, 1280, 3)"),
        ("conv", "Encoder: conv3x3 64 + ReLU x2"),
        ("down", "stride-2 downsample conv -> (360, 640)"),
        ("embed", "patch embed k8 s8 -> 45x80 = 3600 tokens, 128-d"),
        ("pos", "+ learned absolute pos_embed (1, 3600, 128)"),
        ("attn", "8x global MHA block (8 heads; MLP 4x)"),
        ("unembed", "patch unembed convT k8 s8 + skip"),
        ("conv", "Decoder: conv3x3 64 + ReLU, conv3x3 -> residual RGB"),
        ("add", "out = bicubic(input) + bicubic(residual), clamp [0,1]"),
    ],
    "BicubicInterpolation": [
        ("input", "LR image (B, H, W, 3)"),
        ("up", "bicubic interpolation to res_out (a=-0.75)"),
        ("out", "upscaled image"),
    ],
}

COLORS = {
    "input": "#cfe8ff", "conv": "#ffe3b3", "down": "#ffd1d1", "pad": "#eee",
    "split": "#e2d5ff", "embed": "#d5ffd9", "attn": "#ffd5ec",
    "unembed": "#d5ffd9", "pos": "#fff3b0", "up": "#c9f7f0",
    "add": "#f0f0f0", "out": "#cfe8ff", "": "#fff",
}


def render(name: str, stages) -> str:
    box_w, box_h, gap, pad = 560, 38, 14, 20
    width = box_w + 2 * pad
    height = pad * 2 + 30 + len(stages) * (box_h + gap)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'font-family="monospace" font-size="13">',
        f'<text x="{pad}" y="{pad + 8}" font-size="16" font-weight="bold">'
        f'{html.escape(name)}</text>',
    ]
    y = pad + 30
    for i, (kind, label) in enumerate(stages):
        color = COLORS.get(kind, "#fff")
        parts.append(
            f'<rect x="{pad}" y="{y}" width="{box_w}" height="{box_h}" rx="6" '
            f'fill="{color}" stroke="#555"/>')
        parts.append(
            f'<text x="{pad + 12}" y="{y + 24}">{html.escape(label)}</text>')
        if i < len(stages) - 1:
            ax = pad + box_w // 2
            parts.append(
                f'<line x1="{ax}" y1="{y + box_h}" x2="{ax}" y2="{y + box_h + gap}" '
                f'stroke="#555" marker-end="url(#a)"/>')
        y += box_h + gap
    parts.insert(1, '<defs><marker id="a" markerWidth="8" markerHeight="8" '
                    'refX="4" refY="4" orient="auto">'
                    '<path d="M0,0 L8,4 L0,8 z" fill="#555"/></marker></defs>')
    parts.append("</svg>")
    return "\n".join(parts)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="models")
    args = parser.parse_args()
    for name, stages in STAGES.items():
        d = os.path.join(args.out, name)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "architecture.svg")
        with open(path, "w") as f:
            f.write(render(name, stages))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
