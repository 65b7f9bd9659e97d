#!/usr/bin/env python
"""Export a params-only copy of a checkpoint (drops optimizer state) —
for shipping/committing trained weights at ~1/3 the size.

Usage: python tools/export_checkpoint.py SRC_CKPT DST_CKPT
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    src, dst = sys.argv[1], sys.argv[2]

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(src))
    ckptr.save(os.path.abspath(dst), {"params": restored["params"]}, force=True)
    print(f"wrote params-only checkpoint: {dst}")


if __name__ == "__main__":
    main()
