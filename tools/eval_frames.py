"""Genuinely held-out evaluation frames for every quality gate.

Every checkpoint in models/ was trained through
``HighresImageDataset(image_dir)`` whose ``__len__`` is the reference's
hardcoded 200 (reference data_handling/data_class.py:47-50) and whose
index mapping is ``image_files[idx // 10]`` over the SORTED file list
(datasets.py:80-85); the batcher draws indices from ``arange(len(ds))``
(data/bucketing.py:40). So training only ever touches
``sorted(files)[:20]`` — the remaining 34 files of the reference
training_set directory were never seen by any checkpoint and are a true
held-out set. ``tests/golden/heldout_manifest.txt`` pins the exact list;
test_data.py asserts both the manifest and the never-indexed property.
"""

import os

TRAINING_SET = "/root/reference/images/training_set"
# 200 (dataset len) // 10 (scale pairs per image): first index never used.
HELDOUT_START = 20
MANIFEST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "golden", "heldout_manifest.txt")


def heldout_paths(image_dir: str = TRAINING_SET, n: int | None = None):
    """Sorted paths of frames the checkpoints never trained on."""
    files = sorted(f for f in os.listdir(image_dir)
                   if f.lower().endswith(".png"))
    held = files[HELDOUT_START:]
    if n is not None:
        held = held[:n]
    return [os.path.join(image_dir, f) for f in held]


def write_manifest(path: str = MANIFEST):
    with open(path, "w") as fh:
        fh.write("# sorted(training_set)[20:]: indices >= 200//10 are never\n"
                 "# reachable through HighresImageDataset's len-200 cap.\n")
        for p in heldout_paths():
            fh.write(os.path.basename(p) + "\n")


if __name__ == "__main__":
    write_manifest()
    print(f"wrote {MANIFEST}: {len(heldout_paths())} frames")
