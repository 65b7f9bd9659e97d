#!/usr/bin/env bash
# Concatenate the repository's source for pasting into an LLM context.
# Parity: reference tools/repo_out.sh (:1-132).
set -euo pipefail
cd "$(dirname "$0")/.."
{
    echo "# TransformerUpscaler-TPU repository dump"
    echo
    git ls-files '*.py' '*.sh' '*.md' | grep -v '^tests/golden/' | while read -r f; do
        echo "=== $f ==="
        cat "$f"
        echo
    done
} > repo_out.txt
echo "wrote repo_out.txt ($(wc -l < repo_out.txt) lines)"
