#!/usr/bin/env bash
# Crash-only training supervisor: restart training forever.
# Parity: reference tools/infinite_train.sh (restart-on-crash loop); the
# stale EfficientTransformer default is replaced by the flagship.
# train.py auto-resumes from the latest checkpoint on each restart.
MODEL="${1:-FastTransformer}"
shift || true
while true; do
    python train.py --model "$MODEL" "$@"
    code=$?
    if [ $code -eq 1 ]; then
        # exit(1) means the checkpoint already covers the requested epochs
        echo "training complete (checkpoint reached target epochs)"
        break
    fi
    echo "train.py exited with $code; restarting in 5s..."
    sleep 5
done
