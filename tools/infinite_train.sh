#!/usr/bin/env bash
# Crash-only training supervisor: restart training forever.
# Parity: reference tools/infinite_train.sh (restart-on-crash loop); the
# stale EfficientTransformer default is replaced by the flagship.
# train.py auto-resumes from the latest checkpoint on each restart;
# exit 3 = checkpoint already covers the requested epochs (a crash exits 1
# and must restart, not stop).
MODEL="${1:-FastTransformer}"
shift || true
while true; do
    python train.py --model "$MODEL" "$@"
    code=$?
    if [ $code -eq 3 ]; then
        # exit(1) means the checkpoint already covers the requested epochs
        echo "training complete (checkpoint reached target epochs)"
        break
    fi
    echo "train.py exited with $code; restarting in 5s..."
    sleep 5
done
