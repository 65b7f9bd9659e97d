#!/usr/bin/env python
"""Simple live overlay (the minimal variant).

Parity target: reference overlay.py — mss screen-region capture -> 720p ->
model -> 1080p OpenCV topmost window with an FPS counter (overlay.py:69-92).
(The reference file is stale: it imports a nonexistent HighFreqTransformer;
this version defaults to FastTransformer.)

Thin frontend over StreamPipeline; requires cv2 + mss on the host. Headless
environments: use `python stream.py`.
"""

import argparse
import time

import numpy as np

from transformerupscaler_tpu.stream_lib import StreamPipeline

try:
    import cv2
    import mss
except ImportError:
    cv2 = mss = None


def main(args):
    if cv2 is None or mss is None:
        raise SystemExit(
            "cv2/mss not installed — use `python stream.py` for the headless "
            "pipeline.")

    res_in, res_out = (720, 1280), (1080, 1920)
    # bgr_out fuses the RGB->BGR swap for cv2 into the on-device postprocess
    # (reference app_overlay.py:379-393); the latest checkpoint is loaded by
    # the pipeline (random weights would silently produce garbage).
    pipe = StreamPipeline(args.model, res_in, res_out,
                          checkpoint_dir=args.checkpoint_dir, bgr_out=True)
    print(f"checkpoint loaded: {pipe.from_checkpoint}")
    print(f"compiled in {pipe.warmup():.1f}s")

    sct = mss.mss()
    region = {"left": 0, "top": 0, "width": res_in[1], "height": res_in[0]}

    window = "Upscaled"
    cv2.namedWindow(window, cv2.WINDOW_NORMAL)
    cv2.setWindowProperty(window, cv2.WND_PROP_TOPMOST, 1)

    def source():
        while True:
            yield np.asarray(sct.grab(region))[:, :, :3][:, :, ::-1]

    last = [time.time()]

    def sink(out_bgr):
        # already BGR uint8 from the device; draw the FPS counter on the
        # frame that is shown (reference overlay.py:84-87)
        bgr = np.ascontiguousarray(out_bgr)
        fps = 1.0 / max(time.time() - last[0], 1e-6)
        last[0] = time.time()
        cv2.putText(bgr, f"FPS: {fps:.2f}", (10, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 255, 0), 2)
        cv2.imshow(window, bgr)
        if cv2.waitKey(1) & 0xFF == ord("q"):
            raise KeyboardInterrupt

    try:
        pipe.run(source(), sink=sink)
    except KeyboardInterrupt:
        pass
    finally:
        cv2.destroyAllWindows()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Simple live overlay upscaler")
    parser.add_argument("--model", type=str, default="FastTransformer")
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    main(parser.parse_args())
