#!/usr/bin/env python
"""Live screen-capture overlay app (optimized frontend).

Parity target: reference app_overlay.py — OS screen capture (mss / Quartz /
pygetwindow), async FrameGrabber thread, one-frame-ahead preprocessing, model
inference, topmost click-through OpenCV overlay window with an FPS counter,
and a per-stage timing dump on Ctrl-C.

This is a thin host frontend over StreamPipeline (the TPU-native pipeline
core in transformerupscaler_tpu/stream_lib.py). The display/capture stack
(cv2, mss) is host-only and optional: without it, run `stream.py` for the
headless pipeline with the same per-stage report.
"""

import argparse
import sys
import threading
import time

import numpy as np

from transformerupscaler_tpu.resolutions import resolutions
from transformerupscaler_tpu.stream_lib import StreamPipeline

try:
    import cv2
except ImportError:
    cv2 = None
try:
    import mss
except ImportError:
    mss = None


class FrameGrabber:
    """Latest-frame-wins capture thread (reference app_overlay.py:75-103)."""

    def __init__(self, capture_func):
        self.capture_func = capture_func
        self.frame = None
        self.lock = threading.Lock()
        self.stopped = False
        self.thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self.thread.start()
        return self

    def _loop(self):
        while not self.stopped:
            frame = self.capture_func()
            with self.lock:
                self.frame = frame

    def read(self):
        with self.lock:
            return self.frame

    def stop(self):
        self.stopped = True


def make_capture(region):
    if mss is None:
        raise SystemExit(
            "mss is not installed — screen capture is unavailable in this "
            "environment. Use `python stream.py --source DIR` for the "
            "headless pipeline.")
    sct = mss.mss()

    def capture():
        shot = sct.grab(region)
        return np.asarray(shot)[:, :, :3][:, :, ::-1]  # BGRA -> RGB

    return capture


def main(args):
    if cv2 is None:
        raise SystemExit(
            "OpenCV is not installed — the overlay window is unavailable in "
            "this environment. Use `python stream.py` for the headless "
            "pipeline with the same per-stage timing report.")

    res_in = resolutions[args.res_in] if args.res_in else (720, 1280)
    res_out = resolutions[args.res_out]

    pipe = StreamPipeline(args.model, res_in, res_out, quantize=args.quantize)
    print(f"compiled in {pipe.warmup():.1f}s")

    region = {"left": 0, "top": 0,
              "width": res_in[1], "height": res_in[0]}
    grabber = FrameGrabber(make_capture(region)).start()

    window = "Overlay Upscaled"
    cv2.namedWindow(window, cv2.WINDOW_NORMAL)
    cv2.setWindowProperty(window, cv2.WND_PROP_TOPMOST, 1)

    def source():
        while True:
            frame = grabber.read()
            if frame is None:
                time.sleep(0.005)
                continue
            yield frame

    def sink(out_rgb):
        t0 = time.time()
        bgr = out_rgb[:, :, ::-1]
        fps = 1.0 / max(time.time() - sink.last, 1e-6)
        sink.last = time.time()
        cv2.putText(bgr.copy(), f"FPS: {fps:.2f}", (10, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 255, 0), 2)
        cv2.imshow(window, bgr)
        if cv2.waitKey(1) & 0xFF == ord("q"):
            raise KeyboardInterrupt
        del t0

    sink.last = time.time()

    try:
        pipe.run(source(), sink=sink)
    except KeyboardInterrupt:
        print("\nKeyboardInterrupt caught. Profiling results:")
        print(pipe.timer.report())
    finally:
        grabber.stop()
        cv2.destroyAllWindows()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Overlay App for the TPU Transformer Upscaler")
    parser.add_argument("--model", type=str, default="FastTransformer",
                        help="Model name from the registry")
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--res_out", type=str, default="4k",
                        help="Output resolution key")
    parser.add_argument("--res_in", type=str, default=None,
                        help="Input resolution key (None for 720p)")
    parser.add_argument("--compile", action="store_true",
                        help="Accepted for reference-CLI parity; jit is always on")
    parser.add_argument("--quantize", action="store_true",
                        help="Enable int8 quantization of linear layers")
    main(parser.parse_args())
