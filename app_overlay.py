#!/usr/bin/env python
"""Live window-capture overlay app (optimized frontend).

Parity target: reference app_overlay.py — cross-platform window selection and
capture (macOS Quartz :106-169, Windows pygetwindow :171-203, Linux mss
:205-209), async FrameGrabber thread (:75-103), one-frame-ahead preprocessing
(:301-311), model inference, fused device-side postprocess incl. the RGB->BGR
swap (:379-393), a topmost click-through overlay window (:159-169, 320-322)
that tracks the captured window's position every 50 frames (:405-406), an FPS
counter drawn on the displayed frame (:412-415), and a per-stage timing dump
on Ctrl-C (:421-428).

TPU redesign: the device pipeline is StreamPipeline (stream_lib.py) — jitted
fixed-geometry forward with two frames in flight, uint8-only transfers, and
on-device normalize/clamp/BGR. This file is the host shell: capture, window
management, display.

Headless environments: `python stream.py` runs the same pipeline with the
same report and no cv2/mss dependency.
"""

import argparse
import threading
import time

import numpy as np

from transformerupscaler_tpu.capture import (
    LinuxMssBackend,
    pick_backend,
    select_window,
)
from transformerupscaler_tpu.resolutions import resolutions
from transformerupscaler_tpu.stream_lib import StreamPipeline

try:
    import cv2
except ImportError:
    cv2 = None


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
            if frame is not None:
                with self.lock:
                    self.frame = frame

    def read(self):
        with self.lock:
            return self.frame

    def stop(self):
        self.stopped = True


def run_overlay(args, backend=None, pipe=None, chooser=None, imshow=None,
                max_frames=None):
    """The overlay loop, with every host dependency injectable for tests:
    ``backend`` (capture), ``pipe`` (device pipeline), ``chooser`` (window
    selection), ``imshow`` (display sink)."""
    if backend is None:
        try:
            backend = pick_backend()
        except ImportError as e:
            raise SystemExit(
                f"Screen capture is unavailable in this environment ({e}). "
                "Use `python stream.py` for the headless pipeline with the "
                "same per-stage timing report.")

    if args.region:
        left, top, width, height = (int(v) for v in args.region.split(","))
        target = LinuxMssBackend.region(left, top, width, height)
        if not isinstance(backend, LinuxMssBackend):
            backend = LinuxMssBackend()
    else:
        target = select_window(backend, chooser=chooser)
        print(f"Selected window: {target.title}")
    left, top, width, height = target.bounds
    print(f"Using bounding box: left={left}, top={top}, "
          f"width={width}, height={height}")

    res_in = resolutions[args.res_in] if args.res_in else (720, 1280)
    res_out = resolutions[args.res_out]

    if pipe is None:
        # --fast/--quality are TPU-framework extensions over the reference
        # flag surface (the serving fast path / its worst-frame-bounded
        # quality mode); getattr keeps injected Namespaces working.
        import jax

        fast = getattr(args, "fast", False) or getattr(args, "quality", False)
        pallas = fast and jax.default_backend() == "tpu"
        pipe = StreamPipeline(args.model, res_in, res_out,
                              checkpoint_dir=args.checkpoint_dir,
                              quantize=args.quantize, bgr_out=True,
                              compose_tails=fast, packed_serve=fast,
                              pallas_serve=pallas,
                              serve_quality=getattr(args, "quality", False),
                              attn_impl="fused2" if pallas else "xla")
        print(f"checkpoint loaded: {pipe.from_checkpoint}")
        print(f"compiled in {pipe.warmup():.1f}s")

    grabber = FrameGrabber(lambda: backend.capture(target)).start()

    window_name = "Overlay Upscaled"
    if imshow is None:
        cv2.namedWindow(window_name, cv2.WINDOW_NORMAL)
        cv2.setWindowProperty(window_name, cv2.WND_PROP_TOPMOST, 1)
        time.sleep(0.5)
        if backend.make_click_through(window_name):
            print(f"Overlay window '{window_name}' is click-through.")

        def imshow(frame):
            cv2.imshow(window_name, frame)
            return (cv2.waitKey(1) & 0xFF) != ord("q")

    # Preallocated output buffer (reference :290, :397-399).
    overlay_buf = np.empty((height, width, 3), np.uint8)
    state = {"last": time.time(), "iters": 0, "target": target}
    move_window_interval = 50

    def source():
        while True:
            frame = grabber.read()
            if frame is None:
                time.sleep(0.005)
                continue
            yield frame

    def sink(out_bgr):
        # Track the captured window's position (reference :405-406).
        state["iters"] += 1
        if state["iters"] % move_window_interval == 0:
            state["target"] = backend.refresh_bounds(state["target"])
            if cv2 is not None and imshow.__name__ == "imshow":
                cv2.moveWindow(window_name, state["target"].left,
                               state["target"].top)
        if cv2 is not None and out_bgr.shape[:2] != (height, width):
            cv2.resize(out_bgr, (width, height), dst=overlay_buf)
            frame = overlay_buf
        else:
            frame = np.ascontiguousarray(out_bgr)
        # FPS drawn on the frame that is shown (reference :412-415).
        now = time.time()
        fps = 1.0 / max(now - state["last"], 1e-6)
        state["last"] = now
        if cv2 is not None:
            cv2.putText(frame, f"FPS: {fps:.2f}", (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 255, 0), 2)
        if not imshow(frame):
            raise KeyboardInterrupt

    try:
        pipe.run(source(), sink=sink, max_frames=max_frames)
    except KeyboardInterrupt:
        print("\nKeyboardInterrupt caught. Profiling results:")
        print(pipe.timer.report())
    finally:
        grabber.stop()
        if imshow.__name__ == "imshow" and cv2 is not None:
            cv2.destroyAllWindows()
    return pipe


def main(args):
    if cv2 is None:
        raise SystemExit(
            "OpenCV is not installed — the overlay window is unavailable in "
            "this environment. Use `python stream.py` for the headless "
            "pipeline with the same per-stage timing report.")
    run_overlay(args)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Overlay App for the TPU Transformer Upscaler")
    parser.add_argument("--model", type=str, default="FastTransformer",
                        help="Model name from the registry")
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="Checkpoint dir (default models/{model}/checkpoints)")
    parser.add_argument("--res_out", type=str, default="4k",
                        help="Output resolution key")
    parser.add_argument("--res_in", type=str, default=None,
                        help="Input resolution key (None for 720p)")
    parser.add_argument("--region", type=str, default=None,
                        help="Capture a fixed region 'left,top,width,height' "
                             "instead of selecting a window")
    parser.add_argument("--compile", action="store_true",
                        help="Accepted for reference-CLI parity; jit is always on")
    parser.add_argument("--quantize", action="store_true",
                        help="Enable int8 quantization of linear layers")
    parser.add_argument("--fast", action="store_true",
                        help="TPU serving fast path (composed tails, packed "
                             "pipeline; Pallas kernels on TPU)")
    parser.add_argument("--quality", action="store_true",
                        help="serve_quality mode of the fast path (f32 image "
                             "boundaries, worst-frame-bounded GT delta)")
    main(parser.parse_args())
