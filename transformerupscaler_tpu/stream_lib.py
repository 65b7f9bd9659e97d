"""Streaming upscale pipeline: the TPU-native successor of the reference's
live overlay loop.

Parity target: app_overlay.py's optimized pipeline (reference
app_overlay.py:213-432) — async frame capture, one-frame-ahead preprocessing,
device-side postprocess, per-stage wall-clock accumulators dumped on stop
(:324-333, 421-428). Screen capture and the on-screen window are host
concerns (see overlay.py / app_overlay.py frontends); this module is the
headless core: a double-buffered loop that overlaps host preprocessing and
H2D transfer with device compute.

TPU redesign:
  - the model runs jitted at a fixed geometry (one compile, reused forever)
  - postprocessing (x255, clamp, uint8) is fused on device; only the final
    uint8 frame crosses back to host (4x less D2H than f32)
  - preprocessing runs in a worker thread one frame ahead (the reference's
    ThreadPoolExecutor(1) pattern), while the device computes frame i
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from transformerupscaler_tpu.registry import get_model


class StageTimer:
    """Per-stage wall-clock accumulators (reference app_overlay.py:324-333)."""

    def __init__(self, stages):
        self.totals = {s: 0.0 for s in stages}
        self.iterations = 0

    def add(self, stage: str, dt: float):
        self.totals[stage] += dt

    def report(self) -> str:
        lines = []
        it = max(self.iterations, 1)
        for step, total in self.totals.items():
            lines.append(f"{step}: total = {total:.4f} sec, "
                         f"average per iteration = {total / it:.4f} sec")
        max_step = max(self.totals, key=lambda k: self.totals[k])
        lines.append(f"Step that took the most time on average: {max_step} "
                     f"({self.totals[max_step] / it:.4f} sec per iteration)")
        return "\n".join(lines)


class StreamPipeline:
    def __init__(self, model_name: str, res_in: tuple[int, int],
                 res_out: tuple[int, int], params=None, dtype=jnp.bfloat16,
                 attn_impl: str = "xla", quantize: bool = False,
                 compose_tails: bool = False, checkpoint_dir: str | None = None,
                 bgr_out: bool = False, load_checkpoint: bool = True,
                 int8_mlp: bool = False, pallas_serve: bool = False,
                 packed_serve: bool = False, int8_serve: bool = False,
                 int8_scope: str = "full", int8_trunk: bool = False,
                 serve_quality: bool = False):
        compose_tails = compose_tails or int8_serve  # int8 implies its gate
        # serve_quality is a FastTransformer field (f32 image boundaries on
        # the bf16 fast path); silently a no-op elsewhere, like infer_lib.
        serve_quality = serve_quality and model_name == "FastTransformer"
        extra = {"serve_quality": True} if serve_quality else {}
        self.model = get_model(model_name, dtype=dtype, attn_impl=attn_impl,
                               compose_tails=compose_tails, int8_mlp=int8_mlp,
                               pallas_serve=pallas_serve,
                               packed_serve=packed_serve,
                               int8_serve=int8_serve, int8_scope=int8_scope,
                               int8_trunk=int8_trunk, **extra)
        self.model_name = model_name
        self.res_in = res_in
        self.res_out = res_out
        self.dtype = dtype
        self.bgr_out = bgr_out

        if params is None and load_checkpoint:
            # The reference loads the latest checkpoint in every live frontend
            # (app_overlay.py:261-271); serving random weights is a bug.
            from transformerupscaler_tpu.checkpoint import load_latest_params

            params = load_latest_params(model_name, checkpoint_dir)
        self.from_checkpoint = params is not None
        if params is None:
            x = jnp.zeros((1, *res_in, 3), dtype)
            params = self.model.init(jax.random.PRNGKey(0), x, res_out=res_out)
        if quantize:
            from transformerupscaler_tpu.ops.quant import quantize_linear_params

            params = quantize_linear_params(params)
        self.params = params

        # serve_quality consumes the UNROUNDED f32 normalization (its exact
        # conv1 / f32 boundaries read the pre-bf16-cast image, infer_lib
        # in_dt convention); uint8/255 in f32 is exact.
        in_dt = jnp.float32 if serve_quality else dtype

        def step(p, frame_u8):
            # uint8 H2D (smallest transfer), normalize + upscale + quantize
            # back to uint8 entirely on device. The optional RGB->BGR swap for
            # cv2 display also runs on device (reference fuses it the same
            # way, app_overlay.py:60-71, 379-393).
            xin = frame_u8.astype(in_dt) / jnp.asarray(255.0, in_dt)
            kwargs = {"res_out": res_out}
            if model_name != "BicubicInterpolation":
                kwargs["require_ratio"] = True
            out = self.model.apply(p, xin[None], **kwargs)[0]
            if bgr_out:
                out = out[..., ::-1]
            return jnp.clip(out * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

        self._step = jax.jit(step)
        self.timer = StageTimer(
            ["capture", "preprocess", "inference", "postprocess", "display"])

    def warmup(self) -> float:
        t0 = time.perf_counter()
        out = self._step(self.params, jnp.zeros((*self.res_in, 3), jnp.uint8))
        np.asarray(out[0, 0])  # force completion through the RPC boundary
        return time.perf_counter() - t0

    def run(self, source, sink=None, max_frames: int | None = None,
            preprocess=None) -> dict:
        """Drive the pipeline with two frames in flight on the device.

        source: iterator of HWC uint8 frames (any size); preprocess defaults
        to a center-crop/resize to res_in. sink: callable(frame_u8_np) or
        None. Returns summary stats.

        Pipelining (the TPU analogue of the reference's CUDA side-stream
        overlap, app_overlay.py:293, 363-377): frame i+1 is dispatched before
        frame i's output is fetched, so D2H of i overlaps compute of i+1 and
        host stages overlap device work.

        Stage accounting (honest under the async dispatch model):
          capture     time pulling the next frame from the source
          preprocess  wait for the one-ahead preprocess worker
          inference   dispatch of frame i -> frame i's result fetched, i.e.
                      true device latency incl. D2H (host work in between
                      overlaps, so stage sums may exceed wall-clock)
          postprocess time *blocked* in the device fetch (the non-overlapped
                      part of inference)
          display     sink callback
        """
        from transformerupscaler_tpu import native

        def default_preprocess(frame):
            if frame.shape[:2] != self.res_in:
                # Native C++ resize when built (native/resize.cpp);
                # PIL-identical semantics, threaded on multi-core hosts.
                frame = native.resize_bilinear_u8(frame, self.res_in)
            return frame

        preprocess = preprocess or default_preprocess
        executor = ThreadPoolExecutor(max_workers=1)
        timer = self.timer
        fps_hist = []

        def finish(pending):
            """Fetch a dispatched frame, account stages, hand to sink."""
            out_dev, t_dispatch = pending
            t0 = time.perf_counter()
            out_np = np.asarray(out_dev)
            t1 = time.perf_counter()
            timer.add("postprocess", t1 - t0)
            timer.add("inference", t1 - t_dispatch)
            t0 = time.perf_counter()
            if sink is not None:
                sink(out_np)
            timer.add("display", time.perf_counter() - t0)
            timer.iterations += 1

        pre_future = None
        pending = None  # (device array, dispatch timestamp) of frame i-1
        n = 0
        t_loop = time.perf_counter()
        src = iter(source)
        try:
            while max_frames is None or n < max_frames:
                iter_start = time.perf_counter()
                t0 = time.perf_counter()
                frame = next(src, None)
                if frame is None:
                    break
                timer.add("capture", time.perf_counter() - t0)

                t0 = time.perf_counter()
                # one-frame-ahead preprocessing (reference :350-357)
                if pre_future is None:
                    pre_future = executor.submit(preprocess, frame)
                    continue
                ready = pre_future.result()
                pre_future = executor.submit(preprocess, frame)
                timer.add("preprocess", time.perf_counter() - t0)

                # Dispatch frame i, then retire frame i-1: its D2H overlaps
                # this frame's device compute.
                t_dispatch = time.perf_counter()
                out_dev = self._step(self.params, jnp.asarray(ready))
                if pending is not None:
                    finish(pending)
                pending = (out_dev, t_dispatch)
                n += 1
                fps_hist.append(1.0 / max(time.perf_counter() - iter_start, 1e-9))
            if pending is not None:
                finish(pending)
                pending = None
        finally:
            executor.shutdown(wait=False)

        wall = time.perf_counter() - t_loop
        return {
            "frames": n,
            "wall_s": wall,
            "fps": n / wall if wall > 0 else 0.0,
            "report": self.timer.report(),
        }
