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
                 compose_tails: bool = False):
        self.model = get_model(model_name, dtype=dtype, attn_impl=attn_impl,
                               compose_tails=compose_tails)
        self.model_name = model_name
        self.res_in = res_in
        self.res_out = res_out
        self.dtype = dtype

        x = jnp.zeros((1, *res_in, 3), dtype)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(0), x, res_out=res_out)
        if quantize:
            from transformerupscaler_tpu.ops.quant import quantize_linear_params

            params = quantize_linear_params(params)
        self.params = params

        def step(p, frame_u8):
            # uint8 H2D (smallest transfer), normalize + upscale + quantize
            # back to uint8 entirely on device.
            xin = frame_u8.astype(dtype) / jnp.asarray(255.0, dtype)
            kwargs = {"res_out": res_out}
            if model_name != "BicubicInterpolation":
                kwargs["require_ratio"] = True
            out = self.model.apply(p, xin[None], **kwargs)[0]
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
        """Drive the pipeline.

        source: iterator of HWC uint8 frames (any size); preprocess defaults
        to a center-crop/resize to res_in. sink: callable(frame_u8_np) or
        None. Returns summary stats.
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

        pre_future = None
        n = 0
        t_loop = time.perf_counter()
        try:
            for frame in source:
                iter_start = time.perf_counter()

                t0 = time.perf_counter()
                # one-frame-ahead preprocessing (reference :350-357)
                if pre_future is None:
                    pre_future = executor.submit(preprocess, frame)
                    continue
                ready = pre_future.result()
                pre_future = executor.submit(preprocess, frame)
                timer.add("preprocess", time.perf_counter() - t0)

                t0 = time.perf_counter()
                out_dev = self._step(self.params, jnp.asarray(ready))
                timer.add("inference", time.perf_counter() - t0)

                t0 = time.perf_counter()
                out_np = np.asarray(out_dev)
                timer.add("postprocess", time.perf_counter() - t0)

                t0 = time.perf_counter()
                if sink is not None:
                    sink(out_np)
                timer.add("display", time.perf_counter() - t0)

                timer.iterations += 1
                n += 1
                fps_hist.append(1.0 / max(time.perf_counter() - iter_start, 1e-9))
                if max_frames is not None and n >= max_frames:
                    break
        finally:
            executor.shutdown(wait=False)

        wall = time.perf_counter() - t_loop
        return {
            "frames": n,
            "wall_s": wall,
            "fps": n / wall if wall > 0 else 0.0,
            "report": self.timer.report(),
        }
