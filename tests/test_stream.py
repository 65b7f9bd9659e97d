"""Streaming pipeline and profiling-tool tests."""

import time

import numpy as np

from transformerupscaler_tpu.stream_lib import StageTimer, StreamPipeline
from transformerupscaler_tpu.tools.profiling import StackSampler, traceback_display


def test_stream_pipeline_end_to_end():
    rng = np.random.default_rng(0)
    frames = [(rng.random((32, 48, 3)) * 255).astype(np.uint8) for _ in range(6)]
    import jax.numpy as jnp

    pipe = StreamPipeline("BicubicInterpolation", res_in=(32, 48),
                          res_out=(64, 96), dtype=jnp.float32)
    pipe.warmup()
    outs = []
    stats = pipe.run(iter(frames), sink=outs.append, max_frames=5)
    assert stats["frames"] == 5
    assert outs[0].shape == (64, 96, 3) and outs[0].dtype == np.uint8
    assert "inference" in stats["report"]
    assert stats["fps"] > 0


def test_stream_preprocess_resizes_oversized_frames():
    import jax.numpy as jnp

    pipe = StreamPipeline("BicubicInterpolation", res_in=(16, 16),
                          res_out=(32, 32), dtype=jnp.float32)
    frames = [np.zeros((64, 64, 3), np.uint8)] * 3
    outs = []
    stats = pipe.run(iter(frames), sink=outs.append, max_frames=2)
    assert outs[0].shape == (32, 32, 3)


def test_stage_timer_report():
    t = StageTimer(["a", "b"])
    t.add("a", 1.0)
    t.add("b", 3.0)
    t.iterations = 2
    rep = t.report()
    assert "a: total = 1.0000" in rep
    assert "most time on average: b" in rep


def test_stack_sampler_captures_frames():
    import threading

    sampler = StackSampler(threading.get_ident(), interval=0.01).start()
    deadline = time.time() + 0.3

    def busy():
        while time.time() < deadline:
            sum(range(1000))

    busy()
    sampler.stop()
    rep = sampler.report()
    assert "busy" in rep or "test_stack_sampler" in rep


def test_traceback_display_decorator(capsys):
    @traceback_display
    def workload():
        t0 = time.time()
        while time.time() - t0 < 0.15:
            sum(range(500))
        return 42

    assert workload() == 42
    out = capsys.readouterr().out
    assert "Stack sampling summary" in out


def test_two_in_flight_overlap_beats_serial_sum():
    """Timing proof that run()'s two-frames-in-flight dispatch actually
    overlaps stages (VERDICT r3 #6): with injected per-stage delays —
    capture/sink on the main thread, preprocess in the one-ahead worker,
    and a fake async device that models a SERIAL queue (ready_i =
    max(dispatch_i, ready_{i-1}) + d_dev) whose fetch blocks like a real
    D2H — end-to-end wall must land well under the serial sum of stages
    and near the device-bound floor. Reference overlap pattern:
    app_overlay.py:363-377 (CUDA side-stream)."""
    d_cap, d_pre, d_dev, d_sink = 0.005, 0.020, 0.030, 0.005
    n_frames = 20

    pipe = StreamPipeline("BicubicInterpolation", res_in=(16, 16),
                          res_out=(32, 32), load_checkpoint=False)

    class FakeDeviceArray:
        def __init__(self, ready_at, value):
            self._ready_at = ready_at
            self._value = value

        def __array__(self, dtype=None, copy=None):
            dt = self._ready_at - time.perf_counter()
            if dt > 0:
                time.sleep(dt)
            v = self._value
            return v.astype(dtype) if dtype is not None else v

    queue_free = [0.0]

    def fake_step(params, frame):
        start = max(time.perf_counter(), queue_free[0])
        queue_free[0] = start + d_dev
        return FakeDeviceArray(queue_free[0],
                               np.zeros((32, 32, 3), np.uint8))

    pipe._step = fake_step

    def source():
        for _ in range(n_frames):
            time.sleep(d_cap)
            yield np.zeros((16, 16, 3), np.uint8)

    def preprocess(frame):
        time.sleep(d_pre)
        return frame

    def sink(out):
        time.sleep(d_sink)

    stats = pipe.run(source(), sink=sink, preprocess=preprocess)
    assert stats["frames"] == n_frames - 1  # one-ahead primes on frame 0
    serial_sum = stats["frames"] * (d_cap + d_pre + d_dev + d_sink)
    # Overlap claim: wall well under the serial sum...
    assert stats["wall_s"] < 0.75 * serial_sum, (stats["wall_s"], serial_sum)
    # ...and the device queue really serialized (sanity: no time travel).
    assert stats["wall_s"] > stats["frames"] * d_dev * 0.9


def test_stream_pipeline_serve_quality_mode():
    """serve_quality in the streaming pipeline: FastTransformer gets the
    field + the f32 input normalization (infer_lib in_dt convention);
    other models silently no-op the kwarg."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    frames = [(rng.random((16, 32, 3)) * 255).astype(np.uint8)
              for _ in range(3)]
    pipe = StreamPipeline("FastTransformer", res_in=(16, 32),
                          res_out=(32, 64), dtype=jnp.bfloat16,
                          pallas_serve=True, compose_tails=True,
                          packed_serve=True, serve_quality=True,
                          load_checkpoint=False)
    assert pipe.model.serve_quality
    outs = []
    stats = pipe.run(iter(frames), sink=outs.append, max_frames=2)
    assert outs[0].shape == (32, 64, 3) and outs[0].dtype == np.uint8
    assert stats["frames"] == 2
    # Non-Fast models ignore the kwarg instead of erroring.
    p2 = StreamPipeline("BicubicInterpolation", res_in=(16, 16),
                        res_out=(32, 32), dtype=jnp.float32,
                        serve_quality=True)
    assert not hasattr(p2.model, "serve_quality")
