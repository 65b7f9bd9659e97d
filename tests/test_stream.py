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
