"""Overlay frontend tests: window-capture backends (with injected fakes),
checkpoint wiring, the FPS-on-displayed-frame path, and window tracking.

These cover the host-only capture stack (reference app_overlay.py:106-235,
320-322, 405-415) without any OS display/capture dependency.
"""

import argparse

import numpy as np
import pytest

from transformerupscaler_tpu.capture import (
    CaptureBackend,
    LinuxMssBackend,
    WindowInfo,
    select_window,
)


class FakeBackend(CaptureBackend):
    name = "fake"

    def __init__(self, n_windows=3, size=(40, 64)):
        self.size = size
        self.windows = [
            WindowInfo(f"win{i}", left=10 * i, top=5 * i,
                       width=size[1], height=size[0], handle=i)
            for i in range(n_windows)
        ]
        self.moved = False
        self.click_through_calls = []

    def list_windows(self):
        return self.windows

    def capture(self, window):
        h, w = self.size
        frame = np.full((h, w, 3), window.handle * 10 + 7, np.uint8)
        return frame

    def refresh_bounds(self, window):
        self.moved = True
        return WindowInfo(window.title, window.left + 1, window.top + 1,
                          window.width, window.height, window.handle)

    def make_click_through(self, overlay_title):
        self.click_through_calls.append(overlay_title)
        return True


def test_select_window_uses_chooser():
    backend = FakeBackend()
    w = select_window(backend, chooser=lambda n: 2)
    assert w.title == "win1"
    with pytest.raises(ValueError):
        select_window(backend, chooser=lambda n: 99)


def test_select_window_empty_list_raises():
    backend = FakeBackend(n_windows=0)
    with pytest.raises(RuntimeError):
        select_window(backend, chooser=lambda n: 1)


def test_mss_region_helper():
    region = LinuxMssBackend.region(5, 6, 100, 50)
    assert region.bounds == (5, 6, 100, 50)
    assert region.handle == {"left": 5, "top": 6, "width": 100, "height": 50}


def test_stream_pipeline_loads_checkpoint_params(tmp_path):
    """A StreamPipeline built the way the frontends build it must carry
    checkpoint params, not random init (round-1 bug: app_overlay.py:88)."""
    import jax
    import jax.numpy as jnp

    from transformerupscaler_tpu.checkpoint import save_checkpoint
    from transformerupscaler_tpu.registry import get_model
    from transformerupscaler_tpu.stream_lib import StreamPipeline

    model = get_model("FastTransformer", dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(7), x, res_out=(32, 32))
    ckpt_dir = tmp_path / "checkpoints"
    save_checkpoint(str(ckpt_dir), 3, variables["params"])

    pipe = StreamPipeline("FastTransformer", res_in=(16, 16), res_out=(32, 32),
                          dtype=jnp.float32, checkpoint_dir=str(ckpt_dir))
    assert pipe.from_checkpoint
    saved = np.asarray(variables["params"]["conv1"]["kernel"])
    loaded = np.asarray(pipe.params["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(loaded, saved)

    # Without a checkpoint dir the pipeline falls back to (flagged) random init.
    pipe2 = StreamPipeline("FastTransformer", res_in=(16, 16), res_out=(32, 32),
                           dtype=jnp.float32,
                           checkpoint_dir=str(tmp_path / "missing"))
    assert not pipe2.from_checkpoint


def test_bgr_out_swaps_channels_on_device():
    import jax.numpy as jnp

    from transformerupscaler_tpu.stream_lib import StreamPipeline

    rgb_pipe = StreamPipeline("BicubicInterpolation", res_in=(8, 8),
                              res_out=(16, 16), dtype=jnp.float32)
    bgr_pipe = StreamPipeline("BicubicInterpolation", res_in=(8, 8),
                              res_out=(16, 16), dtype=jnp.float32,
                              bgr_out=True)
    frame = np.zeros((8, 8, 3), np.uint8)
    frame[..., 0] = 200  # red
    rgb = np.asarray(rgb_pipe._step(rgb_pipe.params, frame))
    bgr = np.asarray(bgr_pipe._step(bgr_pipe.params, frame))
    np.testing.assert_array_equal(rgb[..., 0], bgr[..., 2])
    np.testing.assert_array_equal(rgb[..., 2], bgr[..., 0])


def test_run_overlay_loop_with_fakes():
    """Full app_overlay loop with a fake backend and display: frames flow,
    the FPS text lands on the displayed frame's buffer, window tracking
    fires every 50 iterations, click-through is requested."""
    import jax.numpy as jnp

    import app_overlay
    from transformerupscaler_tpu.stream_lib import StreamPipeline

    backend = FakeBackend(size=(16, 16))
    pipe = StreamPipeline("BicubicInterpolation", res_in=(16, 16),
                          res_out=(32, 32), dtype=jnp.float32, bgr_out=True)
    shown = []

    args = argparse.Namespace(model="BicubicInterpolation",
                              checkpoint_dir=None, res_out="1080",
                              res_in=None, region=None, compile=False,
                              quantize=False)
    app_overlay.run_overlay(
        args, backend=backend, pipe=pipe, chooser=lambda n: 1,
        imshow=lambda f: shown.append(f.copy()) or True, max_frames=55)

    assert len(shown) == 55
    # displayed frames are resized into the captured window's bounds
    # (reference :397-399)
    assert shown[0].shape == (16, 16, 3)
    assert backend.moved  # refresh_bounds hit at iteration 50


def test_run_pipelining_keeps_two_frames_in_flight():
    """run() must dispatch frame i+1 before fetching frame i, and account the
    capture stage (round-1 weakness: capture declared but never accumulated)."""
    import jax.numpy as jnp

    from transformerupscaler_tpu.stream_lib import StreamPipeline

    pipe = StreamPipeline("BicubicInterpolation", res_in=(8, 8),
                          res_out=(16, 16), dtype=jnp.float32)
    frames = [np.full((8, 8, 3), i, np.uint8) for i in range(6)]
    outs = []
    stats = pipe.run(iter(frames), sink=outs.append, max_frames=5)
    assert stats["frames"] == 5
    assert len(outs) == 5
    # Frames arrive in order despite pipelining.
    for i, out in enumerate(outs):
        assert abs(int(out[0, 0, 0]) - int(frames[i][0, 0, 0])) <= 1
    assert pipe.timer.totals["capture"] > 0.0
    assert pipe.timer.totals["inference"] > 0.0


def test_run_overlay_builds_quality_pipe():
    """The pipe-construction branch honors --fast/--quality (TPU-framework
    extensions): serve_quality reaches the FastTransformer pipeline; off-TPU
    the Pallas gate stays closed (packed path only)."""
    import app_overlay

    backend = FakeBackend(size=(16, 32))
    shown = []
    args = argparse.Namespace(model="FastTransformer", checkpoint_dir=None,
                              res_out="720", res_in="360", region=None,
                              compile=False, quantize=False, fast=False,
                              quality=True)
    # res 360->720 is the engine's 2x; keep it tiny by capturing only the
    # construction: patch StreamPipeline to record kwargs and inject a
    # lightweight pipe after.
    built = {}
    orig = app_overlay.StreamPipeline

    class Spy(orig):
        def __init__(self, *a, **kw):
            built.update(kw)
            super().__init__("BicubicInterpolation", (16, 32), (32, 64),
                             bgr_out=True, load_checkpoint=False)

    app_overlay.StreamPipeline = Spy
    try:
        app_overlay.run_overlay(
            args, backend=backend, chooser=lambda n: 1,
            imshow=lambda f: shown.append(True) or True, max_frames=3)
    finally:
        app_overlay.StreamPipeline = orig
    assert built.get("serve_quality") is True
    assert built.get("compose_tails") is True and built.get("packed_serve")
    assert built.get("pallas_serve") is False  # CPU test platform
    assert len(shown) == 3
