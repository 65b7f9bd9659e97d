"""Profiling: live stack sampler + jax.profiler integration.

Parity target: tools/TracebackWindow.py in the reference — a 50 ms stack
sampler over the training thread with per-frame cumulative timing and an
at-exit, time-ordered per-depth summary (TracebackWindow.py:28,43-142),
attached via the ``@traceback_display`` decorator (:148-160). The tkinter UI
is replaced by a headless sampler (same data, printed report); device-side
time belongs to ``jax.profiler`` traces (``train.py --traceback``).
"""

from __future__ import annotations

import collections
import functools
import sys
import threading
import time


class StackSampler:
    """Samples a target thread's Python stack on an interval and accumulates
    per-(depth, frame) wall-clock time."""

    def __init__(self, target_thread_id: int, interval: float = 0.05):
        self.target = target_thread_id
        self.interval = interval
        # (depth, filename, lineno, func) -> cumulative seconds
        self.times: dict = collections.defaultdict(float)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._last = None

    def start(self):
        self._last = time.perf_counter()
        self._thread.start()
        return self

    def _loop(self):
        while not self._stop.is_set():
            time.sleep(self.interval)
            now = time.perf_counter()
            dt, self._last = now - self._last, now
            frames = sys._current_frames()
            frame = frames.get(self.target)
            stack = []
            while frame is not None:
                stack.append(frame)
                frame = frame.f_back
            for depth, f in enumerate(reversed(stack)):
                key = (depth, f.f_code.co_filename, f.f_lineno,
                       f.f_code.co_name)
                self.times[key] += dt

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=1)

    def report(self, top: int = 3) -> str:
        """Time-ordered per-depth summary (TracebackWindow.py:123-142)."""
        by_depth: dict = collections.defaultdict(list)
        for (depth, fname, lineno, func), t in self.times.items():
            by_depth[depth].append((t, fname, lineno, func))
        lines = ["Stack sampling summary (cumulative seconds per frame):"]
        for depth in sorted(by_depth):
            entries = sorted(by_depth[depth], reverse=True)[:top]
            for t, fname, lineno, func in entries:
                short = fname.split("/")[-1]
                lines.append(f"  depth {depth:2d}  {t:8.2f}s  "
                             f"{short}:{lineno} {func}")
        return "\n".join(lines)


def traceback_display(fn):
    """Run ``fn`` under the stack sampler; print the summary when it returns
    (the reference decorator moved the workload to a side thread under a tk
    mainloop — here the sampler is the side thread)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        sampler = StackSampler(threading.get_ident()).start()
        try:
            return fn(*args, **kwargs)
        finally:
            sampler.stop()
            print(sampler.report())

    return wrapped


def trace(logdir: str = "/tmp/tux_trace"):
    """Context manager: capture a jax.profiler device trace (xprof-viewable).
    The device-side complement of the host stack sampler."""
    import jax

    return jax.profiler.trace(logdir)
