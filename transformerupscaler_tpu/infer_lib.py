"""Inference engine: jit-cached, geometry-bucketed upscaling.

The reference runs eager per-image forwards (inference.py:117-122,
speed_test.py:60-67). On TPU every distinct (input geometry, res_out, scale,
require_ratio) tuple is one compiled executable; this engine jits each
geometry once and reuses it — the jit cache is the TPU-native analogue of
``torch.compile`` (the reference's --compile flag maps to "always on").
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from transformerupscaler_tpu.checkpoint import (
    default_checkpoint_dir,
    get_latest_checkpoint,
    load_checkpoint,
    param_count,
)
from transformerupscaler_tpu.registry import get_model


class UpscalerEngine:
    """Wraps a registry model with checkpoint loading and a per-geometry jit
    cache.

    Images are NHWC (or HWC) float in [0, 1]; uint8 input is normalized.
    """

    def __init__(self, model_name: str, checkpoint_dir: str | None = None,
                 params=None, dtype=jnp.float32, attn_impl: str = "xla",
                 quantize: bool = False, root: str = ".", donate: bool = False,
                 compose_tails: bool = False, int8_mlp: bool = False,
                 pallas_serve: bool = False, packed_serve: bool = False,
                 int8_serve: bool = False, int8_scope: str = "full",
                 int8_trunk: bool = False, serve_quality: bool = False,
                 quality_parts: str = "tails", split_tail: bool | None = None,
                 f32_tail: bool = False, fold_pre: bool = True,
                 hi_lo_fin: str | None = None):
        self.model_name = model_name
        # int8_serve runs inside the packed fast path; imply its gate.
        compose_tails = compose_tails or int8_serve
        # split_tail/f32_tail/fold_pre/hi_lo_fin are FastTransformer
        # serving-routing fields (get_model drops unknown fields for the
        # other variants). None/default = the model's measured auto
        # routing; the TUX_* env vars remain trace-time debug overrides.
        self._model_kwargs = dict(
            dtype=dtype, attn_impl=attn_impl, compose_tails=compose_tails,
            int8_mlp=int8_mlp, pallas_serve=pallas_serve,
            packed_serve=packed_serve, int8_serve=int8_serve,
            int8_scope=int8_scope, int8_trunk=int8_trunk,
            split_tail=split_tail, f32_tail=f32_tail, fold_pre=fold_pre,
            hi_lo_fin=hi_lo_fin)
        # serve_quality is a FastTransformer-only field; other models don't
        # define it (and it implies keeping the INPUT f32 — see upscale).
        self._serve_quality = serve_quality and model_name == "FastTransformer"
        if self._serve_quality:
            self._model_kwargs["serve_quality"] = True
            self._model_kwargs["quality_parts"] = quality_parts
        self.model = get_model(model_name, **self._model_kwargs)
        # The no-baked-scales model: calibration passes sow DYNAMIC scales
        # through this even after static scales are baked into self.model.
        self._base_model = self.model
        self.dtype = dtype
        self._donate = donate
        self._cache: dict = {}
        self._warned_fast_gate = False

        if params is None:
            ckpt_dir = checkpoint_dir or default_checkpoint_dir(model_name, root)
            try:
                path, self.epoch = get_latest_checkpoint(ckpt_dir)
                self.checkpoint_path = path
                restored = load_checkpoint(path, model_name)
                params = {"params": restored["params"]}
            except FileNotFoundError:
                self.checkpoint_path = None
                self.epoch = 0
                params = None  # random init at first call
        self._params = params

        if quantize and self._params is not None:
            from transformerupscaler_tpu.ops.quant import quantize_linear_params

            self._params = quantize_linear_params(self._params)

    # ------------------------------------------------------------------
    def _ensure_params(self, x: jnp.ndarray, call_kwargs: dict):
        if self._params is None:
            self._params = self.model.init(jax.random.PRNGKey(0), x, **call_kwargs)

    def param_count(self) -> int:
        if self._params is None:
            return 0
        return param_count(self._params)

    def _fn(self, key):
        if key not in self._cache:
            res_out, upscale_factor, require_ratio = key

            def apply(params, x):
                kwargs = {}
                if res_out is not None:
                    kwargs["res_out"] = res_out
                if upscale_factor is not None:
                    kwargs["upscale_factor"] = upscale_factor
                if self.model_name != "BicubicInterpolation":
                    kwargs["require_ratio"] = require_ratio
                return self.model.apply(params, x, **kwargs)

            donate = (1,) if self._donate else ()
            self._cache[key] = jax.jit(apply, donate_argnums=donate)
        return self._cache[key]

    def _warn_if_fast_gate_misses(self, x_shape, res_out, upscale_factor):
        """--fast/--int8 silently fall back to the plain compose path for
        unsupported geometries; surface that once so CLI users know the flag
        did nothing (packed gate: fast_transformer.py __call__)."""
        if not (self._model_kwargs.get("packed_serve")
                or self._model_kwargs.get("int8_serve")):
            return
        if self.model_name != "FastTransformer" or self._warned_fast_gate:
            return
        from transformerupscaler_tpu.models.common import resolve_geometry

        h, w = x_shape[1:3]
        _, scale = resolve_geometry((h, w), res_out, upscale_factor)
        if scale in (2, 3, 4, 6) and h % 8 == 0 and w % 16 == 0:
            return
        self._warned_fast_gate = True
        import warnings

        warnings.warn(
            f"fast/int8 serving path requires scale in {{2,3,4,6}} with "
            f"input h % 8 == 0 and w % 16 == 0; got {h}x{w} at scale "
            f"{scale} — falling back to the plain (bf16, unquantized) "
            f"compose path for this geometry.", stacklevel=3)

    def _normalize_call(self, x_shape, res_out, upscale_factor):
        # Bicubic takes only res_out (reference BicubicInterpolation/model.py:17);
        # resolve a scale to a concrete res_out for it.
        if self.model_name == "BicubicInterpolation" and upscale_factor is not None:
            h, w = x_shape[1:3]
            return (h * upscale_factor, w * upscale_factor), None
        return res_out, upscale_factor

    def upscale(self, image: np.ndarray, res_out=None, upscale_factor=None,
                require_ratio: bool = True, device_out: bool = False):
        """Upscale HWC or NHWC image(s); returns the same rank back."""
        squeeze = image.ndim == 3
        x = np.asarray(image)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        if squeeze:
            x = x[None]
        # serve_quality consumes the UNROUNDED f32 input (the model's exact
        # conv1 splits it hi/lo); everything downstream still runs bf16.
        in_dt = jnp.float32 if self._serve_quality else self.dtype
        xj = jnp.asarray(x, dtype=in_dt)

        res_out, upscale_factor = self._normalize_call(xj.shape, res_out, upscale_factor)
        self._warn_if_fast_gate_misses(xj.shape, res_out, upscale_factor)
        key = (tuple(res_out) if res_out is not None else None,
               upscale_factor, require_ratio)
        init_kwargs = {}
        if res_out is not None:
            init_kwargs["res_out"] = tuple(res_out)
        if upscale_factor is not None:
            init_kwargs["upscale_factor"] = upscale_factor
        self._ensure_params(xj, init_kwargs)

        out = self._fn(key)(self._params, xj)
        if device_out:
            return out[0] if squeeze else out
        out = np.asarray(jax.device_get(out)).astype(np.float32)
        return out[0] if squeeze else out

    def _dynamic_scale_pass(self, image, res_out, upscale_factor,
                            require_ratio):
        """One dynamic-quant forward; returns the sown per-tensor activation
        scale arrays keyed by name."""
        x = np.asarray(image)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        if x.ndim == 3:
            x = x[None]
        xj = jnp.asarray(x, dtype=self.dtype)
        res_out, upscale_factor = self._normalize_call(xj.shape, res_out,
                                                       upscale_factor)
        kwargs = {}
        if res_out is not None:
            kwargs["res_out"] = tuple(res_out)
        if upscale_factor is not None:
            kwargs["upscale_factor"] = upscale_factor
        kwargs["require_ratio"] = require_ratio
        self._ensure_params(xj, kwargs)
        # Jitted with a per-geometry cache: the unjitted apply dispatches
        # op-by-op, which is pathological through the tunneled backend
        # (~25 ms RPC per op).
        ck = ("dyn_scales", tuple(sorted(kwargs.items())))
        if ck not in self._cache:
            self._cache[ck] = jax.jit(
                lambda pp, v: self._base_model.apply(
                    pp, v, **kwargs, mutable=["intermediates"]))
        _, inter = self._cache[ck](self._params, xj)
        raw = inter["intermediates"]
        if not any(k.startswith("int8_scale_") for k in raw):
            raise RuntimeError(
                "calibrate_int8: the calibration forward sowed no activation "
                "scales — the frame's geometry missed the packed int8 gate "
                f"(input {tuple(xj.shape[1:3])}, res_out={res_out}, "
                f"upscale_factor={upscale_factor}). The packed path requires "
                "a supported scale with h % patch_size == 0 and w % 16 == 0; "
                "calibrate with a frame/geometry that will actually serve, "
                "or baked placeholder scales would silently wreck quality.")
        return {k[len("int8_scale_"):]: np.asarray(v[0], np.float64)
                for k, v in raw.items() if k.startswith("int8_scale_")}

    def calibrate_int8(self, images, res_out=None,
                       upscale_factor=None, require_ratio: bool = True,
                       margin: float = 1.25,
                       floor_frac: float = 0.02) -> tuple:
        """Static int8 activation calibration (int8_serve engines only).

        Runs a dynamic-quant forward over each calibration frame (a single
        HWC/NHWC array or a list of frames — use >=10 DIVERSE frames: a
        single-frame calibration silently clips on brighter scenes), takes
        the per-channel maximum of the sown activation scales across frames,
        pads by ``margin``, and rebuilds the model with the scales baked in
        as trace-time constants — the quantize steps then fuse into the
        producer conv epilogues instead of costing an abs-max pass each.
        Returns the scale tuple; ``calibration_check`` reports clip risk on
        held-out frames.
        """
        if isinstance(images, np.ndarray) and images.ndim == 4:
            frames = list(images)
        elif isinstance(images, (list, tuple)):
            frames = list(images)
        else:
            frames = [images]
        acc: dict = {}
        for f in frames:
            got = self._dynamic_scale_pass(f, res_out, upscale_factor,
                                           require_ratio)
            for k, v in got.items():
                acc[k] = np.maximum(acc[k], v) if k in acc else v
        # Dead-channel floor: a channel that never fired on the calibration
        # frames gets a near-zero scale and then clips catastrophically the
        # first time a scene activates it (measured: dynamic/static ratios
        # in the 1e6 range on held-out frames). Floor each channel's scale
        # at floor_frac of the group's largest channel scale.
        self._calib_scales = {
            k: np.maximum(v, floor_frac * v.max()) * margin
            for k, v in acc.items()}
        self._calib_frames = len(frames)

        def grab(n):
            # "residual" scope never quantizes some tensors; placeholder 1.0
            # keeps tuple indices stable.
            if n not in self._calib_scales:
                return (1.0,)
            return tuple(self._calib_scales[n].tolist())

        scales = tuple(grab(n)
                       for n in ("feat1", "feat", "combined", "dec", "tokens"))
        self.model = get_model(self.model_name,
                               **{**self._model_kwargs,
                                  "int8_scales": scales})
        self._cache.clear()
        return scales

    def gptq_int8(self, images, scale: int = 2, n_samples: int = 32768,
                  crop: int = 256, bias_correct: bool = True) -> None:
        """GPTQ the image-branch conv weights against calibration frames
        (full-scope int8 engines; run AFTER calibrate_int8 — the static
        activation scales are folded into the quantized kernels).

        Computes conv1/conv2 input activations on the CPU from ``crop``-
        sized center crops of the frames, builds input Hessians, and bakes
        error-compensated int8 kernels + corrected biases for conv1, conv2,
        and the composed branch-A tail of ``scale`` into the model
        (ops/gptq.py). Entries for other scales fall back to trace-time
        abs-max quantization.
        """
        if not getattr(self, "_calib_scales", None) or \
                "feat1" not in self._calib_scales:
            raise RuntimeError(
                "gptq_int8 requires calibrate_int8 on a FULL-scope "
                "int8_serve engine first (needs feat1/feat scales)")
        import jax as _jax

        from transformerupscaler_tpu.models.upsampler import (
            composed_tail_kernel,
        )
        from transformerupscaler_tpu.ops.conv import conv2d
        from transformerupscaler_tpu.ops.gptq import quantize_conv_gptq

        p = self._params["params"]
        if not isinstance(images, (list, tuple)):
            images = [images]
        cpu = _jax.devices("cpu")[0]
        xs, f1s, fps = [], [], []
        with _jax.default_device(cpu):
            k1 = jnp.asarray(np.asarray(p["conv1"]["kernel"]), jnp.float32)
            b1 = jnp.asarray(np.asarray(p["conv1"]["bias"]), jnp.float32)
            k2 = jnp.asarray(np.asarray(p["conv2"]["kernel"]), jnp.float32)
            b2 = jnp.asarray(np.asarray(p["conv2"]["bias"]), jnp.float32)
            for img in images:
                x = np.asarray(img)
                if x.dtype == np.uint8:
                    x = x.astype(np.float32) / 255.0
                h, w = x.shape[:2]
                y0 = max(0, (h - crop) // 2)
                x0 = max(0, (w - crop) // 2)
                x = x[y0:y0 + crop, x0:x0 + crop][None]
                xj = jnp.asarray(x, jnp.float32)
                f1 = conv2d(xj, k1, b1, relu=True, auto_macro=False)
                fp = conv2d(f1, k2, b2, relu=True, auto_macro=False)
                xs.append(x)
                f1s.append(np.asarray(f1))
                fps.append(np.asarray(fp))
        xcat = np.concatenate(xs)
        f1cat = np.concatenate(f1s)
        fpcat = np.concatenate(fps)

        s_f1 = self._calib_scales["feat1"]
        s_f = self._calib_scales["feat"]
        ka, ba = composed_tail_kernel(
            {k: jnp.asarray(np.asarray(v), jnp.float32)
             for k, v in p["up1"].items()},
            scale,
            jnp.asarray(np.asarray(p["up1_conv_kernel"]), jnp.float32),
            None, jnp.float32)
        ka = np.asarray(ka)
        ba = np.asarray(ba) if ba is not None else None

        entries = []
        for name, kern, bias, feat, s_in in (
                ("conv1", np.asarray(p["conv1"]["kernel"]),
                 np.asarray(p["conv1"]["bias"]), xcat, 1.0 / 127),
                ("conv2", np.asarray(p["conv2"]["kernel"]),
                 np.asarray(p["conv2"]["bias"]), f1cat, s_f1),
                (f"tailA_s{scale}", ka, ba, fpcat, s_f)):
            kq, ks, nb = quantize_conv_gptq(
                kern, feat, s_in, n_samples=n_samples,
                bias=bias if bias_correct else None)
            entries.append((name, kq.shape, kq.tobytes(), ks.tobytes(),
                            None if nb is None else nb.tobytes()))

        self.model = get_model(
            self.model_name,
            **{**self._model_kwargs,
               "int8_scales": self.model.int8_scales,
               "int8_weights": tuple(entries)})
        self._cache.clear()

    def calibration_check(self, image, res_out=None, upscale_factor=None,
                          require_ratio: bool = True) -> dict:
        """Clip-risk report for a held-out frame against the baked scales.

        For each quantized tensor, compares the frame's dynamic per-channel
        scale against the calibrated static scale: ratio > 1 means values on
        that channel exceed the int8 range and clip. Returns
        {name: {"max_ratio": r, "clip_channel_frac": f}} — max_ratio <= 1
        everywhere means the calibration covers this frame with margin.
        """
        if not getattr(self, "_calib_scales", None):
            raise RuntimeError("calibration_check requires calibrate_int8 "
                               "to have run first")
        got = self._dynamic_scale_pass(image, res_out, upscale_factor,
                                       require_ratio)
        report = {}
        for k, dyn in got.items():
            static = self._calib_scales[k]
            ratio = dyn / np.maximum(static, 1e-12)
            report[k] = {"max_ratio": float(ratio.max()),
                         "clip_channel_frac": float((ratio > 1.0).mean())}
        return report

    def warmup(self, in_hw: tuple[int, int], res_out=None, upscale_factor=None,
               require_ratio: bool = True, batch: int = 1) -> float:
        """Compile a geometry ahead of use; returns compile seconds."""
        x = np.zeros((batch, *in_hw, 3), np.float32)
        t0 = time.perf_counter()
        y = self.upscale(x, res_out=res_out, upscale_factor=upscale_factor,
                         require_ratio=require_ratio, device_out=True)
        jax.block_until_ready(y)
        return time.perf_counter() - t0
