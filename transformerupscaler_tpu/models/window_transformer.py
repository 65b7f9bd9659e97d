"""WindowTransformer: resolution-agnostic Swin-style SR model.

Parity: reference models/WindowTransformer/model.py:172-305.
Pipeline: CNN encoder (2x conv64+ReLU) -> stride-2 downsample -> conv patch
embed k8 s8 -> window transformer blocks (dim 128, 8 heads, ws 8,
dropout 0.01) -> convT patch unembed -> crop-to-min + skip add -> 2-conv
decoder -> bicubic global residual added to bicubic-upscaled input -> clamp.

Layout: NHWC float in [0, 1].
"""

import flax.linen as nn
import jax.numpy as jnp

from transformerupscaler_tpu.models.common import (
    ConvLayer,
    WindowBlock,
    resolve_geometry,
    run_window_trunk,
    _dense_init,
    _bias_init,
)
from transformerupscaler_tpu.ops.patch import patch_embed, patch_unembed
from transformerupscaler_tpu.ops.resize import interpolate_bicubic
from transformerupscaler_tpu.registry import register_model


@register_model("WindowTransformer", "Swin-style window-attention SR, 2.76M params")
class WindowTransformer(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    transformer_dim: int = 128
    num_window_blocks: int = 8
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dropout: float = 0.01
    window_size: int = 8
    patch_size: int = 8
    attn_impl: str = "xla"
    int8_mlp: bool = False
    # Pallas stream kernels for the encoder (serving only): conv1 as
    # im2col dots + conv2 as the row-streamed Pallas conv on the
    # width-2-packed layout (a free reshape of NHWC). Exact same math;
    # gated on base_channels 64 and h % 8 == 0, w % 16 == 0.
    pallas_serve: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        bc, td, ps = self.base_channels, self.transformer_dim, self.patch_size
        self.conv1 = ConvLayer(bc, relu=True, dtype=self.dtype)
        self.conv2 = ConvLayer(bc, relu=True, dtype=self.dtype)
        self.downsample = ConvLayer(bc, stride=2, dtype=self.dtype)
        self.patch_embed_kernel = self.param(
            "patch_embed_kernel", _dense_init, (ps, ps, bc, td))
        self.patch_embed_bias = self.param("patch_embed_bias", _bias_init, (td,))
        self.blocks = [
            WindowBlock(td, self.window_size, self.num_heads, self.mlp_ratio,
                        self.dropout, impl=self.attn_impl,
                        int8_mlp=self.int8_mlp, dtype=self.dtype)
            for _ in range(self.num_window_blocks)
        ]
        self.patch_unembed_kernel = self.param(
            "patch_unembed_kernel", _dense_init, (td, ps, ps, bc))
        self.patch_unembed_bias = self.param("patch_unembed_bias", _bias_init, (bc,))
        self.decoder_conv1 = ConvLayer(bc, relu=True, dtype=self.dtype)
        self.decoder_conv2 = ConvLayer(self.in_channels, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, res_out: tuple[int, int] = (1080, 1920),
                 upscale_factor: int | None = None, require_ratio: bool = True,
                 deterministic: bool = True) -> jnp.ndarray:
        del require_ratio  # accepted but unused, as in the reference (:224-234)
        res_out, _ = resolve_geometry(x.shape[1:3], res_out, upscale_factor)
        x = x.astype(self.dtype)

        upscaled_input = interpolate_bicubic(x, res_out)

        b0, h0, w0 = x.shape[:3]
        if (self.pallas_serve and deterministic
                and not self.is_initializing() and self.base_channels == 64
                and h0 % 8 == 0 and w0 % 16 == 0):
            from transformerupscaler_tpu.ops.conv import conv2d_packed_dots
            from transformerupscaler_tpu.ops.pallas.stream import (
                conv3x3_packed_stream,
            )

            p1 = self.conv1.variables["params"]
            p2 = self.conv2.variables["params"]
            xp = x.reshape(b0, h0, w0 // 2, 2 * x.shape[-1])
            f1 = conv2d_packed_dots(xp, p1["kernel"].astype(self.dtype),
                                    p1["bias"], relu=True)
            featp = conv3x3_packed_stream(f1,
                                          p2["kernel"].astype(self.dtype),
                                          p2["bias"], relu=True)
            feat = featp.reshape(b0, h0, w0, self.base_channels)
        else:
            feat = self.conv2(self.conv1(x))
        feat_down = self.downsample(feat)

        # Patch embed floors non-divisible extents like a strided conv.
        ps = self.patch_size
        hd, wd = feat_down.shape[1:3]
        ht, wt = hd // ps, wd // ps
        tokens = patch_embed(feat_down[:, : ht * ps, : wt * ps, :],
                             self.patch_embed_kernel, self.patch_embed_bias)

        tokens = run_window_trunk(tokens, self.blocks, self.window_size,
                                  deterministic=deterministic)

        feat_trans = patch_unembed(tokens, self.patch_unembed_kernel,
                                   self.patch_unembed_bias)

        # Crop both maps to the common extent before the skip add (:289-294).
        mh = min(hd, feat_trans.shape[1])
        mw = min(wd, feat_trans.shape[2])
        combined = feat_down[:, :mh, :mw, :] + feat_trans[:, :mh, :mw, :]

        dec = self.decoder_conv1(combined)
        residual = self.decoder_conv2(dec)

        residual_up = interpolate_bicubic(residual, res_out)
        out = upscaled_input + residual_up
        return jnp.clip(out, 0.0, 1.0)
