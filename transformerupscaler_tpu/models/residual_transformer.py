"""ResidualTransformer: global-attention SR model with a fixed 720p geometry.

Parity: reference models/ResidualTransformer/model.py:53-165.
Pipeline: encoder 2x conv64 -> stride-2 downsample -> conv patch embed k8 s8
(45x80 = 3600 tokens at 720p) -> learned absolute pos_embed (1, 3600, 128) ->
8 global nn.MultiheadAttention blocks -> convT unembed -> skip add -> 2-conv
decoder -> bicubic residual + bicubic-upscaled input -> clamp.

Like the reference, the positional embedding is baked to the 720x1280 input
geometry — the model is NOT resolution-agnostic.
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformerupscaler_tpu.models.common import (
    ConvLayer,
    resolve_geometry,
    _dense_init,
    _bias_init,
)
from transformerupscaler_tpu.ops.attention import multihead_attention
from transformerupscaler_tpu.ops.patch import patch_embed, patch_unembed
from transformerupscaler_tpu.ops.resize import interpolate_bicubic
from transformerupscaler_tpu.registry import register_model


class GlobalAttentionBlock(nn.Module):
    """Pre-LN global MHA + pre-LN MLP block.

    Parity: reference TransformerBlock (ResidualTransformer/model.py:22-50)
    built on ``nn.MultiheadAttention(batch_first=True)``.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d = self.dim
        in_w = self.param("in_kernel", _dense_init, (d, 3 * d))
        in_b = self.param("in_bias", _bias_init, (3 * d,))
        out_w = self.param("out_kernel", _dense_init, (d, d))
        out_b = self.param("out_bias", _bias_init, (d,))
        rng = None
        if not deterministic and self.dropout > 0.0:
            rng = self.make_rng("dropout")
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + multihead_attention(
            y.astype(self.dtype), in_w.astype(self.dtype), in_b,
            out_w.astype(self.dtype), out_b, num_heads=self.num_heads,
            dropout_rate=self.dropout, deterministic=deterministic, rng=rng,
            impl=self.attn_impl,
        )
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.dropout, name="mlp_drop")(y, deterministic=deterministic)
        return x + y


@register_model("ResidualTransformer", "global-attention SR, fixed 720p, 3.21M params")
class ResidualTransformer(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    transformer_dim: int = 128
    num_transformer_blocks: int = 8
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    patch_size: int = 8
    token_hw: tuple[int, int] = (45, 80)  # 720p -> downsample -> /8
    # All-XLA packed serving path (same design as FastTransformer's
    # packed_serve): every conv/embed rides the width-2-packed layout, and
    # both bicubic branches run as exact block-packed convs
    # (ops/resize.bicubic_upscale_conv_packed) instead of 3-lane resize
    # matmuls. Integer-upscale geometries only; bit-exact up to fp
    # reassociation (no composed-tail deviation in this model).
    packed_serve: bool = False
    # Accepted for engine/CLI parity with FastTransformer; packed_serve is
    # the main serving transform this model has.
    compose_tails: bool = False
    # Pallas stream kernels on the packed path: conv1 as im2col dots (the
    # clean-layout producer, PERFORMANCE.md crossing rule) and conv2 as the
    # row-streamed Pallas conv (1.10 vs 1.87 ms XLA @720p). The rest stays
    # XLA — Pallas outputs feed XLA consumers in the clean direction.
    pallas_serve: bool = False
    # Global-attention implementation: "xla" (reference path) or any other
    # value (serving-only, deterministic) -> the blocked Pallas kernel
    # (ops/pallas/gmha.py), which keeps the 8 blocks' (8, 3600, 3600)
    # score tensors out of HBM. Engine/bench pass "fused2" here for
    # FastTransformer; this model treats every non-"xla" value the same.
    attn_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        bc, td, ps = self.base_channels, self.transformer_dim, self.patch_size
        self.conv1 = ConvLayer(bc, relu=True, dtype=self.dtype)
        self.conv2 = ConvLayer(bc, relu=True, dtype=self.dtype)
        self.downsample = ConvLayer(bc, stride=2, dtype=self.dtype)
        self.patch_embed_kernel = self.param(
            "patch_embed_kernel", _dense_init, (ps, ps, bc, td))
        self.patch_embed_bias = self.param("patch_embed_bias", _bias_init, (td,))
        n_tokens = self.token_hw[0] * self.token_hw[1]
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(stddev=1.0), (1, n_tokens, td))
        self.blocks = [
            GlobalAttentionBlock(td, self.num_heads, self.mlp_ratio,
                                 self.dropout, dtype=self.dtype,
                                 attn_impl=self.attn_impl)
            for _ in range(self.num_transformer_blocks)
        ]
        self.patch_unembed_kernel = self.param(
            "patch_unembed_kernel", _dense_init, (td, ps, ps, bc))
        self.patch_unembed_bias = self.param("patch_unembed_bias", _bias_init, (bc,))
        self.decoder_conv1 = ConvLayer(bc, relu=True, dtype=self.dtype)
        self.decoder_conv2 = ConvLayer(self.in_channels, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, res_out: tuple[int, int] = (1080, 1920),
                 upscale_factor: int | None = None, require_ratio: bool = True,
                 deterministic: bool = True) -> jnp.ndarray:
        del require_ratio  # accepted but unused, as in the reference (:114)
        res_out, _ = resolve_geometry(x.shape[1:3], res_out, upscale_factor)
        x = x.astype(self.dtype)

        h, w = x.shape[1:3]
        if (self.packed_serve and deterministic
                and not self.is_initializing()
                and res_out[0] % h == 0 and res_out[1] % w == 0
                and res_out[0] // h == res_out[1] // w
                and res_out[0] // h >= 2
                and h % 2 == 0 and w % 16 == 0):
            return self._packed_forward(x, res_out[0] // h)

        upscaled_input = interpolate_bicubic(x, res_out)

        feat = self.conv2(self.conv1(x))
        feat_down = self.downsample(feat)

        tokens = patch_embed(feat_down, self.patch_embed_kernel, self.patch_embed_bias)
        b, ht, wt, d = tokens.shape
        if (ht, wt) != tuple(self.token_hw):
            raise ValueError(
                f"ResidualTransformer pos_embed is baked for token grid "
                f"{self.token_hw} (720x1280 input); got {(ht, wt)}")
        seq = tokens.reshape(b, ht * wt, d) + self.pos_embed.astype(self.dtype)
        for block in self.blocks:
            seq = block(seq, deterministic=deterministic)
        tokens = seq.reshape(b, ht, wt, d)

        feat_trans = patch_unembed(tokens, self.patch_unembed_kernel,
                                   self.patch_unembed_bias)
        combined = feat_down + feat_trans

        dec = self.decoder_conv1(combined)
        residual = self.decoder_conv2(dec)

        residual_up = interpolate_bicubic(residual, res_out)
        out = upscaled_input + residual_up
        return jnp.clip(out, 0.0, 1.0)

    # ------------------------------------------------------------------
    def _packed_forward(self, x: jnp.ndarray, scale: int) -> jnp.ndarray:
        """Integer-scale all-XLA serving path on the width-2-packed layout.

        Same math as the default path (no composed-tail deviation — the
        bicubic convs are exact including borders via edge padding): packed
        encoder convs + stride-2 packed downsample + packed patch embed /
        unembed, and both bicubic branches as block-packed convs emitting
        pre-shuffle channels. The half-res residual branch upscales by
        2*scale at 360p, is part-shuffled onto the 720p grid, added to the
        input branch's pre-shuffle tensor, and ONE pixel shuffle emits the
        output — the full-res image is materialized exactly once.
        """
        from transformerupscaler_tpu.ops.conv import (
            conv2d_packed_raw,
            conv2d_packed_stride2,
        )
        from transformerupscaler_tpu.ops.patch import (
            patch_embed_packed,
            patch_unembed_packed,
        )
        from transformerupscaler_tpu.ops.pixel_shuffle import pixel_shuffle
        from transformerupscaler_tpu.ops.resize import (
            bicubic_upscale_conv_packed,
        )

        b, h, w, cin = x.shape
        xp = x.reshape(b, h, w // 2, 2 * cin)

        p1 = self.conv1.variables["params"]
        p2 = self.conv2.variables["params"]
        pd = self.downsample.variables["params"]
        dt = self.dtype
        if self.pallas_serve:
            from transformerupscaler_tpu.ops.conv import conv2d_packed_dots
            from transformerupscaler_tpu.ops.pallas.stream import (
                conv3x3_packed_stream,
            )

            feat1 = conv2d_packed_dots(xp, p1["kernel"].astype(dt),
                                       p1["bias"], relu=True)
            featp = conv3x3_packed_stream(feat1, p2["kernel"].astype(dt),
                                          p2["bias"], relu=True)
        else:
            feat1 = conv2d_packed_raw(xp, p1["kernel"].astype(dt),
                                      p1["bias"], relu=True)
            featp = conv2d_packed_raw(feat1, p2["kernel"].astype(dt),
                                      p2["bias"], relu=True)
        downp = conv2d_packed_stride2(featp, pd["kernel"].astype(dt),
                                      pd["bias"])

        tokens = patch_embed_packed(downp, self.patch_embed_kernel,
                                    self.patch_embed_bias)
        bt, ht, wt, d = tokens.shape
        if (ht, wt) != tuple(self.token_hw):
            raise ValueError(
                f"ResidualTransformer pos_embed is baked for token grid "
                f"{self.token_hw} (720x1280 input); got {(ht, wt)}")
        seq = tokens.reshape(bt, ht * wt, d) + self.pos_embed.astype(dt)
        for block in self.blocks:
            seq = block(seq, deterministic=True)
        tokens = seq.reshape(bt, ht, wt, d)

        combined = downp + patch_unembed_packed(
            tokens, self.patch_unembed_kernel, self.patch_unembed_bias)

        pc1 = self.decoder_conv1.variables["params"]
        if self.pallas_serve:
            from transformerupscaler_tpu.ops.pallas.stream import (
                conv3x3_packed_stream,
            )

            # CAUTION (crossing rule): combined = downp + unembed, and
            # downp is an XLA conv-emitter output whose layout propagates
            # through elementwise ops — TUX_RESID_DEC_PALLAS=0 reverts to
            # the XLA conv if TPU probes show the relayout penalty here.
            import os as _os

            if _os.environ.get("TUX_RESID_DEC_PALLAS", "1") == "1":
                dec = conv3x3_packed_stream(combined,
                                            pc1["kernel"].astype(dt),
                                            pc1["bias"], relu=True)
            else:
                dec = conv2d_packed_raw(combined, pc1["kernel"].astype(dt),
                                        pc1["bias"], relu=True)
        else:
            dec = conv2d_packed_raw(combined, pc1["kernel"].astype(dt),
                                    pc1["bias"], relu=True)
        # decoder_conv2 is 64->3: tiny FLOPs — unpack (free reshape) and let
        # conv2d's macro routing fill the lanes.
        dec_px = dec.reshape(b, h // 2, w // 2, dec.shape[-1] // 2)
        residual = self.decoder_conv2(dec_px)

        r = scale
        # TUX_RESID_BICUBIC=conv opts back into the block-packed-conv
        # bicubic branches (the measured rejection) for A/B probes.
        if os.environ.get("TUX_RESID_BICUBIC", "matmul") == "matmul":
            # The block-packed bicubic convs pay MACs ~ r^2 per output
            # pixel (the taps are materialized as dense (4, 4, C, 3r^2C)
            # kernels); the separable resize matmuls are O(output area)
            # with a 4-tap constant. Measured on v5e 720p
            # (tools/resid_tail_bench.py, one process, chained probes),
            # matmul vs conv ms/frame: x2 8.72 vs 19.9, x3 13.6 vs 25.5,
            # x6 15.7 vs 40.7 — matmul wins at every scale. Same math
            # either way (interpolate_bicubic is the parity-tested
            # reference resize, reference ResidualTransformer/model.py
            # F.interpolate bicubic).
            res_out = (h * r, w * r)
            residual_up = interpolate_bicubic(residual, res_out)
            upscaled_input = interpolate_bicubic(x, res_out)
            return jnp.clip(upscaled_input + residual_up, 0.0, 1.0)

        # Residual branch: bicubic x(2*scale) at half res -> pre-shuffle
        # channels (3, I, J) with I, J in [0, 2*scale); part-shuffle the
        # factor-2 onto the full-res grid, keeping (3, I%scale, J%scale) in
        # channels: full-res pixel row = scale*(2g + a) + i' with
        # a = I // scale, i' = I % scale.
        pre2 = bicubic_upscale_conv_packed(residual, 2 * r)
        # Reorder (c, I, J) -> ((c, i', j'), a, b): pixel_shuffle(2) then
        # leaves (c, i', j') pre-shuffle-r channels on the full-res grid.
        perm = []
        for c in range(3):
            for i in range(r):
                for j in range(r):
                    for a in range(2):
                        for bb in range(2):
                            perm.append((c * 2 * r + (a * r + i)) * 2 * r
                                        + (bb * r + j))
        resid_pre = pixel_shuffle(pre2[..., jnp.asarray(perm)], 2)

        input_pre = bicubic_upscale_conv_packed(x, r)
        out = pixel_shuffle(input_pre + resid_pre, r)
        return jnp.clip(out, 0.0, 1.0)
