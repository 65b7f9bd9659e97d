"""ResidualTransformer: global-attention SR model with a fixed 720p geometry.

Parity: reference models/ResidualTransformer/model.py:53-165.
Pipeline: encoder 2x conv64 -> stride-2 downsample -> conv patch embed k8 s8
(45x80 = 3600 tokens at 720p) -> learned absolute pos_embed (1, 3600, 128) ->
8 global nn.MultiheadAttention blocks -> convT unembed -> skip add -> 2-conv
decoder -> bicubic residual + bicubic-upscaled input -> clamp.

Like the reference, the positional embedding is baked to the 720x1280 input
geometry — the model is NOT resolution-agnostic.
"""

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
                                 self.dropout, dtype=self.dtype)
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
