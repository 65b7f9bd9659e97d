"""FastTransformer: the flagship — learned sub-pixel upscaling, full-res
patch embedding.

Parity: reference models/FastTransformer/model.py:174-327. Differences from
WindowTransformer: no stride-2 downsample (patch embed on full-res features),
dim 192 / 6 blocks / 12 heads / dropout 0.1, features reflect-padded to a
multiple of 8 before patch embed (cropped after unembed), and both residual
branches use learned pixel-shuffle Upsamplers instead of bicubic:
Branch A upscales encoder features (up1 + conv->RGB+ReLU), Branch B upscales
the predicted residual (final_upscale + conv).

The reference's ``require_ratio`` squash condition compares
``res_out != (out_H, out_H)`` — H twice (model.py:323), so the squash nearly
always runs. ``fix_ratio_bug=True`` restores the intended comparison.
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
from transformerupscaler_tpu.models.upsampler import (
    Upsampler,
    last_shuffle_factor,
)
from transformerupscaler_tpu.ops.patch import patch_embed, patch_unembed
from transformerupscaler_tpu.ops.resize import resize_shuffled
from transformerupscaler_tpu.registry import register_model


@register_model("FastTransformer", "flagship: learned pixel-shuffle SR, 6.45M params")
class FastTransformer(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    transformer_dim: int = 192
    num_window_blocks: int = 6
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    window_size: int = 8
    patch_size: int = 8
    attn_impl: str = "xla"
    int8_mlp: bool = False
    fix_ratio_bug: bool = False
    # Serving path: route patch embed/unembed(+skip add) through the Pallas
    # kernels (ops/pallas/patch_kernels.py). Exact; inference-only (the
    # kernels define no VJP).
    pallas_serve: bool = False
    # Serving-path speedup: fold each Upsampler's last conv with its commuted
    # RGB tail into one 5x5 conv (~2x on those stages; a 1-pixel ring at
    # feature resolution deviates from the exact sequential form).
    compose_tails: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        bc, td, ps = self.base_channels, self.transformer_dim, self.patch_size
        self.conv1 = ConvLayer(bc, relu=True, dtype=self.dtype)
        self.conv2 = ConvLayer(bc, relu=True, dtype=self.dtype)
        # Branch A: learned upscale of encoder features to RGB.
        self.up1 = Upsampler(bc, dtype=self.dtype)
        # BasicConv(bc, 3, 3, 1, 1): bias=False, ReLU=True (utils.py:13-28).
        # Raw params so the conv can be commuted through the pixel shuffle.
        self.up1_conv_kernel = self.param(
            "up1_conv_kernel", _dense_init, (3, 3, bc, self.in_channels))
        # Branch B tail: learned upscale of the predicted residual.
        self.final_upscale = Upsampler(self.in_channels, dtype=self.dtype)
        # default_conv(3, 3, 3): bias=True, no activation (utils.py:6-10).
        self.final_upscale_conv_kernel = self.param(
            "final_upscale_conv_kernel", _dense_init,
            (3, 3, self.in_channels, self.in_channels))
        self.final_upscale_conv_bias = self.param(
            "final_upscale_conv_bias", _bias_init, (self.in_channels,))

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
        res_out, scale = resolve_geometry(x.shape[1:3], res_out, upscale_factor)
        x = x.astype(self.dtype)

        feat = self.conv2(self.conv1(x))
        h_feat, w_feat = feat.shape[1:3]

        # Reflect-pad features to a multiple of the patch size (:255-261).
        ps = self.patch_size
        pad_h = (ps - h_feat % ps) % ps
        pad_w = (ps - w_feat % ps) % ps
        feat_pad = (jnp.pad(feat, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                            mode="reflect") if pad_h or pad_w else feat)

        # Decide the require_ratio squash statically (shapes are static under
        # jit). When it runs, both branches stay in the r^2-packed pre-shuffle
        # domain and the squash resize applies there via phase-split matrices
        # (ops/resize.resize_shuffled) — exact, and it removes the serving
        # path's most expensive stage (8.9 ms -> 0.1 ms on v5e: the scaled-up
        # image is never materialized and the resize matmuls keep all 128
        # lanes busy instead of 3).
        out_hw = (h_feat * scale, w_feat * scale)
        # Reference compares res_out against (H, H) — reproduce unless fixed (:323).
        compare = out_hw if self.fix_ratio_bug else (out_hw[0], out_hw[0])
        squash = require_ratio and tuple(res_out) != compare

        # Branch A on the unpadded features (:263-265). The RGB conv is fused
        # through the final pixel shuffle (exact repack, see
        # ops/pixel_shuffle.commute_conv_through_shuffle).
        upscaled_input = self.up1(feat, scale,
                                  tail_kernel=self.up1_conv_kernel,
                                  tail_relu=True,
                                  compose_tail=self.compose_tails,
                                  return_preshuffle=squash)

        # Branch B: transformer over full-res patch tokens (:268-309).
        use_pallas = (self.pallas_serve and deterministic
                      and not self.is_initializing()
                      and not (pad_h or pad_w)
                      and self.base_channels == 64 and self.patch_size == 8)
        if use_pallas:
            from transformerupscaler_tpu.ops.pallas.patch_kernels import (
                fused_patch_embed,
                fused_patch_unembed_add,
            )

            tokens = fused_patch_embed(
                feat_pad, self.patch_embed_kernel.astype(self.dtype),
                self.patch_embed_bias)
            tokens = run_window_trunk(tokens, self.blocks, self.window_size,
                                      deterministic=deterministic)
            combined = fused_patch_unembed_add(
                tokens, feat, self.patch_unembed_kernel.astype(self.dtype),
                self.patch_unembed_bias)
        else:
            tokens = patch_embed(feat_pad, self.patch_embed_kernel,
                                 self.patch_embed_bias)
            tokens = run_window_trunk(tokens, self.blocks, self.window_size,
                                      deterministic=deterministic)
            feat_trans = patch_unembed(tokens, self.patch_unembed_kernel,
                                       self.patch_unembed_bias)
            feat_trans = feat_trans[:, :h_feat, :w_feat, :]
            combined = feat + feat_trans

        dec = self.decoder_conv1(combined)
        if self.compose_tails and not self.is_initializing():
            # Fold decoder_conv2 (3x3 64->3, no activation between — reference
            # model.py:313,316) into the upsampler's first conv: one
            # 128-lane-friendly composed conv instead of a 3-output-lane conv
            # followed by a 12-lane one (measured 2.5 + 1.3 ms -> ~1 ms).
            p2 = self.decoder_conv2.variables["params"]
            residual_up = self.final_upscale(
                dec, scale,
                tail_kernel=self.final_upscale_conv_kernel,
                tail_bias=self.final_upscale_conv_bias.astype(self.dtype),
                compose_tail=True,
                return_preshuffle=squash,
                pre_kernel=p2["kernel"], pre_bias=p2["bias"])
        else:
            residual = self.decoder_conv2(dec)
            residual_up = self.final_upscale(
                residual, scale,
                tail_kernel=self.final_upscale_conv_kernel,
                tail_bias=self.final_upscale_conv_bias.astype(self.dtype),
                compose_tail=self.compose_tails,
                return_preshuffle=squash)

        out = upscaled_input + residual_up

        if squash:
            out = resize_shuffled(out, last_shuffle_factor(scale), res_out)

        return jnp.clip(out, 0.0, 1.0)
