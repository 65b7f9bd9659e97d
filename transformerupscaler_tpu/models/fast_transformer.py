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
import jax
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
    # Pallas stream kernels on the packed serving path (ops/pallas/stream.py
    # + ops/pallas/README.md): conv1 as im2col+dot (layout-clean producer),
    # fused encoder conv2+tailA and decoder conv+tailB kernels riding the
    # deinterleaved layout end-to-end, patch embed/unembed as
    # permuted-kernel GEMM kernels. Exact vs the packed XLA path modulo
    # bf16 reassociation; inference-only (no VJPs). Composes with
    # int8_serve (int8 convs then run conv3x3_packed_int8_stream — the XLA
    # int8 conv's output layout poisons Pallas consumers, PERFORMANCE.md
    # "crossing rule").
    pallas_serve: bool = False
    # All-XLA packed serving path: the whole pipeline rides the width-2
    # pixel-packed layout (H, W/2, 2C) — every conv fills all 128 MXU lanes,
    # composed tails become stride-4 macro-8 convs, and patch embed/unembed
    # read/write the packed layout directly via permuted kernels, so there
    # are ZERO layout changes between ops. Same math as compose_tails.
    packed_serve: bool = False
    # int8 conv/tail compute on the packed path (serving only): per-output-
    # channel int8 weights, per-tensor activation quant. With int8_scales
    # set (static calibration, see UpscalerEngine.calibrate_int8) the
    # quantize steps fuse into producer epilogues; None falls back to
    # dynamic per-tensor abs-max (one extra device pass per conv input).
    # Measured v5e: convs 1.92 -> 0.95 ms, tails 1.83/2.07 -> 0.38/0.29.
    int8_serve: bool = False
    # int8 scope: "full" quantizes every conv/tail/GEMM on the packed path;
    # "residual" keeps the image-carrying branch (conv1/conv2/branch-A tail)
    # in bf16 and quantizes only the residual branch (patch embed/unembed,
    # decoder conv, B tail) — the quantization error then enters the output
    # only through the small residual, keeping the PSNR delta tiny
    # (tools/int8_quality.py). "tails" (pallas_serve only) keeps every conv
    # and GEMM in bf16 and runs just the two composed tails as int8
    # Pallas MXU kernels, with the activation quantize fused into the
    # producing conv's epilogue when int8_scales is static — the tails'
    # macro-8 MAC inflation is where int8's doubled MXU rate pays most,
    # and the quantized tensor set is a subset of "full"'s (quality-safe
    # per tools/int8_quality.py).
    int8_scope: str = "full"
    # Static activation scales (feat1, feat, combined, dec, tokens);
    # None = dynamic per-tensor abs-max.
    int8_scales: tuple | None = None
    # int8 trunk GEMMs (requires attn_impl="fused2"): qkv/proj/fc1/fc2 run
    # as int8 MXU dots inside the paired trunk kernel with dynamic per-row
    # activation scales (no calibration needed — the row scale folds into
    # the output rows after the int32 dot; ops/pallas/trunk2.py). Attention
    # scores/softmax/context stay bf16/f32. Orthogonal to int8_serve.
    int8_trunk: bool = False
    # Offline GPTQ'd image-branch weights (UpscalerEngine.gptq_int8):
    # tuple of (name, shape, int8_kernel_bytes, scale_bytes,
    # bias_bytes-or-None) with names conv1/conv2/tailA_s{scale}. The
    # activation scales are folded in; entries missing for a geometry fall
    # back to trace-time abs-max quantization.
    int8_weights: tuple | None = None
    # Serving-path speedup: fold each Upsampler's last conv with its commuted
    # RGB tail into one 5x5 conv (~2x on those stages; a 1-pixel ring at
    # feature resolution deviates from the exact sequential form).
    compose_tails: bool = False
    # Quality serving mode (pallas_serve deint path only; also env
    # TUX_SERVE_QUALITY=1): removes the IMAGE-LEVEL bf16 roundings that the
    # floor law says bound the headline's GT PSNR delta (PERFORMANCE.md
    # quality-gate section) at near-zero fps cost:
    #   - (opt-in via quality_parts="conv1,...", OFF by default — see the
    #     quality_parts field) conv1 runs exact-uint8 dots: bf16(x*255) is
    #     EXACT (integers <= 255 fit bf16's 8 significand bits) and 1/255
    #     folds into the f32 kernel before a kernel-only hi/lo split
    #     (conv.conv2d_packed_dots_deint k_hi_lo);
    #   - both branch tails emit f32 (TUX_F32_TAIL semantics), so the
    #     branch add / squash / clip never round the image through bf16;
    #   - (opt-in via quality_parts="squash,...") the squash resize
    #     einsums run at Precision.HIGH (3-pass bf16 on f32 operands,
    #     ~2^-21). Measured unnecessary: with f32 tails the default-
    #     precision squash already gates at +0.0495 dB.
    serve_quality: bool = False
    # Which serve_quality pieces are active ("conv1", "tails", "squash",
    # comma-separated; tools/headline_quality.py --attribute quality_parts
    # bisects them). Default is "tails" ALONE — the 12-frame TPU bisect
    # measured q_tails at +0.0495 dB mean GT delta (fidelity 57.05) with
    # the squash left at DEFAULT precision, i.e. the HIGH-precision
    # squash (+0.31 ms) buys nothing measurable once the tails emit f32,
    # and q_squash alone is bit-identical to the headline. conv1 is
    # excluded for a sharper reason: the exact-uint8 k_hi_lo conv1
    # measures 2x closer to the f32 path at the FEATURE level (feat1
    # rel-rms 1.66e-3 vs 3.15e-3, real frame + ep-100 kernel, TPU) yet
    # WORSENS the GT delta (+0.182 vs +0.059 mean on the 12-frame held-out
    # set) — the checkpoint was trained with the bf16 input cast and its
    # downstream weights co-adapted to those features (the bf16 headline
    # even beats the exact path on 2 of 12 frames). Mechanism kept for
    # checkpoints trained at f32 (reference-imported weights).
    quality_parts: str = "tails"
    # Split branch-B tail (pallas_serve deint path, fold_pre only): run
    # [dec2 o first-stage] as a 5x5 64->3r_mid^2 conv with the commuted RGB
    # tail applied IN-KERNEL on the VMEM mid (ops/pallas/stream.
    # tail_finish_stream) instead of the single folded 7x7 conv whose MACs
    # the rank-3 RGB bottleneck inflates (x4: 150k vs 24k MACs/px).
    # None = measured auto default (tools/hilo_bench.py controlled sweep +
    # the split-tail in-model table, PERFORMANCE.md round-4):
    #   - fast path: ON at x2/x3/x4 (x2 8.04 vs 8.22 ms, x3 10.39 vs
    #     10.59, x4 10.34 vs 12.39; hi_lo_fin "off", +0.011 dB GT from the
    #     mid's single bf16 rounding);
    #   - serve_quality: ON only at x4 (the wf finish-weight fix the f32
    #     quality path needs costs ~0.2 ms, erasing the x2 win and tying
    #     x3; at x4 the 2.05 ms win dwarfs it) — the joint-north-star x2
    #     config is quality COMPOSED (PERFORMANCE.md hi_lo_fin sweep).
    # x6 never reaches this routing: its composed tails have co=108 >= 64
    # channels, which already fill the MXU lanes as direct convs
    # (direct_tails below; packed x6 measured 33.3 ms vs direct 30.9).
    # Env TUX_SPLIT_TAIL=0/1 is a trace-time debug override.
    split_tail: bool | None = None
    # Branch tails emit f32 (compute stays bf16 GEMMs + f32 accumulation):
    # the branch add / squash / clip never round the image through bf16.
    # +2.3 dB serving fidelity for ~0.1 ms (PERFORMANCE.md f32-tail
    # experiment); implied by serve_quality's default quality_parts.
    # Env TUX_F32_TAIL=1 is the debug override.
    f32_tail: bool = False
    # Fold decoder_conv2 into the branch-B tail composition (one composed
    # conv instead of a 3-lane conv + a tail conv). In-model A/B measured
    # the fold winning or tying at every scale (tools/fold_ab_bench.py);
    # False keeps the factored sequential routing runnable. int8 scopes
    # force the fold. Env TUX_FOLD_PRE=0/1 is a trace-time debug override.
    fold_pre: bool = True
    # Split-tail finish-dot rounding mode (ops/pallas/stream.
    # tail_finish_stream): None = auto ("wf" under serve_quality — f32
    # finish weights as in-kernel hi/lo dots, the fix for the structured
    # filter perturbation that cost +0.27 dB on the f32-tails config;
    # "off" on the fast path where wf measured no GT movement for ~0.2 ms).
    # "full" additionally hi/lo's the mid (K-concat, ~+0.6 ms).
    hi_lo_fin: str | None = None
    # conv1 as [XLA tap expansion] + [one-dot Pallas row stream]
    # (ops/pallas/stream.conv1_dots_stream): same reduction set as
    # conv2d_packed_dots_deint (zero-padded K, f32 accumulation;
    # op-level bit-exact at every tested size, tests/test_pallas_stream
    # .py). None = measured auto default OFF — a REJECTION: the paired
    # in-model A/B (tools/conv1_model_ab.py, 2 interleaved reps, TPU)
    # measured off 7.884/7.487 ms vs stream 7.951/8.110 (rows=16) and
    # 8.046/7.947 (rows=48) — the ~30 MB tap-expansion materialization
    # for the Pallas boundary costs what the XLA im2col gather costs,
    # and Mosaic cannot assemble it in-kernel from clean flat rows
    # (lane->sublane "unsupported shape cast", conv1_flat_stream).
    # Applies to the plain-bf16 deint conv1 only; the serve_quality
    # exact-uint8 k_hi_lo variant keeps the XLA path.
    # Env TUX_CONV1_STREAM=0/1 is a trace-time debug override.
    conv1_stream: bool | None = None
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
        x_in = x  # pre-cast input: serve_quality's exact conv1 reads it
        x = x.astype(self.dtype)

        h_feat, w_feat = x.shape[1:3]
        if ((self.packed_serve or self.int8_serve or self.pallas_serve)
                and self.compose_tails
                and deterministic and not self.is_initializing()
                and scale in (2, 3, 4, 6) and h_feat % self.patch_size == 0
                and w_feat % 16 == 0):
            return self._packed_forward(x, res_out, scale, require_ratio,
                                        x_in=x_in)

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
        # res_out == out_hw makes the squash an IDENTITY resize (integer
        # sample grid -> resize matrices are exactly delta rows; the
        # reference's same-size F.interpolate is likewise a no-op), yet the
        # buggy (H, H) compare still triggers it — at exact-multiple
        # geometries that is pure wasted matmul (the phase-split contraction
        # grows with output area: ~1.2 TMAC at x6). Skipping is bit-exact.
        squash = (require_ratio and tuple(res_out) != compare
                  and tuple(res_out) != out_hw)

        # Branch A on the unpadded features (:263-265). The RGB conv is fused
        # through the final pixel shuffle (exact repack, see
        # ops/pixel_shuffle.commute_conv_through_shuffle).
        upscaled_input = self.up1(feat, scale,
                                  tail_kernel=self.up1_conv_kernel,
                                  tail_relu=True,
                                  compose_tail=self.compose_tails,
                                  return_preshuffle=squash)

        # Branch B: transformer over full-res patch tokens (:268-309).
        tokens = patch_embed(feat_pad, self.patch_embed_kernel,
                             self.patch_embed_bias)
        tokens = run_window_trunk(
            tokens, self.blocks, self.window_size,
            deterministic=deterministic,
            int8_acts="rowwise" if (self.int8_trunk and deterministic)
            else None)
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
            # The fold expands MACs through the rank-3 RGB bottleneck at
            # r >= 3, and OP-LEVEL probes said the factored sequential form
            # wins there (tools/factored_tail_bench.py) — but the IN-MODEL
            # same-process A/B says the fold wins or ties at every scale
            # (tools/fold_ab_bench.py, post-squash-skip: x3 9.70 vs 10.64 ms,
            # x4 12.01 vs 12.04, x6 15.06 vs 15.89), so it stays the default;
            # TUX_FOLD_PRE=0 opts into the factored tail on the packed path.
            p2 = self.decoder_conv2.variables["params"]
            residual_up = self.final_upscale(
                dec, scale,
                tail_kernel=self.final_upscale_conv_kernel,
                tail_bias=self.final_upscale_conv_bias,
                compose_tail=True,
                return_preshuffle=squash,
                pre_kernel=p2["kernel"], pre_bias=p2["bias"])
        else:
            residual = self.decoder_conv2(dec)
            residual_up = self.final_upscale(
                residual, scale,
                tail_kernel=self.final_upscale_conv_kernel,
                tail_bias=self.final_upscale_conv_bias,
                compose_tail=self.compose_tails,
                return_preshuffle=squash)

        out = upscaled_input + residual_up

        if squash:
            out = resize_shuffled(out, last_shuffle_factor(scale), res_out)

        return jnp.clip(out, 0.0, 1.0)

    # ------------------------------------------------------------------
    def _packed_forward(self, x, res_out, scale, require_ratio, x_in=None):
        """All-XLA serving path on the width-2-packed layout, scales 2/3/4/6.

        Same math as the compose_tails path (composed branch tails;
        border-ring deviation documented in PERFORMANCE.md), but every
        intermediate stays (B, H, W/2, 2C): convs via conv2d_packed_raw
        (all 128 lanes busy), composed tails via stride-(block/2)
        macro-block convs (tail_block picks the block filling the lanes for
        each scale's 3*scale^2 tail outputs — XLA would otherwise pad 27/48
        output channels to 128 lanes), patch embed/unembed via
        permuted-kernel GEMMs on the packed layout. Scale 4 additionally
        commutes its second Upsampler stage through the first shuffle
        (models/upsampler.composed_tail_kernel) so ALL tail compute runs at
        base resolution. No Mosaic involvement — compiles like any XLA
        program.
        """
        from transformerupscaler_tpu.ops.conv import (
            conv2d_packed_int8,
            conv2d_packed_raw,
            conv2d_tail_packed,
            conv2d_tail_packed_int8,
            tail_block,
        )
        from transformerupscaler_tpu.ops.patch import (
            patch_embed_packed,
            patch_unembed_packed,
        )
        from transformerupscaler_tpu.ops.pixel_shuffle import pixel_shuffle
        from transformerupscaler_tpu.models.upsampler import (
            composed_tail_kernel,
        )

        dt = self.dtype
        # i8a: image-carrying branch (conv1/conv2/tail A); i8b: residual
        # branch (embed/unembed/decoder/tail B). "residual" scope keeps the
        # image branch in bf16 so quantization error enters only through the
        # small predicted residual. "tails" scope (i8t) rides the Pallas
        # deint pipeline and quantizes ONLY the two composed-tail inputs
        # (feat, dec) — both i8a/i8b stay False so the deint-native conv
        # routing below is unchanged.
        i8t = self.int8_serve and self.int8_scope == "tails"
        i8a = self.int8_serve and self.int8_scope == "full"
        i8b = self.int8_serve and not i8t
        b, h, w, cin = x.shape
        xp = x.reshape(b, h, w // 2, 2 * cin)

        def act_q(name, t, idx, packed=True):
            """Per-channel int8 activation quant (static scale vector when
            calibrated, dynamic abs-max otherwise). For packed tensors the
            scale is per RAW channel (max over both pixel parities), so it
            folds exactly into the consumer's weight kernel. Scales are sown
            so UpscalerEngine.calibrate_int8 can harvest them."""
            from transformerupscaler_tpu.ops.quant import quantize_act_ch

            if self.int8_scales is not None:
                s = jnp.asarray(self.int8_scales[idx], jnp.float32)
            else:
                ax = tuple(range(t.ndim - 1))
                m = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=ax)
                if packed:
                    half = m.shape[0] // 2
                    m = jnp.maximum(m[:half], m[half:])
                s = jnp.maximum(m, 1e-8) / 127.0
            q, _ = quantize_act_ch(t, jnp.tile(s, 2) if packed else s)
            self.sow("intermediates", f"int8_scale_{name}", s)
            return q, s

        use_pallas = self.pallas_serve
        if use_pallas:
            from transformerupscaler_tpu.ops.conv import conv2d_packed_dots
            from transformerupscaler_tpu.ops.pallas.stream import (
                conv3x3_packed_int8_stream,
                conv3x3_packed_stream,
                deinterleave4,
                embed_stream,
                interleave4,
                tail_macro8_stream,
                tail_macro8_stream_int8,
                unembed_combine_stream,
            )

        pq = {}
        if self.int8_weights is not None:
            import numpy as _np

            for name, shape, kqb, ksb, bb in self.int8_weights:
                pq[name] = (_np.frombuffer(kqb, _np.int8).reshape(shape),
                            _np.frombuffer(ksb, _np.float32),
                            _np.frombuffer(bb, _np.float32)
                            if bb is not None else None)

        p1 = self.conv1.variables["params"]
        p2 = self.conv2.variables["params"]
        # conv1 stays bf16 even in full int8 scope: Cin=3 can't feed the
        # MXU's int8 lanes, so int8 conv1 measured SLOWER (0.97 ms incl. the
        # input quantize pass vs 0.51 bf16, tools/int8_stage_bench.py) AND
        # costs quality. Quantization starts at feat1. On the Pallas path
        # conv1 runs as im2col+dot — faster (0.48 vs 0.80 ms) AND its
        # default-layout output doesn't poison the downstream Pallas calls
        # with the conv-emitter's relayout (tools/int8_pallas_iso4.py).
        out_hw = (h * scale, w * scale)
        compare = out_hw if self.fix_ratio_bug else (out_hw[0], out_hw[0])
        # Skip the identity squash at exact-multiple geometries (bit-exact;
        # see the __call__ comment) — at x6 the identity resize_shuffled is
        # ~1.2 TMAC of pure waste.
        squash = (require_ratio and tuple(res_out) != compare
                  and tuple(res_out) != out_hw)

        # Branch A composed kernel: the whole up1 chain o commuted RGB tail,
        # one base-res conv emitting pixel_shuffle(scale)-ordered channels.
        ka, ba = composed_tail_kernel(self.up1._params, scale,
                                      self.up1_conv_kernel, None, dt)
        # co >= 64 (scale 6: 108 channels) already fills the MXU lanes as a
        # direct conv; block-packing would only add its 2*kwp/kw MAC
        # inflation (measured: packed x6 33.3 ms vs direct 30.9).
        direct_tails = ka.shape[3] >= 64
        blk = tail_block(ka.shape[3], w)
        if i8b:
            from transformerupscaler_tpu.ops.patch import (
                patch_embed_packed_int8,
                patch_unembed_packed_int8,
            )
        # Pallas patch kernels (embed_stream / unembed_combine_stream) read
        # the deinterleaved layout and bake the 8x8 patch gather/scatter into
        # the GEMM's kernel permutation (measured v5e @720p d=192: embed
        # 1.37 -> 0.64 ms; the unembed's 2.1 ms block transpose vanishes).
        # They run in bf16 even under int8_serve — the XLA int8 embed/unembed
        # measured no faster (0.92 vs 0.88 ms incl. the deinterleave) and
        # skipping the tokens/feat quantization only helps quality.
        # TUX_PALLAS_PATCH: trace-time kill-switch for probing the Pallas
        # patch kernels in isolation (same pattern as TUX_CONV_MACRO).
        import os as _os

        _pp = _os.environ.get("TUX_PALLAS_PATCH", "embed,unembed")
        # serve_quality (see the class field docstring): f32-image serving.
        quality = (self.serve_quality
                   or _os.environ.get("TUX_SERVE_QUALITY", "0") == "1")
        qparts = (set(self.quality_parts.split(",")) if quality else set())

        def _tail_odt():
            # f32_tail (field; env TUX_F32_TAIL=1 debug override): the two
            # branch tails emit f32 (compute stays bf16 GEMMs + f32
            # accumulation), so the branch add, the squash resize, and the
            # clip all run at f32 — the output image never round-trips
            # bf16. Implied by serve_quality's default quality_parts.
            return (jnp.float32
                    if self.f32_tail or "tails" in qparts
                    or _os.environ.get("TUX_F32_TAIL", "0") == "1" else None)
        pallas_patch = use_pallas and self.patch_size == 8
        pallas_tails = use_pallas and not direct_tails
        # The tails scope needs the full deint pipeline: Pallas tails AND
        # both patch kernels reading the (possibly int8) deint feature map.
        # Direct tails (Co >= 64, scale 6) instead run as XLA int8 convs —
        # the Pallas conv producers feed them in the clean direction and
        # the ~1.2 TF of tail FLOPs is where int8's MXU rate pays.
        # Outside both (no pallas, non-8 patch) the tails quantize
        # nothing — serve plain bf16.
        i8dt = i8t and use_pallas and direct_tails
        i8t = i8t and pallas_tails and pallas_patch
        pallas_embed = pallas_patch and ("embed" in _pp or i8t)
        pallas_unembed = pallas_patch and ("unembed" in _pp or i8t)

        def tail_scale(name, td, idx):
            """Per-raw-channel activation scale for the int8 tails scope:
            static (calibrated) when int8_scales is set, else measured on
            the deinterleaved bf16 tensor (the calibration pass itself).
            Sown for UpscalerEngine.calibrate_int8, like act_q."""
            if self.int8_scales is not None:
                s = jnp.asarray(self.int8_scales[idx], jnp.float32)
            else:
                m = jnp.max(jnp.abs(td.astype(jnp.float32)),
                            axis=(0, 1, 2, 3))
                s = jnp.maximum(jnp.maximum(m[:64], m[64:]), 1e-8) / 127.0
            self.sow("intermediates", f"int8_scale_{name}", s)
            return s
        # Fused encoder (conv3x3_tail_emit_stream): conv2 + branch-A tail in
        # one kernel, emitting feat_t (deinterleaved) for the patch stages —
        # the 118 MB featp HBM round trip and its deinterleave disappear.
        # Opt-in (TUX_FUSE_STREAM=1): at rows=24 the fused kernels measured
        # SLOWER in-model (10.24 vs 9.70 ms) — Mosaic schedules the
        # 90-dot fused cells worse than the pipelined separate kernels.
        _fuse = _os.environ.get("TUX_FUSE_STREAM", "0") == "1"
        fuse_enc = (_fuse and use_pallas and not i8a and not i8t
                    and not direct_tails)
        enc_deint = use_pallas and not i8a and not direct_tails and not fuse_enc
        if enc_deint:
            feat1 = None  # conv1 runs deint-native inside the branch below
        elif use_pallas:
            feat1 = conv2d_packed_dots(xp, p1["kernel"].astype(dt),
                                       p1["bias"], relu=True)
        else:
            feat1 = conv2d_packed_raw(xp, p1["kernel"].astype(dt), p1["bias"],
                                      relu=True)
        featp = None
        if i8a:
            f1q, s1 = act_q("feat1", feat1, 0)
            if use_pallas:
                # Pallas int8 conv: the XLA int8 conv is itself faster, but
                # its output poisons every downstream Pallas call with a
                # ~12 ms generic relayout (tools/int8_pallas_iso3.py P1/P4).
                featp = conv3x3_packed_int8_stream(f1q, p2["kernel"], s1,
                                                   p2["bias"], relu=True,
                                                   out_dtype=dt)
            else:
                featp = conv2d_packed_int8(f1q, p2["kernel"], s1, p2["bias"],
                                           relu=True, out_dtype=dt,
                                           pre_q=pq.get("conv2"))
        elif fuse_enc:
            from transformerupscaler_tpu.ops.pallas.stream import (
                conv3x3_tail_emit_stream,
            )

            a12, feat_t = conv3x3_tail_emit_stream(
                deinterleave4(feat1), p2["kernel"].astype(dt), p2["bias"],
                ka, ba, out_dtype=_tail_odt())
        elif enc_deint:
            # Deint-native conv2: the whole Pallas pipeline downstream
            # (tails, patch kernels, decoder) reads the deinterleave4
            # layout, so convolving in it directly removes the featp
            # transpose entirely.
            from transformerupscaler_tpu.ops.conv import (
                conv2d_packed_dots_deint,
            )
            from transformerupscaler_tpu.ops.pallas.stream import (
                conv3x3_deint_stream,
            )

            # conv1 emits the deinterleave4 layout via contiguous-slice
            # im2col GEMMs (only the 5.5 MB INPUT is transposed) — the
            # GEMM-output transpose measured ~0.6 ms un-fused in-context.
            if ("conv1" in qparts and x_in is not None
                    and x_in.dtype == jnp.float32):
                # serve_quality v2: exact-uint8 conv1. Integers <= 255 are
                # EXACT in bf16 (8 significand bits), so conv1 consumes
                # bf16(x*255) and folds the 1/255 into the f32 kernel
                # before its hi/lo split (k_hi_lo: kernel-only split,
                # K 54 -> 108). Kills the input-quantization AND
                # weight-rounding floors like v1's input split, but the
                # im2col stays bf16: v1 measured 9.65 ms (f32 im2col HBM)
                # vs 0.84 base; v2 is one extra MXU depth tile.
                xq = (x_in * jnp.float32(255.0)).astype(jnp.bfloat16)
                xp_q = xq.reshape(b, h, w // 2, 2 * cin)
                f1d = conv2d_packed_dots_deint(xp_q, p1["kernel"],
                                               p1["bias"], relu=True,
                                               k_hi_lo=True,
                                               pre_scale=1.0 / 255.0,
                                               out_dtype=dt)
            else:
                _c1_env = _os.environ.get("TUX_CONV1_STREAM")
                # Auto default OFF — measured in-model rejection, see
                # the conv1_stream field comment for the paired numbers.
                c1_stream = (self.conv1_stream if _c1_env is None
                             else _c1_env != "0")
                if c1_stream:
                    from transformerupscaler_tpu.ops.pallas.stream import (
                        conv1_dots_stream,
                    )

                    f1d = conv1_dots_stream(xp, p1["kernel"].astype(dt),
                                            p1["bias"], relu=True)
                else:
                    f1d = conv2d_packed_dots_deint(
                        xp, p1["kernel"].astype(dt), p1["bias"], relu=True)
            if i8t and self.int8_scales is not None:
                # Static scales: conv2 quantizes in its epilogue — int8
                # feat, half the HBM write, no separate quant pass.
                s_feat = tail_scale("feat", None, 1)
                feat_q = conv3x3_deint_stream(f1d, p2["kernel"].astype(dt),
                                              p2["bias"], relu=True,
                                              out_scale=s_feat)
                feat_t = None
            else:
                feat_t = conv3x3_deint_stream(f1d, p2["kernel"].astype(dt),
                                              p2["bias"], relu=True)
                if i8t:
                    # Calibration / dynamic fallback: measure + quantize
                    # in XLA (clean crossing both ways).
                    from transformerupscaler_tpu.ops.quant import (
                        quantize_act_ch,
                    )

                    s_feat = tail_scale("feat", feat_t, 1)
                    feat_q, _ = quantize_act_ch(feat_t,
                                                jnp.tile(s_feat, 2))
        elif use_pallas:
            featp = conv3x3_packed_stream(feat1, p2["kernel"].astype(dt),
                                          p2["bias"], relu=True)
        else:
            featp = conv2d_packed_raw(feat1, p2["kernel"].astype(dt),
                                      p2["bias"], relu=True)

        def featp_packed():
            # Packed featp for the XLA fallback stages when the fused
            # encoder produced only the deinterleaved form.
            nonlocal featp
            if featp is None:
                featp = interleave4(feat_t)
            return featp

        if use_pallas and featp is not None:
            feat_t = deinterleave4(featp)
        if i8a:
            fq, s2 = act_q("feat", featp, 1)
            a12 = conv2d_tail_packed_int8(fq, ka, s2, ba, relu=True,
                                          out_dtype=dt, block=blk,
                                          pre_q=pq.get(f"tailA_s{scale}"))
        elif fuse_enc:
            pass  # a12 came out of the fused encoder
        elif i8t:
            # Measured HONESTLY (tools/int8_tail_bench.py chains, v5e,
            # same-process): every tail routing lands at ~2.17 ms for the
            # conv+tail5 chain — bf16 Pallas 2.172, int8 Pallas 2.201,
            # int8 XLA (interleave4 + conv emitter) 2.166. The round-2
            # "0.38 ms XLA int8 tail" exists only when the producer is the
            # XLA conv emitter itself (its tiled layout feeds the next conv
            # free); from Pallas/default layouts the same conv costs
            # 0.845 ms + 0.18 interleave. So the tails scope buys HBM/
            # footprint, not speed; the XLA routing is the default (it
            # reuses the GPTQ pre-quant infra), TUX_INT8_TAIL=pallas keeps
            # the in-kernel int8 variant.
            if _os.environ.get("TUX_INT8_TAIL", "xla") == "pallas":
                a12 = tail_macro8_stream_int8(feat_q, ka, s_feat, ba,
                                              relu=True, out_dtype=dt)
            else:
                a12 = conv2d_tail_packed_int8(
                    interleave4(feat_q), ka, s_feat, ba, relu=True,
                    out_dtype=dt, block=blk,
                    pre_q=pq.get(f"tailA_s{scale}"))
        elif pallas_tails:
            a12 = tail_macro8_stream(feat_t, ka, ba, relu=True,
                                     out_dtype=_tail_odt())
        elif i8dt:
            from transformerupscaler_tpu.ops.conv import conv2d_int8

            fq, s2 = act_q("feat", featp, 1)
            a12 = conv2d_int8(fq.reshape(b, h, w, -1), ka, s2, ba,
                              padding=(ka.shape[0] - 1) // 2, relu=True,
                              out_dtype=dt)
        elif direct_tails:
            from transformerupscaler_tpu.ops.conv import conv2d

            a12 = conv2d(featp.reshape(b, h, w, -1), ka, ba,
                         padding=(ka.shape[0] - 1) // 2, relu=True,
                         auto_macro=False)
        else:
            a12 = conv2d_tail_packed(featp, ka, ba, relu=True, block=blk)
        if pallas_embed:
            if i8t:
                tokens = embed_stream(feat_q, self.patch_embed_kernel,
                                      self.patch_embed_bias,
                                      in_scale=s_feat, out_dtype=dt)
            else:
                tokens = embed_stream(feat_t, self.patch_embed_kernel,
                                      self.patch_embed_bias)
        elif i8b:
            # Embed reuses the tail's int8 feature map + scale when the A
            # branch is quantized too; otherwise quantize feat for the embed.
            if not i8a:
                fq, s2 = act_q("feat", featp_packed(), 1)
            tokens = patch_embed_packed_int8(fq, s2, self.patch_embed_kernel,
                                             self.patch_embed_bias,
                                             out_dtype=dt)
        else:
            tokens = patch_embed_packed(featp_packed(),
                                        self.patch_embed_kernel,
                                        self.patch_embed_bias)
        tokens = run_window_trunk(
            tokens, self.blocks, self.window_size, deterministic=True,
            int8_acts="rowwise" if self.int8_trunk else None)
        # Fused decoder (conv3x3_tail_stream) consumes the unembed output in
        # its native deinterleaved layout — the interleave4, the 118 MB dec
        # HBM round trip, and the tail's deinterleave all disappear.
        fuse_dec = _fuse and use_pallas and not i8b and not direct_tails
        dec_deint = use_pallas and not i8b and not direct_tails
        combined_d = None
        if pallas_unembed:
            if i8t:
                # Skip add dequantizes the int8 feat in-kernel — consistent
                # with what the tail/embed saw; bounded by the combined-
                # tensor quantization "full" scope applies here anyway.
                combined_d = unembed_combine_stream(
                    tokens, feat_q, self.patch_unembed_kernel,
                    self.patch_unembed_bias, feat_scale=s_feat)
            else:
                combined_d = unembed_combine_stream(
                    tokens, feat_t, self.patch_unembed_kernel,
                    self.patch_unembed_bias)
            combined = (None if fuse_dec or dec_deint
                        else interleave4(combined_d))
        elif i8b:
            tq, s5 = act_q("tokens", tokens, 4, packed=False)
            combined = patch_unembed_packed_int8(
                tq, s5, self.patch_unembed_kernel, self.patch_unembed_bias,
                out_dtype=dt) + featp_packed()
        else:
            combined = patch_unembed_packed(tokens, self.patch_unembed_kernel,
                                            self.patch_unembed_bias
                                            ) + featp_packed()

        # Decoder tail: dec2 o (final_upscale chain o commuted tail) — e.g.
        # 7x7 64->12 at scale 2, 7x7 64->3r^2 at larger scales (all at base
        # res). The fold expands MACs through the rank-3 RGB bottleneck at
        # r >= 3 and OP-LEVEL probes favored the factored sequential form
        # there (dec2 macro-32 + 5x5 3->3r^2: x3 3.72 vs 2.57 ms, x4 4.51
        # vs 2.47, x6 5.41 vs 3.07 — tools/factored_tail_bench.py), but the
        # IN-MODEL same-process interleaved A/B (tools/fold_ab_bench.py,
        # post-squash-skip) measured the fold winning or tying at every
        # scale (x3 9.70 vs 10.64 ms, x4 12.01 vs 12.04, x6 15.06 vs
        # 15.89) — the isolated probe's starting layouts don't survive
        # producer/consumer fusion in context. Folded is the default;
        # TUX_FOLD_PRE=0 keeps the factored routing runnable.
        pd1 = self.decoder_conv1.variables["params"]
        pd2 = self.decoder_conv2.variables["params"]
        _fp_env = _os.environ.get("TUX_FOLD_PRE")
        fold_pre = (i8t or i8b or i8dt
                    or (self.fold_pre if _fp_env is None
                        else _fp_env != "0"))
        if fold_pre:
            kc, bc = composed_tail_kernel(
                self.final_upscale._params, scale,
                self.final_upscale_conv_kernel, self.final_upscale_conv_bias,
                dt, pre_kernel=pd2["kernel"], pre_bias=pd2["bias"])
        else:
            kc, bc = composed_tail_kernel(
                self.final_upscale._params, scale,
                self.final_upscale_conv_kernel, self.final_upscale_conv_bias,
                dt)

        def factored_b_tail(dec_p):
            """Sequential branch-B tail on the packed layout: decoder_conv2
            (3x3 64->3) as a macro-block conv, then the up-chain o commuted
            RGB tail composition (5x5 3->3r^2). Exact legacy ordering
            (reference model.py:313,316) — zero-pads per conv, so the border
            ring differs from the folded kernel's single-pad by design."""
            if _tail_odt() is not None:
                import warnings

                warnings.warn("TUX_F32_TAIL=1 has no effect on the factored "
                              "branch-B tail (TUX_FOLD_PRE=0): the XLA "
                              "macro-block convs emit the compute dtype.")
            co = kc.shape[3]
            blk2 = next((bb for bb in (32, 16, 8, 4, 2) if w % bb == 0), 2)
            r3 = conv2d_tail_packed(dec_p, pd2["kernel"].astype(dt),
                                    pd2["bias"].astype(dt), block=blk2)
            rp = r3.reshape(b, h, w // 2, 6)
            blk5 = 2 if co >= 64 else tail_block(co, w)
            return conv2d_tail_packed(rp, kc, bc, block=blk5)
        if fuse_dec:
            from transformerupscaler_tpu.ops.pallas.stream import (
                conv3x3_tail_stream,
            )

            if combined_d is None:  # TUX_PALLAS_PATCH probing fallback
                combined_d = deinterleave4(combined)
            b12 = conv3x3_tail_stream(combined_d, pd1["kernel"].astype(dt),
                                      pd1["bias"], kc, bc,
                                      out_dtype=_tail_odt())
        elif use_pallas and not i8b and not direct_tails:
            # Deint-native decoder: conv + tail ride the deinterleaved
            # layout straight off the unembed output — no interleave4, no
            # dec-side deinterleave.
            from transformerupscaler_tpu.ops.pallas.stream import (
                conv3x3_deint_stream,
            )

            if combined_d is None:  # TUX_PALLAS_PATCH probing fallback
                combined_d = deinterleave4(combined)
            if i8t and self.int8_scales is not None:
                s_dec = tail_scale("dec", None, 3)
                dec_q = conv3x3_deint_stream(combined_d,
                                             pd1["kernel"].astype(dt),
                                             pd1["bias"], relu=True,
                                             out_scale=s_dec)
            elif i8t:
                from transformerupscaler_tpu.ops.quant import (
                    quantize_act_ch,
                )

                dec_d = conv3x3_deint_stream(combined_d,
                                             pd1["kernel"].astype(dt),
                                             pd1["bias"], relu=True)
                s_dec = tail_scale("dec", dec_d, 3)
                dec_q, _ = quantize_act_ch(dec_d, jnp.tile(s_dec, 2))
            if i8t:
                # Same XLA-int8-tail routing as branch A (see comment there).
                if _os.environ.get("TUX_INT8_TAIL", "xla") == "pallas":
                    b12 = tail_macro8_stream_int8(dec_q, kc, s_dec, bc,
                                                  out_dtype=dt)
                else:
                    b12 = conv2d_tail_packed_int8(
                        interleave4(dec_q), kc, s_dec, bc, out_dtype=dt,
                        block=blk, pre_q=pq.get(f"tailB_s{scale}"))
            else:
                dec_d = conv3x3_deint_stream(combined_d,
                                             pd1["kernel"].astype(dt),
                                             pd1["bias"], relu=True)
                _st_env = _os.environ.get("TUX_SPLIT_TAIL")
                if _st_env is not None:
                    want_split = _st_env == "1"
                elif self.split_tail is not None:
                    want_split = self.split_tail
                else:
                    # Measured auto default — see the split_tail field
                    # docstring: fast path ON at x2/x3/x4; serve_quality
                    # ON only at x4 (quality composed is the x2 joint
                    # north star; at x3 the split win ~= the wf cost).
                    # bf16 serving only: tail_finish_stream computes the
                    # mid/finish in bf16, so auto-splitting an f32 engine
                    # (the exact/parity configs) would silently degrade
                    # its precision.
                    want_split = (dt == jnp.bfloat16
                                  and (scale == 4 or not quality))
                # scale in (2,3,4) is documentation, not an exclusion:
                # this branch requires not direct_tails, and x6's composed
                # tails are co=108 >= 64 (direct conv, measured faster
                # than any packed form: 30.9 vs 33.3 ms) — x6 can never
                # reach here.
                split_tail = (want_split and fold_pre
                              and scale in (2, 3, 4))
                if split_tail:
                    # Split-B tail: the fold through the rank-3 RGB
                    # bottleneck nearly doubles the B tail's MACs at x2
                    # (6x at x4) just to save one tiny conv — run
                    # [pre o stage] (5x5, 64 -> 3r_mid^2) with the
                    # commuted RGB tail applied IN-KERNEL on the VMEM mid
                    # (ops/pallas/stream.tail_finish_stream; the XLA
                    # block-8 finish alone costs 0.45 ms and erases the
                    # win). Interior-exact vs the fold; the border ring
                    # follows the sequential two-conv zero-pad (same
                    # deviation class). Rounding: with hi_lo_fin "off"
                    # (the fast-path default) the f32 mid rounds ONCE to
                    # bf16 before the finish dots (+0.011 dB GT); "wf"
                    # (the serve_quality default) keeps the finish
                    # WEIGHTS exact via in-kernel hi/lo dots but still
                    # rounds the mid; only "full" keeps the mid exact
                    # too (K-concat, ~+0.6 ms — not worth it, measured).
                    from transformerupscaler_tpu.models.upsampler import (
                        split_tail_kernels,
                    )
                    from transformerupscaler_tpu.ops.pallas.stream import (
                        tail_finish_stream,
                    )

                    (km, bm), (kf, bf) = split_tail_kernels(
                        self.final_upscale._params, scale,
                        self.final_upscale_conv_kernel,
                        self.final_upscale_conv_bias, dt,
                        pre_kernel=pd2["kernel"], pre_bias=pd2["bias"])
                    # hi_lo_fin auto = "wf" ONLY under serve_quality: a
                    # separately-rounded finish kernel is a structured
                    # filter perturbation that dominated the f32-tails
                    # quality config (+0.27 dB GT with off, +0.011 with
                    # wf) — but on the plain bf16 fast path wf does NOT
                    # move GT (+0.0693 vs +0.069, 12-frame held-out gate)
                    # and costs ~0.2 ms in-model (tools/hilo_bench.py
                    # controlled sweep: off 8.038 ms, wf 8.243, K-concat
                    # full 8.83 — the op-level ~0.05 ms estimate did not
                    # survive scheduling). TUX_HILO_FIN still overrides
                    # (the kernel warns when it diverges).
                    b12 = tail_finish_stream(
                        dec_d, km, bm, kf, bf, out_dtype=_tail_odt(),
                        hi_lo_fin=self.hi_lo_fin
                        or ("wf" if quality else "off"))
                elif fold_pre:
                    b12 = tail_macro8_stream(dec_d, kc, bc,
                                             out_dtype=_tail_odt())
                else:
                    # Factored tail is all-XLA; Pallas -> transpose -> XLA
                    # conv is the clean crossing direction.
                    b12 = factored_b_tail(interleave4(dec_d))
        else:
            if i8b:
                cq, s3 = act_q("combined", combined, 2)
                if use_pallas:
                    dec = conv3x3_packed_int8_stream(cq, pd1["kernel"], s3,
                                                     pd1["bias"], relu=True,
                                                     out_dtype=dt)
                else:
                    dec = conv2d_packed_int8(cq, pd1["kernel"], s3,
                                             pd1["bias"], relu=True,
                                             out_dtype=dt)
            elif use_pallas:
                dec = conv3x3_packed_stream(combined,
                                            pd1["kernel"].astype(dt),
                                            pd1["bias"], relu=True)
            else:
                dec = conv2d_packed_raw(combined, pd1["kernel"].astype(dt),
                                        pd1["bias"], relu=True)
            if i8b:
                dq, s4 = act_q("dec", dec, 3)
                b12 = conv2d_tail_packed_int8(dq, kc, s4, bc, out_dtype=dt,
                                              block=blk)
            elif i8dt:
                from transformerupscaler_tpu.ops.conv import conv2d_int8

                dq, s4 = act_q("dec", dec, 3)
                b12 = conv2d_int8(dq.reshape(b, h, w, -1), kc, s4, bc,
                                  padding=(kc.shape[0] - 1) // 2,
                                  out_dtype=dt)
            elif direct_tails:
                if fold_pre:
                    from transformerupscaler_tpu.ops.conv import conv2d

                    b12 = conv2d(dec.reshape(b, h, w, -1), kc, bc,
                                 padding=(kc.shape[0] - 1) // 2,
                                 auto_macro=False)
                else:
                    b12 = factored_b_tail(dec)
            elif fold_pre:
                b12 = conv2d_tail_packed(dec, kc, bc, block=blk)
            else:
                b12 = factored_b_tail(dec)

        # Branch layouts may differ (macro-8 vs macro-blk vs NHWC) when the
        # branches route differently; all are free reshapes of NHWC.
        rr3 = 3 * scale * scale
        outp = (a12.reshape(b, h, w, rr3) + b12.reshape(b, h, w, rr3))
        if squash:
            # serve_quality: the squash is the LAST op touching the image;
            # at default TPU precision its f32 einsums would round both
            # operands back to bf16. HIGH (3-pass bf16, ~2^-21 relative)
            # keeps the f32 tail outputs effectively f32 through to the
            # clip at a third of HIGHEST's cost (0.369 vs 1.016 ms
            # measured at the headline shape, tools/r4_model_bench.py).
            prec = jax.lax.Precision.HIGH if "squash" in qparts else None
            out = resize_shuffled(outp, scale, res_out, precision=prec)
        else:
            out = pixel_shuffle(outp, scale)
        return jnp.clip(out, 0.0, 1.0)
