"""Multi-scale sub-pixel Upsampler.

Parity: reference models/FastTransformer/utils.py:43-98 — a bank of
conv + PixelShuffle stages per scale in {2, 3, 4, 6}, built once, selected by
the (static) scale at call time. Scale 2 and 4 compose log2(scale) stages of
conv(n->4n)+shuffle(2); 3 uses conv(n->9n)+shuffle(3); 6 uses
conv(n->36n)+shuffle(6).

All branches' params are declared in ``setup`` so a freshly initialized model
carries every scale (matching the reference checkpoint layout) even when init
traces only one geometry.
"""

import flax.linen as nn
import jax.numpy as jnp

from transformerupscaler_tpu.ops.conv import conv2d
from transformerupscaler_tpu.ops.pixel_shuffle import (
    commute_conv_through_shuffle,
    pixel_shuffle,
)
from transformerupscaler_tpu.resolutions import VALID_SCALES

_kernel_init = nn.initializers.lecun_normal()
_bias_init = nn.initializers.zeros


# scale -> list of (channel multiplier, shuffle factor) stages
_STAGES = {2: [(4, 2)], 3: [(9, 3)], 4: [(4, 2), (4, 2)], 6: [(36, 6)]}


class Upsampler(nn.Module):
    n_feats: int
    valid_scales: tuple = VALID_SCALES
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        params = {}
        for scale in self.valid_scales:
            for i, (mult, _) in enumerate(_STAGES[scale]):
                n = self.n_feats
                params[f"s{scale}_c{i}_kernel"] = self.param(
                    f"s{scale}_c{i}_kernel", _kernel_init, (3, 3, n, mult * n))
                params[f"s{scale}_c{i}_bias"] = self.param(
                    f"s{scale}_c{i}_bias", _bias_init, (mult * n,))
        self._params = params

    def __call__(self, x: jnp.ndarray, scale: int, tail_kernel=None,
                 tail_bias=None, tail_relu: bool = False,
                 compose_tail: bool = False,
                 return_preshuffle: bool = False,
                 pre_kernel=None, pre_bias=None) -> jnp.ndarray:
        """Upsample by ``scale``. When a ``tail_*`` 3x3 conv is given (the
        conv that would follow the upsample), it is commuted through the
        final pixel shuffle and applied at base resolution — exact math,
        ~r^2 better MXU lane utilization for 3-channel outputs.

        ``compose_tail`` additionally folds the last stage conv and the
        commuted tail into ONE 5x5 conv (XLA pads conv output channels to
        128 lanes, so the wide->narrow pair costs ~2x one composed conv).
        Composition zero-pads the input instead of the intermediate, so a
        1-pixel ring at base resolution deviates — serving-path only.

        ``return_preshuffle`` skips the LAST pixel shuffle and returns the
        r^2-packed tensor — the caller fuses the shuffle into downstream
        linear work (see ops.resize.resize_shuffled). The skipped factor is
        ``last_shuffle_factor(scale)``.

        ``pre_kernel``/``pre_bias``: a conv that would PRECEDE this
        upsampler (FastTransformer's decoder_conv2, reference
        model.py:313) folded into the first stage conv by composition —
        same border deviation as ``compose_tail``, so only used with it.
        """
        if scale not in self.valid_scales:
            raise ValueError(f"Requested scale={scale} was not built.")
        stages = _STAGES[scale]
        for i, (_, shuffle) in enumerate(stages):
            k = self._params[f"s{scale}_c{i}_kernel"]
            b = self._params[f"s{scale}_c{i}_bias"]
            last = i == len(stages) - 1
            pad = 1
            if pre_kernel is not None and i == 0:
                from transformerupscaler_tpu.ops.conv import (
                    compose_conv3x3_kernels,
                )
                # Compose in f32 and cast the RESULT once at use: composing
                # in bf16 accumulates rounding through the 64-term channel
                # contraction (~sqrt(64) x one rounding) and measured a
                # systematic +0.2 dB GT PSNR loss (tools/headline_quality.py
                # --attribute coarse/pallas: bf16-factored and f32-composed
                # are both free; bf16-composed carries the whole delta).
                k, b = compose_conv3x3_kernels(
                    pre_kernel.astype(jnp.float32),
                    None if pre_bias is None else pre_bias.astype(
                        jnp.float32),
                    k.astype(jnp.float32), b.astype(jnp.float32))
                pad = (k.shape[0] - 1) // 2
            if tail_kernel is not None and last:
                tkf = commute_conv_through_shuffle(
                    tail_kernel.astype(jnp.float32), shuffle)
                tb = (jnp.repeat(tail_bias, shuffle * shuffle)
                      if tail_bias is not None else None)
                if compose_tail:
                    from transformerupscaler_tpu.ops.conv import (
                        compose_conv3x3_kernels,
                    )
                    kc, bc = compose_conv3x3_kernels(
                        k.astype(jnp.float32), b.astype(jnp.float32),
                        tkf, None if tb is None else tb.astype(jnp.float32))
                    x = conv2d(x, kc.astype(x.dtype),
                               None if bc is None else bc.astype(x.dtype),
                               stride=1, padding=(kc.shape[0] - 1) // 2,
                               relu=tail_relu)
                else:
                    x = conv2d(x, k, b, stride=1, padding=pad)
                    x = conv2d(x, tkf.astype(x.dtype),
                               None if tb is None else tb.astype(x.dtype),
                               stride=1, padding=1, relu=tail_relu)
            else:
                x = conv2d(x, k, b, stride=1, padding=pad)
            if return_preshuffle and last:
                return x
            x = pixel_shuffle(x, shuffle)
        return x


def last_shuffle_factor(scale: int) -> int:
    """Shuffle factor skipped by ``return_preshuffle`` for this scale."""
    return _STAGES[scale][-1][1]


def split_tail_kernels(up_params: dict, scale: int, tail_kernel, tail_bias,
                       dtype, pre_kernel=None, pre_bias=None):
    """Branch-B tail as TWO convs instead of one fold: ``composed_tail_kernel``
    composes the final commuted RGB tail INTO the 64-channel kernel, which
    inflates the B tail's MACs through the rank-3 RGB bottleneck (x2:
    7x7 64->12 = 37.6k MACs/px vs 5x5 64->12 + 3x3 12->12 = 20.5k; x4:
    150k vs 24k). This returns ((k_mid, b_mid), (k_fin, b_fin)):

      k_mid: [pre o stage-chain] WITHOUT the RGB tail — 5x5 (with pre),
             64 -> 3*r_mid^2 at base resolution, where r_mid is the chain's
             cumulative shuffle (2 at x2; 2 at x4 — only the FIRST stage,
             see below; 3 at x3; 6 at x6).
      k_fin: the RGB tail (x4: stage 2 AND the tail) commuted through every
             shuffle to base resolution — a small 3*r_mid^2 -> 3*scale^2
             conv applied AFTER k_mid.

    Same interior math as the fold; the border ring differs (two zero-pads
    instead of one — the same deviation class, documented in
    PERFORMANCE.md). Apply k_fin with ``conv2d_tail_packed`` on the (free)
    width-2 repack of k_mid's output.
    """
    from transformerupscaler_tpu.ops.conv import compose_conv3x3_kernels

    cf = jnp.float32
    stages = _STAGES[scale]
    tb = None if tail_bias is None else tail_bias.astype(cf)
    tk = tail_kernel.astype(cf)
    k0 = up_params[f"s{scale}_c0_kernel"].astype(cf)
    b0 = up_params[f"s{scale}_c0_bias"].astype(cf)
    if len(stages) == 1:
        r = stages[0][1]
        k_fin = commute_conv_through_shuffle(tk, r)
        b_fin = None if tb is None else jnp.repeat(tb, r * r)
        k_mid, b_mid = k0, b0
    else:
        assert scale == 4 and len(stages) == 2
        # Stage 2 o tail at 2x, all commuted to base: 3x3, 12 -> 48.
        k1 = up_params["s4_c1_kernel"].astype(cf)
        b1 = up_params["s4_c1_bias"].astype(cf)
        t2 = commute_conv_through_shuffle(tk, 2)
        tb2 = None if tb is None else jnp.repeat(tb, 4)
        u, ub = compose_conv3x3_kernels(k1, b1, t2, tb2)  # 5x5 @2x
        k_fin = commute_conv_through_shuffle(u, 2)  # 3x3, 12 -> 48 @base
        b_fin = None if ub is None else jnp.repeat(ub, 4)
        # Same output-phase permutation as composed_tail_kernel: k_fin's
        # outputs come out (o, a2, b2, a1, b1) where the final 4x pixel is
        # (4h + 2*a1 + a2, 4w + 2*b1 + b2); permute to pixel_shuffle(4)
        # order (o, i, j) with i = 2*a1 + a2, j = 2*b1 + b2.
        o = tk.shape[3]
        perm = []
        for oc in range(o):
            for i in range(4):
                for j in range(4):
                    a1, a2 = i // 2, i % 2
                    b1_, b2 = j // 2, j % 2
                    perm.append(((((oc * 2 + a2) * 2 + b2) * 2 + a1) * 2
                                 + b1_))
        perm = jnp.asarray(perm)
        k_fin = k_fin[..., perm]
        b_fin = None if b_fin is None else b_fin[perm]
        k_mid, b_mid = k0, b0
    if pre_kernel is not None:
        k_mid, b_mid = compose_conv3x3_kernels(
            pre_kernel.astype(cf),
            None if pre_bias is None else pre_bias.astype(cf), k_mid, b_mid)
    # k_fin/b_fin stay f32: the fold rounds ONE composed kernel to the
    # compute dtype; rounding the finish separately would add a second
    # weight-rounding term on the B image (tail_finish_stream's
    # hi_lo_fin splits the f32 finish weights losslessly in-kernel).
    return ((k_mid.astype(dtype), None if b_mid is None else
             b_mid.astype(dtype)),
            (k_fin, b_fin))


def composed_tail_kernel(up_params: dict, scale: int, tail_kernel, tail_bias,
                         dtype, pre_kernel=None, pre_bias=None):
    """Fold an entire Upsampler chain (+ optional preceding conv + trailing
    tail conv) into ONE base-resolution conv whose outputs are
    pixel_shuffle(``scale``)-ordered channels.

    For the single-stage scales (2, 3, 6) this is the existing
    compose_tails form: compose(stage conv, commute(tail, r)). For scale 4
    (reference FastTransformer/utils.py:57-68 chains TWO conv+shuffle(2)
    stages, the second running on 4x the pixel area — the measured worst
    matrix row) the second stage and the tail are ADDITIONALLY commuted
    through the first shuffle, so all tail compute lands at base
    resolution: tail' = commute(tail, 2) at 2x; U = stage2 o tail' (5x5);
    U' = commute(U, 2) at base (3x3, 4n -> 16o); K = stage1 o U' (5x5,
    n -> 16o) — ~5x fewer MACs than running stage 2 at 2x resolution. The
    nested phase order (o, a2, b2, a1, b1) is permuted to shuffle-4 order
    (o, 2*a1+a2, 2*b1+b2) at trace time.

    Composition zero-pads the input instead of each intermediate, so a
    border ring at base resolution deviates from the sequential form (same
    class of deviation as ``compose_tail``; ring width = composed pad).
    Returns (kernel, bias); apply with same-padding and then
    ``pixel_shuffle(scale)`` / ``resize_shuffled(..., scale, ...)``.
    """
    from transformerupscaler_tpu.ops.conv import compose_conv3x3_kernels

    stages = _STAGES[scale]
    # All composition arithmetic runs in f32; the composed result is cast to
    # ``dtype`` ONCE on return. Composing in bf16 accumulates rounding
    # through the channel contraction and measured a systematic +0.2 dB GT
    # PSNR loss on the serving path (tools/headline_quality.py).
    cf = jnp.float32
    tb = None if tail_bias is None else tail_bias.astype(cf)
    tk = tail_kernel.astype(cf)
    if len(stages) == 1:
        r = stages[0][1]
        tko = commute_conv_through_shuffle(tk, r)
        tbo = None if tb is None else jnp.repeat(tb, r * r)
        k0 = up_params[f"s{scale}_c0_kernel"].astype(cf)
        b0 = up_params[f"s{scale}_c0_bias"].astype(cf)
        kc, bc = compose_conv3x3_kernels(k0, b0, tko, tbo)
    else:
        assert scale == 4 and len(stages) == 2
        k0 = up_params["s4_c0_kernel"].astype(cf)
        b0 = up_params["s4_c0_bias"].astype(cf)
        k1 = up_params["s4_c1_kernel"].astype(cf)
        b1 = up_params["s4_c1_bias"].astype(cf)
        o = tk.shape[3]
        # Tail through the second shuffle, composed with stage 2 (at 2x res).
        t2 = commute_conv_through_shuffle(tk, 2)
        tb2 = None if tb is None else jnp.repeat(tb, 4)
        u, ub = compose_conv3x3_kernels(k1, b1, t2, tb2)  # 5x5, n -> 4o @2x
        # That whole thing through the first shuffle, composed with stage 1.
        u2 = commute_conv_through_shuffle(u, 2)  # 3x3, 4n -> 16o @base
        ub2 = None if ub is None else jnp.repeat(ub, 4)
        kc, bc = compose_conv3x3_kernels(k0, b0, u2, ub2)  # 5x5, n -> 16o
        # Output channels are ordered (o, a2, b2, a1, b1) where the final
        # 4x pixel is (4h + 2*a1 + a2, 4w + 2*b1 + b2); permute to
        # pixel_shuffle(4) order (o, i, j) with i = 2*a1 + a2, j = 2*b1 + b2.
        perm = []
        for oc in range(o):
            for i in range(4):
                for j in range(4):
                    a1, a2 = i // 2, i % 2
                    b1_, b2 = j // 2, j % 2
                    perm.append(((((oc * 2 + a2) * 2 + b2) * 2 + a1) * 2 + b1_))
        perm = jnp.asarray(perm)
        kc = kc[..., perm]
        bc = None if bc is None else bc[perm]
    if pre_kernel is not None:
        kc, bc = compose_conv3x3_kernels(
            pre_kernel.astype(cf),
            None if pre_bias is None else pre_bias.astype(cf), kc, bc)
    return kc.astype(dtype), None if bc is None else bc.astype(dtype)
