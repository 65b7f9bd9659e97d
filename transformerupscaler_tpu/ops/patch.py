"""Patch embedding / unembedding as pure MXU matmuls.

The reference uses ``nn.Conv2d(C, D, kernel_size=8, stride=8)`` for patch
embedding and ``nn.ConvTranspose2d(D, C, kernel_size=8, stride=8)`` for
unembedding (models/WindowTransformer/model.py:208,218). Because kernel ==
stride with no padding, both are exactly a non-overlapping block reshape plus
one big GEMM — the TPU-native formulation: no conv lowering, one
(B*Ht*Wt, ps*ps*C) x (ps*ps*C, D) matmul that saturates the MXU.

Weight layouts (chosen so the torch converter is a pure transpose):
  - embed kernel:   (ps, ps, C_in, D)   [torch Conv2d (D, C_in, ps, ps)]
  - unembed kernel: (D, ps, ps, C_out)  [torch ConvTranspose2d (D, C_out, ps, ps)]
"""

import jax.numpy as jnp


def patch_embed(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/ps, W/ps, D). H, W must be multiples of ps."""
    ps = kernel.shape[0]
    b, h, w, c = x.shape
    ht, wt = h // ps, w // ps
    if ht == 0 or wt == 0:
        raise ValueError(
            f"Input {h}x{w} is smaller than the patch size {ps}; the token "
            f"grid would be empty (the reference Conv2d errors here too)")
    patches = x.reshape(b, ht, ps, wt, ps, c).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, ht, wt, ps * ps * c)
    wmat = kernel.reshape(ps * ps * c, -1).astype(x.dtype)
    out = jnp.einsum("bhwp,pd->bhwd", patches, wmat)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def patch_embed_packed(xp: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """patch_embed on a width-2-packed input (B, H, W/2, 2C) without ever
    unpacking: the patch reshape groups (ps rows, ps/2 packed cols, 2C lanes)
    and the embed kernel rows are permuted to the packed element order
    (trace-time, free). Bit-identical reduction set to ``patch_embed``.
    """
    ps, _, c, d = kernel.shape
    b, h, wp2, c2 = xp.shape
    psp = ps // 2
    ht, wt = h // ps, wp2 // psp
    patches = xp.reshape(b, ht, ps, wt, psp, c2).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, ht, wt, ps * ps * c)
    # packed element (row, pcol, pxi*c + ch) == pixel (row, 2*pcol + pxi, ch)
    kperm = kernel.reshape(ps, psp, 2, c, d).astype(xp.dtype)
    kperm = kperm.reshape(ps * ps * c, d)
    out = jnp.einsum("bhwp,pd->bhwd", patches, kperm)
    if bias is not None:
        out = out + bias.astype(xp.dtype)
    return out


def patch_unembed_packed(tokens: jnp.ndarray, kernel: jnp.ndarray,
                         bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """patch_unembed producing width-2-packed output (B, Ht*ps, Wt*ps/2, 2C):
    the GEMM output columns are ordered (row, packed col, parity, channel) by
    a trace-time kernel permutation; the inverse block reshape lands directly
    in the packed layout."""
    d, ps, _, c = kernel.shape
    b, ht, wt, _ = tokens.shape
    psp = ps // 2
    kperm = kernel.reshape(d, ps, psp, 2, c).astype(tokens.dtype)
    kperm = kperm.reshape(d, ps * ps * c)
    out = jnp.einsum("bhwd,dp->bhwp", tokens, kperm)
    out = out.reshape(b, ht, wt, ps, psp, 2 * c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, ht * ps, wt * psp, 2 * c)
    if bias is not None:
        out = out + jnp.tile(bias.astype(tokens.dtype), 2)
    return out


def patch_embed_packed_int8(xq: jnp.ndarray, x_scale, kernel: jnp.ndarray,
                            bias: jnp.ndarray | None = None,
                            out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """patch_embed_packed with int8 MXU compute: xq is the already-int8
    packed feature map (scale ``x_scale`` — the serving path reuses the
    tail-conv quantization), weights get per-output-column int8 scales."""
    ps, _, c, d = kernel.shape
    b, h, wp2, c2 = xq.shape
    psp = ps // 2
    ht, wt = h // ps, wp2 // psp
    patches = xq.reshape(b, ht, ps, wt, psp, c2).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, ht, wt, ps * ps * c)
    # Fold the (scalar or per-channel) activation scale into the kernel.
    keff = (kernel.astype(jnp.float32)
            * jnp.asarray(x_scale, jnp.float32).reshape(1, 1, -1, 1))
    kperm = keff.reshape(ps * ps * c, d)
    ks = jnp.max(jnp.abs(kperm), axis=0, keepdims=True) / 127.0
    ks = jnp.where(ks == 0, 1.0, ks)
    kq = jnp.clip(jnp.round(kperm / ks), -127, 127).astype(jnp.int8)
    acc = jnp.einsum("bhwp,pd->bhwd", patches, kq,
                     preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * ks
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def patch_unembed_packed_int8(tokens_q: jnp.ndarray, t_scale,
                              kernel: jnp.ndarray,
                              bias: jnp.ndarray | None = None,
                              out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """patch_unembed_packed with int8 MXU compute; tokens_q int8 with
    per-tensor scale ``t_scale``."""
    d, ps, _, c = kernel.shape
    b, ht, wt, _ = tokens_q.shape
    psp = ps // 2
    keff = (kernel.astype(jnp.float32)
            * jnp.asarray(t_scale, jnp.float32).reshape(-1, 1, 1, 1))
    kperm = keff.reshape(d, ps * ps * c)
    ks = jnp.max(jnp.abs(kperm), axis=0, keepdims=True) / 127.0
    ks = jnp.where(ks == 0, 1.0, ks)
    kq = jnp.clip(jnp.round(kperm / ks), -127, 127).astype(jnp.int8)
    acc = jnp.einsum("bhwd,dp->bhwp", tokens_q, kq,
                     preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * ks
    y = y.reshape(b, ht, wt, ps, psp, 2 * c).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, ht * ps, wt * psp, 2 * c)
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), 2)
    return y.astype(out_dtype)


def patch_unembed(tokens: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, Ht, Wt, D) -> (B, Ht*ps, Wt*ps, C)."""
    d, ps, _, c = kernel.shape
    b, ht, wt, _ = tokens.shape
    wmat = kernel.reshape(d, ps * ps * c).astype(tokens.dtype)
    out = jnp.einsum("bhwd,dp->bhwp", tokens, wmat)
    out = out.reshape(b, ht, wt, ps, ps, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, ht * ps, wt * ps, c)
    if bias is not None:
        out = out + bias.astype(tokens.dtype)
    return out
