"""Op-level parity vs PyTorch primitives: windows, pixel shuffle, patch
embed/unembed, relative-position machinery, attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from transformerupscaler_tpu.ops import (
    patch_embed,
    patch_unembed,
    pixel_shuffle,
    relative_position_index,
    window_partition,
    window_reverse,
)
from transformerupscaler_tpu.ops.attention import (
    multihead_attention,
    window_attention,
)
from transformerupscaler_tpu.ops.relpos import gather_relative_bias


def test_window_partition_reverse_roundtrip(rng):
    x = rng.random((2, 16, 24, 5)).astype(np.float32)
    w = window_partition(jnp.asarray(x), 8)
    assert w.shape == (2, 2 * 3, 64, 5)
    back = window_reverse(w, 8, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_window_partition_matches_torch_layout(rng):
    # Same permute order as the reference window_partition
    # (models/WindowTransformer/model.py:29-43).
    x = rng.random((1, 8, 8, 2)).astype(np.float32)
    got = np.asarray(window_partition(jnp.asarray(x), 4))
    t = torch.from_numpy(x)
    tw = t.view(1, 2, 4, 2, 4, 2).permute(0, 1, 3, 2, 4, 5).reshape(1, -1, 16, 2)
    np.testing.assert_array_equal(got, tw.numpy())


@pytest.mark.parametrize("r", [2, 3, 6])
def test_pixel_shuffle_matches_torch(rng, r):
    b, c, h, w = 2, 3, 5, 7
    x = rng.random((b, c * r * r, h, w)).astype(np.float32)
    want = F.pixel_shuffle(torch.from_numpy(x), r).numpy()  # NCHW
    got = np.asarray(pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), r))
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)


def test_patch_embed_matches_conv2d(rng):
    b, c, h, w, d, ps = 2, 64, 24, 32, 48, 8
    x = rng.standard_normal((b, c, h, w)).astype(np.float32)
    wt = rng.standard_normal((d, c, ps, ps)).astype(np.float32) * 0.05
    bias = rng.standard_normal((d,)).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(wt),
                    torch.from_numpy(bias), stride=ps).numpy()
    kernel = jnp.asarray(wt.transpose(2, 3, 1, 0))  # (ps, ps, C, D)
    got = np.asarray(patch_embed(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 kernel, jnp.asarray(bias)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-4)


def test_patch_unembed_matches_conv_transpose2d(rng):
    b, d, ht, wt_, c, ps = 2, 48, 3, 4, 64, 8
    x = rng.standard_normal((b, d, ht, wt_)).astype(np.float32)
    wt = rng.standard_normal((d, c, ps, ps)).astype(np.float32) * 0.05
    bias = rng.standard_normal((c,)).astype(np.float32)
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(wt),
                              torch.from_numpy(bias), stride=ps).numpy()
    kernel = jnp.asarray(wt.transpose(0, 2, 3, 1))  # (D, ps, ps, C)
    got = np.asarray(patch_unembed(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                   kernel, jnp.asarray(bias)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-4)


def test_relative_position_index_matches_torch():
    # Recompute the reference's index construction
    # (models/WindowTransformer/model.py:87-97) with torch as oracle.
    ws = 8
    coords = torch.stack(torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    want = rel.sum(-1).numpy()
    np.testing.assert_array_equal(relative_position_index(ws), want)


def test_gather_relative_bias(rng):
    ws, heads = 4, 3
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32)
    bias = np.asarray(gather_relative_bias(jnp.asarray(table), ws))
    idx = relative_position_index(ws)
    want = table[idx.reshape(-1)].reshape(ws * ws, ws * ws, heads).transpose(2, 0, 1)
    np.testing.assert_allclose(bias, want, atol=1e-6)


def _torch_window_attention(x, qkv_w, qkv_b, proj_w, proj_b, table, heads, ws):
    """Oracle computed with torch primitives following the reference math
    (models/WindowTransformer/model.py:102-131)."""
    b, n, c = x.shape
    hd = c // heads
    qkv = (x @ qkv_w.T + qkv_b).view(b, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    idx = torch.from_numpy(relative_position_index(ws).astype(np.int64))
    bias = table[idx.view(-1)].view(ws * ws, ws * ws, -1).permute(2, 0, 1)[None]
    attn = (attn + bias).softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, c)
    return out @ proj_w.T + proj_b


@pytest.mark.parametrize("impl", ["xla"])
def test_window_attention_matches_torch(rng, impl):
    b, heads, ws, c = 6, 4, 8, 32
    n = ws * ws
    x = rng.standard_normal((b, n, c)).astype(np.float32)
    qkv_w = rng.standard_normal((3 * c, c)).astype(np.float32) * 0.1
    qkv_b = rng.standard_normal((3 * c,)).astype(np.float32) * 0.1
    proj_w = rng.standard_normal((c, c)).astype(np.float32) * 0.1
    proj_b = rng.standard_normal((c,)).astype(np.float32) * 0.1
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32) * 0.02

    want = _torch_window_attention(
        torch.from_numpy(x), torch.from_numpy(qkv_w), torch.from_numpy(qkv_b),
        torch.from_numpy(proj_w), torch.from_numpy(proj_b),
        torch.from_numpy(table), heads, ws,
    ).numpy()

    got = np.asarray(window_attention(
        jnp.asarray(x), jnp.asarray(qkv_w.T), jnp.asarray(qkv_b),
        jnp.asarray(proj_w.T), jnp.asarray(proj_b), jnp.asarray(table),
        num_heads=heads, window_size=ws, impl=impl,
    ))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_multihead_attention_matches_torch(rng):
    b, n, c, heads = 2, 60, 32, 4
    x = rng.standard_normal((b, n, c)).astype(np.float32)
    mha = torch.nn.MultiheadAttention(c, heads, dropout=0.0, batch_first=True)
    with torch.no_grad():
        want, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    in_w = mha.in_proj_weight.detach().numpy()
    in_b = mha.in_proj_bias.detach().numpy()
    out_w = mha.out_proj.weight.detach().numpy()
    out_b = mha.out_proj.bias.detach().numpy()
    got = np.asarray(multihead_attention(
        jnp.asarray(x), jnp.asarray(in_w.T), jnp.asarray(in_b),
        jnp.asarray(out_w.T), jnp.asarray(out_b), num_heads=heads,
    ))
    np.testing.assert_allclose(got, want.numpy(), atol=3e-5, rtol=1e-4)
