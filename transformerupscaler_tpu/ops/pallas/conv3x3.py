"""Pallas 3x3 stride-1 pad-1 conv kernel (NHWC) with fused bias + ReLU.

Why: XLA's TPU conv lowering measures ~30-50 TFLOPs effective on this model's
64-256 channel 3x3 convs (tools/op_bench.py probes) — the conv stack is the
dominant cost of the FastTransformer frame. This kernel rebuilds the conv as
an in-VMEM im2col matmul with the column taps pre-concatenated by XLA:

  - the wrapper builds ``xp3`` (H+2, W, 3C): the three column shifts stacked
    on the lane axis (a single cheap XLA concat; Mosaic cannot concat
    mid-tile lane offsets in-kernel),
  - grid over row blocks; each cell DMAs a (TH+2)-row slab of xp3 from HBM,
  - the three row taps are offset-0 outer-dim slices of the slab, each a
    (TH*W, 3C) x (3C, O) matmul — contraction depth 3C (>= 192 for C >= 64)
    keeps the MXU at full systolic depth instead of per-tap K=C,
  - f32 accumulation, bias and ReLU fused, one output tile write.

Constraints: stride 1, padding 1, kernel 3x3; batch handled by the wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, out_ref, slabs, sems, *, th, tw, nw, ck, o,
            relu, has_bias):
    """Double-buffered over a flat (row-block, col-block) grid: the DMA for
    cell l+1 is in flight while cell l computes (TPU grid cells run
    sequentially, so scratch state persists). Column tiling needs no halo —
    the 3 column taps live in the lane axis of xp3."""
    l = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(l, 2)
    nxt = 1 - slot

    def dma(s, cell):
        bi = cell // nw
        bj = jax.lax.rem(cell, nw)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(bi * th, th + 2), pl.ds(bj * tw, tw)],
            slabs.at[s], sems.at[s])

    @pl.when(l == 0)
    def _():
        dma(slot, l).start()

    @pl.when(l + 1 < n)
    def _():
        dma(nxt, l + 1).start()

    dma(slot, l).wait()

    acc = None
    for dy in range(3):
        group = slabs[slot, dy:dy + th].reshape(th * tw, ck)
        part = jax.lax.dot_general(
            group, w_ref[dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part

    if has_bias:
        acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.reshape(th, tw, o).astype(out_ref.dtype)


def conv3x3_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray | None = None, relu: bool = False,
                   th: int = 8, tw: int | None = None,
                   interpret: bool = False) -> jnp.ndarray:
    """x: (B, H, W, C); kernel: (3, 3, C, O) HWIO. Returns (B, H, W, O)."""
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    dtype = x.dtype

    while h % th:
        th //= 2
    if tw is None:
        # Budget the double slab ~<= 6 MB of VMEM.
        tw = w
        while 2 * (th + 2) * tw * 3 * c * 2 > 6 * 2**20 and tw % 2 == 0 and tw > 128:
            tw //= 2
    while w % tw:
        tw //= 2

    # (3, 3, C, O) -> (3, 3C, O): row-group weights, dx-major/c-minor rows to
    # match the lane order of the xp3 column-tap concat. The tap axis is
    # padded to a 128 multiple — HBM DMA slices need lane-aligned shapes.
    ck = 3 * c
    ck_pad = (-ck) % 128
    wg = kernel.astype(dtype).reshape(3, ck, o)
    if ck_pad:
        wg = jnp.pad(wg, ((0, 0), (0, ck_pad), (0, 0)))
    ck += ck_pad

    has_bias = bias is not None
    bb = (bias.astype(dtype).reshape(1, o) if has_bias
          else jnp.zeros((1, o), dtype))

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # Column taps stacked on lanes: (B, H+2, W, 3C->ck).
    xp3 = jnp.concatenate([xp[:, :, dx:dx + w, :] for dx in range(3)], axis=-1)
    if ck_pad:
        xp3 = jnp.pad(xp3, ((0, 0), (0, 0), (0, 0), (0, ck_pad)))

    nw = w // tw
    fn = pl.pallas_call(
        partial(_kernel, th=th, tw=tw, nw=nw, ck=ck, o=o, relu=relu,
                has_bias=has_bias),
        grid=((h // th) * nw,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, ck, o), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda l: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tw, o), lambda l: (l // nw, l % nw, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, o), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw, ck), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    outs = [fn(xp3[i], wg, bb) for i in range(b)]
    return jnp.stack(outs, axis=0)
