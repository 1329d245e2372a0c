"""Fused Pallas transpose-conv for the U-Net's finest decoder level.

The r3 per-stage profile (BASELINE.md) showed the finest ×2 ConvTranspose
(`up5`: 128+64 → 64 ch at 256×256-equivalent, B=64) is 43% of the generator
forward at ~19% MXU, and that every XLA-graph rewrite loses: the exact
subpixel re-parametrization pays 7–24 ms in stride-2 sub-lane shuffles, the
k2/s1 conv alone runs at ~40% MXU, and even a "major-dim" stack+reshape
interleave of the full-res activation costs 3.3 ms in XLA because the
537 MB tensor makes an extra HBM round trip. The only structure that wins
is FUSION: compute the transpose-conv as matmuls in VMEM and write the
output already interleaved, so the planar form never exists in HBM.

Kernel design (one grid step = one `tm`-row chunk of one batch image):

* **Exact subpixel decomposition, column-aligned form.** For parity (p, q):
  ``y[2m+p, 2n+q, c] = Σ_{u,v} x[m+p−1+u, n+q−1+v] · wt[2u+p, 2v+q, c]``
  (the subpixel map, equality-tested against nn.ConvTranspose). The freq-
  parity column shift is folded into a 3-wide tap window — q=0's taps sit
  at column offsets {0, 1}, q=1's at {1, 2}, one third of the taps are
  structurally zero — so every output block reads the SAME input columns:
  ``z[i, n, (p,q,c)] = Σ_{u,vv} xp[i+u, n+vv] · K3[u, vv]``. 1.5× the
  minimum conv FLOPs, but the kernel then contains no sub-lane extraction
  at all.
* **Flat-M matmuls.** A first version ran one (W, cin) @ (cin, 4f) dot per
  z-row — 52k M=128 matmuls whose issue latency, not FLOPs, set the time
  (9.6 ms measured vs 3 ms of work). This version exploits that the padded
  input rows are CONTIGUOUS in memory: with the image flattened to
  ``((rows)·WP, cin)``, tap (u, vv) is the single flat offset ``u·WP + vv``
  and a whole chunk is SIX ((tm+1)·WP, cin) @ (cin, 4f) dots — M=2312 at
  the production shape, fully amortizing MXU issue latency. Output columns
  n ≥ W alias into the next row's taps; they are junk lanes that the
  zero right-pad keeps from polluting valid columns, and they are dropped
  when the chunk is emitted.
* **Parity interleave in registers.** Row parity p selects z rows
  ``[p : p+tm]`` (major-dim slice) and its aligned 128-lane tile
  ``[p·2f, (p+1)·2f)``; the (m, p) → 2m+p stack+reshape happens on
  chunk-sized register values (last two dims untouched), then ONE
  contiguous store per chunk writes the interleaved rows.
* **Fused GroupNorm statistics.** The consumer (`_PackedTailUp`) needs
  per-(batch, lane) Σy and Σy² for GroupNorm; computing them in XLA costs
  an extra full HBM read of the 537 MB output. The chunk's y is already
  in registers here, so the kernel reduces it and accumulates into tiny
  (B, 2f) outputs via Pallas block revisiting (all chunks of one batch
  image are consecutive grid steps → the accumulator block stays resident
  in VMEM).
* **Input revisiting.** Each chunk DMAs its own (tm+3)·WP-row flat slab
  (~1.3 MB); consecutive chunks re-read a 3-row overlap (≈20% extra HBM
  traffic, ~0.2 ms at the production shape).

Output layout is the packed-tail layout of
``models/advoc/model.py::_PackedTailUp``: ``(B, 2H, W, 2f)`` with output
pixel ``(2n+q, c)`` at lane ``q·f+c`` — its norm/head consume it directly
and the bin axis falls out of a contiguous reshape.

Numerics: bf16 operands with f32 accumulation (``preferred_element_type``),
matching XLA's bf16 conv; parity with the XLA path is asserted in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _packed_up_kernel(
    xp_ref,    # (B, HP·WP, cin) HBM — flattened padded input (bf16)
    w_ref,     # (6, cin, 4f) VMEM — K3 taps, tap t = u*3+vv, bf16
    b_ref,     # (1, 4f) VMEM — bias per (p,q,c) block, bf16
    out_ref,   # (1, 2tm, W, 2f) VMEM — this chunk's interleaved output
    s1_ref,    # (1, 2f) VMEM f32 — Σy per lane, revisited per batch image
    s2_ref,    # (1, 2f) VMEM f32 — Σy² per lane
    slab,      # (slab_flat, cin) VMEM bf16 — DMA'd flat input window
    sem,
    *,
    h: int,
    w: int,
    f: int,
    tm: int,
    wp: int,
    slab_flat: int,
):
    bidx = pl.program_id(0)
    r = pl.program_id(1)           # row-half index (0 or 1)
    c = pl.program_id(2)           # chunk within the half
    mc = r * (h // 2) + c * tm     # first pre-parity output row of the chunk
    dma = pltpu.make_async_copy(
        xp_ref.at[bidx, pl.ds(mc * wp, slab_flat)], slab, sem
    )
    dma.start()
    dma.wait()

    mp = (tm + 1) * wp
    acc = jnp.zeros((mp, 4 * f), jnp.float32)
    for u in (0, 1):
        for vv in (0, 1, 2):
            off = u * wp + vv
            acc += jax.lax.dot_general(
                slab[pl.ds(off, mp)],
                w_ref[u * 3 + vv],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # Flat → (z-rows, padded cols); drop the junk pad columns.
    z3 = acc.reshape(tm + 1, wp, 4 * f)[:, :w, :]
    zb = z3.astype(jnp.bfloat16) + b_ref[0]
    # Row parity p: rows [p : p+tm], lane tile [p·2f, (p+1)·2f) — both
    # tile-granular; the (m, p) stack+reshape leaves the last two dims
    # untouched (pure register reordering).
    halves = [zb[p : p + tm, :, 2 * p * f : 2 * (p + 1) * f] for p in (0, 1)]
    y = jnp.stack(halves, axis=1).reshape(2 * tm, w, 2 * f)
    out_ref[0] = y
    # GroupNorm partials over this chunk, accumulated across the image's
    # grid steps (the (r, c) steps of one batch image are consecutive, so
    # the (1, 2f) block is revisited in VMEM).
    yf = y.astype(jnp.float32)
    s1p = jnp.sum(yf, axis=(0, 1))[None]
    s2p = jnp.sum(yf * yf, axis=(0, 1))[None]
    first = jnp.logical_and(r == 0, c == 0)

    @pl.when(first)
    def _():
        s1_ref[:] = s1p
        s2_ref[:] = s2p

    @pl.when(jnp.logical_not(first))
    def _():
        s1_ref[:] += s1p
        s2_ref[:] += s2p


@functools.partial(
    jax.jit, static_argnames=("f", "tm", "with_stats", "interpret")
)
def packed_up(
    x: Array,
    wt: Array,
    bias: Array,
    *,
    f: int,
    tm: int = 16,
    with_stats: bool = False,
    interpret: bool = False,
):
    """Fused transpose-conv k4/s2 → packed layout (+ optional norm stats).

    x: (B, H, W, cin) bf16; wt: (4, 4, cin, f) the nn.ConvTranspose kernel;
    bias: (f,). Returns (B, 2H, W, 2f) bf16 in the packed-tail layout; with
    ``with_stats=True`` also returns (B, 2f) f32 Σy and Σy² per lane.
    """
    b, h, w, cin = x.shape
    assert (h // 2) % tm == 0, (h, tm)
    # K3 taps: z[i, n, (2p+q)f+c] = Σ_{u,vv} xp[i+u, n+vv]·K3[u·3+vv].
    # q=0 ← window cols {n, n+1} → taps {0, 1}; q=1 ← {n+1, n+2} → {1, 2}.
    w4 = wt.reshape(2, 2, 2, 2, cin, f)  # [u, p, v, q, ci, c]
    k3 = jnp.zeros((2, 3, cin, 4 * f), wt.dtype)
    for p in (0, 1):
        for q in (0, 1):
            blk = slice((2 * p + q) * f, (2 * p + q + 1) * f)
            k3 = k3.at[:, 0 + q, :, blk].set(w4[:, p, 0, q])
            k3 = k3.at[:, 1 + q, :, blk].set(w4[:, p, 1, q])
    k3 = k3.reshape(6, cin, 4 * f)
    # Pad in XLA (fuses with the producing concat upstream). The row pitch
    # WP is 8-aligned so every chunk's flat DMA offset (mc·WP) stays
    # sublane-aligned; the ≥7 zero right-pad columns keep the flat taps'
    # next-row aliasing out of valid output columns. Channels pad to the
    # 128-lane tile (Mosaic DMA slices must be lane-tile aligned — K=cin
    # already costs ⌈cin/128⌉ MXU passes, so the zero channels are free).
    wp = -(-(w + 2) // 8) * 8
    hp = h + 3  # 1 top pad + h rows + slab overrun margin
    cp = -(-cin // 128) * 128
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (1, hp - h - 1), (1, wp - w - 1), (0, cp - cin)),
    ).reshape(b, hp * wp, cp)
    k3 = jnp.pad(k3, ((0, 0), (0, cp - cin), (0, 0)))
    cin = cp
    slab_flat = (tm + 3) * wp
    kern = functools.partial(
        _packed_up_kernel,
        h=h, w=w, f=f, tm=tm, wp=wp, slab_flat=slab_flat,
    )
    n_chunks = (h // 2) // tm
    y, s1, s2 = pl.pallas_call(
        kern,
        grid=(b, 2, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 2 * tm, w, 2 * f),
                lambda bi, r, c, nc=n_chunks: (bi, r * nc + c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * f), lambda bi, r, c: (bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * f), lambda bi, r, c: (bi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2 * h, w, 2 * f), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, 2 * f), jnp.float32),
            jax.ShapeDtypeStruct((b, 2 * f), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab_flat, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        xp,
        k3.astype(jnp.bfloat16),
        jnp.tile(bias, 4)[None].astype(jnp.bfloat16),
    )
    if with_stats:
        return y, s1, s2
    return y
