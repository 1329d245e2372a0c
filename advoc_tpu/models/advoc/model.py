"""Adversarial vocoder models: U-Net magnitude repairer + patch discriminator.

Capability parity with the reference's expected ``models/advoc/model.py``
(SURVEY.md §2.1 #7–#8, #11), redesigned TPU-first:

* NHWC layout, static shapes, channel counts kept in multiples of the lane
  width where it matters.
* The generator "repairs" the heuristic magnitude estimate in the
  *normalized-dB* domain ([0, 1], same scale as the r9y9 mel features) and
  predicts a **residual** on top of the estimate — the paper describes the
  generator as fixing the heuristic inversion, and a residual head makes the
  identity the trivial init (SURVEY.md §2.1 #7, med-confidence on the
  reference's exact head; revisit per SURVEY §8.3 if the mount appears).
* Decoder upsampling is conv_transpose k=4/s=2 (kernel an exact multiple of
  stride → uniform tap coverage, none of the classic checkerboard). Measured
  per-forward on v5e (B=32, 256×512, slope-timed): conv_transpose 21.8 ms /
  pixel-shuffle 45.9 ms / resize+conv 133.9 ms, with equal 300-step eval L1
  (0.0179 vs 0.0184) — SURVEY §7.3 #4's transpose-padding worry is a TF1
  weight-porting concern, not relevant to a from-scratch model.
* GroupNorm instead of TF1 batchnorm: stateless (no running-average plumbing
  through jit), batch-size independent, and identical math per replica under
  data parallelism.
* The 513-bin spectrogram is processed as a 512-bin image (power-of-two for
  the U-Net); the Nyquist bin passes through from the estimate unchanged —
  the mel filterbank has no support there (fmax 7600 < 11025 Hz), so the
  estimate is already exact for that bin.

The small-footprint variant (SURVEY.md §2.1 #11) is ``AdvocConfig(width=32)``
or less — a config, not separate code, matching the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AdvocConfig:
    """Hyperparameters of the advoc GAN (reference: model class attrs)."""

    n_frames: int = 256          # STFT frames per training chunk
    n_freq: int = 513            # rfft bins (512 processed + Nyquist)
    width: int = 64              # base channel count; 32/16 = small variant
    depth: int = 6               # U-Net down/up levels (256×512 → 4×8)
    disc_width: int = 64
    disc_layers: int = 4
    norm_groups: int = 8
    dtype: str = "bfloat16"      # compute dtype for conv stacks
    # Decoder upsampling: "convtranspose" (k4/s2 — fastest, see _Up),
    # "subpixel" (the convtranspose map exactly, re-parametrized as a k2/s1
    # conv + parity interleave; measured 3× SLOWER end-to-end — the
    # interleave's misaligned sub-lane shuffles dominate; kept for the
    # negative result + exact-equivalence test), "pixelshuffle" (3×3 conv +
    # depth-to-space), or "resize" (nearest ×2 + 4×4 conv; slowest).
    upsample: str = "convtranspose"
    # fast_head: predict the residual's 2×2 sub-pixels at half resolution and
    # depth-to-space to full res — removes the two full-resolution convs.
    # Measured on v5e: U-Net forward 53.6 ms vs 71.3 ms (B=32×256×512), but
    # eval L1 after 300 matched steps 0.0223 vs 0.0184 — a 21% quality cost.
    # Default False (quality); the latency-focused small config enables it.
    fast_head: bool = False
    # freq_pack: fold this many adjacent frequency bins into input channels
    # (space-to-depth on the freq axis) before the U-Net and unfold after
    # the head. Same pixel coverage and parameter count, but every level
    # runs at 1/freq_pack the spatial width with freq_pack× the channel
    # density — which is what the MXU wants. The profiler showed the
    # full-resolution tail dominating the unpacked forward: up5 at 256×512
    # with cout=64 ran at ~12% MXU and the cout=1 head filled 1/128 lanes;
    # together 23.5 ms of a 44 ms forward (v5e, B=64). Measured forward /
    # 1000-step eval-L1 A/B over 3 seeds (BASELINE.md): pack1 43.8 ms /
    # 0.0256±0.0031, pack2 22.0 ms / 0.0239±0.0021, pack4 11.4 ms /
    # 0.0305±0.0018, pack8 5.5 ms / 0.0317±0.0041. Default 2: quality-safe
    # at 2× speed; 4/8 are throughput modes with a real (~19%) L1 cost.
    # Must divide n_freq−1.
    freq_pack: int = 2
    # Head conv kernel size (k×k). The head is lane-starved on the MXU
    # whatever its kernel (cout = freq_pack ≤ 8 of 128 lanes), so its cost
    # is ~linear in taps: k=4 is 5.8 ms of the B=64 forward, k=1 ≈ 0.5 ms.
    # 1000-step eval-L1 A/B over 3 seeds: k=1 0.0221±0.0006 vs k=4
    # 0.0229±0.0003 — the up-stack features already carry the receptive
    # field, so the cheap head is also the equal-or-better head.
    head_kernel: int = 1
    # Loss assembly (SURVEY.md §2.1 #9; loss type unverified in reference —
    # configurable, lsgan default for stability).
    gan_type: str = "lsgan"      # dcgan | lsgan | wgan-gp
    l1_weight: float = 100.0
    gp_weight: float = 10.0      # only used when gan_type == "wgan-gp"
    # Conditioning the discriminator sees alongside the magnitude.
    condition_on: str = "estimate"  # estimate | mel
    # packed_tail: EXACT rewrite of the finest decoder level (upN conv-
    # transpose + norm + relu + 1×1 head) that never materializes the
    # interleaved full-resolution activation — the r3 profile showed that
    # level (up5: 7.7 ms of the 17.8 ms B=64 forward at ~19% MXU) is the
    # forward's floor, and that every depth-to-space rewrite loses to the
    # XLA transpose-conv lowering because stride-2 sub-lane interleaves
    # cost 7–24 ms at this shape (see `upsample="subpixel"`). This mode
    # sidesteps the interleave entirely instead of paying it:
    #   * the k4/s2 transpose becomes the k2/s1 conv with 4f output
    #     channels in (p,q,c) block order (same map as subpixel —
    #     equality-tested), which runs with full MXU lanes;
    #   * the freq parity q lands in LANE BLOCKS via a concat of two
    #     f-channel slices (lane-block copy, no stride-2 shuffle);
    #   * the time parity p lands on a MAJOR axis via stack+reshape
    #     (pure tile reordering — the last two dims are untouched);
    #   * norm + relu + head run in this packed layout (GroupNorm stats
    #     and a 1×1 head are permutation-invariant across positions), and
    #     the final bin axis emerges from a CONTIGUOUS reshape:
    #     bin = (2n+q)·pack + k ≡ flattening (n, q, k).
    # Same function, same parameter tree → trained checkpoints load
    # unchanged; needs upsample="convtranspose", head_kernel=1, not
    # fast_head. Measured numbers: BASELINE.md packed-tail section.
    packed_tail: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def _norm(cfg: AdvocConfig, name: str):
    # Norm in the compute dtype (bf16): flax computes the group statistics
    # in f32 internally regardless (normalization._compute_stats upcasts),
    # so this is numerically the f32 norm with bf16-quantized output — and
    # it removes a bf16→f32→bf16 round trip of the full activation tensor
    # at every level (with dtype=f32 the norms were ~28 ms of HBM
    # convert+reduce traffic in a 44 ms B=64 forward, profiler-measured).
    # Params stay f32. dtype=None would NOT do this: flax promotes with the
    # f32 params and emits f32 again.
    return nn.GroupNorm(
        num_groups=cfg.norm_groups, dtype=cfg.compute_dtype,
        param_dtype=jnp.float32, name=name,
    )


class _Down(nn.Module):
    """stride-2 conv → norm → LeakyReLU encoder block."""

    features: int
    cfg: AdvocConfig
    use_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            dtype=self.cfg.compute_dtype,
            name="conv",
        )(x)
        if self.use_norm:
            x = _norm(self.cfg, "norm")(x)
        return nn.leaky_relu(x, 0.2)


class _Up(nn.Module):
    """×2 upsampling decoder block: conv_transpose (default), pixel-shuffle,
    or resize+conv (see AdvocConfig.upsample)."""

    features: int
    cfg: AdvocConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.cfg.upsample == "pixelshuffle":
            b, h, w, _ = x.shape
            x = nn.Conv(
                self.features * 4,
                kernel_size=(3, 3),
                padding="SAME",
                dtype=self.cfg.compute_dtype,
                name="conv",
            )(x)
            # depth-to-space: (B,H,W,4F) → (B,2H,2W,F)
            x = x.reshape(b, h, w, 2, 2, self.features)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h * 2, w * 2, self.features
            )
        elif self.cfg.upsample == "convtranspose":
            # k=4, s=2: kernel divides stride evenly → uniform tap coverage,
            # i.e. none of the classic checkerboard; lowest-FLOP option.
            x = nn.ConvTranspose(
                self.features,
                kernel_size=(4, 4),
                strides=(2, 2),
                padding="SAME",
                dtype=self.cfg.compute_dtype,
                name="conv",
            )(x)
        elif self.cfg.upsample == "subpixel":
            # EXACTLY the convtranspose k4/s2 linear map, re-parametrized
            # for the MXU: each output-pixel parity class (p,q) sees a 2×2
            # input window, so the whole transpose is ONE k2/s1 conv with
            # 4F output channels at *half* resolution plus a parity-shifted
            # interleave (kernel map K[u,v,ci,(p,q,c)] = w_t[2u+p, 2v+q,
            # ci, c]; equality asserted to float precision in
            # tests/test_models.py). Motivation: the r3 per-stage profile
            # showed up5 at ~19% MXU (7.7 ms of the 17.8 ms forward), and
            # this form runs the matmul with 4F lanes. MEASURED OUTCOME
            # (v5e, B=64): the parity interleave's misaligned stacks cost
            # far more than the conv saves — 53.3 ms full forward vs 17.7
            # convtranspose; isolated up5 shape: k2 conv 6.0 ms but +24 ms
            # of interleave (pure depth-to-space is +7 ms; every d2s
            # variant loses to convtranspose's 9.5 ms). Keep convtranspose.
            f = self.features
            z = nn.Conv(
                4 * f,
                kernel_size=(2, 2),
                padding=((1, 1), (1, 1)),
                dtype=self.cfg.compute_dtype,
                name="conv",
            )(x)  # (B, H+1, W+1, 4F); rows/cols −1..H−1 of the k2 windows
            b, hp1, wp1, _ = z.shape
            h, w = hp1 - 1, wp1 - 1
            z = z.reshape(b, hp1, wp1, 2, 2, f)
            # y[2m+p, 2n+q] = z_{pq}[m − (1−p), n − (1−q)] — i.e. the p=0
            # blocks come from window rows {m−1, m} (slice [:h]) and p=1
            # from {m, m+1} (slice [1:]); likewise for columns.
            ee = z[:, :h, :w, 0, 0]
            eo = z[:, :h, 1:, 0, 1]
            oe = z[:, 1:, :w, 1, 0]
            oo = z[:, 1:, 1:, 1, 1]
            top = jnp.stack([ee, eo], axis=3)  # (B, h, w, 2, F): q axis
            bot = jnp.stack([oe, oo], axis=3)
            x = jnp.stack([top, bot], axis=2).reshape(b, 2 * h, 2 * w, f)
        elif self.cfg.upsample == "resize":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            x = nn.Conv(
                self.features,
                kernel_size=(4, 4),
                strides=(1, 1),
                padding="SAME",
                dtype=self.cfg.compute_dtype,
                name="conv",
            )(x)
        else:
            raise ValueError(f"unknown upsample mode {self.cfg.upsample!r}")
        x = _norm(self.cfg, "norm")(x)
        return nn.relu(x)


class _ConvParams(nn.Module):
    """Declares `kernel`/`bias` exactly as nn.Conv/nn.ConvTranspose would
    (same names, shapes, initializers, f32 param dtype) without building the
    op — the packed-tail forward consumes the weights directly, and the
    parameter tree stays identical to the default path so checkpoints are
    interchangeable."""

    shape: tuple  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.shape[-1],))
        return k, b


class _NormParams(nn.Module):
    """`scale`/`bias` matching nn.GroupNorm's parameters."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.features,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return s, b


class _PackedTailUp(nn.Module):
    """The finest _Up level (convtranspose k4/s2 + GroupNorm + ReLU) computed
    in the packed layout (B, 2H, W, 2f) where lane index q·f+c holds output
    pixel (2n+q, c) — see AdvocConfig.packed_tail. Exact same function and
    parameter tree as `_Up(features, cfg, name=...)`."""

    features: int
    cfg: AdvocConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg, f = self.cfg, self.features
        bsz, h, w_sp, cin = x.shape
        wt, bias = _ConvParams((4, 4, cin, f), name="conv")()
        scale, nbias = _NormParams(f, name="norm")()
        use_kernel = (
            cfg.compute_dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and (h // 2) % 8 == 0
        )
        s1_l = s2_l = None
        if use_kernel:
            # Fused Pallas path: conv + bias + parity interleave + the
            # GroupNorm Σy/Σy² reductions in one VMEM pass — the planar
            # transpose-conv output never exists in HBM and the stats cost
            # no extra HBM read (ops/pallas/packed_up.py; parity test
            # tests/test_pallas.py).
            from advoc_tpu.ops.pallas.packed_up import packed_up

            y, s1_l, s2_l = packed_up(
                x.astype(jnp.bfloat16), wt, bias, f=f,
                tm=16 if (h // 2) % 16 == 0 else 8,
                with_stats=True,
            )
        else:
            # XLA fallback: ONE k(2,3)/s1 conv whose output is already
            # column-aligned per freq parity. Base map (subpixel,
            # equality-tested): z_pq = Conv_k2_pad11(x) with
            # K2[u,v] = wt[2u+p, 2v+q], and y[2m+p, 2n+q, c] =
            # z_pq[m+p, n+q, c]. The n+q column shift would cost a
            # 1-sublane relayout of the full tensor, so it is folded into
            # the kernel instead: a 3-wide column window at offsets
            # {−1, 0, +1} holds q=0's taps at {−1, 0} and q=1's at
            # {0, +1} (one third of the taps structurally zero — 1.5× the
            # minimum conv FLOPs, far cheaper than any post-hoc shuffle
            # at this shape). Output channel order is p-major (p, q, c),
            # so each time-parity's (q, c) lane block is a CONTIGUOUS
            # 2f-lane slice — no concat.
            w4 = wt.reshape(2, 2, 2, 2, cin, f)      # [u, p, v, q, ci, c]
            K3 = jnp.zeros((2, 3, cin, 4 * f), wt.dtype)
            for p in (0, 1):
                for q in (0, 1):
                    blk = slice((2 * p + q) * f, (2 * p + q + 1) * f)
                    # q=0: window cols {n−1, n} → k3 taps {0, 1};
                    # q=1: window cols {n, n+1} → k3 taps {1, 2}.
                    K3 = K3.at[:, 0 + q, :, blk].set(w4[:, p, 0, q])
                    K3 = K3.at[:, 1 + q, :, blk].set(w4[:, p, 1, q])
            z = jax.lax.conv_general_dilated(
                x.astype(cfg.compute_dtype), K3.astype(cfg.compute_dtype),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (B, h+1, w, 4f); full 4f lanes on the MXU
            z = z + jnp.tile(bias, 4).astype(z.dtype)
            # p → major-axis interleave: row slice [p:p+h] and lane-block
            # slice are tile-granular; stack+reshape touch only dims
            # above (w, lanes).
            rows = [
                z[:, p : p + h, :, 2 * p * f : 2 * (p + 1) * f]
                for p in (0, 1)
            ]
            y = jnp.stack(rows, axis=2).reshape(bsz, 2 * h, w_sp, 2 * f)
        # GroupNorm in the packed layout: group g pools lanes {q·f + c :
        # c ∈ group g} for BOTH q — the same element sets as the standard
        # layout (stats are permutation-invariant), so the math is exactly
        # _norm's GroupNorm (f32 stats, bf16 out). Implemented as matmul
        # reductions + one fused affine pass so every op runs with full
        # 128-lane minors (a (…, 2, G, f/G)-view version measured ~4 ms
        # slower: elementwise f32 at 8/128 lane efficiency over 537 MB).
        G = cfg.norm_groups
        lane_group = jnp.tile(
            jnp.repeat(jnp.arange(G), f // G), 2
        )  # (2f,) group id per packed lane
        M = jax.nn.one_hot(lane_group, G, dtype=jnp.float32)  # (2f, G)
        if s1_l is None:
            # Per-lane reductions first (multiply+reduce fuses into one
            # read pass over y — no full-size f32 temporary), then the tiny
            # (B, 2f) results project onto groups. The kernel path gets
            # these for free from its VMEM-resident chunks.
            y2 = y.reshape(bsz, 2 * h * w_sp, 2 * f)
            s1_l = jnp.einsum(
                "bnc->bc", y2, preferred_element_type=jnp.float32
            )
            s2_l = jnp.einsum(
                "bnc,bnc->bc", y2, y2, preferred_element_type=jnp.float32
            )
        s1 = s1_l @ M
        s2 = s2_l @ M
        count = 2 * h * w_sp * 2 * (f // G)
        mean_g = s1 / count
        var_g = s2 / count - jnp.square(mean_g)
        inv_g = jax.lax.rsqrt(var_g + 1e-6)  # (B, G)
        # Fold (x − μ)·inv·scale + bias into x·A + B per (batch, lane).
        scale_l = jnp.tile(scale, 2)  # packed lane c_lane = q·f + c
        bias_l = jnp.tile(nbias, 2)
        inv_l = inv_g @ M.T  # (B, 2f)
        mean_l = mean_g @ M.T
        A = inv_l * scale_l
        B = bias_l - mean_l * A
        y = (
            y.astype(jnp.float32) * A[:, None, None, :] + B[:, None, None, :]
        ).astype(cfg.compute_dtype)
        return nn.relu(y)


class AdvocGenerator(nn.Module):
    """U-Net: heuristic magnitude estimate (normalized dB) → repaired estimate.

    Input/output: (B, n_frames, n_freq) in [0, 1] (normalized-dB domain, the
    same scale as r9y9 mel values). Residual head: output = clip(est + Δ).
    """

    cfg: AdvocConfig = AdvocConfig()

    @nn.compact
    def __call__(self, est: Array, truncate_after: str | None = None) -> Array:
        """``truncate_after``: profiling hook — return ``mean(x)`` right
        after the named stage (``down0``…, ``bottleneck``, ``up0``…,
        ``head``). Everything later is dead-code-eliminated by XLA, so
        slope-timing successive truncations yields the *fused* incremental
        cost of each stage (standalone per-block timings overcount by the
        inter-block HBM traffic that fusion removes). No effect when None."""
        cfg = self.cfg
        assert est.shape[-1] == cfg.n_freq, est.shape

        def cut(x, name):
            return jnp.mean(x.astype(jnp.float32)) if name == truncate_after else None
        body, nyquist = est[..., : cfg.n_freq - 1], est[..., cfg.n_freq - 1 :]
        p = cfg.freq_pack
        n_bins = cfg.n_freq - 1
        assert n_bins % max(p, 1) == 0, (n_bins, p)
        bsz, t = body.shape[0], body.shape[1]
        # Space-to-depth on the freq axis: (B, T, bins) → (B, T, bins/p, p).
        # p=1 reproduces the classic single-channel spectrogram image.
        x = (body * 2.0 - 1.0).astype(cfg.compute_dtype)
        x = x.reshape(bsz, t, n_bins // p, p)  # NHWC

        # Channel schedule: width, 2w, 4w, 8w, 8w, ... capped at 8w.
        feats: Sequence[int] = [
            min(cfg.width * (2**i), cfg.width * 8) for i in range(cfg.depth)
        ]

        skips = []
        for i, f in enumerate(feats):
            x = _Down(f, cfg, use_norm=(i > 0), name=f"down{i}")(x)
            skips.append(x)
            if (c := cut(x, f"down{i}")) is not None:
                return c

        # Bottleneck conv keeps receptive field growing without more halving.
        x = nn.Conv(
            feats[-1],
            (3, 3),
            padding="SAME",
            dtype=cfg.compute_dtype,
            name="bottleneck",
        )(x)
        x = nn.relu(x)
        if (c := cut(x, "bottleneck")) is not None:
            return c

        use_packed_tail = cfg.packed_tail and not cfg.fast_head
        if use_packed_tail and (
            cfg.upsample != "convtranspose" or cfg.head_kernel != 1
        ):
            raise ValueError(
                "packed_tail requires upsample='convtranspose' and "
                f"head_kernel=1 (got {cfg.upsample!r}, {cfg.head_kernel})"
            )
        n_ups = len(feats) if not cfg.fast_head else len(feats) - 1
        for i, f in enumerate(list(reversed(feats))[:n_ups]):
            last = i == n_ups - 1
            skip = skips[len(feats) - 1 - i]
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            if last and use_packed_tail:
                # Packed finest level: x stays (B, T/2, W, 2f) with output
                # pixel (2n+q, c) at lane q·f+c; the head below consumes
                # this layout directly and the bin axis falls out of a
                # contiguous reshape. Same params/function as _Up + head.
                x = _PackedTailUp(f, cfg, name=f"up{i}")(x)
            else:
                x = _Up(f, cfg, name=f"up{i}")(x)
            if (c := cut(x, f"up{i}")) is not None:
                return c

        if cfg.fast_head:
            # Half-res head: concat the finest skip, predict the residual's
            # 2×2 spatial sub-pixels (× p packed bins) with one 3×3 conv,
            # depth-to-space to full res. Saves both finest-level convs.
            x = jnp.concatenate([x, skips[0].astype(x.dtype)], axis=-1)
            d = nn.Conv(
                4 * p, (3, 3), padding="SAME", dtype=cfg.compute_dtype,
                name="head",
            )(x).astype(jnp.float32)
            _, h, w, _ = d.shape
            delta = (
                d.reshape(bsz, h, w, 2, 2, p)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(bsz, h * 2, w * 2 * p)
            )
        elif use_packed_tail:
            # 1×1 head in the packed layout: x is (B, T, W, 2f) with pixel
            # (2n+q, c) at lane q·f+c. The head's (f → p) map applies per
            # q block with shared weights, and flattening (n, q, k) IS the
            # bin axis: bin = (2n+q)·p + k. One contiguous reshape — the
            # interleave never exists as a shuffle.
            f = feats[0]
            wh, bh = _ConvParams((1, 1, f, p), name="head")()
            # Block-diagonal (2f → 2p) matmul: lane q·f+c maps to output
            # lane q·p+k with the shared (f → p) head weights — one full-
            # lane matmul instead of a tiny-minor 5D einsum. Flattening
            # (w, q, k) IS the bin axis: bin = (2n+q)·p + k.
            Wblk = jnp.zeros((2 * f, 2 * p), wh.dtype)
            Wblk = Wblk.at[:f, :p].set(wh[0, 0])
            Wblk = Wblk.at[f:, p:].set(wh[0, 0])
            delta = (
                x @ Wblk.astype(cfg.compute_dtype)
                + jnp.tile(bh, 2).astype(cfg.compute_dtype)
            ).astype(jnp.float32)
            delta = delta.reshape(bsz, t, n_bins)
        else:
            # Head in compute dtype with p output channels (the packed
            # bins), unpacked back to the bin axis. The old unpacked head
            # (cout=1 at 256×512, f32 input) filled 1/128 MXU lanes and
            # upcast an 8.6 GB activation — ~11 ms at B=64 by itself.
            delta = nn.Conv(
                p,
                (cfg.head_kernel, cfg.head_kernel),
                padding="SAME",
                dtype=cfg.compute_dtype,
                name="head",
            )(x).astype(jnp.float32)
            delta = delta.reshape(bsz, t, n_bins)

        repaired = jnp.clip(body + delta, 0.0, 1.0)
        return jnp.concatenate([repaired, nyquist], axis=-1)


class PatchDiscriminator(nn.Module):
    """PatchGAN over (condition, magnitude) pairs (SURVEY.md §2.1 #8).

    Inputs are (B, n_frames, n_freq) normalized-dB images; returns a patch
    logit map (B, n_frames/2^L, n_freq/2^L, 1).
    """

    cfg: AdvocConfig = AdvocConfig()

    @nn.compact
    def __call__(self, condition: Array, mag: Array) -> Array:
        cfg = self.cfg
        if condition.shape[-1] != mag.shape[-1]:
            # condition_on="mel": the 80-bin mel condition is resampled onto
            # the n_freq axis (linear interp; both live in the same
            # normalized-dB [0,1] domain) so it stacks with the magnitude as
            # a second channel.
            condition = jax.image.resize(
                condition,
                condition.shape[:-1] + (mag.shape[-1],),
                method="linear",
            )
        x = jnp.stack([condition, mag], axis=-1) * 2.0 - 1.0
        # Trim the Nyquist bin so spatial dims stay power-of-two.
        x = x[..., : cfg.n_freq - 1, :].astype(cfg.compute_dtype)
        # Same freq space-to-depth as the generator: p adjacent bins fold
        # into channels ([f0·cond, f0·mag, f1·cond, f1·mag, …] per group),
        # so the first conv fills MXU lanes instead of running a 2-channel
        # conv at full 512-bin width. Patch logits cover p× more bins each.
        p = cfg.freq_pack
        if p > 1:
            bsz, t, f, c = x.shape
            x = x.reshape(bsz, t, f // p, p * c)
        for i in range(cfg.disc_layers):
            f = min(cfg.disc_width * (2**i), cfg.disc_width * 8)
            stride = (2, 2) if i < cfg.disc_layers - 1 else (1, 1)
            x = nn.Conv(
                f,
                (4, 4),
                strides=stride,
                padding="SAME",
                dtype=cfg.compute_dtype,
                name=f"conv{i}",
            )(x)
            if i > 0:
                x = _norm(cfg, f"norm{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(
            1, (4, 4), padding="SAME", dtype=jnp.float32, name="logit"
        )(x.astype(jnp.float32))


def small_config(**overrides) -> AdvocConfig:
    """AdVoc-small: reduced-width generator for low-latency streaming
    vocoding (SURVEY.md §2.1 #11; BASELINE config 4)."""
    base = dict(width=24, depth=6, disc_width=32, n_frames=64, fast_head=True)
    base.update(overrides)
    return AdvocConfig(**base)
