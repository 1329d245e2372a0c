"""GAN loss assembly and fused alternating train steps (SURVEY.md §2.1 #9).

Every step below is a single pure function jitted once: featurization (STFT →
mel → heuristic estimate), the D update, and the G update all live in ONE XLA
computation per step, so a training step never leaves the chip (the reference
ran two separate session.run dispatches per iteration, SURVEY.md §3.1).

Data parallelism: steps are built against a ``jax.sharding.Mesh`` with a
``('data',)`` axis. Params/opt-states are replicated, batches sharded on
'data'; jit's global-view semantics make XLA insert the psum gradient
reductions over ICI automatically (SURVEY.md §2.4 — the one required
parallelism mode).
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from advoc_tpu.ops import spectral
from advoc_tpu.ops.reference import AudioParams

Array = jax.Array

# ln(256): the μ-law expansion constant. The encode half lives in
# data.loader._MULAW_LN256 — the two must stay equal (asserted in
# tests/test_data.py) or the int8 wire silently decodes wrong.
_MULAW_LN256 = math.log(256.0)


class TrainState(train_state.TrainState):
    """flax TrainState; one for G, one for D (disjoint param sets)."""


class GanLosses(NamedTuple):
    d_loss: Callable[[Array, Array], Array]  # (real_logits, fake_logits) → scalar
    g_loss: Callable[[Array], Array]  # (fake_logits) → scalar
    needs_gp: bool


def gan_losses(gan_type: str) -> GanLosses:
    """The three loss families the reference family plausibly used
    (SURVEY.md §2.1 #9 — type unverified, hence configurable)."""
    if gan_type == "dcgan":  # sigmoid cross-entropy (non-saturating G)
        def d(real, fake):
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(real, jnp.ones_like(real))
            ) + jnp.mean(
                optax.sigmoid_binary_cross_entropy(fake, jnp.zeros_like(fake))
            )

        def g(fake):
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(fake, jnp.ones_like(fake))
            )

        return GanLosses(d, g, False)
    if gan_type == "lsgan":  # least-squares GAN
        def d(real, fake):
            return 0.5 * (jnp.mean((real - 1.0) ** 2) + jnp.mean(fake**2))

        def g(fake):
            return 0.5 * jnp.mean((fake - 1.0) ** 2)

        return GanLosses(d, g, False)
    if gan_type == "wgan-gp":
        def d(real, fake):
            return jnp.mean(fake) - jnp.mean(real)

        def g(fake):
            return -jnp.mean(fake)

        return GanLosses(d, g, True)
    raise ValueError(f"unknown gan_type {gan_type!r}")


def gradient_penalty(
    d_fn: Callable[[Any, Array], Array],
    params,
    real: Array,
    fake: Array,
    rng: Array,
) -> Array:
    """WGAN-GP penalty on interpolates; d_fn(params, x) → logits."""
    eps_shape = (real.shape[0],) + (1,) * (real.ndim - 1)
    eps = jax.random.uniform(rng, eps_shape, dtype=real.dtype)
    interp = eps * real + (1.0 - eps) * fake

    def d_sum(x):
        return jnp.sum(d_fn(params, x))

    grads = jax.grad(d_sum)(interp)
    norms = jnp.sqrt(
        jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=-1) + 1e-12
    )
    return jnp.mean((norms - 1.0) ** 2)


# ---------------------------------------------------------------------------
# On-device featurization for advoc training (SURVEY.md §3.1 L1/L2 boundary).
# ---------------------------------------------------------------------------


def as_waveform(batch: Array) -> Array:
    """Normalize a loader batch to float32 waveform on device.

    int16 batches (``loader.decode_extract_and_batch(out_dtype="int16")`` —
    half the host→device bytes; the H2D transfer is the training bottleneck
    on slow interconnects) carry round(x·32768), the inverse of the wav
    decoder's /32768 — exact for PCM16 sources. int8 batches carry μ-law
    companded samples (``out_dtype="mulaw8"``, quarter the f32 bytes, ~38 dB
    quantization SNR) and are expanded here — but that wire FAILED the
    training quality gate (log-domain targets amplify the μ-law floor;
    eval L1 0.32 vs 0.022 — BASELINE.md r4 and ``loader.mulaw8_encode``).
    Float batches pass through. Called at the top of every jitted train/eval
    step so the conversion happens on device, after the cheap transfer.
    """
    if batch.dtype == jnp.int8:
        # |y| clamped to 1 so a foreign −128 (never produced by
        # mulaw8_encode, which clips to ±127) still decodes inside [−1, 1].
        y = jnp.clip(batch.astype(jnp.float32) * (1.0 / 127.0), -1.0, 1.0)
        return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * _MULAW_LN256) / 255.0)
    if jnp.issubdtype(batch.dtype, jnp.integer):
        return batch.astype(jnp.float32) * (1.0 / 32768.0)
    return batch.astype(jnp.float32)


def featurize_advoc(
    wav: Array, n_frames: int, params: AudioParams
) -> tuple[Array, Array, Array]:
    """waveform batch (B, L) → (mel, est_norm, mag_norm), each (B, n_frames, ·).

    All in the [0,1] normalized-dB domain. mag_norm is the real target the
    generator should recover; est_norm is the heuristic pinv estimate.
    Accepts int16 loader batches (see :func:`as_waveform`).
    """
    wav = as_waveform(wav)
    mag = spectral.waveform_to_magspec(wav, params)  # (B, T, F) linear
    mag = mag[:, :n_frames, :]
    mag_norm = spectral.normalize_db(
        spectral.amp_to_db(mag, params) - params.ref_level_db, params
    )
    mel = spectral.magspec_to_r9y9_melspec(mag, params)  # (B, T, M)
    est = spectral.r9y9_melspec_to_magspec(mel, params)  # (B, T, F) linear
    est_norm = spectral.normalize_db(
        spectral.amp_to_db(est, params) - params.ref_level_db, params
    )
    return mel, est_norm, mag_norm


# ---------------------------------------------------------------------------
# Advoc (mel→magnitude U-Net GAN) fused train/eval steps.
# ---------------------------------------------------------------------------


def make_advoc_train_step(
    g_model,
    d_model,
    cfg,
    audio_params: AudioParams,
):
    """Build the fused advoc GAN step: (gstate, dstate, wav, rng) → updated.

    One jit region: featurize → D update (on fresh fake) → G update
    (adversarial + λ·L1), alternating exactly like the reference's two
    session.run calls (SURVEY.md §3.1) but without leaving the device.
    """
    losses = gan_losses(cfg.gan_type)

    def step(gstate: TrainState, dstate: TrainState, wav: Array, rng: Array):
        mel, est, real = featurize_advoc(wav, cfg.n_frames, audio_params)
        cond = est if cfg.condition_on == "estimate" else mel
        rng_d, _ = jax.random.split(rng)

        # --- D update (G frozen) ---
        fake = g_model.apply({"params": gstate.params}, est)
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(dparams):
            real_logits = d_model.apply({"params": dparams}, cond, real)
            fake_logits = d_model.apply({"params": dparams}, cond, fake)
            loss = losses.d_loss(real_logits, fake_logits)
            if losses.needs_gp:
                loss = loss + cfg.gp_weight * gradient_penalty(
                    lambda p, x: d_model.apply({"params": p}, cond, x),
                    dparams,
                    real,
                    fake,
                    rng_d,
                )
            return loss, (jnp.mean(real_logits), jnp.mean(fake_logits))

        (d_loss, (rl, fl)), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            dstate.params
        )
        dstate = dstate.apply_gradients(grads=d_grads)

        # --- G update (D frozen, fresh D params) ---
        def g_loss_fn(gparams):
            fake2 = g_model.apply({"params": gparams}, est)
            fake_logits = d_model.apply({"params": dstate.params}, cond, fake2)
            adv = losses.g_loss(fake_logits)
            l1 = jnp.mean(jnp.abs(fake2 - real))
            return adv + cfg.l1_weight * l1, (adv, l1)

        (g_loss, (adv, l1)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gstate.params
        )
        gstate = gstate.apply_gradients(grads=g_grads)

        metrics = {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "g_adv": adv,
            "g_l1": l1,
            "d_real_logit": rl,
            "d_fake_logit": fl,
        }
        return gstate, dstate, metrics

    return step


def make_advoc_eval_step(g_model, cfg, audio_params: AudioParams):
    """Eval metric step: spectrogram L1 of repaired vs real magnitude — the
    parity metric named in BASELINE.md (SURVEY.md §3.2)."""

    def step(gparams, wav: Array):
        mel, est, real = featurize_advoc(wav, cfg.n_frames, audio_params)
        fake = g_model.apply({"params": gparams}, est)
        return {
            "eval_l1_repaired": jnp.mean(jnp.abs(fake - real)),
            "eval_l1_heuristic": jnp.mean(jnp.abs(est - real)),
        }

    return step


# ---------------------------------------------------------------------------
# WaveGAN fused step (SURVEY.md §3.5): n_critic D updates + 1 G update.
# ---------------------------------------------------------------------------


def make_wavegan_train_step(g_model, d_model, cfg):
    """(gstate, dstate, wav (n_critic, B, T), rng) → updated states.

    The n_critic D updates run as a lax.scan over per-critic batches (the
    WaveGAN recipe), then one G update — all one jit region.
    """
    losses = gan_losses(cfg.gan_type)

    def d_update(dstate, gparams, real, rng):
        z_rng, gp_rng, ps_rng = jax.random.split(rng, 3)
        z = jax.random.normal(z_rng, (real.shape[0], cfg.latent_dim))
        fake = jax.lax.stop_gradient(g_model.apply({"params": gparams}, z))

        def d_loss_fn(dparams):
            rl = d_model.apply({"params": dparams}, real, rng=ps_rng)
            fl = d_model.apply({"params": dparams}, fake, rng=ps_rng)
            loss = losses.d_loss(rl, fl)
            if losses.needs_gp:
                loss = loss + cfg.gp_weight * gradient_penalty(
                    lambda p, x: d_model.apply({"params": p}, x, rng=ps_rng),
                    dparams,
                    real,
                    fake,
                    gp_rng,
                )
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dstate.params)
        return dstate.apply_gradients(grads=d_grads), d_loss

    def step(gstate: TrainState, dstate: TrainState, wav: Array, rng: Array):
        assert wav.ndim == 3, "wavegan step wants (n_critic, B, T)"
        wav = as_waveform(wav)
        rngs = jax.random.split(rng, cfg.n_critic + 1)

        def critic_body(ds, inp):
            real, r = inp
            ds, dl = d_update(ds, gstate.params, real, r)
            return ds, dl

        dstate, d_losses = jax.lax.scan(
            critic_body, dstate, (wav, rngs[: cfg.n_critic])
        )

        z_rng, ps_rng = jax.random.split(rngs[-1])
        z = jax.random.normal(z_rng, (wav.shape[1], cfg.latent_dim))

        def g_loss_fn(gparams):
            fake = g_model.apply({"params": gparams}, z)
            fl = d_model.apply({"params": dstate.params}, fake, rng=ps_rng)
            return losses.g_loss(fl)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(gstate.params)
        gstate = gstate.apply_gradients(grads=g_grads)
        return gstate, dstate, {"d_loss": jnp.mean(d_losses), "g_loss": g_loss}

    return step


# ---------------------------------------------------------------------------
# Conditional (mel→waveform) WaveGAN step: adversarial + mel-reconstruction.
# ---------------------------------------------------------------------------


def make_cond_wavegan_train_step(g_model, d_model, cfg, audio_params: AudioParams):
    """(gstate, dstate, wav (B, T·hop), rng) → updated states.

    Mels are extracted from the real waveforms on-device; G maps mel →
    waveform; D judges (waveform, mel) pairs; G additionally minimizes the
    re-extracted-mel L1 of its output (the framework's canonical fidelity
    metric, computed entirely on-chip).
    """
    losses = gan_losses(cfg.gan_type)

    def step(gstate: TrainState, dstate: TrainState, wav: Array, rng: Array):
        rng_d, rng_ps, rng_ps2 = jax.random.split(rng, 3)
        wav = as_waveform(wav)
        mel = spectral.waveform_to_r9y9_melspec(wav, audio_params)
        mel = mel[:, : cfg.n_frames, :]
        real = wav[:, : cfg.slice_len]

        fake = jax.lax.stop_gradient(g_model.apply({"params": gstate.params}, mel))

        def d_loss_fn(dparams):
            rl = d_model.apply({"params": dparams}, real, mel, rng=rng_ps)
            fl = d_model.apply({"params": dparams}, fake, mel, rng=rng_ps)
            loss = losses.d_loss(rl, fl)
            if losses.needs_gp:
                loss = loss + cfg.gp_weight * gradient_penalty(
                    lambda p, x: d_model.apply({"params": p}, x, mel, rng=rng_ps),
                    dparams,
                    real,
                    fake,
                    rng_d,
                )
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dstate.params)
        dstate = dstate.apply_gradients(grads=d_grads)

        def g_loss_fn(gparams):
            fake2 = g_model.apply({"params": gparams}, mel)
            fl = d_model.apply({"params": dstate.params}, fake2, mel, rng=rng_ps2)
            adv = losses.g_loss(fl)
            mel_fake = spectral.waveform_to_r9y9_melspec(fake2, audio_params)
            mel_l1 = jnp.mean(jnp.abs(mel_fake[:, : cfg.n_frames, :] - mel))
            return adv + cfg.mel_l1_weight * mel_l1, (adv, mel_l1)

        (g_loss, (adv, mel_l1)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(gstate.params)
        gstate = gstate.apply_gradients(grads=g_grads)
        return gstate, dstate, {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "g_adv": adv,
            "g_mel_l1": mel_l1,
        }

    return step


# ---------------------------------------------------------------------------
# MelSpecGAN fused step (SURVEY.md §2.1 #13): DCGAN/WGAN on mel images.
# ---------------------------------------------------------------------------


def make_melspecgan_train_step(g_model, d_model, cfg, audio_params: AudioParams):
    losses = gan_losses(cfg.gan_type)

    def step(gstate: TrainState, dstate: TrainState, wav: Array, rng: Array):
        # wav: (n_critic, B, T) — featurized on-device to mel images.
        mel = spectral.waveform_to_r9y9_melspec(as_waveform(wav), audio_params)
        mel = mel[..., : cfg.n_frames, :]
        rngs = jax.random.split(rng, cfg.n_critic + 1)

        def d_update(ds, inp):
            real, r = inp
            z_rng, gp_rng = jax.random.split(r)
            z = jax.random.normal(z_rng, (real.shape[0], cfg.latent_dim))
            fake = jax.lax.stop_gradient(g_model.apply({"params": gstate.params}, z))

            def d_loss_fn(dparams):
                rl = d_model.apply({"params": dparams}, real)
                fl = d_model.apply({"params": dparams}, fake)
                loss = losses.d_loss(rl, fl)
                if losses.needs_gp:
                    loss = loss + cfg.gp_weight * gradient_penalty(
                        lambda p, x: d_model.apply({"params": p}, x),
                        dparams,
                        real,
                        fake,
                        gp_rng,
                    )
                return loss

            dl, dg = jax.value_and_grad(d_loss_fn)(ds.params)
            return ds.apply_gradients(grads=dg), dl

        dstate, d_losses = jax.lax.scan(d_update, dstate, (mel, rngs[: cfg.n_critic]))

        z = jax.random.normal(rngs[-1], (mel.shape[1], cfg.latent_dim))

        def g_loss_fn(gparams):
            fake = g_model.apply({"params": gparams}, z)
            return losses.g_loss(d_model.apply({"params": dstate.params}, fake))

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(gstate.params)
        gstate = gstate.apply_gradients(grads=g_grads)
        return gstate, dstate, {"d_loss": jnp.mean(d_losses), "g_loss": g_loss}

    return step


# ---------------------------------------------------------------------------
# State construction + data-parallel jit wiring.
# ---------------------------------------------------------------------------


def adam(lr: float = 2e-4, b1: float = 0.5, b2: float = 0.999) -> optax.GradientTransformation:
    """pix2pix-style Adam (the reference's optimizer family, SURVEY §2.1 #9)."""
    return optax.adam(lr, b1=b1, b2=b2)


def make_states(g_model, d_model, g_init_args, d_init_args, seed: int = 0,
                g_tx=None, d_tx=None) -> tuple[TrainState, TrainState]:
    rng = jax.random.PRNGKey(seed)
    g_rng, d_rng = jax.random.split(rng)
    g_vars = g_model.init(g_rng, *g_init_args)
    d_vars = d_model.init(d_rng, *d_init_args)
    gstate = TrainState.create(
        apply_fn=g_model.apply, params=g_vars["params"], tx=g_tx or adam()
    )
    dstate = TrainState.create(
        apply_fn=d_model.apply, params=d_vars["params"], tx=d_tx or adam()
    )
    return gstate, dstate


def jit_data_parallel(step_fn, mesh, batch_axis: int = 0, donate: bool = True):
    """jit a (gstate, dstate, batch, rng) step for DP over mesh axis 'data'.

    Params/opt-states are replicated on the mesh at first call; each batch is
    sharded along ``batch_axis``. jit's global-view semantics then make XLA
    insert the psum gradient reduction over ICI (SURVEY §2.4 — DP is the one
    required parallelism mode). States are donated (buffers reused in-place).
    """
    from advoc_tpu.parallel import mesh as mesh_lib

    jitted = jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())

    def wrapped(gstate, dstate, batch, rng):
        batch = mesh_lib.shard_batch(batch, mesh, axis=batch_axis)
        gstate, dstate, rng = mesh_lib.replicate((gstate, dstate, rng), mesh)
        return jitted(gstate, dstate, batch, rng)

    return wrapped
