"""Inference-path tests: fused Vocoder, chunk joining, streaming, checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advoc_tpu.data import loader
from advoc_tpu.infer import Vocoder, StreamingVocoder
from advoc_tpu.models.advoc import AdvocConfig, AdvocGenerator, PatchDiscriminator
from advoc_tpu.ops import spectral as sp
from advoc_tpu.ops.reference import DEFAULT_PARAMS
from advoc_tpu.train import gan
from advoc_tpu.train.checkpoint import (
    CheckpointManager,
    export_inference_bundle,
    load_inference_bundle,
)
from advoc_tpu.train.metrics import to_host

P = DEFAULT_PARAMS


@pytest.fixture(scope="module")
def mel():
    wav = jnp.asarray(loader.synthetic_speech(0, 22050 * 2))
    return sp.waveform_to_r9y9_melspec(wav, P)  # (173, 80)


@pytest.fixture(scope="module")
def tiny_g():
    cfg = AdvocConfig(n_frames=64, width=8, depth=4, dtype="float32")
    g = AdvocGenerator(cfg)
    params = g.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.n_frames, cfg.n_freq))
    )["params"]

    def apply(p, est):
        return g.apply({"params": p}, est)

    return cfg, apply, params


class TestVocoder:
    def test_heuristic_vocoder_roundtrip(self, mel):
        voc = Vocoder(params=P, gl_iters=20, chunk_frames=64)
        wav = voc(mel)
        assert wav.shape == (mel.shape[0] * P.hop_length,)
        mel2 = sp.waveform_to_r9y9_melspec(wav, P)[: mel.shape[0]]
        assert float(jnp.abs(mel2 - mel).mean()) < 0.05

    def test_generator_vocoder_runs_chunked(self, mel, tiny_g):
        cfg, apply, params = tiny_g
        voc = Vocoder(
            g_apply=apply, g_params=params, params=P,
            chunk_frames=cfg.n_frames, overlap_frames=8, gl_iters=4,
        )
        wav = voc(mel)  # 173 frames → bucket 192 → 3 chunks of 64
        assert wav.shape == (mel.shape[0] * P.hop_length,)
        assert bool(jnp.isfinite(wav).all())

    def test_bucketing_bounds_compiles(self, mel, tiny_g):
        cfg, apply, params = tiny_g
        voc = Vocoder(
            g_apply=apply, g_params=params, params=P,
            chunk_frames=64, overlap_frames=8, gl_iters=2,
        )
        voc(mel[:100])
        voc(mel[:120])  # same bucket (128)
        assert len(voc._cache) == 1
        voc(mel[:130])  # next bucket (192)
        assert len(voc._cache) == 2

    def test_batched_input(self, mel, tiny_g):
        cfg, apply, params = tiny_g
        voc = Vocoder(g_apply=apply, g_params=params, gl_iters=2, chunk_frames=64)
        mels = jnp.stack([mel[:64], mel[64:128]])
        wavs = voc(mels)
        assert wavs.shape == (2, 64 * P.hop_length)

    def test_identity_generator_join_is_lossless(self, mel):
        """An identity generator through the overlapped chunk/crossfade-join
        must reconstruct the heuristic magnitude (weights normalize out).
        Compared pre-phase-recovery: GL amplifies float noise chaotically."""
        voc_g = Vocoder(
            g_apply=lambda p, est: est, g_params=None, params=P,
            chunk_frames=64, overlap_frames=16, gl_iters=0,
            mel_projection=0.0,  # raw repair: certify the join itself
        )
        voc_h = Vocoder(params=P, chunk_frames=64, gl_iters=0)
        # gl_iters=0 → griffin_lim returns istft of zero-phase mag: linear in
        # mag, so equality here certifies the joined magnitude itself.
        w1, w2 = voc_g(mel[:128]), voc_h(mel[:128])
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=2e-5)


class TestStreamingVocoder:
    def test_stream_chunks(self, mel):
        sv = StreamingVocoder(params=P, chunk_frames=64, overlap_frames=8, gl_iters=4)
        chunks = [np.asarray(mel[i * 64 : (i + 1) * 64]) for i in range(2)]
        outs = [sv.push(c) for c in chunks]
        # Uniform emission contract (r3 feed fix): chunk·hop per push, the
        # first preroll_samples (= overlap·hop) being start padding.
        emit_len = 64 * P.hop_length
        assert sv.preroll_samples == 8 * P.hop_length
        assert all(o.shape == (emit_len,) for o in outs)
        assert np.isfinite(np.concatenate(outs)).all()
        sv.reset()
        assert sv._state_wav is None

    def test_stream_matches_signal_alignment(self, mel):
        """The emitted stream (preroll dropped) must re-extract to the input
        mels ALIGNED from frame 0 — this is the regression test for the r3
        feed-desync fix (the engine previously lost overlap_frames of real
        time per chunk; fixture mel L1 was 0.061, correctly-fed 0.015)."""
        sv = StreamingVocoder(params=P, chunk_frames=64, overlap_frames=8,
                              gl_iters=16)
        chunks = [np.asarray(mel[i * 64 : (i + 1) * 64]) for i in range(2)]
        sig = np.concatenate([sv.push(c) for c in chunks])
        sig = sig[sv.preroll_samples :]
        m2 = sp.waveform_to_r9y9_melspec(jnp.asarray(sig), P)
        n = min(m2.shape[0], 128) - 1
        l1 = float(jnp.abs(m2[:n] - mel[:n]).mean())
        assert l1 < 0.03, l1


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path, tiny_g):
        cfg, _, _ = tiny_g
        g = AdvocGenerator(cfg)
        d = PatchDiscriminator(cfg)
        est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
        gstate, dstate = gan.make_states(g, d, (est0,), (est0, est0))
        mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        bundle = {"g": gstate.params, "d": dstate.params, "step": 7}
        assert mgr.save(7, bundle)
        assert mgr.latest_step() == 7
        restored = mgr.restore(template=bundle)
        for a, b in zip(jax.tree.leaves(bundle), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_restore_or_init_fresh(self, tmp_path, tiny_g):
        cfg, _, params = tiny_g
        mgr = CheckpointManager(tmp_path / "empty")
        state, step = mgr.restore_or_init({"p": params})
        assert step == 0
        mgr.close()

    def test_keep_k_and_poll(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "k", max_to_keep=2)
        for s in [1, 2, 3]:
            mgr.save(s, {"x": np.arange(4.0)})
        # Async saves are only guaranteed visible to (re-reading) pollers
        # once finalized; a real eval poller tolerates the lag, but this
        # test asserts exact yields, so finalize first.
        mgr.wait_until_finished()
        assert mgr.latest_step() == 3
        steps = list(mgr.poll(last_seen=None, interval_s=0.01, timeout_s=0.05))
        assert steps == [3]
        mgr.close()

    def test_inference_bundle(self, tmp_path, tiny_g):
        cfg, _, params = tiny_g
        export_inference_bundle(tmp_path / "bundle", params, {"width": cfg.width})
        p2, conf = load_inference_bundle(tmp_path / "bundle", template=params)
        assert conf["width"] == cfg.width
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bundle_restores_onto_local_default_device(self, tmp_path,
                                                       tiny_g):
        # Regression (r5 runbook rehearsal, aot stage): a bundle exported
        # on one backend must open on another — orbax's default restore
        # replays the SAVED sharding ("Device TFRT_CPU_0 was not found"
        # on the axon backend). Proxy on the 8-device CPU mesh: save from
        # a non-default device, restore (template and metadata paths) must
        # land every leaf on jax.devices()[0], not the saved device.
        cfg, _, params = tiny_g
        other = jax.devices()[3]
        params_d3 = jax.device_put(params, other)
        export_inference_bundle(tmp_path / "b", params_d3, {"w": cfg.width})
        for template in (params, None):
            p2, _ = load_inference_bundle(tmp_path / "b", template=template)
            for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
                assert list(b.devices()) == [jax.devices()[0]], (
                    f"restored onto {b.devices()}, not the default device"
                )
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMetrics:
    def test_to_host_single_transfer(self):
        m = {"a": jnp.float32(1.5), "b": jnp.float32(-2.0)}
        h = to_host(m)
        assert h == {"a": 1.5, "b": -2.0}


class TestShardedVocoder:
    def test_mesh_sharded_matches_single(self, mel, tiny_g):
        import jax

        from advoc_tpu.parallel import data_mesh

        cfg, apply, params = tiny_g
        mesh = data_mesh(8)
        kw = dict(g_apply=apply, g_params=params, chunk_frames=64, gl_iters=2)
        voc1 = Vocoder(**kw)
        voc8 = Vocoder(**kw, mesh=mesh)
        mels = jnp.stack([mel[:64]] * 8)
        w1 = voc1(mels)
        w8 = voc8(mels)
        assert len(w8.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w8), atol=1e-5)

    def test_batch_not_divisible_by_mesh(self, mel, tiny_g):
        from advoc_tpu.parallel import data_mesh

        cfg, apply, params = tiny_g
        voc = Vocoder(g_apply=apply, g_params=params, chunk_frames=64,
                      gl_iters=2, mesh=data_mesh(8))
        mels = jnp.stack([mel[:64]] * 3)  # 3 % 8 != 0 → padded internally
        w = voc(mels)
        assert w.shape == (3, 64 * P.hop_length)
        assert bool(jnp.isfinite(w).all())


class TestStreamingPhaseContinuity:
    def test_phase_carry_does_not_degrade_fidelity(self):
        """Streaming a steady tone with the RTISI-style phase carry must stay
        within 15% of the per-chunk-reset baseline on re-extraction L1.
        (The carry's *benefit* is configuration-dependent: +25% fidelity in a
        4-chunk f32 sweep, ±10% in others — this guards the downside.)"""
        sr = P.sample_rate
        t = np.arange(64 * P.hop_length * 3) / sr
        tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        mel = sp.waveform_to_r9y9_melspec(jnp.asarray(tone), P)
        chunks = [np.asarray(mel[i * 64 : (i + 1) * 64]) for i in range(3)]

        def stream(carry: bool) -> np.ndarray:
            sv = StreamingVocoder(params=P, chunk_frames=64,
                                  overlap_frames=8, gl_iters=8)
            outs = []
            for c in chunks:
                outs.append(sv.push(c))
                if not carry:
                    sv._state_phase = None  # ablate the carry only
            return np.concatenate(outs)[sv.preroll_samples :]

        def fidelity(y: np.ndarray) -> float:
            m = sp.waveform_to_r9y9_melspec(jnp.asarray(y), P)
            n = min(m.shape[0], mel.shape[0])
            return float(jnp.abs(m[8:n] - mel[8:n]).mean())

        err_carry = fidelity(stream(True))
        err_fresh = fidelity(stream(False))
        assert err_carry <= 1.15 * err_fresh, (err_carry, err_fresh)


class TestVocoderPhaseOptions:
    def test_lws_exact_phase_method(self, mel):
        voc = Vocoder(phase_method="lws_exact", gl_iters=2, chunk_frames=64)
        wav = voc(mel[:64])
        assert wav.shape == (64 * P.hop_length,)
        mel2 = sp.waveform_to_r9y9_melspec(wav, P)[:64]
        assert float(jnp.abs(mel2 - mel[:64]).mean()) < 0.08

    def test_phase_impl_validation(self, mel):
        with pytest.raises(ValueError, match="phase_impl"):
            Vocoder(phase_impl="nope")
        # pallas explicitly requested off-TPU must fail loudly, not silently
        # fall back (tests run on the forced CPU mesh).
        voc = Vocoder(phase_impl="pallas", chunk_frames=64)
        if not voc._on_tpu:
            with pytest.raises(ValueError, match="pallas"):
                voc(mel[:64])

    def test_auto_is_xla_on_cpu(self, mel):
        voc = Vocoder(phase_impl="auto", chunk_frames=64)
        assert not voc._use_pallas(64) or voc._on_tpu
        wav = voc(mel[:64])
        assert bool(jnp.isfinite(wav).all())


class TestMultiStreamVocoder:
    """n_streams batches independent streams per push (VERDICT r2 weak #3):
    per-stream outputs must match the single-stream path exactly."""

    def _mels(self, n, chunks=3, seed=0):
        import numpy as np

        from advoc_tpu.data import loader
        from advoc_tpu.ops import spectral

        out = []
        for s in range(n):
            wav = loader.synthetic_speech(seed + s, 64 * chunks * P.hop_length)
            mel = spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
            out.append(np.asarray(mel[: 64 * chunks]).reshape(chunks, 64, P.n_mels))
        return np.stack(out)  # (n, chunks, 64, M)

    def test_batched_matches_single_stream(self):
        import numpy as np

        n, chunks = 4, 3
        mels = self._mels(n, chunks)
        sv = StreamingVocoder(params=P, chunk_frames=64, overlap_frames=8,
                              gl_iters=3, n_streams=n)
        batched = [sv.push(mels[:, c]) for c in range(chunks)]
        for s in range(n):
            ref = StreamingVocoder(params=P, chunk_frames=64,
                                   overlap_frames=8, gl_iters=3)
            for c in range(chunks):
                single = ref.push(mels[s, c])
                np.testing.assert_allclose(
                    batched[c][s], single, rtol=0, atol=1e-6,
                    err_msg=f"stream {s} chunk {c}",
                )

    def test_per_stream_reset(self):
        import numpy as np

        n, chunks = 3, 2
        mels = self._mels(n, chunks, seed=10)
        sv = StreamingVocoder(params=P, chunk_frames=64, overlap_frames=8,
                              gl_iters=3, n_streams=n)
        sv.push(mels[:, 0])
        sv.reset(stream=1)  # stream 1 starts a new utterance
        out = sv.push(mels[:, 1])
        fresh = StreamingVocoder(params=P, chunk_frames=64, overlap_frames=8,
                                 gl_iters=3)
        first = fresh.push(mels[1, 1])
        np.testing.assert_allclose(out[1], first, rtol=0, atol=1e-6)

    def test_shape_validation(self):
        import pytest

        sv = StreamingVocoder(params=P, chunk_frames=64, n_streams=2)
        with pytest.raises(AssertionError):
            sv.push(np.zeros((64, P.n_mels), np.float32))


class TestStreamingLWSEngine:
    """phase_engine="lws_online": true causal streaming phase recovery
    (spectral.lws_online_push + carried streaming iSTFT). Sample-exact
    equality with the offline path cannot be asserted across different jit
    graph shapes — phase recovery is chaotic under 1-ulp magnitude
    differences (measured: 1e-6 mag perturbation → O(0.1) waveform
    divergence, for fast-GL too; same reason the fp16 uplink is gated on
    spectral fidelity). The asserted contracts: determinism at fixed
    shapes, per-stream row independence, and spectral fidelity parity with
    the offline `lws_online` pipeline."""

    CH, LA, SW = 16, 1, 1  # small shapes: the scan step compiles once

    def _mel(self, chunks, seed=0):
        from advoc_tpu.data import loader

        wav = loader.synthetic_speech(
            seed, self.CH * chunks * P.hop_length
        )
        mel = sp.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
        return np.asarray(mel[: self.CH * chunks]).reshape(
            chunks, self.CH, P.n_mels
        )

    def _sv(self, n=1):
        return StreamingVocoder(
            params=P, chunk_frames=self.CH, n_streams=n,
            phase_engine="lws_online", lws_look_ahead=self.LA,
            lws_sweeps=self.SW,
        )

    def test_validation(self):
        with pytest.raises(ValueError):
            StreamingVocoder(params=P, phase_engine="rtisi")

    def test_deterministic_and_spectral_fidelity(self):
        chunks = 6
        mel = self._mel(chunks)
        sv = self._sv()
        outs = [sv.push(mel[c]) for c in range(chunks)]
        stream = np.concatenate(outs)
        assert outs[0].shape == (self.CH * P.hop_length,)
        # Same input after reset → bit-identical emission (fixed shapes).
        sv.reset()
        outs2 = [sv.push(mel[c]) for c in range(chunks)]
        np.testing.assert_array_equal(np.concatenate(outs2), stream)
        # Spectral fidelity parity with the offline lws_online pipeline on
        # the aligned region (stream output = offline delayed by look_ahead
        # frames plus the n_fft//2 pre-roll).
        flat = jnp.asarray(mel.reshape(-1, P.n_mels))
        off = np.asarray(
            sp.r9y9_melspec_to_waveform(
                flat, n_iters=self.SW, phase_method="lws_online", params=P
            )
        )
        sig = stream[sv.preroll_samples + self.LA * P.hop_length :]
        n_fr = len(sig) // P.hop_length - 1
        tgt = np.asarray(flat)[:n_fr]

        def l1(w):
            m = np.asarray(
                sp.waveform_to_r9y9_melspec(jnp.asarray(w), P)
            )[:n_fr]
            return np.abs(m - tgt).mean()

        l1_stream, l1_off = l1(sig), l1(off)
        assert abs(l1_stream - l1_off) < 0.02, (l1_stream, l1_off)
        assert l1_stream < 0.15, l1_stream

    def test_identical_streams_emit_identically(self):
        mel = self._mel(2, seed=3)
        sv = self._sv(n=2)
        for c in range(2):
            out = sv.push(np.stack([mel[c], mel[c]]))
            np.testing.assert_array_equal(out[0], out[1])

    def test_mel_context_validation(self):
        with pytest.raises(ValueError):
            StreamingVocoder(params=P, phase_engine="gl", mel_context=4)
        with pytest.raises(ValueError):
            StreamingVocoder(
                params=P, chunk_frames=16, phase_engine="lws_online",
                mel_context=17,
            )

    @pytest.mark.parametrize("ctx", [0, 4])
    def test_mel_context_alignment(self, ctx):
        """mel_context delays emission by exactly ctx frames, and
        `latency_frames` accounts for it: an impulse-like mel event must
        land at its own frame position after alignment, for any ctx."""
        chunks = 4
        mel = np.zeros((chunks * self.CH, P.n_mels), np.float32)
        ev = 37  # event frames 37..39, well inside chunk 3 of 4
        mel[ev : ev + 3] = 0.9
        sv = StreamingVocoder(
            params=P, chunk_frames=self.CH, phase_engine="lws_online",
            lws_look_ahead=self.LA, lws_sweeps=self.SW, mel_context=ctx,
        )
        assert sv.latency_frames == self.LA + ctx
        outs = [
            sv.push(mel[c * self.CH : (c + 1) * self.CH])
            for c in range(chunks)
        ]
        stream = np.concatenate(outs)
        sig = stream[
            sv.preroll_samples + sv.latency_frames * P.hop_length :
        ]
        hop = P.hop_length
        e = np.array([
            (sig[k * hop : (k + 1) * hop] ** 2).sum()
            for k in range(len(sig) // hop)
        ])
        peak = int(np.argmax(e))
        assert abs(peak - (ev + 1)) <= 2, (peak, ev, ctx)
        # and the pre-event region is near-silent (amp-floor level)
        assert e[: ev - 4].max() < 1e-3 * e.max(), ctx

    def test_per_stream_reset_is_row_independent(self):
        mel_a = self._mel(2, seed=4)
        mel_b = self._mel(2, seed=5)
        sv = self._sv(n=2)
        sv.push(np.stack([mel_a[0], mel_b[0]]))
        sv.reset(stream=1)
        out = sv.push(np.stack([mel_a[1], mel_b[0]]))
        sv2 = self._sv(n=2)
        out2 = sv2.push(np.stack([mel_a[0], mel_b[0]]))
        # Slot 1 was fresh in both runs with the same content; slot 0's
        # differing state must not leak across rows.
        np.testing.assert_allclose(out[1], out2[1], rtol=0, atol=1e-6)


class TestStreamingBlockLWSEngine:
    """phase_engine="lws_block": the block-parallel LWS arrival schedule
    behind the same streaming contract (carry, look_ahead latency, pre-roll)
    as the lws_online engine. Contracts: determinism, spectral-fidelity
    proximity to the sequential engine (the schedules are different
    algorithms, so proximity not equality — measured within 7% mel L1 on
    the trained pipeline at the 4-sweep default, BASELINE.md), per-stream
    independence, and the engine-specific sweep default."""

    CH, LA = 16, 1

    def _mel(self, chunks, seed=0):
        from advoc_tpu.data import loader

        wav = loader.synthetic_speech(seed, self.CH * chunks * P.hop_length)
        mel = sp.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
        return np.asarray(mel[: self.CH * chunks]).reshape(
            chunks, self.CH, P.n_mels
        )

    def _sv(self, engine="lws_block", n=1, **kw):
        return StreamingVocoder(
            params=P, chunk_frames=self.CH, n_streams=n,
            phase_engine=engine, lws_look_ahead=self.LA, **kw
        )

    def test_sweep_defaults_are_engine_specific(self):
        assert self._sv("lws_block").lws_sweeps == 4
        assert self._sv("lws_online").lws_sweeps == 2
        assert self._sv("lws_block", lws_sweeps=2).lws_sweeps == 2

    def test_deterministic_and_near_sequential_fidelity(self):
        chunks = 6
        mel = self._mel(chunks)

        def run(sv):
            outs = [sv.push(mel[c]) for c in range(chunks)]
            return np.concatenate(outs)

        sv = self._sv()
        stream = run(sv)
        assert stream.shape == (chunks * self.CH * P.hop_length,)
        sv.reset()
        np.testing.assert_array_equal(run(sv), stream)

        seq = run(self._sv("lws_online"))

        def l1(out, svx):
            sig = out[svx.preroll_samples + self.LA * P.hop_length :]
            n_fr = len(sig) // P.hop_length - 1
            m = np.asarray(sp.waveform_to_r9y9_melspec(jnp.asarray(sig), P))
            tgt = mel.reshape(-1, P.n_mels)[:n_fr]
            return np.abs(m[:n_fr] - tgt).mean()

        l1_blk, l1_seq = l1(stream, sv), l1(seq, self._sv())
        assert l1_blk < 1.6 * l1_seq + 0.01, (l1_blk, l1_seq)
        assert l1_blk < 0.15, l1_blk

    def test_identical_streams_emit_identically(self):
        mel = self._mel(2, seed=3)
        sv = self._sv(n=2)
        for c in range(2):
            out = sv.push(np.stack([mel[c], mel[c]]))
            np.testing.assert_array_equal(out[0], out[1])

    def test_per_stream_reset_is_row_independent(self):
        mel_a, mel_b = self._mel(2, seed=4), self._mel(2, seed=5)
        sv = self._sv(n=2)
        sv.push(np.stack([mel_a[0], mel_b[0]]))
        sv.reset(stream=1)
        out = sv.push(np.stack([mel_a[1], mel_b[0]]))
        out2 = self._sv(n=2).push(np.stack([mel_a[0], mel_b[0]]))
        np.testing.assert_allclose(out[1], out2[1], rtol=0, atol=1e-6)


class TestMaskedPush:
    """`push(…, active=mask)` — the dynamic-batching primitive for serving:
    an inactive row's carry is untouched bit-exactly (skipping a tick then
    resuming ≡ that push never happened for the row), its emit row is
    zeros, and the mask is traced (any pattern, one executable)."""

    CH = 16

    def _mel(self, chunks, seed):
        wav = loader.synthetic_speech(seed, self.CH * chunks * P.hop_length)
        m = sp.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
        return np.asarray(m[: self.CH * chunks]).reshape(
            chunks, self.CH, P.n_mels
        )

    @pytest.mark.parametrize(
        "engine,kw",
        [
            ("gl", dict(gl_iters=4)),
            ("lws_online", dict(lws_look_ahead=1, lws_sweeps=1)),
            ("lws_block", dict(lws_look_ahead=1, lws_sweeps=2)),
        ],
    )
    def test_skipped_tick_resumes_bit_exact(self, engine, kw):
        mel_a, mel_b = self._mel(3, seed=0), self._mel(2, seed=1)
        zeros = np.zeros_like(mel_a[0])

        sv = StreamingVocoder(
            params=P, chunk_frames=self.CH, n_streams=2,
            phase_engine=engine, **kw
        )
        # Stream 0 pushes a0,a1,a2; stream 1 pushes b0, SKIPS the middle
        # tick, then b1.
        o1 = sv.push(np.stack([mel_a[0], mel_b[0]]))
        o2 = sv.push(np.stack([mel_a[1], zeros]), active=[True, False])
        o3 = sv.push(np.stack([mel_a[2], mel_b[1]]))

        # Inactive row emits zeros.
        np.testing.assert_array_equal(o2[1], np.zeros_like(o2[1]))

        # References run the SAME n=2 executable (bit-exactness across
        # different batch sizes is not an XLA guarantee; per-row
        # independence within a push is tested elsewhere).
        def fresh():
            return StreamingVocoder(
                params=P, chunk_frames=self.CH, n_streams=2,
                phase_engine=engine, **kw
            )

        # Stream 0 ≡ an uninterrupted all-active run (row 1 data differs —
        # rows are independent).
        ref0 = fresh()
        r1 = ref0.push(np.stack([mel_a[0], mel_b[0]]))
        r2 = ref0.push(np.stack([mel_a[1], mel_b[1]]))
        r3 = ref0.push(np.stack([mel_a[2], mel_b[1]]))
        np.testing.assert_array_equal(o1[0], r1[0])
        np.testing.assert_array_equal(o2[0], r2[0])
        np.testing.assert_array_equal(o3[0], r3[0])

        # Stream 1 ≡ a run that never saw the skipped tick: b0 then b1
        # back-to-back.
        ref1 = fresh()
        s1 = ref1.push(np.stack([mel_a[0], mel_b[0]]))
        s2 = ref1.push(np.stack([mel_a[1], mel_b[1]]))
        np.testing.assert_array_equal(o1[1], s1[1])
        np.testing.assert_array_equal(o3[1], s2[1])


class TestFlush:
    """`StreamingVocoder.flush()` — the end-of-utterance drain (VERDICT r3
    next #1). Contract (every engine): flush emits exactly
    ``flush_samples = preroll_samples + latency_frames·hop`` per stream;
    the assembled stream (pushes + flush, ``flush_samples`` dropped from
    the head) is EXACTLY T·hop aligned samples with the previously-lost
    final audio present; flushed streams behave like freshly-reset ones;
    the masked form leaves inactive rows' carry bit-exact."""

    ENGINES = [
        ("gl", dict(gl_iters=4, overlap_frames=8)),
        ("lws_online", dict(lws_look_ahead=1, lws_sweeps=1)),
        ("lws_block", dict(lws_look_ahead=1, lws_sweeps=2)),
    ]
    CH = 16

    def _mel(self, chunks, seed=0, ch=None):
        ch = ch or self.CH
        wav = loader.synthetic_speech(seed, ch * chunks * P.hop_length)
        m = sp.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
        return np.asarray(m[: ch * chunks]).reshape(chunks, ch, P.n_mels)

    def _sv(self, engine, kw, **extra):
        return StreamingVocoder(
            params=P, chunk_frames=self.CH, phase_engine=engine,
            **kw, **extra
        )

    @pytest.mark.parametrize("engine,kw", ENGINES)
    def test_assembled_stream_is_exact_length_and_complete(self, engine, kw):
        chunks = 4
        mel = self._mel(chunks)
        T = chunks * self.CH
        sv = self._sv(engine, kw)
        outs = [sv.push(mel[c]) for c in range(chunks)]
        tail = sv.flush()
        assert tail.shape == (sv.flush_samples,)
        assert sv.flush_samples == (
            sv.preroll_samples + sv.latency_frames * P.hop_length
        )
        sig = np.concatenate(outs + [tail])[sv.flush_samples :]
        assert sig.shape == (T * P.hop_length,)  # exact, nothing lost
        # The final frames — previously un-emittable — must carry the
        # signal: re-extraction over the WHOLE aligned range, including
        # the last frames, stays within the engine-quality envelope.
        m2 = sp.waveform_to_r9y9_melspec(jnp.asarray(sig), P)
        l1_all = float(jnp.abs(m2[1 : T - 1] - mel.reshape(-1, P.n_mels)[1 : T - 1]).mean())
        l1_tail = float(
            jnp.abs(m2[T - 8 : T - 1] - mel.reshape(-1, P.n_mels)[T - 8 : T - 1]).mean()
        )
        assert l1_all < 0.15, (engine, l1_all)
        assert l1_tail < 0.3, (engine, l1_tail)
        # And the flushed tail actually contains audio (the signal is
        # voiced to the end): the regression this guards is the silent
        # loss of the final overlap/look-ahead samples.
        mid_rms = float(np.sqrt((sig[len(sig) // 2 :][: 4096] ** 2).mean()))
        end_rms = float(np.sqrt((sig[-sv.flush_samples :] ** 2).mean()))
        assert end_rms > 0.05 * mid_rms, (engine, end_rms, mid_rms)

    @pytest.mark.parametrize("engine,kw", ENGINES)
    def test_flush_resets_stream(self, engine, kw):
        mel = self._mel(2)
        sv = self._sv(engine, kw)
        sv.push(mel[0])
        sv.flush()
        again = sv.push(mel[0])  # same executable, fresh carry
        fresh = self._sv(engine, kw)
        first = fresh.push(mel[0])
        np.testing.assert_array_equal(again, first)

    @pytest.mark.parametrize("engine,kw", ENGINES)
    def test_masked_flush_is_row_independent(self, engine, kw):
        mel_a, mel_b = self._mel(2, seed=0), self._mel(2, seed=1)
        sv = StreamingVocoder(
            params=P, chunk_frames=self.CH, n_streams=2,
            phase_engine=engine, **kw
        )
        sv.push(np.stack([mel_a[0], mel_b[0]]))
        out = sv.flush(active=[False, True])
        assert out.shape == (2, sv.flush_samples)
        np.testing.assert_array_equal(out[0], np.zeros_like(out[0]))
        # Row 0's carry untouched: its next push equals the uninterrupted
        # run's; row 1 flushed → behaves fresh.
        o2 = sv.push(np.stack([mel_a[1], mel_b[0]]))
        ref = StreamingVocoder(
            params=P, chunk_frames=self.CH, n_streams=2,
            phase_engine=engine, **kw
        )
        ref.push(np.stack([mel_a[0], mel_b[0]]))
        r2 = ref.push(np.stack([mel_a[1], mel_b[0]]))
        np.testing.assert_array_equal(o2[0], r2[0])
        fresh = StreamingVocoder(
            params=P, chunk_frames=self.CH, n_streams=2,
            phase_engine=engine, **kw
        )
        f1 = fresh.push(np.stack([mel_a[1], mel_b[0]]))
        np.testing.assert_array_equal(o2[1], f1[1])

    def test_flush_never_pushed_is_zeros(self):
        for engine, kw in self.ENGINES:
            sv = self._sv(engine, kw)
            tail = sv.flush()
            np.testing.assert_array_equal(tail, np.zeros_like(tail))

    def test_int16_flush(self):
        mel = self._mel(2)
        f = self._sv("gl", dict(gl_iters=4, overlap_frames=8))
        q = self._sv(
            "gl", dict(gl_iters=4, overlap_frames=8), emit_dtype="int16"
        )
        for c in range(2):
            f.push(mel[c])
            q.push(mel[c])
        tf, tq = f.flush(), q.flush()
        assert tq.dtype == np.int16
        np.testing.assert_array_equal(
            tq, np.round(np.clip(tf, -1.0, 1.0) * 32767.0).astype(np.int16)
        )

    def test_mel_context_flush_drains_withheld_frames(self):
        """With mel_context the generator withholds the last ctx frames for
        right-context; flush must complete them (silence-pad convention) —
        an event in the LAST frames of the utterance must appear in the
        assembled signal at its aligned position."""
        ctx, la, chunks = 4, 1, 3
        T = chunks * self.CH
        mel = np.zeros((T, P.n_mels), np.float32)
        ev = T - 3  # inside the withheld region of the final chunk
        mel[ev:] = 0.9
        sv = StreamingVocoder(
            params=P, chunk_frames=self.CH, phase_engine="lws_online",
            lws_look_ahead=la, lws_sweeps=1, mel_context=ctx,
        )
        outs = [
            sv.push(mel[c * self.CH : (c + 1) * self.CH])
            for c in range(chunks)
        ]
        tail = sv.flush()
        assert sv.flush_samples == (
            P.n_fft // 2 + (la + ctx) * P.hop_length
        )
        assert tail.shape == (sv.flush_samples,)
        sig = np.concatenate(outs + [tail])[sv.flush_samples :]
        assert sig.shape == (T * P.hop_length,)
        hop = P.hop_length
        e = np.array([
            (sig[k * hop : (k + 1) * hop] ** 2).sum()
            for k in range(T)
        ])
        peak = int(np.argmax(e))
        assert peak >= ev - 1, (peak, ev)  # event present, aligned
        assert e[: ev - 4].max() < 1e-3 * e.max()


class TestStreamingWireFormats:
    """Narrow wire dtypes for tunneled serving (BASELINE multi-stream table):
    int16 emit must equal the float emit run through the save_as_wav PCM16
    conversion bit-for-bit; the fp16 mel uplink must be inaudibly close."""

    def _mel(self, chunks=2):
        from advoc_tpu.data import loader
        from advoc_tpu.ops import spectral

        wav = loader.synthetic_speech(3, 64 * chunks * P.hop_length)
        mel = spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
        return np.asarray(mel[: 64 * chunks]).reshape(chunks, 64, P.n_mels)

    def test_int16_emit_matches_float_pcm(self):
        mels = self._mel()
        f = StreamingVocoder(params=P, chunk_frames=64, gl_iters=3)
        q = StreamingVocoder(params=P, chunk_frames=64, gl_iters=3,
                             emit_dtype="int16")
        for c in range(mels.shape[0]):
            wav_f = f.push(mels[c])
            wav_q = q.push(mels[c])
            assert wav_q.dtype == np.int16
            pcm_f = np.round(np.clip(wav_f, -1.0, 1.0) * 32767.0).astype(
                np.int16
            )
            np.testing.assert_array_equal(wav_q, pcm_f)

    def test_float16_uplink_quality_parity(self):
        from advoc_tpu.ops import spectral

        chunks = 4
        mels = self._mel(chunks)
        f = StreamingVocoder(params=P, chunk_frames=64, gl_iters=3)
        h = StreamingVocoder(params=P, chunk_frames=64, gl_iters=3,
                             mel_dtype="float16")
        wav_f = np.concatenate([f.push(mels[c]) for c in range(chunks)])
        wav_h = np.concatenate([h.push(mels[c]) for c in range(chunks)])
        # G-L phase is chaotic under tiny input perturbations, so sample-wise
        # closeness is NOT the contract (measured: fp16 uplink shifts samples
        # by up to ~0.1 while leaving quality unchanged). The contract is
        # spectral fidelity: mel-L1 back to the input mel must match the f32
        # uplink's to well under the gates used for architecture decisions.
        ref = jnp.asarray(mels.reshape(-1, P.n_mels))

        def mel_l1(w):
            m = spectral.waveform_to_r9y9_melspec(jnp.asarray(w), P)
            n = min(m.shape[0], ref.shape[0])
            return float(jnp.mean(jnp.abs(m[:n] - ref[:n])))

        l_f, l_h = mel_l1(wav_f), mel_l1(wav_h)
        assert abs(l_f - l_h) < 0.05 * max(l_f, 1e-6), (l_f, l_h)

    def test_bad_dtypes_raise(self):
        import pytest

        with pytest.raises(ValueError):
            StreamingVocoder(params=P, emit_dtype="int8")
        with pytest.raises(ValueError):
            StreamingVocoder(params=P, mel_dtype="bfloat16")


class TestMelProjectionOption:
    """Vocoder/StreamingVocoder mel_projection: the post-repair consistency
    projection (spectral.mel_consistency_project; BASELINE.md r4 STOI
    section). A generator that corrupts the estimate with deterministic
    dB-domain noise stands in for the trained repair's fluctuating mel
    residual."""

    @staticmethod
    def _noisy_g(p, est):
        noise = 0.06 * jax.random.normal(jax.random.PRNGKey(3), est.shape)
        return jnp.clip(est + noise, 0.0, 1.0)

    def _reextract_l1(self, wav, mel):
        m = sp.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
        n = min(m.shape[0], mel.shape[0]) - 1
        return float(jnp.abs(m[:n] - mel[:n]).mean())

    def test_offline_projection_restores_band_envelopes(self, mel):
        m = mel[:128]
        kw = dict(g_apply=self._noisy_g, params=P, chunk_frames=64,
                  overlap_frames=8, gl_iters=8)
        raw = Vocoder(**kw, mel_projection=0.0)
        proj = Vocoder(**kw, mel_projection=1.0)
        l_raw = self._reextract_l1(raw(m), m)
        l_proj = self._reextract_l1(proj(m), m)
        assert l_proj < 0.7 * l_raw, (l_raw, l_proj)

    def test_default_resolution(self, mel):
        # None → auto: ON (1.0) with a generator, OFF for the heuristic
        # pipeline; explicit values are honored verbatim.
        assert Vocoder(g_apply=self._noisy_g).mel_projection == 1.0
        assert Vocoder().mel_projection == 0.0
        assert Vocoder(g_apply=self._noisy_g,
                       mel_projection=0.0).mel_projection == 0.0
        assert StreamingVocoder(g_apply=self._noisy_g).mel_projection == 1.0
        assert StreamingVocoder().mel_projection == 0.0
        # And the explicit-1.0 vocoder is bit-identical to the auto default.
        m = mel[:64]
        kw = dict(g_apply=self._noisy_g, params=P, chunk_frames=64,
                  gl_iters=4)
        w0 = Vocoder(**kw)(m)
        w1 = Vocoder(**kw, mel_projection=1.0)(m)
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))

    @pytest.mark.parametrize("engine", ["gl", "lws_online"])
    def test_streaming_projection_restores_band_envelopes(self, mel, engine):
        chunks = [np.asarray(mel[i * 64 : (i + 1) * 64]) for i in range(2)]

        def stream(strength):
            sv = StreamingVocoder(
                g_apply=self._noisy_g, params=P, chunk_frames=64,
                overlap_frames=8, gl_iters=8, phase_engine=engine,
                mel_projection=strength,
            )
            out = np.concatenate([sv.push(c) for c in chunks] + [sv.flush()])
            return out[sv.preroll_samples :]

        ref = mel[:128]
        l_raw = self._reextract_l1(stream(0.0), ref)
        l_proj = self._reextract_l1(stream(1.0), ref)
        assert l_proj < 0.8 * l_raw, (l_raw, l_proj)

    def test_streaming_projection_matches_offline_magnitudes(self, mel):
        # With the heuristic (mel-consistent) input the projection must not
        # disturb streamed spectral fidelity: both streams re-extract to the
        # input mel equally well. (The magnitude-domain near-noop bound
        # itself is unit-tested in test_spectral.TestMelConsistencyProject;
        # waveforms after any phase-recovery sweep are chaotic in harmless
        # magnitude nudges, so the certificate lives in mel space.)
        chunks = [np.asarray(mel[i * 64 : (i + 1) * 64]) for i in range(2)]

        def stream(strength):
            sv = StreamingVocoder(
                params=P, chunk_frames=64, phase_engine="lws_online",
                mel_projection=strength,
            )
            out = np.concatenate([sv.push(c) for c in chunks] + [sv.flush()])
            return out[sv.preroll_samples :]

        ref = mel[:128]
        l_raw = self._reextract_l1(stream(0.0), ref)
        l_proj = self._reextract_l1(stream(1.0), ref)
        assert abs(l_proj - l_raw) < 0.15 * l_raw + 1e-3, (l_raw, l_proj)


class TestLongformVocoder:
    """Length-universal longform driver (VERDICT r4 next #6): every duration
    rides ONE push + ONE flush executable (fixed tile), with quality at
    parity with the bucketed whole-utterance path."""

    def _mel_long(self, mel, n=3):
        return jnp.concatenate([mel] * n, axis=0)  # (519, 80)

    def _reextract_l1(self, wav, mel):
        m = sp.waveform_to_r9y9_melspec(jnp.asarray(np.asarray(wav)), P)
        n = min(m.shape[0], mel.shape[0]) - 1
        return float(jnp.abs(m[:n] - mel[:n]).mean())

    def test_heuristic_longform_quality_parity(self, mel):
        m = self._mel_long(mel)
        voc = Vocoder(params=P, gl_iters=20, chunk_frames=64)
        l_bucketed = self._reextract_l1(voc(m), m)
        wav = voc.vocode_longform(m, tile_frames=128, overlap_frames=8)
        assert wav.shape == (m.shape[0] * P.hop_length,)
        l_longform = self._reextract_l1(wav, m)
        # Tile-boundary crossfades cost a little vs whole-utterance G-L;
        # parity bound mirrors the streaming-engine quality contract.
        assert l_longform < 1.5 * l_bucketed + 5e-3, (l_bucketed, l_longform)

    def test_generator_longform_runs_and_matches_bucketed(self, mel, tiny_g):
        cfg, apply, params = tiny_g
        m = self._mel_long(mel)
        voc = Vocoder(
            g_apply=apply, g_params=params, params=P,
            chunk_frames=cfg.n_frames, overlap_frames=8, gl_iters=8,
        )
        l_bucketed = self._reextract_l1(voc(m), m)
        wav = voc.vocode_longform(m, tile_frames=128, overlap_frames=8)
        assert wav.shape == (m.shape[0] * P.hop_length,)
        assert np.isfinite(np.asarray(wav)).all()
        l_longform = self._reextract_l1(wav, m)
        # Random weights: both paths are equally wrong about the mel; the
        # parity bound certifies the tiling adds no systematic damage.
        assert l_longform < 1.3 * l_bucketed + 5e-3, (l_bucketed, l_longform)

    def test_one_executable_for_all_durations(self, mel, tiny_g):
        cfg, apply, params = tiny_g
        voc = Vocoder(
            g_apply=apply, g_params=params, params=P,
            chunk_frames=64, overlap_frames=8, gl_iters=2,
        )
        voc.vocode_longform(mel[:100], tile_frames=128)
        voc.vocode_longform(self._mel_long(mel), tile_frames=128)  # 4 tiles
        voc.vocode_longform(mel[:128], tile_frames=128)  # exact one tile
        assert len(voc._longform) == 1
        sv = voc._longform[(128, 32)]
        # The push executable compiled exactly once across all durations.
        assert sv._run._cache_size() == 1
        # And the bucketed cache gained nothing (longform is compile-free
        # for the offline path).
        assert len(voc._cache) == 0

    def test_batched_rows(self, mel, tiny_g):
        cfg, apply, params = tiny_g
        voc = Vocoder(g_apply=apply, g_params=params, params=P,
                      chunk_frames=64, overlap_frames=8, gl_iters=2)
        mels = jnp.stack([mel[:130], mel[43:173]])
        wavs = voc.vocode_longform(mels, tile_frames=128)
        assert wavs.shape == (2, 130 * P.hop_length)
        # Row independence: a row vocoded alone is identical (reset()
        # between rows makes the engine stateless across rows).
        solo = voc.vocode_longform(mel[:130], tile_frames=128)
        np.testing.assert_array_equal(np.asarray(wavs[0]), np.asarray(solo))

    def test_tile_must_be_chunk_multiple(self, tiny_g):
        cfg, apply, params = tiny_g
        voc = Vocoder(g_apply=apply, g_params=params, chunk_frames=64)
        with pytest.raises(ValueError, match="multiple"):
            voc.vocode_longform(np.zeros((100, P.n_mels)), tile_frames=96)
