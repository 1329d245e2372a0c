"""Golden-value tests: JAX spectral core vs the float64 numpy oracle.

Strategy per SURVEY.md §4: the oracle (advoc_tpu.ops.reference, float64) is
the bit-level semantic definition; the JAX float32 path must match within
documented tolerances. Fixtures are synthesized (no dataset / librosa / lws in
this environment).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advoc_tpu.ops import reference as ref
from advoc_tpu.ops import spectral as sp

P = ref.DEFAULT_PARAMS


@pytest.fixture(scope="module")
def wav():
    """~1.5 s of deterministic multi-tone + noise 'speech-like' audio."""
    rng = np.random.default_rng(0)
    t = np.arange(32768, dtype=np.float64) / P.sample_rate
    x = (
        0.5 * np.sin(2 * np.pi * 220.0 * t)
        + 0.25 * np.sin(2 * np.pi * 880.0 * t + 0.3)
        + 0.125 * np.sin(2 * np.pi * 3520.0 * t + 1.1)
        + 0.02 * rng.standard_normal(t.shape)
    )
    # amplitude modulation so frames differ
    x *= 0.5 * (1.0 + np.sin(2 * np.pi * 3.0 * t))
    return (0.8 * x / np.abs(x).max()).astype(np.float64)


# ---------------------------------------------------------------------------
# Filterbank semantics
# ---------------------------------------------------------------------------


class TestMelFilterbank:
    def test_shape(self):
        fb = ref.create_mel_filterbank(P)
        assert fb.shape == (80, 513)

    def test_nonnegative_and_bounded_support(self):
        fb = ref.create_mel_filterbank(P)
        assert (fb >= 0).all()
        freqs = np.linspace(0, P.sample_rate / 2, P.n_freq)
        active = fb.sum(axis=0) > 0
        # No support below fmin or above fmax (one bin of slack at each edge).
        assert not active[freqs < P.fmin - P.sample_rate / P.n_fft].any()
        assert not active[freqs > P.fmax + P.sample_rate / P.n_fft].any()

    def test_slaney_normalization(self):
        # Slaney norm: each filter's integral over Hz ≈ 1 (area = width/2 * peak,
        # peak = 2/width). Check via the analytic identity: sum of weights
        # times bin-width approximates 1.
        fb = ref.create_mel_filterbank(P)
        bin_hz = P.sample_rate / P.n_fft
        areas = fb.sum(axis=1) * bin_hz
        # Triangles are coarsely sampled at low frequencies; generous band.
        assert (areas > 0.5).all() and (areas < 1.5).all()

    def test_mel_hz_roundtrip(self):
        hz = np.linspace(10.0, 11000.0, 257)
        back = ref.mel_to_hz_slaney(ref.hz_to_mel_slaney(hz))
        np.testing.assert_allclose(back, hz, rtol=1e-12)

    def test_pinv_identity_on_mel_domain(self):
        fb = ref.create_mel_filterbank(P)
        inv = ref.mel_pseudoinverse(P)
        # fb @ pinv(fb) ≈ I on the 80-dim mel space (fb has full row rank).
        np.testing.assert_allclose(fb @ inv, np.eye(80), atol=1e-8)


# ---------------------------------------------------------------------------
# STFT / iSTFT golden + roundtrip
# ---------------------------------------------------------------------------


class TestSTFT:
    def test_stft_matches_oracle(self, wav):
        gold = ref.stft(wav, P)
        got = np.asarray(sp.stft(jnp.asarray(wav, jnp.float32), P))
        assert got.shape == gold.shape == (1 + len(wav) // P.hop_length, 513)
        scale = np.abs(gold).max()
        np.testing.assert_allclose(got, gold.astype(np.complex64), atol=2e-4 * scale)

    def test_stft_batched(self, wav):
        x = jnp.stack([jnp.asarray(wav, jnp.float32)] * 3).reshape(3, 1, -1)
        s = sp.stft(x, P)
        assert s.shape == (3, 1, 1 + len(wav) // P.hop_length, 513)
        np.testing.assert_allclose(np.asarray(s[0, 0]), np.asarray(s[2, 0]))

    def test_frame_local_stft_mag_matches_stft(self, wav):
        # Reflect-padding manually + the public frame-local core must equal
        # |stft| exactly (the halo featurizer relies on this identity).
        x = jnp.asarray(wav, jnp.float32)
        pad = P.n_fft // 2
        xp = jnp.pad(x, (pad, pad), mode="reflect")
        got = np.asarray(sp.frame_local_stft_mag(xp, P))
        want = np.asarray(jnp.abs(sp.stft(x, P)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_istft_roundtrip_oracle(self, wav):
        spec = ref.stft(wav, P)
        y = ref.istft(spec, len(wav), P)
        np.testing.assert_allclose(y, wav, atol=1e-10)

    def test_istft_roundtrip_jax(self, wav):
        x = jnp.asarray(wav, jnp.float32)
        y = np.asarray(sp.istft(sp.stft(x, P), len(wav), P))
        np.testing.assert_allclose(y, wav, atol=1e-4)

    def test_istft_matches_oracle(self, wav):
        spec = ref.stft(wav, P)
        gold = ref.istft(spec, len(wav), P)
        got = np.asarray(sp.istft(jnp.asarray(spec, jnp.complex64), len(wav), P))
        np.testing.assert_allclose(got, gold, atol=1e-4)

    def test_istft_stream_matches_offline(self):
        """Chunked `istft_stream_push` (+flush) must reproduce offline
        `istft` exactly — including the carried partial-window-sum
        normalization at the stream start; the first n_fft//2 emitted
        samples are the center-pad pre-roll (dropped for comparison)."""
        rng = np.random.default_rng(3)
        T = 32
        S = (
            rng.standard_normal((T, P.n_freq))
            + 1j * rng.standard_normal((T, P.n_freq))
        ).astype(np.complex64)
        off = np.asarray(sp.istft(jnp.asarray(S), T * P.hop_length, P))
        for cs in (8, 2):  # incl. chunks smaller than the (r−1)-frame overlap
            carry = sp.istft_stream_init(1, P)
            push = jax.jit(lambda s, c: sp.istft_stream_push(s, c, P))
            outs = []
            for c0 in range(0, T, cs):
                e, carry = push(jnp.asarray(S[None, c0 : c0 + cs]), carry)
                outs.append(np.asarray(e[0]))
            outs.append(np.asarray(sp.istft_stream_flush(carry, P)[0]))
            stream = np.concatenate(outs)
            pad = P.n_fft // 2
            np.testing.assert_allclose(
                stream[pad : pad + T * P.hop_length], off, atol=1e-5,
                err_msg=f"chunk={cs}",
            )


# ---------------------------------------------------------------------------
# r9y9 mel extraction + heuristic inversion golden
# ---------------------------------------------------------------------------


class TestR9y9Mel:
    def test_melspec_matches_oracle(self, wav):
        gold = ref.waveform_to_r9y9_melspec(wav, P)
        got = np.asarray(sp.waveform_to_r9y9_melspec(jnp.asarray(wav, jnp.float32), P))
        assert got.shape == gold.shape == (1 + len(wav) // P.hop_length, 80)
        assert got.min() >= 0.0 and got.max() <= 1.0
        # [0,1]-normalized dB values; float32 FFT+matmul noise ≪ 1e-3.
        np.testing.assert_allclose(got, gold, atol=2e-3)

    def test_heuristic_inversion_matches_oracle(self, wav):
        mel = ref.waveform_to_r9y9_melspec(wav, P)
        gold = ref.r9y9_melspec_to_magspec(mel, P)
        got = np.asarray(
            sp.r9y9_melspec_to_magspec(jnp.asarray(mel, jnp.float32), P)
        )
        scale = gold.max()
        np.testing.assert_allclose(got, gold, atol=2e-4 * scale)

    def test_inversion_reextraction_consistency(self, wav):
        # mel → heuristic magnitude → re-extracted mel should be close to the
        # original mel (pinv is exact on the mel subspace; clipping ≥0 and the
        # dB floor introduce small error).
        mel = ref.waveform_to_r9y9_melspec(wav, P)
        mag_est = ref.r9y9_melspec_to_magspec(mel, P)
        mel2 = ref.magspec_to_r9y9_melspec(mag_est, P)
        l1 = np.abs(mel2 - mel).mean()
        assert l1 < 0.02, f"re-extraction L1 too high: {l1}"


# ---------------------------------------------------------------------------
# Mel-consistency projection
# ---------------------------------------------------------------------------


class TestMelConsistencyProject:
    def _mel_mag(self, wav):
        mel = jnp.asarray(ref.waveform_to_r9y9_melspec(wav, P), jnp.float32)
        return mel, sp.r9y9_melspec_to_magspec(mel, P)

    def test_strength_zero_is_identity(self, wav):
        mel, mag = self._mel_mag(wav)
        out = sp.mel_consistency_project(mag, mel, P, strength=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(mag))

    def test_near_noop_on_consistent_magnitude(self, wav):
        # The pinv heuristic is mel-consistent by construction, so the
        # projection's per-band ratios are ≈1 and the magnitude is barely
        # touched.
        mel, mag = self._mel_mag(wav)
        out = np.asarray(sp.mel_consistency_project(mag, mel, P))
        scale = float(np.asarray(mag).max())
        diff = np.abs(out - np.asarray(mag))
        # Mean movement ≈ 0; max bounded by band-edge overlap effects (the
        # one-step gain is a weighted average over ≤2 overlapping bands).
        assert diff.mean() < 2e-3 * scale
        assert diff.max() < 0.06 * scale

    def test_restores_consistency_of_perturbed_magnitude(self, wav):
        # A magnitude with a fluctuating mel residual (the trained-repair
        # failure mode, BASELINE.md r4 STOI section) projects back onto the
        # conditioning mel: re-extracted mel L1 shrinks by a large factor.
        mel, mag = self._mel_mag(wav)
        rng = np.random.default_rng(1)
        pert = mag * jnp.asarray(
            1.0 + 0.35 * rng.standard_normal(mag.shape), jnp.float32
        )
        pert = jnp.maximum(pert, 0.0)
        proj = sp.mel_consistency_project(pert, mel, P)
        l1_before = float(
            jnp.abs(sp.magspec_to_r9y9_melspec(pert, P) - mel).mean()
        )
        l1_after = float(
            jnp.abs(sp.magspec_to_r9y9_melspec(proj, P) - mel).mean()
        )
        assert l1_after < l1_before / 2.0, (l1_before, l1_after)

    def test_extra_iters_tighten_consistency(self, wav):
        mel, mag = self._mel_mag(wav)
        rng = np.random.default_rng(2)
        pert = jnp.maximum(
            mag
            * jnp.asarray(
                1.0 + 0.35 * rng.standard_normal(mag.shape), jnp.float32
            ),
            0.0,
        )
        l1 = [
            float(
                jnp.abs(
                    sp.magspec_to_r9y9_melspec(
                        sp.mel_consistency_project(pert, mel, P, n_iters=n), P
                    )
                    - mel
                ).mean()
            )
            for n in (1, 2)
        ]
        assert l1[1] <= l1[0]

    def test_uncovered_bins_untouched(self, wav):
        # Bins the filterbank never weights (DC / below-fmin edge / above
        # fmax) carry no mel information; the projection must leave them
        # alone even when badly perturbed.
        mel, mag = self._mel_mag(wav)
        colsum = ref.create_mel_filterbank(P).sum(axis=0)
        uncovered = np.where(colsum <= 1e-6)[0]
        assert uncovered.size > 0
        pert = np.asarray(mag).copy()
        pert[..., uncovered] = 7.0
        out = np.asarray(
            sp.mel_consistency_project(jnp.asarray(pert), mel, P)
        )
        np.testing.assert_array_equal(out[..., uncovered], 7.0)

    def test_gain_bounded(self, wav):
        # Silent-band corrections are clipped: output ≤ mag·max_gain even
        # when the implied mel is ~0 against a loud conditioning mel.
        mel, mag = self._mel_mag(wav)
        tiny = mag * 1e-6
        out = np.asarray(
            sp.mel_consistency_project(tiny, mel, P, max_gain=4.0)
        )
        # rtol covers f32 rounding in the weighted-average gain matmul.
        bound = np.asarray(tiny) * 4.0 * (1.0 + 1e-5) + 1e-12
        assert (out <= bound).all()

    def test_jittable_and_batched(self, wav):
        mel, mag = self._mel_mag(wav)
        batched_mag = jnp.stack([mag, mag * 0.5])
        batched_mel = jnp.stack([mel, mel])
        f = jax.jit(lambda m, c: sp.mel_consistency_project(m, c, P))
        out = f(batched_mag, batched_mel)
        assert out.shape == batched_mag.shape
        single = sp.mel_consistency_project(mag, mel, P)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(single), rtol=1e-5, atol=1e-6
        )


# ---------------------------------------------------------------------------
# Phase recovery
# ---------------------------------------------------------------------------


class TestGriffinLim:
    def test_gl_reduces_spectral_error(self, wav):
        """G-L from |STFT| must converge toward a consistent spectrogram."""
        mag = ref.waveform_to_magspec(wav, P)
        x0 = ref.griffin_lim(mag, len(wav), n_iters=0, params=P)
        x32 = ref.griffin_lim(mag, len(wav), n_iters=32, params=P)
        err0 = np.abs(ref.waveform_to_magspec(x0, P) - mag).mean()
        err32 = np.abs(ref.waveform_to_magspec(x32, P) - mag).mean()
        assert err32 < 0.5 * err0

    def test_jax_gl_matches_oracle_quality(self, wav):
        mag = ref.waveform_to_magspec(wav, P)
        gold = ref.griffin_lim(mag, len(wav), n_iters=8, params=P)
        got = np.asarray(
            sp.griffin_lim(jnp.asarray(mag, jnp.float32), len(wav), n_iters=8, params=P)
        )
        # Trajectories diverge in f32 after many iterations; compare the
        # *consistency error*, which is the quantity G-L minimizes.
        e_gold = np.abs(ref.waveform_to_magspec(gold, P) - mag).mean()
        e_got = np.abs(ref.waveform_to_magspec(got.astype(np.float64), P) - mag).mean()
        assert e_got < 1.5 * e_gold + 1e-4

    def test_fast_gl_beats_classic_at_equal_iters(self, wav):
        mag = jnp.asarray(ref.waveform_to_magspec(wav, P), jnp.float32)
        x_classic = sp.griffin_lim(mag, len(wav), n_iters=16, momentum=0.0, params=P)
        x_fast = sp.griffin_lim(mag, len(wav), n_iters=16, momentum=0.99, params=P)
        m = np.asarray(mag, dtype=np.float64)
        e_c = np.abs(ref.waveform_to_magspec(np.asarray(x_classic, np.float64), P) - m).mean()
        e_f = np.abs(ref.waveform_to_magspec(np.asarray(x_fast, np.float64), P) - m).mean()
        assert e_f < e_c

    def test_full_vocoder_pipeline_roundtrip(self, wav):
        """BASELINE config 1: mel → waveform → re-extracted mel L1 is small."""
        mel = sp.waveform_to_r9y9_melspec(jnp.asarray(wav, jnp.float32), P)
        y = sp.r9y9_melspec_to_waveform(mel, n_iters=30, phase_method="lws", params=P)
        assert y.shape == (mel.shape[0] * P.hop_length,)
        mel2 = sp.waveform_to_r9y9_melspec(y[: len(wav)], P)
        l1 = float(jnp.abs(mel2 - mel).mean())
        assert l1 < 0.05, f"vocoded mel L1 {l1} too high"

    def test_vocoder_is_jittable_and_batched(self, wav):
        mel = sp.waveform_to_r9y9_melspec(jnp.asarray(wav[:16384], jnp.float32), P)
        mels = jnp.stack([mel, mel * 0.9])
        fn = jax.jit(lambda m: sp.r9y9_melspec_to_waveform(m, n_iters=4, params=P))
        out = fn(mels)
        assert out.shape == (2, mel.shape[0] * P.hop_length)
        assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# LWS (true Local Weighted Sums) phase recovery
# ---------------------------------------------------------------------------


class TestLWS:
    def test_kernels_reproduce_consistency_operator(self):
        """Widely-truncated kernels must reproduce G = STFT∘iSTFT at an
        interior frame to near machine precision (validates the numeric
        kernel-measurement machinery)."""
        A, B = ref.lws_kernels(P, band=16, corner=16)
        Q = P.n_fft // P.hop_length
        rng = np.random.default_rng(1)
        T = 24
        S = rng.standard_normal((T, P.n_freq)) + 1j * rng.standard_normal(
            (T, P.n_freq)
        )
        GS = ref.stft(ref.istft(S, (T - 1) * P.hop_length, P), P)[:T]
        m = 12
        acc = sum(
            A[dm + Q - 1] @ S[m - dm] + B[dm + Q - 1] @ np.conj(S[m - dm])
            for dm in range(-(Q - 1), Q)
        )
        rel = np.abs(acc - GS[m]).max() / np.abs(GS[m]).max()
        assert rel < 1e-3, rel  # residual = energy outside the wide band

    def test_kernel_band_locality(self):
        """The LWS premise: the kernel is *local* — the default band=3 holds
        >99.9% of A's energy and corner=8 >99.99% of B's."""
        A3, B8 = ref.lws_kernels(P, band=3, corner=8)
        Aw, Bw = ref.lws_kernels(P, band=16, corner=16)
        assert (np.abs(A3) ** 2).sum() / (np.abs(Aw) ** 2).sum() > 0.999
        assert (np.abs(B8) ** 2).sum() / (np.abs(Bw) ** 2).sum() > 0.9999

    def test_jax_lws_matches_oracle(self, wav):
        mag = ref.waveform_to_magspec(wav, P)[:32]
        gold = ref.lws(mag, n_sweeps=3, params=P)
        got = np.asarray(
            jax.jit(lambda m: sp.lws(m, n_sweeps=3, params=P))(
                jnp.asarray(mag, jnp.float32)
            )
        )
        rel = np.abs(got - gold).max() / np.abs(gold).max()
        assert rel < 1e-4, rel

    def test_lws_reduces_consistency_error(self, wav):
        mag = ref.waveform_to_magspec(wav, P)[:64]
        x0 = ref.istft(mag.astype(np.complex128), 64 * P.hop_length, P)
        x5 = np.asarray(sp.lws(jnp.asarray(mag, jnp.float32), n_sweeps=5, params=P))
        e0 = np.abs(ref.waveform_to_magspec(x0, P)[:64] - mag).mean()
        e5 = np.abs(ref.waveform_to_magspec(x5.astype(np.float64), P)[:64] - mag).mean()
        assert e5 < 0.6 * e0

    def test_lws_batched(self, wav):
        mag = jnp.asarray(ref.waveform_to_magspec(wav, P)[:16], jnp.float32)
        mags = jnp.stack([mag, 0.5 * mag])
        out = jax.jit(lambda m: sp.lws(m, n_sweeps=2, params=P))(mags)
        single = jax.jit(lambda m: sp.lws(m, n_sweeps=2, params=P))(mag)
        assert out.shape == (2, 16 * P.hop_length)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(single), atol=1e-5
        )

    def test_chromatic_degenerate_is_sequential(self, wav):
        """colors ≥ T makes every color one frame in ascending order — the
        exact sequential visit order, so the chromatic path must reproduce
        the scan path bit-for-bit (same _lws_update calls, same values)."""
        mag = jnp.asarray(ref.waveform_to_magspec(wav, P)[:24], jnp.float32)
        seq = np.asarray(sp.lws(mag, n_sweeps=2, params=P))
        mc = np.asarray(sp.lws(mag, n_sweeps=2, colors=24, params=P))
        np.testing.assert_array_equal(mc, seq)

    def test_chromatic_matches_sequential_convergence(self, wav):
        """colors=4 ≥ Q keeps same-color frames uncoupled (|Δm| ≤ Q−1=3),
        so the chromatic schedule is a valid Gauss-Seidel ordering: its
        re-extracted magnitude error must track the sequential sweep's
        (measured ≤ ~6% apart at every sweep count ≥ 5, BASELINE.md)."""
        mag = ref.waveform_to_magspec(wav, P)[:48]
        magj = jnp.asarray(mag, jnp.float32)

        def err(y):
            x = np.asarray(y).astype(np.float64)
            return np.abs(ref.waveform_to_magspec(x, P)[:48] - mag).mean()

        e_seq = err(sp.lws(magj, n_sweeps=6, params=P))
        e_mc = err(sp.lws(magj, n_sweeps=6, colors=4, params=P))
        assert e_mc < 1.15 * e_seq, (e_mc, e_seq)
        # and it actually converges (vs the zero-phase start)
        x0 = ref.istft(mag.astype(np.complex128), 48 * P.hop_length, P)
        e0 = np.abs(ref.waveform_to_magspec(x0, P)[:48] - mag).mean()
        assert e_mc < 0.6 * e0


class TestLWSOnline:
    """Online/asymmetric-window LWS (reference.lws_online + spectral twin) —
    the ``lws`` C library's streaming mode (SURVEY §7.3 hard-part #2)."""

    def test_edge_kernels_reproduce_end_operator(self):
        """The measured end-edge kernels must reproduce G = STFT∘iSTFT at the
        last frames of a FINITE signal (length = T·hop): d = 0 to machine
        precision (dense set), d ≥ 1 within the band/corner truncation — and
        the interior kernels must NOT (the edge operator is different)."""
        Q = P.n_fft // P.hop_length
        Ae, Be = ref.lws_edge_kernels(P, band=16, corner=16)
        assert Ae.shape == (Q - 1, 2 * Q - 1, P.n_freq, P.n_freq)
        rng = np.random.default_rng(1)
        T = 20
        S = rng.standard_normal((T, P.n_freq)) + 1j * rng.standard_normal(
            (T, P.n_freq)
        )
        GS = ref.stft(ref.istft(S, T * P.hop_length, P), P)[:T]
        Sp = np.concatenate([S, np.zeros((Q - 1, P.n_freq), complex)], 0)

        def apply(A, B, m):
            return sum(
                A[dm + Q - 1] @ Sp[m - dm] + B[dm + Q - 1] @ np.conj(Sp[m - dm])
                for dm in range(-(Q - 1), Q)
            )

        for d in range(Q - 1):
            m = T - 1 - d
            rel = np.abs(apply(Ae[d], Be[d], m) - GS[m]).max()
            rel /= np.abs(GS[m]).max()
            assert rel < (1e-12 if d == 0 else 2e-3), (d, rel)
        Ai, Bi = ref.lws_kernels(P, band=16, corner=16)
        m = T - 1
        rel = np.abs(apply(Ai, Bi, m) - GS[m]).max() / np.abs(GS[m]).max()
        assert rel > 0.1, rel  # interior kernels are wrong at the edge

    def test_oracle_prefix_causality(self, wav):
        """The online contract: frame j's phase is final once the head has
        advanced look_ahead past it — running on a prefix must be
        bit-identical there."""
        mag = ref.waveform_to_magspec(wav, P)[:28]
        la = 2
        _, full = ref.lws_online(
            mag, n_sweeps=2, look_ahead=la, params=P, return_spec=True
        )
        _, pref = ref.lws_online(
            mag[:18], n_sweeps=2, look_ahead=la, params=P, return_spec=True
        )
        assert np.array_equal(full[: 18 - la], pref[: 18 - la])

    @pytest.mark.parametrize("asymmetric", [True, False])
    def test_jax_matches_oracle(self, wav, asymmetric):
        mag = ref.waveform_to_magspec(wav, P)[:24]
        gold = ref.lws_online(
            mag, n_sweeps=2, look_ahead=2, asymmetric=asymmetric, params=P
        )
        got = np.asarray(
            jax.jit(
                lambda m: sp.lws_online(
                    m, n_sweeps=2, look_ahead=2, asymmetric=asymmetric,
                    params=P,
                )
            )(jnp.asarray(mag, jnp.float32))
        )
        # Tolerance: the d=0 head update is a DENSE (2Q−1·F)-deep f32 matmul
        # whose rounding feeds a phase iteration; asymmetric=False (banded
        # only) sits at ~1e-5.
        rel = np.abs(got - gold).max() / np.abs(gold).max()
        assert rel < (2e-3 if asymmetric else 1e-4), rel

    def test_look_ahead_past_edge_region(self, wav):
        """look_ahead ≥ Q−1 mixes interior and edge kernel sets; parity must
        hold across the boundary."""
        mag = ref.waveform_to_magspec(wav, P)[:24]
        gold = ref.lws_online(mag, n_sweeps=1, look_ahead=4, params=P)
        got = np.asarray(
            jax.jit(
                lambda m: sp.lws_online(m, n_sweeps=1, look_ahead=4, params=P)
            )(jnp.asarray(mag, jnp.float32))
        )
        rel = np.abs(got - gold).max() / np.abs(gold).max()
        assert rel < 2e-3, rel

    def test_phase_method_dispatch(self, wav):
        """`r9y9_melspec_to_waveform(phase_method="lws_online")` routes to
        the online scan (n_iters = per-arrival sweeps)."""
        mel = jnp.asarray(
            ref.waveform_to_r9y9_melspec(wav, P)[:16], jnp.float32
        )
        via_method = sp.r9y9_melspec_to_waveform(
            mel, n_iters=1, phase_method="lws_online", params=P
        )
        direct = sp.lws_online(
            sp.r9y9_melspec_to_magspec(mel, P), n_sweeps=1, params=P
        )
        np.testing.assert_allclose(
            np.asarray(via_method), np.asarray(direct), atol=1e-6
        )
        # "lws_chromatic" = lws(colors=4): same fixed point, 4-color
        # schedule.
        via_mc = sp.r9y9_melspec_to_waveform(
            mel, n_iters=1, phase_method="lws_chromatic", params=P
        )
        direct_mc = sp.lws(
            sp.r9y9_melspec_to_magspec(mel, P), n_sweeps=1, colors=4,
            params=P,
        )
        np.testing.assert_allclose(
            np.asarray(via_mc), np.asarray(direct_mc), atol=1e-6
        )

    def test_push_matches_offline_scan(self, wav):
        """Chunked `lws_online_push` must emit the same frames as one
        offline scan — and chunking must be semantics-free (bit-level
        chunk-size invariance: same per-step ops regardless of chunk)."""
        la, sw = 2, 2
        mag = np.asarray(ref.waveform_to_magspec(wav, P)[:24], np.float32)

        def run_chunked(cs):
            carry = sp.lws_online_init(1, la, P)
            push = jax.jit(
                lambda m, c: sp.lws_online_push(
                    m, c, n_sweeps=sw, look_ahead=la, params=P
                )
            )
            ems = []
            for c0 in range(0, 24, cs):
                (er, ei), carry = push(
                    jnp.asarray(mag[None, c0 : c0 + cs]), carry
                )
                ems.append(np.asarray(er[0]) + 1j * np.asarray(ei[0]))
            return np.concatenate(ems, 0)

        em8, em4, em1 = run_chunked(8), run_chunked(4), run_chunked(1)
        assert np.abs(em8[:la]).max() == 0.0  # latency frames: exact zeros
        np.testing.assert_allclose(em4, em8, atol=1e-6)
        np.testing.assert_allclose(em1, em8, atol=1e-6)  # frame-by-frame
        _, gold = ref.lws_online(
            mag.astype(np.float64), n_sweeps=sw, look_ahead=la, params=P,
            return_spec=True,
        )
        rel = np.abs(em8[la:] - gold[: 24 - la]).max() / np.abs(gold).max()
        assert rel < 2e-3, rel

    def test_drain_matches_offline_tail(self, wav):
        """`lws_online_drain` finalizes an ended stream's look_ahead
        buffered frames exactly as offline `lws_online` finalizes its
        buffer tail: chunked pushes + drain, fed through the streaming
        iSTFT (+end flush cropped to n_fft//2), must reproduce the offline
        waveform — bit-comparably everywhere past the stream head, and the
        assembled stream must be EXACTLY T·hop aligned samples. This is
        the spectral-level exactness contract behind
        StreamingVocoder.flush() (VERDICT r3 next #1)."""
        la, sw, T, cs = 2, 2, 24, 8
        mag = np.asarray(ref.waveform_to_magspec(wav, P)[:T], np.float32)
        off = np.asarray(
            sp.lws_online(
                jnp.asarray(mag[None]), T * P.hop_length,
                n_sweeps=sw, look_ahead=la, params=P,
            )
        )[0]
        carry = sp.lws_online_init(1, la, P)
        ola = sp.istft_stream_init(1, P)
        outs = []
        for c0 in range(0, T, cs):
            (er, ei), carry = sp.lws_online_push(
                jnp.asarray(mag[None, c0 : c0 + cs]), carry,
                n_sweeps=sw, look_ahead=la, params=P,
            )
            e, ola = sp.istft_stream_push(jax.lax.complex(er, ei), ola, P)
            outs.append(np.asarray(e[0]))
        dr_re, dr_im = sp.lws_online_drain(carry, la, P)
        e, ola = sp.istft_stream_push(jax.lax.complex(dr_re, dr_im), ola, P)
        outs.append(np.asarray(e[0]))
        outs.append(
            np.asarray(sp.istft_stream_flush(ola, P)[0, : P.n_fft // 2])
        )
        stream = np.concatenate(outs)
        # Total = (T + la)·hop + n_fft//2: dropping pre-roll (n_fft//2) +
        # latency (la·hop) leaves exactly T·hop samples aligned with the
        # offline [0, T·hop).
        start = P.n_fft // 2 + la * P.hop_length
        assert stream.shape == (T * P.hop_length + start,)
        got = stream[start:]
        # The stream head differs from offline by the documented streaming
        # window-sum convention (the la leading zero frames count toward
        # the stream-start partial NOLA normalization); from n_fft in,
        # everything — including the drained tail — must match.
        np.testing.assert_allclose(
            got[P.n_fft :], off[P.n_fft :], atol=1e-5
        )

    def test_reduces_consistency_error(self, wav):
        mag = ref.waveform_to_magspec(wav, P)[:48]
        x0 = ref.istft(mag.astype(np.complex128), 48 * P.hop_length, P)
        xo = np.asarray(
            sp.lws_online(
                jnp.asarray(mag, jnp.float32), n_sweeps=2, look_ahead=2,
                params=P,
            )
        )
        e0 = np.abs(ref.waveform_to_magspec(x0, P)[:48] - mag).mean()
        eo = np.abs(
            ref.waveform_to_magspec(xo.astype(np.float64), P)[:48] - mag
        ).mean()
        assert eo < 0.35 * e0


class TestLWSBlock:
    """Block-parallel streaming LWS (``spectral.lws_block_push``): same
    stream contract as ``lws_online_push`` (carry from ``lws_online_init``,
    ``look_ahead``-frame latency, C frames emitted per C-frame push) with a
    multicolor Gauss-Seidel arrival schedule — sequential depth
    ``n_sweeps·colors`` per chunk instead of ``C·n_sweeps·(la+1)``.
    Chunking is NOT semantics-free for this engine (documented), so the
    contracts tested are: emission alignment, determinism, validation,
    consistency-error reduction, and quality proximity to the sequential
    engine at its measured sweep budget (BASELINE.md)."""

    LA = 2

    def _stream(self, mag, push, chunk):
        """Push (T, F) magnitudes through a chunked stream; return the
        emitted complex frames, latency-aligned (first LA zeros dropped)."""
        carry = sp.lws_online_init(1, self.LA, P)
        ems = []
        for c0 in range(0, mag.shape[0], chunk):
            (er, ei), carry = push(jnp.asarray(mag[None, c0 : c0 + chunk]), carry)
            ems.append(np.asarray(er[0]) + 1j * np.asarray(ei[0]))
        return np.concatenate(ems, 0)

    def test_emission_contract_and_determinism(self, wav):
        mag = np.asarray(ref.waveform_to_magspec(wav, P)[:16], np.float32)
        push = jax.jit(
            lambda m, c: sp.lws_block_push(
                m, c, n_sweeps=2, look_ahead=self.LA, params=P
            )
        )
        em = self._stream(mag, push, 8)
        assert em.shape == (16, P.n_freq)
        # Latency frames: exact zeros, then |emitted| == the target magnitude
        # (the update renormalizes every frame to its input magnitude).
        assert np.abs(em[: self.LA]).max() == 0.0
        np.testing.assert_allclose(
            np.abs(em[self.LA :]), mag[: 16 - self.LA], atol=1e-4
        )
        np.testing.assert_array_equal(em, self._stream(mag, push, 8))

    def test_carry_shapes_match_online_engine(self, wav):
        mag = np.asarray(ref.waveform_to_magspec(wav, P)[:8], np.float32)
        carry0 = sp.lws_online_init(3, self.LA, P)
        _, c_blk = sp.lws_block_push(
            jnp.asarray(np.stack([mag] * 3)), carry0, look_ahead=self.LA,
            params=P,
        )
        for a, b in zip(carry0, c_blk):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_validation(self):
        carry = sp.lws_online_init(1, 2, P)
        mag = jnp.ones((1, 4, P.n_freq))
        with pytest.raises(ValueError):
            sp.lws_block_push(mag, carry, colors=0, params=P)
        with pytest.raises(ValueError):
            sp.lws_block_push(mag, carry, init="pghi", params=P)

    def test_quality_near_sequential_engine(self, wav):
        """At its 4-sweep default the block schedule's consistency error is
        within 1.6× of the sequential engine's 2-sweep floor (measured ~1.4×
        on this fixture; trained-pipeline mel L1 within 7% — BASELINE.md),
        while both crush the zero-phase baseline."""
        T = 48
        mag64 = ref.waveform_to_magspec(wav, P)[:T]
        mag = np.asarray(mag64, np.float32)

        def err(em):
            spec = np.zeros((T, P.n_freq), np.complex128)
            spec[: T - self.LA] = em[self.LA :]
            x = ref.istft(spec, T * P.hop_length, P)
            return np.abs(
                ref.waveform_to_magspec(x, P)[: T - self.LA]
                - mag64[: T - self.LA]
            ).mean()

        blk = jax.jit(
            lambda m, c: sp.lws_block_push(
                m, c, n_sweeps=4, look_ahead=self.LA, params=P
            )
        )
        seq = jax.jit(
            lambda m, c: sp.lws_online_push(
                m, c, n_sweeps=2, look_ahead=self.LA, params=P
            )
        )
        e_blk = err(self._stream(mag, blk, 16))
        e_seq = err(self._stream(mag, seq, 16))
        x0 = ref.istft(mag64.astype(np.complex128), T * P.hop_length, P)
        e0 = np.abs(ref.waveform_to_magspec(x0, P)[:T] - mag64).mean()
        assert e_blk < 1.6 * e_seq, (e_blk, e_seq)
        assert e_blk < 0.4 * e0, (e_blk, e0)
