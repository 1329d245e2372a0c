"""Eval metric sanity + profiling utility tests."""

import numpy as np

import jax.numpy as jnp

from advoc_tpu.data import loader
from advoc_tpu.train import eval_metrics as em
from advoc_tpu.utils.profiling import StepProfiler, timed_call


class TestEvalMetrics:
    def test_identity_is_perfect(self):
        wav = jnp.asarray(loader.synthetic_speech(0, 16384))
        m = em.vocoder_eval(wav, wav)
        assert float(m["spec_l1"]) == 0.0
        assert float(m["lsd_db"]) == 0.0
        assert float(m["mel_l1"]) == 0.0
        assert float(m["snr_db"]) > 100.0

    def test_noise_degrades_monotonically(self):
        wav = jnp.asarray(loader.synthetic_speech(1, 16384))
        rng = np.random.default_rng(0)
        noise = jnp.asarray(rng.standard_normal(16384).astype(np.float32))
        small = em.vocoder_eval(wav, wav + 0.01 * noise)
        big = em.vocoder_eval(wav, wav + 0.1 * noise)
        assert float(small["snr_db"]) > float(big["snr_db"])
        assert float(small["lsd_db"]) < float(big["lsd_db"])
        assert float(small["mel_l1"]) < float(big["mel_l1"])

    def test_lsd_known_value(self):
        a = jnp.full((4, 8), 1.0)
        b = jnp.full((4, 8), 10.0)  # exactly 20 dB apart
        assert abs(float(em.log_spectral_distance(a, b)) - 20.0) < 1e-4


class TestProfiling:
    def test_timed_call(self):
        fn = lambda x: x * 2  # noqa: E731
        dt, out = timed_call(fn, jnp.ones(8), trials=2, warmup=1)
        assert dt > 0 and out.shape == (8,)

    def test_step_profiler(self):
        p = StepProfiler(window=10)
        for _ in range(5):
            p.tick()
        s = p.summary()
        assert s["steps_per_sec"] > 0
        assert s["step_time_max_s"] >= s["step_time_p50_s"]


class TestMelspecMomentPanel:
    """VERDICT r2 weak #7: collapse must be detectable where global moments
    are blind."""

    def _real(self, b=8, t=32, m=16, seed=0):
        rng = np.random.default_rng(seed)
        # band-structured "mels": distinct per-band means + noise
        base = np.linspace(0.2, 0.8, m)[None, None, :]
        x = base + 0.1 * rng.standard_normal((b, t, m))
        return jnp.asarray(np.clip(x, 0, 1).astype(np.float32))

    def test_matched_distribution_scores_low(self):
        from advoc_tpu.train.eval_metrics import melspec_moment_panel

        real, fake = self._real(seed=0), self._real(seed=1)
        m = {k: float(v) for k, v in melspec_moment_panel(real, fake).items()}
        assert m["eval_band_mean_l1"] < 0.02, m
        assert m["eval_diversity_gap"] < 0.02, m

    def test_mode_collapse_flagged_by_diversity_not_global_moments(self):
        from advoc_tpu.train.eval_metrics import melspec_moment_panel

        real = self._real(seed=0)
        # Collapapsed generator: one sample with the RIGHT global mean/std,
        # repeated for the whole batch.
        one = np.asarray(self._real(b=1, seed=2))
        fake = jnp.asarray(np.repeat(one, real.shape[0], axis=0))
        m = {k: float(v) for k, v in melspec_moment_panel(real, fake).items()}
        assert m["eval_mean_gap"] < 0.05, m          # global moments blind
        assert m["eval_std_gap"] < 0.05, m
        assert m["eval_diversity_gap"] > 0.05, m     # diversity catches it

    def test_wrong_envelope_flagged_by_band_moments(self):
        from advoc_tpu.train.eval_metrics import melspec_moment_panel

        real = self._real(seed=0)
        # Right global stats, wrong spectral envelope: bands reversed.
        fake = real[..., ::-1]
        m = {k: float(v) for k, v in melspec_moment_panel(real, fake).items()}
        assert m["eval_mean_gap"] < 1e-5, m
        assert m["eval_std_gap"] < 1e-5, m
        assert m["eval_band_mean_l1"] > 0.1, m


class TestStoi:
    """Property tests for the host-side STOI implementation (absolute
    values are a proxy — see the stoi docstring; deltas are the signal)."""

    def _speech(self, seed=0, seconds=3.0, sr=22050):
        return np.asarray(
            loader.synthetic_speech(seed, int(seconds * sr), sample_rate=sr)
        )

    def test_identity_is_one(self):
        x = self._speech()
        assert em.stoi(x, x) > 0.999

    def test_monotone_under_noise(self):
        x = self._speech()
        rng = np.random.default_rng(0)
        noise = rng.standard_normal(x.shape)
        scores = [
            em.stoi(x, x + sigma * noise) for sigma in (0.0, 0.02, 0.5, 1.0)
        ]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores
        assert scores[1] > 0.7, scores  # +18 dB SNR: mostly intact
        assert scores[-1] < 0.4, scores  # −16 dB SNR: clearly degraded

    def test_unrelated_noise_scores_low(self):
        x = self._speech(seed=3)
        rng = np.random.default_rng(3)
        assert em.stoi(x, rng.standard_normal(x.shape)) < 0.3

    def test_bounded(self):
        x = self._speech(seed=1)
        rng = np.random.default_rng(1)
        y = rng.standard_normal(x.shape)
        s = em.stoi(x, y)
        assert -1.0 <= s <= 1.0

    def test_silence_reference_is_nan(self):
        x = np.zeros(44100, np.float32)
        y = self._speech()[:44100]
        assert np.isnan(em.stoi(x, y))

    def test_too_short_is_nan(self):
        x = self._speech()[:1000]
        assert np.isnan(em.stoi(x, x))

    def test_vad_ignores_padded_silence(self):
        # Appending silence to both signals must not change the score
        # (the VAD drops those frames): identity still scores ~1.
        x = self._speech(seed=2)
        xp = np.concatenate([x, np.zeros(22050, np.float32)])
        assert em.stoi(xp, xp) > 0.999
