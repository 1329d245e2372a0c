"""In-process CLI tests: argument surface + infer paths on tiny models."""

import numpy as np
import pytest

TINY = "width=8,depth=4,n_frames=64,disc_width=8,dtype=float32"


class TestAdvocCLI:
    def test_infer_no_checkpoint_writes_wav(self, tmp_path):
        from advoc_tpu.models.advoc import train_evaluate as te

        te.main([
            "--mode", "infer", "--train_dir", str(tmp_path),
            "--model_overrides", TINY, "--gl_iters", "1",
            "--infer_dir", str(tmp_path / "out"),
        ])
        wavs = list((tmp_path / "out").glob("*.wav"))
        assert len(wavs) == 1

    def test_infer_from_npy_mels(self, tmp_path):
        from advoc_tpu.models.advoc import train_evaluate as te

        mels = np.random.default_rng(0).uniform(0, 1, (2, 64, 80)).astype(
            np.float32
        )
        np.save(tmp_path / "mels.npy", mels)
        te.main([
            "--mode", "infer", "--train_dir", str(tmp_path),
            "--model_overrides", TINY, "--gl_iters", "1",
            "--infer_input", str(tmp_path / "mels.npy"),
            "--infer_dir", str(tmp_path / "out"),
        ])
        assert len(list((tmp_path / "out").glob("*.wav"))) == 2

    def test_bad_override_rejected(self, tmp_path):
        from advoc_tpu.models.advoc import train_evaluate as te

        with pytest.raises(ValueError, match="unknown config field"):
            te.main([
                "--mode", "infer", "--train_dir", str(tmp_path),
                "--model_overrides", "wdith=8",
            ])

    def test_bad_mode_rejected(self):
        from advoc_tpu.models.advoc import train_evaluate as te

        with pytest.raises(SystemExit):
            te.main(["--mode", "frobnicate", "--train_dir", "/tmp/x"])


class TestWaveGANCLI:
    def test_infer_writes_wavs(self, tmp_path):
        from advoc_tpu.models.wavegan import train_evaluate as te

        te.main([
            "--mode", "infer", "--train_dir", str(tmp_path),
            "--model_overrides",
            "slice_len=1024,latent_dim=8,width=8,dtype=float32",
            "--n_samples", "2", "--infer_dir", str(tmp_path / "out"),
        ])
        assert len(list((tmp_path / "out").glob("*.wav"))) == 2


class TestMelSpecGANCLI:
    def test_infer_writes_mels_and_vocodes(self, tmp_path):
        from advoc_tpu.models.melspecgan import train_evaluate as te

        te.main([
            "--mode", "infer", "--train_dir", str(tmp_path),
            "--model_overrides", "latent_dim=8,width=8,dtype=float32",
            "--n_samples", "2", "--vocode",
            "--infer_dir", str(tmp_path / "out"),
        ])
        out = tmp_path / "out"
        assert (out / "mels.npy").exists()
        assert len(list(out.glob("*.wav"))) == 2


class TestMelSpecGANAdvocPipeline:
    """The paper's unconditional pipeline: melspecgan samples mels, a
    *trained* advoc generator repairs the heuristic estimate before phase
    recovery (SURVEY.md §2.1 #13, VERDICT round-1 missing #3)."""

    def _save_advoc_ckpt(self, ckpt_dir, step=3):
        import jax.numpy as jnp

        from advoc_tpu.models.advoc import AdvocGenerator, PatchDiscriminator
        from advoc_tpu.models.advoc.model import AdvocConfig
        from advoc_tpu.train import gan
        from advoc_tpu.train.checkpoint import CheckpointManager
        from advoc_tpu.utils import apply_overrides

        acfg = apply_overrides(AdvocConfig(), TINY)
        g = AdvocGenerator(acfg)
        d = PatchDiscriminator(acfg)
        est0 = jnp.zeros((1, acfg.n_frames, acfg.n_freq))
        gstate, dstate = gan.make_states(g, d, (est0,), (est0, est0), seed=0)
        mgr = CheckpointManager(ckpt_dir)
        mgr.save(step, {"g": gstate, "d": dstate})
        mgr.close()

    def test_vocode_through_trained_advoc(self, tmp_path, capsys):
        from advoc_tpu.models.melspecgan import train_evaluate as te

        ckpt_dir = tmp_path / "advoc_run"
        self._save_advoc_ckpt(ckpt_dir)
        te.main([
            "--mode", "infer", "--train_dir", str(tmp_path / "msg"),
            "--model_overrides", "latent_dim=8,width=8,dtype=float32",
            "--n_samples", "2", "--vocode", "--gl_iters", "1",
            "--advoc_ckpt", str(ckpt_dir), "--advoc_overrides", TINY,
            "--infer_dir", str(tmp_path / "out"),
        ])
        out = tmp_path / "out"
        assert len(list(out.glob("*.wav"))) == 2
        captured = capsys.readouterr().out
        assert "advoc step 3" in captured
        assert "mel L1" in captured

    def test_missing_advoc_ckpt_raises(self, tmp_path):
        from advoc_tpu.models.melspecgan import train_evaluate as te

        with pytest.raises(FileNotFoundError, match="no checkpoint"):
            te.main([
                "--mode", "infer", "--train_dir", str(tmp_path / "msg"),
                "--model_overrides", "latent_dim=8,width=8,dtype=float32",
                "--n_samples", "1", "--vocode", "--gl_iters", "1",
                "--advoc_ckpt", str(tmp_path / "nonexistent"),
                "--infer_dir", str(tmp_path / "out"),
            ])


class TestVocodeCLI:
    def test_npy_to_wavs(self, tmp_path):
        from advoc_tpu.infer import vocode_cli

        mels = np.random.default_rng(1).uniform(0, 1, (64, 80)).astype(
            np.float32
        )
        np.save(tmp_path / "m.npy", mels)
        vocode_cli.main([
            "--input", str(tmp_path / "m.npy"),
            "--out_dir", str(tmp_path / "out"),
            "--model_overrides", TINY, "--gl_iters", "1",
        ])
        assert len(list((tmp_path / "out").glob("*.wav"))) == 1

    def test_batched_matches_per_file(self, tmp_path):
        """--batch groups mels into padded fixed-shape device calls; batch
        rows are mathematically independent, so the grouped path's wavs
        must match --batch 1's per-file wavs."""
        from advoc_tpu.data import audioio
        from advoc_tpu.infer import Vocoder, vocode_cli
        from advoc_tpu.ops.reference import DEFAULT_PARAMS as P

        rng = np.random.default_rng(2)
        # Library invariant first: padded batched call ≡ solo calls,
        # including a shorter-than-bucket row cropped correctly.
        mels = [rng.uniform(0, 1, (t, 80)).astype(np.float32)
                for t in (60, 64, 50)]
        voc = Vocoder(params=P, chunk_frames=64, gl_iters=1)
        solo = [np.asarray(voc(m)) for m in mels]
        mb = np.zeros((4, 64, 80), np.float32)  # one padded row too
        for r, m in enumerate(mels):
            mb[r, : len(m)] = m
        grouped = np.asarray(voc(mb))
        for r, m in enumerate(mels):
            np.testing.assert_allclose(
                grouped[r, : len(m) * P.hop_length], solo[r],
                rtol=0, atol=1e-5,
            )

        # CLI grouped path: a (3, 64, 80) npy at --batch 2 → two padded
        # device calls (2 + 1-padded-to-2); wavs must match --batch 1.
        arr = np.stack([np.pad(m, ((0, 64 - len(m)), (0, 0)))
                        for m in mels])
        np.save(tmp_path / "m.npy", arr)
        for mode, batch in (("solo", "1"), ("grouped", "2")):
            vocode_cli.main([
                "--input", str(tmp_path / "m.npy"),
                "--out_dir", str(tmp_path / mode),
                "--model_overrides", TINY, "--gl_iters", "1",
                "--batch", batch,
            ])
        for i in range(3):
            a = audioio.decode_audio(tmp_path / "solo" / f"m_{i}.wav",
                                     P.sample_rate)
            b = audioio.decode_audio(tmp_path / "grouped" / f"m_{i}.wav",
                                     P.sample_rate)
            np.testing.assert_allclose(a, b, rtol=0, atol=2e-4)

    def test_aot_export_then_serve(self, tmp_path):
        from advoc_tpu.infer import vocode_cli

        mels = np.random.default_rng(2).uniform(0, 1, (64, 80)).astype(
            np.float32
        )
        np.save(tmp_path / "m.npy", mels)
        common = ["--input", str(tmp_path / "m.npy"),
                  "--model_overrides", TINY, "--gl_iters", "1"]
        vocode_cli.main(common + [
            "--out_dir", str(tmp_path / "unused"),
            "--aot_export", str(tmp_path / "aot"),
        ])
        assert (tmp_path / "aot" / "manifest.json").exists()
        assert not list((tmp_path / "unused").glob("*.wav"))  # export only
        vocode_cli.main(common + [
            "--out_dir", str(tmp_path / "out"),
            "--aot", str(tmp_path / "aot"),
        ])
        assert len(list((tmp_path / "out").glob("*.wav"))) == 1


class TestStreamServeCLI:
    """scripts/stream_serve.py — the serving-loop demo/benchmark harness."""

    def _run(self, capsys, extra):
        import json
        import sys

        sys.path.insert(0, "scripts")
        import stream_serve

        stream_serve.main([
            "--chunk_frames", "16", "--pushes", "4", "--fidelity",
        ] + extra)
        out = capsys.readouterr().out
        line = [l for l in out.splitlines()
                if l.startswith("STREAM_SERVE_RESULT ")][0]
        return json.loads(line[len("STREAM_SERVE_RESULT "):])

    def test_gl_engine_heuristic(self, capsys):
        r = self._run(capsys, ["--engine", "gl", "--gl_iters", "2"])
        assert r["engine"] == "gl" and r["pushes"] == 4
        assert r["p50_ms"] > 0 and r["mel_l1"] < 0.2

    def test_lws_engine_multistream(self, capsys):
        r = self._run(capsys, [
            "--engine", "lws_online", "--n_streams", "2",
            "--lws_sweeps", "1", "--lws_look_ahead", "1",
        ])
        assert r["n_streams"] == 2
        # Both fields are independently rounded to 3 decimals in the JSON,
        # so they can differ by up to 1e-3 (was a flaky exact-approx).
        assert r["ms_per_stream"] == pytest.approx(r["p50_ms"] / 2, abs=1e-3)
        assert r["mel_l1"] < 0.2


class TestVocodeClientCLI:
    """scripts/vocode_client.py — file-in / WAV-out through the TCP server."""

    def test_roundtrip_writes_wav_with_fidelity(self, tmp_path, capsys):
        import json
        import sys

        from advoc_tpu.infer import StreamingVocoder
        from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
        from advoc_tpu.serve import start_in_thread

        sys.path.insert(0, "scripts")
        import vocode_client

        sv = StreamingVocoder(
            params=P, chunk_frames=16, n_streams=2, gl_iters=4,
            emit_dtype="int16",
        )
        handle = start_in_thread(sv)
        try:
            host, port = handle.address
            out = tmp_path / "out.wav"
            vocode_client.main([
                "--host", host, "--port", str(port),
                "--seconds", "1.0", "--output", str(out), "--fidelity",
            ])
        finally:
            handle.stop()
        line = next(
            ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("VOCODE_CLIENT_RESULT ")
        )
        r = json.loads(line.split(" ", 1)[1])
        assert r["mel_l1"] < 0.2
        assert abs(r["seconds_out"] - 1.0) < 0.1

        from advoc_tpu.data import audioio

        wav = audioio.decode_audio(out, P.sample_rate)
        # Output is trimmed to whole mel frames (hop multiple) ≈ 1.0 s;
        # seconds_out in the JSON is rounded to 2 decimals.
        assert wav.shape[0] % P.hop_length == 0
        assert abs(wav.shape[0] / P.sample_rate - 1.0) < 0.05


class TestStressEvalCLI:
    """scripts/stress_eval.py — offline + streaming panel protocols."""

    def _run(self, capsys, extra):
        import sys

        sys.path.insert(0, "scripts")
        import stress_eval

        stress_eval.main(["--n_frames", "64", "--gl_iters", "2"] + extra)
        out = capsys.readouterr().out
        assert "| silence |" in out and "| dc |" in out
        return out

    def test_offline_heuristic_panel(self, capsys):
        self._run(capsys, [])

    def test_streaming_panel(self, capsys):
        out = self._run(capsys, [
            "--streaming", "lws_block", "--chunk_frames", "16",
            "--lws_look_ahead", "1", "--lws_sweeps", "1",
        ])
        assert "streaming lws_block" in out


class TestCompilationCacheHelper:
    """utils.enable_compilation_cache — the CLI cold-start hook (BASELINE r4).

    jax is pre-imported at interpreter startup on the target machine, so the
    helper must work through jax.config.update, not just the env var; and the
    conftest relies on '' meaning "explicitly disabled"."""

    def test_empty_env_means_disabled(self, monkeypatch):
        from advoc_tpu.utils import enable_compilation_cache

        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
        assert enable_compilation_cache() is None

    def test_existing_env_respected(self, monkeypatch):
        import jax

        from advoc_tpu.utils import enable_compilation_cache

        prev = jax.config.jax_compilation_cache_dir
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/some_cache")
        try:
            assert enable_compilation_cache("/elsewhere") == "/tmp/some_cache"
            # jax already imported → must go through jax.config too.
            assert jax.config.jax_compilation_cache_dir == "/tmp/some_cache"
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    def test_default_when_unset(self, monkeypatch, tmp_path):
        import os

        import jax

        from advoc_tpu.utils import enable_compilation_cache

        prev = jax.config.jax_compilation_cache_dir
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        try:
            got = enable_compilation_cache(str(tmp_path / "cache"))
            assert got == str(tmp_path / "cache")
            assert os.environ["JAX_COMPILATION_CACHE_DIR"] == got
            assert jax.config.jax_compilation_cache_dir == got
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)


class TestRunCorpusRunbook:
    """One-command corpus runbook (VERDICT r4 next #7): every production
    stage — prep → train(+concurrent CPU eval) → bundle → stress panel →
    AOT export → precompile → serve selftest — green from ONE command on a
    tiny synthetic corpus. The full-scale (13k files, 22.05 kHz) rehearsal
    of the same command is recorded in BASELINE.md r5."""

    def test_end_to_end_tiny(self, tmp_path, capfd):
        import json
        import re
        import runpy
        import sys

        argv = [
            "run_corpus.py",
            "--corpus_dir", str(tmp_path / "corpus"),
            "--run_dir", str(tmp_path / "run"),
            "--synthetic", "6", "--cpu",
            "--model_overrides",
            "width=8,depth=4,n_frames=64,disc_width=8,dtype=float32",
            "--max_steps", "2", "--ckpt_every", "2", "--batch_size", "2",
            "--eval_fraction", "0.25", "--eval_timeout_s", "15",
            "--gl_iters", "2", "--serve_clients", "1",
        ]
        import pathlib
        script = (pathlib.Path(__file__).resolve().parent.parent
                  / "scripts" / "run_corpus.py")
        old_argv = sys.argv
        sys.argv = argv
        try:
            runpy.run_path(str(script), run_name="__main__")
        finally:
            sys.argv = old_argv
        out = capfd.readouterr().out
        m = re.search(r"RUN_CORPUS_RESULT (\{.*\})", out)
        assert m, out[-2000:]
        result = json.loads(m.group(1))
        assert result["ok"] is True
        assert set(result["stages_s"]) >= {
            "synthesize", "prep", "train", "bundle", "panel", "aot",
            "precompile", "serve",
        }, result["stages_s"]
        # Every stage left its log and the serve selftest really served.
        logs = tmp_path / "run" / "logs"
        for s in ("prep", "train", "eval", "panel", "aot", "precompile",
                  "serve"):
            assert (logs / f"{s}.log").exists(), s
        assert result["serve"]["pushes"] == 6
