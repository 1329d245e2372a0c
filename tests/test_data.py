"""Data-pipeline tests: native WAV codec, audio I/O, slice loader."""

import wave

import numpy as np
import pytest

from advoc_tpu.data import audioio, loader, native


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    for i in range(4):
        x = loader.synthetic_speech(seed=i, n_samples=22050 + i * 1000)
        audioio.save_as_wav(x, d / f"{i}.wav", 22050)
    return d


class TestNativeCodec:
    def test_builds_and_loads(self):
        lib = native.load()
        assert lib is not None

    def test_roundtrip_pcm16(self, tmp_path):
        x = loader.synthetic_speech(seed=7, n_samples=10000)
        p = str(tmp_path / "t.wav")
        audioio.save_as_wav(x, p, 22050)
        y = audioio.decode_audio(p)
        assert y.dtype == np.float32 and len(y) == len(x)
        # write scales by 32767, read by 32768: |err| ≤ (|x| + 0.5)/32768
        np.testing.assert_allclose(y, x, atol=1.5 / 32768)

    def test_native_matches_stdlib_fallback(self, tmp_path):
        x = loader.synthetic_speech(seed=8, n_samples=5000)
        p = str(tmp_path / "t.wav")
        audioio.save_as_wav(x, p, 22050)
        a, sr_a = audioio._decode_native(p)
        b, sr_b = audioio._decode_fallback(p)
        assert sr_a == sr_b == 22050
        np.testing.assert_array_equal(a, b)

    def test_stereo_downmix(self, tmp_path):
        left = np.full(1000, 0.5, np.float32)
        right = np.full(1000, -0.25, np.float32)
        inter = np.stack([left, right], axis=1).reshape(-1)
        pcm = (inter * 32767).astype("<i2")
        p = str(tmp_path / "st.wav")
        with wave.open(p, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        y, sr = audioio._decode_native(p)
        assert sr == 16000 and len(y) == 1000
        np.testing.assert_allclose(y, 0.125, atol=1e-3)

    def test_slice_decode(self, tmp_path):
        x = loader.synthetic_speech(seed=9, n_samples=8000)
        p = str(tmp_path / "t.wav")
        audioio.save_as_wav(x, p, 22050)
        full = audioio.decode_audio(p)
        sl = audioio.decode_audio_slice(p, 1000, 2000)
        np.testing.assert_array_equal(sl, full[1000:3000])
        # Past EOF → zero-padded, never fails.
        tail = audioio.decode_audio_slice(p, 7000, 2000)
        np.testing.assert_array_equal(tail[:1000], full[7000:])
        assert (tail[1000:] == 0).all()

    def test_info(self, wav_dir):
        n, sr = audioio.wav_num_frames(str(wav_dir / "0.wav"))
        assert (n, sr) == (22050, 22050)

    @staticmethod
    def _raw_wav(chunks: list[tuple[bytes, bytes]]) -> bytes:
        body = b"WAVE"
        for cid, payload in chunks:
            body += cid + len(payload).to_bytes(4, "little") + payload
            if len(payload) % 2:
                body += b"\x00"
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    def test_data_chunk_before_fmt(self, tmp_path):
        # A 'data' chunk may legally precede 'fmt '; the parser must still
        # succeed (ADVICE r1: read_header returned false in this ordering).
        pcm = (np.arange(-4, 4, dtype="<i2") * 1000).tobytes()
        fmt = (
            (1).to_bytes(2, "little")        # PCM
            + (1).to_bytes(2, "little")      # mono
            + (22050).to_bytes(4, "little")  # rate
            + (44100).to_bytes(4, "little")  # byte rate
            + (2).to_bytes(2, "little")      # block align
            + (16).to_bytes(2, "little")     # bits
        )
        p = tmp_path / "data_first.wav"
        p.write_bytes(self._raw_wav([(b"data", pcm), (b"fmt ", fmt)]))
        x, sr = audioio._decode_native(str(p))
        assert sr == 22050 and len(x) == 8
        np.testing.assert_allclose(
            x, np.arange(-4, 4, dtype=np.float32) * 1000 / 32768.0
        )

    def test_zero_bits_header_errors_not_crashes(self, tmp_path):
        # bits=0 / channels=0 must return an error code, not SIGFPE the
        # process on the integer division (ADVICE r1, decode_slice path).
        fmt = bytes(2) + bytes(2) + (22050).to_bytes(4, "little") + bytes(6)
        p = tmp_path / "zeros.wav"
        p.write_bytes(self._raw_wav([(b"fmt ", fmt), (b"data", bytes(64))]))
        lib = native.load()
        import ctypes

        out = np.zeros(16, dtype=np.float32)
        rc = lib.advoc_wav_decode_slice(
            str(p).encode(), 0, 16,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        assert rc < 0


class TestLoader:
    def test_train_stream_shapes(self, wav_dir):
        fps = sorted(str(p) for p in wav_dir.iterdir())
        it = loader.decode_extract_and_batch(
            fps, batch_size=8, slice_len=4096, repeat=True, seed=1
        )
        b1, b2 = next(it), next(it)
        assert b1.shape == b2.shape == (8, 4096)
        assert b1.dtype == np.float32
        assert not np.array_equal(b1, b2)  # random crops differ

    def test_int16_wire_dtype_is_lossless_for_pcm16(self, wav_dir):
        # int16 batches halve H2D bytes; for PCM16 sources the round trip
        # through gan.as_waveform must reproduce the float batch exactly.
        import jax.numpy as jnp

        from advoc_tpu.train import gan

        fps = sorted(str(p) for p in wav_dir.iterdir())
        kw = dict(batch_size=4, slice_len=4096, repeat=True, seed=7)
        bf = next(loader.decode_extract_and_batch(fps, **kw))
        bi = next(loader.decode_extract_and_batch(fps, out_dtype="int16", **kw))
        assert bi.dtype == np.int16
        back = np.asarray(gan.as_waveform(jnp.asarray(bi)))
        np.testing.assert_allclose(back, bf, atol=1e-6)

    def test_mulaw8_wire_roundtrip_within_quantization_bound(self, wav_dir):
        # μ-law int8 quarters H2D bytes at ~38 dB quantization SNR: the
        # round trip through gan.as_waveform must stay within the μ-law
        # step bound everywhere and within ~2% relative for small signals.
        import jax.numpy as jnp

        from advoc_tpu.train import gan

        fps = sorted(str(p) for p in wav_dir.iterdir())
        kw = dict(batch_size=4, slice_len=4096, repeat=True, seed=7)
        bf = next(loader.decode_extract_and_batch(fps, **kw))
        bq = next(loader.decode_extract_and_batch(fps, out_dtype="mulaw8", **kw))
        assert bq.dtype == np.int8
        back = np.asarray(gan.as_waveform(jnp.asarray(bq)))
        # worst-case half step in y-space maps through the companding
        # derivative ln(256)·(1/255 + |x|), evaluated where it is largest
        # over the cell (the louder of input and reconstruction).
        amp = np.maximum(np.abs(bf), np.abs(back))
        bound = 0.5 * (np.log(256.0) / 127.0) * (1.0 / 255.0 + amp) + 1e-6
        assert np.all(np.abs(back - bf) <= bound)
        # companding preserves small-signal relative precision
        small = np.abs(bf) > 1e-3
        rel = np.abs(back[small] - bf[small]) / np.abs(bf[small])
        assert np.median(rel) < 0.02

    def test_mulaw8_codec_constants_match(self):
        # The encode (loader) and decode (gan.as_waveform) halves of the
        # μ-law codec each carry their own ln(256); they must stay equal
        # or the int8 wire silently decodes wrong (ADVICE r3).
        from advoc_tpu.train import gan

        assert gan._MULAW_LN256 == loader._MULAW_LN256

    def test_mulaw8_foreign_minus128_decodes_in_range(self):
        # −128 is never produced by mulaw8_encode (clips to ±127) but a
        # foreign int8 array may contain it; the decoder clamps so the
        # result stays inside [−1, 1] (ADVICE r3).
        import jax.numpy as jnp

        from advoc_tpu.train import gan

        out = np.asarray(
            gan.as_waveform(jnp.asarray([-128, -127, 127], jnp.int8))
        )
        assert np.all(np.abs(out) <= 1.0)
        np.testing.assert_allclose(out[0], out[1], rtol=0, atol=1e-7)

    def test_mulaw8_encode_symmetric_and_monotone(self):
        x = np.linspace(-1.0, 1.0, 4097, dtype=np.float32)
        q = loader.mulaw8_encode(x)
        assert q.min() == -127 and q.max() == 127
        assert np.array_equal(loader.mulaw8_encode(-x), -q)  # odd symmetry
        assert np.all(np.diff(q.astype(np.int32)) >= 0)  # monotone
        assert loader.mulaw8_encode(np.zeros(3, np.float32)).tolist() == [0, 0, 0]

    def test_bad_out_dtype_raises(self, wav_dir):
        fps = sorted(str(p) for p in wav_dir.iterdir())
        with pytest.raises(ValueError, match="out_dtype"):
            loader.decode_extract_and_batch(
                fps, batch_size=2, slice_len=1024, out_dtype="int8"
            )

    def test_eval_pass_is_finite_and_sequential(self, wav_dir):
        fps = sorted(str(p) for p in wav_dir.iterdir())
        it = loader.decode_extract_and_batch(
            fps,
            batch_size=4,
            slice_len=8192,
            repeat=False,
            shuffle=False,
            drop_remainder=False,
        )
        batches = list(it)
        total = sum(b.shape[0] for b in batches)
        # each file yields floor((n-slice)/slice)+1 sequential windows
        expected = sum(
            len(loader._slice_plan_eval(audioio.wav_num_frames(fp)[0], 8192, 8192))
            for fp in fps
        )
        assert total == expected

    def test_device_prefetch(self, wav_dir):
        import jax

        fps = sorted(str(p) for p in wav_dir.iterdir())
        it = loader.decode_extract_and_batch(
            fps, batch_size=8, slice_len=1024, repeat=False, drop_remainder=True
        )
        dev_it = loader.device_prefetch(it, depth=2)
        b = next(dev_it)
        assert isinstance(b, jax.Array) and b.shape == (8, 1024)

    def test_device_prefetch_sharded(self, wav_dir):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        sharding = NamedSharding(mesh, P("data"))
        fps = sorted(str(p) for p in wav_dir.iterdir())
        it = loader.decode_extract_and_batch(
            fps, batch_size=16, slice_len=1024, repeat=False
        )
        b = next(loader.device_prefetch(it, sharding=sharding))
        assert len(b.sharding.device_set) == 8

    def test_synthetic_speech_deterministic(self):
        a = loader.synthetic_speech(3, 4000)
        b = loader.synthetic_speech(3, 4000)
        np.testing.assert_array_equal(a, b)
        assert np.abs(a).max() <= 0.71

    def test_sample_rate_mismatch_raises(self, tmp_path):
        x = loader.synthetic_speech(seed=5, n_samples=8000)
        p = tmp_path / "16k.wav"
        audioio.save_as_wav(x, p, 16000)
        with pytest.raises(ValueError, match="22050"):
            loader.decode_extract_and_batch(
                [str(p)], batch_size=1, slice_len=1024, sample_rate=22050
            )

    def test_producer_decode_error_reraises_in_consumer(
        self, wav_dir, monkeypatch
    ):
        """A corrupt file mid-stream must kill the stream loudly, not end it
        as if the epoch completed (train_loop would otherwise checkpoint and
        return as 'done'). VERDICT r1 weak #4."""
        fps = sorted(str(p) for p in wav_dir.iterdir())
        real = audioio.decode_audio_slice
        calls = {"n": 0}

        def flaky(fp, start, count):
            calls["n"] += 1
            if calls["n"] > 8:  # first batch decodes fine, then "corruption"
                raise RuntimeError("corrupt wav data")
            return real(fp, start, count)

        monkeypatch.setattr(
            "advoc_tpu.data.audioio.decode_audio_slice", flaky
        )
        it = loader.decode_extract_and_batch(
            fps, batch_size=8, slice_len=1024, seed=0, prefetch=1
        )
        next(it)  # first batch is fine
        with pytest.raises(RuntimeError, match="corrupt wav data"):
            for _ in range(10):
                next(it)

    def test_corrupt_file_raises(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"RIFF\x10\x00\x00\x00WAVEgarbage-not-chunks")
        with pytest.raises(Exception):
            it = loader.decode_extract_and_batch(
                [str(p)], batch_size=1, slice_len=128
            )
            next(it)


class TestDeviceCorpus:
    """HBM-resident corpus: on-device crop sampling (BASELINE.md r5)."""

    def test_bit_identical_to_int16_wire_at_matched_seed(self, wav_dir):
        # The whole point: same seed ⇒ same (file, offset) stream as the
        # wire loader, same round(x·32768) samples ⇒ gathered batches equal
        # the int16 wire batches EXACTLY.
        fps = sorted(str(p) for p in wav_dir.iterdir())
        kw = dict(batch_size=4, slice_len=4096, repeat=True, seed=11)
        wire = loader.decode_extract_and_batch(fps, out_dtype="int16", **kw)
        corpus = loader.DeviceCorpus(fps, 4096, sample_rate=22050)
        starts = corpus.starts(4, seed=11)
        for _ in range(3):
            bw = next(wire)
            bh = np.asarray(corpus.gather(next(starts)))
            assert bh.dtype == np.int16
            np.testing.assert_array_equal(bh, bw)

    def test_short_file_zero_padded(self, tmp_path):
        x = loader.synthetic_speech(seed=3, n_samples=1000)
        audioio.save_as_wav(x, tmp_path / "short.wav", 22050)
        corpus = loader.DeviceCorpus([str(tmp_path / "short.wav")], 4096)
        b = np.asarray(corpus.gather(next(corpus.starts(2, seed=0))))
        assert b.shape == (2, 4096)
        assert (b[:, 1000:] == 0).all()  # tail is stage-time padding

    def test_gather_inside_jit_on_mesh(self, wav_dir):
        # hbm_data_step: gather + sharding constraint must compose with the
        # DP-jitted train step on the forced 8-device mesh.
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from advoc_tpu.models.advoc import AdvocGenerator, PatchDiscriminator
        from advoc_tpu.models.advoc.model import small_config
        from advoc_tpu.ops.reference import DEFAULT_PARAMS
        from advoc_tpu.parallel import data_mesh
        from advoc_tpu.train import gan

        fps = sorted(str(p) for p in wav_dir.iterdir())
        mesh = data_mesh()
        cfg = small_config()
        slice_len = cfg.n_frames * DEFAULT_PARAMS.hop_length
        corpus = loader.DeviceCorpus(
            fps, slice_len, sharding=NamedSharding(mesh, P())
        )
        g, d = AdvocGenerator(cfg), PatchDiscriminator(cfg)
        est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
        gstate, dstate = gan.make_states(g, d, (est0,), (est0, est0))
        base = gan.make_advoc_train_step(g, d, cfg, DEFAULT_PARAMS)

        # Reference: wire path, same starts → same batch → same metrics.
        starts = next(corpus.starts(8, seed=5))
        batch = np.asarray(corpus.gather(starts))
        dp_wire = gan.jit_data_parallel(base, mesh, donate=False)
        _, _, m_wire = dp_wire(gstate, dstate, batch, jax.random.PRNGKey(2))

        # hbm_data_step owns its jit (no jit_data_parallel re-wrap — an
        # outer jit would re-capture the corpus as a lowered constant).
        hbm = loader.hbm_data_step(base, corpus, mesh, donate=False)
        _, _, m_hbm = hbm(gstate, dstate, starts, jax.random.PRNGKey(2))
        for k in m_wire:
            np.testing.assert_allclose(
                float(m_hbm[k]), float(m_wire[k]), rtol=1e-6,
                err_msg=f"metric {k} differs between hbm and wire paths",
            )

    def test_corpus_never_lowered_as_constant(self, wav_dir):
        # Regression (r5 full-scale run): closing over the staged buffer
        # embedded the whole corpus in the executable — 3.68 GB of lowered
        # constants that the compile service then had to ship. The corpus
        # must ride as a jit ARGUMENT. Trip jax's captured-constants
        # warning threshold below the corpus size and assert silence.
        import warnings

        import jax
        import jax.numpy as jnp

        from advoc_tpu.models.advoc import AdvocGenerator, PatchDiscriminator
        from advoc_tpu.models.advoc.model import small_config
        from advoc_tpu.ops.reference import DEFAULT_PARAMS
        from advoc_tpu.parallel import data_mesh
        from advoc_tpu.train import gan

        fps = sorted(str(p) for p in wav_dir.iterdir())
        cfg = small_config()
        slice_len = cfg.n_frames * DEFAULT_PARAMS.hop_length
        corpus = loader.DeviceCorpus(fps, slice_len)
        assert corpus.nbytes > 64 * 1024  # threshold must sit below this
        old = jax.config.jax_captured_constants_warn_bytes
        jax.config.update("jax_captured_constants_warn_bytes", 64 * 1024)
        try:
            g, d = AdvocGenerator(cfg), PatchDiscriminator(cfg)
            est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
            gstate, dstate = gan.make_states(g, d, (est0,), (est0, est0))
            base = gan.make_advoc_train_step(g, d, cfg, DEFAULT_PARAMS)
            step = loader.hbm_data_step(base, corpus, data_mesh(),
                                        donate=False)
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter("always")
                step(gstate, dstate, next(corpus.starts(8, seed=1)),
                     jax.random.PRNGKey(0))
            bad = [w for w in caught
                   if "constants were captured" in str(w.message)]
            assert not bad, f"corpus captured as constant: {bad[0].message}"
        finally:
            jax.config.update("jax_captured_constants_warn_bytes", old)
