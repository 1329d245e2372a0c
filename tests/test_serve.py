"""Serving-layer tests: TCP protocol, slot multiplexing, batched ticks.

The correctness backbone is the masked-push contract (tests/test_infer.py
TestMaskedPush): per-slot emissions are bit-invariant to how the server's
ticks happen to group concurrent clients, so every test here compares a
client's TCP-received stream against a direct one-hot-masked push on an
identical StreamingVocoder — regardless of racing ticks.
"""

import socket
import threading
import time

import numpy as np
import pytest

import jax.numpy as jnp

from advoc_tpu.data import loader
from advoc_tpu.infer import StreamingVocoder
from advoc_tpu.ops import spectral as sp
from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
from advoc_tpu.serve import VocodeClient, start_in_thread
from advoc_tpu.serve import protocol as pr

CH = 16


def make_sv(n_slots, engine="gl", **kw):
    if engine == "gl":
        kw.setdefault("gl_iters", 4)
    else:
        kw.setdefault("lws_look_ahead", 1)
        kw.setdefault("lws_sweeps", 1)
    return StreamingVocoder(
        params=P, chunk_frames=CH, n_streams=n_slots,
        phase_engine=engine, **kw
    )


def mel_chunks(chunks, seed=0):
    wav = loader.synthetic_speech(seed, CH * chunks * P.hop_length)
    m = sp.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
    return np.asarray(m[: CH * chunks]).reshape(chunks, CH, P.n_mels)


def ref_stream(sv_ref, slot, mels):
    """Direct one-hot masked pushes: the grouping-invariant reference."""
    n = sv_ref.n_streams
    active = np.zeros(n, bool)
    active[slot] = True
    outs = []
    for m in mels:
        batch = np.zeros((n, CH, P.n_mels), np.float32)
        batch[slot] = m
        outs.append(sv_ref.push(batch, active=active)[slot])
    return outs


@pytest.fixture()
def served():
    """A 4-slot heuristic gl server + an identical reference vocoder."""
    handle = start_in_thread(make_sv(4), coalesce_ms=10.0)
    yield handle, make_sv(4)
    handle.stop()


class TestVocodeServer:
    def test_roundtrip_matches_direct_push(self, served):
        handle, sv_ref = served
        host, port = handle.address
        mels = mel_chunks(3)
        with VocodeClient(host, port) as c:
            got = [c.vocode(m) for m in mels]
            assert got[0].shape == (c.config["emit_samples"],)
            assert got[0].dtype == np.float32
            ref = ref_stream(sv_ref, c.slot, mels)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)

    def test_concurrent_clients_are_isolated_and_batched(self, served):
        handle, sv_ref = served
        host, port = handle.address
        n_cli, pushes = 4, 4
        all_mels = [mel_chunks(pushes, seed=i) for i in range(n_cli)]
        results: list = [None] * n_cli
        barrier = threading.Barrier(n_cli)

        def client(i):
            with VocodeClient(host, port) as c:
                outs = []
                for k in range(pushes):
                    barrier.wait()  # sync so ticks must multiplex slots
                    outs.append(c.vocode(all_mels[i][k]))
                results[i] = (c.slot, outs)

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(n_cli)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        slots = {results[i][0] for i in range(n_cli)}
        assert len(slots) == n_cli  # distinct leases
        for i in range(n_cli):
            slot, outs = results[i]
            for g, r in zip(outs, ref_stream(sv_ref, slot, all_mels[i])):
                np.testing.assert_array_equal(g, r)
        # With a client barrier + 10 ms coalesce, ticks must have carried
        # >1 stream on average (the whole point of the batching loop).
        stats = handle.server.stats
        assert stats.pushes == n_cli * pushes
        assert stats.ticks < stats.pushes, (stats.ticks, stats.pushes)

    def test_flush_drains_and_resets(self, served):
        """OP_FLUSH returns the slot's pending flush_samples (bit-equal to
        a direct masked flush) and leaves the slot fresh for a new
        utterance — closes the shipped-contract hole where a client's
        final samples were lost unless it silence-padded (VERDICT r3)."""
        handle, sv_ref = served
        host, port = handle.address
        mels = mel_chunks(2)
        with VocodeClient(host, port) as c:
            outs = [c.vocode(m) for m in mels]
            tail = c.flush()
            assert tail.shape == (c.config["flush_samples"],)
            ref_outs = ref_stream(sv_ref, c.slot, mels)
            for g, r in zip(outs, ref_outs):
                np.testing.assert_array_equal(g, r)
            fmask = np.zeros(sv_ref.n_streams, bool)
            fmask[c.slot] = True
            ref_tail = sv_ref.flush(active=fmask)[c.slot]
            np.testing.assert_array_equal(tail, ref_tail)
            # The slot is a fresh utterance now, on both sides.
            again = c.vocode(mels[0])
            ref_again = ref_stream(sv_ref, c.slot, mels[:1])[0]
            np.testing.assert_array_equal(again, ref_again)
        assert handle.server.stats.flushes == 1

    def test_reset_starts_fresh_utterance(self, served):
        handle, _ = served
        host, port = handle.address
        mels = mel_chunks(2)
        with VocodeClient(host, port) as c:
            first = c.vocode(mels[0])
            c.vocode(mels[1])
            c.reset()
            again = c.vocode(mels[0])
        np.testing.assert_array_equal(first, again)

    def test_slot_freed_and_carry_cleared_on_disconnect(self, served):
        handle, _ = served
        host, port = handle.address
        mels = mel_chunks(2)
        with VocodeClient(host, port) as c1:
            slot1 = c1.slot
            first = c1.vocode(mels[0])
            c1.vocode(mels[1])
        # Lease every slot; the old slot must come back (possibly after the
        # free request drains) with a zeroed carry.
        deadline = time.time() + 10
        clients = []
        try:
            while time.time() < deadline and len(clients) < 4:
                try:
                    clients.append(VocodeClient(host, port))
                except ConnectionError:
                    time.sleep(0.05)
            assert len(clients) == 4
            c2 = next(c for c in clients if c.slot == slot1)
            np.testing.assert_array_equal(c2.vocode(mels[0]), first)
        finally:
            for c in clients:
                c.close()

    def test_server_full_rejected(self):
        handle = start_in_thread(make_sv(1))
        host, port = handle.address
        try:
            c1 = VocodeClient(host, port)
            with pytest.raises(ConnectionError, match="server full"):
                VocodeClient(host, port)
            c1.close()
        finally:
            handle.stop()

    def test_device_failure_propagates_as_error_frame(self):
        """A push that fails on-device must surface to the waiting client
        as an ERR frame (not a hang), and the server must keep serving."""
        sv = make_sv(2)
        real_push = sv.push
        calls = {"n": 0}

        def flaky_push(mels, active=None, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected device failure")
            return real_push(mels, active=active, **kw)

        sv.push = flaky_push
        handle = start_in_thread(sv)
        try:
            host, port = handle.address
            mels = mel_chunks(1)
            with VocodeClient(host, port) as c:
                with pytest.raises(RuntimeError, match="injected"):
                    c.vocode(mels[0])
            # The failed tick didn't kill the batch loop.
            with VocodeClient(host, port) as c:
                out = c.vocode(mels[0])
                assert out.shape == (c.config["emit_samples"],)
        finally:
            handle.stop()

    def test_device_failure_at_readback_propagates(self):
        """With pipelined ticks, real device failures surface at
        materialization (np.asarray on the fetch thread), not dispatch —
        that path must also reach the client as an ERR frame and leave the
        server serving."""
        sv = make_sv(2)
        real_push = sv.push
        calls = {"n": 0}

        class _PoisonEmit:
            shape = (2, 1)

            def __array__(self, *a, **k):
                raise RuntimeError("injected readback failure")

        def flaky_push(mels, active=None, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                real_push(mels, active=active, **kw)  # keep carry honest
                return _PoisonEmit()
            return real_push(mels, active=active, **kw)

        sv.push = flaky_push
        handle = start_in_thread(sv)
        try:
            host, port = handle.address
            mels = mel_chunks(1)
            with VocodeClient(host, port) as c:
                with pytest.raises(RuntimeError, match="injected readback"):
                    c.vocode(mels[0])
            with VocodeClient(host, port) as c:
                out = c.vocode(mels[0])
                assert out.shape == (c.config["emit_samples"],)
        finally:
            handle.stop()

    def test_stop_with_connected_client_returns_promptly(self):
        """stop() must not hang on a still-connected client (3.12's
        wait_closed blocks until handlers exit, so the server closes live
        connections itself); the client then sees EOF."""
        handle = start_in_thread(make_sv(2))
        host, port = handle.address
        c = VocodeClient(host, port)
        c.vocode(mel_chunks(1)[0])
        t0 = time.time()
        handle.stop()  # would raise TimeoutError after 30 s if hung
        assert time.time() - t0 < 10.0
        with pytest.raises((ConnectionError, OSError)):
            c.vocode(mel_chunks(1)[0])
        c._sock.close()

    def test_bad_payload_gets_error_frame(self, served):
        handle, _ = served
        host, port = handle.address
        s = socket.create_connection((host, port), timeout=30)
        try:
            op, _ = pr.read_frame_sync(s)
            assert op == pr.OP_CONFIG
            s.sendall(pr.pack(pr.OP_PUSH, b"not a mel chunk"))
            op, payload = pr.read_frame_sync(s)
            assert op == pr.OP_ERR
            assert b"payload must be" in payload
        finally:
            s.close()


class TestOverloadAndSoak:
    """Server behavior beyond the happy path (VERDICT r3 weak #6):
    slot exhaustion with retry-after-free, a stalled client not affecting
    others, and a churn soak asserting no slot/stats leak."""

    def test_overload_rejected_then_retry_succeeds(self):
        handle = start_in_thread(make_sv(2))
        host, port = handle.address
        mels = mel_chunks(1)
        try:
            c1, c2 = VocodeClient(host, port), VocodeClient(host, port)
            with pytest.raises(ConnectionError, match="server full"):
                VocodeClient(host, port)
            c1.close()  # frees a slot (after the in-flight tick drains)
            deadline = time.time() + 10
            c3 = None
            while c3 is None and time.time() < deadline:
                try:
                    c3 = VocodeClient(host, port)
                except ConnectionError:
                    time.sleep(0.05)
            assert c3 is not None, "freed slot never became leasable"
            out = c3.vocode(mels[0])
            assert out.shape == (c3.config["emit_samples"],)
            c2.close()
            c3.close()
        finally:
            handle.stop()

    def test_stalled_client_does_not_affect_others(self):
        """A client that pushes once and then goes silent (never reads its
        reply, never pushes again) must not add latency to other slots —
        connections are isolated, ticks are masked pushes."""
        handle = start_in_thread(make_sv(2))
        host, port = handle.address
        mels = mel_chunks(4)
        try:
            stalled = socket.create_connection((host, port), timeout=30)
            op, _ = pr.read_frame_sync(stalled)
            assert op == pr.OP_CONFIG
            stalled.sendall(
                pr.pack(pr.OP_PUSH, np.ascontiguousarray(mels[0]).tobytes())
            )
            # …and never reads the PCM reply nor sends another frame.
            with VocodeClient(host, port) as c:
                c.vocode(mels[0])  # warm
                lats = []
                for k in range(6):
                    t0 = time.perf_counter()
                    c.vocode(mels[k % 4])
                    lats.append(time.perf_counter() - t0)
                # Generous absolute bound: each push through the local TCP
                # path is tens of ms on this host; a stall-induced block
                # would show up as the server waiting on the silent peer.
                assert max(lats) < 5.0, lats
            stalled.close()
        finally:
            handle.stop()

    def test_churn_soak_no_slot_or_stats_leak(self):
        """Lease/push/flush/free churn across overlapping clients: every
        slot must return to the free list, stats must add up, and the
        server must still serve a fresh utterance afterwards."""
        n_slots, rounds = 3, 12
        handle = start_in_thread(make_sv(n_slots))
        host, port = handle.address
        mels = mel_chunks(2)
        total_pushes = total_flushes = 0
        try:
            for r in range(rounds):
                clients = []
                deadline = time.time() + 20
                while len(clients) < n_slots and time.time() < deadline:
                    try:
                        clients.append(VocodeClient(host, port))
                    except ConnectionError:
                        time.sleep(0.02)
                assert len(clients) == n_slots
                for i, c in enumerate(clients):
                    c.vocode(mels[0])
                    total_pushes += 1
                    if i % 3 == 0:
                        c.vocode(mels[1])
                        total_pushes += 1
                    if i % 2 == 0:
                        tail = c.flush()
                        total_flushes += 1
                        assert tail.shape == (c.config["flush_samples"],)
                    if i % 3 == 1:
                        c.reset()
                for c in clients:
                    c.close()
            stats = handle.server.stats
            assert stats.pushes == total_pushes
            assert stats.flushes == total_flushes
            assert stats.connections == rounds * n_slots
            # All slots recycled: a full house leases again and works.
            deadline = time.time() + 20
            clients = []
            while len(clients) < n_slots and time.time() < deadline:
                try:
                    clients.append(VocodeClient(host, port))
                except ConnectionError:
                    time.sleep(0.02)
            assert len(clients) == n_slots
            assert sorted(c.slot for c in clients) == list(range(n_slots))
            for c in clients:
                out = c.vocode(mels[0])
                assert np.isfinite(np.asarray(out, np.float32)).all()
                c.close()
        finally:
            handle.stop()


class TestVocodeServerLWS:
    def test_lws_block_roundtrip(self):
        handle = start_in_thread(make_sv(2, engine="lws_block"))
        try:
            host, port = handle.address
            mels = mel_chunks(3)
            with VocodeClient(host, port) as c:
                got = [c.vocode(m) for m in mels]
                ref = ref_stream(make_sv(2, engine="lws_block"), c.slot, mels)
            for g, r in zip(got, ref):
                np.testing.assert_array_equal(g, r)
        finally:
            handle.stop()


class TestServerCLI:
    def test_selftest_smoke(self, capsys):
        from advoc_tpu.serve.cli import main

        main([
            "--selftest", "2", "--n_slots", "2", "--pushes", "3",
            "--chunk_frames", str(CH), "--gl_iters", "2",
        ])
        out = capsys.readouterr().out
        line = next(
            ln for ln in out.splitlines()
            if ln.startswith("VOCODE_SERVER_RESULT ")
        )
        import json

        r = json.loads(line.split(" ", 1)[1])
        assert r["n_clients"] == 2
        assert r["ticks"] >= 1
        assert r["p50_ms"] > 0


    def test_background_warmup_serves_and_orders_before_ticks(self, capsys):
        """--warmup background: the endpoint accepts immediately and the
        warmup runs through the server's FIFO device pool, so it executes
        before any real tick that queued behind it — the selftest clients
        connect while (or before) the warmup runs and still get correct
        audio (VERDICT r4 next #3)."""
        from advoc_tpu.serve.cli import main

        main([
            "--selftest", "2", "--n_slots", "2", "--pushes", "3",
            "--chunk_frames", str(CH), "--gl_iters", "2",
            "--warmup", "background",
        ])
        out = capsys.readouterr().out
        assert "warmup=background" in out and "accepting after" in out
        # The background warmup's breakdown line still prints (after or
        # while serving).
        assert "warmup compile:" in out
        line = next(
            ln for ln in out.splitlines()
            if ln.startswith("VOCODE_SERVER_RESULT ")
        )
        import json

        r = json.loads(line.split(" ", 1)[1])
        assert r["n_clients"] == 2 and r["ticks"] >= 1


class TestPushExecutableCustomCallFree:
    """The serving warm path's push executable must contain NO custom call:
    the r4 warm-start note mis-attributed the intermittent minutes-long
    first push to 'the Pallas G-L custom call', but the streaming engines
    are pure XLA by construction (the gl phase carry forces
    fft_impl='matmul'). This locks that property so the attribution can
    never silently become true (BASELINE.md r5 warm-start section)."""

    @pytest.mark.parametrize("engine", ["gl", "lws_online", "lws_block"])
    def test_no_custom_call_in_push(self, engine):
        sv = StreamingVocoder(
            params=P, chunk_frames=CH, n_streams=2, gl_iters=2,
            phase_engine=engine,
        )
        text = sv.lowered_push_hlo()
        assert len(text) > 1000
        assert "custom_call" not in text and "custom-call" not in text


class TestServerWithBundle:
    def test_selftest_through_exported_bundle(self, tmp_path, capsys):
        """build_vocoder's bundle branch: export a tiny trained-shape bundle,
        serve it, and drive one client through the real TCP path."""
        import json

        import jax
        import jax.numpy as jnp

        from advoc_tpu.models.advoc import AdvocGenerator
        from advoc_tpu.models.advoc.model import small_config
        from advoc_tpu.serve.cli import main
        from advoc_tpu.train.checkpoint import export_inference_bundle
        from advoc_tpu.utils import apply_overrides

        tiny = "width=8,depth=4,n_frames=16,disc_width=8,dtype=float32"
        # Must match the CLI's construction exactly: small_config() + the
        # same --model_overrides string.
        cfg = apply_overrides(small_config(), tiny)
        g = AdvocGenerator(cfg)
        params = g.init(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.n_frames, cfg.n_freq))
        )["params"]
        export_inference_bundle(tmp_path / "bundle", params,
                                {"width": cfg.width})

        main([
            "--selftest", "1", "--n_slots", "1", "--pushes", "2",
            "--chunk_frames", "16", "--gl_iters", "2",
            "--bundle", str(tmp_path / "bundle"),
            "--model_overrides", tiny,
        ])
        out = capsys.readouterr().out
        line = next(
            ln for ln in out.splitlines()
            if ln.startswith("VOCODE_SERVER_RESULT ")
        )
        r = json.loads(line.split(" ", 1)[1])
        assert r["n_clients"] == 1 and r["ticks"] >= 1
