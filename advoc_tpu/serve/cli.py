"""CLI for the streaming vocoder server.

``python -m advoc_tpu.serve.cli --port 9700 --bundle runs/advoc/bundle``
serves a trained (or heuristic) StreamingVocoder; ``--selftest N`` instead
starts the server, drives it with N concurrent in-process clients, prints
per-client latency and batching stats as ONE machine-readable JSON line
(``VOCODE_SERVER_RESULT {...}``), and exits — the serving-loop analog of
``scripts/stream_serve.py`` but through the real TCP path.
"""

from __future__ import annotations

import argparse
import json
import threading
import time


def build_vocoder(args):
    """StreamingVocoder from CLI flags (same model flags as stream_serve)."""
    import jax.numpy as jnp

    from advoc_tpu.infer.vocoder import StreamingVocoder
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P

    g_apply = g_params = None
    if args.bundle or args.train_dir:
        from advoc_tpu.models.advoc import AdvocGenerator
        from advoc_tpu.models.advoc.model import AdvocConfig, small_config
        from advoc_tpu.utils import apply_overrides

        cfg = small_config() if args.model_size == "small" else AdvocConfig()
        cfg = apply_overrides(cfg, args.model_overrides)
        g = AdvocGenerator(cfg)
        if args.bundle:
            from advoc_tpu.train.checkpoint import load_inference_bundle

            g_params, _ = load_inference_bundle(args.bundle)
        else:
            from advoc_tpu.models.advoc import PatchDiscriminator
            from advoc_tpu.train import gan
            from advoc_tpu.train.checkpoint import CheckpointManager

            est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
            gstate, dstate = gan.make_states(
                g, PatchDiscriminator(cfg), (est0,), (est0, est0)
            )
            mgr = CheckpointManager(args.train_dir)
            g_params = mgr.restore(
                template={"g": gstate, "d": dstate}
            )["g"].params
            mgr.close()
        g_apply = lambda pr, est: g.apply({"params": pr}, est)  # noqa: E731

    return StreamingVocoder(
        g_apply=g_apply, g_params=g_params, params=P,
        chunk_frames=args.chunk_frames, n_streams=args.n_slots,
        gl_iters=args.gl_iters, phase_engine=args.engine,
        overlap_frames=args.overlap_frames,
        lws_sweeps=args.lws_sweeps, lws_look_ahead=args.lws_look_ahead,
        mel_context=args.mel_context, emit_dtype=args.emit_dtype,
        mel_dtype=args.mel_dtype, mel_projection=args.mel_projection,
    )


def add_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=0,
                   help="0 = pick a free port (printed at startup)")
    p.add_argument("--n_slots", type=int, default=16,
                   help="concurrent streams = StreamingVocoder batch rows")
    p.add_argument("--coalesce_ms", type=float, default=0.0,
                   help="wait this long per tick for more clients' chunks")
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="max ticks in flight (1 = serial readback; 2 "
                        "overlaps readback with the next tick's compute)")
    p.add_argument("--bundle", default=None, help="inference bundle dir")
    p.add_argument("--train_dir", default=None,
                   help="trained ckpt dir; omit both for heuristic pipeline")
    p.add_argument("--model_size", choices=["full", "small"], default="small")
    p.add_argument("--model_overrides", default=None)
    p.add_argument(
        "--engine", choices=["gl", "lws_online", "lws_block"], default="gl"
    )
    p.add_argument("--chunk_frames", type=int, default=64)
    p.add_argument("--gl_iters", type=int, default=16)
    p.add_argument("--overlap_frames", type=int, default=8,
                   help="gl engine: crossfade overlap = emission delay "
                        "(2 ≈ 23 ms is the measured low-latency point)")
    p.add_argument("--lws_sweeps", type=int, default=None)
    p.add_argument("--lws_look_ahead", type=int, default=2)
    p.add_argument("--mel_context", type=int, default=0)
    p.add_argument("--mel_projection", type=float, default=None,
                   help="post-repair mel-consistency projection strength; "
                        "default auto (1.0 with a model, 0.0 heuristic) — "
                        "BASELINE.md r4 STOI section")
    p.add_argument("--emit_dtype", choices=["float32", "int16"],
                   default="int16")
    p.add_argument("--mel_dtype", choices=["float32", "float16"],
                   default="float32")
    p.add_argument("--warmup", choices=["background", "block"], default=None,
                   help="'background' (serving default): accept TCP "
                        "connections immediately and run the push/flush "
                        "warmup through the server's device queue — the "
                        "endpoint is up in seconds regardless of how long "
                        "the first executable load takes (the axon "
                        "remote-load service has paid minutes on an "
                        "identical warm cache, BASELINE.md r4/r5); clients "
                        "connecting early just see a slow first chunk. "
                        "'block' (selftest default): finish the warmup "
                        "before accepting, so reported latency stats are "
                        "steady-state.")
    p.add_argument("--selftest", type=int, default=0, metavar="N_CLIENTS",
                   help="start, drive with N concurrent clients, report, exit")
    p.add_argument("--pushes", type=int, default=10,
                   help="selftest: chunks per client")
    p.add_argument("--soak", type=float, default=0.0, metavar="SECONDS",
                   help="selftest: instead of a fixed push count, churn "
                        "lease/push/flush/reset/disconnect cycles for this "
                        "long and assert no slot or stats leak")


def _soak(args, handle, host, port, sv) -> None:
    """Churn soak (VERDICT r3 weak #6): N client threads repeatedly lease a
    slot, stream a random number of chunks, end with flush / reset /
    abrupt-close (cycling through all three), and reconnect — for --soak
    seconds. Asserts every slot returns to the free list, stats add up,
    and a full house still serves afterwards. ONE JSON line out."""
    import threading
    import time as _time

    import numpy as np

    import jax.numpy as jnp

    from advoc_tpu.data import loader
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
    from advoc_tpu.serve.client import VocodeClient

    n, ch = args.selftest, args.chunk_frames
    deadline = _time.time() + args.soak
    counts = {"cycles": 0, "pushes": 0, "flushes": 0, "rejected": 0}
    lock = threading.Lock()
    errors: list[str] = []

    def churn(i: int) -> None:
        rng = np.random.default_rng(i)
        wav = loader.synthetic_speech(i, 8 * ch * P.hop_length)
        mel = np.asarray(
            spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
        )[: 8 * ch]
        while _time.time() < deadline:
            try:
                c = VocodeClient(host, port)
            except ConnectionError:  # pool full: overload path exercised
                with lock:
                    counts["rejected"] += 1
                _time.sleep(0.01)
                continue
            try:
                k = int(rng.integers(1, 5))
                for j in range(k):
                    out = c.vocode(mel[j * ch : (j + 1) * ch])
                    assert out.shape == (c.config["emit_samples"],)
                    with lock:
                        counts["pushes"] += 1
                ending = counts["cycles"] % 3
                if ending == 0:
                    tail = c.flush()
                    assert tail.shape == (c.config["flush_samples"],)
                    with lock:
                        counts["flushes"] += 1
                    c.close()
                elif ending == 1:
                    c.reset()
                    c.close()
                else:  # abrupt close, no BYE
                    c._sock.close()
                with lock:
                    counts["cycles"] += 1
            except Exception as e:  # noqa: BLE001 — soak collects failures
                with lock:
                    errors.append(repr(e))
                try:
                    c._sock.close()
                except OSError:
                    pass

    threads = [threading.Thread(target=churn, args=(i,)) for i in range(n)]
    t0 = _time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = _time.time() - t0
    # Drain: all leases released above; the free list must fully recover
    # (frees apply on the next tick, so poll briefly).
    end = _time.time() + 10
    while _time.time() < end and len(handle.server._free) < args.n_slots:
        _time.sleep(0.05)
    stats = handle.server.stats
    # Snapshot at assertion time (the post-soak lease below adds more).
    snap = {
        "server_pushes": stats.pushes,
        "server_flushes": stats.flushes,
        "server_connections": stats.connections,
        "free_slots_after": len(handle.server._free),
    }
    ok = (
        not errors
        and snap["free_slots_after"] == args.n_slots
        and snap["server_pushes"] == counts["pushes"]
        and snap["server_flushes"] == counts["flushes"]
    )
    # And a full house still serves.
    clients = []
    try:
        for _ in range(args.n_slots):
            clients.append(VocodeClient(host, port))
        mel0 = np.zeros((ch, P.n_mels), np.float32)
        for c in clients:
            c.vocode(mel0)
    except Exception as e:  # noqa: BLE001
        ok = False
        errors.append(f"post-soak lease: {e!r}")
    finally:
        for c in clients:
            c.close()
    result = {
        "ok": ok,
        "soak_s": round(wall, 1),
        "clients": n,
        "n_slots": args.n_slots,
        **counts,
        **snap,
        "errors": errors[:5],
    }
    print("VOCODE_SOAK_RESULT " + json.dumps(result), flush=True)
    handle.stop()
    if not ok:
        raise SystemExit(1)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_args(p)
    args = p.parse_args(argv)

    from advoc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # warmup below replays precompile.py's cache

    import numpy as np

    from advoc_tpu.serve.server import start_in_thread

    # Compile + warm the executables before accepting traffic (first jit
    # over a tunnel is seconds-to-minutes; clients shouldn't eat that).
    # The breakdown is printed because warm-start time on the shared
    # tunnel varies wildly run-to-run with an identical local cache
    # (9 s–388 s observed, BASELINE.md r4) — knowing which stage paid it
    # (device/client init vs push vs flush) is the first diagnostic.
    import jax

    warmup = args.warmup or ("block" if args.selftest else "background")
    t_start = time.perf_counter()
    t0 = time.perf_counter()
    jax.devices()
    t_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    sv = build_vocoder(args)
    t_build = time.perf_counter() - t0

    def do_warmup() -> None:
        # All-inactive masked calls: carries are untouched bit-exactly, so
        # this is safe to interleave with (i.e. run just ahead of) real
        # traffic. np.asarray forces a full execute, not just a dispatch —
        # the executable is loaded on the device when this returns.
        t0 = time.perf_counter()
        np.asarray(sv.push(
            np.zeros((args.n_slots, args.chunk_frames, sv.params.n_mels),
                     sv.mel_dtype),
            active=np.zeros(args.n_slots, bool),
        ))
        t_push = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(sv.flush(active=np.zeros(args.n_slots, bool)))
        sv.reset()
        t_flush = time.perf_counter() - t0
        print(f"warmup compile: {t_push + t_flush:.1f} s "
              f"(devices {t_dev:.1f} + build {t_build:.1f} "
              f"+ push {t_push:.1f} + flush {t_flush:.1f})", flush=True)

    if warmup == "block":
        do_warmup()
    handle = start_in_thread(
        sv, host=args.host, port=args.port, coalesce_ms=args.coalesce_ms,
        pipeline_depth=args.pipeline_depth,
    )
    host, port = handle.address
    if warmup == "background":
        # Through the server's single-worker device pool: FIFO, so the
        # warmup executes before any tick that queues behind it, and the
        # endpoint above is already accepting. Worst-case executable-load
        # weather (BASELINE.md r4: 515 s on a warm cache) now costs early
        # clients first-chunk latency instead of a dead endpoint.
        handle.server._pool.submit(do_warmup)
    print(f"serving {args.n_slots} slots on {host}:{port} "
          f"(engine={args.engine}, warmup={warmup}, "
          f"accepting after {time.perf_counter() - t_start:.1f} s)",
          flush=True)

    if not args.selftest:
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass
        finally:
            handle.stop()
        return

    if args.soak:
        _soak(args, handle, host, port, sv)
        return

    # --- selftest: N concurrent clients through the real TCP path ---
    import jax.numpy as jnp

    from advoc_tpu.data import loader
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
    from advoc_tpu.serve.client import VocodeClient

    n, ch = args.selftest, args.chunk_frames
    need = ch * args.pushes
    lat_ms: list[list[float]] = [[] for _ in range(n)]

    def run_client(i: int) -> None:
        wav = loader.synthetic_speech(i, need * P.hop_length)
        mel = np.asarray(
            spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
        )[:need]
        with VocodeClient(host, port) as c:
            for k in range(args.pushes):
                t0 = time.perf_counter()
                out = c.vocode(mel[k * ch : (k + 1) * ch])
                lat_ms[i].append((time.perf_counter() - t0) * 1000.0)
                assert out.shape == (c.config["emit_samples"],)
            # End-of-utterance drain: the engine's pending tail samples.
            tail = c.flush()
            assert tail.shape == (c.config["flush_samples"],)

    threads = [
        threading.Thread(target=run_client, args=(i,)) for i in range(n)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    lat = np.asarray([m for c in lat_ms for m in c[1:]])  # skip first pushes
    stats = handle.server.stats
    audio_s = n * args.pushes * ch * P.hop_length / P.sample_rate
    result = {
        "n_clients": n, "pushes": args.pushes,
        "chunk_frames": ch, "engine": args.engine,
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p95_ms": round(float(np.percentile(lat, 95)), 2),
        "ticks": stats.ticks,
        "mean_streams_per_tick": round(stats.mean_streams_per_tick, 2),
        "wall_s": round(wall, 2),
        "aggregate_rtf": round(audio_s / wall, 1),
    }
    print("VOCODE_SERVER_RESULT " + json.dumps(result), flush=True)
    handle.stop()


if __name__ == "__main__":
    main()
