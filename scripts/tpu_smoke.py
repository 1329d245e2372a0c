#!/usr/bin/env python
"""Real-TPU Mosaic smoke suite: every Pallas kernel quality-asserted on chip.

CI runs Pallas only in interpret mode (correct for a CPU CI), which
structurally cannot catch real-Mosaic behavior — the 16 MB scoped-VMEM
limit, 3-pass dot costs, bf16 truncation (the r2 retraction incident).
This script runs each kernel on the REAL chip in minutes and asserts
quality against the float64 oracle / XLA twin (VERDICT r3 weak #4):

  1. fused featurizer kernel vs the float64 oracle mel
  2. split-bf16 VMEM Griffin-Lim (256 frames) vs the XLA matmul-DFT loop
  3. time-tiled Griffin-Lim (long form, 1024 frames) vs the XLA loop
  4. chromatic (4-color) LWS vs the float64 oracle spec
  5. one StreamingVocoder push+flush (gl engine) re-extraction fidelity
  6. AOT export of the Pallas-path vocoder (Mosaic custom call serialized
     via jax.export) reloaded and compared against the live Vocoder

Prints ONE machine-readable line ``TPU_SMOKE_RESULT {...}`` and exits
nonzero on any bound violation. Run each round; record the line in
BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Persistent compiled-program cache. NOTE: on this machine jax is pre-imported
# at interpreter startup (axon plugin .pth), so JAX_COMPILATION_CACHE_DIR set
# here via os.environ is read too late — enable_compilation_cache() goes
# through jax.config.update, which works at any time (BASELINE.md r4).
from advoc_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--allow_cpu", action="store_true",
                   help="run in interpret/XLA mode off-TPU (dev only; the "
                        "point of this script is the real Mosaic backend)")
    args = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from advoc_tpu.data import loader
    from advoc_tpu.infer import StreamingVocoder
    from advoc_tpu.ops import reference as ref
    from advoc_tpu.ops import spectral as sp
    from advoc_tpu.ops.pallas.featurizer import fused_melspec
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P

    on_tpu = any("tpu" in d.device_kind.lower() for d in jax.devices())
    if not on_tpu and not args.allow_cpu:
        raise SystemExit(
            "no TPU backend — this smoke exists to test real Mosaic "
            "(pass --allow_cpu to run anyway in interpret mode)"
        )
    log(f"[smoke] device: {jax.devices()[0]} (on_tpu={on_tpu})")
    results: dict[str, float] = {}
    failures: list[str] = []

    def gate(name: str, value: float, bound: float) -> None:
        results[name] = round(float(value), 6)
        ok = value <= bound
        log(f"[smoke] {name}: {value:.6f} (bound {bound}) "
            f"{'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(f"{name}={value:.6f}>{bound}")

    t_start = time.perf_counter()
    wav = loader.synthetic_speech(0, 256 * P.hop_length)
    mel_gold = ref.waveform_to_r9y9_melspec(wav.astype(np.float64), P)

    # 1. fused featurizer kernel (frame+window+rFFT+mel matmul in VMEM).
    got = fused_melspec(jnp.asarray(wav), P, interpret=not on_tpu)
    err = float(np.abs(np.asarray(got) - mel_gold[: got.shape[0]]).max())
    gate("featurizer_max_err", err, 5e-3)

    # Shared magnitude for the G-L gates (computed once, on device).
    mag = sp.waveform_to_magspec(jnp.asarray(wav), P)[None, :256]
    mel_in = jnp.asarray(mel_gold[:256], jnp.float32)

    def mel_l1(w) -> float:
        m = sp.waveform_to_r9y9_melspec(w, P)[:255]
        return float(jnp.abs(m - mel_in[:255]).mean())

    # 2. split-bf16 VMEM G-L kernel vs the XLA matmul-DFT loop (quality
    # parity at equal iteration budget — the r2 bf16-truncation regression
    # class). Pallas needs the real chip; off-TPU this compares xla to xla.
    impl = "pallas" if on_tpu else "matmul"
    gl_kw = dict(n_iters=30, momentum=0.99, params=P,
                 precision=jax.lax.Precision.DEFAULT)
    w_pl = jax.jit(
        lambda m: sp.griffin_lim(m, 256 * P.hop_length, fft_impl=impl,
                                 drop_nyquist=on_tpu, **gl_kw)
    )(mag)
    w_xla = jax.jit(
        lambda m: sp.griffin_lim(m, 256 * P.hop_length, fft_impl="matmul",
                                 **gl_kw)
    )(mag)
    l1_pl, l1_xla = mel_l1(w_pl[0]), mel_l1(w_xla[0])
    results["gl256_mel_l1_xla"] = round(l1_xla, 6)
    gate("gl256_mel_l1_pallas", l1_pl, l1_xla + 3e-3)

    # 3. time-tiled G-L (T=1024: four 256-frame tiles + halos per VMEM
    # residency) vs the XLA loop on the same long magnitude.
    wav_l = loader.synthetic_speech(1, 1024 * P.hop_length)
    mag_l = sp.waveform_to_magspec(jnp.asarray(wav_l), P)[None, :1024]
    mel_l = sp.waveform_to_r9y9_melspec(jnp.asarray(wav_l), P)[:1023]

    def mel_l1_long(w) -> float:
        m = sp.waveform_to_r9y9_melspec(w, P)[:1023]
        return float(jnp.abs(m - mel_l).mean())

    w_tl = jax.jit(
        lambda m: sp.griffin_lim(m, 1024 * P.hop_length, fft_impl=impl,
                                 drop_nyquist=on_tpu, **gl_kw)
    )(mag_l)
    w_tx = jax.jit(
        lambda m: sp.griffin_lim(m, 1024 * P.hop_length, fft_impl="matmul",
                                 **gl_kw)
    )(mag_l)
    l1_tl, l1_tx = mel_l1_long(w_tl[0]), mel_l1_long(w_tx[0])
    results["gl_tiled_mel_l1_xla"] = round(l1_tx, 6)
    gate("gl_tiled_mel_l1_pallas", l1_tl, l1_tx + 3e-3)

    # 4. chromatic LWS vs the float64 oracle on a short window (the oracle
    # is host-side float64 with the sequential schedule). colors=T makes
    # the multicolor machinery degenerate to exactly that schedule (one
    # frame per color, ascending), so the SAME on-chip code path is
    # oracle-comparable; colors=4 is then quality-gated against the input
    # mel relative to the sequential result.
    T = 24
    mag_s = np.asarray(ref.waveform_to_magspec(wav.astype(np.float64), P))[:T]
    mag_sj = jnp.asarray(mag_s, jnp.float32)[None]
    w_seq = jax.jit(
        lambda m: sp.lws(m, T * P.hop_length, n_sweeps=2, colors=T, params=P)
    )(mag_sj)
    gold = ref.lws(mag_s, T * P.hop_length, n_sweeps=2, params=P)
    rel = float(
        np.abs(np.asarray(w_seq[0]) - gold).max()
        / max(np.abs(gold).max(), 1e-9)
    )
    gate("lws_degenerate_rel_err", rel, 1e-3)
    w_c4 = jax.jit(
        lambda m: sp.lws(m, T * P.hop_length, n_sweeps=2, colors=4, params=P)
    )(mag_sj)

    def lws_mel_l1(w) -> float:
        m = sp.waveform_to_r9y9_melspec(w, P)[: T - 1]
        tgt = jnp.asarray(mel_gold[: T - 1], jnp.float32)
        return float(jnp.abs(m - tgt).mean())

    l1_c4, l1_seq = lws_mel_l1(w_c4[0]), lws_mel_l1(w_seq[0])
    results["lws_sequential_mel_l1"] = round(l1_seq, 6)
    gate("lws_chromatic_mel_l1", l1_c4, 1.5 * l1_seq + 0.01)

    # 5. one streaming push + flush (gl engine) on the chip: the serving
    # primitive end-to-end, re-extraction fidelity over the full stream.
    sv = StreamingVocoder(params=P, chunk_frames=64, overlap_frames=8,
                          gl_iters=16)
    mel_np = np.asarray(mel_gold[:128], np.float32)
    outs = [sv.push(mel_np[:64]), sv.push(mel_np[64:128]), sv.flush()]
    sig = np.concatenate(outs)[sv.flush_samples :]
    assert sig.shape == (128 * P.hop_length,), sig.shape
    m2 = sp.waveform_to_r9y9_melspec(jnp.asarray(sig), P)[:127]
    l1_s = float(jnp.abs(m2 - jnp.asarray(mel_np[:127])).mean())
    gate("streaming_push_flush_mel_l1", l1_s, 0.08)

    # 6. AOT export with the Mosaic custom call inside: serialize the
    # Pallas-path heuristic vocoder, reload, and compare to the live
    # instance (same G-L budget). Guards the TPU-only artifact path that
    # CPU CI can only exercise with the XLA lowering.
    import tempfile

    from advoc_tpu.infer import ExportedVocoder, Vocoder, export_vocoder

    voc = Vocoder(params=P, gl_iters=16, chunk_frames=64,
                  phase_impl="pallas" if on_tpu else "xla")
    with tempfile.TemporaryDirectory() as td:
        export_vocoder(voc, [(1, 256)], td, allow_custom_calls=True)
        served = ExportedVocoder(td)
        w_live = np.asarray(voc(mel_in))
        w_aot = served(np.asarray(mel_in))
    l1_aot = float(np.abs(
        np.asarray(sp.waveform_to_r9y9_melspec(jnp.asarray(w_aot), P))[:255]
        - np.asarray(sp.waveform_to_r9y9_melspec(jnp.asarray(w_live), P))[:255]
    ).mean())
    gate("aot_vs_live_mel_l1", l1_aot, 1e-3)

    results["wall_s"] = round(time.perf_counter() - t_start, 1)
    out = {
        "ok": not failures,
        "on_tpu": on_tpu,
        "device": str(jax.devices()[0]),
        **results,
    }
    if failures:
        out["failures"] = failures
    print("TPU_SMOKE_RESULT " + json.dumps(out), flush=True)
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
