"""`python -m advoc_tpu` — framework overview and entry-point index."""

import textwrap


def main() -> None:
    import jax

    import advoc_tpu

    print(textwrap.dedent(f"""\
        advoc-tpu {advoc_tpu.__version__} — TPU-native adversarial vocoding
        devices: {jax.devices()}

        Entry points:
          python -m advoc_tpu.models.advoc.train_evaluate      --mode train|eval|infer
          python -m advoc_tpu.models.wavegan.train_evaluate    --mode train|eval|infer [--conditional]
          python -m advoc_tpu.models.melspecgan.train_evaluate --mode train|eval|infer
          python -m advoc_tpu.infer.vocode_cli                 --input mels.npy --out_dir out/
          python -m advoc_tpu.serve                            [--selftest N | --soak SECONDS]
          python scripts/prepare_dataset.py                    --in_dir wavs/ --out_dir data/
          python scripts/precompile.py                         (populate the compile cache)
          python bench.py                                      (ADVOC_BENCH_FULL=1 for all configs)

        Library: advoc_tpu.ops.spectral (featurize/invert/phase-recover),
        advoc_tpu.Vocoder / StreamingVocoder. Docs: README.md, PARITY.md,
        BASELINE.md."""))


if __name__ == "__main__":
    main()
