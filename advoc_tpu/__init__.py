"""advoc-tpu: a TPU-native adversarial vocoding framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
repo ``paarthneekhara/advoc`` (Interspeech 2019, "Expediting TTS Synthesis with
Adversarial Vocoding"). See SURVEY.md at the repo root for the layer map this
package implements.

NOTE ON CITATIONS: the reference mount (/root/reference) was EMPTY when this
framework was designed and built (see SURVEY.md §0), so docstrings cite the
reconstructed component inventory (SURVEY.md §2) rather than reference
file:line pairs. Expected reference paths (e.g. ``advoc/spectral.py``) are
named where known so parity can be checked once the mount is populated.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

  L5  CLI entry points          advoc_tpu.models.{advoc,wavegan,melspecgan}.train_evaluate
  L4  Shared training harness   advoc_tpu.train  (jitted GAN steps, ckpt, metrics)
  L3  Models (flax)             advoc_tpu.models (U-Net G, patch D, WaveGAN, MelSpecGAN)
  L2  Data pipeline             advoc_tpu.data   (wav decode, slicing, device prefetch)
  L1  DSP / spectral core       advoc_tpu.ops    (STFT, mel, inversion, phase recovery)
  L0  JAX / XLA / Pallas        (+ advoc_tpu.parallel: mesh/sharding over ICI)
"""

__version__ = "0.1.0"

from advoc_tpu.ops import spectral  # noqa: F401
from advoc_tpu.ops.reference import AudioParams, DEFAULT_PARAMS  # noqa: F401


def __getattr__(name):
    # Lazy heavyweight exports so `import advoc_tpu` stays light.
    if name == "Vocoder":
        from advoc_tpu.infer import Vocoder

        return Vocoder
    if name == "StreamingVocoder":
        from advoc_tpu.infer import StreamingVocoder

        return StreamingVocoder
    raise AttributeError(name)
