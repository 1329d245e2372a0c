"""L3 model zoo (SURVEY.md §2.1 #7–#13).

Each family mirrors a reference experiment directory:

* :mod:`advoc_tpu.models.advoc` — pix2pix-style U-Net magnitude repairer +
  patch discriminator (expected reference ``models/advoc/model.py``), plus
  the reduced-width small/streaming variant.
* :mod:`advoc_tpu.models.wavegan` — end-to-end waveform GAN (transposed-conv
  1-D generator, phase-shuffle discriminator; ``models/wavegan/``).
* :mod:`advoc_tpu.models.melspecgan` — DCGAN-style mel-spectrogram generator
  for unconditional generation (``models/melspecgan/``).

All models are flax.linen modules in NHWC layout (XLA:TPU's native conv
layout), bfloat16-friendly, with static shapes throughout.
"""
