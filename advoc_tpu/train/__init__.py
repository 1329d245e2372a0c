"""L4 shared training harness (SURVEY.md §2.1 #9–#10).

Unlike the reference — which duplicated a TF1 session loop per model
directory (SURVEY.md §1 L4) — the rebuild has ONE harness library:

* :mod:`advoc_tpu.train.gan` — GAN loss assembly (DCGAN-CE / LSGAN / WGAN-GP),
  fused alternating D/G update steps (one jit region per step), on-device
  featurization, data-parallel over a ``('data',)`` mesh.
* :mod:`advoc_tpu.train.checkpoint` — Orbax-backed save / restore /
  poll-latest (the reference's tf.train.Saver + MonitoredTrainingSession
  auto-resume contract, SURVEY.md §5).
* :mod:`advoc_tpu.train.metrics` — TensorBoard scalar/image/audio summaries
  (the reference's de-facto eval UX).
"""
