"""L1 DSP / spectral core (SURVEY.md §2.1 #1–#4, expected reference file
``advoc/spectral.py``).

Two twin implementations live here:

* :mod:`advoc_tpu.ops.reference` — float64 numpy oracle. Slow, host-only,
  used to generate golden values for tests and to define bit-level semantics.
* :mod:`advoc_tpu.ops.spectral` — the production JAX implementation: batched,
  jittable, TPU-resident, with phase recovery as a ``lax.scan``.
"""
