"""Parallelism layer: device meshes, sharding helpers, halo exchange.

The reference is single-device (SURVEY.md §2.4); this package provides the
TPU-native scale-out the rebuild owes as first-class components:

* :mod:`advoc_tpu.parallel.mesh` — mesh construction + replicate/shard
  helpers for data parallelism over ICI.
* :mod:`advoc_tpu.parallel.halo` — time-axis sharding of long utterances
  with neighbor halo exchange (``shard_map`` + ``ppermute``) — the conv-net
  equivalent of sequence parallelism, used for vocoding audio too long for
  one chip's HBM.
"""

from advoc_tpu.parallel.mesh import (  # noqa: F401
    data_mesh,
    replicate,
    shard_batch,
)
