"""L2 data pipeline (SURVEY.md §2.1 #1, #5; expected reference files
``advoc/audioio.py``, ``advoc/loader.py``).

TPU-first redesign: the host pipeline ships raw waveform *slices* to the
device (small, fixed-shape, cheap to transfer); all feature extraction (STFT,
mel, heuristic estimate) happens **in-graph on the TPU** inside the jitted
train step — unlike the reference, which ran tf.data py_func decode plus
in-graph featurization on GPU. Decode is done by a native C++ RIFF/WAVE
parser (:mod:`advoc_tpu.data.native`) with a pure-numpy fallback, and batches
are double-buffered onto the device asynchronously.
"""

from advoc_tpu.data.audioio import decode_audio, save_as_wav  # noqa: F401
from advoc_tpu.data.loader import (  # noqa: F401
    decode_extract_and_batch,
    synthetic_speech,
)
