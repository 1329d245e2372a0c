from advoc_tpu.infer.vocoder import Vocoder, StreamingVocoder  # noqa: F401
