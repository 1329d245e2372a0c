from advoc_tpu.infer.vocoder import Vocoder, StreamingVocoder  # noqa: F401
from advoc_tpu.infer.export import ExportedVocoder, export_vocoder  # noqa: F401
