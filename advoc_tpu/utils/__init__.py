"""Small shared utilities (config overrides, file discovery)."""

from advoc_tpu.utils.config import apply_overrides, find_wavs  # noqa: F401
