"""Small shared utilities (config overrides, file discovery)."""

from advoc_tpu.utils.config import (  # noqa: F401
    apply_overrides,
    enable_compilation_cache,
    find_wavs,
)
