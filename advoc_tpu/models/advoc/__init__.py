from advoc_tpu.models.advoc.model import (  # noqa: F401
    AdvocConfig,
    AdvocGenerator,
    PatchDiscriminator,
)
