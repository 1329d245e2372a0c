from advoc_tpu.models.melspecgan.model import (  # noqa: F401
    MelSpecGANConfig,
    MelSpecGANGenerator,
    MelSpecGANDiscriminator,
)
