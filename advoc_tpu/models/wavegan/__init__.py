from advoc_tpu.models.wavegan.model import (  # noqa: F401
    WaveGANConfig,
    WaveGANGenerator,
    WaveGANDiscriminator,
)
