"""TCP serving layer: N client streams multiplexed onto one batched
StreamingVocoder push (beyond-reference subsystem — see server.py)."""

from advoc_tpu.serve.client import VocodeClient
from advoc_tpu.serve.server import ServerHandle, VocoderServer, start_in_thread

__all__ = [
    "ServerHandle",
    "VocodeClient",
    "VocoderServer",
    "start_in_thread",
]
