from morphik_tpu_sdk.client import AsyncMorphik, Morphik  # noqa: F401
from morphik_tpu_sdk.models import ChunkResult, Document, FinalChunkResult  # noqa: F401

__version__ = "0.1.0"
