from morphik_core_tpu.models.schemas import (  # noqa: F401
    AuthContext,
    Chunk,
    ChunkGroup,
    ChunkResult,
    CompletionRequest,
    CompletionResponse,
    Document,
    DocumentChunk,
    DocumentContent,
    DocumentResult,
    GroupedChunkResponse,
    TimeSeriesData,
)
