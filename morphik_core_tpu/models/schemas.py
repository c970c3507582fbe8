"""Public data schemas — the wire/API contract.

Field names and semantics follow the reference's public models so a
morphik user can switch without client changes (reference
core/models/chunk.py:9-38, core/models/documents.py:14-159,
core/models/auth.py, core/models/completion.py). Implementation is
original.
"""

from __future__ import annotations

import bisect
import uuid
from datetime import UTC, datetime
from enum import Enum
from typing import Any, Dict, List, Literal, Optional, Union

import numpy as np
from pydantic import BaseModel, Field, field_validator

Embedding = Union[List[float], List[List[float]], np.ndarray]


def _now() -> datetime:
    return datetime.now(UTC)


class Chunk(BaseModel):
    """A parsed piece of content (text or an image data-URI) pre-embedding."""

    content: str
    metadata: Dict[str, Any] = Field(default_factory=dict)

    model_config = {"arbitrary_types_allowed": True}

    def to_document_chunk(self, document_id: str, chunk_number: int, embedding: Embedding) -> "DocumentChunk":
        return DocumentChunk(
            document_id=document_id,
            content=self.content,
            embedding=embedding,
            chunk_number=chunk_number,
            metadata=self.metadata,
        )


class DocumentChunk(BaseModel):
    """A chunk as stored in / returned by a vector store."""

    document_id: str
    content: str
    embedding: Embedding
    chunk_number: int
    metadata: Dict[str, Any] = Field(default_factory=dict)
    score: float = 0.0

    model_config = {"arbitrary_types_allowed": True}


class Document(BaseModel):
    """A document row in the metadata database."""

    external_id: str = Field(default_factory=lambda: str(uuid.uuid4()))
    content_type: str
    filename: Optional[str] = None
    metadata: Dict[str, Any] = Field(default_factory=dict)
    metadata_types: Dict[str, str] = Field(default_factory=dict)
    storage_info: Dict[str, Any] = Field(default_factory=dict)
    system_metadata: Dict[str, Any] = Field(
        default_factory=lambda: {
            "created_at": _now(),
            "updated_at": _now(),
            "status": "processing",
        }
    )
    additional_metadata: Dict[str, Any] = Field(default_factory=dict)
    chunk_ids: List[str] = Field(default_factory=list)

    # Folder semantics (reference documents.py:44-57): folder_name is the
    # LEAF name; folder_path the full path; API "folder_name" params accept
    # full paths for filtering.
    folder_name: Optional[str] = None
    folder_path: Optional[str] = None
    folder_id: Optional[str] = None
    end_user_id: Optional[str] = None
    app_id: Optional[str] = None

    @field_validator("storage_info", mode="before")
    @classmethod
    def _stringify_storage_info(cls, v):
        if isinstance(v, dict):
            return {k: "" if val is None else str(val) for k, val in v.items()}
        return v

    def __hash__(self):
        return hash(self.external_id)

    def __eq__(self, other):
        return isinstance(other, Document) and self.external_id == other.external_id


class DocumentContent(BaseModel):
    type: Literal["url", "string"]
    value: str
    filename: Optional[str] = None

    @field_validator("filename")
    @classmethod
    def _filename_required_for_url(cls, v, info):
        if info.data.get("type") == "url" and v is None:
            raise ValueError("filename is required when type is url")
        return v


class TimeSeriesData(BaseModel):
    """time -> content map for videos, with reverse lookup and nearest-time query."""

    time_to_content: Dict[float, str]

    model_config = {"arbitrary_types_allowed": True}

    @property
    def timestamps(self) -> List[float]:
        return sorted(self.time_to_content.keys())

    @property
    def contents(self) -> List[str]:
        return [self.time_to_content[t] for t in self.timestamps]

    @property
    def content_to_times(self) -> Dict[str, List[float]]:
        out: Dict[str, List[float]] = {}
        for t, c in self.time_to_content.items():
            out.setdefault(c, []).append(t)
        return out

    def at_time(self, time: float, padding_seconds: float = 0.0) -> str:
        ts = self.timestamps
        if not ts:
            return ""
        if padding_seconds > 0:
            lo = bisect.bisect_left(ts, time - padding_seconds)
            hi = bisect.bisect_right(ts, time + padding_seconds)
            window = ts[max(0, lo - 1) : hi]
            return " ".join(self.time_to_content[t] for t in window)
        idx = bisect.bisect_right(ts, time) - 1
        return self.time_to_content[ts[max(0, idx)]]


class DocumentResult(BaseModel):
    score: float
    document_id: str
    metadata: Dict[str, Any]
    content: DocumentContent
    additional_metadata: Dict[str, Any]


class ChunkResult(BaseModel):
    content: str
    score: float
    document_id: str
    chunk_number: int
    metadata: Dict[str, Any]
    content_type: str
    filename: Optional[str] = None
    download_url: Optional[str] = None
    is_padding: bool = False

    def augmented_content(self, doc: DocumentResult) -> str:
        """Splice video frame description + transcript for timestamped chunks
        (reference documents.py:113-131)."""
        if "timestamp" not in self.metadata:
            return self.content
        frame_description = doc.additional_metadata.get("frame_description")
        transcript = doc.additional_metadata.get("transcript")
        if not isinstance(frame_description, dict) or not isinstance(transcript, dict):
            return self.content
        ts_frame = TimeSeriesData(time_to_content=frame_description)
        ts_transcript = TimeSeriesData(time_to_content=transcript)
        times = ts_frame.content_to_times.get(self.content, []) + ts_transcript.content_to_times.get(
            self.content, []
        )
        if not times:
            return self.content
        return "\n\n".join(
            f"Frame description: {ts_frame.at_time(t)} \n \n Transcript: {ts_transcript.at_time(t)}"
            for t in times
        )


class ChunkGroup(BaseModel):
    main_chunk: ChunkResult
    padding_chunks: List[ChunkResult] = Field(default_factory=list)
    total_chunks: int = 0

    @property
    def all_chunks(self) -> List[ChunkResult]:
        padding = sorted(self.padding_chunks, key=lambda c: c.chunk_number)
        before = [c for c in padding if c.chunk_number < self.main_chunk.chunk_number]
        after = [c for c in padding if c.chunk_number > self.main_chunk.chunk_number]
        return before + [self.main_chunk] + after


class GroupedChunkResponse(BaseModel):
    chunks: List[ChunkResult]
    groups: List[ChunkGroup]
    total_results: int = 0
    has_padding: bool = False


class EntityType(str, Enum):
    USER = "user"
    DEVELOPER = "developer"


class AuthContext(BaseModel):
    """Authenticated request context (reference core/models/auth.py)."""

    entity_type: EntityType = EntityType.DEVELOPER
    entity_id: str = ""
    app_id: Optional[str] = None
    permissions: set[str] = Field(default_factory=lambda: {"read"})
    user_id: Optional[str] = None
    # App-token revocation: tokens carry the version they were minted at;
    # rotate_token bumps the registry version, invalidating old tokens
    # (reference auth_utils.py:90-143 token_version check).
    token_version: Optional[int] = None


class ChatMessage(BaseModel):
    role: Literal["user", "assistant", "system"]
    content: str


class CompletionRequest(BaseModel):
    query: str
    context_chunks: List[str] = Field(default_factory=list)
    max_tokens: Optional[int] = None
    temperature: Optional[float] = None
    prompt_template: Optional[str] = None
    chat_history: Optional[List[ChatMessage]] = None
    stream_response: bool = False
    response_schema: Optional[Dict[str, Any]] = None
    llm_config: Optional[Dict[str, Any]] = None
    inline_citations: bool = False


class CompletionResponse(BaseModel):
    completion: Any
    usage: Dict[str, int] = Field(default_factory=dict)
    finish_reason: Optional[str] = None
    sources: List[Dict[str, Any]] = Field(default_factory=list)
    metadata: Dict[str, Any] = Field(default_factory=dict)
