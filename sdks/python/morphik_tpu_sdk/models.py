"""SDK-side result models (reference sdks/python/morphik/models.py)."""

from __future__ import annotations

import io
from typing import Any, Dict, List, Optional

from pydantic import BaseModel, Field


class Document(BaseModel):
    external_id: str
    content_type: str = ""
    filename: Optional[str] = None
    metadata: Dict[str, Any] = Field(default_factory=dict)
    system_metadata: Dict[str, Any] = Field(default_factory=dict)
    storage_info: Dict[str, Any] = Field(default_factory=dict)
    chunk_ids: List[str] = Field(default_factory=list)
    folder_name: Optional[str] = None
    folder_path: Optional[str] = None
    end_user_id: Optional[str] = None

    @property
    def status(self) -> str:
        return self.system_metadata.get("status", "unknown")


class ChunkResult(BaseModel):
    content: str
    score: float
    document_id: str
    chunk_number: int
    metadata: Dict[str, Any] = Field(default_factory=dict)
    content_type: str = "text/plain"
    filename: Optional[str] = None
    download_url: Optional[str] = None
    is_padding: bool = False


class FinalChunkResult(ChunkResult):
    """Chunk with image data URIs auto-decoded to PIL
    (reference sdk FinalChunkResult, _internal.py:28)."""

    @property
    def image(self):
        if not str(self.content).startswith("data:image/"):
            return None
        from PIL import Image

        import base64

        payload = self.content.split(",", 1)[1]
        return Image.open(io.BytesIO(base64.b64decode(payload)))


class CompletionResponse(BaseModel):
    completion: Any
    usage: Dict[str, int] = Field(default_factory=dict)
    sources: List[Dict[str, Any]] = Field(default_factory=list)
    finish_reason: Optional[str] = None
    metadata: Dict[str, Any] = Field(default_factory=dict)
