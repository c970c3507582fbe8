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
    """Chunk whose `content` is auto-decoded to a PIL image when the
    chunk is an image (reference sdk FinalChunkResult content: str|PILImage,
    _internal.py:28 + _parse_chunk_result_list_response:628-650).

    `content` stays the raw string on the model; `.image` decodes lazily
    and `.decoded_content` mirrors the reference's union-typed field."""

    @property
    def image(self):
        content = str(self.content)
        payload = None
        if content.startswith("data:image/"):
            payload = content.split(",", 1)[1]
        elif self.metadata.get("is_image"):
            payload = content.split(",", 1)[1] if content.startswith("data:") else content
        if payload is None:
            return None
        import base64

        from PIL import Image

        try:
            return Image.open(io.BytesIO(base64.b64decode(payload)))
        except Exception:
            return None

    @property
    def decoded_content(self):
        """PIL image for image chunks, the text content otherwise —
        the reference's FinalChunkResult.content semantics."""
        if self.metadata.get("is_image") or str(self.content).startswith("data:image/"):
            img = self.image
            return img if img is not None else self.content  # ref falls back to text
        return self.content


class CompletionResponse(BaseModel):
    completion: Any
    usage: Dict[str, int] = Field(default_factory=dict)
    sources: List[Dict[str, Any]] = Field(default_factory=list)
    finish_reason: Optional[str] = None
    metadata: Dict[str, Any] = Field(default_factory=dict)
