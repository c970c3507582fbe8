"""Local-directory connector: exposes a directory tree through the
connector interface. Fully functional offline; also the test double for
the framework (no analogue in the reference, which only ships cloud
connectors — this fills the role their mocked tests play)."""

from __future__ import annotations

from datetime import datetime, timezone
from io import BytesIO
from pathlib import Path
from typing import Any, Dict, Optional

from morphik_core_tpu.ee.connectors.base import (
    BaseConnector,
    ConnectorAuthStatus,
    ConnectorFile,
)
from morphik_core_tpu.storage.content_types import detect_content_type


class LocalDirectoryConnector(BaseConnector):
    connector_type = "local"

    def __init__(self, user_id: str, credentials_dir="./storage/connector_credentials"):
        super().__init__(user_id, credentials_dir)

    def _root(self) -> Optional[Path]:
        creds = self._load_credentials()
        if not creds or "root" not in creds:
            return None
        return Path(creds["root"])

    def _resolve(self, file_id: str) -> Path:
        root = self._root()
        if root is None:
            raise PermissionError("connector not configured")
        p = (root / file_id).resolve()
        if root.resolve() != p and root.resolve() not in p.parents:
            raise ValueError("path escapes connector root")
        return p

    async def get_auth_status(self) -> ConnectorAuthStatus:
        root = self._root()
        if root is None or not root.is_dir():
            return ConnectorAuthStatus(
                is_authenticated=False,
                message="set a root directory via finalize_auth({'root': ...})",
            )
        return ConnectorAuthStatus(is_authenticated=True, message=f"root={root}")

    async def initiate_auth(self) -> Dict[str, Any]:
        return {"credentials_required": ["root"]}

    async def finalize_auth(self, auth_response_data: Dict[str, Any]) -> bool:
        root = auth_response_data.get("root")
        if not root or not Path(root).is_dir():
            return False
        self._save_credentials({"root": str(Path(root).resolve())})
        return True

    def _to_file(self, p: Path, root: Path) -> ConnectorFile:
        rel = str(p.relative_to(root))
        st = p.stat()
        return ConnectorFile(
            id=rel,
            name=p.name,
            is_folder=p.is_dir(),
            mime_type=None if p.is_dir() else detect_content_type(b"", p.name),
            size=None if p.is_dir() else st.st_size,
            modified_date=datetime.fromtimestamp(st.st_mtime, timezone.utc).isoformat(),
        )

    async def list_files(
        self, path: Optional[str] = None, page_token: Optional[str] = None, **kwargs
    ) -> Dict[str, Any]:
        root = self._root()
        if root is None:
            return {"files": [], "next_page_token": None}
        base = self._resolve(path) if path else root
        entries = sorted(base.iterdir(), key=lambda p: (not p.is_dir(), p.name))
        start = int(page_token or 0)
        page = entries[start : start + 100]
        next_token = str(start + 100) if start + 100 < len(entries) else None
        return {
            "files": [self._to_file(p, root) for p in page],
            "next_page_token": next_token,
        }

    async def download_file_by_id(self, file_id: str) -> Optional[BytesIO]:
        p = self._resolve(file_id)
        if not p.is_file():
            return None
        return BytesIO(p.read_bytes())

    async def get_file_metadata_by_id(self, file_id: str) -> Optional[ConnectorFile]:
        root = self._root()
        p = self._resolve(file_id)
        if not p.exists():
            return None
        return self._to_file(p, root)
