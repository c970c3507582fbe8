"""Connector factory (reference ee/routers/connectors_router.py resolves
connector_type -> implementation per authenticated user)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Type

from morphik_core_tpu.ee.connectors.base import BaseConnector
from morphik_core_tpu.ee.connectors.github import GitHubConnector
from morphik_core_tpu.ee.connectors.google_drive import GoogleDriveConnector
from morphik_core_tpu.ee.connectors.local import LocalDirectoryConnector
from morphik_core_tpu.ee.connectors.zotero import ZoteroConnector

CONNECTORS: Dict[str, Type[BaseConnector]] = {
    "local": LocalDirectoryConnector,
    "github": GitHubConnector,
    "google_drive": GoogleDriveConnector,
    "zotero": ZoteroConnector,
}


def get_connector(
    connector_type: str, user_id: str, credentials_dir: str | Path = "./storage/connector_credentials"
) -> BaseConnector:
    cls = CONNECTORS.get(connector_type)
    if cls is None:
        raise KeyError(f"unknown connector type: {connector_type}")
    if connector_type == "google_drive":
        # the OAuth client lives in config (reference ee app settings):
        # without this the Drive flow could never produce an auth_url
        from morphik_core_tpu.config import get_settings

        ee = get_settings().ee
        return cls(
            user_id, credentials_dir,
            client_id=ee.google_client_id,
            client_secret=ee.google_client_secret,
            redirect_uri=ee.google_redirect_uri,
        )
    return cls(user_id, credentials_dir)
