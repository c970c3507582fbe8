"""Telemetry log uploader + installation heartbeat background threads
(reference core/services/log_uploader.py:37-305 and heartbeat.py:16 —
bundle local telemetry JSONL, sign, POST to a collector every few hours;
ping a heartbeat endpoint with installation id/version).

Both are OFF unless an endpoint is configured (`telemetry.upload_url` /
`telemetry.heartbeat_url`): self-hosted deployments, and this build
environment, have no egress. The local-budget enforcement (cap the
telemetry dir, dropping oldest files first) runs regardless since it
protects local disk."""

from __future__ import annotations

import hashlib
import hmac
import json
import logging
import threading
import time
import urllib.request
import uuid
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

DEFAULT_LOCAL_BUDGET_BYTES = 1 * 1024**3  # reference: 1 GiB local cap


def enforce_local_budget(telemetry_dir: str | Path, budget_bytes: int = DEFAULT_LOCAL_BUDGET_BYTES) -> int:
    """Delete oldest telemetry files until the dir fits the budget.
    Returns bytes freed (reference log_uploader.py:102-301 truncation)."""
    d = Path(telemetry_dir)
    if not d.exists():
        return 0
    files = sorted(
        (p for p in d.glob("*.jsonl") if p.is_file()),
        key=lambda p: p.stat().st_mtime,
    )
    total = sum(p.stat().st_size for p in files)
    freed = 0
    while total > budget_bytes and files:
        victim = files.pop(0)
        size = victim.stat().st_size
        victim.unlink(missing_ok=True)
        total -= size
        freed += size
        logger.info("telemetry budget: dropped %s (%d B)", victim.name, size)
    return freed


def _installation_id(state_dir: str | Path) -> str:
    p = Path(state_dir) / "installation_id"
    if p.exists():
        return p.read_text().strip()
    p.parent.mkdir(parents=True, exist_ok=True)
    iid = uuid.uuid4().hex
    p.write_text(iid)
    return iid


class LogUploader(threading.Thread):
    """Bundles telemetry JSONL and POSTs it with an HMAC signature
    (reference `telemetry_signature`) every `interval_s`."""

    def __init__(
        self,
        telemetry_dir: str | Path,
        upload_url: Optional[str] = None,
        signing_key: str = "morphik",
        interval_s: float = 4 * 3600,
        budget_bytes: int = DEFAULT_LOCAL_BUDGET_BYTES,
    ):
        super().__init__(daemon=True, name="log-uploader")
        self.telemetry_dir = Path(telemetry_dir)
        self.upload_url = upload_url
        self.signing_key = signing_key
        self.interval_s = interval_s
        self.budget_bytes = budget_bytes
        self._stop = threading.Event()

    def stop(self) -> None:
        self._stop.set()

    def upload_once(self) -> bool:
        enforce_local_budget(self.telemetry_dir, self.budget_bytes)
        if not self.upload_url:
            return False
        files = sorted(self.telemetry_dir.glob("spans_*.jsonl"))
        if not files:
            return False
        # snapshot each file's READ extent: spans appended between read
        # and cleanup must survive to the next cycle, not be deleted
        snaps = [(p, p.read_bytes()) for p in files]
        payload = b"\n".join(data for _, data in snaps)
        sig = hmac.new(self.signing_key.encode(), payload, hashlib.sha256).hexdigest()
        req = urllib.request.Request(
            self.upload_url,
            data=payload,
            headers={
                "Content-Type": "application/x-ndjson",
                "X-Telemetry-Signature": sig,
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                ok = 200 <= resp.status < 300
        except Exception as e:  # noqa: BLE001
            logger.warning("telemetry upload failed: %s", e)
            return False
        if ok:
            # hold the telemetry writer's lock so no span is appended
            # between the size check and the unlink/replace (the writer
            # opens the file per flush under this same lock)
            import contextlib

            from morphik_core_tpu.services.telemetry import TelemetryService

            svc = TelemetryService._instance
            lock = svc._file_lock if svc is not None else contextlib.nullcontext()
            with lock:
                for p, data in snaps:
                    try:
                        size_now = p.stat().st_size
                    except OSError:
                        continue
                    if size_now <= len(data):
                        p.unlink(missing_ok=True)
                    else:
                        # the live day-file grew after the read: keep only
                        # the un-uploaded tail
                        with open(p, "rb") as fh:
                            fh.seek(len(data))
                            tail = fh.read()
                        tmp = p.with_suffix(".tmp")
                        tmp.write_bytes(tail)
                        tmp.replace(p)
        return ok

    def run(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                self.upload_once()
            except Exception:  # noqa: BLE001
                logger.exception("log uploader cycle failed")


class Heartbeat(threading.Thread):
    """Periodic install ping (reference core/services/heartbeat.py)."""

    def __init__(
        self,
        heartbeat_url: Optional[str],
        state_dir: str | Path,
        version: str,
        interval_s: float = 3600,
    ):
        super().__init__(daemon=True, name="heartbeat")
        self.heartbeat_url = heartbeat_url
        self.installation_id = _installation_id(state_dir)
        self.version = version
        self.interval_s = interval_s
        self._stop = threading.Event()

    def stop(self) -> None:
        self._stop.set()

    def ping_once(self) -> bool:
        if not self.heartbeat_url:
            return False
        body = json.dumps(
            {
                "installation_id": self.installation_id,
                "version": self.version,
                "ts": time.time(),
            }
        ).encode()
        req = urllib.request.Request(
            self.heartbeat_url, data=body, headers={"Content-Type": "application/json"}
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                return 200 <= resp.status < 300
        except Exception as e:  # noqa: BLE001
            logger.debug("heartbeat failed: %s", e)
            return False

    def run(self) -> None:
        self.ping_once()
        while not self._stop.wait(self.interval_s):
            self.ping_once()
