"""User tiers + usage limits (reference core/services/user_service.py:19-561,
core/database/user_limits_db.py:15-330, core/limits_utils.py:57-221).

Usage counters live in sqlite; `check_and_increment_limits` supports the
reference's verify_only dry-run. Limits only bite in cloud mode —
self-hosted runs are unlimited, like the reference."""

from __future__ import annotations

import logging
import sqlite3
import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional

from morphik_core_tpu.models.tiers import TIER_LIMITS, AccountTier

logger = logging.getLogger(__name__)

_SCHEMA = """
CREATE TABLE IF NOT EXISTS user_limits (
    user_id TEXT PRIMARY KEY,
    tier TEXT DEFAULT 'free',
    pages_used REAL DEFAULT 0,
    queries_used INTEGER DEFAULT 0,
    storage_bytes INTEGER DEFAULT 0,
    apps_used INTEGER DEFAULT 0,
    period_start REAL,
    custom_limits TEXT
);
CREATE TABLE IF NOT EXISTS apps (
    app_id TEXT PRIMARY KEY,
    name TEXT,
    user_id TEXT,
    org_id TEXT,
    uri TEXT,
    token_version INTEGER DEFAULT 1,
    created_at REAL
);
"""

_MONTH_S = 30 * 24 * 3600


class LimitExceededError(Exception):
    def __init__(self, limit_type: str, detail: str = ""):
        self.limit_type = limit_type
        super().__init__(f"limit exceeded: {limit_type}. {detail}".strip())


class UserService:
    def __init__(self, path: str | Path = ":memory:", enforce: bool = False):
        self.path = str(path)
        self.enforce = enforce
        if self.path != ":memory:":
            Path(self.path).parent.mkdir(parents=True, exist_ok=True)
        self._conn = sqlite3.connect(self.path, check_same_thread=False)
        self._conn.row_factory = sqlite3.Row
        self._lock = threading.RLock()
        self._conn.executescript(_SCHEMA)

    async def initialize(self) -> bool:
        return True

    def _row(self, user_id: str) -> sqlite3.Row:
        with self._lock:
            row = self._conn.execute("SELECT * FROM user_limits WHERE user_id=?", (user_id,)).fetchone()
            if row is None:
                self._conn.execute(
                    "INSERT INTO user_limits (user_id, period_start) VALUES (?, ?)",
                    (user_id, time.time()),
                )
                self._conn.commit()
                row = self._conn.execute("SELECT * FROM user_limits WHERE user_id=?", (user_id,)).fetchone()
            return row

    def _maybe_reset_period(self, user_id: str, row: sqlite3.Row) -> sqlite3.Row:
        if row["period_start"] and time.time() - row["period_start"] > _MONTH_S:
            with self._lock:
                self._conn.execute(
                    "UPDATE user_limits SET pages_used=0, queries_used=0, period_start=? WHERE user_id=?",
                    (time.time(), user_id),
                )
                self._conn.commit()
            return self._row(user_id)
        return row

    async def get_user_limits(self, user_id: str) -> Dict[str, Any]:
        row = self._maybe_reset_period(user_id, self._row(user_id))
        tier = AccountTier(row["tier"])
        limits = TIER_LIMITS[tier]
        return {
            "user_id": user_id,
            "tier": tier.value,
            "usage": {
                "pages_used": row["pages_used"],
                "queries_used": row["queries_used"],
                "storage_bytes": row["storage_bytes"],
                "apps_used": row["apps_used"],
            },
            "limits": limits,
        }

    async def set_tier(self, user_id: str, tier: str) -> None:
        self._row(user_id)
        with self._lock:
            self._conn.execute("UPDATE user_limits SET tier=? WHERE user_id=?", (AccountTier(tier).value, user_id))
            self._conn.commit()

    async def check_and_increment_limits(
        self,
        user_id: Optional[str],
        limit_type: str,
        amount: float = 1.0,
        *,
        verify_only: bool = False,
    ) -> None:
        """limit_type in {pages, queries, storage, apps}. Raises
        LimitExceededError when the increment would cross the quota
        (reference limits_utils.check_and_increment_limits:57-221)."""
        if not self.enforce or user_id is None:
            return
        row = self._maybe_reset_period(user_id, self._row(user_id))
        tier = AccountTier(row["tier"])
        limits = TIER_LIMITS[tier]
        col, cap = {
            "pages": ("pages_used", limits["pages_per_month"]),
            "queries": ("queries_used", limits["queries_per_month"]),
            "storage": ("storage_bytes", limits["storage_bytes"]),
            "apps": ("apps_used", limits["apps"]),
        }[limit_type]
        if cap is not None and row[col] + amount > cap:
            raise LimitExceededError(limit_type, f"{row[col]}+{amount} > {cap} ({tier.value})")
        if verify_only:
            return
        with self._lock:
            # atomic conditional increment: the read above is advisory
            # (fast-path error message); the guarded UPDATE is what
            # enforces the cap under concurrency
            if cap is not None:
                cur = self._conn.execute(
                    f"UPDATE user_limits SET {col} = {col} + ? "
                    f"WHERE user_id = ? AND {col} + ? <= ?",
                    (amount, user_id, amount, cap),
                )
                if cur.rowcount == 0:
                    self._conn.commit()
                    raise LimitExceededError(limit_type, f"quota exceeded ({tier.value})")
            else:
                self._conn.execute(
                    f"UPDATE user_limits SET {col} = {col} + ? WHERE user_id = ?",
                    (amount, user_id),
                )
            self._conn.commit()

    # --------------------------------------------------------- app registry
    # (reference core/services/user_service.py app provisioning + the
    #  /apps management endpoints, core/api.py:1197-1707)

    async def register_app(
        self,
        app_id: str,
        name: str,
        user_id: str,
        uri: str,
        org_id: Optional[str] = None,
    ) -> Dict[str, Any]:
        # idempotent provisioning: re-registering an existing app must not
        # inflate the apps quota counter (delete_app only decrements once)
        if await self.get_app(app_id) is None:
            await self.check_and_increment_limits(user_id, "apps", 1)
        with self._lock:
            self._conn.execute(
                "INSERT OR REPLACE INTO apps (app_id, name, user_id, org_id, uri, token_version, created_at)"
                " VALUES (?,?,?,?,?,COALESCE((SELECT token_version FROM apps WHERE app_id=?),1),?)",
                (app_id, name, user_id, org_id, uri, app_id, time.time()),
            )
            self._conn.commit()
        return (await self.get_app(app_id)) or {}

    async def get_app(self, app_id: str) -> Optional[Dict[str, Any]]:
        with self._lock:
            row = self._conn.execute("SELECT * FROM apps WHERE app_id=?", (app_id,)).fetchone()
        return dict(row) if row else None

    async def list_apps(
        self, user_id: Optional[str] = None, org_id: Optional[str] = None
    ) -> list:
        sql, params = "SELECT * FROM apps", []
        clauses = []
        if user_id:
            clauses.append("user_id=?")
            params.append(user_id)
        if org_id:
            clauses.append("org_id=?")
            params.append(org_id)
        if clauses:
            sql += " WHERE " + " AND ".join(clauses)
        with self._lock:
            rows = self._conn.execute(sql + " ORDER BY created_at", params).fetchall()
        return [dict(r) for r in rows]

    async def delete_app(self, app_id: str, user_id: str) -> bool:
        with self._lock:
            cur = self._conn.execute(
                "DELETE FROM apps WHERE app_id=? AND user_id=?", (app_id, user_id)
            )
            if cur.rowcount:
                self._conn.execute(
                    "UPDATE user_limits SET apps_used = MAX(apps_used - 1, 0) WHERE user_id=?",
                    (user_id,),
                )
            self._conn.commit()
        return bool(cur.rowcount)

    async def rotate_app_token(self, app_id: str, user_id: str) -> Optional[int]:
        """Bump token_version: outstanding tokens with the old version stop
        verifying (reference /apps/rotate_token)."""
        with self._lock:
            cur = self._conn.execute(
                "UPDATE apps SET token_version = token_version + 1 WHERE app_id=? AND user_id=?",
                (app_id, user_id),
            )
            self._conn.commit()
        if not cur.rowcount:
            return None
        app = await self.get_app(app_id)
        return int(app["token_version"]) if app else None

    async def rename_app(self, app_id: str, user_id: str, new_name: str) -> bool:
        with self._lock:
            cur = self._conn.execute(
                "UPDATE apps SET name=? WHERE app_id=? AND user_id=?", (new_name, app_id, user_id)
            )
            self._conn.commit()
        return bool(cur.rowcount)
