"""Account tiers and quota tables (reference core/models/tiers.py:5-120)."""

from __future__ import annotations

from enum import Enum
from typing import Any, Dict


class AccountTier(str, Enum):
    FREE = "free"
    DEVELOPER = "developer"
    STARTUP = "startup"
    ENTERPRISE = "enterprise"
    SELF_HOSTED = "self_hosted"


# Monthly / absolute quotas per tier. self_hosted = unlimited.
TIER_LIMITS: Dict[AccountTier, Dict[str, Any]] = {
    AccountTier.FREE: {
        "pages_per_month": 200,
        "queries_per_month": 500,
        "storage_bytes": 1 * 1024**3,
        "apps": 1,
    },
    AccountTier.DEVELOPER: {
        "pages_per_month": 2_000,
        "queries_per_month": 5_000,
        "storage_bytes": 10 * 1024**3,
        "apps": 5,
    },
    AccountTier.STARTUP: {
        "pages_per_month": 50_000,
        "queries_per_month": 100_000,
        "storage_bytes": 100 * 1024**3,
        "apps": 20,
    },
    AccountTier.ENTERPRISE: {
        "pages_per_month": None,
        "queries_per_month": None,
        "storage_bytes": None,
        "apps": None,
    },
    AccountTier.SELF_HOSTED: {
        "pages_per_month": None,
        "queries_per_month": None,
        "storage_bytes": None,
        "apps": None,
    },
}


def estimate_pages_from_chars(n_chars: int) -> float:
    """chars/4 tokens, 630 tokens/page (reference limits_utils.py:52-57)."""
    return max(1.0, (n_chars / 4.0) / 630.0)
