"""Tier limits tests (reference limits_utils semantics: verify_only
dry-run, page estimation, enforcement only in cloud mode)."""

import asyncio

from conftest import run_once

import pytest

from morphik_core_tpu.models.tiers import estimate_pages_from_chars
from morphik_core_tpu.services.user_service import LimitExceededError, UserService


def run(coro):
    return run_once(coro)


def test_page_estimate():
    assert estimate_pages_from_chars(630 * 4) == 1.0
    assert estimate_pages_from_chars(10) == 1.0
    assert estimate_pages_from_chars(630 * 4 * 5) == 5.0


def test_limits_enforced_in_cloud_mode():
    async def go():
        svc = UserService(":memory:", enforce=True)
        await svc.check_and_increment_limits("u1", "pages", 150)
        with pytest.raises(LimitExceededError):
            await svc.check_and_increment_limits("u1", "pages", 100)  # free cap 200
        # verify_only does not consume quota
        await svc.check_and_increment_limits("u1", "pages", 50, verify_only=True)
        await svc.check_and_increment_limits("u1", "pages", 50, verify_only=True)
        await svc.check_and_increment_limits("u1", "pages", 50)
        info = await svc.get_user_limits("u1")
        assert info["usage"]["pages_used"] == 200
        # tier upgrade lifts the cap
        await svc.set_tier("u1", "enterprise")
        await svc.check_and_increment_limits("u1", "pages", 10_000)

    run(go())


def test_limits_noop_self_hosted():
    async def go():
        svc = UserService(":memory:", enforce=False)
        await svc.check_and_increment_limits("u1", "queries", 10**9)  # no error

    run(go())
