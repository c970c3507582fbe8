"""Security hardening regression tests (round-1 advisor findings).

- /local/generate_uri is password-gated (reference LOCAL_URI_PASSWORD,
  core/api.py:963-977) — an open route mints admin tokens for any tenant.
- /models and /models/available require auth and never leak provider
  secrets (api_key/api_base) from registered_models (reference
  core/api.py:873 returns only id/name/provider/description).
- /embeddings requires a bearer key (or JWT) — open compute lets anyone
  burn TPU time (reference MORPHIK_EMBEDDING_API_KEY contract,
  colpali_api_embedding_model.py:285).
- Serving mode refuses random-weight fallback when no checkpoint is
  configured outside development.
"""

import asyncio

import httpx
import pytest

from morphik_core_tpu.api.app import build_app
from morphik_core_tpu.api.auth import create_token
from morphik_core_tpu.api.http import HTTPServer
from morphik_core_tpu.config import Settings
from morphik_core_tpu.services_init import build_services

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


@pytest.fixture(scope="module")
def hardened_server(tmp_path_factory):
    """Strict-auth server with a local-URI password, an embeddings key,
    and a registered model carrying a provider secret."""
    root = tmp_path_factory.mktemp("hardened")
    settings = Settings.model_validate(
        {
            "auth": {
                "bypass_auth_mode": False,
                "jwt_secret_key": "test-secret",
                "local_uri_password": "sesame",
            },
            "morphik": {"morphik_embedding_api_key": "emb-key-123"},
            "registered_models": {
                "gpt-testy": {
                    "model_name": "gpt-testy",
                    "provider": "openai",
                    "api_key": "sk-SUPER-SECRET",
                    "api_base": "https://secret.internal",
                }
            },
            "storage": {"storage_path": str(root / "storage")},
            "database": {"path": str(root / "db.sqlite")},
            "vector_store": {"index_path": str(root / "index")},
        }
    )
    services = build_services(settings)
    run(services.initialize())
    srv = HTTPServer(build_app(services), "127.0.0.1", 0)
    run(srv.start())
    yield f"http://127.0.0.1:{srv.port}", settings
    run(srv.stop())
    run(services.shutdown())


def test_generate_uri_password_gate(hardened_server):
    base, settings = hardened_server

    async def go():
        async with httpx.AsyncClient(base_url=base, timeout=60.0) as c:
            # no password -> 401
            r = await c.post("/local/generate_uri", json={"name": "mallory"})
            assert r.status_code == 401
            # wrong password -> 401
            r = await c.post(
                "/local/generate_uri",
                json={"name": "mallory", "password_token": "guess"},
            )
            assert r.status_code == 401
            # right password -> URI minted
            r = await c.post(
                "/local/generate_uri",
                json={"name": "Dev User", "password_token": "sesame"},
            )
            assert r.status_code == 200
            assert r.json()["uri"].startswith("morphik://dev_user:")

    run(go())


def test_generate_uri_strict_mode_without_password_is_disabled(tmp_path):
    settings = Settings.model_validate(
        {
            "auth": {"bypass_auth_mode": False, "jwt_secret_key": "s"},
            "storage": {"storage_path": str(tmp_path / "storage")},
            "database": {"path": str(tmp_path / "db.sqlite")},
            "vector_store": {"index_path": str(tmp_path / "index")},
            "morphik": {"enable_colpali": False},
        }
    )
    services = build_services(settings)
    run(services.initialize())
    srv = HTTPServer(build_app(services), "127.0.0.1", 0)
    run(srv.start())

    async def go():
        async with httpx.AsyncClient(
            base_url=f"http://127.0.0.1:{srv.port}", timeout=60.0
        ) as c:
            r = await c.post("/local/generate_uri", json={"name": "x"})
            assert r.status_code == 500

    try:
        run(go())
    finally:
        run(srv.stop())
        run(services.shutdown())


def test_models_routes_require_auth_and_hide_secrets(hardened_server):
    base, settings = hardened_server

    async def go():
        async with httpx.AsyncClient(base_url=base, timeout=60.0) as c:
            r = await c.get("/models/available")
            assert r.status_code == 401
            r = await c.get("/models")
            assert r.status_code == 401
            tok = create_token(settings, entity_id="alice")
            hdr = {"Authorization": f"Bearer {tok}"}
            r = await c.get("/models/available", headers=hdr)
            assert r.status_code == 200
            body = r.text
            assert "sk-SUPER-SECRET" not in body
            assert "secret.internal" not in body
            assert r.json()[0]["id"] == "gpt-testy"
            r = await c.get("/models", headers=hdr)
            assert r.status_code == 200
            assert "sk-SUPER-SECRET" not in r.text

    run(go())


def test_embeddings_requires_bearer_key(hardened_server):
    base, settings = hardened_server

    async def go():
        async with httpx.AsyncClient(base_url=base, timeout=120.0) as c:
            r = await c.post(
                "/embeddings", json={"input_type": "text", "inputs": ["hi"]}
            )
            assert r.status_code == 401
            r = await c.post(
                "/embeddings",
                json={"input_type": "text", "inputs": ["hi"]},
                headers={"Authorization": "Bearer wrong"},
            )
            assert r.status_code == 401
            r = await c.post(
                "/embeddings",
                json={"input_type": "text", "inputs": ["hi"]},
                headers={"Authorization": "Bearer emb-key-123"},
            )
            assert r.status_code == 200
            assert r.headers["content-type"] == "application/octet-stream"

    run(go())


def test_embeddings_falls_back_to_jwt_when_no_key(tmp_path):
    """Without a dedicated embedding key, strict mode still requires JWT."""
    settings = Settings.model_validate(
        {
            "auth": {"bypass_auth_mode": False, "jwt_secret_key": "s2"},
            "storage": {"storage_path": str(tmp_path / "storage")},
            "database": {"path": str(tmp_path / "db.sqlite")},
            "vector_store": {"index_path": str(tmp_path / "index")},
        }
    )
    services = build_services(settings)
    run(services.initialize())
    srv = HTTPServer(build_app(services), "127.0.0.1", 0)
    run(srv.start())

    async def go():
        async with httpx.AsyncClient(
            base_url=f"http://127.0.0.1:{srv.port}", timeout=120.0
        ) as c:
            r = await c.post(
                "/embeddings", json={"input_type": "text", "inputs": ["hi"]}
            )
            assert r.status_code == 401
            tok = create_token(settings, entity_id="alice")
            r = await c.post(
                "/embeddings",
                json={"input_type": "text", "inputs": ["hi"]},
                headers={"Authorization": f"Bearer {tok}"},
            )
            assert r.status_code == 200

    try:
        run(go())
    finally:
        run(srv.stop())
        run(services.shutdown())


def test_no_checkpoint_hard_fails_outside_development():
    from morphik_core_tpu.embedding.colpali_embedding_model import ColpaliEmbeddingModel

    settings = Settings.model_validate({"service": {"environment": "production"}})
    with pytest.raises(RuntimeError, match="refusing"):
        ColpaliEmbeddingModel(settings)


def test_missing_projection_head_raises(tmp_path):
    """A base (non-ColPali) checkpoint without custom_text_proj must fail
    loudly instead of substituting a random projection."""
    import importlib.util
    import os

    import numpy as np

    from morphik_core_tpu.models.colqwen.config import ColQwenConfig
    from morphik_core_tpu.models.colqwen.convert import convert_state_dict

    # Reuse the synthetic torch-layout state builder from the checkpoint
    # round-trip test, then drop the projection head.
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "_ckpt_helper", os.path.join(here, "test_checkpoint_load.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = ColQwenConfig.tiny()
    rng = np.random.default_rng(0)
    state = mod._write_checkpoint(tmp_path, cfg, rng)
    state = {k: v for k, v in state.items() if not k.startswith("custom_text_proj")}
    with pytest.raises(KeyError, match="custom_text_proj"):
        convert_state_dict(state, cfg, dtype=np.float32)
    # test escape hatch still works
    out = convert_state_dict(state, cfg, dtype=np.float32, allow_missing_projection=True)
    assert "proj_w" in out


def test_cloud_tokens_are_not_admin(hardened_server):
    """Regression: create_token defaulted to admin, making the
    cross-user guards on /apps and /logs vacuous for every provisioned
    token. Cloud-minted tokens must be read/write only."""
    base, settings = hardened_server

    async def go():
        alice = create_token(settings, entity_id="alice")
        async with httpx.AsyncClient(base_url=base, timeout=60.0,
                                     headers={"Authorization": f"Bearer {alice}"}) as c:
            r = await c.post("/cloud/generate_uri", json={"name": "aliceapp"})
            assert r.status_code == 200, r.text
            uri = r.json()["uri"]
            app_token = uri.split("//")[1].split(":", 1)[1].split("@")[0]
            import base64 as _b64
            import json as _json

            body = app_token.split(".")[1]
            claims = _json.loads(_b64.urlsafe_b64decode(body + "=" * (-len(body) % 4)))
            assert "admin" not in claims["permissions"], claims
        # the minted app token cannot list another user's apps
        async with httpx.AsyncClient(base_url=base, timeout=60.0,
                                     headers={"Authorization": f"Bearer {app_token}"}) as c:
            r = await c.get("/apps", params={"user_id": "bob"})
            assert r.status_code == 403, r.text

    run(go())

@pytest.fixture(scope="module", autouse=True)
def _loop_lifecycle():
    """Run pending callbacks (async-generator aclose tasks scheduled at
    GC) and CLOSE the module loop — an abandoned loop turns those into
    'Task was destroyed but it is pending!' at interpreter exit."""
    yield
    try:
        _LOOP.run_until_complete(asyncio.sleep(0.05))
    finally:
        _LOOP.close()
