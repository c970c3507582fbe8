"""Multi-server embedding fan-out demo (reference deployment shape:
one API node fanning embeddings out to N GPU endpoints; here the
endpoints are TPU servers exposing POST /embeddings, and the API node
runs colpali_mode="api").

Runs entirely on localhost: two embedding servers + one API node.

    JAX_PLATFORMS=cpu python examples/fanout.py
"""

import asyncio
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


async def main() -> None:
    import tempfile

    from morphik_core_tpu.api.app import build_app
    from morphik_core_tpu.api.http import HTTPServer
    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.services_init import build_services

    tmp = tempfile.mkdtemp()

    def settings_for(name: str, extra: dict) -> Settings:
        return Settings.model_validate(
            {
                "storage": {"storage_path": f"{tmp}/{name}/storage"},
                "database": {"path": f"{tmp}/{name}/db.sqlite"},
                "vector_store": {"index_path": f"{tmp}/{name}/index"},
                **extra,
            }
        )

    # --- two embedding servers (each would own a TPU slice in prod) ---
    embed_servers = []
    endpoints = []
    for i in range(2):
        services = build_services(settings_for(f"embed{i}", {}))
        await services.initialize()
        srv = HTTPServer(build_app(services), "127.0.0.1", 0)
        await srv.start()
        embed_servers.append((srv, services))
        endpoints.append(f"http://127.0.0.1:{srv.port}")
    print(f"embedding endpoints: {endpoints}")

    # --- API node: no local tower, fans out over HTTP ---
    # NB: model.embedding_dim must match what the endpoints emit — 16 for
    # the tiny dev model; 128 for a real ColQwen2.5 checkpoint.
    api_services = build_services(
        settings_for(
            "api",
            {"morphik": {"colpali_mode": "api",
                          "morphik_embedding_api_endpoints": endpoints},
             "model": {"embedding_dim": 16}},
        )
    )
    await api_services.initialize()
    api = HTTPServer(build_app(api_services), "127.0.0.1", 0)
    await api.start()
    print(f"api node: http://127.0.0.1:{api.port}")

    import httpx

    async with httpx.AsyncClient(base_url=f"http://127.0.0.1:{api.port}", timeout=120) as c:
        r = await c.post(
            "/ingest/text",
            json={"content": "The fan-out pipeline embeds via remote TPU servers.",
                  "filename": "demo.txt"},
        )
        if r.status_code != 200:
            print("ingest failed:", r.status_code, r.text[:300])
            raise SystemExit(1)
        doc_id = r.json()["external_id"]
        while (await c.get(f"/documents/{doc_id}/status")).json()["status"] == "processing":
            await asyncio.sleep(0.2)
        r = await c.post("/retrieve/chunks", json={"query": "fan-out pipeline", "k": 1})
        print("retrieved:", r.json()[0]["content"][:60])

    await api.stop()
    await api_services.shutdown()
    for srv, services in embed_servers:
        await srv.stop()
        await services.shutdown()
    print("fan-out demo complete")


if __name__ == "__main__":
    asyncio.run(main())
