#!/usr/bin/env python3
"""Live-server concurrency soak (run on the real chip).

Boots the full service stack + HTTP server, then drives concurrent
ingest / retrieve / filtered-retrieve / RAG-query traffic for
--seconds, asserting zero 5xx responses, a drained job queue, and zero
pending asyncio tasks after shutdown (the SIGTERM path).

Round-3 run on v5e through the relay (3 min, 2 ingesters + 2 queriers,
int8 serving defaults): 340 ingests, 176 each of retrieve / filtered /
query, 0 errors, 0 client timeouts, drained=true, 0 pending tasks.

Usage: python scripts/soak_serving.py [--seconds 180] [--root /tmp/soak]
"""

from __future__ import annotations

import argparse
import asyncio
import io
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def page_png(i: int) -> bytes:
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (320, 240), "white")
    d = ImageDraw.Draw(img)
    d.text((10, 30), f"SOAK DOC {i}", fill="black")
    d.text((10, 60), f"serial S-{1000 + i} torque {i * 3} Nm", fill="black")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


async def run_soak(seconds: int, root: str) -> dict:
    import httpx

    from morphik_core_tpu.api.app import build_app
    from morphik_core_tpu.api.http import HTTPServer
    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.services_init import build_services

    settings = Settings.model_validate(
        {
            "api": {"port": 0},
            "storage": {"storage_path": f"{root}/storage"},
            "database": {"path": f"{root}/db.sqlite"},
            "vector_store": {"index_path": f"{root}/index",
                             "fde_num_repetitions": 8,
                             "fde_num_simhash_projections": 4,
                             "fde_projection_dimension": 8},
        }
    )
    services = build_services(settings)
    await services.initialize()
    srv = HTTPServer(build_app(services), "127.0.0.1", 0)
    await srv.start()
    base = f"http://127.0.0.1:{srv.port}"
    stats = {"ingest": 0, "retrieve": 0, "query": 0, "filtered": 0,
             "errors": [], "client_timeouts": 0}

    # warmup: compile every program the traffic will hit BEFORE starting
    # the clock (cold compiles through a remote relay stack requests past
    # client timeouts and would measure the compiler, not the server)
    t0 = time.time()
    async with httpx.AsyncClient(base_url=base, timeout=600) as c:
        r = await c.post("/ingest/file",
                         files={"file": ("warm.png", page_png(0), "image/png")},
                         data={"metadata": "{}", "use_colpali": "true"})
        assert r.status_code == 200, r.text
        for _ in range(240):
            if services.job_queue.pending_count() == 0:
                break
            await asyncio.sleep(0.5)
        for body in ({"query": "torque warm", "k": 2, "use_colpali": True},
                     {"query": "torque warm", "k": 2, "use_colpali": True,
                      "filters": {"wid": {"$eq": 1}}}):
            await c.post("/retrieve/chunks", json=body)
        await c.post("/query", json={"query": "warm?", "k": 2, "use_colpali": True})
    warm_s = time.time() - t0
    deadline = time.time() + seconds

    async def hit(c, path, **kw) -> bool:
        import httpx as _hx

        try:
            r = await c.post(path, **kw)
            if r.status_code >= 500:
                stats["errors"].append((path, r.status_code, r.text[:120]))
                return False
            return True
        except _hx.TimeoutException:
            stats["client_timeouts"] += 1
            return False

    async def ingester(wid: int) -> None:
        import httpx as _hx

        i = wid * 1000
        async with _hx.AsyncClient(base_url=base, timeout=180) as c:
            while time.time() < deadline:
                i += 1
                if await hit(c, "/ingest/file",
                             files={"file": (f"doc{i}.png", page_png(i), "image/png")},
                             data={"metadata": json.dumps({"wid": wid}),
                                   "use_colpali": "true"}):
                    stats["ingest"] += 1
                await asyncio.sleep(0.3)

    async def querier() -> None:
        import httpx as _hx

        async with _hx.AsyncClient(base_url=base, timeout=180) as c:
            while time.time() < deadline:
                if await hit(c, "/retrieve/chunks", json={
                        "query": f"torque of serial S-{random.randint(1000, 1040)}",
                        "k": 3, "use_colpali": True}):
                    stats["retrieve"] += 1
                if await hit(c, "/retrieve/chunks", json={
                        "query": "torque", "k": 3, "use_colpali": True,
                        "filters": {"wid": {"$eq": 1}}}):
                    stats["filtered"] += 1
                if await hit(c, "/query", json={"query": "what torque values exist?",
                                                 "k": 2, "use_colpali": True}):
                    stats["query"] += 1
                await asyncio.sleep(0.5)

    await asyncio.gather(ingester(1), ingester(2), querier(), querier())
    drained = await services.job_queue.drain(timeout=180)
    await srv.stop()
    await services.shutdown()
    pend = [t for t in asyncio.all_tasks() if not t.done() and t is not asyncio.current_task()]
    return {**stats, "errors": stats["errors"][:5], "n_errors": len(stats["errors"]),
            "warmup_s": round(warm_s, 1), "drained": drained,
            "pending_after_drain": len(pend)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=180)
    ap.add_argument("--root", default="/tmp/soak")
    args = ap.parse_args()
    out = asyncio.run(run_soak(args.seconds, args.root))
    print(json.dumps(out))
    ok = out["n_errors"] == 0 and out["drained"] and out["pending_after_drain"] == 0
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
