"""Clean-shutdown regression tests (round-2 verdict item: the suite used
to end with 'Task was destroyed but it is pending!' for
JobQueue._worker_loop and HTTPServer._handle — the same code path a real
SIGTERM drain takes, reference start_server.py / app_factory lifespan).

Asserts that after `HTTPServer.stop()` + `Services.shutdown()` the event
loop has ZERO pending tasks, even with an idle keep-alive connection
still parked in the server's read loop.
"""

import asyncio
import socket

from morphik_core_tpu.api.app import build_app
from morphik_core_tpu.api.http import HTTPServer
from morphik_core_tpu.config import Settings
from morphik_core_tpu.services_init import build_services


def test_shutdown_drains_all_tasks(tmp_path):
    loop = asyncio.new_event_loop()
    try:
        settings = Settings.model_validate(
            {
                "api": {"port": 0},
                "storage": {"storage_path": str(tmp_path / "storage")},
                "database": {"path": str(tmp_path / "db.sqlite")},
                "vector_store": {
                    "index_path": str(tmp_path / "index"),
                    "fde_num_repetitions": 4,
                    "fde_num_simhash_projections": 3,
                    "fde_projection_dimension": 8,
                },
            }
        )
        services = build_services(settings)
        loop.run_until_complete(services.initialize())
        srv = HTTPServer(build_app(services), "127.0.0.1", 0)
        loop.run_until_complete(srv.start())

        async def one_request_keepalive():
            # leave the connection OPEN: the handler task parks in
            # _read_request waiting for the next request and must be
            # cancelled+awaited by stop()
            sock = socket.create_connection(("127.0.0.1", srv.port))
            sock.sendall(b"GET /ping HTTP/1.1\r\nHost: x\r\n\r\n")
            await asyncio.sleep(0.2)
            return sock

        sock = loop.run_until_complete(one_request_keepalive())
        assert srv._conn_tasks, "handler task should be live on the idle connection"

        loop.run_until_complete(srv.stop())
        loop.run_until_complete(services.shutdown())
        sock.close()

        pending = [t for t in asyncio.all_tasks(loop) if not t.done()]
        assert pending == [], f"undrained tasks after shutdown: {pending}"
    finally:
        loop.close()


def test_stop_lets_in_flight_request_finish():
    """A SIGTERM drain must let a handler that is MID-REQUEST write its
    response (only idle keep-alive handlers cancel immediately)."""
    from morphik_core_tpu.api.http import Request, Response, Router

    loop = asyncio.new_event_loop()
    try:

        async def go():
            router = Router()
            entered = asyncio.Event()

            @router.get("/slow")
            async def slow(req: Request) -> Response:
                entered.set()
                await asyncio.sleep(0.5)
                return Response.json({"ok": True})

            srv = HTTPServer(router, "127.0.0.1", 0)
            await srv.start()

            async def client():
                reader, writer = await asyncio.open_connection("127.0.0.1", srv.port)
                writer.write(b"GET /slow HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
                await writer.drain()
                data = await reader.read()
                writer.close()
                return data

            task = asyncio.create_task(client())
            await asyncio.wait_for(entered.wait(), 5)
            await srv.stop()  # drain while /slow is still in flight
            body = await asyncio.wait_for(task, 5)
            assert b"200 OK" in body and b'"ok": true' in body, body[:200]

        loop.run_until_complete(go())
        pending = [t for t in asyncio.all_tasks(loop) if not t.done()]
        assert pending == []
    finally:
        loop.close()


def test_job_queue_stop_awaits_workers(tmp_path):
    from morphik_core_tpu.workers.job_queue import JobQueue

    loop = asyncio.new_event_loop()
    try:

        async def go():
            q = JobQueue(tmp_path / "q.db", max_jobs=2)
            done = asyncio.Event()

            async def work():
                done.set()

            q.register("work", work)
            await q.start()
            await q.enqueue_job("work")
            await asyncio.wait_for(done.wait(), timeout=5)
            await q.stop()

        loop.run_until_complete(go())
        pending = [t for t in asyncio.all_tasks(loop) if not t.done()]
        assert pending == [], f"worker tasks leaked: {pending}"
    finally:
        loop.close()
