"""Server entry: `python -m morphik_core_tpu.api.server [config.toml]`
(the reference's start_server.py: boots services, worker pool, HTTP)."""

from __future__ import annotations

import asyncio
import logging
import sys

from morphik_core_tpu.api.app import build_app
from morphik_core_tpu.api.http import HTTPServer
from morphik_core_tpu.config import get_settings
from morphik_core_tpu.services_init import build_services

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s")
logger = logging.getLogger(__name__)


async def main(config_path: str | None = None) -> None:
    settings = get_settings(config_path)
    services = build_services(settings)
    await services.initialize()
    router = build_app(services)
    server = HTTPServer(router, settings.api.host, settings.api.port)
    logger.info("morphik-core-tpu serving on %s:%d", settings.api.host, settings.api.port)

    # Graceful drain on SIGTERM/SIGINT: stop accepting, let the running
    # ingestion job finish (queued jobs persist in sqlite and resume on
    # next boot), snapshot indexes.
    import signal

    stop = asyncio.Event()
    loop = asyncio.get_running_loop()
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            loop.add_signal_handler(sig, stop.set)
        except NotImplementedError:  # non-unix
            pass
    await server.start()
    try:
        await stop.wait()
        logger.info("shutdown signal received; draining")
    finally:
        await server.stop()
        await services.shutdown()
        logger.info("shutdown complete")


if __name__ == "__main__":
    asyncio.run(main(sys.argv[1] if len(sys.argv) > 1 else None))
