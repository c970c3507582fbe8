"""Crash/restart durability: queued jobs survive a process "restart"
(new service stack over the same sqlite files) and complete; persisted
vector indexes reload (reference arq + Redis persistence and re-queue
semantics, SURVEY.md §5 'checkpoint/resume')."""

import asyncio

from morphik_core_tpu.config import Settings
from morphik_core_tpu.models.schemas import AuthContext, EntityType
from morphik_core_tpu.services_init import build_services

AUTH = AuthContext(
    entity_type=EntityType.DEVELOPER, entity_id="r",
    permissions={"read", "write", "admin"}, user_id="r",
)


def _settings(root):
    return Settings.model_validate(
        {
            "storage": {"storage_path": str(root / "storage")},
            "database": {"path": str(root / "db.sqlite")},
            "vector_store": {
                "index_path": str(root / "index"),
                "fde_num_repetitions": 4,
                "fde_num_simhash_projections": 3,
                "fde_projection_dimension": 8,
            },
        }
    )


def test_queued_job_survives_restart(tmp_path):
    loop = asyncio.new_event_loop()

    async def first_life():
        services = build_services(_settings(tmp_path))
        await services.database.initialize()
        # enqueue WITHOUT starting the queue worker: simulates a crash
        # right after accepting the upload
        doc = await services.ingestion_service.ingest_file_content(
            b"Durable payload: the answer is 7 lemons.", "d.txt", {}, AUTH, use_colpali=False
        )
        await services.job_queue.enqueue_job(
            "process_ingestion_job",
            document_id=doc.external_id,
            auth=AUTH.model_dump(mode="json"),
            use_colpali=False,
        )
        assert services.job_queue.pending_count() == 1
        return doc.external_id

    doc_id = loop.run_until_complete(first_life())

    async def second_life():
        services = build_services(_settings(tmp_path))
        await services.initialize()  # starts the worker; resumes the job
        for _ in range(450):
            doc = await services.database.get_document(doc_id, AUTH)
            if doc.system_metadata.get("status") in ("completed", "failed"):
                break
            await asyncio.sleep(0.2)
        assert doc.system_metadata["status"] == "completed"
        res = await services.document_service.retrieve_chunks(
            "lemons answer", AUTH, k=1, use_colpali=False
        )
        assert res and "7 lemons" in res[0].content
        await services.shutdown()

    loop.run_until_complete(second_life())

    async def third_life():
        # indexes persisted at shutdown reload on the next boot
        services = build_services(_settings(tmp_path))
        await services.database.initialize()
        res = await services.document_service.retrieve_chunks(
            "lemons answer", AUTH, k=1, use_colpali=False
        )
        assert res and "7 lemons" in res[0].content

    loop.run_until_complete(third_life())
