from morphik_core_tpu.workers.job_queue import JobQueue, Job  # noqa: F401
