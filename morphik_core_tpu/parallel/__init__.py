from morphik_core_tpu.parallel.mesh import make_mesh, best_mesh, local_device_count  # noqa: F401
