"""morphik_core_tpu — a TPU-native visual-document retrieval engine.

From-scratch rebuild of the capabilities of morphik-core (reference:
/root/reference) designed TPU-first:

- ColQwen2.5/ColPali late-interaction embedding as a pjit-sharded JAX
  forward over a device mesh (replaces torch/colpali_engine:
  reference core/embedding/colpali_embedding_model.py).
- MaxSim late-interaction scoring as a tiled Pallas TPU kernel
  (replaces the reference's Postgres `max_sim` SQL function and
  torch `score_multi_vector`).
- MUVERA fixed-dimensional encoding (FDE) as a pure JAX transform
  (replaces the reference's C++ `fde/` module).
- An in-process, mesh-sharded vector index (replaces Turbopuffer +
  pgvector).
- A service plane (ingest/retrieve/query API, metadata DB, storage,
  worker queue) with the same public API surface as the reference.
"""

__version__ = "0.1.0"
