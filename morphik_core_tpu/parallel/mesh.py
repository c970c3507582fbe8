"""Device mesh construction.

The engine scales by sharding over a `jax.sharding.Mesh`:
  - axis "data":   data-parallel over pages / candidate rows (ICI)
  - axis "model":  tensor-parallel over the tower's hidden dims

This replaces the reference's HTTP fan-out across GPU embedding
endpoints (reference core/embedding/colpali_api_embedding_model.py:135-209)
with XLA collectives over the TPU interconnect.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(shape: Sequence[int], axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Build a mesh of the given logical shape. A single -1 entry is
    inferred from the device count (like a reshape)."""
    devices = np.array(jax.devices())
    n = devices.size
    shape = list(shape)
    if shape.count(-1) > 1:
        raise ValueError("at most one -1 axis")
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        if n % known != 0:
            raise ValueError(f"{n} devices not divisible by {known}")
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    if total > n:
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {n}")
    return Mesh(devices[:total].reshape(shape), axis_names=tuple(axis_names))


def best_mesh(axis_names: Tuple[str, str] = ("data", "model"), model_parallel: int = 1) -> Mesh:
    """Default mesh: all devices data-parallel, optional model axis.

    Multi-host (pod slice): the data axis spans hosts over DCN while the
    model axis stays inside a host's ICI domain —
    `mesh_utils.create_hybrid_device_mesh` orders devices so XLA's
    collectives ride ICI for tensor-parallel all-reduces and only the
    (small) data-parallel traffic crosses DCN. Single-host falls back to
    the plain contiguous mesh."""
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        n_local = jax.local_device_count()
        if model_parallel <= 0 or n_local % model_parallel:
            raise ValueError(
                f"model_parallel={model_parallel} must divide local device count {n_local} "
                "(the model axis must stay inside one host's ICI domain)"
            )
        per_host = (n_local // model_parallel, model_parallel)
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=per_host,
            dcn_mesh_shape=(jax.process_count(), 1),  # data axis spans hosts
        )
        return Mesh(devices, axis_names=tuple(axis_names))
    return make_mesh((-1, model_parallel), axis_names)


def data_sharding(mesh: Mesh, ndim: int, data_axis: str = "data") -> NamedSharding:
    """Shard the leading axis over `data_axis`, replicate the rest."""
    spec = [data_axis] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_colqwen_params(params: dict, mesh: Mesh, model_axis: str = "model") -> dict:
    """Place ColQwen params on the mesh: tensor-parallel shard the text
    decoder's attention/FFN projections over `model_axis`, replicate the
    rest (vision tower is small relative to the 3B decoder). Matches the
    serving spec validated by __graft_entry__.dryrun_multichip."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    out = jax.tree.map(lambda x: jax.device_put(x, repl), params)
    specs = {
        "gate_w": P(None, None, model_axis),
        "up_w": P(None, None, model_axis),
        "down_w": P(None, model_axis, None),
        "q_w": P(None, None, model_axis),
        "k_w": P(None, None, model_axis),
        "v_w": P(None, None, model_axis),
        "o_w": P(None, model_axis, None),
    }
    tl = params["text"]["layers"]
    for k, spec in specs.items():
        leaf = tl[k]
        if isinstance(leaf, dict):  # W8A8 leaf {"q8": (L,K,N) int8, "s": (L,N)}
            out["text"]["layers"][k] = {
                "q8": jax.device_put(leaf["q8"], NamedSharding(mesh, spec)),
                # per-channel scales follow the output-channel sharding
                "s": jax.device_put(leaf["s"], NamedSharding(mesh, P(spec[0], spec[2]))),
            }
        else:
            out["text"]["layers"][k] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return out


def colqwen_image_shardings(mesh: Mesh, data_axis: str = "data"):
    """NamedShardings for colqwen_image_forward's batched inputs + output."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return {
        "patches": NamedSharding(mesh, P(data_axis, None, None)),
        "cos_v": NamedSharding(mesh, P()),
        "sin_v": NamedSharding(mesh, P()),
        "input_ids": NamedSharding(mesh, P(data_axis, None)),
        "cos_t": NamedSharding(mesh, P(data_axis, None, None)),
        "sin_t": NamedSharding(mesh, P(data_axis, None, None)),
        "out": NamedSharding(mesh, P(data_axis, None, None)),
    }
