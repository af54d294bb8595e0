"""Production device-mesh plan: the ``(clients, data)`` SPMD layout.

The reference spends its parallelism on a thread pool over clients plus
optional ``torch.nn.DataParallel`` inside a client (SURVEY.md §2.8 P1/P3,
fedavgserver.py:536, fedavgclient.py:60-61).  TPU-native equivalent: one
``jax.sharding.Mesh`` whose

* ``clients`` axis shards the stacked client parameter/optimizer/data trees
  on their leading axis — each device trains a subset of the round's
  sampled clients;
* ``data`` axis (optional) shards every client's per-step batch, giving
  intra-client data parallelism; XLA inserts the all-gathers/reductions the
  in-batch losses need (the collectives ride ICI).

Evaluation batches shard over *all* devices (the flattened mesh) so central
eval and retrieval feature extraction no longer idle every chip but one.

``--mesh_shape``/``--mesh_axes`` pick the layout; the default is a 1-D
``clients`` mesh over all visible devices.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

VALID_AXES = ("clients", "data", "model")


@dataclass(frozen=True)
class MeshPlan:
    """A (possibly absent) device mesh plus the layout rules used by the
    servers, the evaluators and the driver dryrun."""

    mesh: Optional[Mesh] = None

    # ------------------------------------------------------------ factory --
    @staticmethod
    def build(mesh_shape: Optional[Sequence[int]] = None,
              mesh_axes: Optional[Sequence[str]] = None,
              devices: Optional[Sequence] = None) -> "MeshPlan":
        devs = list(devices) if devices is not None else jax.devices()
        if mesh_shape:
            axes = list(mesh_axes or ())
            if len(axes) != len(mesh_shape):
                if not axes or axes == ["clients"]:   # unset / CLI default
                    axes = list(VALID_AXES[:len(mesh_shape)])
                else:
                    raise ValueError(f"mesh_axes {axes} does not match "
                                     f"mesh_shape {mesh_shape}")
            for a in axes:
                if a not in VALID_AXES:
                    raise ValueError(f"unknown mesh axis {a!r}; "
                                     f"valid: {VALID_AXES}")
            if "clients" not in axes:
                raise ValueError("mesh_axes must include 'clients'")
            n = int(np.prod(mesh_shape))
            if n > len(devs):
                raise ValueError(f"mesh_shape {mesh_shape} needs {n} devices "
                                 f"but only {len(devs)} are visible")
            if n == 1:
                return MeshPlan(None)
            grid = np.array(devs[:n]).reshape(tuple(mesh_shape))
            return MeshPlan(Mesh(grid, tuple(axes)))
        if mesh_axes and list(mesh_axes) != ["clients"]:
            # --mesh_axes without --mesh_shape would otherwise be
            # silently ignored and train under a different layout than
            # the user configured
            raise ValueError(
                f"--mesh_axes {list(mesh_axes)} requires --mesh_shape "
                "(one size per axis)")
        if len(devs) > 1:
            return MeshPlan(Mesh(np.array(devs), ("clients",)))
        return MeshPlan(None)

    # ---------------------------------------------------------- properties --
    @property
    def n_devices(self) -> int:
        return self.mesh.size if self.mesh is not None else 1

    @property
    def clients_axis(self) -> int:
        return self.mesh.shape["clients"] if self.mesh is not None else 1

    @property
    def data_axis(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.shape.get("data", 1)

    @property
    def model_axis(self) -> int:
        """Tensor-parallel axis size (1 = TP off)."""
        if self.mesh is None:
            return 1
        return self.mesh.shape.get("model", 1)

    # ------------------------------------------------------------- padding --
    def pad_clients(self, n: int) -> int:
        """Stacked client axes must divide the mesh's clients axis."""
        m = self.clients_axis
        return ((n + m - 1) // m) * m

    def pad_eval_batch(self, b: int) -> int:
        """Eval batches shard over the flattened mesh."""
        m = self.n_devices
        return ((b + m - 1) // m) * m

    # ------------------------------------------------------------ sharding --
    # Megatron-style tensor-parallel layout for the MAT block kernels
    # (SURVEY.md §2.8 P5: optional param sharding for larger MATs): fc1/qkv
    # column-parallel (output features sharded), fc2/proj row-parallel
    # (input features sharded) — XLA inserts the one psum per sublayer the
    # pattern needs; the word-embedding table shards its vocabulary rows.
    # Leaf names are matched on the stacked [n_clients, depth, ...] trees.
    _TP_RULES = {
        "fc1_kernel": (3, "model"), "fc1_bias": (2, "model"),
        "qkv_kernel": (3, "model"), "qkv_bias": (2, "model"),
        "fc2_kernel": (2, "model"), "proj_kernel": (2, "model"),
        "fc1_aux": (3, "model"), "qkv_aux": (3, "model"),
        "fc2_aux": (2, "model"), "proj_aux": (2, "model"),
        "word": (1, "model"),
    }

    def _leaf_spec(self, path, leaf) -> P:
        if self.model_axis > 1:
            name = path[-1].key if path and hasattr(path[-1], "key") else None
            rule = self._TP_RULES.get(name)
            if rule is not None:
                dim, axis = rule
                if leaf.ndim > dim and leaf.shape[dim] % self.model_axis == 0:
                    parts = [None] * leaf.ndim
                    parts[0] = "clients"
                    parts[dim] = axis
                    return P(*parts)
        return P("clients")

    def shard_client_tree(self, tree):
        """Leading axis = clients; TP-ruled block kernels additionally
        shard a feature dimension over the ``model`` axis; everything else
        replicates over data/model."""
        if self.mesh is None:
            return tree
        if self.model_axis > 1:
            return jax.tree_util.tree_map_with_path(
                lambda p, x: jax.device_put(
                    x, NamedSharding(self.mesh, self._leaf_spec(p, x))),
                tree)
        return jax.device_put(tree, NamedSharding(self.mesh, P("clients")))

    def shard_chunk(self, chunk: Dict, batch_axis: int = 2) -> Dict:
        """Training chunk [n_clients, S, B, ...]: clients on axis 0, the
        per-step batch on ``batch_axis`` over the data axis (when present
        and divisible); step_valid-style [n, S] arrays shard clients only."""
        if self.mesh is None:
            return chunk
        cs = NamedSharding(self.mesh, P("clients"))
        d = self.data_axis
        out = {}
        for k, v in chunk.items():
            if d > 1 and v.ndim > batch_axis and v.shape[batch_axis] % d == 0:
                parts = [None] * v.ndim
                parts[0] = "clients"
                parts[batch_axis] = "data"
                out[k] = jax.device_put(v, NamedSharding(self.mesh, P(*parts)))
            else:
                out[k] = jax.device_put(v, cs)
        return out

    def shard_eval_batch(self, batch: Dict) -> Dict:
        """Evaluation batch [B, ...]: B shards over every mesh device
        (flattened axes), so eval uses the whole pod instead of one chip.
        Arrays whose batch dim doesn't divide are replicated."""
        if self.mesh is None:
            return batch
        n = self.n_devices
        flat = NamedSharding(self.mesh, P(self.mesh.axis_names))
        rep = NamedSharding(self.mesh, P())
        return {k: jax.device_put(v, flat if v.shape[0] % n == 0 else rep)
                for k, v in batch.items()}

    def shard_eval_chunk(self, idxs):
        """[K, B] eval index chunk for the chunked extraction program:
        B (dim 1) shards over the flattened mesh, K stays whole (each
        scan step is one mesh-wide batch)."""
        if self.mesh is None:
            return idxs
        sh = NamedSharding(self.mesh, P(None, self.mesh.axis_names)) \
            if idxs.shape[1] % self.n_devices == 0 \
            else NamedSharding(self.mesh, P())
        return jax.device_put(idxs, sh)

    def replicate(self, tree):
        if self.mesh is None:
            return tree
        return jax.device_put(tree, NamedSharding(self.mesh, P()))

    # ------------------------------------------------------- multi-process --
    # Under jax.distributed (multi-host DCN scale-out, main.py --dist_*)
    # every process runs the same host program over one global mesh;
    # device arrays sharded across processes are not fully addressable,
    # so host readbacks need a cross-process gather and persisted state
    # must be replicated before a single process serializes it.

    @property
    def is_multiprocess(self) -> bool:
        return jax.process_count() > 1

    def to_host(self, x) -> np.ndarray:
        """Device -> host readback that works on any sharding.  On a
        multi-process mesh a sharded array is gathered across processes
        first — a COLLECTIVE: call from every process (all server paths
        that read metrics/features back run identically on each host)."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)

    def ensure_addressable(self, tree):
        """Replicate a pytree over the global mesh when running
        multi-process, so process-0-gated consumers (checkpoint save,
        finalize .pt export) can ``np.asarray`` its leaves without a
        collective.  No-op single-process — the hot path is untouched."""
        if self.mesh is None or not self.is_multiprocess:
            return tree
        return jax.device_put(tree, NamedSharding(self.mesh, P()))
