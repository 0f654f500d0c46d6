"""Training-mesh orchestration shared by the training CLIs.

The reference exposes distributed training through per-trainer flags
(--ulysses_size/--ring_size on seaweed_apt/distilled_trainer.py:370-371)
plus an FSDP wrapper (wan/distributed/fsdp.py:10-32). TPU-natively those
collapse into one plan built from --fsdp_size/--sp_size: a (data, fsdp,
sp) mesh, FSDP PartitionSpecs on every state leaf, a batch sharding on
`data`, and the ring/shard_map attention route (the ONLY attention path
that GSPMD can partition — a bare Pallas call inside a mesh-jit fails
with "Mosaic kernels cannot be automatically partitioned",
REPORTS/memory_14B.md). Every training CLI builds a `TrainMeshPlan` and
threads its fields into the jitted step; with fsdp=sp=1 the plan is a
no-op passthrough so single-chip runs are unchanged.
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omnihuman_tpu.parallel.mesh import MeshConfig, create_mesh, use_mesh
from omnihuman_tpu.parallel.partition import shard_params


@dataclasses.dataclass
class TrainMeshPlan:
    """Everything a training CLI needs to run its step on a mesh."""

    mesh: Optional[Mesh]
    attn_impl: str                      # "ring" on a mesh, else "auto"
    token_sharding: Optional[NamedSharding]
    batch_sharding: Optional[NamedSharding]

    @classmethod
    def from_sizes(cls, fsdp_size: int = 1, sp_size: int = 1,
                   data_size: int = -1) -> "TrainMeshPlan":
        if fsdp_size <= 1 and sp_size <= 1 and data_size in (-1, 1):
            return cls(None, "auto", None, None)
        mesh = create_mesh(MeshConfig(data=data_size, fsdp=fsdp_size,
                                      sp=sp_size))
        return cls(
            mesh=mesh,
            attn_impl="ring",
            token_sharding=NamedSharding(mesh, P("data", "sp", None)),
            batch_sharding=NamedSharding(mesh, P("data")),
        )

    # -- helpers -------------------------------------------------------------

    @property
    def active(self) -> bool:
        return self.mesh is not None

    @property
    def sp(self) -> int:
        return 1 if self.mesh is None else int(self.mesh.shape.get("sp", 1))

    @property
    def data(self) -> int:
        return 1 if self.mesh is None else int(self.mesh.shape.get("data", 1))

    def seq_len(self, n_tokens: int) -> int:
        """Padded token length: sp-divisible (ring shards tokens evenly)
        and 1024-flash-block aligned at flagship lengths — same rule as
        WanT2V.seq_len_for."""
        align = (int(np.lcm(self.sp, 1024)) if n_tokens >= 4096
                 else max(self.sp, 1))
        return int(math.ceil(n_tokens / align) * align)

    def check_batch(self, batch_size: int) -> None:
        if batch_size % self.data != 0:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by the data "
                f"mesh axis ({self.data}); pass a multiple or shrink "
                "--fsdp_size/--sp_size")

    def shard_tree(self, tree: Any) -> Any:
        """FSDP-place a state/params PyTree (no-op without a mesh)."""
        if self.mesh is None:
            return tree
        return shard_params(tree, self.mesh)

    def put_batch(self, batch: Any) -> Any:
        """Shard a host batch on the data axis (no-op without a mesh).

        Pose heatmaps [B, K, F, H, W] additionally shard H over `sp`:
        at 308 keypoints × full spatial res the tensor is GiB-scale
        (the omni-14B AOT OOM driver) and the guider is a conv stack,
        which GSPMD spatially partitions with halo exchanges."""
        if self.mesh is None:
            return batch

        def put(key, x):
            sh = self.batch_sharding
            if (key == "pose" and getattr(x, "ndim", 0) == 5
                    and x.shape[3] % self.sp == 0):
                sh = NamedSharding(self.mesh,
                                   P("data", None, None, "sp", None))
            return jax.device_put(x, sh)

        if isinstance(batch, dict):
            return {k: put(k, v) for k, v in batch.items()}
        return jax.tree.map(lambda x: jax.device_put(
            x, self.batch_sharding), batch)

    def mesh_context(self):
        """Context manager activating the mesh for shard_map attention
        (parallel.mesh.use_mesh) around traced step calls."""
        if self.mesh is None:
            return contextlib.nullcontext()
        return use_mesh(self.mesh)

    def describe(self) -> str:
        if self.mesh is None:
            return "single-device (no mesh)"
        return f"mesh {dict(self.mesh.shape)} attn=ring"


def add_mesh_args(parser) -> None:
    """The shared --fsdp_size/--sp_size/--remat_group CLI surface
    (reference: --ulysses_size/--ring_size, distilled_trainer.py:370-371)."""
    parser.add_argument(
        "--fsdp_size", type=int, default=1,
        help="parameter-sharding degree (fsdp mesh axis); e.g. the "
             "validated 1.3B distillation config is --fsdp_size 2 "
             "(REPORTS/memory_14B.md)")
    parser.add_argument(
        "--sp_size", type=int, default=1,
        help="sequence-parallel degree (sp mesh axis, ring attention)")
    parser.add_argument(
        "--remat_group", type=int, default=0,
        help="grouped two-level remat segment size (0 = per-block "
             "checkpointing; the validated 1.3B mesh config uses 6, "
             "14B uses 8 — REPORTS/memory_14B.md)")


def resolve_remat(remat_group: int, num_layers: int):
    """CLI remat flag → wan_model_forward remat arg (int group or True)."""
    if remat_group and remat_group > 1:
        if num_layers % remat_group != 0:
            raise ValueError(
                f"--remat_group {remat_group} must divide num_layers "
                f"{num_layers}")
        return int(remat_group)
    return True
