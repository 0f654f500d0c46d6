"""Device mesh construction — the single distributed-communication backbone.

The reference stacks four NCCL client layers (FSDP wrappers fsdp.py:10-32,
Accelerate DDP, raw dist.barrier() calls, xfuser sequence-parallel groups,
SURVEY §2.4/§5.8). TPU-natively all of that collapses into ONE
`jax.sharding.Mesh` with axes:

    data : batch / gradient data-parallelism (reference: Accelerate DDP)
    fsdp : parameter sharding (reference: torch FSDP FULL_SHARD)
    sp   : sequence (token-axis) parallelism (reference: xDiT Ulysses+ring)

Collectives are emitted by GSPMD from sharding annotations; barriers are
implicit in SPMD. ICI carries intra-slice traffic; DCN multi-slice data
parallelism — both chosen by the XLA runtime, not by this code.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_SP = "sp"
MESH_AXES = (AXIS_DATA, AXIS_FSDP, AXIS_SP)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Degrees for each mesh axis; -1 on `data` means 'absorb the rest'."""

    data: int = -1
    fsdp: int = 1
    sp: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        data = self.data
        if data == -1:
            denom = self.fsdp * self.sp
            if n_devices % denom != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by fsdp*sp={denom}")
            data = n_devices // denom
        if data * self.fsdp * self.sp != n_devices:
            raise ValueError(
                f"mesh {data}x{self.fsdp}x{self.sp} != {n_devices} devices")
        return MeshConfig(data, self.fsdp, self.sp)


def create_mesh(
    config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the (data, fsdp, sp) mesh over the given (or all) devices.

    Axis order is chosen so that `sp` — the highest-bandwidth-demand axis
    (ring attention KV rotation every block) — is innermost and therefore
    maps to physically adjacent chips on a TPU slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    cfg = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(cfg.data, cfg.fsdp, cfg.sp)
    return Mesh(dev_array, MESH_AXES)


def local_mesh() -> Mesh:
    """Single-process mesh with everything on `data` (tests, single chip)."""
    return create_mesh(MeshConfig())


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


# ---------------------------------------------------------------------------
# current-mesh context (lets deep model code reach the mesh for shard_map
# collectives — e.g. ring attention — without threading it through every
# call signature)

import contextlib as _contextlib

_CURRENT_MESH: list = []


@_contextlib.contextmanager
def use_mesh(mesh: Mesh):
    _CURRENT_MESH.append(mesh)
    try:
        yield mesh
    finally:
        _CURRENT_MESH.pop()


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH[-1] if _CURRENT_MESH else None
