"""Parameter/activation sharding rules for ColVLM on a (dp, tp) mesh.

Megatron-style tensor parallelism expressed as GSPMD shardings (XLA inserts
the collectives over ICI):

- attention q/k/v kernels: output (head) dim over 'tp'; o kernel: input over 'tp'
- MLP gate/up: output over 'tp'; down: input over 'tp'
- token embedding: vocab over 'tp'
- norms, positions, projection head: replicated
- batch ('dp') shards the data; loss terms all-reduce via psum under jit

The rules are path-name based so they apply to any ColVLMConfig size.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path: str, ndim: int) -> P:
    # nn.scan-stacked decoder params carry a leading [L] stage dim that
    # pipeline parallelism shards over 'pp'; the per-layer rule applies to
    # the remaining dims.
    if "layers_scan" in path:
        inner = _spec_for_path(path.replace("layers_scan/", ""), ndim - 1)
        return P("pp", *tuple(inner))
    last = path.split("/")[-1]
    if last in ("gate_kernel", "up_kernel"):  # MoE experts [E, h, mlp]
        return P("ep", None, "tp")
    if last == "down_kernel":  # [E, mlp, h]
        return P("ep", "tp", None)
    if ndim == 1:  # biases, norm scales
        return P()
    leaf = path.split("/")[-2] if "/" in path else path
    if leaf in ("q", "k", "v", "gate", "up", "fc1"):
        return P(None, "tp") if ndim == 2 else P(*((None,) * (ndim - 1)), "tp")
    if leaf in ("o", "down", "fc2"):
        return P("tp", None) if ndim == 2 else P("tp", *((None,) * (ndim - 1)))
    if leaf in ("tok_embed",) or path.endswith("embedding"):
        return P("tp", None)
    return P(*((None,) * ndim))  # replicate (patch_embed, proj, pos, connector)


def _path_str(path) -> str:
    parts = []
    for pp in path:
        key = getattr(pp, "key", None)
        if key is None:
            key = getattr(pp, "name", str(pp))
        parts.append(str(key))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings matching ``params`` (by abstract shape)."""

    def rule(path, leaf):
        spec = _spec_for_path(_path_str(path), getattr(leaf, "ndim", 0))
        # Drop axes that don't divide evenly (e.g. tiny test configs)
        shape = getattr(leaf, "shape", ())
        fixed = []
        for dim_size, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
            if axis is None or axis not in mesh.shape:
                # axis absent from this mesh (e.g. dp-only serving mesh) or
                # explicitly replicated
                fixed.append(None)
            else:
                n = int(mesh.shape[axis])
                fixed.append(axis if dim_size % n == 0 else None)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batch arrays."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
