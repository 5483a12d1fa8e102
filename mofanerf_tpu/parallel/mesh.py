"""Device mesh + sharding rules.

The TPU-native replacement for the reference's `torch.nn.DataParallel`
(run_train.py:272-276, run_fit.py:166-168): a `jax.sharding.Mesh` with a
`data` axis for ray-batch sharding and a `model` axis for tensor-parallel
sharding of the fat fine MLP (10x1024, tools/config_parser.py:21-24).
Gradients reduce over ICI via the collectives XLA inserts for the sharded
jit — no explicit NCCL-style calls (SURVEY.md section 2.7).

The same code path scales 1 chip -> v5e-8 -> multi-host: only the mesh
construction changes.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Default: all devices on the data axis (pure ray/batch parallelism).
    n_model > 1 carves a tensor-parallel axis for the fine MLP's width.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def make_multihost_mesh(n_model: int = 1) -> Mesh:
    """Multi-host mesh: a `dcn` axis across processes (data-parallel over
    the data-center network) x per-host (data, model) over ICI.

    Single-process fallback: dcn axis of size 1 — the same program runs
    unchanged on one host or a multi-host pod slice (SURVEY.md section 2.7's
    scale-out story: gradients psum over ICI first, then DCN).
    """
    import numpy as np

    n_proc = jax.process_count()
    devices = jax.devices()
    if n_proc > 1:
        from jax.experimental import mesh_utils

        per_host = len(devices) // n_proc
        mesh_arr = mesh_utils.create_hybrid_device_mesh(
            (per_host // n_model, n_model), (n_proc, 1), devices
        )
        # axes: (dcn*data, model) -> reshape to (dcn, data, model)
        mesh_arr = mesh_arr.reshape(n_proc, per_host // n_model, n_model)
    else:
        n_data = len(devices) // n_model
        mesh_arr = np.asarray(devices[: n_data * n_model]).reshape(1, n_data, n_model)
    return Mesh(mesh_arr, axis_names=("dcn", "data", "model"))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a ray batch [N, ...] over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Declarative tensor-parallel policy for the fine field (models/field.py
# layout). Keys are the EXACT leaf names of hidden weight matrices [in, out]
# and their biases; the output dim (trunk width W or view width W/2) shards
# over 'model'. The tiny output heads stay replicated: 'alpha' (W -> 1
# density) and the view stage's final 'rgb' dense (W/2 -> 3).
_TP_WEIGHT_KEYS = frozenset({
    "w",             # generic dense layers ('layers' / 'mid' / 'post' lists)
    "w_pts", "w_exp",                     # xyz encoder input blocks
    "w_feat0", "w_code0",                 # trunk layer 0 blocks
    "w_skip_code", "w_skip_feat", "w_skip_h",  # trunk skip-layer blocks
    "w_dirs", "w_feat",                   # view stage input blocks
})
_TP_BIAS_KEYS = frozenset({"b", "b0", "b_skip"})


def _path_keys(path: tuple) -> list:
    """Pytree key path -> list of dict keys / sequence indices."""
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(p.key)          # DictKey
        elif hasattr(p, "idx"):
            out.append(p.idx)          # SequenceKey (lists of dense layers)
        else:                          # pragma: no cover - future key kinds
            out.append(str(p))
    return out


def shard_params_rules(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Produce a NamedSharding pytree matching `params`.

    Policy (declarative, by leaf NAME — not by shape heuristics): inside the
    'fine' subtree, hidden weight matrices (`_TP_WEIGHT_KEYS`) shard their
    output dim over 'model' and the matching biases (`_TP_BIAS_KEYS`) shard
    over 'model'; the scalar-output heads ('alpha', the view stage's 'rgb'
    dense) and everything outside 'fine' (small coarse net, codes, encoder)
    replicate. Leaves whose last dim does not divide the model axis
    replicate — sharding must never change numerics or crash on odd dims.
    With n_model == 1 this degenerates to full replication.
    """
    n_model = max(1, mesh.shape["model"])

    def spec_for(path: tuple, leaf) -> NamedSharding:
        keys = _path_keys(path)
        if n_model == 1 or "fine" not in keys:
            return NamedSharding(mesh, P())
        # tiny output heads: alpha (W->1) and the view stage's rgb (W/2->3)
        if "alpha" in keys or ("view" in keys and "rgb" in keys):
            return NamedSharding(mesh, P())
        leaf_key = keys[-1]
        if (not hasattr(leaf, "ndim") or leaf.ndim < 1
                or leaf.shape[-1] % n_model != 0):
            return NamedSharding(mesh, P())
        if leaf_key in _TP_WEIGHT_KEYS and leaf.ndim == 2:
            return NamedSharding(mesh, P(None, "model"))
        if leaf_key in _TP_BIAS_KEYS and leaf.ndim == 1:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
