"""PyTorch <-> flax checkpoint converter.

[BASELINE]: "checkpoints are interoperable via a converter". The flax
modules were designed so this is a *structural* transform, with no
architecture-specific tables:

- flax path  ``params/step/core/cell_l0/hh/kernel``
  <-> torch key ``step.core.cell_l0.hh.weight``
- Dense kernel [in, out]      <-> Linear weight [out, in]      (transpose)
- Conv kernel  [k, in, out]   <-> Conv1d weight [out, in, k]   (permute)
- biases copy through unchanged.

Gate order needs NO permutation: the flax cells use torch's (r,z,n)/
(i,f,g,o) order by construction (models/cells.py) — the classic silent-
wrongness trap called out in SURVEY.md §7 hard part #5 is closed by the
forward-equivalence test in tests/test_torch_convert.py, not by shape
checks alone.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _to_torch_array(name: str, x: np.ndarray) -> np.ndarray:
    if name == "kernel":
        if x.ndim == 2:
            return x.T
        if x.ndim == 3:  # flax conv [k, in, out] -> torch [out, in, k]
            return np.transpose(x, (2, 1, 0))
        raise ValueError(f"unexpected kernel ndim {x.ndim}")
    return x


def _from_torch_array(name: str, x: np.ndarray) -> np.ndarray:
    if name == "kernel":
        if x.ndim == 2:
            return x.T
        if x.ndim == 3:  # torch [out, in, k] -> flax [k, in, out]
            return np.transpose(x, (2, 1, 0))
        raise ValueError(f"unexpected weight ndim {x.ndim}")
    return x


def _path_to_torch_key(path) -> str:
    parts = [p.key for p in path]
    if parts and parts[0] == "params":
        parts = parts[1:]
    leaf = parts[-1]
    parts[-1] = {"kernel": "weight", "bias": "bias"}.get(leaf, leaf)
    return ".".join(parts)


def flax_to_torch_state_dict(params: Any) -> dict:
    """flax param tree -> {torch_key: torch.Tensor} state dict."""
    import torch

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = path[-1].key
        key = _path_to_torch_key(path)
        out[key] = torch.from_numpy(
            np.ascontiguousarray(_to_torch_array(name, np.asarray(leaf))).copy()
        )
    return out


def torch_state_dict_to_flax(state_dict: dict, template: Any) -> Any:
    """{torch_key: tensor} -> flax param tree shaped like ``template``.

    Every template leaf must be present in the state dict with a matching
    (post-transpose) shape; extra torch keys raise — silent partial loads
    are how converters go wrong.
    """
    paths_and_leaves = jax.tree_util.tree_leaves_with_path(template)
    used = set()
    new_leaves = []
    for path, leaf in paths_and_leaves:
        name = path[-1].key
        key = _path_to_torch_key(path)
        if key not in state_dict:
            raise KeyError(f"torch state dict missing {key!r} for flax path "
                           f"{jax.tree_util.keystr(path)}")
        arr = _from_torch_array(name, state_dict[key].detach().cpu().numpy())
        if arr.shape != leaf.shape:
            raise ValueError(
                f"{key!r}: torch shape {arr.shape} != flax shape {leaf.shape}"
            )
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
        used.add(key)
    extra = set(state_dict) - used
    if extra:
        raise ValueError(f"unconsumed torch keys: {sorted(extra)}")
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_torch_checkpoint(path: str, g_params: Any, d_params: Any) -> None:
    """Write a reference-style torch checkpoint {'generator','discriminator'}."""
    import torch

    torch.save(
        {
            "generator": flax_to_torch_state_dict(g_params),
            "discriminator": flax_to_torch_state_dict(d_params),
        },
        path,
    )


def load_torch_checkpoint(path: str, g_template: Any, d_template: Any) -> tuple:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    return (
        torch_state_dict_to_flax(blob["generator"], g_template),
        torch_state_dict_to_flax(blob["discriminator"], d_template),
    )
