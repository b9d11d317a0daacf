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
        if any(isinstance(p.key, str) and p.key.startswith(("block_", "attn"))
               for p in path):
            raise ValueError(
                "torch checkpoint interop covers the recurrent family "
                "only — the reference has no transformer architecture to "
                "be compatible with (SURVEY.md §2 C8); transformer-family "
                "checkpoints live in orbax"
            )
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


def adam_state_to_torch(opt_state: Any, params: Any) -> dict:
    """optax.adam state -> a name-keyed torch-side Adam state blob.

    Moments live on parameter-shaped tensors, so they transform exactly
    like the parameters (kernel transposes included); torch keys match the
    model state dict. ``step`` is optax's shared update count (torch Adam
    keeps one per parameter but they are all equal under a fixed schedule).
    Use ``adam_blob_to_index_format`` to emit torch.optim.Adam's integer-
    indexed layout for a concrete torch model.
    """
    adam = opt_state[0]  # optax.adam = chain(scale_by_adam, scale); [0] = moments
    return {
        "step": int(adam.count),
        "exp_avg": flax_to_torch_state_dict(adam.mu),
        "exp_avg_sq": flax_to_torch_state_dict(adam.nu),
    }


def adam_state_from_torch(blob: dict, opt_template: Any, params_template: Any) -> Any:
    """Name-keyed Adam blob -> optax.adam state shaped like ``opt_template``."""
    import jax.numpy as jnp

    adam = opt_template[0]
    mu = torch_state_dict_to_flax(dict(blob["exp_avg"]), params_template)
    nu = torch_state_dict_to_flax(dict(blob["exp_avg_sq"]), params_template)
    new_adam = adam._replace(
        count=jnp.asarray(int(blob["step"]), jnp.int32),
        mu=jax.tree.map(lambda t, x: jnp.asarray(x, jnp.asarray(t).dtype), adam.mu, mu),
        nu=jax.tree.map(lambda t, x: jnp.asarray(x, jnp.asarray(t).dtype), adam.nu, nu),
    )
    return (new_adam,) + tuple(opt_template[1:])


def adam_blob_to_index_format(blob: dict, model) -> dict:
    """Name-keyed blob -> torch.optim.Adam.state_dict() integer layout for
    a concrete torch module (index order = model.parameters() order)."""
    import torch

    names = [n for n, _ in model.named_parameters()]
    state = {}
    for i, n in enumerate(names):
        state[i] = {
            "step": torch.tensor(float(blob["step"])),
            "exp_avg": blob["exp_avg"][n],
            "exp_avg_sq": blob["exp_avg_sq"][n],
        }
    return {
        "state": state,
        "param_groups": [{"params": list(range(len(names)))}],
    }


def adam_blob_from_index_format(sd: dict, model) -> dict:
    """torch.optim.Adam.state_dict() -> name-keyed blob (reverse adapter,
    for resuming from a real reference checkpoint)."""
    names = [n for n, _ in model.named_parameters()]
    order = sd["param_groups"][0]["params"]
    step = 0
    exp_avg, exp_avg_sq = {}, {}
    for i, pid in enumerate(order):
        st = sd["state"].get(pid, sd["state"].get(str(pid)))
        if st is None:
            continue
        step = int(st["step"])
        exp_avg[names[i]] = st["exp_avg"]
        exp_avg_sq[names[i]] = st["exp_avg_sq"]
    return {"step": step, "exp_avg": exp_avg, "exp_avg_sq": exp_avg_sq}


def save_torch_checkpoint(
    path: str,
    g_params: Any,
    d_params: Any,
    opt_g: Any = None,
    opt_d: Any = None,
) -> None:
    """Write a reference-style torch checkpoint {'generator',
    'discriminator'[, 'opt_g', 'opt_d']} — optimizer states included when
    given (SURVEY.md §2 C8: reference checkpoints hold G/D *and* optimizer
    states)."""
    import torch

    blob = {
        "generator": flax_to_torch_state_dict(g_params),
        "discriminator": flax_to_torch_state_dict(d_params),
    }
    if opt_g is not None:
        blob["opt_g"] = adam_state_to_torch(opt_g, g_params)
    if opt_d is not None:
        blob["opt_d"] = adam_state_to_torch(opt_d, d_params)
    torch.save(blob, path)


def load_torch_checkpoint(
    path: str,
    g_template: Any,
    d_template: Any,
    opt_g_template: Any = None,
    opt_d_template: Any = None,
) -> tuple:
    """Returns (g, d) or (g, d, opt_g, opt_d) when optimizer templates are
    given and the checkpoint carries optimizer states."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    g = torch_state_dict_to_flax(blob["generator"], g_template)
    d = torch_state_dict_to_flax(blob["discriminator"], d_template)
    if opt_g_template is None and opt_d_template is None:
        return g, d
    opt_g = opt_d = None
    if opt_g_template is not None and "opt_g" in blob:
        opt_g = adam_state_from_torch(blob["opt_g"], opt_g_template, g_template)
    if opt_d_template is not None and "opt_d" in blob:
        opt_d = adam_state_from_torch(blob["opt_d"], opt_d_template, d_template)
    return g, d, opt_g, opt_d
