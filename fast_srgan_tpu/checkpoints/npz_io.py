"""Native .npz checkpoint format: a '/'-flattened Flax param pytree.

One implementation shared by the CLIs, the graft entry, and the converter
(previously triplicated). Layout: every leaf is stored under its
'/'-joined tree path, e.g. ``params/neck_conv/kernel``.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(flatten_tree(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_npz_params(path: str, params: Dict[str, Any]) -> None:
    """Write a param pytree (with or without the 'params' wrapper)."""
    tree = params if "params" in params else {"params": params}
    # explicit file handle: np.savez(path_str) silently APPENDS '.npz' to
    # extensionless paths, so a save/load round-trip with the same path
    # would read a file that was never written
    with open(path, "wb") as f:
        np.savez(f, **flatten_tree(tree))


def load_npz_params(path: str) -> Dict[str, Any]:
    """Read a param pytree; always returns the {'params': ...} wrapper."""
    tree = unflatten_tree(dict(np.load(path)))
    return tree if "params" in tree else {"params": tree}
