"""Model summaries — the reference's ``print_network``/``torch_summarize``
analogs (src_deformable/models/networks.py:18-23, 44-75)."""

from __future__ import annotations

import jax
import numpy as np


def count_params(params) -> int:
    """Total parameter count of a pytree."""
    return int(sum(np.prod(leaf.shape)
                   for leaf in jax.tree_util.tree_leaves(params)))


def summarize(params, name: str = "model") -> str:
    """Per-leaf shape table + total, as a printable string."""
    lines = [f"{name}:"]
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        lines.append(f"  {key:<60s} {str(leaf.shape):<20s} "
                     f"{int(np.prod(leaf.shape)):>12,d}")
    lines.append(f"Total number of parameters: {count_params(params)}")
    return "\n".join(lines)


def print_network(params, name: str = "model") -> None:
    print(summarize(params, name))
