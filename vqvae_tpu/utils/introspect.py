"""Introspection / observability utilities.

TPU-native replacements for the reference's NVIDIA support utils
(…/stylegan2_discriminator/utils/misc.py — SURVEY §5):

- ``print_module_summary``  -> ``param_summary`` (param/byte table per
  top-level module, misc.py:206-277)
- ``check_ddp_consistency`` -> ``check_replication`` (verifies a pytree is
  bit-identical across mesh devices, misc.py:191-200 — the reference ships
  this but never calls it; here it runs cheaply after checkpoint restore)
- ``profiled_function``     -> ``named_scope`` re-export + ``trace`` context
  manager around jax.profiler (misc.py:104-110's record_function scopes)
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def param_summary(params: Any, title: str = "params") -> str:
    """Human-readable per-submodule parameter table."""
    lines = [f"{title:<40} {'params':>12} {'bytes':>14}"]
    total_n = total_b = 0

    def count(tree):
        leaves = jax.tree.leaves(tree)
        n = sum(int(np.prod(l.shape)) for l in leaves)
        b = sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves)
        return n, b

    if isinstance(params, dict):
        for name, sub in sorted(params.items()):
            n, b = count(sub)
            total_n += n
            total_b += b
            lines.append(f"{name:<40} {n:>12,} {b:>14,}")
    else:
        total_n, total_b = count(params)
    lines.append(f"{'TOTAL':<40} {total_n:>12,} {total_b:>14,}")
    return "\n".join(lines)


def check_replication(tree: Any, mesh=None, atol: float = 0.0) -> None:
    """Assert every leaf is identical on all devices it lives on.

    The mesh-era check_ddp_consistency: fully-replicated arrays are fetched
    per-device and compared bitwise. Raises AssertionError naming the first
    divergent leaf.
    """
    leaves, treedef = jax.tree.flatten(tree)
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for (path, _), leaf in zip(paths, leaves):
        if not isinstance(leaf, jax.Array):
            continue
        shards = getattr(leaf, "addressable_shards", None)
        if shards is None or len(shards) <= 1:
            continue
        if not leaf.is_fully_replicated:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            got = np.asarray(s.data)
            if atol == 0.0:
                ok = np.array_equal(ref, got)
            else:
                ok = np.allclose(ref, got, atol=atol)
            if not ok:
                name = "/".join(str(p) for p in path)
                raise AssertionError(
                    f"replication mismatch at {name}: device "
                    f"{shards[0].device} vs {s.device}")
