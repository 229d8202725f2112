"""Pack a parameter pytree into one contiguous device buffer.

Motivation: dispatch cost over the axon relay scales with the ARGUMENT
LEAF COUNT of the compiled program — a UNet's ~250 param leaves are
re-marshalled on every call whether passed explicitly or captured by the
jitted closure (see docs/PERF.md / project memory). Packing the tree into
a single flat vector turns that into ONE argument; the unpack inside jit
is compile-time slicing (free at runtime — XLA aliases or fuses the
reshapes).

Exact: pack→unpack is the identity per leaf (dtype-preserving via
bitcast-free same-dtype concatenation per dtype bucket).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_params(tree: Any) -> Tuple[dict, Any]:
    """Flatten `tree` into {dtype_name: 1-D array} buckets + a static spec.

    Returns (buckets, spec); `spec` is hashable-free static data to close
    over (NOT a jit argument)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    order = []
    buckets: dict = {}
    offsets = []
    for i, leaf in enumerate(leaves):
        dt = jnp.asarray(leaf).dtype
        key = dt.name
        start = buckets.get(key, 0)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        offsets.append((key, start, n, tuple(leaf.shape)))
        buckets[key] = start + n
        order.append(i)
    arrays = {k: [] for k in buckets}
    for leaf, (key, _, _, _) in zip(leaves, offsets):
        arrays[key].append(jnp.ravel(jnp.asarray(leaf)))
    packed = {k: jnp.concatenate(v) if v else jnp.zeros((0,))
              for k, v in arrays.items()}
    spec = (treedef, tuple(offsets))
    return packed, spec


def unpack_params(packed: dict, spec) -> Any:
    """Rebuild the original pytree from the packed buckets (jit-safe:
    static slices only)."""
    treedef, offsets = spec
    leaves = []
    for key, start, n, shape in offsets:
        flat = jax.lax.slice_in_dim(packed[key], start, start + n, axis=0)
        leaves.append(flat.reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)
