"""Checkpoint / resume for solver state (SURVEY.md §5 "Checkpoint/resume").

The reference lineage saves decision vectors between mesh refinements with
np.savez [R]; the analogue here is saving/loading arbitrary JAX pytrees
(Decision, BatchDecision, Multipliers, SolveStats, ...) as flat .npz
archives keyed by treedef paths — no orbax dependency, fully portable, and
warm-startable across mesh refinements via
:func:`collocfem_tpu.ops.mesh.interpolate_trajectory`.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays as an .npz plus a JSON treedef sidecar key."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load an .npz checkpoint into the structure of pytree ``like``.

    Shapes must match ``like``; the stored treedef string is checked against
    ``like``'s to catch structure drift.
    """
    with np.load(path) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        stored = json.loads(bytes(data["__treedef__"]).decode())
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if stored != str(treedef):
        raise ValueError(
            f"checkpoint treedef mismatch:\n  stored: {stored}\n"
            f"  expected: {treedef}"
        )
    if len(leaves) != len(like_leaves):
        raise ValueError("checkpoint leaf count mismatch")
    import jax.numpy as jnp

    leaves = [
        jnp.asarray(leaf, like_leaf.dtype)
        for leaf, like_leaf in zip(leaves, like_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def warm_start_on_mesh(old_mesh, new_mesh, V_old):
    """Interpolate node values from one mesh onto another (mesh refinement).

    The reference refines meshes and warm-starts from the previous solution
    [SURVEY.md §5]; here the collocation polynomial of the old mesh is
    evaluated at the new mesh's node times.
    """
    from collocfem_tpu.ops.mesh import interpolate_trajectory

    return interpolate_trajectory(old_mesh, V_old, new_mesh.node_times)
