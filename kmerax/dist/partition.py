"""Partition-rule engine (SURVEY.md §2 #21): regex -> PartitionSpec matching
and shard/gather helpers for arbitrary state pytrees (spectrum checkpoints,
bench states). Freshly written; same role as the public t5x/fmengine-style
rule matchers (SNIPPETS.md patterns)."""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _tree_paths(tree):
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names = ["/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in path) for path, _ in paths_leaves]
    leaves = [l for _, l in paths_leaves]
    return names, leaves, treedef


def match_partition_rules(rules, tree):
    """rules: [(regex, PartitionSpec)]; returns a pytree of PartitionSpec.

    Scalars (0-d or size-1) are never partitioned. A leaf matching no rule
    raises — silent replication hides sharding bugs.
    """
    names, leaves, treedef = _tree_paths(tree)
    specs = []
    for name, leaf in zip(names, leaves):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 0 or int(np.prod(shape)) == 1:
            specs.append(P())
            continue
        for rule, spec in rules:
            if re.search(rule, name):
                specs.append(spec)
                break
        else:
            raise ValueError(f"no partition rule matches leaf {name!r}")
    return jax.tree_util.tree_unflatten(treedef, specs)


def make_shard_fns(mesh: Mesh, spec_tree):
    """Pytree of fns placing host arrays onto the mesh with the given specs."""
    return jax.tree_util.tree_map(
        lambda spec: (lambda x: jax.device_put(
            x, NamedSharding(mesh, spec))),
        spec_tree, is_leaf=lambda s: isinstance(s, P))


def make_gather_fns(spec_tree):
    """Pytree of fns pulling device arrays back to host numpy."""
    return jax.tree_util.tree_map(
        lambda spec: (lambda x: np.asarray(jax.device_get(x))),
        spec_tree, is_leaf=lambda s: isinstance(s, P))


def shard_tree(mesh: Mesh, tree, rules):
    specs = match_partition_rules(rules, tree)
    fns = make_shard_fns(mesh, specs)
    return jax.tree_util.tree_map(lambda f, x: f(x), fns, tree)
