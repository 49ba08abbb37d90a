"""Weight-decay masking (reference: nunif/training/weight_decay_config.py).

The reference splits params into decay/no-decay groups (bias, norm scales,
embeddings, position bias tables excluded).  With optax this is a mask
pytree passed to ``optax.add_decayed_weights``/``adamw``.
"""
from __future__ import annotations

import jax

NO_DECAY_NAMES = (
    "bias", "scale", "relative_position_bias_table", "embedding", "pos_embed",
    # FrozenBatchNorm running statistics live in the params tree (zero
    # gradient in train mode); weight decay must never shrink them
    "mean", "var",
)


def wd_mask(params):
    """True = apply weight decay. 1-D params and known no-decay names are
    excluded, like the reference's configure_adamw grouping."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path, leaf):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if any(n in NO_DECAY_NAMES for n in names):
            return False
        return getattr(leaf, "ndim", 0) >= 2

    leaves = [(path, decide(path, leaf)) for path, leaf in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [d for _, d in leaves])
