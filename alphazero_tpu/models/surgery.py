"""Model surgery: grow a trained ViT to more transformer blocks.

The reference's ``expand_transformer_layers`` (main.py:99-120) builds a
deeper ``Net`` and copies every matching parameter from the old state_dict,
leaving newly added blocks randomly initialized.  Same semantics here on
flax param trees: block names (``block_{i}``) match by name, so existing
depths transfer and new depths keep their fresh initialization.
"""

from __future__ import annotations

import dataclasses

import jax

from alphazero_tpu.config import ModelConfig
from alphazero_tpu.models import build_model, init_params


def expand_vit_depth(cfg: ModelConfig, env, params, new_depth: int, rng):
    """Return (new_cfg, new_model, new_params) with ``new_depth`` blocks.

    Parameters present in both trees (embedding, existing blocks, heads,
    final norm) are copied from ``params``; blocks ``>= cfg.depth`` keep
    their random init (main.py:110-118 semantics).
    """
    if new_depth < cfg.depth:
        raise ValueError("can only grow depth, not shrink")
    new_cfg = dataclasses.replace(cfg, depth=new_depth)
    new_model = build_model(new_cfg, env)
    new_params = init_params(new_model, env, rng)

    def merge(new_tree, old_tree):
        out = dict(new_tree)
        for k, v in old_tree.items():
            if k not in out:
                continue
            if isinstance(v, dict):
                out[k] = merge(out[k], v)
            else:
                if out[k].shape == v.shape:
                    out[k] = v
        return out

    merged = merge(jax.tree.map(lambda x: x, new_params), params)
    return new_cfg, new_model, merged
