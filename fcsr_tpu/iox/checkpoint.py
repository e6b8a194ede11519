"""Pytree checkpointing.

The reference checkpoints via ``torch.save(state_dict)`` / whole-model
pickles and in-memory best-state deep copies (ref: utils/training.py:140-153,
training_gsr.ipynb cell-6).  Here params/optimizer pytrees serialize with
flax msgpack (safe, no pickle) to a single file.
"""

from __future__ import annotations

import os

from flax import serialization

__all__ = ["save_pytree", "load_pytree"]


def save_pytree(tree, path: str) -> None:
    data = serialization.to_bytes(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(template, path: str):
    """Restore a pytree saved by ``save_pytree``; ``template`` supplies the
    structure (e.g. a freshly initialized params tree)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)
