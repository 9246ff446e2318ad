"""Stateful-feeling PRNG utilities over JAX's functional PRNG.

Replaces tux.{JaxRNG, next_rng, set_random_seed, init_rng}
(SURVEY.md §2.8; reference train.py:145, llama.py:296-298).
"""

from __future__ import annotations

import random as _pyrandom

import jax
import numpy as np


class JaxRNG:
    """Wraps a PRNG key; each call splits off fresh subkeys.

    Called with no args → returns one key. Called with an int → tuple of
    keys. Called with a tuple of names → dict of named keys (the form the
    model's ``rngs=`` argument consumes).
    """

    @classmethod
    def from_seed(cls, seed: int):
        return cls(jax.random.PRNGKey(seed))

    def __init__(self, rng):
        self.rng = rng

    def __call__(self, keys=None):
        if keys is None:
            self.rng, split_rng = jax.random.split(self.rng)
            return split_rng
        elif isinstance(keys, int):
            split_rngs = jax.random.split(self.rng, num=keys + 1)
            self.rng = split_rngs[0]
            return tuple(split_rngs[1:])
        else:
            split_rngs = jax.random.split(self.rng, num=len(keys) + 1)
            self.rng = split_rngs[0]
            return {key: val for key, val in zip(keys, split_rngs[1:])}


_global_rng: JaxRNG | None = None


def init_rng(seed: int):
    global _global_rng
    _global_rng = JaxRNG.from_seed(seed)


def next_rng(*args, **kwargs):
    global _global_rng
    if _global_rng is None:
        init_rng(42)
    return _global_rng(*args, **kwargs)


def set_random_seed(seed: int):
    np.random.seed(seed)
    _pyrandom.seed(seed)
    init_rng(seed)
