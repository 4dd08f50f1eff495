"""Seeding utilities (reference: utils/utils.py:98-114).

``setup_seed`` mirrors the reference's global-seed call; in JAX, model/data
randomness flows through explicit PRNG keys (returned here), so determinism
does not depend on hidden global state (the reference needs
cudnn.deterministic; XLA is deterministic by default for this workload).

``weight_init`` has no runtime equivalent: the reference applies it as a
post-construction pass (main.py:719); here the same laws are the *initializers*
of the Flax modules (Conv kaiming-normal fan_out, Linear xavier-normal,
BN gamma=1/beta=0 — see models/resnet.py, models/fusion.py).
"""

from __future__ import annotations

import random

import jax
import numpy as np


def setup_seed(seed: int) -> jax.Array:
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.key(seed)
