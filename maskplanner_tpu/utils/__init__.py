"""General utilities: seeding, run naming, directory management, logging.

Reference parity: ``utils/__init__.py`` of gabrieletiboni/MaskPlanner
(``set_seed`` at utils/__init__.py:61-66, run naming helpers).
"""
from __future__ import annotations

import os
import random
import string
import datetime

import numpy as np


def set_seed(seed: int | None):
    """Seed numpy + python RNGs; returns a ``jax.random`` key for device RNG.

    The reference seeds torch/numpy/random globally (utils/__init__.py:61-66).
    JAX RNG is explicit, so we return a PRNG key derived from the same seed.
    """
    import jax

    if seed is None or seed == 0:
        seed = int.from_bytes(os.urandom(4), "little")
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def random_run_id(n: int = 6) -> str:
    return "".join(random.choices(string.ascii_uppercase + string.digits, k=n))


def get_run_name(config, default_name: str | None = None) -> str:
    """Run-dir naming: <timestamp>_<name-or-group>_<random-id>."""
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    base = default_name or config.get("name") or config.get("auto_wandb_group") or "run"
    return f"{stamp}_{base}_{random_run_id()}"


def create_dirs(path: str):
    os.makedirs(path, exist_ok=True)
    return path
