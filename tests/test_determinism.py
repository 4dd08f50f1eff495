"""Determinism (SURVEY.md §5.2): same seed => bit-identical training.

The reference's only determinism control is cudnn.deterministic
(utils/utils.py:98-103); here randomness is explicit PRNG-key threading, so
two runs from the same seed must produce identical params, batch order, and
augmentations.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mla_tpu.core.config import MLAConfig
from mla_tpu.models.classifiers import AVClassifier
from mla_tpu.train import optim, steps
from mla_tpu.train.state import create_train_state


def _run(seed, n=3):
    cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True, gs_rls=True,
                    train=True).validate()
    model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                         stages=(1, 1, 1, 1))
    rng = np.random.default_rng(seed)
    batch = {"spec": jnp.asarray(rng.standard_normal((4, 1, 64, 80)),
                                 jnp.float32),
             "image": jnp.asarray(rng.standard_normal((4, 3, 1, 32, 32)),
                                  jnp.float32),
             "label": jnp.asarray(rng.integers(0, 6, 4), jnp.int32),
             "idx": jnp.arange(4, dtype=jnp.int32),
             "valid": jnp.ones((4,), jnp.float32)}
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec, seed=0)
    step = jax.jit(steps.make_train_step(model, cfg, spec, len_dl=10),
                   donate_argnums=0)
    for i in range(n):
        state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(i),
                        jnp.int32(0))
    return state, m


class TestDeterminism:
    @pytest.mark.mid
    def test_same_seed_bit_identical(self):
        s1, m1 = _run(7)
        s2, m2 = _run(7)
        assert float(m1["loss"]) == float(m2["loss"])
        l1 = jax.tree_util.tree_leaves(s1.params)
        l2 = jax.tree_util.tree_leaves(s2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_loader_order_deterministic(self, tmp_path):
        from mla_tpu.data import synthetic
        from mla_tpu.data.datasets import AVAdapter
        from mla_tpu.data.pipeline import Loader
        root = str(tmp_path)
        synthetic.make_cremad(root, n_train=6, n_test=2, spec_shape=(32, 40))
        cfg = MLAConfig(dataset="CREMAD", lorb="base", image_size=32,
                        data_root=root).validate()
        mk = lambda: Loader(AVAdapter(cfg, "train"), batch_size=4,
                            shuffle=True, seed=3)
        b1 = next(mk().epoch(5))
        b2 = next(mk().epoch(5))
        np.testing.assert_array_equal(np.asarray(b1["label"]),
                                      np.asarray(b2["label"]))
        np.testing.assert_allclose(np.asarray(b1["image"]),
                                   np.asarray(b2["image"]))
