"""GS plugin: orthogonal gradient correction on the MLA shared head.

Reference: utils/utils.py:12-41. Per sub-step, a recursive-least-squares-style
projector ``Pl`` (head_width x head_width, init = I) is updated from the mean
batch feature and the shared-head weight gradient is projected through it.

Two modes (SURVEY.md §2 C10):
  - rls_active=False (default, *shipped parity*): the reference's guard
    ``n == "module.weight"`` (utils.py:32) never matches an nn.Linear's param
    name, so the projection is dead code — training is plain alternating
    unimodal SGD on the shared head. We reproduce that: Pl untouched, grads
    untouched.
  - rls_active=True (*intended algorithm*, --gs_rls): the verbatim update
      lamda = batch_index/len_dataloader + 1 ; alpha = 0.1**lamda
      r = mean(feats, 0, keepdims)              # (1, D)
      k = Pl @ r.T                              # (D, 1)
      Pl = Pl - (k k^T) / (alpha + k r)         # ELEMENTWISE over the outer
                                                # products, as written
                                                # (utils.py:36 uses mm(k, r),
                                                # a (D, D) outer product)
      Pl = Pl / ||Pl||_F
      grad_W = grad_W @ Pl^T  (torch layout)  ==  Pl @ kernel_grad (flax layout)
    sized to the actual head width (512/768), fixing the reference's
    hard-coded 512 that would shape-error on m3ae heads.

Both the first-sub-step skip (train_exp_counter != 0, utils.py:29) and the
per-sub-step exp_count increment (main.py:442,454,466) are kept.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class GSState:
    Pl: jnp.ndarray          # (D, D) float32
    exp_count: jnp.ndarray   # () int32


def init_gs_state(head_dim: int) -> GSState:
    return GSState(Pl=jnp.eye(head_dim, dtype=jnp.float32),
                   exp_count=jnp.zeros((), jnp.int32))


def gs_before_update(gs: GSState, feats: jnp.ndarray, head_kernel_grad: jnp.ndarray,
                     batch_index: jnp.ndarray, len_dataloader: int,
                     rls_active: bool):
    """Returns (new GSState, projected head kernel grad (D, C) flax layout)."""
    if not rls_active:
        return gs.replace(exp_count=gs.exp_count + 1), head_kernel_grad

    lamda = batch_index.astype(jnp.float32) / float(len_dataloader) + 1.0
    alpha = 1.0 * 0.1 ** lamda

    def do_update(Pl):
        r = jnp.mean(feats.astype(jnp.float32), axis=0, keepdims=True)  # (1, D)
        k = Pl @ r.T                                                    # (D, 1)
        Pl = Pl - (k @ k.T) / (alpha + k @ r)
        return Pl / jnp.linalg.norm(Pl)

    Pl = jax.lax.cond(gs.exp_count != 0, do_update, lambda Pl: Pl, gs.Pl)
    grad = jax.lax.cond(
        gs.exp_count != 0,
        lambda g: (Pl @ g.astype(jnp.float32)).astype(g.dtype),
        lambda g: g,
        head_kernel_grad)
    return GSState(Pl=Pl, exp_count=gs.exp_count + 1), grad
