"""Adam + ReduceLROnPlateau as pure, vmappable state transitions.

The reference drives each pose candidate with ``torch.optim.Adam(lr=0.1)``
plus ``ReduceLROnPlateau(mode='min', patience, factor)`` (reference:
``omniloc.py:33-50, 235-258``).  optax has no ReduceLROnPlateau with
per-candidate state that survives ``vmap``; and the per-candidate learning
rate must live *in* the carried state so all candidates can run in one jitted
scan.  So both transforms are implemented here from their mathematical
definitions as pure functions over a NamedTuple state — fully vmappable.

Parity notes (tested against torch in tests/test_optim.py):
  * Adam: betas (0.9, 0.999), eps 1e-8 added OUTSIDE the sqrt
    (p -= lr * m_hat / (sqrt(v_hat) + eps)), bias correction by step count.
  * Plateau: threshold 1e-4 relative ('rel'), best init +inf,
    is_better = loss < best * (1 - threshold); reduce when
    num_bad > patience; lr_new = lr * factor applied only if the drop
    exceeds torch's eps of 1e-8; cooldown 0, min_lr 0.
  * Per-iteration order in the reference loop: adam step with the CURRENT
    lr, then scheduler.step(loss of this iteration), then the translation
    clamp (applied to params only, not to Adam moments; omniloc.py:52-58).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["AdamPlateauState", "init_adam_plateau", "adam_plateau_step"]

_BETA1 = 0.9
_BETA2 = 0.999
_EPS = 1e-8
_THRESHOLD = 1e-4  # torch ReduceLROnPlateau default (rel mode)
_LR_EPS = 1e-8  # torch 'eps': minimum lr decrement


class AdamPlateauState(NamedTuple):
    m: object  # pytree like params
    v: object  # pytree like params
    count: jnp.ndarray  # () int32 — Adam step count
    lr: jnp.ndarray  # () f32 — current learning rate
    best: jnp.ndarray  # () f32 — best loss seen by the scheduler
    num_bad: jnp.ndarray  # () int32 — plateau counter


def init_adam_plateau(params, lr: float) -> AdamPlateauState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamPlateauState(
        m=zeros,
        v=jax.tree.map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.zeros((), jnp.int32),
    )


def adam_plateau_step(
    params,
    grads,
    state: AdamPlateauState,
    loss: jnp.ndarray,
    patience: int,
    factor: float,
) -> Tuple[object, AdamPlateauState]:
    """One fused optimizer+scheduler transition.

    ``loss`` is the loss evaluated at ``params`` BEFORE this update (the
    reference calls scheduler.step(loss) with that value right after
    optimizer.step()).
    """
    count = state.count + 1
    bc1 = 1.0 - _BETA1 ** count.astype(jnp.float32)
    bc2 = 1.0 - _BETA2 ** count.astype(jnp.float32)

    new_m = jax.tree.map(lambda m, g: _BETA1 * m + (1 - _BETA1) * g, state.m, grads)
    new_v = jax.tree.map(
        lambda v, g: _BETA2 * v + (1 - _BETA2) * g * g, state.v, grads
    )

    lr = state.lr

    # torch's exact factorisation (torch/optim/adam.py):
    #   p -= (lr / bc1) * m / (sqrt(v) / sqrt(bc2) + eps)
    step_size = lr / bc1
    sqrt_bc2 = jnp.sqrt(bc2)

    def upd(p, m, v):
        return p - step_size * m / (jnp.sqrt(v) / sqrt_bc2 + _EPS)

    new_params = jax.tree.map(upd, params, new_m, new_v)

    # --- ReduceLROnPlateau transition ---
    is_better = loss < state.best * (1.0 - _THRESHOLD)
    best = jnp.where(is_better, loss, state.best)
    num_bad = jnp.where(is_better, 0, state.num_bad + 1)
    reduce = num_bad > patience
    cand_lr = lr * factor
    new_lr = jnp.where(reduce & (lr - cand_lr > _LR_EPS), cand_lr, lr)
    num_bad = jnp.where(reduce, 0, num_bad)

    return new_params, AdamPlateauState(
        m=new_m, v=new_v, count=count, lr=new_lr, best=best, num_bad=num_bad
    )
