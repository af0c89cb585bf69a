"""Optimizers for differentiable rendering.

TPU-native rebuild of mitsuba2's `mitsuba.python.autodiff.{Optimizer, SGD,
Adam}` (src/python/python/autodiff.py). The reference keeps Adam moments as
enoki arrays inside a mutable object; here both the parameters and the
optimizer state are pytrees and `step` is a pure function — jit the whole
(render -> loss -> grad -> step) chain. A thin stateful wrapper mirrors the
reference's object API for scripts.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


# --- functional core --------------------------------------------------------

def sgd_init(params):
    return {"momentum": jax.tree.map(jnp.zeros_like, params)}


def sgd_step(params, grads, state, lr: float, momentum: float = 0.0):
    """autodiff.py::SGD.step (with optional momentum)."""
    if momentum == 0.0:
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, state
    vel = jax.tree.map(lambda v, g: momentum * v + g,
                       state["momentum"], grads)
    new_params = jax.tree.map(lambda p, v: p - lr * v, params, vel)
    return new_params, {"momentum": vel}


def adam_init(params):
    return {"step": jnp.zeros((), jnp.int32),
            "m": jax.tree.map(jnp.zeros_like, params),
            "v": jax.tree.map(jnp.zeros_like, params)}


def adam_step(params, grads, state, lr: float, beta_1: float = 0.9,
              beta_2: float = 0.999, epsilon: float = 1e-8):
    """autodiff.py::Adam.step — bias-corrected Adam."""
    t = state["step"] + 1
    m = jax.tree.map(lambda m_, g: beta_1 * m_ + (1 - beta_1) * g,
                     state["m"], grads)
    v = jax.tree.map(lambda v_, g: beta_2 * v_ + (1 - beta_2) * g * g,
                     state["v"], grads)
    tf = t.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1 - beta_2 ** tf) / (1 - beta_1 ** tf)
    new_params = jax.tree.map(
        lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + epsilon),
        params, m, v)
    return new_params, {"step": t, "m": m, "v": v}


# --- stateful wrappers (the reference's script-facing API) ------------------

class Optimizer:
    def __init__(self, params: Dict, lr: float):
        self.params = dict(params)
        self.lr = lr
        self.state = self._init(self.params)

    def step(self, grads: Dict) -> Dict:
        self.params, self.state = self._step(self.params, grads, self.state)
        return self.params

    def __getitem__(self, k):
        return self.params[k]

    def __setitem__(self, k, v):
        self.params[k] = jnp.asarray(v)


class SGD(Optimizer):
    def __init__(self, params, lr, momentum: float = 0.0):
        self.momentum = momentum
        super().__init__(params, lr)

    def _init(self, params):
        return sgd_init(params)

    def _step(self, params, grads, state):
        return sgd_step(params, grads, state, self.lr, self.momentum)


class Adam(Optimizer):
    def __init__(self, params, lr, beta_1: float = 0.9, beta_2: float = 0.999,
                 epsilon: float = 1e-8):
        self.beta_1, self.beta_2, self.epsilon = beta_1, beta_2, epsilon
        super().__init__(params, lr)

    def _init(self, params):
        return adam_init(params)

    def _step(self, params, grads, state):
        return adam_step(params, grads, state, self.lr, self.beta_1,
                         self.beta_2, self.epsilon)
