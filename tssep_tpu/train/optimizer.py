"""Optimizer factory (reference ``padertorch.train.optimizer.Adam`` surface:
Adam lr 1e-3 + gradient clipping 10, ``experiment.py:112-118,147-150``),
built on optax with optional multi-step gradient accumulation
(= the reference's ``virtual_minibatch_size``)."""

from __future__ import annotations

import optax

from tssep_tpu.config.configurable import Configurable

__all__ = ['Adam', 'SGD']


class Adam(Configurable):
    def __init__(self, gradient_clipping=10, lr=0.001, betas=(0.9, 0.999),
                 eps=1e-08, weight_decay=0, amsgrad=False):
        self.gradient_clipping = gradient_clipping
        self.lr = lr
        self.betas = tuple(betas)
        self.eps = eps
        self.weight_decay = weight_decay
        self.amsgrad = amsgrad

    def make(self, every_k_steps: int = 1):
        parts = []
        if self.gradient_clipping:
            parts.append(optax.clip_by_global_norm(self.gradient_clipping))
        b1, b2 = self.betas
        if self.amsgrad:
            parts.append(optax.amsgrad(self.lr, b1=b1, b2=b2, eps=self.eps))
        else:
            if self.weight_decay:
                parts.append(optax.adamw(self.lr, b1=b1, b2=b2, eps=self.eps,
                                         weight_decay=self.weight_decay))
            else:
                parts.append(optax.adam(self.lr, b1=b1, b2=b2, eps=self.eps))
        tx = optax.chain(*parts)
        if every_k_steps and every_k_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=every_k_steps)
        return tx


class SGD(Configurable):
    def __init__(self, gradient_clipping=10, lr=0.01, momentum=0.0):
        self.gradient_clipping = gradient_clipping
        self.lr = lr
        self.momentum = momentum

    def make(self, every_k_steps: int = 1):
        parts = []
        if self.gradient_clipping:
            parts.append(optax.clip_by_global_norm(self.gradient_clipping))
        parts.append(optax.sgd(self.lr, momentum=self.momentum or None))
        tx = optax.chain(*parts)
        if every_k_steps and every_k_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=every_k_steps)
        return tx
