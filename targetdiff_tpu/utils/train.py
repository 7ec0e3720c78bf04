"""Optimizer and LR-schedule factories (optax), mirroring the reference's
training infra (reference: utils/train.py:55-101, utils/warmup.py:28-86).

The reference uses torch's stateful schedulers; here the optimizer is built
with `optax.inject_hyperparams` so the learning rate is a leaf of the
optimizer state that host-side scheduler objects (plateau/warmup) update
between steps — keeping the jitted train step purely functional.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def get_optimizer(cfg) -> optax.GradientTransformation:
    """adam with optional weight decay + global-norm clipping
    (reference: utils/train.py:55-64; clip at train loop,
    scripts/train_diffusion.py:136)."""
    if cfg.type != "adam":
        raise NotImplementedError(f"Optimizer not supported: {cfg.type}")
    max_grad_norm = cfg.get("max_grad_norm", None)
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))

    @optax.inject_hyperparams
    def make_adam(learning_rate):
        if cfg.get("weight_decay", 0):
            return optax.adamw(
                learning_rate, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay
            )
        return optax.adam(learning_rate, b1=cfg.beta1, b2=cfg.beta2)

    chain.append(make_adam(cfg.lr))
    return optax.chain(*chain)


def set_learning_rate(opt_state, lr: float):
    """Write the lr hyperparam into an optax.chain(...inject_hyperparams...) state."""
    inner = opt_state[-1]  # the injected-adam state is the last element
    inner.hyperparams["learning_rate"] = inner.hyperparams["learning_rate"] * 0 + lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state[-1].hyperparams["learning_rate"])


class PlateauScheduler:
    """ReduceLROnPlateau with torch semantics (factor, patience, min_lr)
    (reference: utils/train.py:67-74 'plateau')."""

    def __init__(self, factor=0.6, patience=10, min_lr=1e-6, initial_lr=None):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.lr = initial_lr
        self.best: Optional[float] = None
        self.num_bad = 0

    def step(self, metric: float, lr: Optional[float] = None) -> float:
        """Feed a validation metric; returns the (possibly reduced) lr."""
        if lr is not None:
            self.lr = lr
        if self.best is None or metric < self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

    def state_dict(self):
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d):
        self.lr, self.best, self.num_bad = d["lr"], d["best"], d["num_bad"]


class WarmupPlateauScheduler(PlateauScheduler):
    """Gradual warmup for `total_epoch` validation steps, then plateau
    (reference: utils/train.py:75-86 'warmup_plateau' + utils/warmup.py:28-86).
    multiplier > 1 scales base lr; lr ramps linearly to multiplier * base_lr.
    """

    def __init__(self, multiplier=2.0, total_epoch=10, base_lr=1e-4, **kw):
        super().__init__(initial_lr=base_lr, **kw)
        self.multiplier = multiplier
        self.total_epoch = total_epoch
        self.base_lr = base_lr
        self.epoch = 0

    def step(self, metric: float, lr: Optional[float] = None) -> float:
        self.epoch += 1
        if self.epoch <= self.total_epoch:
            frac = self.epoch / self.total_epoch
            self.lr = self.base_lr * ((self.multiplier - 1.0) * frac + 1.0)
            return self.lr
        return super().step(metric)


class ExpMinScheduler:
    """Exponential decay with a floor: lr_t = max(base * gamma^t, min_lr),
    stepping per validation call (reference: utils/train.py:12-30, :87-97
    'expmin'/'expmin_milestone')."""

    def __init__(self, base_lr, factor, min_lr, milestone=0):
        self.base_lr = base_lr
        self.factor = factor
        self.min_lr = min_lr
        self.milestone = milestone
        self.epoch = 0
        self.lr = base_lr

    def step(self, metric: float = None, lr: Optional[float] = None) -> float:
        self.epoch += 1
        e = max(self.epoch - self.milestone, 0)
        self.lr = max(self.base_lr * (self.factor**e), self.min_lr)
        return self.lr

    def state_dict(self):
        return {"epoch": self.epoch, "lr": self.lr}

    def load_state_dict(self, d):
        self.epoch, self.lr = d["epoch"], d["lr"]


def get_scheduler(cfg, optimizer_cfg):
    """(reference: utils/train.py:67-101)."""
    t = cfg.type
    if t == "plateau":
        return PlateauScheduler(
            factor=cfg.factor, patience=cfg.patience, min_lr=cfg.min_lr,
            initial_lr=optimizer_cfg.lr,
        )
    if t == "warmup_plateau":
        return WarmupPlateauScheduler(
            multiplier=cfg.multiplier, total_epoch=cfg.total_epoch, base_lr=optimizer_cfg.lr,
            factor=cfg.factor, patience=cfg.patience, min_lr=cfg.min_lr,
        )
    if t == "expmin":
        return ExpMinScheduler(base_lr=optimizer_cfg.lr, factor=cfg.factor, min_lr=cfg.min_lr)
    if t == "expmin_milestone":
        gamma = math.exp(math.log(cfg.factor) / cfg.milestone)
        return ExpMinScheduler(
            base_lr=optimizer_cfg.lr, factor=gamma, min_lr=cfg.min_lr
        )
    raise NotImplementedError(f"Scheduler not supported: {t}")
