"""Optimizer: Adam + coupled L2 + per-epoch cosine annealing.

Reference (modeling_utils.py:220-260): a single torch Adam over the feature
extractor and model jointly, ``weight_decay`` applied torch-style (L2 added
to the gradient *before* the Adam moments — not AdamW), and an optional
``CosineAnnealingLR(T_max=n_epochs, eta_min=1e-6)`` stepped once per epoch.

The learning rate is injected as a mutable hyperparameter so the epoch loop
can set the exact torch cosine value each epoch.
"""

from __future__ import annotations

import math

import optax

from ..config import ExperimentConfig


def cosine_lr(epoch: int, base_lr: float, n_epochs: int, eta_min: float = 1e-6) -> float:
    """torch CosineAnnealingLR value at the start of ``epoch`` (0-based)."""
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / n_epochs)) / 2


def make_optimizer(cfg: ExperimentConfig,
                   flat: bool = False) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.inject_hyperparams(optax.scale)(step_size=-cfg.lr),
    )
    # Optimizer state is PER-LEAF for every family. Round 2 wrapped the
    # frame families in optax.flatten (at ~150 leaves the per-leaf Adam tail
    # was ~450 tiny ops and measured slower); round 3's stacked param trees
    # (TCN stacks as 4 leaves/stage, multistack-merged slow path) cut the
    # COG tree to 93 leaves, and per-leaf now measures FASTER than the
    # flatten round trip (2.37 vs 2.45 ms/step, T=1024 TPU v5e): each
    # leaf ravel in the pack is a physical (8,128)-tile->1D relayout copy,
    # ~340 us/step of concatenate/reshape/stack in the device profile.
    # ``flat`` (engine-level single-vector params, cfg.flat_params) keeps
    # the chain naturally single-leaf; it was also measured and rejected
    # for the default path (see CLAUDE.md round-3 notes). The window-family
    # TP placement (parallel/mesh.py) needs the mirrored param-dict paths in
    # the Adam moments either way, which per-leaf states preserve.
    del flat
    return tx


def set_lr(opt_state, lr: float):
    """Return a new optimizer state with the injected learning rate replaced
    (purely functional: the inject_hyperparams state — last element of the
    chain tuple — is rebuilt, never mutated, so donated pytrees are safe)."""
    import jax.numpy as jnp

    inj = opt_state[-1]
    hyper = dict(inj.hyperparams)
    hyper["step_size"] = jnp.asarray(-lr, dtype=jnp.float32)
    return opt_state[:-1] + (inj._replace(hyperparams=hyper),)


def epoch_lr(cfg: ExperimentConfig, epoch: int) -> float:
    if cfg.lr_scheduler:
        return cosine_lr(epoch, cfg.lr, cfg.n_epochs)
    return cfg.lr
