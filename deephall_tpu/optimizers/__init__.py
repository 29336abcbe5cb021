"""Optimizer dispatch (reference parity: ``optimizers/__init__.py:25-35``).

All steps share the training-step interface ``(CheckpointState, key) ->
(CheckpointState, LossStats)`` and are pure functions; the driver jits them once over
the global mesh.
"""

from __future__ import annotations

import logging

import optax
from flax import linen as nn

from deephall_tpu.config import Config, OptimizerName
from deephall_tpu.loss import LossMode, make_loss_and_capture_fn, make_loss_fn
from deephall_tpu.networks.psiformer import Psiformer
from deephall_tpu.optimizers.adam import make_adam_training_step
from deephall_tpu.optimizers.kfac import KfacState, make_kfac_training_step
from deephall_tpu.optimizers.none import make_inference_step
from deephall_tpu.types import TrainingInit, TrainingStep

logger = logging.getLogger("deephall")


def validate_opt_state(cfg: Config, opt_state):
    """Drop a restored ``opt_state`` that does not belong to the configured optimizer.

    A checkpoint may carry a foreign optimizer state: an adam state resumed under
    kfac, or a reference checkpoint whose kfac_jax blob happened to unpickle.  Passing
    such a state into the training step crashes at trace time with an obscure
    tree/attribute error, so mismatches are dropped here (with a warning) and the
    driver reinitialises the optimizer instead.

    Args:
        cfg: Full configuration (selects the expected state type).
        opt_state: The restored optimizer state (or ``None``).

    Returns:
        ``opt_state`` if it matches the configured optimizer, else ``None``.
    """
    if opt_state is None:
        return None
    if cfg.optim.optimizer == OptimizerName.none:
        return None  # inference keeps no state
    if cfg.optim.optimizer == OptimizerName.kfac:
        ok = isinstance(opt_state, KfacState)
    elif cfg.optim.optimizer == OptimizerName.adam:
        ok = (
            isinstance(opt_state, (tuple, list))
            and len(opt_state) > 0
            and isinstance(opt_state[0], optax.ScaleByAdamState)
        )
    else:  # pragma: no cover - enum is closed
        ok = False
    if not ok:
        logger.warning(
            "Restored opt_state (%s) does not match optimizer %s; reinitialising",
            type(opt_state).__name__,
            cfg.optim.optimizer,
        )
        return None
    return opt_state


def make_optimizer_step(
    cfg: Config, model: nn.Module, sample_config, fixed_states=None
) -> tuple[TrainingInit, TrainingStep]:
    """Build the optimizer (init, step) pair for the configured optimizer.

    Args:
        cfg: Full configuration.
        model: The wavefunction module (KFAC uses its curvature collections).
        sample_config: One electron configuration ``[nelec, 2]`` for shape discovery.
        fixed_states: Optional batched ``data -> log phi_j`` callables for
            excited-state overlap penalties (``loss.make_loss_fn``).

    Returns:
        ``(init, step)`` pure functions.

    Raises:
        ValueError: for unknown optimizer names.
    """
    network = model.apply
    if cfg.optim.optimizer == OptimizerName.adam:
        loss_grad_fn = make_loss_fn(
            network, cfg.system, LossMode.ENERGY_GRAD, model=model,
            fixed_states=fixed_states,
        )
        return make_adam_training_step(cfg.optim.adam, loss_grad_fn)
    if cfg.optim.optimizer == OptimizerName.kfac:
        loss_grad_fn = make_loss_fn(
            network, cfg.system, LossMode.ENERGY_GRAD, model=model,
            fixed_states=fixed_states,
        )
        # Psiformer: one shared forward serves both the gradient VJP and the
        # KFAC curvature capture (see loss.make_loss_and_capture_fn).
        capture_fn = (
            make_loss_and_capture_fn(cfg.system, model, fixed_states=fixed_states)
            if isinstance(model, Psiformer)
            else None
        )
        return make_kfac_training_step(
            cfg.optim.kfac, loss_grad_fn, model, sample_config, capture_fn=capture_fn
        )
    if cfg.optim.optimizer == OptimizerName.none:
        loss_diff_fn = make_loss_fn(
            network, cfg.system, LossMode.ENERGY_DIFF, model=model,
            fixed_states=fixed_states,
        )
        return make_inference_step(loss_diff_fn)
    raise ValueError(f"Optimizer {cfg.optim.optimizer} is not implemented!")
