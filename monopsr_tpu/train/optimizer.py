"""Optimizer construction from the YAML train_config.

Behavioral twin of the reference optimizer builder
(ref: src/monopsr/builders/optimizer_builder.py:23-118): rms_prop /
momentum / adam / gradient_descent with constant or exponential-decay
learning rates, global-norm gradient clipping (the reference trainer
clips to 1.0, ref: trainer.py:77-81), and optional parameter EMA
(MovingAverageOptimizer equivalent; the EMA is tracked in the train
state and preferred by the evaluator).
"""

import jax
import jax.numpy as jnp
import optax


def masked_apply_if_finite(inner, max_consecutive_errors):
    """optax.apply_if_finite semantics without the lax.cond.

    optax's wrapper puts the whole inner update inside a conditional;
    on TPU that serializes against the backward pass and showed up as
    ~4.9 ms/step (2.3%) of the batch-8 train step (conditional %cond.2
    in the r5 xplane profile, scripts/xplane_ops.py). The happy path
    always runs the inner update anyway, so computing it
    unconditionally and SELECTING between (inner updates, new state)
    and (zeros, old state) is the same math with no control-flow
    barrier — XLA overlaps the optimizer sweep with the rest of the
    step. State layout is optax's own ApplyIfFiniteState, so
    checkpoints are interchangeable with the optax wrapper's.
    """
    inner = optax.with_extra_args_support(inner)

    def init(params):
        return optax.ApplyIfFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            last_finite=jnp.array(True, jnp.bool_),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params))

    def update(updates, state, params=None, **extra):
        inner_state = state.inner_state
        leaves = jax.tree.leaves(updates)
        isfinite = jnp.all(
            jnp.array([jnp.all(jnp.isfinite(p)) for p in leaves]))
        notfinite_count = jnp.where(
            isfinite, jnp.zeros([], jnp.int32),
            optax.safe_increment(state.notfinite_count))
        accept = jnp.logical_or(
            isfinite, notfinite_count > max_consecutive_errors)

        new_updates, new_inner_state = inner.update(
            updates, inner_state, params, **extra)
        # Selects, not arithmetic: NaNs in the rejected branch cannot
        # leak through jnp.where into the kept values.
        out_updates = jax.tree.map(
            lambda u: jnp.where(accept, u, jnp.zeros_like(u)),
            new_updates)
        kept_inner = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old),
            new_inner_state, inner_state)
        return out_updates, optax.ApplyIfFiniteState(
            notfinite_count=notfinite_count,
            last_finite=isfinite,
            total_notfinite=jnp.where(
                isfinite, state.total_notfinite,
                optax.safe_increment(state.total_notfinite)),
            inner_state=kept_inner)

    return optax.GradientTransformationExtraArgs(init=init, update=update)


def build_learning_rate(opt_config):
    """Builds an optax schedule from the optimizer sub-config."""
    lr_type = opt_config.learning_rate_type

    if lr_type == 'constant':
        return optax.constant_schedule(opt_config.learning_rate)

    if lr_type == 'exponential_decay':
        return optax.exponential_decay(
            init_value=opt_config.initial_learning_rate,
            transition_steps=opt_config.decay_steps,
            decay_rate=opt_config.decay_factor,
            staircase=bool(opt_config.get('staircase', True)))

    raise ValueError('Invalid learning rate type: ' + str(lr_type))


def build_optimizer(train_config, clip_gradient_norm=1.0):
    """Builds the optax GradientTransformation + schedule.

    Returns:
        (tx, schedule, use_ema, ema_decay)
    """
    optimizer_config = train_config.optimizer
    opt_type = optimizer_config.optimizer_type
    opt_config = getattr(optimizer_config, opt_type)

    schedule = build_learning_rate(opt_config)

    # Optional low-precision first-moment storage (train_config
    # optimizer_mu_dtype: bfloat16): halves the Adam/momentum
    # accumulator's HBM footprint and per-step sweep traffic. Safe for
    # the FIRST moment (beta1=0.9 keeps increments ~0.1 relative, well
    # inside bf16's mantissa); the second moment and the EMA stay f32 —
    # their per-step increments (1e-4 relative at decay 0.9999) would
    # vanish in bf16.
    mu_dtype = train_config.get('optimizer_mu_dtype', None)

    if opt_type == 'adam_optimizer':
        opt = optax.adam(schedule, mu_dtype=mu_dtype)
    elif opt_type == 'momentum_optimizer':
        opt = optax.sgd(schedule,
                        momentum=opt_config.momentum_optimizer_value,
                        accumulator_dtype=mu_dtype)
    elif opt_type == 'rms_prop_optimizer':
        opt = optax.rmsprop(
            schedule,
            decay=opt_config.get('decay', 0.9),
            momentum=opt_config.get('momentum_optimizer_value', 0.9),
            eps=opt_config.get('epsilon', 1.0))
    elif opt_type == 'gradient_descent_optimizer':
        opt = optax.sgd(schedule)
    else:
        raise ValueError('Invalid optimizer type: ' + str(opt_type))

    chain = [optax.clip_by_global_norm(clip_gradient_norm), opt] \
        if clip_gradient_norm else [opt]
    tx = optax.chain(*chain)

    # Skip non-finite updates instead of poisoning the parameters; give
    # up after many consecutive bad steps so real divergence still fails
    # loudly (from-scratch training can hit transient degenerate
    # geometry, e.g. near-zero predicted depths).
    if train_config.get('skip_nonfinite_updates', True):
        tx = masked_apply_if_finite(tx, max_consecutive_errors=50)

    use_ema = bool(opt_config.get('use_moving_average', False))
    ema_decay = float(opt_config.get('moving_average_decay', 0.9999))
    return tx, schedule, use_ema, ema_decay
