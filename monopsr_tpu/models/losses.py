"""Loss primitives matching the reference's loss-builder vocabulary.

Behavioral twins of the OD-API losses the reference uses plus its custom
ones (ref: src/monopsr/builders/loss_builder.py:19-84,
src/object_detection/core/losses.py:118-320,
src/monopsr/core/losses_custom.py:45-232). Loss-type strings in the YAML
loss_config resolve through LOSS_FNS.
"""

import jax.numpy as jnp

from monopsr_tpu.ops import chamfer as chamfer_ops
from monopsr_tpu.ops import emd as emd_ops


def huber(x, delta=1.0):
    """0.5 x^2 if |x| <= delta else 0.5 delta^2 + delta (|x| - delta)."""
    abs_x = jnp.abs(x)
    quad = 0.5 * x * x
    lin = 0.5 * delta * delta + delta * (abs_x - delta)
    return jnp.where(abs_x <= delta, quad, lin)


def weighted_smooth_l1(pred, target, weights, delta=1.0):
    """Anchor-wise smooth L1: sum over the code dim of huber * weights.

    pred/target: (B, N, C); weights: (B, N, 1) or (B, N, C).
    Returns (B, N).
    """
    return jnp.sum(huber(pred - target, delta) * weights, axis=2)


def weighted_smooth_l1_nonzero(pred, target, weights, delta=1.0):
    """Huber with SUM_BY_NONZERO_WEIGHTS reduction: scalar.

    Weights broadcast against the loss shape; the denominator counts
    nonzero weights after broadcasting (TF huber_loss semantics).
    """
    per_elem = huber(pred - target, delta) * weights
    num_nonzero = jnp.sum(
        (weights > 0).astype(jnp.float32) *
        jnp.ones_like(per_elem, jnp.float32))
    return jnp.sum(per_elem) / jnp.maximum(num_nonzero, 1.0)


def weighted_softmax_ce(logits, targets, weights, logit_scale=1.0):
    """Softmax CE against (possibly smoothed) one-hot targets.

    logits/targets: (B, N, K); weights: (B, N, 1). Returns weights-shaped.
    """
    scaled = logits / logit_scale
    log_probs = scaled - jnp.log(
        jnp.sum(jnp.exp(scaled - jnp.max(scaled, axis=-1, keepdims=True)),
                axis=-1, keepdims=True)) - jnp.max(
                    scaled, axis=-1, keepdims=True)
    ce = -jnp.sum(targets * log_probs, axis=-1)
    return ce.reshape(weights.shape) * weights


def sigmoid_ce(logits, targets):
    """Elementwise sigmoid cross entropy (stable form)."""
    return (jnp.maximum(logits, 0.0) - logits * targets +
            jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_focal(logits, targets, weights, gamma=2.0, alpha=0.25):
    """Sigmoid focal loss (ref: od losses.py:223-280)."""
    per_entry = sigmoid_ce(logits, targets)
    prob = jnp.where(logits >= 0, 1.0 / (1.0 + jnp.exp(-logits)),
                     jnp.exp(logits) / (1.0 + jnp.exp(logits)))
    p_t = targets * prob + (1 - targets) * (1 - prob)
    modulating = jnp.power(1.0 - p_t, gamma)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    return per_entry * modulating * alpha_w * weights


def weighted_ber_hu(pred, target, weights):
    """berHu: L1 below max|err|/5, scaled L2 above; mean over nonzero w."""
    err = pred - target
    abs_err = jnp.abs(err)
    thresh = jnp.max(abs_err) / 5.0
    per = jnp.where(abs_err <= thresh, abs_err,
                    (err * err + thresh * thresh) /
                    jnp.maximum(2.0 * thresh, 1e-12))
    loss = jnp.sum(per * weights)
    num_valid = jnp.sum((weights > 0).astype(jnp.float32) *
                        jnp.ones_like(per))
    return jnp.where(num_valid > 0, loss / jnp.maximum(num_valid, 1.0), 0.0)


def chamfer_loss(pred_maps, target_maps, weights):
    """Chamfer distance over masked (B, H, W, 3) maps, averaged over B."""
    b = pred_maps.shape[0]
    pred = (pred_maps * weights).reshape(b, -1, 3)
    target = (target_maps * weights).reshape(b, -1, 3)
    return jnp.mean(chamfer_ops.chamfer_distance(pred, target))


def emd_loss(pred_maps, target_maps, weights):
    """Approx EMD over masked (B, H, W, 3) maps, averaged over B."""
    b = pred_maps.shape[0]
    pred = (pred_maps * weights).reshape(b, -1, 3)
    target = (target_maps * weights).reshape(b, -1, 3)
    return jnp.mean(emd_ops.emd_distance(pred, target))


def apply_loss(loss_config_entry, pred, target, mask):
    """Dispatch on a YAML loss_config entry [loss_type, weight, ...].

    Mirrors loss_builder.add_loss_tensor (ref: loss_builder.py:60-84):
    returns the raw loss tensor/scalar multiplied by the weight.
    """
    loss_type = loss_config_entry[0]
    weight = loss_config_entry[1]

    if loss_type is None:
        return jnp.zeros_like(pred)

    if loss_type == 'smooth_l1':
        out = weighted_smooth_l1(pred, target, mask)
    elif loss_type == 'smooth_l1_nonzero':
        out = weighted_smooth_l1_nonzero(pred, target, mask)
    elif loss_type == 'softmax':
        out = weighted_softmax_ce(pred, target, mask)
    elif loss_type == 'softmax_temp':
        out = weighted_softmax_ce(pred, target, mask, logit_scale=0.5)
    elif loss_type == 'sigmoid_ce':
        out = sigmoid_ce(pred, target)
    elif loss_type == 'focal':
        out = sigmoid_focal(pred, target, mask)
    elif loss_type == 'berHu':
        out = weighted_ber_hu(pred, target, mask)
    elif loss_type == 'chamfer_dist':
        out = chamfer_loss(pred, target, mask)
    elif loss_type == 'emd':
        out = emd_loss(pred, target, mask)
    else:
        raise ValueError('Invalid loss type: ' + str(loss_type))

    return out * weight
