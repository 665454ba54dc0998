"""Training-mode test for the `alpha: 'prob'` variant.

The prob variant trains with a softmax-temperature CE on the bin logits
plus a smooth-L1 regression on the decoded alpha (the softmax expectation
over bin centres) vs GT alpha (ref: src/monopsr/core/models/monopsr/
monopsr_model.py:714-760). This test asserts both terms are wired into
compute_losses and that gradient steps reduce both.
"""

import dataclasses

import jax
import numpy as np
import optax

from monopsr_tpu import constants as C
from monopsr_tpu.models import monopsr
from monopsr_tpu.models.monopsr_net import MonoPSRNet
from tests.test_model import TINY_CFG, LOSS_CONFIG, make_batch

PROB_LOSS_CONFIG = dict(LOSS_CONFIG,
                        alpha_cls_temp=['softmax_temp', 0.3])


def _loss_pack(cfg, net, variables, batch):
    outs = net.apply(variables, **monopsr.net_inputs_from_batch(batch),
                     train=False)
    gt = monopsr.build_gt_dict(cfg, batch, outs)
    outs, gt = monopsr.add_global_outputs(cfg, batch, outs, gt)
    return monopsr.compute_losses(cfg, PROB_LOSS_CONFIG, outs, gt)


def test_prob_alpha_losses_present_and_decrease():
    cfg = dataclasses.replace(TINY_CFG, alpha_type='prob')
    net = MonoPSRNet(cfg=cfg)
    batch = make_batch(cfg)
    variables = jax.jit(
        lambda b: net.init(jax.random.PRNGKey(0),
                           **monopsr.net_inputs_from_batch(b),
                           train=False))(batch)

    losses0, total0 = jax.jit(
        lambda v, b: _loss_pack(cfg, net, v, b))(variables, batch)
    # Both prob-variant terms are in the loss dict (bins CE under
    # KEY_ALPHA_BINS, decoded-alpha regression under KEY_ALPHA, matching
    # the reference's losses_dict keys at monopsr_model.py:750-754)
    assert C.KEY_ALPHA_BINS in losses0
    assert C.KEY_ALPHA in losses0
    assert C.KEY_ALPHA_REGS not in losses0
    bins0 = float(losses0[C.KEY_ALPHA_BINS])
    reg0 = float(losses0[C.KEY_ALPHA])
    assert np.isfinite(bins0) and bins0 > 0
    assert np.isfinite(reg0) and reg0 > 0

    # Both terms contribute to the total-loss gradient: train on the
    # alpha terms alone and check each decreases.
    def alpha_loss(params):
        v = {'params': params, 'batch_stats': variables['batch_stats']}
        losses, _ = _loss_pack(cfg, net, v, batch)
        return losses[C.KEY_ALPHA_BINS] + losses[C.KEY_ALPHA], losses

    tx = optax.adam(1e-3)
    params = variables['params']
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        (_, losses), grads = jax.value_and_grad(
            alpha_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses

    losses = None
    for _ in range(30):
        params, opt_state, losses = step(params, opt_state)

    assert float(losses[C.KEY_ALPHA_BINS]) < bins0
    assert float(losses[C.KEY_ALPHA]) < reg0


def test_prob_alpha_total_includes_both_terms():
    cfg = dataclasses.replace(TINY_CFG, alpha_type='prob')
    net = MonoPSRNet(cfg=cfg)
    batch = make_batch(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         **monopsr.net_inputs_from_batch(batch),
                         train=False)
    losses, total = jax.jit(
        lambda v, b: _loss_pack(cfg, net, v, b))(variables, batch)
    parts = sum(float(v) for k, v in losses.items() if k != 'total_loss')
    np.testing.assert_allclose(float(total), parts, rtol=1e-5)
