"""Optimizer / LR-schedule parity with the reference recipes."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dpc_tpu.train import optim


def test_torch_adam_matches_pytorch():
    """Adam + coupled L2 weight decay must track torch.optim.Adam exactly."""
    w0 = np.random.default_rng(0).normal(size=(7, 5)).astype(np.float32)
    lr, wd = 1e-2, 1e-3

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)

    params = {"w": jnp.asarray(w0)}
    tx = optim.torch_adam(lr, wd)
    opt_state = tx.init(params)

    for i in range(5):
        # deterministic fake gradient
        g = np.sin(w0 + i).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = {"w": params["w"] + updates["w"]}
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_multistep_restart_lr_matches_reference():
    def ref_multiplier(epoch, gamma, step, repeat):
        # MultiStepLR_Restart_Multiplier, eval/test.py:408-420
        max_step = max(step)
        effective_epoch = epoch % max_step
        if epoch // max_step >= repeat:
            exp = len(step) - 1
        else:
            exp = len([i for i in step if effective_epoch >= i])
        return gamma ** exp

    for milestones, repeat in (((10, 15, 20), 3), ((60, 80, 100), 1),
                               ((150, 250, 300), 1)):
        for epoch in range(0, 3 * max(milestones) + 10, 7):
            want = ref_multiplier(epoch, 0.1, list(milestones), repeat)
            got = optim.multistep_restart_lr(epoch, 1.0, milestones, 0.1,
                                             repeat)
            assert abs(got - want) < 1e-12, (milestones, epoch, got, want)


def test_finetune_param_groups():
    params = {"backbone": {"w": jnp.ones((3,))},
              "agg": {"w": jnp.ones((3,))},
              "final_fc": {"w": jnp.ones((3,))}}
    tx = optim.finetune_optimizer(params, lr=1.0, wd=0.0,
                                  backbone_lr_scale=0.1)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(g, state, params)
    # first Adam step normalises to ±lr regardless of grad scale
    assert abs(float(updates["final_fc"]["w"][0])) > \
        9 * abs(float(updates["backbone"]["w"][0]))


def test_linear_probe_freezes_trunk():
    params = {"backbone": {"w": jnp.ones((3,))},
              "agg": {"w": jnp.ones((3,))},
              "final_fc": {"w": jnp.ones((3,))}}
    tx = optim.finetune_optimizer(params, lr=1.0, wd=0.0, train_what="last")
    updates, _ = tx.update(jax.tree.map(jnp.ones_like, params),
                           tx.init(params), params)
    assert float(jnp.abs(updates["backbone"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["agg"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["final_fc"]["w"]).sum()) > 0.0
