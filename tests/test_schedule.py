"""LR schedule golden test vs the reference's actual torch scheduler stack

(reference detr/train.py:187-204): SequentialLR[LinearLR -> constant
LambdaLR -> CosineAnnealingLR], stepped once per epoch."""

import numpy as np
import pytest

from detr_tpu.train.schedule import make_lr_schedule


def torch_reference_lrs(base_lr, epochs, warmup, warmup_decay, hold, lr_min):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    s1 = torch.optim.lr_scheduler.LinearLR(
        opt, start_factor=warmup_decay, total_iters=warmup
    )
    s2 = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lambda e: 1.0)
    cooldown = epochs - warmup - hold
    s3 = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=cooldown, eta_min=lr_min)
    sched = torch.optim.lr_scheduler.SequentialLR(
        opt, schedulers=[s1, s2, s3], milestones=[warmup, warmup + hold]
    )
    lrs = []
    for _ in range(epochs):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(lrs)


@pytest.mark.parametrize(
    "base_lr,epochs,warmup,hold",
    [(3e-4, 100, 5, 35), (3e-5, 100, 5, 35), (1e-4, 20, 3, 5)],
)
def test_schedule_matches_torch(base_lr, epochs, warmup, hold):
    ref = torch_reference_lrs(base_lr, epochs, warmup, 0.01, hold, lr_min=3e-6)
    steps_per_epoch = 7
    sched = make_lr_schedule(
        base_lr,
        epochs=epochs,
        steps_per_epoch=steps_per_epoch,
        warmup_epochs=warmup,
        warmup_decay=0.01,
        hold_epochs=hold,
        lr_min=3e-6,
    )
    ours = np.array([float(sched(e * steps_per_epoch)) for e in range(epochs)])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # constant within an epoch
    assert float(sched(3)) == float(sched(0))
    assert float(sched(steps_per_epoch)) != float(sched(0))
