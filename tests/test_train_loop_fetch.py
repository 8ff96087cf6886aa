"""Deferred metric fetch in the engine train loop (round-5 change).

train_epoch holds device metric vectors and fetches ONE stacked transfer at
each LOG_PERIOD boundary; the NaN guard keeps per-step granularity (it
fires late, naming the exact step).  These tests drive the REAL train_epoch
with a fake trainer whose step function is controllable.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svit_tpu.config import get_cfg
from svit_tpu.engine import meters as meters_lib
from svit_tpu.engine.train import train_epoch


class _Loader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def iter_batches(self, start=0):
        return iter(self.batches[start:])


def _mk(cfg, n, nan_at=None):
    batches = [
        {
            "clips": np.zeros((2, 1, 4, 4, 3), np.float32),
            "labels": np.zeros((2,), np.int64),
            "weight": np.ones((2,), np.float32),
        }
        for _ in range(n)
    ]
    calls = []

    def step_jit(state, vb, ib, rng):
        i = len(calls)
        calls.append(i)
        loss = jnp.float32(np.nan if i == nan_at else float(i))
        return state + 1, jnp.stack([loss, jnp.float32(2.0 * i)])

    trainer = SimpleNamespace(
        train_loader=_Loader(batches),
        image_loader=None,
        put_batch=lambda b: b,
        step_jit=step_jit,
        metric_names=["loss", "loss_ce"],
        steps_per_epoch=n,
        arch=SimpleNamespace(num_classes=5),
    )
    return trainer, calls


def test_deferred_fetch_updates_every_step():
    cfg = get_cfg()
    cfg.LOG_PERIOD = 3
    cfg.MIXUP.ENABLE = False
    trainer, calls = _mk(cfg, 7)
    meter = meters_lib.TrainMeter(7, cfg)
    state, preempted = train_epoch(
        cfg, trainer, jnp.int32(0), meter, 0, jax.random.PRNGKey(0)
    )
    assert preempted is None
    # every step dispatched exactly once; the trailing flush drained the
    # window that didn't reach a LOG_PERIOD boundary (7 % 3 != 0)
    assert int(state) == 7 and len(calls) == 7


def test_nan_guard_names_the_exact_step():
    cfg = get_cfg()
    cfg.LOG_PERIOD = 4
    cfg.MIXUP.ENABLE = False
    trainer, calls = _mk(cfg, 8, nan_at=5)
    meter = meters_lib.TrainMeter(8, cfg)
    with pytest.raises(RuntimeError) as err:
        train_epoch(
            cfg, trainer, jnp.int32(0), meter, 3, jax.random.PRNGKey(0)
        )
    # fires at the flush after step 5 (iters 4-7 flush at boundary 8),
    # naming epoch and the exact iteration
    assert "(epoch 3, iter 5)" in str(err.value)
    # the guard fired late but before the epoch completed silently
    assert len(calls) == 8


def test_guard_preemption_flushes_pending():
    cfg = get_cfg()
    cfg.LOG_PERIOD = 100  # no boundary flush within the epoch
    cfg.MIXUP.ENABLE = False
    trainer, calls = _mk(cfg, 6)
    meter = meters_lib.TrainMeter(6, cfg)

    class Guard:
        fired = False

    g = Guard()
    orig_step = trainer.step_jit

    def step_and_fire(state, vb, ib, rng):
        if len(calls) == 3:
            g.fired = True  # SIGTERM arrives mid-epoch
        return orig_step(state, vb, ib, rng)

    trainer.step_jit = step_and_fire
    state, preempted = train_epoch(
        cfg, trainer, jnp.int32(0), meter, 0, jax.random.PRNGKey(0), guard=g
    )
    assert preempted == 4  # completed iterations at the SIGTERM poll
    assert int(state) == 4
