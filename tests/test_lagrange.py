"""Lagrange / PID-Lagrangian multiplier tests."""

from collections import deque

import jax.numpy as jnp
import numpy as np

from omnisafe_tpu.common.lagrange import Lagrange
from omnisafe_tpu.common.pid_lagrange import PIDLagrangian


def test_lagrange_ascends_on_violation():
    lag = Lagrange(cost_limit=25.0, lagrangian_multiplier_init=0.001, lambda_lr=0.1,
                   lambda_optimizer='SGD')
    state = lag.init()
    for _ in range(5):
        state = lag.update(state, jnp.asarray(50.0))
    assert float(state.multiplier) > 0.001
    high = float(state.multiplier)
    for _ in range(50):
        state = lag.update(state, jnp.asarray(0.0))
    assert float(state.multiplier) < high
    assert float(state.multiplier) >= 0.0


def test_lagrange_upper_bound():
    lag = Lagrange(cost_limit=1.0, lagrangian_multiplier_init=0.0, lambda_lr=1.0,
                   lambda_optimizer='SGD', lagrangian_upper_bound=0.5)
    state = lag.init()
    for _ in range(10):
        state = lag.update(state, jnp.asarray(100.0))
    assert float(state.multiplier) <= 0.5 + 1e-6


class _RefPID:
    """Host replica of the reference controller semantics
    (reference: omnisafe/common/pid_lagrange.py:92-125) used as the oracle."""

    def __init__(self, **kw):
        self.kp, self.ki, self.kd = kw['pid_kp'], kw['pid_ki'], kw['pid_kd']
        self.ap, self.ad = kw['pid_delta_p_ema_alpha'], kw['pid_delta_d_ema_alpha']
        self.sum_norm, self.diff_norm = kw['sum_norm'], kw['diff_norm']
        self.pmax, self.limit = kw['penalty_max'], kw['cost_limit']
        self.pid_i = kw['lagrangian_multiplier_init']
        self.cost_ds = deque(maxlen=kw['pid_d_delay'])
        self.cost_ds.append(0.0)
        self.delta_p = 0.0
        self.cost_d = 0.0
        self.penalty = 0.0

    def update(self, ep_cost):
        delta = float(ep_cost - self.limit)
        self.pid_i = max(0.0, self.pid_i + delta * self.ki)
        if self.diff_norm:
            self.pid_i = max(0.0, min(1.0, self.pid_i))
        self.delta_p = self.ap * self.delta_p + (1 - self.ap) * delta
        self.cost_d = self.ad * self.cost_d + (1 - self.ad) * float(ep_cost)
        pid_d = max(0.0, self.cost_d - self.cost_ds[0])
        pid_o = self.kp * self.delta_p + self.pid_i + self.kd * pid_d
        self.penalty = max(0.0, pid_o)
        if self.diff_norm:
            self.penalty = min(1.0, self.penalty)
        if not (self.diff_norm or self.sum_norm):
            self.penalty = min(self.penalty, self.pmax)
        self.cost_ds.append(self.cost_d)
        return self.penalty


def test_pid_lagrangian_matches_reference_semantics():
    kw = dict(pid_kp=0.1, pid_ki=0.01, pid_kd=0.01, pid_d_delay=4,
              pid_delta_p_ema_alpha=0.95, pid_delta_d_ema_alpha=0.95,
              sum_norm=True, diff_norm=False, penalty_max=100.0,
              lagrangian_multiplier_init=0.001, cost_limit=25.0)
    pid = PIDLagrangian(**kw)
    ref = _RefPID(**kw)
    state = pid.init()
    rng = np.random.default_rng(0)
    for _ in range(30):
        cost = float(rng.uniform(0, 80))
        state = pid.update(state, jnp.asarray(cost))
        expected = ref.update(cost)
        np.testing.assert_allclose(float(state.multiplier), expected, rtol=1e-5, atol=1e-6)


def test_pid_lagrangian_d_delay_one():
    kw = dict(pid_kp=0.1, pid_ki=0.01, pid_kd=0.5, pid_d_delay=1,
              pid_delta_p_ema_alpha=0.5, pid_delta_d_ema_alpha=0.5,
              sum_norm=False, diff_norm=False, penalty_max=10.0,
              lagrangian_multiplier_init=0.0, cost_limit=5.0)
    pid = PIDLagrangian(**kw)
    ref = _RefPID(**kw)
    state = pid.init()
    for cost in [10.0, 2.0, 30.0, 0.0, 12.0]:
        state = pid.update(state, jnp.asarray(cost))
        expected = ref.update(cost)
        np.testing.assert_allclose(float(state.multiplier), expected, rtol=1e-5, atol=1e-6)


def test_lagrange_adam_matches_torch_reference():
    """λ ascent must match the reference's torch Adam step-for-step —
    including bias correction, eps placement, and the post-step clamp that
    leaves Adam moments intact (reference: omnisafe/common/lagrange.py:99-136).
    The off-policy trainers now take one such step per update iteration, so
    per-step equivalence is the whole cadence-parity story."""
    import torch

    lr = 1e-5
    lag = Lagrange(cost_limit=25.0, lagrangian_multiplier_init=0.001,
                   lambda_lr=lr, lambda_optimizer='Adam')
    state = lag.init()

    param = torch.nn.Parameter(torch.as_tensor(0.001))
    opt = torch.optim.Adam([param], lr=lr)
    rng = np.random.default_rng(3)
    jcs = rng.uniform(0.0, 975.0, size=200)
    for jc in jcs:
        state = lag.update(state, jnp.asarray(jc, jnp.float32))
        opt.zero_grad()
        loss = -param * (float(jc) - 25.0)
        loss.backward()
        opt.step()
        param.data.clamp_(0.0)
        np.testing.assert_allclose(float(state.multiplier), float(param.data),
                                   rtol=1e-5, atol=1e-7)
