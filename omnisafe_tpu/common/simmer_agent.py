"""Simmer PID budget controller.

Counterpart of the reference's ``SimmerPIDAgent``
(reference: omnisafe/common/simmer_agent.py:98-190): a host-side PID
controller adjusting the saute safety budget once per epoch from the observed
episode costs.  Host-side Python is fine here — it runs once per epoch
between jitted programs, exactly like the reference runs it between updates.
"""

from __future__ import annotations

from collections import deque
from typing import Deque


class SimmerPIDAgent:
    """PID controller over the safety budget."""

    def __init__(self, kp: float, ki: float, kd: float, polyak: float,
                 budget_bound: float) -> None:
        self._kp, self._ki, self._kd = kp, ki, kd
        self._polyak = polyak
        self._budget_bound = budget_bound
        self._prev_action = 0.0
        self._prev_error = 0.0
        self._prev_raw_action = 0.0
        self._integral_history: Deque[float] = deque([], maxlen=10)

    def act(self, safety_budget: float, observation: float) -> float:
        """One control step (reference: simmer_agent.py:132-190)."""
        current_error = safety_budget - observation
        blurred = self._polyak * self._prev_error + (1.0 - self._polyak) * current_error
        self._integral_history.append(blurred)
        p_part = self._kp * blurred
        i_part = self._ki * sum(self._integral_history)
        d_part = self._kd * (self._prev_action - self._prev_raw_action)
        raw_action = p_part + i_part + d_part
        action = min(max(raw_action, -1.0), 1.0)
        eps = 1e-6
        next_budget = min(max(safety_budget + action, eps), self._budget_bound)
        action = next_budget - safety_budget
        self._prev_action = action
        self._prev_raw_action = raw_action
        self._prev_error = blurred
        return next_budget


__all__ = ['SimmerPIDAgent']
