"""Annealing schedules (reference: omnisafe/utils/schedule.py:28-93)."""

from __future__ import annotations

from typing import List, Sequence, Tuple


def _linear_interpolation(left: float, right: float, alpha: float) -> float:
    return left + alpha * (right - left)


class PiecewiseSchedule:
    """Piecewise-linear schedule over epochs, used for std annealing
    (reference: omnisafe/utils/schedule.py:40-78 and
    omnisafe/models/actor_critic/actor_critic.py:157-183)."""

    def __init__(
        self,
        endpoints: Sequence[Tuple[int, float]],
        outside_value: float,
    ) -> None:
        indexes = [e[0] for e in endpoints]
        assert indexes == sorted(indexes), 'endpoints must be sorted by time'
        self._endpoints: List[Tuple[int, float]] = list(endpoints)
        self._outside_value = outside_value

    def value(self, time: int) -> float:
        for (l_t, l_v), (r_t, r_v) in zip(self._endpoints[:-1], self._endpoints[1:]):
            if l_t <= time < r_t:
                alpha = float(time - l_t) / (r_t - l_t)
                return _linear_interpolation(l_v, r_v, alpha)
        return self._outside_value


class ConstantSchedule:
    """Constant schedule (reference: omnisafe/utils/schedule.py:81-93)."""

    def __init__(self, value: float) -> None:
        self._value = value

    def value(self, time: int) -> float:  # pylint: disable=unused-argument
        return self._value


__all__ = ['PiecewiseSchedule', 'ConstantSchedule']
