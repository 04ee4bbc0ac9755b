"""Pure-functional CMDP contract and environment registry.

TPU-native re-design of the reference's environment layer (reference:
omnisafe/envs/core.py:37-421).  The reference's ``step`` mutates an object and
returns numpy/torch tensors; here a CMDP is a *pure function of explicit
state*::

    state, obs          = env.reset(key)
    state, ts: TimeStep = env.step(state, action, key)

so an environment can be ``vmap``-ed to thousands of parallel rollouts,
``lax.scan``-ned over time inside one jitted program, and sharded over a
device mesh — replacing the reference's process-level ``vector_env_nums``
(reference: omnisafe/envs/safety_gymnasium_env.py:139) with a compiler-visible
batch axis.

The distinguishing safe-RL contract is preserved: every step yields a *cost*
channel next to the reward (reference: omnisafe/envs/core.py:81-117).
"""

from __future__ import annotations

import abc
from typing import Any, Callable, ClassVar, Dict, List, Tuple, Type

import jax
import jax.numpy as jnp
from flax import struct

from omnisafe_tpu.envs.spaces import Box

Array = jax.Array


@struct.dataclass
class TimeStep:
    """One transition of a CMDP.

    ``final_obs`` carries the pre-reset observation when auto-reset fires in
    the same step — the functional equivalent of the reference's
    ``info['final_observation']`` convention (reference:
    omnisafe/envs/wrapper.py:115-176).
    """

    obs: Array
    reward: Array
    cost: Array
    terminated: Array
    truncated: Array
    final_obs: Array
    info: Dict[str, Array] = struct.field(default_factory=dict)

    @property
    def done(self) -> Array:
        return jnp.logical_or(self.terminated, self.truncated)


class CMDP(abc.ABC):
    """Abstract pure-JAX constrained MDP (reference: omnisafe/envs/core.py:37-182).

    Subclasses define ``reset``/``step`` as pure functions.  Instances hold
    only *static* configuration (sizes, physics constants); all dynamic state
    lives in the pytree returned by ``reset``.
    """

    _support_envs: ClassVar[List[str]] = []
    need_time_limit_wrapper: bool = True
    need_auto_reset_wrapper: bool = True
    # host-backed envs own their whole batch (and auto-reset) themselves; the
    # adapter then skips TimeLimit/AutoReset/Vectorize
    is_vectorized: bool = False
    env_spec_log: Dict[str, float] = {}

    def __init__(self, env_id: str, **kwargs: Any) -> None:
        if env_id not in self._support_envs:
            raise NotImplementedError(f'{env_id} is not supported by {type(self).__name__}')
        self._env_id = env_id

    @classmethod
    def support_envs(cls) -> List[str]:
        return list(cls._support_envs)

    @property
    def env_id(self) -> str:
        return self._env_id

    @property
    @abc.abstractmethod
    def observation_space(self) -> Box:
        ...

    @property
    @abc.abstractmethod
    def action_space(self) -> Box:
        ...

    @property
    def max_episode_steps(self) -> int:
        return 1000

    @abc.abstractmethod
    def reset(self, key: Array):
        """Returns ``(state, obs)``."""

    @abc.abstractmethod
    def step(self, state, action: Array, key: Array) -> Tuple[Any, TimeStep]:
        """Returns ``(state, TimeStep)``."""


class Wrapper(CMDP):
    """Base wrapper forwarding everything to the wrapped env.

    Functional analogue of the reference's attribute-forwarding ``Wrapper``
    (reference: omnisafe/envs/core.py:185-297) — but wrapper state is nested
    explicitly inside the wrapped state pytree rather than hidden in ``self``.
    """

    def __init__(self, env: CMDP) -> None:  # pylint: disable=super-init-not-called
        self._env = env
        self._env_id = env.env_id

    def __getattr__(self, name: str) -> Any:
        if name.startswith('_'):
            raise AttributeError(f'attempted to get missing private attribute {name!r}')
        return getattr(self._env, name)

    @property
    def observation_space(self) -> Box:
        return self._env.observation_space

    @property
    def action_space(self) -> Box:
        return self._env.action_space

    @property
    def max_episode_steps(self) -> int:
        return self._env.max_episode_steps

    def reset(self, key: Array):
        return self._env.reset(key)

    def step(self, state, action: Array, key: Array):
        return self._env.step(state, action, key)


_ENV_REGISTRY: Dict[str, Type[CMDP]] = {}


def env_register(cls: Type[CMDP]) -> Type[CMDP]:
    """Class decorator registering a CMDP's supported ids
    (reference: omnisafe/envs/core.py:300-360)."""
    if not issubclass(cls, CMDP):
        raise TypeError(f'{cls} must inherit from CMDP')
    for env_id in cls.support_envs():
        if env_id in _ENV_REGISTRY:
            raise ValueError(f'duplicated env id: {env_id}')
        _ENV_REGISTRY[env_id] = cls
    return cls


_UNAVAILABLE: Dict[str, str] = {}


def register_unavailable(env_ids: List[str], reason: str) -> None:
    """Record ids whose backend exists but whose third-party dependency is
    missing from this installation (mirrors the reference's optional
    MetaDrive/Isaac Gym backends, omnisafe/envs/meta_drive_env.py:67-69),
    so ``make`` can explain rather than claim the id is unknown."""
    for env_id in env_ids:
        if env_id not in _ENV_REGISTRY:
            _UNAVAILABLE[env_id] = reason


def support_envs() -> List[str]:
    return sorted(_ENV_REGISTRY)


def make(env_id: str, **kwargs: Any) -> CMDP:
    """Instantiate the registered env class for ``env_id``
    (reference: omnisafe/envs/core.py:363-421)."""
    if env_id not in _ENV_REGISTRY:
        if env_id in _UNAVAILABLE:
            raise NotImplementedError(
                f'{env_id} is supported but unavailable here: {_UNAVAILABLE[env_id]}'
            )
        raise NotImplementedError(f'{env_id} is not registered; known: {support_envs()}')
    return _ENV_REGISTRY[env_id](env_id, **kwargs)


__all__ = [
    'TimeStep',
    'CMDP',
    'Wrapper',
    'env_register',
    'register_unavailable',
    'support_envs',
    'make',
]
