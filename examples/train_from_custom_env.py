"""Register a custom pure-JAX CMDP and train on it
(reference analogue: examples/train_from_custom_env.py +
omnisafe/envs/custom_env.py:32-199)."""

import jax
import jax.numpy as jnp
from flax import struct

import omnisafe_tpu
from omnisafe_tpu.envs.core import CMDP, TimeStep, env_register
from omnisafe_tpu.envs.spaces import Box


@struct.dataclass
class MyState:
    pos: jax.Array


@env_register
class MyCustomEnv(CMDP):
    """A 1-D target-reaching task: reward for moving right, cost past 0.8."""

    _support_envs = ['MyCustom-v0']

    @property
    def observation_space(self) -> Box:
        return Box.create(-1.0, 1.0, (1,))

    @property
    def action_space(self) -> Box:
        return Box.create(-1.0, 1.0, (1,))

    @property
    def max_episode_steps(self) -> int:
        return 50

    def reset(self, key):
        pos = jax.random.uniform(key, (1,), minval=-0.5, maxval=0.5)
        return MyState(pos=pos), pos

    def step(self, state, action, key):
        pos = jnp.clip(state.pos + 0.05 * action, -1.0, 1.0)
        ts = TimeStep(
            obs=pos,
            reward=action[0],
            cost=(pos[0] > 0.8).astype(jnp.float32),
            terminated=jnp.zeros((), bool),
            truncated=jnp.zeros((), bool),
            final_obs=pos,
        )
        return MyState(pos=pos), ts


if __name__ == '__main__':
    agent = omnisafe_tpu.Agent(
        'PPOLag',
        'MyCustom-v0',
        custom_cfgs={
            'train_cfgs': {'total_steps': 40960, 'vector_env_nums': 8},
            'algo_cfgs': {'steps_per_epoch': 2048},
        },
    )
    print(agent.learn())
