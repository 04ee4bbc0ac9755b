"""Adapter layer: rollout engines binding envs + wrappers to algorithms
(reference layer: omnisafe/adapter/**)."""

from omnisafe_tpu.adapter.onpolicy import OnPolicyAdapter, build_env_stack

__all__ = ['OnPolicyAdapter', 'build_env_stack']
