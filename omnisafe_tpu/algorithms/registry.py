"""Algorithm registry (reference: omnisafe/algorithms/registry.py:23-70)."""

from __future__ import annotations

from typing import Any, Dict, Type


class Registry:
    """String -> class map populated by the ``@registry.register`` decorator."""

    def __init__(self, name: str) -> None:
        self._name = name
        self._module_dict: Dict[str, Type[Any]] = {}

    def register(self, module_class: Type[Any]) -> Type[Any]:
        name = module_class.__name__
        if name in self._module_dict:
            raise KeyError(f'{name} is already registered in {self._name}')
        self._module_dict[name] = module_class
        return module_class

    def get(self, name: str) -> Type[Any]:
        if name not in self._module_dict:
            raise KeyError(f'{name} is not registered; known: {sorted(self._module_dict)}')
        return self._module_dict[name]

    def keys(self):
        return self._module_dict.keys()


REGISTRY = Registry('omnisafe_tpu')
registry = REGISTRY

__all__ = ['Registry', 'REGISTRY', 'registry']
