"""Minimal name->class registries binding config strings to implementations.

Mirrors the reference plugin system (reference: net_utils/registry.py:6-48,
models/registers.py:6-8) with a plain dict — enough to keep the YAML
``method:`` / ``loss:`` strings working.
"""


class Registry:
    def __init__(self, name):
        self.name = name
        self._modules = {}

    def register(self, cls_or_name=None):
        """Use as ``@REG.register()`` or ``@REG.register('Alias')``."""
        if isinstance(cls_or_name, str):
            key = cls_or_name

            def deco(cls):
                self._modules[key] = cls
                return cls

            return deco
        cls = cls_or_name
        self._modules[cls.__name__] = cls
        return cls

    def get(self, key, alter_key=None):
        if key in self._modules:
            return self._modules[key]
        if alter_key is not None and alter_key in self._modules:
            return self._modules[alter_key]
        raise KeyError(
            f"{key!r} not found in registry {self.name!r}; "
            f"available: {sorted(self._modules)}"
        )

    def __contains__(self, key):
        return key in self._modules


METHODS = Registry("methods")
MODULES = Registry("modules")
LOSSES = Registry("losses")
