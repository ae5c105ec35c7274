"""Component registry (mega_core/utils/registry.py parity).

A dict with a register() decorator so user code can hook custom backbones /
extractors / predictors into the builders by name.
"""

from __future__ import annotations


class Registry(dict):
    def register(self, name: str, module=None):
        if module is not None:
            self._do_register(name, module)
            return module

        def deco(fn):
            self._do_register(name, fn)
            return fn

        return deco

    def _do_register(self, name: str, module) -> None:
        assert name not in self, f"{name} already registered"
        self[name] = module


BACKBONES = Registry()
RPN_HEADS = Registry()
ROI_BOX_FEATURE_EXTRACTORS = Registry()
ROI_BOX_PREDICTORS = Registry()
