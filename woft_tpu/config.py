"""Executable-python config system.

Mirrors the reference surface (ref:pytracking/utils/config.py:5-43): a
``Config`` attribute bag whose missing attributes resolve to an empty *falsy*
``Config`` (so ``C.foo.bar.baz`` never raises and configs only state
deviations from defaults), plus ``load_config(path)`` which imports a config
file and calls its ``get_config()``.

Functions are first-class config values (H estimators, success predicates,
subsamplers), matching the reference idiom, but anything that must live
inside a jitted pipeline is carried as static data (enums / numbers) instead
of closures.
"""

import importlib.util
import logging

logger = logging.getLogger(__name__)


class Config:
    """Attribute bag with falsy empty-Config for missing keys."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __getattr__(self, name):
        # Only called when attribute is NOT found: missing keys are falsy.
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return Config()

    def __bool__(self):
        # An empty config is falsy so `if C.maybe.missing:` works without
        # defaults; a config with any key set is truthy.
        return bool(self.__dict__)

    def __eq__(self, other):
        if isinstance(other, Config):
            return self.__dict__ == other.__dict__
        if not self.__dict__ and other in (None, False):
            return NotImplemented
        return NotImplemented

    def __hash__(self):
        return object.__hash__(self)

    def merge(self, other, update_dicts=False):
        """Overwrite/extend our keys with the other config's keys."""
        for key, value in other.__dict__.items():
            if key in self.__dict__:
                if (update_dicts and isinstance(value, dict)
                        and isinstance(getattr(self, key), dict)):
                    getattr(self, key).update(value)
                else:
                    logger.debug("Rewriting config key [%s] (%r -> %r)",
                                 key, getattr(self, key), value)
                    setattr(self, key, value)
            else:
                setattr(self, key, value)

    def to_dict(self):
        return dict(self.__dict__)

    def __repr__(self):
        return f"Config({self.__dict__!r})"


def load_config(path):
    """Import an executable config file and return its ``get_config()``."""
    spec = importlib.util.spec_from_file_location("woft_tpu_dynamic_config",
                                                  str(path))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module.get_config()
