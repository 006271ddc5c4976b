"""Lazy module proxies for jax.

Importing jax costs ~2.3 s — longer than most host-only CLI commands'
entire runtime (union/inter/view/... never touch the device).  Modules
whose module-level code does not need jax import these proxies instead;
the real import happens on first attribute access, i.e. only when a
device path actually runs.  unikmer_tpu/__init__ installs a post-import
hook that configures jax (x64, compile cache, platform) the moment the
real module loads, so configuration ordering is preserved no matter who
triggers it.
"""

from __future__ import annotations

import importlib


class LazyModule:
    """Attribute-forwarding proxy; resolves the module on first use."""

    __slots__ = ("_name",)

    def __init__(self, name: str):
        self._name = name

    def __getattr__(self, attr):
        return getattr(importlib.import_module(self._name), attr)

    def __repr__(self):  # pragma: no cover
        return f"<lazy module {self._name!r}>"


jax = LazyModule("jax")
jnp = LazyModule("jax.numpy")
lax = LazyModule("jax.lax")
