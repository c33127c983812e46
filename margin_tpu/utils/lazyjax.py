"""Lazy jax import shim.

Worker processes in `--workers process` mode never touch a device — device
scoring rides the IPC socket to the parent — yet importing jax costs ~1.8 s
per process, the single largest fixed cost of a worker's life. Modules on
the worker import path pull jax through these proxies instead, so the
import happens only when a kernel (or jit wrapper) actually runs.

Usage:
    from margin_tpu.utils.lazyjax import jax, jnp, lazy_jit

    @lazy_jit(static_argnames=("k",))
    def kernel(x, k): ...
"""

from __future__ import annotations

import importlib


class _LazyModule:
    __slots__ = ("_name", "_mod")

    def __init__(self, name: str):
        object.__setattr__(self, "_name", name)
        object.__setattr__(self, "_mod", None)

    def _load(self):
        mod = importlib.import_module(self._name)
        object.__setattr__(self, "_mod", mod)
        return mod

    def __getattr__(self, attr):
        mod = self._mod or self._load()
        return getattr(mod, attr)


jax = _LazyModule("jax")
jnp = _LazyModule("jax.numpy")
lax = _LazyModule("jax.lax")


def lazy_jit(**jit_kwargs):
    """functools.partial(jax.jit, **kw) that defers the jax import (and the
    jit wrapping) until the first call."""
    def deco(fn):
        box = []

        def wrapper(*args, **kwargs):
            if not box:
                import jax as _jax
                box.append(_jax.jit(fn, **jit_kwargs))
            return box[0](*args, **kwargs)

        wrapper.__name__ = getattr(fn, "__name__", "lazy_jit")
        wrapper.__doc__ = fn.__doc__
        wrapper.__wrapped__ = fn
        return wrapper
    return deco
