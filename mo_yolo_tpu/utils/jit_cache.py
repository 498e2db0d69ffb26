"""Process-wide cache of jitted model-method step functions.

Validators and predictors are constructed per call (reference style:
`model.val()` builds a fresh validator each time). Each construction used
to `jax.jit` a fresh lambda, and jax caches compiled executables on the
*function identity* — so every `val()`/`predict()` call paid a full XLA
compile of the same (model, method, shapes) step. With per-epoch in-train
validation that is one recompile per epoch.

The cache is keyed by (id(model), method name) and validated with a
weakref so a garbage-collected model whose id is reused can never serve a
stale step bound to the old model.
"""
from __future__ import annotations

import weakref

_CACHE: dict = {}


def jitted_method(model, method_name: str):
    """A jitted `(variables, *args) -> model.apply(variables, *args,
    method=<method>)` shared across all callers for this model object."""
    import jax

    key = (id(model), method_name)
    hit = _CACHE.get(key)
    if hit is not None:
        ref, fn = hit
        if ref() is model:
            return fn
    method = getattr(model, method_name)
    fn = jax.jit(lambda v, *a: model.apply(v, *a, method=method))
    try:
        _CACHE[key] = (weakref.ref(model), fn)
    except TypeError:       # non-weakref-able model: still works, uncached
        pass
    return fn
