"""Numerical-health guards (SURVEY.md §5.2).

XLA's execution is deterministic, so the reference's runtime warnings
(lucky breakdown ``lanczos_krylov.m:91-93``, max-iteration
``trace_fun_update.m:128-130``) surface here as *status flags* carried in
results (no exceptions inside jit), plus the helpers below for NaN/Inf
detection in the Taylor/trace loops. Enable global NaN debugging with
``jax.config.update("jax_debug_nans", True)`` during development.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NumericsReport:
    finite: bool
    max_abs: float
    name: str

    def raise_if_bad(self):
        if not self.finite:
            raise FloatingPointError(
                f"non-finite values detected in {self.name} "
                f"(max |x| = {self.max_abs})"
            )
        return self


def check_finite(x, name: str = "array") -> NumericsReport:
    """Host-side finite check of any pytree (pulls two scalars)."""
    leaves = jax.tree_util.tree_leaves(x)
    finite = True
    max_abs = 0.0
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            continue
        finite = finite and bool(jnp.all(jnp.isfinite(arr)))
        if arr.size:
            max_abs = max(max_abs, float(jnp.max(jnp.abs(arr))))
    return NumericsReport(finite=finite, max_abs=max_abs, name=name)


def finite_mask(x: jax.Array, axis=None) -> jax.Array:
    """Jit-safe per-batch finiteness flags (reduce over all but ``axis``)."""
    ok = jnp.isfinite(x)
    if axis is None:
        return jnp.all(ok)
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
    return jnp.all(ok, axis=reduce_axes)


def checkified(fn, *args, **kwargs):
    """Run fn under jax.experimental.checkify to capture div/NaN errors."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.user_checks
    )
    err, out = checked(*args, **kwargs)
    return err, out
