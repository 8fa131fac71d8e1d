"""Registry of the scalar functions f the framework applies to matrices.

The reference supports f in {exp, sinh, cosh} for the robustness functional
trace(f(A)) (``functions/fun_update.m:42-59`` maps scalar handles to dense
matrix functions). Derivative pairs power the continuous gradient path
(``Tests/test_weighted_sinh_lbfgs.m:15-18``: f=sinh, df=cosh).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ScalarFun:
    name: str
    fn: Callable
    derivative: str  # name of the derivative function in the registry

    def __call__(self, x):
        return self.fn(x)


_REGISTRY: dict[str, ScalarFun] = {}


def _register(name: str, fn, derivative: str):
    _REGISTRY[name] = ScalarFun(name=name, fn=fn, derivative=derivative)


_register("exp", jnp.exp, "exp")
_register("sinh", jnp.sinh, "cosh")
_register("cosh", jnp.cosh, "sinh")
_register("identity", lambda x: x, "one")
_register("one", jnp.ones_like, "zero")
_register("zero", jnp.zeros_like, "zero")


def get_fun(f) -> ScalarFun:
    if isinstance(f, ScalarFun):
        return f
    if isinstance(f, str):
        return _REGISTRY[f]
    raise TypeError(f"unknown scalar function spec: {f!r}")


def derivative_of(f) -> ScalarFun:
    return _REGISTRY[get_fun(f).derivative]
