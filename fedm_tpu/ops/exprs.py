"""Safe arithmetic-expression compiler for coefficient files.

The reference `eval`s user-supplied Python strings from input files for
`fun:*` coefficient dependences (`/root/reference/fedm/file_io.py:463-470`,
`fedm/functions.py:730-737` — a documented injection hazard,
`functions.py:656-659`). Here the same expressions are parsed with the
`ast` module into a whitelisted arithmetic tree and compiled to a
jax-traceable callable — no code execution, and the result differentiates
and jits like any other part of the residual.

Supported grammar: numbers, named variables (e.g. `E_m`, `Te`, `Tgas`),
+ - * / ** with unary minus, and the functions exp, log, log10, sqrt, abs,
sin, cos, tanh, minimum, maximum. This covers the expressions shipped with
the reference workloads, e.g. the streamer's
`2.3987*E_m**(-0.26)` mobility and
`(1.1944e6 + 4.3666e26*E_m**(-3))*exp(-2.73e7/E_m)-340.75` ionisation
coefficient (`examples/streamer_discharge/fedm-streamer.py:237-239`).
"""

from __future__ import annotations

import ast
import math
from typing import Callable, Dict

import jax.numpy as jnp

_FUNCS = {
    "exp": jnp.exp,
    "log": jnp.log,
    "log10": jnp.log10,
    "sqrt": jnp.sqrt,
    "abs": jnp.abs,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tanh": jnp.tanh,
    "minimum": jnp.minimum,
    "maximum": jnp.maximum,
}

_CONSTS = {
    "pi": math.pi,
    "e": math.e,
}

_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Pow: lambda a, b: a**b,
}


class ExpressionError(ValueError):
    pass


def _check(node: ast.AST) -> None:
    if isinstance(node, ast.Expression):
        _check(node.body)
    elif isinstance(node, ast.BinOp):
        if type(node.op) not in _BINOPS:
            raise ExpressionError(f"operator {ast.dump(node.op)} not allowed")
        _check(node.left)
        _check(node.right)
    elif isinstance(node, ast.UnaryOp):
        if not isinstance(node.op, (ast.USub, ast.UAdd)):
            raise ExpressionError("only unary +/- allowed")
        _check(node.operand)
    elif isinstance(node, ast.Call):
        if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
            raise ExpressionError(
                f"function call not allowed: {ast.dump(node.func)}"
            )
        if node.keywords:
            raise ExpressionError("keyword arguments not allowed")
        for arg in node.args:
            _check(arg)
    elif isinstance(node, ast.Constant):
        if not isinstance(node.value, (int, float)):
            raise ExpressionError(f"constant {node.value!r} not allowed")
    elif isinstance(node, ast.Name):
        pass  # resolved at call time against variables/constants
    else:
        raise ExpressionError(f"syntax not allowed: {ast.dump(node)}")


def _evaluate(node: ast.AST, env: Dict):
    if isinstance(node, ast.Expression):
        return _evaluate(node.body, env)
    if isinstance(node, ast.BinOp):
        return _BINOPS[type(node.op)](
            _evaluate(node.left, env), _evaluate(node.right, env)
        )
    if isinstance(node, ast.UnaryOp):
        v = _evaluate(node.operand, env)
        return -v if isinstance(node.op, ast.USub) else v
    if isinstance(node, ast.Call):
        args = [_evaluate(a, env) for a in node.args]
        return _FUNCS[node.func.id](*args)
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Name):
        if node.id in env:
            return env[node.id]
        if node.id in _CONSTS:
            return _CONSTS[node.id]
        raise ExpressionError(f"unknown variable '{node.id}'")
    raise AssertionError("unreachable: node kinds rejected in _check")


def compile_expression(text: str) -> Callable[..., object]:
    """Compile an arithmetic expression string into `f(**variables)`.

    >>> mu = compile_expression("2.3987*E_m**(-0.26)")
    >>> mu(E_m=jnp.asarray([1e6]))
    """
    try:
        tree = ast.parse(text.strip(), mode="eval")
    except SyntaxError as exc:
        raise ExpressionError(f"cannot parse expression: {text!r}") from exc
    _check(tree)

    def fn(**variables):
        return _evaluate(tree, variables)

    fn.source = text
    return fn
