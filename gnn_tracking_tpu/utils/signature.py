"""Kwarg-tolerance helpers (capability parity: reference utils/signature.py)."""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable


def get_all_argument_names(func: Callable) -> list[str]:
    """All named (positional-or-keyword / keyword-only) argument names."""
    sig = inspect.signature(func)
    return [
        p.name
        for p in sig.parameters.values()
        if p.kind
        in (inspect.Parameter.POSITIONAL_OR_KEYWORD, inspect.Parameter.KEYWORD_ONLY)
    ]


def remove_irrelevant_arguments(func: Callable, kwargs: dict[str, Any]) -> dict[str, Any]:
    """Drop kwargs that are not named arguments of ``func``."""
    names = set(get_all_argument_names(func))
    return {k: v for k, v in kwargs.items() if k in names}


def tolerate_additional_kwargs(func: Callable) -> Callable:
    """Decorator: accept and ignore extra keyword arguments."""

    @functools.wraps(func)
    def wrapped(**kwargs):
        return func(**remove_irrelevant_arguments(func, kwargs))

    return wrapped
