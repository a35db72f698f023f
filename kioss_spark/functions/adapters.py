"""Function adapters, matching the reference's semantics.

- ``star(f)``   — n-ary fn -> fn taking one tuple/list/dict element
  (reference: streamable/util/functiontools.py:60-116).
- ``sidify(f)`` — side-effect fn -> identity-returning fn; powers ``foreach``
  (reference: streamable/util/functiontools.py:32-42; rewrite
  streamable/visitors/iterator.py:57-66).
- ``async_sidify(f)`` — same for coroutine fns
  (reference: streamable/util/functiontools.py:45-57).

All adapters preserve picklability (``functools.partial`` of module-level
callables) so they survive the Spark-worker pickle boundary — the same
constraint the reference has for its process pool
(reference: tests/test_stream.py:402-408).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Coroutine, Mapping


def _starred(f: Callable, element: Any) -> Any:
    if isinstance(element, Mapping):
        return f(**element)
    return f(*element)


def star(f: Callable) -> Callable[[Any], Any]:
    """Adapt an n-ary function to take a single tuple/list/dict element."""
    return functools.partial(_starred, f)


def _sidified(f: Callable, element: Any) -> Any:
    f(element)
    return element


def sidify(f: Callable[[Any], Any]) -> Callable[[Any], Any]:
    """Adapt a side-effect function into an identity function."""
    return functools.partial(_sidified, f)


def async_sidify(f: Callable[[Any], Coroutine]) -> Callable[[Any], Coroutine]:
    """Adapt an async side-effect function into an async identity function."""

    @functools.wraps(f)
    async def wrapper(element: Any) -> Any:
        await f(element)
        return element

    return wrapper
