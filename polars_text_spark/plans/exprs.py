"""Expression-level let-binding for Catalyst.

Catalyst has no ``let``: referencing a sub-expression twice inside one
Column copies its whole subtree, and per-element references inside
higher-order-function lambdas re-evaluate it PER ELEMENT — the O(d^2)
inlining pathology documented in SCALING.md (l2_normalize, winnowing,
int8 quantization all hit it; the int8 case measured 41 s -> 1.4 s at
sf0.1 once fixed).

The projection-staging fix (``withColumn`` intermediates) needs a
DataFrame. :func:`let` is the COLUMN-level equivalent: wrap the value
in a 1-element array and apply the body through ``transform`` —

    transform(array(value), v -> body(v))[0]

``value`` is evaluated once per row; every use of ``v`` inside the body
is a lambda-variable REFERENCE (an attribute lookup at eval time), and
the optimizer cannot substitute a subtree through a lambda binding, so
no re-inlining happens. Nesting works like nested closures.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["let"]


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` to a lambda variable and return ``body(var)``.

    Evaluates ``value`` exactly once per row no matter how many times
    (or how deep inside nested lambdas) the body references it.
    """
    return F.transform(F.array(value), body)[0]
