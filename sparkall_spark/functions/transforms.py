"""The closed transformation-function set of the reference, as Column ops.

Reference surface (SparkExecutor.scala:202-239, §2.8 of SURVEY.md):
``toInt``, ``scl(+N|-N|*N)``, ``skp(v)``, ``substit(a,b)``,
``replc(a,b)``, ``prefix(s)``, ``postfix(s)``.  Reference bugs fixed
here by design: ``substit`` uses when().otherwise() so non-matching rows
keep their value (reference nulls them, SparkExecutor.scala:219-225),
and ``prefix``/``postfix`` argument parsing is not string-mangled
(reference strips the wrong literal, SparkExecutor.scala:233,239).

``skp`` is a row filter, not a column expression, so the applier
returns (column, optional_filter).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


class TransformError(ValueError):
    pass


_FN_RE = re.compile(r"^(\w+)(?:\((.*)\))?$")


def transform_column(col: Column, fn: str) -> tuple[Column, Column | None]:
    """Apply one DSL function; returns (new column, optional row-filter)."""
    m = _FN_RE.match(fn.strip())
    if not m:
        raise TransformError(f"bad transformation: {fn!r}")
    name, arg = m.group(1), (m.group(2) or "")
    arg = arg.strip()

    # try_cast: reference semantics are null-on-failure (Spark 2.4 casts);
    # Spark 4 ANSI mode would throw on malformed input otherwise
    if name == "toInt":
        return col.try_cast("int"), None
    if name == "toLong":
        return col.try_cast("bigint"), None
    if name == "toDouble":
        return col.try_cast("double"), None
    if name == "toStr":
        return col.cast("string"), None
    if name == "scl":
        # scl(+60) / scl(-60) / scl(*2) — also reference's scl(_+60) spelling
        sm = re.match(r"^_?\s*([+\-*/])\s*(-?\d+(?:\.\d+)?)$", arg)
        if not sm:
            raise TransformError(f"bad scl argument: {arg!r}")
        op, n = sm.group(1), float(sm.group(2))
        n = int(n) if n == int(n) else n
        if op == "+":
            return col + F.lit(n), None
        if op == "-":
            return col - F.lit(n), None
        if op == "*":
            return col * F.lit(n), None
        return col / F.lit(n), None
    if name == "skp":
        return col, col != F.lit(_literal(arg))
    if name == "substit":
        a, b = _two_args(arg)
        return F.when(col == F.lit(a), F.lit(b)).otherwise(col), None
    if name == "replc":
        a, b = _two_args(arg)
        return F.regexp_replace(col.cast("string"), re.escape(a), b), None
    if name == "prefix":
        return F.concat(F.lit(_literal(arg)), col.cast("string")), None
    if name == "postfix":
        return F.concat(col.cast("string"), F.lit(_literal(arg))), None
    raise TransformError(f"unknown transformation {name!r}")


def apply_transform_chain(
    col: Column, fns: tuple[str, ...] | list[str]
) -> tuple[Column, list[Column]]:
    """Apply a dotted chain of DSL functions; collects row-filters."""
    filters: list[Column] = []
    for fn in fns:
        col, flt = transform_column(col, fn)
        if flt is not None:
            filters.append(flt)
    return col, filters


def _literal(arg: str):
    arg = arg.strip().strip('"')
    try:
        return int(arg)
    except ValueError:
        try:
            return float(arg)
        except ValueError:
            return arg


def _two_args(arg: str):
    parts = [p.strip() for p in arg.split(",")]
    if len(parts) != 2:
        raise TransformError(f"expected two arguments, got: {arg!r}")
    return _literal(parts[0]), _literal(parts[1])
