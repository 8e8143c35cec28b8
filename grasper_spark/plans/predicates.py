"""Predicate kernel.

Reference semantics: /root/reference/base/predicate.cpp:100-150 and enum
Predicate_T (/root/reference/base/type.hpp:412): eq, neq, lt, lte, gt,
gte, inside (exclusive), outside, between (inclusive), within, without,
any, none.  Numeric int/double cross-comparison is supported
(/root/reference/base/predicate.cpp:28-44) — Spark's numeric coercion
covers that natively.

Missing-property semantics: `has(key, pred)` keeps only elements that
HAVE the key and satisfy the predicate, so every compiled condition is
null-rejecting (Spark comparisons with NULL are already false-ish under
filter; `neq` and `without` need explicit isNotNull guards).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Pred:
    op: str
    args: tuple[Any, ...] = ()

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.op}({', '.join(map(repr, self.args))})"


class P:
    """Predicate builders mirroring the reference's Predicate_T."""

    @staticmethod
    def eq(v: Any) -> Pred:
        return Pred("eq", (v,))

    @staticmethod
    def neq(v: Any) -> Pred:
        return Pred("neq", (v,))

    @staticmethod
    def lt(v: Any) -> Pred:
        return Pred("lt", (v,))

    @staticmethod
    def lte(v: Any) -> Pred:
        return Pred("lte", (v,))

    @staticmethod
    def gt(v: Any) -> Pred:
        return Pred("gt", (v,))

    @staticmethod
    def gte(v: Any) -> Pred:
        return Pred("gte", (v,))

    @staticmethod
    def inside(a: Any, b: Any) -> Pred:
        """Exclusive (a, b) — predicate.cpp:118-121."""
        return Pred("inside", (a, b))

    @staticmethod
    def outside(a: Any, b: Any) -> Pred:
        """< a or > b — predicate.cpp:122-125."""
        return Pred("outside", (a, b))

    @staticmethod
    def between(a: Any, b: Any) -> Pred:
        """Inclusive [a, b] — predicate.cpp:126-129."""
        return Pred("between", (a, b))

    @staticmethod
    def within(*vals: Any) -> Pred:
        return Pred("within", tuple(vals))

    @staticmethod
    def without(*vals: Any) -> Pred:
        return Pred("without", tuple(vals))

    # ---- TextP-style string predicates (extension; TinkerPop TextP —
    # the reference predicate kernel is numeric/equality only) ----

    @staticmethod
    def containing(sub: str) -> Pred:
        return Pred("containing", (sub,))

    @staticmethod
    def notContaining(sub: str) -> Pred:
        return Pred("notContaining", (sub,))

    @staticmethod
    def startingWith(prefix: str) -> Pred:
        return Pred("startingWith", (prefix,))

    @staticmethod
    def endingWith(suffix: str) -> Pred:
        return Pred("endingWith", (suffix,))

    # has(key) with no value: "any value present"
    ANY = Pred("any", ())


_NUM_DTYPES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")

_TEXT_OPS = ("containing", "notContaining", "startingWith", "endingWith")


def _type_class(dtype: str | None) -> str | None:
    """Coercibility class of a Spark simple-type string (None = unknown,
    no gating)."""
    if dtype is None:
        return None
    if dtype.startswith(_NUM_DTYPES):
        return "num"
    if dtype == "boolean":
        return "bool"
    if dtype == "string":
        return "str"
    return "other"


def _lit_class(v: Any) -> str:
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float)):
        return "num"
    if isinstance(v, str):
        return "str"
    return "other"


def pred_to_condition(
    pred: Pred,
    col: Column,
    other: Sequence[Column] | None = None,
    dtype: str | None = None,
    other_dtypes: Sequence[str | None] | None = None,
) -> Column:
    """Compile a predicate against a column.

    ``other`` overrides literal args with Columns (the where-step form
    compares against history columns instead of literals).

    ``dtype`` (the column's simple-type string), when known, type-gates
    cross-class comparisons to the reference's behavior instead of
    letting Spark's ANSI casts throw at runtime: values of different
    classes are never `eq` and never ordered relative to each other
    (predicate.cpp:28-44 falls back to raw-byte `content` compares for
    mismatched types, i.e. equality is effectively always false there;
    we define ordered mismatches as no-match rather than byte order),
    so `eq`/`lt`/… → FALSE, `neq`/`without` → value-present, `within`
    considers only same-class list members. ``other_dtypes`` does the
    same for the column-vs-history form."""
    cls = _type_class(dtype)
    if cls is not None and pred.op not in ("any", "none"):
        if pred.op in _TEXT_OPS:
            if cls != "str":
                raise TypeError(
                    f"{pred.op}() needs a string operand, got {dtype}"
                )
        else:
            arg_cls = (
                [_type_class(d) for d in other_dtypes]
                if other is not None and other_dtypes is not None
                else [_lit_class(v) for v in pred.args] if other is None else []
            )
            mism = [c is not None and c != cls for c in arg_cls]
            if pred.op in ("within", "without") and other is None and any(mism):
                keep = [v for v, m in zip(pred.args, mism) if not m]
                if pred.op == "within":
                    return (
                        col.isin(keep) if keep else F.lit(False)
                    )
                return col.isNotNull() & (~col.isin(keep) if keep else F.lit(True))
            if pred.op in ("within", "without") and other is not None and any(mism):
                # History-column form: drop mismatched-class refs and compare
                # only the same-class ones, mirroring the literal keep-list.
                keep_refs = [c for c, m in zip(other, mism) if not m]
                if pred.op == "within":
                    cond = F.lit(False)
                    for x in keep_refs:
                        cond = cond | (col == x)
                    return cond
                cond = col.isNotNull()
                for x in keep_refs:
                    cond = cond & (col != x)
                return cond
            if any(mism):
                if pred.op == "neq":
                    return col.isNotNull()
                if pred.op == "without":
                    return col.isNotNull()
                return F.lit(False)
    a = list(other) if other is not None else [F.lit(v) for v in pred.args]
    op = pred.op
    if op == "any":
        return col.isNotNull()
    if op == "none":
        return col.isNull()
    if op == "eq":
        return col == a[0]
    if op == "neq":
        return col.isNotNull() & (col != a[0])
    if op == "lt":
        return col < a[0]
    if op == "lte":
        return col <= a[0]
    if op == "gt":
        return col > a[0]
    if op == "gte":
        return col >= a[0]
    if op == "inside":
        return (col > a[0]) & (col < a[1])
    if op == "outside":
        return (col < a[0]) | (col > a[1])
    if op == "between":
        return (col >= a[0]) & (col <= a[1])
    if op == "within":
        if other is None:
            return col.isin(list(pred.args))
        cond = F.lit(False)
        for x in a:
            cond = cond | (col == x)
        return cond
    if op == "without":
        if other is None:
            return col.isNotNull() & ~col.isin(list(pred.args))
        cond = col.isNotNull()
        for x in a:
            cond = cond & (col != x)
        return cond
    if op == "containing":
        return col.contains(a[0])
    if op == "notContaining":
        return col.isNotNull() & ~col.contains(a[0])
    if op == "startingWith":
        return col.startswith(a[0])
    if op == "endingWith":
        return col.endswith(a[0])
    raise ValueError(f"unknown predicate op: {op}")
