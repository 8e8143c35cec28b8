"""Differential testing: random type-valid step pipelines evaluated by
BOTH the DataFrame compiler and an independent pure-Python traverser
interpreter over the same fixed graph must agree on the result multiset.

The interpreter implements the reference's documented semantics directly
(traverser lists, per-traverser history, missing-key drops —
/root/reference/expert/*.hpp) with none of the compiler's machinery, so
a bug in the join/window/aggregation formulation can't hide: hypothesis
explores step compositions (filter→traverse→branch→barrier) far beyond
what the hand-written goldens cover.

Comparison rules sidestep documented nondeterminism:
- element streams compare as multisets of vid / (src,dst); scalar
  streams as multisets of values — the dedup survivor's HISTORY is
  arbitrary, so generated pipelines never read history after dedup().
- order().limit/range ties: only generated on scalar streams, where the
  boundary tie makes the value multiset deterministic anyway.
"""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from grasper_spark import G, P, PropertyGraph
from grasper_spark.plans.api import A, Order

# --------------------------------------------------------------------------
# fixed test graph (small but adversarial: missing props, multi-labels,
# reciprocal edges, self-referential 2-cycles, isolated vertex)
# --------------------------------------------------------------------------

VERTS = [
    # vid, label, age, name
    (1, "person", 29, "alice"),
    (2, "person", 27, "bob"),
    (3, "person", None, "carol"),  # missing age
    (4, "person", 32, None),       # missing name
    (5, "item", 29, "book"),       # age collides with alice
    (6, "item", 3, "pen"),
    (7, "item", None, None),       # all props missing
    (8, "person", 27, "dave"),     # age collides with bob
    (9, "item", 100, "rock"),
    (10, "person", 27, "erin"),    # isolated (no edges)
]

EDGES = [
    # src, dst, label, w
    (1, 2, "knows", 5),
    (2, 1, "knows", 7),    # reciprocal
    (1, 3, "knows", None), # missing w
    (3, 4, "knows", 2),
    (4, 1, "knows", 9),
    (1, 5, "likes", 1),
    (2, 5, "likes", 4),
    (2, 6, "likes", None),
    (3, 6, "likes", 8),
    (4, 9, "likes", 2),
    (8, 1, "knows", 5),
    (8, 9, "likes", 3),
    (5, 6, "rel", 1),      # item->item edge, third label
    (9, 5, "rel", 6),
    (6, 6, "rel", 4),      # self-loop: both() visits 6 twice via one edge
]

VLABELS = ["person", "item"]
ELABELS = ["knows", "likes", "rel"]
VPROPS = {"age": "long", "name": "string"}
EPROPS = {"w": "long"}

_VBY = {v[0]: {"label": v[1], "age": v[2], "name": v[3]} for v in VERTS}


@pytest.fixture(scope="module")
def g(spark):
    v = spark.createDataFrame(
        VERTS, "vid long, label string, age long, name string"
    )
    e = spark.createDataFrame(EDGES, "src long, dst long, label string, w long")
    pg = PropertyGraph(v, e, name="difftest")
    pg.vertices.cache().count()
    pg.edges.cache().count()
    return G(pg)


# --------------------------------------------------------------------------
# reference interpreter: lists of (kind, loc, hist) traversers
#   kind 'V': loc = vid     kind 'E': loc = (src, dst)   kind 'S': loc = value
# --------------------------------------------------------------------------


def _cls(v):
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float)):
        return "num"
    return type(v).__name__


def _match(pred, v, hist=None):
    """Predicate kernel twin (plans/predicates.py): null never matches;
    between is INCLUSIVE [a,b] (predicate.cpp:126-129); cross-class
    comparisons are never eq and never ordered (neq of a present value
    against a different class is true)."""
    op, args = pred
    if v is None:
        return False
    if op == "any":
        return True
    if op in ("within", "without"):
        hit = v in args
        return hit if op == "within" else not hit
    mism = any(_cls(a) != _cls(v) for a in args)
    if op == "neq":
        return True if mism else v != args[0]
    if mism:
        return False
    if op in ("between", "inside", "outside"):
        a, b = args
        if op == "between":
            return a <= v <= b
        if op == "inside":
            return a < v < b
        return v < a or v > b
    (o,) = args
    return {
        "eq": v == o, "gt": v > o, "gte": v >= o,
        "lt": v < o, "lte": v <= o,
    }[op]


def _vprop(vid, key):
    return _VBY[vid].get(key)


def _eprop(loc, key, elabel_by_pair):
    return elabel_by_pair[loc][1].get(key)


_EBY = {(s, d): (lb, {"w": w}) for s, d, lb, w in EDGES}


def _cur_val(t):
    """The traverser's comparable current value (engine's Stream.val())."""
    kind, loc, _ = t
    return loc  # vid for V, value for S (E never feeds where/dedup here)


def interp(steps, ts=None, stores=None):
    if ts is None:
        ts = [("V", v[0], ()) for v in VERTS]
    if stores is None:
        stores = {}
    for step in steps:
        name, *args = step
        out = []
        if name == "hasLabel":
            out = [t for t in ts if _elem_label(t) in args]
        elif name == "has":
            key, pred = args
            out = [t for t in ts if _match(pred, _elem_prop(t, key))]
        elif name == "hasNot":
            (key,) = args
            out = [t for t in ts if _elem_prop(t, key) is None]
        elif name in ("out", "in", "both", "outE", "inE", "bothE"):
            lbs = args[0]
            for kind, vid, h in ts:
                for (s_, d_, lb, w) in EDGES:
                    if lbs and lb not in lbs:
                        continue
                    if name in ("out", "outE") and s_ == vid:
                        out.append(("V", d_, h) if name == "out" else ("E", (s_, d_), h))
                    elif name in ("in", "inE") and d_ == vid:
                        out.append(("V", s_, h) if name == "in" else ("E", (s_, d_), h))
                    elif name == "both":
                        if s_ == vid:
                            out.append(("V", d_, h))
                        if d_ == vid:
                            out.append(("V", s_, h))
                    elif name == "bothE":
                        if s_ == vid:
                            out.append(("E", (s_, d_), h))
                        if d_ == vid:
                            out.append(("E", (s_, d_), h))
        elif name == "outV":
            out = [("V", loc[0], h) for _, loc, h in ts]
        elif name == "inV":
            out = [("V", loc[1], h) for _, loc, h in ts]
        elif name == "bothV":
            for _, loc, h in ts:
                out.append(("V", loc[0], h))
                out.append(("V", loc[1], h))
        elif name == "values":
            (key,) = args
            for t in ts:
                v = _elem_prop(t, key)
                if v is not None:
                    out.append(("S", v, t[2]))
        elif name == "label":
            out = [("S", _elem_label(t), t[2]) for t in ts]
        elif name == "as":
            (lb,) = args
            out = [(k, loc, h + ((lb, loc),)) for k, loc, h in ts]
        elif name == "where_hist":
            pred_op, lb = args
            for t in ts:
                ref = dict(t[2])[lb]
                if _match((pred_op, (ref,)), _cur_val(t)):
                    out.append(t)
        elif name == "dedup":
            seen = set()
            for t in ts:
                k = (t[0], t[1])
                if k not in seen:
                    seen.add(k)
                    out.append(t)
        elif name == "dedup_hist_count":
            (lb,) = args
            out = [("S", len({dict(t[2])[lb] for t in ts}), ())]
        elif name == "is":
            (pred,) = args
            out = [t for t in ts if _match(pred, t[1])]
        elif name == "count":
            out = [("S", len(ts), ())]
        elif name in ("sum", "max", "min", "mean"):
            vals = [t[1] for t in ts]
            if not vals:
                out = [("S", None, ())]
            else:
                r = {
                    "sum": lambda v: float(sum(v)),
                    "max": lambda v: float(max(v)),
                    "min": lambda v: float(min(v)),
                    "mean": lambda v: float(sum(v)) / len(v),
                }[name](vals)
                out = [("S", r, ())]
        elif name == "order_slice":
            # range(a, b) is END-INCLUSIVE like the reference
            # (core/parser.cpp:1244-1258: limit(n) → end = n-1)
            asc, a, b = args
            vals = sorted((t[1] for t in ts), reverse=not asc)
            out = [("S", v, ()) for v in vals[a:b + 1]]
        elif name == "groupCount":
            c = Counter(t[1] for t in ts)
            out = [("G", (k, n), ()) for k, n in c.items()]
        elif name == "union":
            branches = args[0]
            for t in ts:
                for b in branches:
                    out.extend(interp(b, [t], stores))
        elif name in ("and", "or", "not"):
            branches = args[0]
            for t in ts:
                hits = [bool(interp(b, [t], stores)) for b in branches]
                ok = {
                    "and": all(hits), "or": any(hits), "not": not any(hits),
                }[name]
                if ok:
                    out.append(t)
        elif name == "select":
            (lb,) = args
            out = [("S", dict(h)[lb], h) for _, _, h in ts]
        elif name == "aggregate":
            (nm,) = args
            stores[nm] = {_cur_val(t) for t in ts}
            out = ts
        elif name == "where_store":
            op, nm = args
            member = stores.get(nm, set())
            for t in ts:
                hit = _cur_val(t) in member
                if (op == "within") == hit:
                    out.append(t)
        elif name == "coalesce":
            branches = args[0]
            for t in ts:
                for b in branches:
                    r = interp(b, [t], stores)
                    if r:
                        out.extend(r)
                        break
        elif name == "optional":
            (b,) = args
            for t in ts:
                r = interp(b, [t], stores)
                out.extend(r if r else [t])
        elif name == "choose":
            pred, bt, bf = args
            for t in ts:
                b = bt if _match(pred, _cur_val(t)) else bf
                out.extend(interp(b, [t], stores))
        elif name == "repeat":
            b, k = args
            out = ts
            for _ in range(k):
                out = interp(b, out, stores)
        elif name == "order_key_limit_values":
            key, asc, n = args  # limit(n) = range(0, n-1), n rows
            keyed = [(t, _elem_prop(t, key)) for t in ts]
            keyed = [(t, v) for t, v in keyed if v is not None]
            keyed.sort(key=lambda p: p[1], reverse=not asc)
            out = [("S", v, t[2]) for t, v in keyed[:n]]
        elif name == "groupCount_key":
            (key,) = args
            c = Counter(
                _elem_prop(t, key) if key != "label" else _elem_label(t)
                for t in ts
            )
            out = [("G", (k, n), ()) for k, n in c.items() if k is not None]
        elif name == "group_rel":
            kkey, vkey = args
            groups: dict = {}
            for t in ts:
                k = _elem_prop(t, kkey) if kkey != "label" else _elem_label(t)
                v = _elem_prop(t, vkey) if vkey != "label" else _elem_label(t)
                if k is None or v is None:
                    continue
                groups.setdefault(k, []).append(v)
            out = [("G", (k, tuple(sorted(v))), ()) for k, v in groups.items()]
        elif name == "project":
            specs = args[0]
            for t in ts:
                row = []
                for sp in specs:
                    if sp is None:
                        row.append(_cur_val(t))
                    elif isinstance(sp, str):
                        v = _elem_prop(t, sp)
                        row.append(v)
                    elif sp[0] == "sub_min":
                        r = interp(sp[1], [t], stores)
                        row.append(min((x[1] for x in r), default=None))
                    else:  # sub_count
                        r = interp(sp[1], [t], stores)
                        row.append(len(r) if r else None)
                if all(v is not None for v in row):
                    out.append(("G", tuple(row), t[2]))
        else:  # pragma: no cover
            raise AssertionError(f"unknown step {name}")
        ts = out
    return ts


def _elem_label(t):
    kind, loc, _ = t
    return _VBY[loc]["label"] if kind == "V" else _EBY[loc][0]


def _elem_prop(t, key):
    kind, loc, _ = t
    return _VBY[loc].get(key) if kind == "V" else _EBY[loc][1].get(key)


# --------------------------------------------------------------------------
# spec -> fluent-API traversal
# --------------------------------------------------------------------------

_PREDS = {
    "any": lambda a: None,  # has(k) form
    "eq": lambda a: P.eq(a[0]), "neq": lambda a: P.neq(a[0]),
    "gt": lambda a: P.gt(a[0]), "gte": lambda a: P.gte(a[0]),
    "lt": lambda a: P.lt(a[0]), "lte": lambda a: P.lte(a[0]),
    "between": lambda a: P.between(*a), "inside": lambda a: P.inside(*a),
    "outside": lambda a: P.outside(*a),
    "within": lambda a: P.within(*a), "without": lambda a: P.without(*a),
}


def _pred_api(pred):
    op, args = pred
    return _PREDS[op](args)


def _apply(t, steps):
    for step in steps:
        name, *args = step
        if name == "hasLabel":
            t = t.hasLabel(*args)
        elif name == "has":
            key, pred = args
            p = _pred_api(pred)
            t = t.has(key) if p is None else t.has(key, p)
        elif name == "hasNot":
            t = t.hasNot(args[0])
        elif name in ("out", "in", "both", "outE", "inE", "bothE"):
            m = {"out": t.out, "in": t.in_, "both": t.both,
                 "outE": t.outE, "inE": t.inE, "bothE": t.bothE}[name]
            t = m(*args[0])
        elif name == "outV":
            t = t.outV()
        elif name == "inV":
            t = t.inV()
        elif name == "bothV":
            t = t.bothV()
        elif name == "values":
            t = t.values(args[0])
        elif name == "label":
            t = t.label()
        elif name == "as":
            t = t.as_(args[0])
        elif name == "where_hist":
            op, lb = args
            t = t.where(getattr(P, op)(lb))
        elif name == "dedup":
            t = t.dedup()
        elif name == "dedup_hist_count":
            t = t.dedup(args[0]).count()
        elif name == "is":
            t = t.is_(_pred_api(args[0]))
        elif name == "count":
            t = t.count()
        elif name in ("sum", "max", "min", "mean"):
            t = {"sum": t.sum_, "max": t.max_, "min": t.min_, "mean": t.mean}[name]()
        elif name == "order_slice":
            asc, a, b = args
            t = t.order(direction=Order.incr if asc else Order.decr).range_(a, b)
        elif name == "groupCount":
            t = t.groupCount(relational=True)
        elif name == "union":
            t = t.union(*[_apply_anon(b) for b in args[0]])
        elif name in ("and", "or", "not"):
            m = {"and": t.and_, "or": t.or_, "not": t.not_}[name]
            t = m(*[_apply_anon(b) for b in args[0]])
        elif name == "select":
            t = t.select(args[0])
        elif name == "aggregate":
            t = t.aggregate(args[0])
        elif name == "where_store":
            op, nm = args
            t = t.where(getattr(P, op)(nm))
        elif name == "coalesce":
            t = t.coalesce(*[_apply_anon(b) for b in args[0]])
        elif name == "optional":
            t = t.optional(_apply_anon(args[0]))
        elif name == "choose":
            pred, bt, bf = args
            t = t.choose(_pred_api(pred), _apply_anon(bt), _apply_anon(bf))
        elif name == "repeat":
            b, k = args
            t = t.repeat(_apply_anon(b), times=k)
        elif name == "order_key_limit_values":
            key, asc, n = args
            t = t.order(key, Order.incr if asc else Order.decr).limit(n).values(key)
        elif name == "groupCount_key":
            t = t.groupCount(args[0], relational=True)
        elif name == "group_rel":
            t = t.group(args[0], args[1], relational=True)
        elif name == "project":
            specs = args[0]
            t = t.project(*[f"k{i}" for i in range(len(specs))])
            for sp in specs:
                if sp is None:
                    t = t.by()
                elif isinstance(sp, str):
                    t = t.by(sp)
                elif sp[0] == "sub_min":
                    t = t.by(_apply_anon(sp[1]))
                else:
                    t = t.by(_apply_anon(sp[1]).count())
        else:  # pragma: no cover
            raise AssertionError(f"unknown step {name}")
    return t


def _apply_anon(steps):
    return _apply(A, steps)


# --------------------------------------------------------------------------
# pipeline generator (type-valid by construction)
# --------------------------------------------------------------------------

_num = st.integers(min_value=-1, max_value=101)


@st.composite
def _num_pred(draw):
    op = draw(st.sampled_from(
        ["any", "eq", "neq", "gt", "gte", "lt", "lte",
         "between", "inside", "outside", "within", "without"]
    ))
    if op in ("between", "inside", "outside"):
        a, b = sorted([draw(_num), draw(_num)])
        return (op, (a, b if b > a else a + 1))
    if op in ("within", "without"):
        return (op, tuple(draw(st.lists(_num, min_size=1, max_size=3))))
    if op == "any":
        return ("any", ())
    return (op, (draw(_num),))


@st.composite
def _elem_filter(draw):
    kind = draw(st.sampled_from(
        ["hasLabel", "has_age", "hasNot", "has_name", "has_cross_type"]
    ))
    if kind == "hasLabel":
        return ("hasLabel", draw(st.sampled_from(VLABELS)))
    if kind == "hasNot":
        return ("hasNot", draw(st.sampled_from(["age", "name"])))
    if kind == "has_name":
        nm = draw(st.sampled_from(["alice", "bob", "book", "zzz"]))
        return ("has", "name", ("eq", (nm,)))
    if kind == "has_cross_type":
        # numeric predicate on the string property: never-match gating
        return ("has", "name",
                draw(_num_pred().filter(lambda p: p[0] != "any")))
    return ("has", "age", draw(_num_pred()))


@st.composite
def _hop(draw):
    d = draw(st.sampled_from(["out", "in", "both"]))
    lbs = draw(st.sampled_from([(), ("knows",), ("likes",), ("knows", "likes")]))
    return (d, lbs)


@st.composite
def _branch(draw):
    """A short V->V sub-pipeline for union/and/or/not branches."""
    steps = [draw(_hop())]
    if draw(st.booleans()):
        steps.append(draw(_elem_filter()))
    if draw(st.booleans()):
        steps.append(draw(_hop()))
    return steps


@st.composite
def _scalar_tail(draw):
    """values()/label() then scalar ops, ending the pipeline."""
    first = draw(st.sampled_from(["values_age", "label"]))
    steps = [("values", "age") if first == "values_age" else ("label",)]
    tail_kind = draw(st.sampled_from(
        ["none", "is", "dedup", "order", "agg", "groupCount"]
    ))
    if tail_kind == "is":
        # is() on the label stream exercises cross-class gating (string
        # vs numeric predicate → never-match, not an ANSI cast error)
        steps.append(("is", draw(_num_pred().filter(lambda p: p[0] != "any"))))
        if draw(st.booleans()):
            steps.append(("count",))
    elif tail_kind == "dedup":
        steps.append(("dedup",))
        if draw(st.booleans()):
            steps.append(("count",))
    elif tail_kind == "order":
        a = draw(st.integers(min_value=0, max_value=3))
        b = a + draw(st.integers(min_value=1, max_value=5))
        steps.append(("order_slice", draw(st.booleans()), a, b))
    elif tail_kind == "agg" and first != "label":
        steps.append((draw(st.sampled_from(["sum", "max", "min", "mean"])),))
    elif tail_kind == "groupCount":
        steps.append(("groupCount",))
    return steps


@st.composite
def pipeline(draw):
    steps = []
    # optional leading filters
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        steps.append(draw(_elem_filter()))
    # as('a') + traversal + optional history use (always before dedup)
    use_hist = draw(st.booleans())
    if use_hist:
        steps.append(("as", "a"))
    for _ in range(draw(st.integers(min_value=1, max_value=2))):
        steps.append(draw(_hop()))
    if use_hist:
        kind = draw(st.sampled_from(["where", "dedup_hist_count", "none"]))
        if kind == "where":
            steps.append(("where_hist", draw(st.sampled_from(["eq", "neq"])), "a"))
        elif kind == "dedup_hist_count":
            steps.append(("dedup_hist_count", "a"))
            return steps
    # optional branch step
    b = draw(st.sampled_from(["none", "union", "and", "or", "not"]))
    if b == "union":
        steps.append(("union", [draw(_branch()), draw(_branch())]))
    elif b != "none":
        n = 2 if b in ("and", "or") and draw(st.booleans()) else 1
        steps.append((b, [draw(_branch()) for _ in range(n)]))
    # optional element dedup, then terminal
    if draw(st.booleans()):
        steps.append(("dedup",))
    term = draw(st.sampled_from(["none", "count", "scalar"]))
    if term == "count":
        steps.append(("count",))
    elif term == "scalar":
        steps.extend(draw(_scalar_tail()))
    return steps


@st.composite
def edge_pipeline(draw):
    steps = []
    if draw(st.booleans()):
        steps.append(draw(_elem_filter()))
    d = draw(st.sampled_from(["outE", "inE", "bothE"]))
    lbs = draw(st.sampled_from([(), ("knows",), ("likes",)]))
    steps.append((d, lbs))
    if draw(st.booleans()):
        steps.append(("has", "w", draw(_num_pred())))
    nxt = draw(st.sampled_from(["end", "V", "values", "label", "count"]))
    if nxt == "V":
        steps.append((draw(st.sampled_from(["outV", "inV", "bothV"])),))
        if draw(st.booleans()):
            steps.append(("dedup",))
        if draw(st.booleans()):
            steps.append(("count",))
    elif nxt == "values":
        steps.append(("values", "w"))
        if draw(st.booleans()):
            steps.append((draw(st.sampled_from(["sum", "count", "max"])),))
    elif nxt == "label":
        steps.append(("label",))
        steps.append(("groupCount",))
    elif nxt == "count":
        steps.append(("count",))
    return steps


@st.composite
def _vid_pred(draw):
    """Predicate over vids (1..10) for choose()'s condition."""
    op = draw(st.sampled_from(["gt", "lte", "eq", "within", "between"]))
    v = st.integers(min_value=0, max_value=11)
    if op == "within":
        return ("within", tuple(draw(st.lists(v, min_size=1, max_size=4))))
    if op == "between":
        a, b = sorted([draw(v), draw(v)])
        return ("between", (a, max(b, a + 1)))
    return (op, (draw(v),))


@st.composite
def ext_pipeline(draw):
    """Extension steps: select/aggregate-store/coalesce/optional/choose/
    repeat-times/keyed order."""
    steps = []
    if draw(st.booleans()):
        steps.append(draw(_elem_filter()))
    kind = draw(st.sampled_from(
        ["select", "store", "coalesce", "optional", "choose", "repeat",
         "order_key"]
    ))
    if kind == "select":
        steps.append(("as", "a"))
        steps.extend(draw(st.lists(_hop(), min_size=1, max_size=2)))
        steps.append(("select", "a"))
        if draw(st.booleans()):
            steps.append(("dedup",))
    elif kind == "store":
        steps.append(("aggregate", "x"))
        steps.extend(draw(st.lists(_hop(), min_size=1, max_size=2)))
        steps.append(("where_store",
                      draw(st.sampled_from(["within", "without"])), "x"))
        if draw(st.booleans()):
            steps.append(("count",))
    elif kind == "coalesce":
        steps.append(("coalesce", [draw(_branch()), draw(_branch())]))
        if draw(st.booleans()):
            steps.append(("count",))
    elif kind == "optional":
        steps.append(("optional", draw(_branch())))
        if draw(st.booleans()):
            steps.append(("values", "age"))
    elif kind == "choose":
        steps.append(("choose", draw(_vid_pred()), draw(_branch()),
                      draw(_branch())))
        if draw(st.booleans()):
            steps.append(("count",))
    elif kind == "repeat":
        steps.append(("repeat", [draw(_hop())],
                      draw(st.integers(min_value=1, max_value=3))))
        if draw(st.booleans()):
            steps.append(("dedup",))
        if draw(st.booleans()):
            steps.append(("count",))
    else:  # order_key
        steps.append(("order_key_limit_values", "age", draw(st.booleans()),
                      draw(st.integers(min_value=1, max_value=6))))
    return steps


@st.composite
def rel_pipeline(draw):
    """Relational outputs: keyed groupCount, group(k,v), project().by()."""
    steps = []
    if draw(st.booleans()):
        steps.append(draw(_elem_filter()))
    if draw(st.booleans()):
        steps.append(draw(_hop()))
    kind = draw(st.sampled_from(["groupCount_key", "group_rel", "project"]))
    keyspace = ["age", "name", "label"]
    if kind == "groupCount_key":
        steps.append(("groupCount_key", draw(st.sampled_from(keyspace))))
    elif kind == "group_rel":
        steps.append(("group_rel", draw(st.sampled_from(keyspace)),
                      draw(st.sampled_from(keyspace))))
    else:
        spec = st.one_of(
            st.none(),
            st.sampled_from(["age", "name"]),
            st.tuples(st.sampled_from(["sub_min", "sub_count"]),
                      st.lists(_hop(), min_size=1, max_size=2)),
        )
        # >= 2 keys so the relational row shape is unambiguous
        steps.append(("project", draw(st.lists(spec, min_size=2, max_size=3))))
    return steps


# --------------------------------------------------------------------------
# comparison
# --------------------------------------------------------------------------


def _canon(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _expected(ts):
    out = []
    for kind, loc, _ in ts:
        if kind == "E":
            out.append(loc)
        elif kind == "G":
            out.append(loc)
        else:
            out.append(_canon(loc))
    return Counter(out)


def _got(df):
    rows = df.collect()
    cols = df.columns
    out = []
    for r in rows:
        if cols == ["vid"]:
            out.append(r[0])
        elif cols == ["src", "dst"]:
            out.append((r[0], r[1]))
        elif cols == ["key", "cnt"]:
            out.append((r[0], r[1]))
        elif cols == ["key", "vals"]:
            out.append((r[0], tuple(r[1])))
        elif len(cols) > 1:  # project(k0, k1, …) relational rows
            out.append(tuple(_canon(v) for v in r))
        else:
            out.append(_canon(r[0]))
    return Counter(out)


def _check(g, steps):
    want = _expected(interp(steps))
    got = _got(_apply(g.V(), steps).df())
    assert got == want, f"pipeline {steps}\n got {got}\n want {want}"


@given(steps=pipeline())
@settings(max_examples=60, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_vertex_pipelines_match_reference_interpreter(g, steps):
    _check(g, steps)


@given(steps=edge_pipeline())
@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_edge_pipelines_match_reference_interpreter(g, steps):
    _check(g, steps)


@given(steps=ext_pipeline())
@settings(max_examples=50, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_extension_pipelines_match_reference_interpreter(g, steps):
    _check(g, steps)


# --------------------------------------------------------------------------
# parser parity: render the spec to a Gremlin query STRING and compare the
# parsed path against the fluent path (both engine executions)
# --------------------------------------------------------------------------


def _rv(v):
    return f'"{v}"' if isinstance(v, str) else str(v)


def _rpred(pred):
    op, args = pred
    if op == "any":
        return None  # bare has(k)
    return f"{op}({', '.join(_rv(a) for a in args)})"


def _render(steps, start="g.V()"):
    """Spec → query string, or None when the step has no string form
    (relational groupCount, store-membership where)."""
    parts = [start]
    for step in steps:
        name, *args = step
        if name == "hasLabel":
            parts.append(f'hasLabel({", ".join(_rv(a) for a in args)})')
        elif name == "has":
            key, pred = args
            p = _rpred(pred)
            parts.append(f'has("{key}")' if p is None else f'has("{key}", {p})')
        elif name == "hasNot":
            parts.append(f'hasNot("{args[0]}")')
        elif name in ("out", "in", "both", "outE", "inE"):
            parts.append(f'{name}({", ".join(_rv(a) for a in args[0])})')
        elif name in ("outV", "inV", "dedup", "count", "label",
                      "sum", "max", "min", "mean"):
            parts.append(f"{name}()")
        elif name == "values":
            parts.append(f'values("{args[0]}")')
        elif name == "as":
            parts.append(f'as("{args[0]}")')
        elif name == "where_hist":
            op, lb = args
            parts.append(f'where({op}("{lb}"))')
        elif name == "dedup_hist_count":
            parts.append(f'dedup("{args[0]}")')
            parts.append("count()")
        elif name == "is":
            parts.append(f"is({_rpred(args[0])})")
        elif name == "order_slice":
            asc, a, b = args
            parts.append("order()" if asc else "order(decr)")
            parts.append(f"range({a}, {b})")
        elif name == "union":
            brs = ", ".join(_render(b, start="") for b in args[0])
            parts.append(f"union({brs})")
        elif name in ("and", "or", "not"):
            brs = ", ".join(_render(b, start="") for b in args[0])
            parts.append(f"{name}({brs})")
        elif name == "select":
            parts.append(f'select("{args[0]}")')
        elif name == "aggregate":
            parts.append(f'aggregate("{args[0]}")')
        elif name == "where_store":
            op, nm = args
            parts.append(f'where({op}("{nm}"))')
        elif name == "coalesce":
            brs = ", ".join(_render(b, start="") for b in args[0])
            parts.append(f"coalesce({brs})")
        elif name == "optional":
            parts.append(f"optional({_render(args[0], start='')})")
        elif name == "choose":
            pred, bt, bf = args
            parts.append(
                f"choose({_rpred(pred)}, {_render(bt, start='')}, "
                f"{_render(bf, start='')})"
            )
        elif name == "repeat":
            b, k = args
            parts.append(f"repeat({_render(b, start='')}).times({k})")
        elif name == "order_key_limit_values":
            key, asc, n = args
            parts.append(f'order("{key}")' if asc else f'order("{key}", decr)')
            parts.append(f"limit({n})")
            parts.append(f'values("{key}")')
        else:
            return None  # no string form (e.g. relational groupCount)
    q = ".".join(p for p in parts if p)
    return q.lstrip(".")


@given(steps=st.one_of(pipeline(), ext_pipeline()))
@settings(max_examples=60, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_parsed_string_matches_fluent(g, steps):
    from hypothesis import assume

    q = _render(steps)
    assume(q is not None and "groupCount" not in q)
    got_str = _got(g.query(q))
    got_flu = _got(_apply(g.V(), steps).df())
    assert got_str == got_flu, f"query {q}\n parsed {got_str}\n fluent {got_flu}"


@given(steps=rel_pipeline())
@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_relational_pipelines_match_reference_interpreter(g, steps):
    _check(g, steps)


def test_interpreter_sanity():
    # the interpreter itself, pinned on hand-checked cases
    assert _expected(interp([("count",)])) == Counter([10])
    assert _expected(interp([("out", ()), ("count",)])) == Counter([len(EDGES)])
    assert _expected(interp([("hasLabel", "item")])) == Counter([5, 6, 7, 9])
    # alice knows bob&carol; values(age) drops carol's null
    assert _expected(
        interp([("has", "name", ("eq", ("alice",))), ("out", ("knows",)),
                ("values", "age")])
    ) == Counter([27])
