"""Parser fuzzing: arbitrary strings must raise ParseError (or parse),
never crash with an unrelated exception."""

from hypothesis import given, settings
from hypothesis import strategies as st

from grasper_spark.plans.parser import ParseError, parse_query


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_fuzz_arbitrary_text(s):
    try:
        parse_query(s)
    except ParseError:
        pass


@given(st.text(alphabet="gV().hasout'\"ie,123eq", max_size=40))
@settings(max_examples=300, deadline=None)
def test_fuzz_query_like_text(s):
    try:
        parse_query("g." + s)
    except ParseError:
        pass


@given(st.text(alphabet="coalesce(tail.by)matchorder'a,12", max_size=50))
@settings(max_examples=200, deadline=None)
def test_fuzz_new_step_fragments(s):
    try:
        parse_query("g.V()." + s)
    except ParseError:
        pass


def test_new_steps_parse_shapes():
    ok = [
        'g.V().coalesce(out("x").values("n"), values("n"))',
        'g.V().tail(3)',
        'g.V().order().by("a").by("b", decr).tail(2)',
        'g.V().match(as("a").out("x").as("b"), as("b").has("k", gt(1)))',
        'g.V().has("name", containing("o")).path().by("name")',
    ]
    for q in ok:
        parse_query(q)  # must not raise
    bad = [
        'g.V().coalesce()',
        'g.V().tail()',
        'g.V().path().by()',
        'g.V().path().by("a").by("b")',
    ]
    import pytest

    for q in bad:
        with pytest.raises(ParseError):
            parse_query(q)
