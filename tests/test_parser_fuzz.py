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
