"""Property test: parse_merge recovers injected components EXACTLY, for
arbitrary literal contents.

The round-8 quote-masking fix made clause-boundary detection immune to
keywords inside string literals. The golden tests pin specific cases;
this property generates literals from a deliberately hostile alphabet
(WHEN/THEN/ON/WHERE/VALUES fragments, parens, commas, semicolons, '=>',
runs of spaces) and asserts the parsed spec's ON condition, matched
condition, insert condition, and insert values carry the literal text
byte-for-byte. Single/double quotes are excluded from the alphabet —
escaping rules are the SQL dialect's, not this parser's, and the golden
suite pins the no-escape contract.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_examples_spark.sql_merge import parse_merge

# hostile literal contents: SQL keywords, boundary tokens, whitespace
_WORDS = st.sampled_from(
    [
        "WHEN",
        "THEN",
        "MATCHED",
        "NOT",
        "ON",
        "WHERE",
        "VALUES",
        "INSERT",
        "UPDATE SET",
        "DELETE",
        "USING",
        "MERGE INTO",
        "(",
        ")",
        ",",
        ";",
        "=>",
        "  ",
        "a",
        "=",
    ]
)
_LIT = st.lists(_WORDS, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(on_lit=_LIT, cond_lit=_LIT, ins_lit=_LIT, val_lit=_LIT)
def test_literals_round_trip_through_parse(on_lit, cond_lit, ins_lit, val_lit):
    stmt = (
        "MERGE INTO default.t t USING src s "
        f"ON s.k = t.k AND t.tag = '{on_lit}' "
        f"WHEN MATCHED AND s.v != '{cond_lit}' THEN UPDATE SET t.v = s.v "
        f"WHEN NOT MATCHED AND s.w = '{ins_lit}' THEN "
        f"INSERT (k, v) VALUES (s.k, '{val_lit}');"
    )
    spec = parse_merge(stmt)
    assert spec.on == f"s.k = t.k AND t.tag = '{on_lit}'"
    assert len(spec.matched) == 1
    assert spec.matched[0].condition == f"s.v != '{cond_lit}'"
    assert spec.matched[0].assignments == {"v": "s.v"}
    assert spec.insert_condition == f"s.w = '{ins_lit}'"
    assert spec.insert_cols == ["k", "v"]
    assert spec.insert_values == ["s.k", f"'{val_lit}'"]


@settings(max_examples=100, deadline=None)
@given(src_lit=_LIT)
def test_subquery_source_with_hostile_literal(src_lit):
    stmt = (
        "MERGE INTO default.t t USING "
        f"(SELECT k, '{src_lit}' AS v FROM src0) s ON s.k = t.k "
        "WHEN MATCHED THEN DELETE;"
    )
    spec = parse_merge(stmt)
    assert spec.source_sql == f"SELECT k, '{src_lit}' AS v FROM src0"
    assert spec.on == "s.k = t.k"
    assert spec.matched[0].action == "delete"
