"""Tokenizer semantics: must mirror the reference analyzer chain
(expand_attribute_name splitting + lowercase; core.py:100-123)."""

import pyarrow as pa
import pytest

from auctus_ray.tokenize import tokenize_array, tokenize_text


CASES = [
    ("getHTTPResponse2Code", ["get", "httpresponse", "2", "code"]),
    ("foo_bar-baz.qux", ["foo", "bar", "baz", "qux"]),
    ("aBcD", ["a", "bc", "d"]),
    ("a1b", ["a", "1", "b"]),
    ("Hello,  World!", ["hello", "world"]),
    ("", []),
    ("___", []),
    ("CamelCase camel2Case", ["camel", "case", "camel", "2", "case"]),
    ("x" * 10, ["x" * 10]),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_code_analyzer_python(text, expected):
    assert tokenize_text(text, "code") == expected


def test_code_analyzer_arrow_matches_python():
    texts = [c[0] for c in CASES] + [None, "def fooBar(): return42"]
    arr = pa.array(texts, pa.string())
    out = tokenize_array(arr, "code").to_pylist()
    for t, got in zip(texts, out):
        assert got == tokenize_text(t or "", "code"), t


def test_simple_analyzer_matches_duckdb_semantics():
    """simple == regexp_extract_all(lower(x), '[a-z0-9]+') — the SQL oracle."""
    import duckdb

    texts = ["Hello World", "getHTTPResponse2Code", "a,b;c", "", "123abc"]
    for t in texts:
        sql = duckdb.sql(
            "select regexp_extract_all(lower(?), '[a-z0-9]+')", params=[t]
        ).fetchone()[0]
        assert tokenize_text(t, "simple") == sql
    arr_out = tokenize_array(pa.array(texts), "simple").to_pylist()
    assert arr_out == [tokenize_text(t, "simple") for t in texts]


def test_reference_expand_attribute_name_parity():
    """Spot-check vs the documented reference behavior (core.py:100-123):
    split on delimiters, digit<->alpha and lower->UPPER boundaries; the
    ES chain then lowercases."""
    # reference: expand_attribute_name('metroAreaHttp2Server_x') ->
    #   metro, Area, Http, 2, Server, x  -> lowercase
    assert tokenize_text("metroAreaHttp2Server_x") == [
        "metro", "area", "http", "2", "server", "x",
    ]
    # UPPER runs are kept together (no UPPER->lower split in the reference)
    assert tokenize_text("HTTPServer") == ["httpserver"]
