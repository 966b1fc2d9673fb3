"""StandardAnalyzer-equivalence goldens (UAX#29 word-break subset).

Expected values follow the rules of
lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizerImpl.jflex:211-252
(MidLetter/MidNumLet/Single_Quote joiners, ExtendNumLet glue, WB9/10
letter-digit chaining) + the LowerCaseFilter and the 255-char drop rule
(StandardTokenizer.java:152-166)."""

import pandas as pd

from lucene_spark.analysis import tokenize, tokenize_series, tokenize_with_positions

GOLDENS = [
    ("Hello World", ["hello", "world"]),
    ("Hello, World!", ["hello", "world"]),
    # apostrophe = Single_Quote joins letters (WB6/7)
    ("can't stop", ["can't", "stop"]),
    # dot = MidNumLet joins letters AND digits
    ("foo.bar", ["foo.bar"]),
    ("3.14", ["3.14"]),
    ("v3.14", ["v3.14"]),
    # comma = MidNum joins digits only
    ("1,000,000", ["1,000,000"]),
    ("a,b", ["a", "b"]),
    # colon = MidLetter joins letters only
    ("std::vector", ["std", "vector"]),  # '::' double joiner breaks
    ("a:b", ["a:b"]),
    ("3:4", ["3", "4"]),
    # underscore = ExtendNumLet glues everywhere incl. edges
    ("snake_case", ["snake_case"]),
    ("_private", ["_private"]),
    ("dunder__x", ["dunder__x"]),
    ("___", []),
    # letters+digits chain (WB9/10)
    ("abc123def", ["abc123def"]),
    ("CamelCase", ["camelcase"]),
    # hyphen is a breaker
    ("wi-fi", ["wi", "fi"]),
    # mid chars need BOTH sides alnum
    ("a. b", ["a", "b"]),
    ("a..b", ["a", "b"]),
    ("trailing.", ["trailing"]),
    ("'quoted'", ["quoted"]),
    # mixed letter/digit adjacency around a dot: WB6 needs letters,
    # WB11/12 needs digits → "a.1" breaks
    ("a.1", ["a", "1"]),
    ("x1.y2", ["x1", "y2"]),
    ("1a.2b", ["1a", "2b"]),
    # CJK: one token per ideograph
    ("漢字", ["漢", "字"]),
    ("int main(void) { return 0; }", ["int", "main", "void", "return", "0"]),
]


def test_goldens():
    for text, expected in GOLDENS:
        assert tokenize(text) == expected, f"{text!r}: {tokenize(text)} != {expected}"


def test_max_token_length_drops_not_chops():
    long_tok = "x" * 256
    keep_tok = "y" * 255
    assert tokenize(f"a {long_tok} b") == ["a", "b"]
    assert tokenize(f"a {keep_tok} b") == ["a", keep_tok, "b"]


def test_dropped_token_consumes_position():
    toks, poss = tokenize_with_positions("a " + "x" * 300 + " b")
    assert toks == ["a", "b"]
    assert poss == [0, 2]  # the dropped token held position 1


def test_series_matches_scalar(corpus_pdf):
    texts = corpus_pdf["content"].head(50)
    got = tokenize_series(texts)
    for text, toks in zip(texts, got):
        assert toks == tokenize(text)


def test_empty_and_null():
    assert tokenize("") == []
    assert tokenize("   \n\t ") == []
    out = tokenize_series(pd.Series([None, "a b"]))
    assert out.iloc[0] == []
    assert out.iloc[1] == ["a", "b"]
