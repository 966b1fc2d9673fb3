"""Exact-substring dedup + C4 line filters vs brute force.

References (public protocols re-expressed Spark-first):
- Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  Better" — remove substrings duplicated across the corpus; here at
  word-n-gram granularity with merged maximal spans.
- Raffel et al. 2020 (C4), §2.2 — line-level cleaning heuristics.
"""

from __future__ import annotations

import re

import pytest


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _brute_spans(texts: dict, n: int, min_df: int = 2):
    """doc -> set of covered token positions (from definitions)."""
    occ: dict = {}
    for d, t in texts.items():
        toks = _tok(t)
        for i in range(len(toks) - n + 1):
            occ.setdefault(" ".join(toks[i : i + n]), []).append((d, i))
    dup = {g for g, v in occ.items() if len({d for d, _ in v}) >= min_df}
    cov: dict = {d: set() for d in texts}
    for g in dup:
        for d, i in occ[g]:
            cov[d] |= set(range(i, i + n))
    return cov


@pytest.fixture(scope="module")
def dup_docs(spark):
    texts = {
        0: "the quick brown fox jumps over the lazy dog today",
        1: "something else entirely here the quick brown fox jumps over the fence",
        2: "no shared grams in this one at all whatsoever truly",
        3: "short text",
        4: "the quick brown fox jumps again and again and again and again",
    }
    df = spark.createDataFrame([(k, v) for k, v in texts.items()], "doc_id long, text string")
    return df, texts


def test_duplicated_spans_match_brute(dup_docs):
    from lucene_spark.pipeline.substrings import duplicated_ngram_spans

    df, texts = dup_docs
    got = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=5).collect()}
    cov = _brute_spans(texts, 5)
    for d, t in texts.items():
        want = cov[d]
        if not want:
            assert d not in got
            continue
        r = got[d]
        assert r["dup_tokens"] == len(want), d
        assert r["n_tokens"] == len(_tok(t))
        # spans are merged maximal intervals covering exactly `want`
        covered = set()
        prev_end = None
        for s in r["spans"]:
            assert s["start"] < s["end"]
            if prev_end is not None:
                assert s["start"] > prev_end  # maximal (no touching spans)
            covered |= set(range(s["start"], s["end"]))
            prev_end = s["end"]
        assert covered == want, d


def test_remove_duplicated_ngrams(dup_docs):
    from lucene_spark.pipeline.substrings import remove_duplicated_ngrams

    df, texts = dup_docs
    got = {r["doc_id"]: r for r in remove_duplicated_ngrams(df, n=5).collect()}
    cov = _brute_spans(texts, 5)
    for d, t in texts.items():
        toks = _tok(t)
        want = " ".join(tok for i, tok in enumerate(toks) if i not in cov[d])
        assert got[d]["text"] == want, d
        assert got[d]["dup_tokens"] == len(cov[d])
    # untouched docs pass through with dup_tokens = 0
    assert got[2]["dup_tokens"] == 0 and got[2]["text"] == " ".join(_tok(texts[2]))
    # docs shorter than n are never cut
    assert got[3]["text"] == "short text"


def test_min_doc_freq_three(dup_docs):
    from lucene_spark.pipeline.substrings import duplicated_ngram_spans

    df, texts = dup_docs
    got = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=5, min_doc_freq=3).collect()}
    cov = _brute_spans(texts, 5, min_df=3)
    assert set(got) == {d for d, c in cov.items() if c}
    for d, r in got.items():
        assert r["dup_tokens"] == len(cov[d])


def test_c4_line_filters(spark):
    from lucene_spark.pipeline.curation import c4_line_filters

    rows = [
        # 5 good lines -> kept
        (0, "\n".join(f"one two three four {i}." for i in range(5))),
        # only 4 good lines -> dropped (min_lines)
        (1, "\n".join(f"one two three four {i}." for i in range(4))),
        # line without terminal punct / too few words / javascript
        (2, "one two three four a.\nno punct here at all\ntwo words.\n"
            "enable javascript to view this.\n" + "\n".join(f"pad line number {i} ok." for i in range(4))),
        # page-level: brace
        (3, "function() { return 1; }\n" + "\n".join(f"good line number {i} here." for i in range(5))),
        # page-level: lorem ipsum
        (4, "Lorem Ipsum dolor sit amet.\n" + "\n".join(f"good line number {i} here." for i in range(5))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_line_filters(df).collect()}
    assert got[0]["keep_doc"] == 1 and got[0]["n_kept_lines"] == 5
    assert got[1]["keep_doc"] == 0 and got[1]["n_kept_lines"] == 4
    r2 = got[2]
    assert r2["n_lines"] == 8 and r2["n_kept_lines"] == 5  # 1 good + 4 pad
    assert "no punct" not in r2["text"] and "javascript" not in r2["text"]
    assert "two words." not in r2["text"]
    assert got[3]["keep_doc"] == 0 and got[3]["has_brace"] == 1
    assert got[4]["keep_doc"] == 0 and got[4]["has_lorem"] == 1


def test_scrub_pii(spark):
    import re

    from lucene_spark.pipeline.curation import PII_PATTERNS, scrub_pii

    rows = [
        (0, "mail me at jo.doe+x@exa-mple.co and 10.1.2.3 or +1 555 123 4567 ok"),
        (1, "clean text no pii here"),
        (2, "two mails a@b.io c@d.org and ip 192.168.0.1 end"),
        (3, "not an ip 1234.5.6.7890 and not a mail foo@bar"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    for d, text in rows:
        want = text
        for kind in ("email", "ipv4", "phone"):
            pat, repl = PII_PATTERNS[kind]
            assert got[d][f"n_{kind}"] == len(re.findall(pat, text)), (d, kind)
            want = re.sub(pat, repl, want)
        assert got[d]["text"] == want, d
    assert got[0]["text"] == "mail me at <EMAIL> and <IP> or <PHONE> ok"
    assert got[2]["n_email"] == 2 and got[2]["n_ipv4"] == 1
    # word-boundary guard: 1234.5.6.7890 is not an IPv4
    assert got[3]["n_ipv4"] == 0 and "<IP>" not in got[3]["text"]
