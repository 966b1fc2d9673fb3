"""CJK (kuromoji-role) segmentation goldens — the PUBLIC subset of
lucene/analysis/kuromoji/src/test/.../TestJapaneseTokenizer.java,
with the reference's exact surfaces and offsets:
- testDecomposition2 (:264-270), testDecomposition3 (:273-280),
  testDecomposition4 (:283-289)
- the 数学部長谷川 ambiguity (:179) — 部長+谷川 must beat 部+長谷川
- testSearchMode compound split (:161-170): NORMAL keeps the
  dictionary compound; SEARCH splits and (discardCompoundToken=false)
  emits the compound as a posInc=0/posLength=n synonym
plus analyzer-integration and end-to-end index/search checks."""

import pytest

from lucene_spark.analysis.cjk import cjk_parts, cjk_parts_spans, segment
from lucene_spark.analysis.tokenizer import tokenize, tokenize_pos_off_series


def surfaces(toks):
    return [t[0] for t in toks]


class TestGoldens:
    def test_decomposition2(self):
        toks = segment("麻薬の密売は根こそぎ絶やさなければならない")
        assert surfaces(toks) == [
            "麻薬", "の", "密売", "は", "根こそぎ", "絶やさ", "なけれ", "ば", "なら", "ない",
        ]
        assert [t[1] for t in toks] == [0, 2, 3, 5, 6, 10, 13, 16, 17, 19]
        assert [t[2] for t in toks] == [2, 3, 5, 6, 10, 13, 16, 17, 19, 21]

    def test_decomposition3_unknown_katakana(self):
        # マシュー / ホプキンス are unknown words: the KATAKANA class
        # groups whole runs, and the ・ (punctuation class) breaks them
        toks = segment("魔女狩大将マシュー・ホプキンス。")
        assert surfaces(toks) == ["魔女", "狩", "大将", "マシュー", "ホプキンス"]
        assert [t[1] for t in toks] == [0, 2, 3, 5, 10]
        assert [t[2] for t in toks] == [2, 3, 5, 9, 15]

    def test_decomposition4(self):
        toks = segment("これは本ではない")
        assert surfaces(toks) == ["これ", "は", "本", "で", "は", "ない"]
        assert [t[1] for t in toks] == [0, 2, 3, 4, 5, 6]
        assert [t[2] for t in toks] == [2, 3, 4, 5, 6, 8]

    def test_hasegawa_ambiguity(self):
        # 数学部長谷川: the lattice must bracket 部長|谷川, not 部|長谷川
        assert surfaces(segment("数学部長谷川")) == ["数学", "部長", "谷川"]

    def test_punctuation_kept_when_asked(self):
        toks = segment("魔女狩。", discard_punct=False)
        assert surfaces(toks) == ["魔女", "狩", "。"]

    def test_long_hiragana_grouping_terminates(self):
        # testDecomposition5's only contract: no blow-up on repeats
        toks = segment("くよ" * 40)
        assert toks and sum(t[2] - t[1] for t in toks) == 80


class TestSearchMode:
    def test_normal_keeps_compound(self):
        assert surfaces(segment("シニアソフトウェアエンジニア", mode="normal")) == [
            "シニアソフトウェアエンジニア"
        ]

    def test_search_splits_long_katakana(self):
        assert surfaces(segment("シニアソフトウェアエンジニア", mode="search")) == [
            "シニア", "ソフトウェア", "エンジニア",
        ]

    def test_search_compound_synonym_stream(self):
        toks = segment(
            "シニアソフトウェアエンジニア", mode="search", compound_synonyms=True
        )
        assert [(t[0], t[3], t[4]) for t in toks] == [
            ("シニア", 1, 1),
            ("シニアソフトウェアエンジニア", 0, 3),
            ("ソフトウェア", 1, 1),
            ("エンジニア", 1, 1),
        ]

    def test_kanji_length_penalty_splits_in_search(self):
        # an all-kanji arc longer than 2 chars takes (n-2)*3000 —
        # 長谷川 (5500 + 3000) loses even harder to 部長+谷川 in search
        assert surfaces(segment("数学部長谷川", mode="search")) == ["数学", "部長", "谷川"]


class TestUserDictionary:
    def test_user_word_joins_lattice(self):
        # without the user entry, unknown kanji unigrams/bigrams; with
        # it, the surface wins as one token (UserDictionary role)
        assert "関数型" not in surfaces(segment("関数型言語"))
        got = surfaces(segment("関数型言語", user_words=("関数型", "言語")))
        assert got == ["関数型", "言語"]


class TestAnalyzerIntegration:
    def test_mixed_script_tokenize(self):
        toks = tokenize("spark処理は速い fast", stem="cjk")
        assert toks == ["spark", "処理", "は", "速い", "fast"] or (
            toks[0] == "spark" and toks[-1] == "fast"
        )

    def test_expander_hooks_roundtrip(self):
        assert cjk_parts("ＡＢＣ漢字テスト".lower()) == cjk_parts("ＡＢＣ漢字テスト".lower())
        parts = cjk_parts_spans("魔女狩")
        assert [(p, s, e) for p, s, e in parts] == [("魔女", 0, 2), ("狩", 2, 3)]

    def test_offsets_series(self):
        import pandas as pd

        toks, poss, sts, ens = tokenize_pos_off_series(
            pd.Series(["abc 魔女狩大将 def"]), stem="cjk"
        )
        zipped = list(zip(toks[0], sts[0], ens[0]))
        assert ("魔女", 4, 6) in zipped and ("狩", 6, 7) in zipped and ("大将", 7, 9) in zipped
        assert toks[0][0] == "abc" and toks[0][-1] == "def"
        # positions strictly increase by 1 per part
        assert poss[0] == list(range(len(toks[0])))


@pytest.fixture(scope="module")
def cjk_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex

    rows = [
        (0, "麻薬の密売は根こそぎ絶やさなければならない"),
        (1, "魔女狩大将マシュー・ホプキンス。"),
        (2, "これは本ではない"),
        (3, "数学部長谷川は麻薬を絶やさない"),
        (4, "本の密売はない"),
    ]
    df = spark.createDataFrame(
        [(i, f"org/r", f"p{i}", "c", "ja", t) for i, t in rows],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path_factory.mktemp("cjkidx"))
    IndexBuilder(spark, IndexConfig(docs_per_chunk=4, term_buckets=2, analyzer="cjk")).build(
        df, d, assign_ids=False
    )
    return SearchIndex(spark, d)


class TestEndToEnd:
    def test_term_search(self, cjk_index):
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = Searcher(cjk_index)
        hits = {d for d, _ in s.search(A.TermQuery("密売"), k=10).hits}
        assert hits == {0, 4}
        hits = {d for d, _ in s.search(A.TermQuery("麻薬"), k=10).hits}
        assert hits == {0, 3}

    def test_phrase_search_follows_segmentation(self, cjk_index):
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = Searcher(cjk_index)
        hits = {d for d, _ in s.search(A.PhraseQuery(("麻薬", "の", "密売")), k=10).hits}
        assert hits == {0}

    def test_multiword_query_term_analyzes(self, cjk_index):
        # a raw multi-word CJK query string segments query-side
        # (QueryBuilder analyzeMultiBoolean via the expander chain)
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = Searcher(cjk_index)
        hits = {d for d, _ in s.search(A.TermQuery("麻薬の密売"), k=10).hits}
        assert 0 in hits and 4 in hits  # SHOULD of the three parts


@pytest.fixture(scope="module")
def cjk_search_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex

    rows = [
        (0, "シニアソフトウェアエンジニアは本を密売する"),
        (1, "ソフトウェアの麻薬"),
        (2, "エンジニアはない"),
    ]
    df = spark.createDataFrame(
        [(i, "org/r", f"p{i}", "c", "ja", t) for i, t in rows],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path_factory.mktemp("cjksearch"))
    IndexBuilder(
        spark, IndexConfig(docs_per_chunk=4, term_buckets=2, analyzer="cjk_search")
    ).build(df, d, assign_ids=False)
    return SearchIndex(spark, d)


class TestSearchModeIndex:
    def test_compound_and_parts_both_match(self, cjk_search_index):
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = Searcher(cjk_search_index)
        # SEARCH mode split the compound into parts...
        assert {d for d, _ in s.search(A.TermQuery("ソフトウェア"), k=10).hits} == {0, 1}
        assert {d for d, _ in s.search(A.TermQuery("エンジニア"), k=10).hits} == {0, 2}
        # a compound QUERY analyzes through the same SEARCH-mode chain
        # (QueryBuilder contract): parts → SHOULD boolean, so part docs
        # match too — but the all-parts doc ranks first
        td = s.search(A.TermQuery("シニアソフトウェアエンジニア"), k=10)
        assert {d for d, _ in td.hits} == {0, 1, 2}
        assert td.hits[0][0] == 0

    def test_compound_token_stacked_in_postings(self, cjk_search_index):
        # the dictionary compound IS a posting (df=1, doc 0), stacked
        # at the FIRST part's position — the flattened-graph layout
        stats = cjk_search_index.term_stats(["シニアソフトウェアエンジニア", "シニア"])
        assert stats["シニアソフトウェアエンジニア"][0] == 1
        assert stats["シニア"][0] == 1
        post = cjk_search_index.collect_postings(
            ["シニアソフトウェアエンジニア", "シニア"], with_positions=True
        )
        comp = post["シニアソフトウェアエンジニア"]
        part = post["シニア"]
        assert list(comp.docs) == [0] == list(part.docs)
        assert list(comp.positions[0]) == list(part.positions[0])  # posInc 0

    def test_norms_discount_compound_overlaps(self, cjk_search_index, spark):
        # dl counts the linear parts only (discountOverlaps): doc 1 is
        # ソフトウェア/の/麻薬 -> dl 3 even though no compound stacked;
        # doc 0's stacked compound must NOT inflate its dl
        from lucene_spark.analysis.cjk import segment

        norms = {
            r["doc_id"]: r["dl"]
            for r in cjk_search_index.norms.select("doc_id", "dl").collect()
        }
        parts0 = [
            t
            for t, *_ in segment("シニアソフトウェアエンジニアは本を密売する", mode="search")
        ]
        assert norms[0] == len(parts0)
        assert norms[1] == 3

    def test_compound_stream_contract(self):
        from lucene_spark.analysis.cjk import compound_stream

        toks = ["シニア", "ソフトウェア", "エンジニア", "は"]
        poss = [0, 1, 2, 3]
        t, p, o = compound_stream(toks, poss)
        assert t == [
            "シニア", "シニアソフトウェアエンジニア", "ソフトウェア", "エンジニア", "は",
        ]
        assert p == [0, 0, 1, 2, 3]
        assert o == [False, True, False, False, False]
        # position gap (dropped punct) breaks the compound span
        t2, _p2, o2 = compound_stream(["シニア", "ソフトウェア"], [0, 2])
        assert t2 == ["シニア", "ソフトウェア"] and not any(o2)

    def test_compound_stream_offset_gap_blocks_stack(self):
        """Dropped punctuation leaves NO position gap (the punct token
        never consumed a position) but DOES leave an offset gap — the
        reference's single lattice arc spans raw text, so ソフト・ウェア
        must not stack ソフトウェア. Mirrors segment()'s acc_end check."""
        from lucene_spark.analysis.cjk import compound_stream

        toks, poss = ["ソフト", "ウェア"], [0, 1]
        # offset-adjacent: the compound stacks
        t, p, o, s, e = compound_stream(toks, poss, starts=[0, 3], ends=[3, 6])
        assert t == ["ソフト", "ソフトウェア", "ウェア"]
        assert (p, o) == ([0, 0, 1], [False, True, False])
        assert (s, e) == ([0, 0, 3], [3, 6, 6])
        # offset gap (・ dropped between them): no stack
        t2, _p2, o2, _s2, _e2 = compound_stream(toks, poss, starts=[0, 4], ends=[3, 7])
        assert t2 == toks and not any(o2)
        # no offsets available: position contiguity alone decides
        # (documented legacy shape of the offsets-free call)
        t3, _p3, o3 = compound_stream(toks, poss)
        assert t3 == ["ソフト", "ソフトウェア", "ウェア"] and o3[1]


class TestViterbiVsBrute:
    def test_fuzz_lattice_vs_exhaustive_dp(self):
        """From-definition oracle: enumerate EVERY segmentation of a
        short run with the same arc set (dictionary matches + unknown
        arcs per the invoke/group rules) and the same cost model; the
        lattice must return a minimum-cost path (and the same token
        stream under the deterministic tie-break)."""
        import itertools
        import random

        from lucene_spark.analysis.cjk import (
            _CLASS_DEF,
            _UNK_COST,
            _UNK_POS,
            _conn,
            _prefix_dict,
            _search_penalty,
            _viterbi,
            char_class,
        )

        rng = random.Random(41)
        chars = "麻薬の密売は根本学部長数ないばシニアソフト"

        def arcs_at(run, i, mode):
            by_first, _ = _prefix_dict(())
            out = []
            matched = False
            for surf, pos, cost in by_first.get(run[i], ()):
                if run.startswith(surf, i):
                    out.append((surf, pos, cost + _search_penalty(surf, mode)))
                    matched = True
            cls = char_class(run[i])
            invoke, group, max_len = _CLASS_DEF[cls]
            if not matched or invoke:
                base, per = _UNK_COST[cls]
                if group:
                    j = i + 1
                    while j < len(run) and char_class(run[j]) == cls:
                        j += 1
                    surf = run[i:j]
                    out.append((surf, _UNK_POS[cls], base + per * len(surf) + _search_penalty(surf, mode)))
                else:
                    for ln in range(1, max_len + 1):
                        if i + ln > len(run) or any(char_class(c) != cls for c in run[i : i + ln]):
                            break
                        surf = run[i : i + ln]
                        out.append((surf, _UNK_POS[cls], base + per * ln + _search_penalty(surf, mode)))
            return out

        def brute(run, mode):
            best = None

            def rec(i, prev_pos, cost, path):
                nonlocal best
                if i == len(run):
                    key = (cost, tuple(-len(s) for s, _ in path), tuple(s for s, _ in path))
                    if best is None or key < best[0]:
                        best = (key, list(path))
                    return
                for surf, pos, c in arcs_at(run, i, mode):
                    path.append((surf, pos))
                    rec(i + len(surf), pos, cost + c + _conn(prev_pos, pos), path)
                    path.pop()

            rec(0, "BOS", 0, [])
            return best

        for trial in range(300):
            n = rng.randint(1, 7)
            run = "".join(rng.choice(chars) for _ in range(n))
            mode = rng.choice(["normal", "search"])
            got = _viterbi(run, mode, ())
            got_cost = None  # recompute the lattice path's cost
            cost, prev = 0, "BOS"
            for surf, s, e, pos in got:
                aa = {a[0]: a for a in arcs_at(run, s, mode)}
                assert surf in aa, (run, surf)
                cost += aa[surf][2] + _conn(prev, aa[surf][1])
                prev = aa[surf][1]
            want = brute(run, mode)
            assert want is not None
            assert cost == want[0][0], (run, mode, cost, want[0][0])
