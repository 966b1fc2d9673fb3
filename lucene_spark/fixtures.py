"""Deterministic synthetic corpus + query fixtures (FIXTURES.md).

Input shape per BASELINE.json input_hint: an Iceberg/Parquet table of
source-code rows ``(repo, path, commit, lang, content)``. Generation is
fully seeded (seed=42 by default) — same args → byte-identical corpus.

Content is synthetic source code over a Zipf-distributed vocabulary
(stop-word-like hot terms such as ``return``/``int`` create realistic
df skew), sprinkled with tokenizer-exercising shapes (``foo.bar``,
``can't``, ``v3.14``, ``snake_case``, ``CamelCase``, >255-char tokens
that must be dropped per the maxTokenLength rule,
reference: .../analysis/standard/StandardTokenizer.java:152-166).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_KEYWORDS = [
    # hot, stop-word-like code terms (df skew head)
    "return", "int", "if", "else", "for", "while", "def", "class", "import",
    "public", "static", "void", "self", "this", "new", "var", "let", "const",
    "func", "string", "true", "false", "null", "none", "len", "range",
]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c"}
_LANGS = ["python", "java", "go", "js", "c"]
_LANG_W = [0.3, 0.25, 0.15, 0.2, 0.1]

_SPECIALS = ["foo.bar", "can't", "v3.14", "snake_case", "CamelCase", "3.14", "x" * 256]


def _vocab(rng: np.ndarray, size: int) -> list[str]:
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    words = []
    i = 0
    while len(words) < size:
        n = 2 + (i % 4)
        w = "".join(consonants[(i * 7 + j * 13) % len(consonants)] + vowels[(i * 3 + j * 5) % len(vowels)] for j in range(n))
        words.append(w + str(i % 10) if i % 11 == 0 else w)
        i += 1
    return list(dict.fromkeys(words))[:size]


def make_corpus(n_docs: int = 200, seed: int = 42) -> pd.DataFrame:
    """Deterministic corpus pandas DataFrame with content_sha256."""
    rng = np.random.default_rng(seed)
    vocab = _KEYWORDS + _vocab(rng, 400 + n_docs // 4)
    v = len(vocab)
    # Zipf-ish rank weights over the whole vocab
    weights = 1.0 / np.arange(1, v + 1) ** 1.1
    weights /= weights.sum()
    vocab_arr = np.array(vocab)

    rows = []
    for i in range(n_docs):
        n_tok = int(rng.integers(5, 400)) if i % 17 else int(rng.integers(400, 2000))
        toks = vocab_arr[rng.choice(v, size=n_tok, p=weights)].tolist()
        # sprinkle tokenizer-exercising specials deterministically
        if i % 3 == 0:
            pos = int(rng.integers(0, n_tok))
            toks[pos:pos] = [_SPECIALS[i % len(_SPECIALS)]]
        # line structure
        out, j = [], 0
        while j < len(toks):
            ln = int(rng.integers(1, 12))
            out.append(" ".join(toks[j : j + ln]))
            j += ln
        content = "\n".join(out)
        lang = _LANGS[int(rng.choice(5, p=_LANG_W))]
        name = vocab[int(rng.integers(0, v))]
        rows.append(
            {
                "repo": f"org{i % 7}/repo{i % 23}",
                "path": f"src/{vocab[i % v]}/{name}_{i}.{_EXT[lang]}",
                "commit": hashlib.sha1(f"42:{i}".encode()).hexdigest(),
                "lang": lang,
                "content": content,
                "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
            }
        )
    return pd.DataFrame(rows)


def make_queries(corpus: pd.DataFrame, n_per_band: int = 6, seed: int = 43) -> list[dict]:
    """Query fixtures drawn from corpus vocabulary at rare/mid/hot df bands."""
    from collections import Counter

    from lucene_spark.analysis import tokenize

    df_counter: Counter[str] = Counter()
    for c in corpus["content"]:
        df_counter.update(set(tokenize(c)))
    by_df = sorted(df_counter.items(), key=lambda kv: (-kv[1], kv[0]))
    hot = [t for t, _ in by_df[:20]]
    mid = [t for t, _ in by_df[len(by_df) // 3 : len(by_df) // 3 + 40]]
    rare = [t for t, _ in by_df if df_counter[t] <= 2][:40] or [t for t, _ in by_df[-40:]]
    rng = np.random.default_rng(seed)

    def pick(band):
        return band[int(rng.integers(0, len(band)))]

    queries: list[dict] = []
    qid = 0
    for _ in range(n_per_band):
        for band in (hot, mid, rare):
            for k in (1, 10, 100):
                t1, t2, t3 = pick(band), pick(hot), pick(mid)
                for q in (t1, f"{t1} AND {t2}", f"{t1} OR {t2}", f"({t1} OR {t2}) AND {t3}", f"+{t2} -{t1}"):
                    queries.append({"query_id": qid, "query": q, "k": k})
                    qid += 1
    return queries
