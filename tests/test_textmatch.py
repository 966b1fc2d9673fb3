"""textmatch primitives: banded classic Levenshtein and OSA
(restricted Damerau — FuzzyQuery's transpositions=true metric)
vs unbanded from-definition DP. Pure Python, no Spark."""

import random

from lucene_spark.search.textmatch import levenshtein, osa_distance


def _brute_classic(a: str, b: str) -> int:
    D = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        nd = [i]
        for j, cb in enumerate(b, 1):
            nd.append(min(D[j] + 1, nd[j - 1] + 1, D[j - 1] + (ca != cb)))
        D = nd
    return D[-1]


def _brute_osa(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    D = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        D[i][0] = i
    for j in range(lb + 1):
        D[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i][j] = min(D[i - 1][j] + 1, D[i][j - 1] + 1, D[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                D[i][j] = min(D[i][j], D[i - 2][j - 2] + 1)
    return D[la][lb]


def test_osa_and_classic_vs_brute():
    rng = random.Random(11)
    for _ in range(4000):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
        for k in (0, 1, 2, 3):
            wo = _brute_osa(a, b)
            wc = _brute_classic(a, b)
            assert osa_distance(a, b, k) == (wo if wo <= k else k + 1), (a, b, k)
            got_c = levenshtein(a, b, k)
            assert (got_c <= k) == (wc <= k), (a, b, k)
            # metric sandwich the expansion pre-filter relies on
            assert wo <= wc <= 2 * wo or wc == wo == 0


def test_transposition_is_one_edit():
    assert osa_distance("tabel", "table", 2) == 1
    assert levenshtein("tabel", "table", 2) == 2
    # NOT unrestricted Damerau: edited substrings never re-touch
    # (OSA("ca","abc") == 3, unrestricted would give 2)
    assert osa_distance("ca", "abc", 3) == 3
