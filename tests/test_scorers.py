import duckdb
import numpy as np
import pytest

from record_matcher_ray.functions import scorers as sc

PAIRS = [
    ("", ""),
    ("a", ""),
    ("", "b"),
    ("abc", "abc"),
    ("kitten", "sitting"),
    ("martha", "marhta"),
    ("dwayne", "duane"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("hello world", "world hello"),
    ("UPPER", "upper"),
    ("née", "nee"),
]


def test_exact_match():
    assert sc.exact_match("a", "a") == 100.0
    assert sc.exact_match("a", "b") == 0.0
    assert sc.exact_match("", "") == 100.0


def test_levenshtein_known_values():
    assert sc.levenshtein("kitten", "sitting") == pytest.approx(100 * (1 - 3 / 7))
    assert sc.levenshtein("", "") == 100.0
    assert sc.levenshtein("abc", "") == 0.0
    assert sc.levenshtein("abc", "abc") == 100.0


def test_levenshtein_vs_duckdb():
    # DuckDB's levenshtein counts UTF-8 bytes; ours counts codepoints, so
    # the cross-check is restricted to ASCII (oracle SQL uses ASCII columns).
    con = duckdb.connect()
    for x, y in PAIRS:
        if not (x.isascii() and y.isascii()):
            continue
        d = con.execute("select levenshtein(?, ?)", [x, y]).fetchone()[0]
        expected = 100.0 * (1 - d / max(len(x), len(y))) if max(len(x), len(y)) else 100.0
        assert sc.levenshtein(x, y) == pytest.approx(expected), (x, y)


def test_jaro_winkler_vs_duckdb():
    # ("","") scores 100 here (blank matches blank, consistent with the
    # reference's exact_match("","")==100) but 0 in DuckDB — oracle SQL must
    # CASE the both-blank pair.
    con = duckdb.connect()
    for x, y in PAIRS:
        if (x == "" and y == "") or not (x.isascii() and y.isascii()):
            continue  # DuckDB works on bytes and scores both-blank as 0
        jw = con.execute("select jaro_winkler_similarity(?, ?)", [x, y]).fetchone()[0]
        assert sc.jaro_winkler(x, y) == pytest.approx(jw * 100.0, abs=1e-9), (x, y)


def test_levenshtein_unicode_codepoints():
    # codepoint-based: née → nee is a single substitution
    assert sc.levenshtein("née", "nee") == pytest.approx(100 * (1 - 1 / 3))


def test_matrix_kernels_match_scalars():
    xs = np.array([x for x, _ in PAIRS], dtype=object)
    ys = np.array([y for _, y in PAIRS], dtype=object)
    for name in ["exact_match", "levenshtein", "jaro_winkler", "ngram_jaccard"]:
        s = sc.get_scorer(name)
        mat = s.pairwise(xs, ys)
        assert mat.shape == (len(xs), len(ys))
        for i, x in enumerate(xs):
            for j, y in enumerate(ys):
                assert mat[i, j] == pytest.approx(s.scalar(x, y)), (name, x, y)


def test_register_scorer_extension():
    sc.register_scorer("len_diff", lambda x, y: float(abs(len(x) - len(y))))
    assert sc.get_scorer("len_diff").scalar("ab", "abcd") == 2.0
    m = sc.get_scorer("len_diff").pairwise(
        np.array(["a", "abc"], dtype=object), np.array(["ab"], dtype=object)
    )
    assert m.tolist() == [[1.0], [1.0]]
    del sc.SCORERS["len_diff"]


def test_token_sort_ratio():
    assert sc.token_sort_ratio("hello world", "world hello") == 100.0


def test_ngram_jaccard():
    assert sc.ngram_jaccard("abcd", "abcd") == 100.0
    assert sc.ngram_jaccard("abcd", "zzzz") == 0.0
