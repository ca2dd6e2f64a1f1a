"""Fuzzy record linkage (operators/linkage.py): planted-typo matching,
blocking contract, and the DF cap."""

from __future__ import annotations

from conversation_with_vector_db_spark.operators.linkage import (
    fuzzy_linkage_report,
    fuzzy_value_pairs,
)


def _pairs(df, **kw):
    return {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_value_pairs(df, "name", **kw).collect()
    }


def test_planted_typos_match(spark):
    df = spark.createDataFrame(
        [
            ("acme widget",),
            ("acme widgit",),   # 1 substitution
            ("acme wídget",),   # accented variant, 1 sub
            ("acme bolt",),
            ("zz totally different",),
            (None,),
        ],
        ["name"],
    )
    got = _pairs(df, max_dist=2)
    assert got[("acme widget", "acme widgit")] == 1
    assert got[("acme widget", "acme wídget")] == 1
    # "widget" vs "bolt" share the "acme" block but exceed the bound.
    assert ("acme bolt", "acme widget") not in got
    assert all("zz totally different" not in p for p in got)


def test_no_shared_token_is_out_of_scope(spark):
    # dist("cat x", "bat y") = 2 but no shared token: the blocking
    # predicate is part of the contract, not an approximation.
    df = spark.createDataFrame([("cat x",), ("bat y",)], ["name"])
    assert _pairs(df, max_dist=3) == {}


def test_token_df_cap_drops_stop_token_blocks(spark):
    # Every value shares the stop token "the"; with the cap below the
    # block size, no candidates survive blocking.
    df = spark.createDataFrame(
        [("the aa",), ("the ab",), ("the ac",), ("the ad",)], ["name"]
    )
    assert _pairs(df, max_dist=1, max_token_df=2) == {}
    got = _pairs(df, max_dist=1, max_token_df=10)
    assert ("the aa", "the ab") in got


def test_report_row_counts(spark):
    df = spark.createDataFrame(
        [("large bolt",)] * 3 + [("large bolts",)] * 2, ["name"]
    )
    rows = fuzzy_linkage_report(df, "name", max_dist=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["name_a"], r["name_b"]) == ("large bolt", "large bolts")
    assert (r["rows_a"], r["rows_b"]) == (3, 2)
    assert r["dist"] == 1


def test_value_level_pairing_ignores_row_duplication(spark):
    # 1000 duplicate rows of one value must not inflate the pair set:
    # linkage runs on the distinct value domain.
    df = spark.createDataFrame(
        [("dup name",)] * 1000 + [("dup name2",)], ["name"]
    )
    got = _pairs(df, max_dist=1)
    assert got == {("dup name", "dup name2"): 1}


class TestFuzzyPairsAlgebra:
    """r11 property pin: the token-blocked Levenshtein pairing
    (blocking cap + shared-token candidate join + length band +
    distance verify) replayed over arbitrary small name corpora
    against a brute-force reference that implements the SAME contract
    — with max_token_df=2 so the stop-token cap actually binds (the
    fixture corpus never saturates the default 256)."""

    @staticmethod
    def _lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                ))
            prev = cur
        return prev[-1]

    def test_matches_bruteforce(self, spark):
        import re

        from hypothesis import given, settings
        from hypothesis import strategies as st

        CAP, DIST = 2, 3

        @given(
            names=st.lists(
                st.lists(
                    st.sampled_from(
                        ["aa", "ab", "abc", "b", "xy", "xz"]
                    ),
                    min_size=1,
                    max_size=3,
                ).map(lambda t: " ".join(t)),
                min_size=1,
                max_size=10,
            ),
            seps=st.sampled_from([" ", "\t", " \t "]),
        )
        @settings(max_examples=12, deadline=None)
        def run(names, seps):
            # hostile separators exercise the explicit class split
            names = [n.replace(" ", seps) for n in names]
            df = spark.createDataFrame(
                [(n,) for n in names] + [(None,)], "name string"
            )
            got = {
                (r["name_a"], r["name_b"], r["dist"])
                for r in fuzzy_value_pairs(
                    df, "name", max_dist=DIST, max_token_df=CAP
                ).collect()
            }
            uniq = sorted(set(names))
            tokmap: dict = {}
            for n in uniq:
                for t in re.split("[ \t\n\x0b\f\r]+", n):
                    if t:
                        tokmap.setdefault(t, set()).add(n)
            expect = set()
            for t, members in tokmap.items():
                if len(members) > CAP:
                    continue  # stop-token: block dropped entirely
                ms = sorted(members)
                for i, a in enumerate(ms):
                    for b in ms[i + 1:]:
                        if abs(len(a) - len(b)) > DIST:
                            continue
                        d = self._lev(a, b)
                        if d <= DIST:
                            expect.add((a, b, d))
            assert got == expect

        run()


def test_unicode_levenshtein_divergence_is_a_known_oracle_limit(spark):
    """r11 cross-engine probe, same family as the unicode-lower pin in
    test_dedup.py: Spark's levenshtein counts CHARACTERS (the standard
    definition — 'é' -> 'e' is one substitution) while DuckDB's counts
    BYTES ('é' is two UTF-8 bytes -> distance 2). On non-ASCII name
    domains the fuzzy-linkage oracle would under-match vs the engine;
    the fixture p_name domain is ASCII, where the two agree exactly.
    Documented oracle limit — the ENGINE side is standard-correct, so
    this pins both current behaviors rather than degrading one."""
    import duckdb

    from pyspark.sql import functions as F

    cases = [("é", "e"), ("αβγ", "abγ"), ("ab", "aé"), ("abc", "abd")]
    got = {
        (r["a"], r["b"]): r["d"]
        for r in spark.createDataFrame(cases, "a string, b string")
        .select("a", "b", F.levenshtein("a", "b").alias("d"))
        .collect()
    }
    assert got[("é", "e")] == 1          # character-based
    assert got[("αβγ", "abγ")] == 2
    assert got[("abc", "abd")] == 1      # ASCII: same on both engines
    con = duckdb.connect()
    duck = {
        (a, b): con.execute(
            "select levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        for a, b in cases
    }
    assert duck[("é", "e")] == 2         # byte-based
    assert duck[("αβγ", "abγ")] == 4
    assert duck[("abc", "abd")] == got[("abc", "abd")]
