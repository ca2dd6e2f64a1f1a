"""BPE merge-table training: fold semantics vs a reference scan, and
the full merge chain on a corpus with a known hand-derivable answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from conversation_with_vector_db_spark.operators.bpe import (
    bpe_train,
    merge_pair_fold,
)


def _ref_merge(syms, l, r):
    out, prev = [], None
    for s in syms:
        if prev == l and s == r:
            out.append(l + r)
            prev = None
        else:
            if prev is not None:
                out.append(prev)
            prev = s
    if prev is not None:
        out.append(prev)
    return out


def test_merge_fold_matches_reference_scan(spark):
    """The JVM fold must implement the left-to-right non-overlapping
    merge exactly — including same-symbol runs, where overlap handling
    actually matters."""
    cases = [
        ("aaa", "a", "a"),
        ("aaaa", "a", "a"),
        ("aaaaa", "a", "a"),
        ("abab", "a", "b"),
        ("abab", "b", "a"),
        ("aab", "a", "b"),
        ("aaab", "a", "a"),
        ("a", "a", "a"),
        ("ba", "a", "b"),
        ("aabaa", "a", "a"),
        ("abba", "b", "b"),
        ("xyzzy", "z", "z"),
    ]
    df = spark.createDataFrame(
        [(i, list(w)) for i, (w, _, _) in enumerate(cases)], ["i", "syms"]
    )
    for i, (w, l, r) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(merge_pair_fold(F.col("syms"), l, r).alias("m"))
            .first()["m"]
        )
        assert got == _ref_merge(list(w), l, r), (w, l, r, got)


def test_bpe_train_hand_derived_chain(spark):
    """'the cat the hat' + 'the that': (t,h) x4 wins step 1, (a,t) x3
    step 2, (th,e) x3 step 3 — and each step's merged token must feed
    the NEXT step's pair counting (step 3 pairs the step-1 token)."""
    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "the that")], ["doc_id", "text"]
    )
    rows = [tuple(r) for r in bpe_train(docs, merges=3).collect()]
    assert rows == [
        (1, "t", "h", 4, 6),
        (2, "a", "t", 3, 5),
        (3, "th", "e", 3, 5),
    ]


def test_bpe_train_exhausts_gracefully(spark):
    """A vocabulary of single-symbol words has no pairs: training must
    stop early with an empty merge table, not fail."""
    docs = spark.createDataFrame([(1, "a b c a")], ["doc_id", "text"])
    assert bpe_train(docs, merges=2).collect() == []


def test_bpe_encode_stats_hand_derived(spark):
    """Under merges [(t,h),(a,t),(th,e)]: 'the cat the hat' encodes as
    the->the(1), cat->c,at(2), hat->h,at(2) => 1+2+1+2 = 6 tokens over
    4 words / 12 chars; a wordless doc keeps zero counts and a NULL
    ratio."""
    from conversation_with_vector_db_spark.operators.bpe import (
        bpe_encode_stats,
    )

    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "the that"), (3, "!!! ...")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in bpe_encode_stats(
            docs, [("t", "h"), ("a", "t"), ("th", "e")]
        ).collect()
    }
    assert rows[1]["n_words"] == 4
    assert rows[1]["n_bpe_tokens"] == 6
    assert rows[1]["chars_per_token"] == 2.0
    # 'that' -> th,at under the same merges: 1 + 2 = 3 total.
    assert rows[2]["n_bpe_tokens"] == 3
    assert rows[3]["n_words"] == 0
    assert rows[3]["n_bpe_tokens"] == 0
    assert rows[3]["chars_per_token"] is None


def test_merge_fold_randomized_against_reference(spark):
    """500 random symbol strings x 3 merge pairs (including the
    overlap-sensitive l == r), each sweep ONE Spark job — the fold must
    match the reference scan everywhere."""
    import random

    rng = random.Random(99)
    words = [
        [rng.choice("abc") for _ in range(rng.randint(0, 12))]
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        list(enumerate(words)), ["i", "syms"]
    ).repartition(7)  # partitioning must not matter
    for l, r in [("a", "a"), ("a", "b"), ("b", "a")]:
        got = {
            r_["i"]: r_["m"]
            for r_ in df.select(
                "i", merge_pair_fold(F.col("syms"), l, r).alias("m")
            ).collect()
        }
        for i, w in enumerate(words):
            assert got[i] == _ref_merge(w, l, r), (i, w, l, r)


def test_bpe_encode_shuffle_path_matches_broadcast(spark):
    """The past-the-broadcast-gate vocab join must return the identical
    frame (physical placement only)."""
    from conversation_with_vector_db_spark.operators.bpe import (
        bpe_encode_stats,
    )

    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "the that"), (3, "x")],
        ["doc_id", "text"],
    )
    merges = [("t", "h"), ("a", "t"), ("th", "e")]
    a = [tuple(r) for r in bpe_encode_stats(docs, merges).collect()]
    b = [
        tuple(r)
        for r in bpe_encode_stats(
            docs, merges, broadcast_vocab=False
        ).collect()
    ]
    assert a == b
