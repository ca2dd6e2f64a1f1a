"""Property-based tests (hypothesis) for the pure-Python operator cores
— the pieces whose invariants must hold for ANY input, not just
fixtures."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conversation_with_vector_db_spark.functions.registry import (
    classify_write_statement,
    compile_definition,
)
from conversation_with_vector_db_spark.operators.chunking import (
    recursive_split_text,
)
from conversation_with_vector_db_spark.operators.filters import build_filter

def _restore_views(spark, sf_dir, *tables):
    """Re-register REAL fixture views over a test's synthetic temp
    views. load_tables is idempotence-marker-skipped, so a plain call
    is a silent no-op after createOrReplaceTempView — clear the marker
    first or the synthetic view leaks into every later test in the
    session."""
    from conversation_with_vector_db_spark.session import (
        BASE_TABLES,
        load_tables,
    )

    try:
        spark.conf.unset("spark.cvdb.registered.sfdir")
    except Exception:
        pass
    load_tables(spark, sf_dir, tables if tables else BASE_TABLES)


texts = st.text(
    alphabet=st.sampled_from("ab cd\n.!?"), min_size=0, max_size=2000
)


class TestSplitterProperties:
    @given(texts, st.integers(20, 200))
    @settings(max_examples=200, deadline=None)
    def test_chunks_bounded_and_nonempty(self, text, size):
        overlap = size // 4
        chunks = recursive_split_text(text, size, overlap)
        for c in chunks:
            assert c == c.strip()
            assert c != ""
        # Pieces below the split threshold always merge under the cap;
        # only an unsplittable single piece may exceed it.
        for c in chunks:
            if len(c) > size:
                assert " " not in c and "\n" not in c

    @given(texts, st.integers(20, 200))
    @settings(max_examples=100, deadline=None)
    def test_content_preserved_in_order(self, text, size):
        """Every chunk's words appear in the original, in order —
        chunking never invents or reorders content."""
        chunks = recursive_split_text(text, size, size // 4)
        flat = " ".join(text.split())
        for c in chunks:
            c_flat = " ".join(c.split())
            assert c_flat in flat or c_flat == ""

    @given(texts)
    @settings(max_examples=50, deadline=None)
    def test_deterministic(self, text):
        assert recursive_split_text(text, 80, 20) == recursive_split_text(
            text, 80, 20
        )


class TestFilterBuilderProperties:
    @given(
        st.dictionaries(
            st.sampled_from(["a", "b", "c"]),
            st.one_of(
                st.integers(-100, 100),
                st.fixed_dictionaries(
                    {"gt": st.integers(-100, 100)}
                ),
                st.fixed_dictionaries(
                    {"in": st.lists(st.integers(0, 10), min_size=1, max_size=4)}
                ),
                st.fixed_dictionaries({"exists": st.booleans()}),
            ),
            min_size=0,
            max_size=3,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_always_compiles_to_column(self, spark, spec):
        # `spark` fixture: Column literals need an active JVM context.
        col = build_filter(spec)
        # A Column with a resolvable SQL representation — no raw
        # exceptions for any well-formed spec.
        assert "Column" in type(col).__name__


class TestSqlClassifierProperties:
    @given(st.text(max_size=100))
    @settings(max_examples=200, deadline=None)
    def test_never_misclassifies_garbage(self, sql):
        """Arbitrary text either classifies as a known op on a named
        table, or raises ValueError — never returns junk."""
        try:
            op, table = classify_write_statement(sql)
        except ValueError:
            return
        assert op in ("insert", "update", "delete")
        assert table.isidentifier() or table.replace("_", "").isalnum()

    @given(st.text(max_size=50))
    @settings(max_examples=100, deadline=None)
    def test_compile_rejects_all_unknown_names(self, name):
        if name in ("surrogate_token_count", "title_from_description"):
            return
        try:
            compile_definition(name)
            raise AssertionError("should have raised")
        except PermissionError:
            pass


class TestRangePushdown:
    def test_load_table_in_range_equals_post_cast_filter(self, spark, sf_dir):
        # The raw-nanos pushdown path must return exactly the rows the
        # post-cast NTZ filter would, for whole-second bounds.
        from pyspark.sql import functions as F

        from conversation_with_vector_db_spark.session import (
            load_table,
            load_table_in_range,
        )

        lo, hi = "2024-01-10", "2024-01-20 00:00:30"
        pushed = load_table_in_range(spark, sf_dir, "events", "ts", lo, hi)
        plain = load_table(spark, sf_dir, "events").filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
        )
        assert pushed.count() == plain.count()
        assert pushed.exceptAll(plain).isEmpty()
        assert plain.exceptAll(pushed).isEmpty()
        # And the range really is in the scan's pushed data filters, in
        # whichever physical representation the file stores: raw epoch
        # nanos when ts is TIMESTAMP(NANOS) (read as long, filtered
        # pre-cast), native timestamp pushdown otherwise (the driver
        # has generated both layouts across rounds).
        import pyarrow.parquet as pq

        from conversation_with_vector_db_spark.session import table_path

        ts_type = str(
            pq.read_schema(table_path(sf_dir, "events")).field("ts").type
        )
        plan = pushed._jdf.queryExecution().executedPlan().toString()
        if ts_type == "timestamp[ns]":
            assert "1704844800000000000" in plan  # 2024-01-10 epoch nanos
        else:
            assert "PushedFilters" in plan, plan
            pushed_line = next(
                ln for ln in plan.splitlines() if "PushedFilters" in ln
            )
            assert "GreaterThanOrEqual(ts," in pushed_line, plan
            assert "LessThan(ts," in pushed_line, plan


class TestQuantileThresholdProperties:
    @given(
        scores=st.lists(
            st.integers(min_value=-50, max_value=50),
            min_size=1,
            max_size=60,
        ),
        pq=st.sampled_from([(1, 5), (1, 2), (3, 4), (1, 10), (9, 10)]),
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_exact_rank_quantile(self, spark, scores, pq):
        """The histogram threshold must equal the exact lower p/q
        quantile: the smallest score s with #(scores <= s)*q >= N*p."""
        import math

        from conversation_with_vector_db_spark.operators.filters import (
            quantile_threshold,
        )

        p, q = pq
        df = spark.createDataFrame(
            [(float(s),) for s in scores], ["score"]
        )
        got = quantile_threshold(df, "score", p, q).collect()[0]["thr"]
        want = sorted(scores)[math.ceil(len(scores) * p / q) - 1]
        assert got == want
        # The keep side always covers at least the complement fraction.
        kept = sum(1 for s in scores if s >= got)
        assert kept * q >= (q - p) * len(scores) - q  # ties slack


class TestNanoLayoutPushdown:
    def test_nano_typed_file_still_takes_raw_nanos_path(
        self, spark, tmp_path
    ):
        """The r3 fixtures store timestamp[us], so the nanos branch no
        longer runs against driver data — pin it with a synthetic
        TIMESTAMP(NANOS) file (the r1/r2 layout): range rows must match
        the post-cast filter and the bound must reach the scan as raw
        nano longs."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql import functions as F

        from conversation_with_vector_db_spark.session import (
            load_table,
            load_table_in_range,
        )

        base = 1704844800  # 2024-01-10T00:00:00Z
        ts = pa.array(
            [(base + i * 86400) * 1_000_000_000 for i in range(-3, 4)],
            type=pa.timestamp("ns"),
        )
        tbl = pa.table({"event_id": list(range(7)), "ts": ts})
        sf = tmp_path / "sfnano"
        sf.mkdir()
        pq.write_table(tbl, sf / "events.parquet")

        lo, hi = "2024-01-10", "2024-01-12"
        pushed = load_table_in_range(
            spark, str(sf), "events", "ts", lo, hi
        )
        plain = load_table(spark, str(sf), "events").filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
        )
        assert sorted(r.event_id for r in pushed.collect()) == sorted(
            r.event_id for r in plain.collect()
        )
        assert pushed.count() == 2  # Jan 10 + Jan 11
        plan = pushed._jdf.queryExecution().executedPlan().toString()
        assert "1704844800000000000" in plan  # raw-nanos bound on scan


class TestBudgetThreshold:
    def test_budget_covers_and_is_tight(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from conversation_with_vector_db_spark.operators.filters import (
            budget_threshold,
        )

        @settings(max_examples=8, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.integers(min_value=-50, max_value=50),  # score
                    st.integers(min_value=1, max_value=100),   # weight
                ),
                min_size=1,
                max_size=60,
            )
        )
        def check(rows):
            df = spark.createDataFrame(
                [(i, s, w) for i, (s, w) in enumerate(rows)],
                ["id", "score", "w"],
            )
            thr = budget_threshold(df, "score", "w", 3, 5).first()["thr"]
            total = sum(w for _, w in rows)
            kept = sum(w for s, w in rows if s >= thr)
            above = sum(w for s, w in rows if s > thr)
            assert 5 * kept >= 3 * total          # budget covered
            assert 5 * above < 3 * total          # bucket-tight
        check()

    def test_regex_count_branches_agree_on_random_text(self, spark):
        """Property form of the gate-flip contract: on ARBITRARY text —
        random ASCII, punctuation, accented letters, mixed word
        boundaries — the JVM branch (ASCII-\\b rewritten java regex)
        and the Arrow branch (RE2) must produce identical counts for
        the quality-score pattern set."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from conversation_with_vector_db_spark.operators.text import (
            with_regex_counts,
        )

        alphabet = st.sampled_from(
            list("abz019 .!\t\néßÅ村_") + ["the", " a ", "aé", "é1"]
        )
        counts = [
            ("n_words", "[a-z0-9]+", True),
            ("n_stop", r"\b(the|a|of|and|to|in|is|for)\b", True),
            ("n_sym", "[^a-zA-Z0-9 ]", False),
        ]

        @settings(max_examples=6, deadline=None)
        @given(st.lists(st.lists(alphabet, max_size=30), min_size=1,
                        max_size=8))
        def check(texts):
            rows = [(i, "".join(t)) for i, t in enumerate(texts)]
            df = spark.createDataFrame(rows, "doc_id long, text string")
            get = lambda d: sorted(
                tuple(r) for r in d.drop("text").collect()
            )
            jvm = get(with_regex_counts(df, counts, src_bytes=1))
            arrow = get(with_regex_counts(df, counts, src_bytes=None))
            assert jvm == arrow

        check()

    def test_null_scores_carry_no_mass(self, spark):
        """NULL-score rows can never pass ``score >= thr``, so their
        weight must not count toward the budget denominator — even when
        the NULL bucket carries most of the total mass (which would
        otherwise make thr NULL or under-cover the budget)."""
        from conversation_with_vector_db_spark.operators.filters import (
            budget_threshold,
            quantile_threshold,
        )

        rows = [
            (0, None, 1000),  # dominant NULL-score mass
            (1, 5.0, 10),
            (2, 3.0, 10),
            (3, 1.0, 10),
        ]
        df = spark.createDataFrame(
            rows, "id long, score double, w long"
        )
        thr = budget_threshold(df, "score", "w", 2, 3).first()["thr"]
        assert thr == 3.0  # 2/3 of the NON-NULL mass -> top two buckets
        qthr = quantile_threshold(df, "score", 1, 3).first()["thr"]
        assert qthr == 1.0  # lower third of 3 non-null scores


class TestHarnessComparator:
    """The oracle comparator itself is gate infrastructure — its
    defects ARE correctness defects (spurious passes or flaky fails)."""

    def test_tolerance_equal_floats_pair_across_digit_boundary(self):
        """Reproduces the repr-sort misalignment: 9.999999999 vs 10.0
        are tolerance-equal, but "10.0" < "5.0" lexically misaligned
        the row pairing and failed a correct result."""
        from conversation_with_vector_db_spark.testing import rows_match

        spark_rows = [(("n", 5.0),), (("n", 9.999999999),)]
        duck_rows = [(("n", 5.0),), (("n", 10.0),)]
        ok, why = rows_match(spark_rows, duck_rows)
        assert ok, why
        # And a REAL mismatch of the same shape still fails.
        ok, _ = rows_match(spark_rows, [(("n", 5.0),), (("n", 10.1),)])
        assert not ok

    def test_decimal_normalizes_as_tolerant_numeric(self):
        import decimal

        from conversation_with_vector_db_spark.testing import (
            normalize,
            values_equal,
        )

        assert normalize(decimal.Decimal("1.50")) == ("n", 1.5)
        assert values_equal(
            normalize(decimal.Decimal("1.50")), normalize(1.5)
        )

    def test_map_values_respect_float_tolerance(self):
        from conversation_with_vector_db_spark.testing import (
            normalize,
            values_equal,
        )

        a = normalize({"k": 0.3})
        b = normalize({"k": 0.30000000000000004})
        assert values_equal(a, b)
        assert not values_equal(normalize({"k": 0.3}), normalize({"j": 0.3}))

    def test_with_fixtures_rejects_recursive_and_spares_identifiers(self):
        import pytest

        from conversation_with_vector_db_spark.fixtures import with_fixtures

        with pytest.raises(ValueError, match="RECURSIVE"):
            with_fixtures("WITH RECURSIVE r AS (SELECT 1) SELECT 1", "users")
        # A WITH-prefixed identifier must not be split as a CTE header.
        out = with_fixtures("WITHDRAWN_SEL", "users")
        assert out.endswith(" WITHDRAWN_SEL")

    def test_range_bounds_reject_subsecond_and_offsets(self):
        import pytest

        from conversation_with_vector_db_spark.session import (
            _iso_to_epoch_ns,
        )

        assert _iso_to_epoch_ns("2024-01-01T00:00:00") == 1704067200 * 10**9
        with pytest.raises(ValueError, match="sub-second"):
            _iso_to_epoch_ns("2024-01-01T00:00:00.500")
        with pytest.raises(ValueError, match="offset"):
            _iso_to_epoch_ns("2024-01-01T00:00:00+02:00")

    def test_subset_load_for_other_sfdir_invalidates_marker(self, spark):
        """A subset registration for a different sf_dir must not leave
        the full-set marker vouching for mixed-scale views."""
        from conversation_with_vector_db_spark.session import load_tables

        a, b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
        load_tables(spark, a)
        n_a = spark.table("events").count()
        load_tables(spark, b, ("events",))
        n_b = spark.table("events").count()
        assert n_b != n_a  # different scale actually registered
        load_tables(spark, a)
        assert spark.table("events").count() == n_a  # not short-circuited


class TestBinpackProperties:
    """compact_snapshots' first-fit bin-packer: structural invariants
    that must hold for EVERY size distribution and tag mix."""

    @given(
        sizes=st.lists(
            st.integers(min_value=0, max_value=1 << 30),
            min_size=0,
            max_size=60,
        ),
        target=st.integers(min_value=1, max_value=1 << 28),
        n_tags=st.integers(min_value=0, max_value=3),
    )
    @settings(max_examples=200, deadline=None)
    def test_groups_are_valid(self, sizes, target, n_tags):
        from conversation_with_vector_db_spark.sources.snapshot_log import (
            _binpack_segments,
            _fold_suffix,
        )

        hexes = [f"{i:032x}" for i in range(len(sizes))]
        sized = []
        for i, nbytes in enumerate(sizes):
            if n_tags:
                name = f"seg-{hexes[i]}-namespace={i % n_tags}"
            else:
                name = hexes[i]
            sized.append((f"data/{name}", nbytes))
        groups = _binpack_segments(sized, target)
        flat = [s for g in groups for s in g]
        # No segment folded twice, none invented.
        assert len(flat) == len(set(flat))
        assert set(flat) <= {rel for rel, _ in sized}
        by_rel = dict(sized)
        for g in groups:
            # Worth rewriting: >= 2 members, all under target, and the
            # group itself within the target budget.
            assert len(g) >= 2
            assert all(by_rel[s] < target for s in g)
            assert sum(by_rel[s] for s in g) <= target
            # Partition purity: one tag suffix per group.
            assert len({_fold_suffix(s) for s in g}) == 1
        # Segments at/above target are never folded.
        for rel, nbytes in sized:
            if nbytes >= target:
                assert rel not in set(flat)


@pytest.mark.heavy
class TestRollingAnomalyAlgebra:
    """The a23 rewrite rests on algebra: trailing-20 sum/sumsq/count
    via cumulative-sum lag differences must equal the direct sliding
    ROWS frame aggregates on EVERY input — short series (< 21 rows),
    ties in the ordering key, NULL values included."""

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 2),          # user
                st.integers(0, 5),          # ts (ties likely)
                st.integers(0, 9),          # tie-break id (unique-ified below)
                st.one_of(st.none(), st.integers(0, 10_000)),  # cents
            ),
            min_size=1,
            max_size=60,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_lag_differences_equal_sliding_frame(self, spark, rows):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        # unique (user, ts, id) ordering: synthesize a unique id so the
        # frame is deterministic on both formulations
        data = [
            (u, t, i, c)
            for i, (u, t, _x, c) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data, "user_id int, us int, event_id int, cents int"
        )
        wo = Window.partitionBy("user_id").orderBy("us", "event_id")
        wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ws = wo.rowsBetween(-20, -1)
        cum = df.select(
            "user_id",
            "us",
            "event_id",
            "cents",
            F.sum(F.coalesce(F.col("cents"), F.lit(0)))
            .over(wc)
            .alias("cs"),
            F.sum(
                F.coalesce(F.col("cents") * F.col("cents"), F.lit(0))
            )
            .over(wc)
            .alias("csq"),
            F.count("cents").over(wc).alias("cc"),
            F.sum("cents").over(ws).alias("s_direct"),
            F.sum(F.col("cents") * F.col("cents"))
            .over(ws)
            .alias("ssq_direct"),
            F.count("cents").over(ws).alias("n_direct"),
        )
        got = cum.select(
            "event_id",
            (
                F.lag("cs", 1, 0).over(wo) - F.lag("cs", 21, 0).over(wo)
            ).alias("s_lag"),
            (
                F.lag("csq", 1, 0).over(wo)
                - F.lag("csq", 21, 0).over(wo)
            ).alias("ssq_lag"),
            (
                F.lag("cc", 1, 0).over(wo) - F.lag("cc", 21, 0).over(wo)
            ).alias("n_lag"),
            "s_direct",
            "ssq_direct",
            "n_direct",
        ).collect()
        for r in got:
            assert r["n_lag"] == r["n_direct"], r
            # direct SUM over an all-null/empty frame is NULL; the lag
            # difference yields 0 — equivalent under the n >= 10 gate
            # (n = 0 there), so compare with 0-coalescing.
            assert r["s_lag"] == (
                r["s_direct"] if r["s_direct"] is not None else 0
            ), r
            assert r["ssq_lag"] == (
                r["ssq_direct"] if r["ssq_direct"] is not None else 0
            ), r

    def _events(self, spark, rows):
        """rows: (user_id, value) → the a23 input schema."""
        ev = [
            (u, i, 1_000_000 + i, float(v))
            for i, (u, v) in enumerate(rows)
        ]
        spark.createDataFrame(
            ev, "user_id long, event_id long, _us long, value double"
        ).selectExpr(
            "user_id",
            "event_id",
            "timestamp_micros(_us) AS ts",
            "value",
        ).createOrReplaceTempView("events")

    def test_refuses_int64_overflow_with_named_error(
        self, spark, sf_dir
    ):
        """ADVICE r10 (medium): cs/csq are UNBOUNDED-preceding int64
        running sums per user — Spark's non-ANSI sum(bigint) WRAPS
        silently while the DuckDB oracle promotes to HUGEINT, so an
        out-of-range corpus would silently diverge. The plan must
        refuse with a named OverflowError instead."""
        import pytest

        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        # one row's cents^2 = (4e12)^2 = 1.6e25 >> 2^62
        self._events(spark, [(1, 4.0e10), (1, 4.0e10)])
        try:
            with pytest.raises(OverflowError, match="sum-of-squared"):
                registry.REGISTRY["a23_rolling_anomaly"].fn.__wrapped__(
                    spark, sf_dir
                ).collect()
        finally:
            _restore_views(spark, sf_dir, "events")

    def test_footer_bound_tier_claims_only_when_provable(
        self, spark, sf_dir
    ):
        """Tier 0 of the overflow guard: parquet footer stats bound
        the global sum-of-squared-cents with ZERO Spark jobs on
        file-backed corpora, and make NO claim (None) on synthetic
        views — which then fall back to the scan tiers (the refusal
        tests above exercise exactly that path)."""
        from conversation_with_vector_db_spark.plans.analytics import (
            _csq_footer_bound,
        )
        from conversation_with_vector_db_spark.session import (
            load_tables,
        )

        load_tables(spark, sf_dir)
        ev = spark.table("events")
        bound = _csq_footer_bound(ev, "value")
        assert bound is not None and bound > 0
        # conservative: bound >= the true global sum of cents^2
        from pyspark.sql import functions as F

        true = ev.select(
            F.sum(
                F.pow(F.floor(F.col("value") * 100 + 0.5), 2)
            ).alias("g")
        ).first()["g"]
        assert bound >= true
        # fixture corpus is provably safe: the zero-job tier decides
        assert bound < float(1 << 62)
        # synthetic view: no files, no claim
        syn = spark.createDataFrame(
            [(1, 1.0)], "user_id long, value double"
        )
        assert _csq_footer_bound(syn, "value") is None
        # missing column: no claim
        assert _csq_footer_bound(ev.drop("value"), "nope") is None

    def test_global_trip_but_per_user_safe_does_not_refuse(
        self, spark, sf_dir
    ):
        """The guard is two-tier: the cheap GLOBAL sum-of-squares
        pre-check may trip while every individual user's cumulative
        csq stays in int64 range — the per-user escalation must then
        let the plan run (each user ~3.2e18 >= 2^62/2 but < 2^62;
        three users together ~9.7e18 >= 2^62)."""
        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        # cents = 1.8e9 per row -> cents^2 = 3.24e18 < 2^62 = 4.61e18
        # per user (one row each); global 3 * 3.24e18 = 9.7e18 > 2^62.
        self._events(
            spark, [(1, 1.8e7), (2, 1.8e7), (3, 1.8e7)]
        )
        try:
            out = registry.REGISTRY["a23_rolling_anomaly"].fn.__wrapped__(
                spark, sf_dir
            ).collect()
            # one row per user: n < 10 everywhere, so no flags — the
            # point is that it RUNS, not what it flags.
            assert out == []
        finally:
            _restore_views(spark, sf_dir, "events")


@pytest.mark.heavy
class TestFunnelAndRetentionAlgebra:
    """Pin the window-algebra rewrites of a20 (chained unbounded mins
    replace the 3-scan join funnel) and a21 (the offset-0 cell IS the
    cohort size) against brute-force Python references on arbitrary
    event streams — the registered query code runs as-is over a temp
    `events` view."""

    def _with_events(self, spark, sf_dir, rows):
        df = spark.createDataFrame(
            [
                (
                    i,
                    # micros -> timestamp; keep within one year
                    u,
                    et,
                    float(v),
                    ts,
                )
                for i, (u, et, v, ts) in enumerate(rows)
            ],
            "event_id long, user_id long, event_type string, "
            "value double, _us long",
        ).selectExpr(
            "event_id",
            "timestamp_micros(_us) AS ts",
            "user_id",
            "event_type",
            "value",
            "cast(null as string) AS props",
        )
        df.createOrReplaceTempView("events")

    def _restore(self, spark, sf_dir):
        _restore_views(spark, sf_dir, "events")

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 4),                       # user
                st.sampled_from(["view", "click", "purchase", "other"]),
                st.integers(0, 100),                     # value
                st.integers(0, 10**7),                   # us (ties likely at 0 scale? fine)
            ),
            min_size=1,
            max_size=50,
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_funnel_counts_match_sequential_reference(
        self, spark, sf_dir, rows
    ):
        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        try:
            self._with_events(spark, sf_dir, rows)
            # __wrapped__: the registry wrapper re-registers the
            # REAL fixture views over our temp `events`
            got = {
                r["step"]: r["users"]
                for r in registry.REGISTRY["a20_funnel_conversion"]
                .fn.__wrapped__(spark, sf_dir)
                .collect()
            }
        finally:
            self._restore(spark, sf_dir)
        # brute-force sequential funnel per user
        by_user: dict = {}
        for u, et, _v, us in rows:
            by_user.setdefault(u, []).append((et, us))
        n1 = n2 = n3 = 0
        for evs in by_user.values():
            t1 = min((us for et, us in evs if et == "view"), default=None)
            if t1 is None:
                continue
            n1 += 1
            t2 = min(
                (us for et, us in evs if et == "click" and us > t1),
                default=None,
            )
            if t2 is None:
                continue
            n2 += 1
            t3 = min(
                (us for et, us in evs if et == "purchase" and us > t2),
                default=None,
            )
            if t3 is not None:
                n3 += 1
        assert got["step_1_view"] == n1
        assert got["step_2_click"] == n2
        assert got["step_3_purchase"] == n3

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 4),       # user
                st.integers(0, 3),       # week index
            ),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_retention_offset_zero_cell_is_cohort_size(
        self, spark, sf_dir, rows
    ):
        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        WEEK = 604800000000
        ev_rows = [
            (u, "view", 0, wk * WEEK + 12345)
            for u, wk in rows
        ]
        try:
            self._with_events(spark, sf_dir, ev_rows)
            got = registry.REGISTRY[
                "a21_retention_cohorts"
            ].fn.__wrapped__(spark, sf_dir).collect()
        finally:
            self._restore(spark, sf_dir)
        first = {}
        active = set()
        for u, wk in rows:
            first[u] = min(first.get(u, wk), wk)
            active.add((u, wk))
        import collections

        cohort_size = collections.Counter(first.values())
        cells = collections.Counter(
            (first[u], wk - first[u]) for u, wk in active
        )
        for r in got:
            assert r["active_users"] == cells[
                (r["cohort_wk"], r["wk_offset"])
            ], r
            assert r["cohort_size"] == cohort_size[r["cohort_wk"]], r
            assert (
                r["retention_permille"]
                == r["active_users"] * 1000 // r["cohort_size"]
            ), r
        assert len(got) == len(cells)


@pytest.mark.heavy
class TestExactPercentileBracket:
    """Pin a19's two-phase histogram-bracket selection against true
    order statistics on arbitrary price lists — bucket-boundary values
    (exact multiples of the 1000-cent bucket), duplicates, and
    single-element inputs included. Runs the REAL registered query
    over a temp `lineitem` view."""

    @given(
        prices=st.lists(
            st.one_of(
                st.integers(0, 3000),          # dense around boundaries
                st.sampled_from([0, 999, 1000, 1001, 2000, 10**6]),
            ),
            min_size=1,
            max_size=80,
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_matches_true_order_statistics(self, spark, sf_dir, prices):
        import math

        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        df = spark.createDataFrame(
            [(c / 100.0,) for c in prices], "l_extendedprice double"
        )
        df.createOrReplaceTempView("lineitem")
        try:
            got = {
                r["label"]: (r["rank_k"], r["value_cents"])
                for r in registry.REGISTRY["a19_exact_percentiles"]
                .fn.__wrapped__(spark, sf_dir)
                .collect()
            }
        finally:
            _restore_views(spark, sf_dir, "lineitem")
        s = sorted(prices)
        n = len(s)
        for label, num, den in (
            ("p25", 1, 4),
            ("p50", 1, 2),
            ("p75", 3, 4),
            ("p99", 99, 100),
        ):
            k = (num * n + den - 1) // den
            assert got[label] == (k, s[k - 1]), (label, got[label], k)


@pytest.mark.heavy
class TestGapfillAlgebra:
    """Pin a17's integer-rational gap-fill (hourly mean round-half-up
    via positive-modulus floor division, LOCF, and exact integer
    linear interpolation) against a brute-force Python reference —
    leading/trailing gaps, single observations, and NEGATIVE values
    (the positive-modulus rounding's hard case) included."""

    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),        # event_type
                st.integers(0, 8),                   # hour bucket
                st.integers(-20000, 20000),          # value in 1e-4 units
            ),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_matches_integer_reference(self, spark, sf_dir, rows):
        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        HOUR = 3600000000
        ev = [
            (i, t, iv / 10000.0, b * HOUR + 7)
            for i, (t, b, iv) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            ev, "event_id long, event_type string, value double, _us long"
        ).selectExpr(
            "event_id",
            "timestamp_micros(_us) AS ts",
            "cast(event_id % 3 as long) AS user_id",
            "event_type",
            "value",
            "cast(null as string) AS props",
        )
        df.createOrReplaceTempView("events")
        try:
            got = {
                (r["event_type"], r["bucket"]): r
                for r in registry.REGISTRY["a17_gapfill_locf"]
                .fn.__wrapped__(spark, sf_dir)
                .collect()
            }
        finally:
            _restore_views(spark, sf_dir, "events")

        # brute-force integer reference
        from collections import defaultdict

        per = defaultdict(list)
        for t, b, iv in rows:
            per[(t, b)].append(iv)
        types = sorted({t for t, _, _ in rows})
        expect = {}
        for t in types:
            buckets = sorted(b for (tt, b) in per if tt == t)
            lo, hi = buckets[0], buckets[-1]
            hourly = {}
            for b in range(lo, hi + 1):
                ivs = per.get((t, b))
                if ivs:
                    siv, n = sum(ivs), len(ivs)
                    hourly[b] = (2 * siv + n) // (2 * n)  # round half-up
            for b in range(lo, hi + 1):
                obs = b in hourly
                n_events = len(per.get((t, b), []))
                prevs = [x for x in hourly if x <= b]
                nxts = [x for x in hourly if x >= b]
                locf = max(prevs) if prevs else None
                if obs:
                    interp = hourly[b] / 10000.0
                elif prevs and nxts:
                    pb, nb = max(prevs), min(nxts)
                    num = 2 * (
                        hourly[pb] * (nb - pb)
                        + (hourly[nb] - hourly[pb]) * (b - pb)
                    ) + (nb - pb)
                    interp = (num // (2 * (nb - pb))) / 10000.0
                else:
                    interp = None
                expect[(t, b)] = (
                    n_events,
                    obs,
                    hourly[locf] / 10000.0 if locf is not None else None,
                    interp,
                )
        assert set(got) == set(expect)
        for key, (n_events, obs, locf, interp) in expect.items():
            r = got[key]
            assert r["n_events"] == n_events, (key, r)
            assert r["observed"] == obs, (key, r)
            assert r["locf_value"] == locf, (key, r)
            assert r["interp_value"] == interp, (key, r)


@pytest.mark.heavy
class TestSessionizationAlgebra:
    """Pin a18's gaps-and-islands sessionization against a brute-force
    Python reference on arbitrary event streams — exact-boundary gaps
    (== 900 s stays in-session, > 900 s opens one), timestamp ties
    (event_id tie-break), and single-event users included."""

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 2),                       # user
                st.sampled_from([0, 1, 899, 900, 901, 2000]),  # gap sec
            ),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_matches_sequential_reference(self, spark, sf_dir, rows):
        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        # build per-user increasing timestamps from the gap steps (so
        # the boundary values land EXACTLY on 900s), plus deliberate
        # ties (gap 0)
        cur = {}
        ev = []
        for i, (u, gap) in enumerate(rows):
            cur[u] = cur.get(u, 10**6) + gap * 1_000_000
            ev.append((i, u, cur[u]))
        df = spark.createDataFrame(
            ev, "event_id long, user_id long, _us long"
        ).selectExpr(
            "event_id",
            "timestamp_micros(_us) AS ts",
            "user_id",
            "'view' AS event_type",
            "cast(1.0 as double) AS value",
            "cast(null as string) AS props",
        )
        df.createOrReplaceTempView("events")
        try:
            got = [
                (
                    r["user_id"],
                    r["session_id"],
                    r["n_events"],
                    r["start_us"],
                    r["end_us"],
                    r["duration_sec"],
                )
                for r in registry.REGISTRY["a18_sessionization"]
                .fn.__wrapped__(spark, sf_dir)
                .collect()
            ]
        finally:
            _restore_views(spark, sf_dir, "events")
        # reference: sort per user by (us, event_id), split on gap > 900s
        from collections import defaultdict

        per = defaultdict(list)
        for i, u, us in ev:
            per[u].append((us, i))
        expect = []
        for u in sorted(per):
            seq = sorted(per[u])
            sess, sessions = [seq[0]], []
            for prev, cur_ in zip(seq, seq[1:]):
                if cur_[0] - prev[0] > 900_000_000:
                    sessions.append(sess)
                    sess = [cur_]
                else:
                    sess.append(cur_)
            sessions.append(sess)
            for sid, s in enumerate(sessions, start=1):
                uss = [x[0] for x in s]
                expect.append(
                    (
                        u,
                        sid,
                        len(s),
                        min(uss),
                        max(uss),
                        (max(uss) - min(uss)) // 1_000_000,
                    )
                )
        assert sorted(got) == sorted(expect)


class TestTemporalJoinAlgebra:
    """VERDICT r10 #6: j15/j16's tie and boundary edges were
    hand-enumerated; replay the REAL registered plans over arbitrary
    event streams against brute-force references — the r10 experience
    (a20 zero-division, a23 NULL poisoning) says arbitrary streams
    find what enumeration misses."""

    MIN_US = 60_000_000
    WIN_US = 1_800_000_000  # the 30-min incident window, in micros

    def _events(self, spark, rows):
        """rows: (user, minute, event_type, quarter_value|None) →
        register the events view; returns the materialized tuples
        (event_id, user, us, event_type, value)."""
        ev = [
            (i, u, m * self.MIN_US, et, None if v is None else v / 4.0)
            for i, (u, m, et, v) in enumerate(rows)
        ]
        spark.createDataFrame(
            ev,
            "event_id long, user_id long, _us long, "
            "event_type string, value double",
        ).selectExpr(
            "event_id",
            "user_id",
            "timestamp_micros(_us) AS ts",
            "event_type",
            "value",
        ).createOrReplaceTempView("events")
        return ev

    _rows = st.lists(
        st.tuples(
            st.integers(0, 2),        # user
            st.integers(0, 75),       # minute: windows genuinely cut,
                                      # incl. exact 30-min boundaries
            st.sampled_from(["click", "purchase", "error", "view"]),
            st.one_of(st.none(), st.integers(0, 1000)),  # value*4
        ),
        min_size=1,
        max_size=40,
    )

    @given(rows=_rows)
    @settings(max_examples=10, deadline=None)
    def test_asof_attribution_matches_bruteforce(
        self, spark, sf_dir, rows
    ):
        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        ev = self._events(spark, rows)
        try:
            got = {
                r["event_id"]: (r["click_event_id"], r["gap_us"])
                for r in registry.REGISTRY["j15_asof_attribution"]
                .fn.__wrapped__(spark, sf_dir)
                .collect()
            }
        finally:
            _restore_views(spark, sf_dir, "events")
        clicks = [
            (i, u, us) for (i, u, us, et, _v) in ev if et == "click"
        ]
        expect = {}
        for i, u, us, et, _v in ev:
            if et != "purchase":
                continue
            best = max(
                (
                    (cus, ci)
                    for ci, cu, cus in clicks
                    if cu == u and cus <= us  # inclusive at-or-before
                ),
                default=None,
            )  # ties on ts: greatest event_id wins (the documented
            #    tiebreak) — tuple order (ts, id) encodes exactly that
            expect[i] = (
                (best[1], us - best[0]) if best else (None, None)
            )
        assert got == expect

    @given(rows=_rows)
    @settings(max_examples=10, deadline=None)
    def test_interval_attribution_matches_bruteforce(
        self, spark, sf_dir, rows
    ):
        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        ev = self._events(spark, rows)
        try:
            got = {
                r["incident_id"]: (
                    r["n_events"],
                    r["n_types"],
                    r["total_value"],
                )
                for r in registry.REGISTRY["j16_interval_attribution"]
                .fn.__wrapped__(spark, sf_dir)
                .collect()
            }
        finally:
            _restore_views(spark, sf_dir, "events")
        expect = {}
        for ii, u, lo, et, _v in ev:
            if et != "error":
                continue
            members = [
                (met, mv)
                for (_mi, mu, mus, met, mv) in ev
                if mu == u and lo <= mus < lo + self.WIN_US
            ]  # [lo, hi): an event exactly at lo+30min is OUT; the
            #    error event itself is IN (ts == lo)
            if members:  # inner join: empty incidents don't appear
                vals = [v for _, v in members if v is not None]
                expect[ii] = (
                    len(members),
                    len({t for t, _ in members}),
                    round(sum(vals), 4) if vals else None,
                )
        assert got == expect


@pytest.mark.heavy
class TestSubstringSpanAlgebra:
    """Replay the REAL registered dedup_substring_spans over arbitrary
    tiny-vocab corpora against a brute-force tuple-equality reference
    (no hashing — md5-60bit collisions are impossible at this size):
    stride-1 12-token windows, global frequency >= 2, within-doc
    starts merged into maximal spans when the later start <= earlier
    start + 12. A 2-4 word vocab makes repeated windows COMMON, so
    whole-doc spans, overlapping islands, and sub-window docs all
    occur naturally."""

    W = 12

    def _restore(self, spark, sf_dir):
        from conversation_with_vector_db_spark import fixtures
        from conversation_with_vector_db_spark.session import (
            load_tables,
        )

        for key in (
            "spark.cvdb.registered.sfdir",
            "spark.cvdb.derived.sfdir",
        ):
            try:
                spark.conf.unset(key)
            except Exception:
                pass
        load_tables(spark, sf_dir)
        fixtures.register_derived_views(spark)

    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]),
                min_size=0,
                max_size=40,
            ),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_bruteforce(self, spark, sf_dir, docs):
        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        W = self.W
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).createOrReplaceTempView("corpus")
        try:
            got = {
                r["doc_id"]: (
                    r["n_tokens"],
                    r["n_spans"],
                    r["dup_tokens"],
                    r["dup_fraction"],
                )
                for r in registry.REGISTRY["dedup_substring_spans"]
                .fn.__wrapped__(spark, sf_dir)
                .collect()
            }
        finally:
            self._restore(spark, sf_dir)

        # brute force: global window multiset, then per-doc islands
        from collections import Counter

        wins: Counter = Counter()
        for toks in docs:
            for i in range(len(toks) - W + 1):
                wins[tuple(toks[i:i + W])] += 1
        expect = {}
        for d, toks in enumerate(docs):
            hits = [
                i
                for i in range(len(toks) - W + 1)
                if wins[tuple(toks[i:i + W])] >= 2
            ]
            if not hits:
                continue
            spans = []
            s = prev = hits[0]
            for p in hits[1:]:
                if p > prev + W:
                    spans.append((s, prev + W))
                    s = p
                prev = p
            spans.append((s, prev + W))
            dup = sum(e - b for b, e in spans)
            expect[d] = (
                len(toks),
                len(spans),
                dup,
                round(dup / len(toks), 4),
            )
        assert got == expect


@pytest.mark.heavy
class TestFingerprintAlgebra:
    """Replay the REAL registered text_fingerprint over arbitrary
    hostile ASCII docs against a hashlib reference: whole-doc md5 of
    the normalized text plus min-md5 over 5-token shingles, with the
    documented sub-window edges (docs with < 5 tokens fingerprint
    their full token run; zero-token docs fingerprint the empty
    string; the shingle index upper bound is max(len-4, 1) on both
    sides). ASCII alphabet by design — the unicode lower() divergence
    is pinned separately as an oracle limit."""

    @given(
        docs=st.lists(
            st.text(
                alphabet="ab1 .,\t\x0b-Z",
                min_size=0,
                max_size=60,
            ),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_hashlib_reference(self, spark, sf_dir, docs):
        import hashlib
        import re

        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        rows = [(i, t) for i, t in enumerate(docs)]
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).createOrReplaceTempView("documents")
        try:
            got = {
                r["doc_id"]: (r["content_hash"], r["min_shingle"])
                for r in registry.REGISTRY["text_fingerprint"]
                .fn.__wrapped__(spark, sf_dir)
                .collect()
            }
        finally:
            _restore_views(spark, sf_dir, "documents")

        def md5(s: str) -> str:
            return hashlib.md5(s.encode()).hexdigest()

        expect = {}
        for i, t in rows:
            n = re.sub(
                "[ \t\n\x0b\f\r]+", " ", t.lower().strip(" ")
            )  # trim strips SPACES only, like both engines' trim()
            toks = re.findall("[a-z0-9]+", n)
            upper = max(len(toks) - 4, 1)
            shingles = [
                md5(" ".join(toks[j - 1:j + 4]))
                for j in range(1, upper + 1)
            ]
            expect[i] = (md5(n), min(shingles))
        assert got == expect


@pytest.mark.heavy
class TestScd2Algebra:
    """Pin w6's run-length SCD2 interval construction (lag change flag
    + running version sum + lead valid_to) against a brute-force
    reference — consecutive same-type runs, type flips on timestamp
    ties (event_id break), and single-event users."""

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 2),                  # user
                st.sampled_from(["x", "y"]),        # event_type
                st.integers(0, 5),                  # ts step
            ),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_matches_run_length_reference(self, spark, sf_dir, rows):
        from conversation_with_vector_db_spark.plans import (
            load_all,
            registry,
        )

        load_all()
        cur = {}
        ev = []
        for i, (u, t, step) in enumerate(rows):
            cur[u] = cur.get(u, 10**6) + step * 1_000_000
            ev.append((i, u, t, cur[u]))
        df = spark.createDataFrame(
            ev, "event_id long, user_id long, event_type string, _us long"
        ).selectExpr(
            "event_id",
            "timestamp_micros(_us) AS ts",
            "user_id",
            "event_type",
            "cast(1.0 as double) AS value",
            "cast(null as string) AS props",
        )
        df.createOrReplaceTempView("events")
        try:
            got = [
                tuple(r)
                for r in registry.REGISTRY["w6_scd2_intervals"]
                .fn.__wrapped__(spark, sf_dir)
                .collect()
            ]
        finally:
            _restore_views(spark, sf_dir, "events")
        from collections import defaultdict

        per = defaultdict(list)
        for i, u, t, us in ev:
            per[u].append((us, i, t))
        expect = []
        for u in sorted(per):
            seq = sorted(per[u])
            runs = []
            for us, _i, t in seq:
                if not runs or runs[-1][0] != t:
                    runs.append((t, [us]))
                else:
                    runs[-1][1].append(us)
            for v, (t, uss) in enumerate(runs, start=1):
                valid_from = min(uss)
                valid_to = (
                    min(runs[v][1]) if v < len(runs) else None
                )
                expect.append((u, v, t, valid_from, valid_to, len(uss)))
        assert sorted(got, key=str) == sorted(expect, key=str)


@pytest.mark.heavy
class TestGraphAlgebra:
    """r11: the graph pair's registered oracle covers only the
    BIPARTITE fixture shape — every edge mirrored, so no dangling
    node ever exists there, and test_graph.py's dangling/tie cases
    are hand-enumerated. Replay both operators over hypothesis-
    generated ARBITRARY directed graphs (self-loops, danglers,
    asymmetric bridges) against brute-force references — the r10/r11
    lesson is that arbitrary inputs find what enumeration misses."""

    _edges = st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=20,
    )

    @staticmethod
    def _ref_pagerank(edges, iters=3, d=0.85):
        out = {}
        for s, t in set(edges):
            out.setdefault(s, set()).add(t)
        nodes = sorted({n for e in edges for n in e})
        n = len(nodes)
        r = {v: 1.0 / n for v in nodes}
        for _ in range(iters):
            dm = sum(r[v] for v in nodes if v not in out)
            nxt = {v: (1 - d) / n + d * dm / n for v in nodes}
            for s, ts in out.items():
                for t in ts:
                    nxt[t] += d * r[s] / len(ts)
            r = nxt
        return r

    @staticmethod
    def _ref_lpa(edges, iters=3):
        e = set(edges)
        nodes = sorted({n for p in e for n in p})
        lbl = {v: v for v in nodes}
        for _ in range(iters):
            cnt = {}
            for s, t in e:
                c = cnt.setdefault(t, {})
                c[lbl[s]] = c.get(lbl[s], 0) + 1
            lbl = {
                v: (
                    min(cnt[v].items(), key=lambda kv: (-kv[1], kv[0]))[0]
                    if v in cnt
                    else lbl[v]
                )
                for v in nodes
            }
        return lbl

    @given(edges=_edges)
    @settings(max_examples=8, deadline=None)
    def test_pagerank_matches_bruteforce(self, spark, edges):
        from conversation_with_vector_db_spark.operators.cache import (
            release_all,
        )
        from conversation_with_vector_db_spark.operators.graph import (
            pagerank,
        )

        df = spark.createDataFrame(edges, "src long, dst long")
        try:
            got = {
                r["node"]: r["rank"]
                for r in pagerank(df, iters=3).collect()
            }
        finally:
            release_all()
        want = self._ref_pagerank(edges)
        assert set(got) == set(want)
        # The pin checks the ALGEBRA (dangling mass, degrees, damping)
        # to within one 6dp rounding step per side; bitwise exactness
        # across sum orders is the registered oracle's job. A kernel
        # bug (lost dangling mass, self-loop double count, degree off
        # by one) shows up at the 1e-2..1e-1 scale, not 1e-6.
        for v in want:
            assert abs(got[v] - round(want[v], 6)) <= 1.000001e-6, (
                v, got[v], want[v], edges,
            )
        # rank mass is conserved under dangling redistribution
        assert abs(sum(got.values()) - 1.0) <= len(want) * 1e-6

    @given(edges=_edges)
    @settings(max_examples=8, deadline=None)
    def test_label_propagation_matches_bruteforce(self, spark, edges):
        from conversation_with_vector_db_spark.operators.cache import (
            release_all,
        )
        from conversation_with_vector_db_spark.operators.graph import (
            label_propagation,
        )

        df = spark.createDataFrame(edges, "src long, dst long")
        try:
            got = {
                r["node"]: r["lbl"]
                for r in label_propagation(df, iters=3).collect()
            }
        finally:
            release_all()
        # integer voting with a deterministic min-label tie-break is
        # EXACT — no float tolerance on this one
        assert got == self._ref_lpa(edges), edges


@pytest.mark.heavy
class TestBpeAlgebra:
    """r11: BPE is the one iterative value-parity family with no
    hypothesis replay — train + frozen-encode are exact integer
    algebra (corpus-weighted pair counts, count-desc/(l,r)-asc
    argmax, left-to-right non-overlapping folds), so a brute-force
    reference matches EXACTLY; only chars_per_token needs the JVM's
    rounding (HALF_UP on the shortest decimal repr — Python's round
    is half-even and would diverge on exact ties like 33/32)."""

    _texts = st.lists(
        st.text(alphabet=st.sampled_from("aab1 "), max_size=12),
        min_size=1,
        max_size=6,
    )

    @staticmethod
    def _words(texts):
        import re
        from collections import Counter

        return Counter(
            w
            for t in texts
            for w in re.findall(r"[a-z0-9]+", t.lower())
        )

    @staticmethod
    def _merge(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    @classmethod
    def _ref_train(cls, texts, merges=3):
        from collections import Counter

        words = cls._words(texts)
        vocab = {w: list(w) for w in words}
        out = []
        for step in range(1, merges + 1):
            cnt = Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    cnt[(syms[i], syms[i + 1])] += words[w]
            if not cnt:
                break
            (l, r), c = min(
                cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            vocab = {w: cls._merge(s, l, r) for w, s in vocab.items()}
            n_symbols = len({s for ss in vocab.values() for s in ss})
            out.append((step, l, r, c, n_symbols))
        return out

    @given(texts=_texts)
    @settings(max_examples=8, deadline=None)
    def test_train_matches_bruteforce(self, spark, texts):
        from conversation_with_vector_db_spark.operators.bpe import (
            bpe_train,
        )
        from conversation_with_vector_db_spark.operators.cache import (
            release_all,
        )

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        try:
            got = [
                (r["step"], r["lhs"], r["rhs"], r["pair_count"],
                 r["n_symbols"])
                for r in bpe_train(docs, merges=3).collect()
            ]
        finally:
            release_all()
        assert got == self._ref_train(texts), texts

    @given(texts=_texts)
    @settings(max_examples=8, deadline=None)
    def test_encode_stats_matches_bruteforce(self, spark, texts):
        from decimal import ROUND_HALF_UP, Decimal

        from conversation_with_vector_db_spark.operators.bpe import (
            bpe_encode_stats,
        )
        from conversation_with_vector_db_spark.operators.cache import (
            release_all,
        )

        merges = [m[1:3] for m in self._ref_train(texts, merges=2)]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        try:
            got = [
                tuple(r)
                for r in bpe_encode_stats(docs, merges).collect()
            ]
        finally:
            release_all()
        import re

        expect = []
        for i, t in enumerate(texts):
            ws = re.findall(r"[a-z0-9]+", t.lower())
            syms = [list(w) for w in ws]
            for l, r in merges:
                syms = [self._merge(s, l, r) for s in syms]
            n_tok = sum(len(s) for s in syms)
            n_chars = sum(len(w) for w in ws)
            if n_tok:
                cpt = float(
                    Decimal(repr(n_chars / n_tok)).quantize(
                        Decimal("1.0000"), rounding=ROUND_HALF_UP
                    )
                )
            else:
                cpt = None
            expect.append((i, len(ws), n_tok, cpt))
        assert got == expect, texts
