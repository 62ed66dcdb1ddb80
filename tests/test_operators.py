"""Unit tests for the silver cleaning kernel + merge semantics
(SURVEY.md §7 steps 2, 5 'hard parts')."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

from spaceparts_data_pipeline_spark.operators.dedup import dedup_latest, infer_keys
from spaceparts_data_pipeline_spark.operators.identifiers import build_column_mapping, clean_identifier
from spaceparts_data_pipeline_spark.operators.merge import merge_upsert, upsert_union_dedup
from spaceparts_data_pipeline_spark.operators.quality import drop_all_null, quarantine_split
from spaceparts_data_pipeline_spark.operators.standardize import standardize_types

#: soak tier (r16 verdict #2): excluded from the default
#: driver-facing run (see pytest.ini); run with -m soak / -m ""
pytestmark = pytest.mark.soak


class TestIdentifiers:
    def test_accent_stripping(self):
        assert clean_identifier("Añó Créated") == "ano_created"

    def test_reserved_word_suffix(self):
        assert clean_identifier("Group") == "group_col"
        assert clean_identifier("Order") == "order_col"

    def test_leading_digit_prefix(self):
        assert clean_identifier("2024_sales") == "c_2024_sales"

    def test_forbidden_chars(self):
        assert clean_identifier("Net Invoice (EUR)") == "net_invoice_eur"

    def test_collision_dedup(self):
        m = build_column_mapping(["a b", "a-b", "a_b"])
        assert list(m.values()) == ["a_b", "a_b_2", "a_b_3"]

    def test_length_cap(self):
        assert len(clean_identifier("x" * 300)) == 128

    def test_empty_becomes_col(self):
        assert clean_identifier("!!!") == "col"


class TestStandardize:
    def test_epoch_disambiguation_and_tokens(self, spark):
        schema = StructType([
            StructField("billing_date", LongType(), True),
            StructField("customer_key", StringType(), True),
            StructField("note", StringType(), True),
            StructField("net_value", DoubleType(), True),
        ])
        ns = int(dt.datetime(2025, 4, 1, tzinfo=dt.timezone.utc).timestamp()) * 10**9
        s = int(dt.datetime(2025, 3, 1, tzinfo=dt.timezone.utc).timestamp())
        df = spark.createDataFrame(
            [(ns, "  ab1 ", "  keep  ", 1.5),
             (s, "n/a", "NULL", math.nan),
             (None, None, "x", math.inf)],
            schema,
        )
        out = standardize_types(df).collect()
        assert out[0]["billing_date"] == dt.datetime(2025, 4, 1)   # ns unit
        assert out[1]["billing_date"] == dt.datetime(2025, 3, 1)   # s unit
        assert out[0]["customer_key"] == "AB1"                      # upper+trim
        assert out[1]["customer_key"] is None                       # token -> null
        assert out[0]["note"] == "keep"                             # trimmed, case kept
        assert out[1]["note"] is None
        assert out[1]["net_value"] is None                          # NaN scrubbed
        assert out[2]["net_value"] is None                          # Inf scrubbed


class TestDedup:
    def test_key_inference(self):
        assert infer_keys(["customer_key", "x", "dwcreateddate"], "dwcreateddate") == ["customer_key"]
        assert infer_keys(["a", "b", "dwcreateddate"], "dwcreateddate") == ["a", "b"]

    def test_keep_latest(self, spark):
        t0, t1 = dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 2)
        df = spark.createDataFrame(
            [("k1", 1.0, t0), ("k1", 2.0, t1), ("k2", 3.0, t0)],
            StructType([StructField("customer_key", StringType()), StructField("v", DoubleType()),
                        StructField("dwcreateddate", TimestampType())]),
        )
        out = {r["customer_key"]: r["v"] for r in dedup_latest(df).collect()}
        assert out == {"k1": 2.0, "k2": 3.0}


class TestQuality:
    def test_split_reasons_and_complement(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2031, 1, 1), 10.0, "future"),
             (dt.datetime(2025, 1, 1), 5e8, "extreme"),
             (dt.datetime(2025, 1, 1), 10.0, "clean"),
             (None, None, "nulls")],
            StructType([StructField("ship_date", TimestampType()), StructField("net_value", DoubleType()),
                        StructField("tag", StringType())]),
        )
        clean, quar = quarantine_split(df, "t", horizon="2027-01-01")
        tags = {r["tag"]: r["quarantine_reason"] for r in quar.collect()}
        assert tags == {"future": "future_date:ship_date", "extreme": "extreme_value:net_value"}
        assert {r["tag"] for r in clean.collect()} == {"clean", "nulls"}  # null predicates -> clean side

    def test_drop_all_null(self, spark):
        df = spark.createDataFrame(
            [(None, None), ("a", None)],
            StructType([StructField("x", StringType()), StructField("y", StringType())]),
        )
        assert drop_all_null(df).count() == 1


class TestMerge:
    SCHEMA = StructType([StructField("k", StringType()), StructField("v", DoubleType()),
                         StructField("ts", TimestampType())])

    def test_update_insert_null_keys_and_dup_source(self, spark):
        t0, t1 = dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 2)
        target = spark.createDataFrame([("a", 1.0, t0), ("b", 2.0, t0), (None, 3.0, t0)], self.SCHEMA)
        source = spark.createDataFrame(
            [("a", 10.0, t0), ("a", 11.0, t1),      # duplicate source key -> latest wins
             ("c", 30.0, t0),                        # insert-new
             (None, 99.0, t1)],                      # null key updates null-key row (null-safe)
            self.SCHEMA,
        )
        out = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"], order_col="ts").collect()}
        assert out == {"a": 11.0, "b": 2.0, "c": 30.0, None: 99.0}

    def test_union_dedup_upsert(self, spark):
        t0, t1 = dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 2)
        existing = spark.createDataFrame([("a", 1.0, t0), ("b", 2.0, t0)], self.SCHEMA)
        incoming = spark.createDataFrame([("a", 9.0, t1), ("c", 3.0, t0)], self.SCHEMA)
        out = {r["k"]: r["v"] for r in
               upsert_union_dedup(existing, incoming, keys=["k"], order_col="ts").collect()}
        assert out == {"a": 9.0, "b": 2.0, "c": 3.0}

    def test_touched_partition_collect_is_cardinality_guarded(self, spark):
        """The driver-side touched-partition collect has a cardinality
        CONTRACT (months/buckets, never rows): a mis-derived partition
        column must fail loudly naming the column, not ferry row-like
        cardinality through the driver (round-13 verdict #5)."""
        import pytest

        from spaceparts_data_pipeline_spark.operators.merge import (
            collect_touched_partitions,
        )

        df = spark.range(50).withColumn("bucket", F.col("id") % 4)
        got = sorted(collect_touched_partitions(df, "bucket"))
        assert got == [0, 1, 2, 3]
        # over the limit: refuse with the column name in the error
        with pytest.raises(ValueError, match="'id'.*distinct values"):
            collect_touched_partitions(df, "id", limit=10)


class TestProperties:
    def test_dedup_idempotent_and_minimal(self, spark):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=10, deadline=None)
        @given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5), st.floats(allow_nan=False, allow_infinity=False)), min_size=1, max_size=20))
        def check(rows):
            df = spark.createDataFrame(
                [(str(k), dt.datetime(2025, 1, 1) + dt.timedelta(hours=h), v) for k, h, v in rows],
                StructType([StructField("customer_key", StringType()),
                            StructField("dwcreateddate", TimestampType()),
                            StructField("v", DoubleType())]),
            )
            out = dedup_latest(df)
            collected = out.collect()
            # one row per key, carrying the max timestamp for that key
            per_key = {}
            for k, h, v in rows:
                ts = dt.datetime(2025, 1, 1) + dt.timedelta(hours=h)
                per_key[str(k)] = max(per_key.get(str(k), ts), ts)
            assert {r["customer_key"]: r["dwcreateddate"] for r in collected} == per_key
            assert dedup_latest(out).count() == len(per_key)  # idempotent

        check()


class TestTemporalProperties:
    """Property tests vs brute-force Python models (SURVEY §5 style):
    the temporal joins just moved to type-agnostic epoch arithmetic, so
    pin their semantics against an oracle that can't share the bug."""

    def test_range_pairs_equals_bruteforce(self, spark):
        from hypothesis import given, settings, strategies as st

        from spaceparts_data_pipeline_spark.operators.temporal import range_pairs

        @settings(max_examples=8, deadline=None)
        @given(st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 50)),  # (key, minute)
            min_size=1, max_size=14, unique=True))
        def check(rows):
            data = [(i, k, dt.datetime(2025, 1, 1) + dt.timedelta(minutes=m))
                    for i, (k, m) in enumerate(rows)]
            df = spark.createDataFrame(data, "event_id long, user_id long, ts timestamp")
            got = {(r["user_id"], r["id_a"], r["id_b"], r["gap_us"]) for r in
                   range_pairs(df, key="user_id", ts="ts", id_col="event_id",
                               max_gap_seconds=600).collect()}
            want = set()
            for ia, ka, ta in [(i, k, t) for i, k, t in data]:
                for ib, kb, tb in [(i, k, t) for i, k, t in data]:
                    gap = (tb - ta).total_seconds() * 1_000_000
                    if ka == kb and 0 <= gap <= 600e6 and (ta, ia) < (tb, ib):
                        want.add((ka, ia, ib, int(gap)))
            assert got == want

        check()

    def test_asof_join_equals_bruteforce(self, spark):
        from hypothesis import given, settings, strategies as st

        from spaceparts_data_pipeline_spark.operators.temporal import asof_join

        @settings(max_examples=8, deadline=None)
        @given(
            st.lists(st.tuples(st.integers(0, 1), st.integers(0, 30)),
                     min_size=1, max_size=8),                       # left (key, minute)
            st.lists(st.tuples(st.integers(0, 1), st.integers(0, 30),
                               st.floats(0, 9, allow_nan=False)),
                     min_size=1, max_size=8),                       # right (key, minute, px)
        )
        def check(lrows, rrows):
            base = dt.datetime(2025, 1, 1)
            left = spark.createDataFrame(
                [(i, k, base + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(lrows)],
                "lid long, k long, ts timestamp")
            right = spark.createDataFrame(
                [(k, base + dt.timedelta(minutes=m), v) for k, m, v in rrows],
                "k long, rts timestamp, px double")
            got = {r["lid"]: r["px"] for r in
                   asof_join(left, right, on=["k"], left_ts="ts",
                             right_ts="rts", value_cols=["px"]).collect()}
            for i, (k, m) in enumerate(lrows):
                lts = base + dt.timedelta(minutes=m)
                cands = [(base + dt.timedelta(minutes=rm), v)
                         for rk, rm, v in rrows
                         if rk == k and base + dt.timedelta(minutes=rm) <= lts]
                # dedup to one row per (key, ts) keep-max value, like the op
                want = None
                if cands:
                    best_ts = max(t for t, _ in cands)
                    want = max(v for t, v in cands if t == best_ts)
                assert got[i] == want, (i, got[i], want)

        check()

    def test_sequence_packing_invariants(self, spark):
        """Placements tile the per-shard token stream exactly: starts
        chain (each doc starts where the previous ended), spans cover
        n_tokens, and every offset < capacity."""
        from hypothesis import given, settings, strategies as st

        from spaceparts_data_pipeline_spark.operators.text import sequence_packing

        @settings(max_examples=8, deadline=None)
        @given(st.lists(st.tuples(st.integers(0, 1), st.integers(1, 12)),
                        min_size=1, max_size=10))
        def check(rows):
            cap = 5
            data = [(i, str(s), "w " * n) for i, (s, n) in enumerate(rows)]
            df = spark.createDataFrame(data, "doc_id long, source string, text string")
            out = sorted(
                sequence_packing(df, capacity=cap, shard_col="source").collect(),
                key=lambda r: (r["source"], r["doc_id"]))
            pos = {}
            for r in out:
                start = pos.get(r["source"], 0)
                assert r["start_seq"] == start // cap
                assert r["start_offset"] == start % cap
                end = start + r["n_tokens"] - 1
                assert r["end_seq"] == end // cap
                assert 0 <= r["start_offset"] < cap
                pos[r["source"]] = start + r["n_tokens"]

        check()


class TestScd2History:
    def _feed(self, spark, rows):
        import datetime as dt
        data = [(uid, et, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), eid)
                for uid, et, m, eid in rows]
        return spark.createDataFrame(
            data, "user_id long, event_type string, ts timestamp, event_id long")

    def test_collapses_runs_and_chains_validity(self, spark):
        from spaceparts_data_pipeline_spark.operators.merge import scd2_history
        df = self._feed(spark, [
            (1, "a", 0, 10), (1, "a", 5, 11), (1, "b", 10, 12),
            (1, "b", 15, 13), (1, "a", 20, 14),
            (2, "x", 0, 20),
        ])
        out = sorted(
            scd2_history(df, ["user_id"], "ts", ["event_type"],
                         tie_breakers=["event_id"]).collect(),
            key=lambda r: (r["user_id"], r["version"]))
        u1 = [r for r in out if r["user_id"] == 1]
        assert [r["event_type"] for r in u1] == ["a", "b", "a"]
        assert [r["version"] for r in u1] == [1, 2, 3]
        # valid_to chains exactly to the next version's valid_from
        for prev, nxt in zip(u1, u1[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["is_current"] is False
        assert u1[-1]["valid_to"] is None and u1[-1]["is_current"] is True
        u2 = [r for r in out if r["user_id"] == 2]
        assert len(u2) == 1 and u2[0]["is_current"] is True

    def test_null_tracked_value_opens_and_changes_versions(self, spark):
        from spaceparts_data_pipeline_spark.operators.merge import scd2_history
        df = self._feed(spark, [
            (3, None, 0, 30), (3, None, 5, 31), (3, "z", 10, 32), (3, None, 15, 33),
        ])
        out = sorted(
            scd2_history(df, ["user_id"], "ts", ["event_type"],
                         tie_breakers=["event_id"]).collect(),
            key=lambda r: r["version"])
        assert [r["event_type"] for r in out] == [None, "z", None]

    def test_ts_tie_broken_by_event_id(self, spark):
        from spaceparts_data_pipeline_spark.operators.merge import scd2_history
        df = self._feed(spark, [(4, "b", 0, 41), (4, "a", 0, 40)])
        out = sorted(
            scd2_history(df, ["user_id"], "ts", ["event_type"],
                         tie_breakers=["event_id"]).collect(),
            key=lambda r: r["version"])
        assert [r["event_type"] for r in out] == ["a", "b"]


class TestScd2Apply:
    def _hist(self, spark, rows):
        import datetime as dt
        data = [(uid, et, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), eid)
                for uid, et, m, eid in rows]
        df = spark.createDataFrame(
            data, "user_id long, event_type string, ts timestamp, event_id long")
        from spaceparts_data_pipeline_spark.operators.merge import scd2_history
        return df, scd2_history(df, ["user_id"], "ts", ["event_type"],
                                tie_breakers=["event_id"])

    def _batch(self, spark, rows):
        import datetime as dt
        data = [(uid, et, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), eid)
                for uid, et, m, eid in rows]
        return spark.createDataFrame(
            data, "user_id long, event_type string, ts timestamp, event_id long")

    def test_apply_equals_rebuild(self, spark):
        from spaceparts_data_pipeline_spark.operators.merge import scd2_apply, scd2_history
        feed1 = [(1, "a", 0, 1), (1, "b", 10, 2), (2, "x", 0, 3), (3, "k", 5, 4)]
        feed2 = [(1, "b", 20, 5), (1, "c", 30, 6),   # collapse then change
                 (3, "m", 40, 7), (3, "k", 50, 8),   # two changes
                 (9, "new", 15, 9), (9, "new2", 25, 10)]  # fresh key
        df1, h1 = self._hist(spark, feed1)
        b2 = self._batch(spark, feed2)
        applied = scd2_apply(h1, b2, ["user_id"], "ts", ["event_type"],
                             tie_breakers=["event_id"])
        rebuilt = scd2_history(df1.unionByName(b2), ["user_id"], "ts",
                               ["event_type"], tie_breakers=["event_id"])
        key = lambda r: (r["user_id"], r["version"])
        a = sorted([r.asDict() for r in applied.collect()], key=key)
        b = sorted([r.asDict() for r in rebuilt.collect()], key=key)
        assert a == b

    def test_collapse_keeps_open_version_open_until_real_change(self, spark):
        from spaceparts_data_pipeline_spark.operators.merge import scd2_apply
        _, h1 = self._hist(spark, [(1, "a", 0, 1)])
        b2 = self._batch(spark, [(1, "a", 10, 2)])  # no attribute change
        out = scd2_apply(h1, b2, ["user_id"], "ts", ["event_type"],
                         tie_breakers=["event_id"]).collect()
        assert len(out) == 1
        r = out[0]
        assert r["is_current"] is True and r["valid_to"] is None and r["version"] == 1

    def test_version_numbering_continues(self, spark):
        from spaceparts_data_pipeline_spark.operators.merge import scd2_apply
        _, h1 = self._hist(spark, [(1, "a", 0, 1), (1, "b", 5, 2), (1, "c", 10, 3)])
        b2 = self._batch(spark, [(1, "d", 20, 4), (1, "e", 30, 5)])
        out = sorted(scd2_apply(h1, b2, ["user_id"], "ts", ["event_type"],
                                tie_breakers=["event_id"]).collect(),
                     key=lambda r: r["version"])
        assert [r["version"] for r in out] == [1, 2, 3, 4, 5]
        assert [r["event_type"] for r in out] == ["a", "b", "c", "d", "e"]
        assert out[2]["valid_to"] == out[3]["valid_from"]  # old open closed by batch
        assert out[-1]["is_current"] is True

    def test_untouched_keys_pass_through(self, spark):
        from spaceparts_data_pipeline_spark.operators.merge import scd2_apply
        _, h1 = self._hist(spark, [(1, "a", 0, 1), (2, "x", 0, 2), (2, "y", 5, 3)])
        b2 = self._batch(spark, [(1, "b", 10, 4)])
        before = {(r["user_id"], r["version"]): r.asDict()
                  for r in h1.filter("user_id = 2").collect()}
        after = {(r["user_id"], r["version"]): r.asDict()
                 for r in scd2_apply(h1, b2, ["user_id"], "ts", ["event_type"],
                                     tie_breakers=["event_id"])
                 .filter("user_id = 2").collect()}
        assert before == after
