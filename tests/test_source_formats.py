"""Source-format coverage: the engine's scan layer reads CSV, JSON-lines
and ORC with explicit schemas, producing rows identical to the parquet
source — format choice is an I/O concern, not a semantics one."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_challange_spark.sources.catalog import load_table


def _sample(spark, sf_dir):
    # a deterministic, json/csv-safe projection of events
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(500)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_source_roundtrip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    path = str(tmp_path / "ev_csv")
    src.write.option("header", True).mode("overwrite").csv(path)
    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, value double"
    ).option("header", True).csv(path)
    assert _rows(back) == _rows(src)


def test_json_source_roundtrip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    path = str(tmp_path / "ev_json")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, value double"
    ).json(path)
    assert _rows(back) == _rows(src)


def test_orc_source_roundtrip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    path = str(tmp_path / "ev_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert _rows(back) == _rows(src)


def test_csv_scan_pushes_filters(spark, sf_dir, tmp_path):
    """Even the CSV reader gets column pruning; the filter stays in the
    plan (CSV has no row-group stats, so it's a post-read filter, but the
    projection must narrow the parsed columns)."""
    src = _sample(spark, sf_dir)
    path = str(tmp_path / "ev_csv2")
    src.write.option("header", True).mode("overwrite").csv(path)
    back = (
        spark.read.schema(
            "event_id bigint, user_id bigint, event_type string, value double"
        )
        .option("header", True)
        .csv(path)
        .filter(F.col("event_type") == "click")
        .select("event_id")
    )
    scan = next(
        l
        for l in back._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan csv" in l
    )
    assert "ReadSchema" in scan and "value" not in scan.split("ReadSchema")[1]
    assert back.count() > 0


def test_csv_permissive_captures_corrupt_records(spark, tmp_path):
    """Malformed source rows must not kill the pipeline: PERMISSIVE mode
    nulls the bad fields and captures the raw line, DROPMALFORMED removes
    the row — the ingestion-robustness dial a 100 TB load needs."""
    p = tmp_path / "dirty.csv"
    p.write_text("id,amount\n1,10.5\n2,notanumber\n3,7.25\nbroken line only\n")
    schema = "id bigint, amount double, _corrupt_record string"
    read = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()
    )
    rows = {r["id"]: r for r in read.collect()}
    assert rows[1]["amount"] == 10.5 and rows[1]["_corrupt_record"] is None
    assert rows[2]["amount"] is None and "notanumber" in rows[2]["_corrupt_record"]
    assert rows[3]["amount"] == 7.25
    corrupt = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(corrupt) == 2

    dropped = (
        spark.read.schema("id bigint, amount double")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]


def test_json_permissive_captures_corrupt_records(spark, tmp_path):
    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"id": 1, "amount": 10.5}\n'
        "this is not json\n"
        '{"id": 3, "amount": 7.25}\n'
    )
    read = (
        spark.read.schema("id bigint, amount double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = read.collect()
    good = {r["id"]: r["amount"] for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {1: 10.5, 3: 7.25}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Long-lived datasets gain columns over time; mergeSchema reconciles
    old and new footers, with NULLs for pre-evolution rows."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "x")], "id bigint, a string"
    ).write.parquet(f"{base}/batch=1")
    spark.createDataFrame(
        [(2, "y", 7.5)], "id bigint, a string, score double"
    ).write.parquet(f"{base}/batch=2")

    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) == {"id", "a", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[1]["batch"] == 1
    assert rows[2]["score"] == 7.5


def test_xml_source_roundtrip(spark, sf_dir, tmp_path):
    """Spark 4 ships a native XML source (the spark-xml package folded
    into core): row-tagged write/read must round-trip typed rows."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_xml")
    nation.write.format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(nation.schema)
        .load(path)
    )
    want = {tuple(r) for r in nation.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_observation_inline_metrics_single_pass(spark, sf_dir):
    """The Observation API attaches DQ metrics to a query WITHOUT a
    second scan: the observed row count / null count / sum arrive as a
    side effect of the one action, and match a direct recomputation."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    obs = Observation("dq")
    out = (
        ev.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("user_id").isNull().cast("long")).alias("null_users"),
            F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")).alias(
                "value_fp_sum"
            ),
        )
        .groupBy("event_type")
        .count()
    )
    out.write.mode("overwrite").format("noop").save()
    got = obs.get
    direct = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_users"),
        F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")).alias(
            "value_fp_sum"
        ),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"]
    assert got["null_users"] == (direct["null_users"] or 0)
    assert got["value_fp_sum"] == direct["value_fp_sum"]
