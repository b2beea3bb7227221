"""Migration path test (S8 equivalent): arbitrary long-format export →
canonical frame → ladder → fetch."""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_backup_spark.operators.fetch import Archive
from kenshin_backup_spark.operators.ladder import Ladder
from kenshin_backup_spark.operators.rollup import finalize
from kenshin_backup_spark.sources.migrate import migrate_to_ladder, read_series_export


def test_migrate_csv_export_epoch_seconds(spark, tmp_path):
    rows = [("sys.cpu", 1000 + 30 * i, float(i % 50)) for i in range(400)]
    rows += [("sys.mem", 1000 + 60 * i, float(i)) for i in range(200)]
    export = spark.createDataFrame(rows, "name string, t long, v double")
    src = str(tmp_path / "export_csv")
    export.write.option("header", True).csv(src)

    points = read_series_export(
        spark, src, fmt="csv",
        metric_col="name", ts_col="t", value_col="v",
        schema="name string, t long, v double", header=True,
    )
    assert dict(points.dtypes) == {"metric": "string", "ts": "timestamp", "value": "double"}
    assert points.count() == 600

    ladder = Ladder(root=str(tmp_path / "lad"), archives=(Archive(60, 1000),))
    migrate_to_ladder(
        spark, src, ladder, fmt="csv",
        metric_col="name", ts_col="t", value_col="v",
        schema="name string, t long, v double", header=True,
    )
    from kenshin_backup_spark.operators.ladder import fetch_from_ladder

    out = fetch_from_ladder(
        spark, ladder, metric_glob="sys.*",
        from_ts=1000, until_ts=13_000, now_ts=13_000,
    )
    vals = finalize(out, agg="sum")
    assert vals.where(F.col("value").isNotNull()).count() > 0
    assert {r["metric"] for r in vals.select("metric").distinct().collect()} == {
        "sys.cpu", "sys.mem"
    }


def test_migrate_epoch_millis_detection(spark, tmp_path):
    rows = [("m", 1_700_000_000_123 + i * 1000, 1.0) for i in range(10)]
    export = spark.createDataFrame(rows, "metric string, ts long, value double")
    p = str(tmp_path / "millis")
    export.write.parquet(p)
    points = read_series_export(spark, p)
    es = [r[0] for r in points.select(F.unix_timestamp("ts")).collect()]
    assert min(es) >= 1_700_000_000 and max(es) <= 1_700_000_010
