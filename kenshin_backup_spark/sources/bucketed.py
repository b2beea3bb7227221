"""Bucketed-table layout (SURVEY.md §4.2 / SCALE.md "Relational surface").

At 100 TB the lineitem⋈orders shuffle dominates fact-fact joins. Bucketing
both tables by the join key at write time co-locates matching rows, so the
join plans as a zero-exchange sort-merge over pre-bucketed scans — the
write-once/read-many trade every warehouse makes.

Spark-native catalog (no Hive needed): ``bucketBy().sortBy().saveAsTable``
records bucket metadata the planner consumes. Bucket counts must match (or
divide) between the two sides for exchange elimination.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) catalog table.

    Drops any prior table AND its storage location first: the in-memory
    catalog forgets tables between sessions but their files persist, and
    saveAsTable refuses an existing managed location.

    ``path`` makes the table EXTERNAL at that location — pass a /tmp path
    when the session's warehouse dir may not be writable (e.g. a harness
    session whose cwd is arbitrary).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = path or urlparse(spark.conf.get("spark.sql.warehouse.dir")).path + f"/{table.lower()}"
    shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_pair: tuple[str, str]
) -> DataFrame:
    """Join two pre-bucketed catalog tables on their bucket keys — planned
    without a shuffle when bucket specs line up (asserted in
    tests/test_bucketing.py)."""
    lk, rk = key_pair
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, l[lk] == r[rk])
