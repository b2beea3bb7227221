"""Measure dedup_connected_components decomposition at sf0.1 (VERDICT r4
item #4): edge-build (shingle posting join) vs star-contraction loop vs
final labeling, min-of-2 reps. Writes one JSON line to stdout."""
import json, time
from kenshin_backup_spark.session import get_spark
from kenshin_backup_spark.cache import clear_tracked
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.operators.dedup import (
    ngram_jaccard_pairs, connected_components_star,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = get_spark("cc-decompose")
# warmup
load_table(spark, SF, "documents").count()
out = {}
for rep in range(2):
    spark.catalog.clearCache(); clear_tracked()
    docs = load_table(spark, SF, "documents")
    t0 = time.perf_counter()
    edges = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=10)
    n_edges = edges.count()
    t1 = time.perf_counter()
    labels = connected_components_star(edges, nodes=docs, node_col="doc_id")
    labels.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    out[f"rep{rep}"] = {"edge_build_s": round(t1-t0,3), "cc_loop_s": round(t2-t1,3),
                        "total_s": round(t2-t0,3), "n_edges": n_edges}
print(json.dumps(out))
spark.stop()
