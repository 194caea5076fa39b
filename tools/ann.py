"""PQ ANN index lifecycle as a CLI — build once, query many.

Usage:
  python tools/ann.py build [sf_dir] [index_dir]
  python tools/ann.py query [sf_dir] [index_dir] [query_id ...]

``build`` trains the per-subspace codebooks and encodes every base
vector, persisting both as parquet — the index artifact a 100 TB
deployment stores next to the data (codes are 8 small ints per vector:
the 8× scan-volume cut). ``query`` answers ADC top-5 from the PERSISTED
index: codebooks broadcast as the per-query lookup table, base codes
scanned narrow — the raw embedding column is never read at query time.
Prints one JSON line per invocation.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from sparkwrangle.ext.similarity import (
    pq_adc_from_index,
    pq_codebooks,
    pq_encode_long,
)
from sparkwrangle.io import load_table
from sparkwrangle.session import get_spark

M, D_SUB = 8, 8


def build(spark, sf_dir: str, index_dir: str) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb, M, D_SUB).localCheckpoint()
    cb.write.mode("overwrite").parquet(f"{index_dir}/codebooks.parquet")
    cb_mat = spark.read.parquet(f"{index_dir}/codebooks.parquet")
    pq_encode_long(emb, cb_mat, M, D_SUB).write.mode("overwrite").parquet(
        f"{index_dir}/codes.parquet"
    )
    return {
        "action": "build",
        "index_dir": index_dir,
        # count the narrow SOURCE column, not a shuffle-distinct over the
        # 8x-long codes artifact just written — same number, no index scan
        "n_vectors": emb.select("vec_id").distinct().count(),
        "n_codebook_rows": cb_mat.count(),
    }


def query(spark, sf_dir: str, index_dir: str, query_ids: list[int], k: int = 5) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    cb = spark.read.parquet(f"{index_dir}/codebooks.parquet")
    codes = spark.read.parquet(f"{index_dir}/codes.parquet")
    queries = emb.filter(F.col("vec_id").isin(query_ids))
    top = (
        pq_adc_from_index(codes, cb, queries, k=k, m=M, d_sub=D_SUB)
        .orderBy("query_id", "rk")
        .collect()
    )
    return {
        "action": "query",
        "k": k,
        "results": {
            str(q): [int(r["neighbor_id"]) for r in top if r["query_id"] == q]
            for q in query_ids
        },
    }


def main() -> None:
    action = sys.argv[1] if len(sys.argv) > 1 else "build"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    index_dir = sys.argv[3] if len(sys.argv) > 3 else "pq_index"
    spark = get_spark("ann")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    if action == "build":
        out = build(spark, sf_dir, index_dir)
    elif action == "query":
        ids = [int(x) for x in sys.argv[4:]] or [0, 1, 2]
        out = query(spark, sf_dir, index_dir, ids)
    else:
        raise SystemExit(f"unknown action {action!r} (build|query)")
    out["sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
