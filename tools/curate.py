"""Run the corpus-curation pipeline end to end and write the curated
training corpus.

Usage: python tools/curate.py [sf_dir] [out_dir]

Applies the same staged pipeline as the oracle-checked
`x_curation_pipeline_end_to_end` catalog query (quality quintile prune
per language → MinHash-LSH + exact-Jaccard verified connected-components
dedup → 8-gram decontamination against the src0 eval stand-in), joins
the keep-list back to the full documents, and writes the curated corpus
partitioned by language — the layout a downstream tokenizer job scans
with partition pruning. Prints a one-line JSON attrition summary.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from sparkwrangle.catalog import CATALOG
from sparkwrangle.io import load_table, write_table
from sparkwrangle.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "curated_corpus"
    spark = get_spark("curate")
    docs = load_table(spark, sf_dir, "documents")
    keep = CATALOG["x_curation_pipeline_end_to_end"].fn(spark, sf_dir)
    curated = docs.join(keep.select("doc_id"), "doc_id").select(
        "doc_id", "lang", "source", "text", "n_chars"
    )
    write_table(curated, f"{out_dir}/documents.parquet", partition_by=["lang"])
    n_in = docs.count()
    n_train = docs.filter(F.col("source") != "src0").count()
    n_out = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "out_dir": out_dir,
                "docs_total": n_in,
                "docs_train": n_train,
                "docs_kept": n_out,
                "attrition_pct": round(100.0 * (1 - n_out / n_train), 2) if n_train else None,
            }
        )
    )


if __name__ == "__main__":
    main()
