"""Materialize the dedup corpus-preparation tables for an sf dir.

Usage: python tools/prepare_corpus.py [sf_dir] [out_dir]

Writes shingles.parquet / minhash_sigs.parquet / text_hashes.parquet
under out_dir (default: ./prepared_corpus). See ext/prepared.py for why
this is the 100 TB layout.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sparkwrangle.ext.prepared import prepare_corpus
from sparkwrangle.io import load_table
from sparkwrangle.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "prepared_corpus"
    spark = get_spark("prepare_corpus")
    docs = load_table(spark, sf_dir, "documents")
    prepare_corpus(spark, docs, out_dir)
    for t in ("shingles", "minhash_sigs", "text_hashes"):
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
