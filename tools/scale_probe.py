"""Empirical scale probe: rows-vs-wall-clock on the scale-critical paths.

Builds DETERMINISTIC 1x / 3x / 10x corpora from the sf0.1 documents and
embeddings tables (token-SUFFIXED replicas: replica k rewrites every
word w -> w + "xkq" — alphanumeric, so the shingle normalizer keeps the
marker attached — making each replica's internal shingle/dup structure
exactly isomorphic to the base while replica shingle spaces are exactly
DISJOINT — pair density and df distribution per replica are
scale-invariant and "linear rows -> linear work" is actually testable.
A first attempt used vocab PERMUTATION instead; with the corpus's small
shared vocabulary the replica shingle spaces collided heavily — at 10x
every shingle blew past the df cap and the pair count went to zero —
so that construction measures collision pollution, not scaling).
Corpora land under /tmp/scaleprobe and are never committed.

Probed paths (the ones whose 100 TB posture SCALE.md argues from plan
shape):

1. ngram Jaccard with the auto df-cap probe  — records the sampled
   est_max_df and the window/join mode decision at each scale, plus a
   universal-boilerplate 20x variant (100k docs; at 10x/50k docs the
   sampled estimate sits exactly ON the 50k threshold boundary) whose
   hot shingles (df = corpus size = 100k) must flip the mode to "join";
   both forced modes are also timed head-to-head on that corpus.
2. MinHash-LSH -> connected components      — iterative rounds.
3. prefix-filter (AllPairs/PPJoin) exact join — candidate fan-out.
4. PQ train + ADC top-k                     — codebook + code scan.

Usage:  python tools/scale_probe.py [--scales 1,3,10]
Prints one JSON line per (path, scale) and a summary block for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
OUT = Path("/tmp/scaleprobe")


def _load_base() -> tuple[pd.DataFrame, pd.DataFrame]:
    docs = pd.read_parquet(f"{BASE}/documents.parquet")
    emb = pd.read_parquet(f"{BASE}/embeddings.parquet")
    return docs, emb


def build_corpus(scale: int, boilerplate: bool = False) -> str:
    """Replicas 0..scale-1; replica 0 is the base verbatim; replica k>0
    suffixes every word with §k (disjoint shingle spaces, isomorphic
    internal structure). ``boilerplate=True`` appends one shared 12-word
    suffix to EVERY doc, making each boilerplate shingle's df equal the
    corpus size — the pathological hot key the auto probe exists for."""
    tag = f"x{scale}" + ("_boiler" if boilerplate else "")
    d = OUT / tag
    # the boilerplate corpora feed only the documents-side df-cap probe;
    # skipping their embeddings saves the dominant share of build time
    want = ["documents.parquet"] + ([] if boilerplate else ["embeddings.parquet"])
    if all((d / f).exists() for f in want):  # complete build only
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    docs, emb = _load_base()
    doc_parts, emb_parts = [], []
    for k in range(scale):
        rng = np.random.default_rng(1000 + k)
        dk = docs.copy()
        if k > 0:
            # ALPHANUMERIC suffix: the shingle tokenizer normalizes away
            # punctuation, so a non-alphanumeric marker would detach into
            # its own (replica-hot) token and pollute the df distribution
            suf = f"x{k}q"
            dk["text"] = dk["text"].map(
                lambda t, s=suf: " ".join(w + s for w in t.split())
            )
        dk["doc_id"] = dk["doc_id"] + k * 10_000_000
        dk["n_chars"] = dk["text"].str.len()
        doc_parts.append(dk)
        if not boilerplate:
            ek = emb.copy()
            ek["vec_id"] = ek["vec_id"] + k * 10_000_000
            if k > 0:
                noise = rng.normal(
                    0, 0.05, size=(len(ek), len(ek["embedding"].iloc[0]))
                )
                vecs = np.stack(ek["embedding"].to_numpy()) + noise
                vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
                ek["embedding"] = list(vecs.astype(np.float32))
            emb_parts.append(ek)
    all_docs = pd.concat(doc_parts, ignore_index=True)
    if boilerplate:
        boiler = " ".join(f"bplt{i}z" for i in range(12))
        all_docs["text"] = all_docs["text"] + " " + boiler
        all_docs["n_chars"] = all_docs["text"].str.len()
    # write documents LAST: its presence is the build-complete marker
    if emb_parts:
        pd.concat(emb_parts, ignore_index=True).to_parquet(
            d / "embeddings.parquet", index=False
        )
    all_docs.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from sparkwrangle.catalog import CATALOG
    from sparkwrangle.session import get_spark

    spark = get_spark("sparkwrangle-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the machinery once (python workers, noop sink, codegen)
    spark.range(10).groupBy().count().collect()
    spark.createDataFrame([(1, 1.0)], "k int, v double").groupBy("k").applyInPandas(
        lambda p: p, "k int, v double"
    ).write.format("noop").mode("overwrite").save()

    ops = [
        "x_dedup_ngram_jaccard",
        "x_dedup_cc_clusters",
        "x_dedup_prefix_filter_join",
        "x_knn_pq_adc",
    ]
    results: dict[str, dict] = {}
    # pre-pass: run every op once at the smallest scale so the timed 1x
    # numbers measure the plans, not Python-worker forks / codegen ramp
    warm_dir = build_corpus(min(scales))
    for op in ops:
        CATALOG[op].fn(spark, warm_dir).count()
    for scale in scales:
        sf_dir = build_corpus(scale)
        n_docs = len(pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]))
        for op in ops:
            t0 = time.perf_counter()
            rows = CATALOG[op].fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 2)
            results.setdefault(op, {})[scale] = {"sec": dt, "rows": rows, "docs": n_docs}
            print(json.dumps({"op": op, "scale": scale, "docs": n_docs,
                              "sec": dt, "out_rows": rows}), flush=True)
        # auto df-cap decision at this scale (natural corpus)
        from sparkwrangle.ext.dedup import ngram_jaccard_pairs, shingles
        from sparkwrangle.io import load_table

        stats: dict = {}
        sh = shingles(load_table(spark, sf_dir, "documents"), "doc_id", "text", 3)
        ngram_jaccard_pairs(sh, "doc_id", threshold=0.05, max_df=20, stats=stats).count()
        results.setdefault("auto_mode_natural", {})[scale] = stats
        print(json.dumps({"op": "auto_df_cap_probe", "scale": scale, **stats}), flush=True)

    # universal-boilerplate 2*max(scales) corpus: every boilerplate
    # shingle's df == corpus size. With the DEFAULT scales that is 20x =
    # 100k docs, decisively ABOVE HOT_KEY_EST_THRESHOLD (50k), so auto
    # MUST flip to the skew-safe join mode — at 10x/50k docs the sampled
    # estimate sits exactly on the boundary, which is the threshold
    # doing its job (the flip targets keys whose window partition would
    # hold df² work at cluster scale, not toy sizes). Smaller --scales
    # runs stay below the threshold and correctly keep window mode.
    # Both forced modes are timed head-to-head for the record.
    bdir = build_corpus(2 * max(scales), boilerplate=True)
    from sparkwrangle.ext.dedup import ngram_jaccard_pairs, shingles
    from sparkwrangle.io import load_table

    sh = shingles(load_table(spark, bdir, "documents"), "doc_id", "text", 3)
    boiler: dict = {}
    for mode in ("auto", "window", "join"):
        stats: dict = {}
        t0 = time.perf_counter()
        ngram_jaccard_pairs(
            sh, "doc_id", threshold=0.05, max_df=20, df_cap_mode=mode, stats=stats
        ).count()
        stats["sec"] = round(time.perf_counter() - t0, 2)
        boiler[mode] = stats
        print(json.dumps({"op": "boiler_df_cap", "req_mode": mode, **stats}), flush=True)
    results["boilerplate_10x"] = boiler

    print("SUMMARY " + json.dumps(results))


if __name__ == "__main__":
    main()
