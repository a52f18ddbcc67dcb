"""Scaling soak for the dedup/ANN stack — empirical sub-quadratic proof.

The recall tests pin CORRECTNESS at sf0.01/sf0.1; this tool pins the
SCALE claim: the bucketed self-joins behind MinHash-LSH, SimHash and
IVF must grow their candidate sets ~linearly in corpus size (an
all-pairs design would grow quadratically and die at 100 TB).

Corpora are derived repo-locally from the read-only testdata:
copy ``c`` of the documents table re-ids every row (+c·10^7) and
suffixes every word token with ``q{c}``, so shingles NEVER collide
across copies — the corpus grows n× while the planted near-dup
structure stays per-copy. A clone-style scale-up (identical text)
would plant n²-growing duplicate clusters and prove nothing about the
algorithm. Embeddings copies get a tiny deterministic per-copy offset
for the same reason.

Usage:  python tools/soak_dedup.py [mult ...]      (default: 1 5 25)
Writes tools/soak_results.json; ``tools/plan_report.py`` embeds it into
PLANS.md as the scaling table.
"""

from __future__ import annotations

import json
import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(__file__).resolve().parent / "soak_results.json"


def scaled_documents(spark, sf_dir: str, mult: int):
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.sources.parquet_io import read_table

    base = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    parts = [base]
    for c in range(1, mult):
        parts.append(
            base.select(
                (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
                F.regexp_replace("text", r"(\w+)", f"$1q{c}").alias("text"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def scaled_embeddings(spark, sf_dir: str, mult: int):
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.sources.parquet_io import read_table

    base = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    parts = [base]
    for c in range(1, mult):
        off = float(c) * 1e-3
        parts.append(
            base.select(
                (F.col("vec_id") + c * 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: (x + F.lit(off)).cast("float")
                ).alias("embedding"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [1, 5, 25]

    from data_ingestion_tool_spark.operators.dedup import (
        minhash_near_dup_pairs,
        simhash_near_dup_pairs,
    )
    from data_ingestion_tool_spark.operators.similarity import (
        _as_double,
        _assign_cells,
        ivf_centroids,
        ivf_topk,
    )
    from data_ingestion_tool_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="soak-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for mult in mults:
        docs = scaled_documents(spark, SF_DIR, mult).persist()
        n_docs = docs.count()

        secs, pairs = timed_count(minhash_near_dup_pairs(docs))
        _, cands = timed_count(
            minhash_near_dup_pairs(docs, jaccard_threshold=0.0)
        )
        rows.append(
            {"op": "minhash_lsh", "mult": mult, "n_rows": n_docs,
             "secs": secs, "candidates": cands, "pairs": pairs}
        )

        # plain 4-chunk pigeonhole scheme — measures the RAW 2^16
        # bucket background term (the default scheme switched to
        # chunk_pairs in round 8; pass it explicitly so this row keeps
        # measuring the un-mitigated baseline)
        secs, pairs = timed_count(
            simhash_near_dup_pairs(docs, scheme="chunks")
        )
        _, cands = timed_count(
            simhash_near_dup_pairs(
                docs, max_hamming=64, scheme="chunks",
                allow_recall_loss=True,
            )
        )
        rows.append(
            {"op": "simhash", "mult": mult, "n_rows": n_docs,
             "secs": secs, "candidates": cands, "pairs": pairs}
        )
        secs, pairs = timed_count(
            simhash_near_dup_pairs(docs, scheme="chunk_pairs")
        )
        _, cands = timed_count(
            simhash_near_dup_pairs(docs, max_hamming=64, scheme="chunk_pairs", allow_recall_loss=True)
        )
        rows.append(
            {"op": "simhash_pairs", "mult": mult, "n_rows": n_docs,
             "secs": secs, "candidates": cands, "pairs": pairs}
        )
        # chunk_triples (round-12 default): C(6,3)=20 triple buckets,
        # ~30-33-bit keys — background term ~20·n²/2^31, so the
        # candidate count should track TRUE pair growth (linear), not
        # the banding background
        secs, pairs = timed_count(
            simhash_near_dup_pairs(docs, scheme="chunk_triples")
        )
        _, cands = timed_count(
            simhash_near_dup_pairs(
                docs, max_hamming=64, scheme="chunk_triples",
                allow_recall_loss=True,
            )
        )
        rows.append(
            {"op": "simhash_triples", "mult": mult, "n_rows": n_docs,
             "secs": secs, "candidates": cands, "pairs": pairs}
        )
        # prefix-bucket Jaccard (round-5): candidates = same-20-char-
        # prefix pairs. The WORD-SUFFIX scaling is wrong for a prefix
        # blocking key: suffixing lengthens every word, so the 20-char
        # window covers fewer words and within-copy buckets merge —
        # measured ~n^1.5 growth that is an artifact of the
        # perturbation, not the operator. The faithful scale-up for
        # blocking keys tags EVERY copy (including copy 0) with a
        # FIXED-WIDTH front tag ("c07| " + text): buckets are
        # copy-disjoint by construction, every copy's bucket structure
        # is identical (same effective key length), and growth is
        # exactly linear — measured 1252 → 6260 → 31300 at 1/5/25x.
        from data_ingestion_tool_spark.operators import text as TX
        from data_ingestion_tool_spark.sources.parquet_io import read_table

        base_jac = read_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        )
        parts_jac = []
        for c in range(mult):
            parts_jac.append(
                base_jac.select(
                    (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
                    F.concat(
                        F.lit(f"c{c:02d}| "), F.col("text")
                    ).alias("text"),
                )
            )
        docs_jac = reduce(lambda a, b: a.unionByName(b), parts_jac)

        t = docs_jac.select(
            "doc_id",
            F.substring(F.lower("text"), 1, 20).alias("bucket"),
            F.array_distinct(TX.tokens("text")).alias("toks"),
        )
        a, b = t.alias("a"), t.alias("b")
        cand = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
        union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
        secs, cands = timed_count(cand)
        _, pairs = timed_count(cand.where(inter * 2 >= union))
        rows.append(
            {"op": "prefix_jaccard", "mult": mult, "n_rows": n_docs,
             "secs": secs, "candidates": cands, "pairs": pairs}
        )
        docs.unpersist()

        # frequency: CLONE scaling (identical copies, new ids) is correct
        # here — token shares are scale-invariant under cloning, so the
        # heavy-hitter result set must stay CONSTANT while Misra-Gries
        # candidates stay bounded by partitions x k, independent of n.
        from data_ingestion_tool_spark.operators.frequency import (
            _misra_gries_partition,
            frequent_items,
        )
        from data_ingestion_tool_spark.sources.parquet_io import read_table

        base_docs = read_table(spark, SF_DIR, "documents").select("text")
        clones = reduce(
            lambda a, b: a.unionByName(b), [base_docs] * mult
        )
        toks = clones.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
        ).filter(F.col("tok") != "")
        secs, hitters = timed_count(frequent_items(toks, "tok", 0.005))
        _, cands = timed_count(
            toks.mapInPandas(
                _misra_gries_partition("tok", 200), schema=toks.schema
            ).distinct()
        )
        rows.append(
            {"op": "heavy_hitters_mg", "mult": mult,
             "n_rows": toks.count(), "secs": secs,
             "candidates": cands, "pairs": hitters}
        )

        emb = scaled_embeddings(spark, SF_DIR, mult).persist()
        n_vecs = emb.count()
        queries = emb.orderBy("vec_id").limit(10)
        secs, pairs = timed_count(ivf_topk(emb, queries, k=5))
        # candidate set = (corpus row, probing query) join pairs
        cents = ivf_centroids(emb)
        c = _assign_cells(
            emb.select(_as_double("embedding").alias("cv")), "cv", cents, 1, "cids"
        ).select(F.col("cids")[0].alias("cid"))
        q = _assign_cells(
            queries.select(_as_double("embedding").alias("qv")),
            "qv", cents, 4, "cids",
        ).select(F.explode("cids").alias("cid"))
        _, cands = timed_count(c.join(F.broadcast(q), "cid"))
        rows.append(
            {"op": "ivf_ann", "mult": mult, "n_rows": n_vecs,
             "secs": secs, "candidates": cands, "pairs": pairs}
        )
        emb.unpersist()
        print(f"mult={mult} done: {[r for r in rows if r['mult'] == mult]}",
              file=sys.stderr)

    OUT.write_text(json.dumps({"sf_dir": SF_DIR, "rows": rows}, indent=1) + "\n")
    print(json.dumps({"sf_dir": SF_DIR, "rows": rows}))


if __name__ == "__main__":
    main()
