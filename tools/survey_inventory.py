"""Regenerate SURVEY.md §2.B.1 (the registry-derived query inventory).

Usage: python tools/survey_inventory.py          # rewrites SURVEY.md in place
       python tools/survey_inventory.py --print  # dump the section to stdout
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from data_ingestion_tool_spark.queries import ORACLES, QUERIES  # noqa: E402

FAM_LABEL = {
    "sources_sinks": "Sources/sinks/catalog",
    "relational": "Filter/project/join/agg/window/set (relational core)",
    "advanced": "Advanced relational / UDF / sampling",
    "statistics": "Statistics / profiling / graph",
    "analytics": "Event analytics / attribution / association",
    "tpch": "Composite (TPC-H-shaped)",
    "text": "Text analysis",
    "streaming": "Streaming",
    "sql_surface": "SQL-text surface",
    "similarity": "Similarity search / embeddings",
    "mixing": "Data mixing / curation",
    "dedup": "Dedup",
    "multimodal": "Multimodal",
    "temporal": "Temporal / as-of",
}


def section() -> str:
    fams: dict[str, dict[str, list[str]]] = {}
    for name, fn in QUERIES.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        fams.setdefault(mod, {"o": [], "r": []})
        (fams[mod]["o"] if name in ORACLES else fams[mod]["r"]).append(name)

    lines = [
        "### 2.B.1 Implemented inventory as of round 4 (registry-generated)\n",
        f"""
Every §2.B key above is implemented; the build also widened coverage
beyond the original plan. Authoritative list ({len(QUERIES)} queries, {len(ORACLES)} with
DuckDB oracles), grouped by family — regenerate this table with
`python tools/survey_inventory.py`:

| Family | duckdb-hash keys | rows-only keys |
|---|---|---|""",
    ]
    order = sorted(fams, key=lambda m: -(len(fams[m]["o"]) + len(fams[m]["r"])))
    for m in order:
        d = fams[m]
        lines.append(
            f"| {FAM_LABEL.get(m, m)} ({len(d['o']) + len(d['r'])}) | "
            f"{', '.join(sorted(d['o']))} | {', '.join(sorted(d['r'])) or '—'} |"
        )
    lines.append(
        """
TPC-H Q2/Q9/Q11/Q16/Q20 need the `partsupp` table, which
`/root/testdata` does not ship. RESOLVED in round 4 (was declared
permanently out of scope): they run against a **derived partsupp** —
distinct `(l_partkey, l_suppkey)` pairs from lineitem with
deterministic hash-formula attributes (`queries/tpch.py`), the
identical construction inlined in each DuckDB oracle as a CTE. All 22
TPC-H shapes are oracle-green.

Rows-only keys are approximate/heuristic/non-SQL-expressible by design
(LSH/IVF/PQ ANN, minhash/simhash near-dup pair sets, language-ID,
codec-gated multimodal features); each carries its own unit tests
(IVF/PQ recall vs brute force, dedup determinism, simhash pigeonhole
exactness, plumbing shape) in `tests/`. Round 5 promoted FIVE former
rows-only keys to full DuckDB-hash oracles via two techniques:
`ingest_compact_small_files` (row-targeted compaction makes the file
count a pure function of row count) and the bound-as-value pattern —
the engine-specific estimate/sample never reaches the output; the
exact twin plus an integer-math accuracy bound do
(`agg_sketch_mergeable_distinct`, `agg_approx_distinct`,
`agg_approx_quantiles` rank-error bound, `sample_seeded` binomial
5-sigma). The iterative connected-components operator also gained a
full differential oracle (`dedup_clusters_prefix_jaccard`: hash-min
label propagation vs a DuckDB recursive-CTE transitive closure over
the deterministic prefix-Jaccard pair graph).
"""
    )
    return "\n".join(lines) + "\n"


def main() -> None:
    text = section()
    if "--print" in sys.argv:
        print(text)
        return
    path = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    s = open(path).read()
    start = s.index("### 2.B.1")
    end = s.index("### 2.C")
    open(path, "w").write(s[:start] + text + s[end:])
    print(f"SURVEY.md §2.B.1: {len(QUERIES)} queries / {len(ORACLES)} oracles")


if __name__ == "__main__":
    main()
