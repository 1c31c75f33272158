"""Generate QUERIES.md: the full registry inventory (name, family,
oracle mode, synopsis) so coverage is auditable at a glance.

Run: python tools/gen_query_inventory.py > QUERIES.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# Reference-op families anchor on their DIGIT (^s\d_ etc.) so they never
# swallow sim_/stream_/setops_/text_/tpch_/pivot_ — the r7 inventory bug
# that tagged every tpch_q* as "T1-T3 tree/fan-out".
FAMILIES = [
    (r"flagship_", "Flagship pipeline (A1+A2+P1-P5)"),
    (r"serialize_", "EP2 serializers"),
    (r"scd2_", "SCD type-2 history"),
    (r"cur_", "Corpus curation (north-star)"),
    (r"evt_", "Event analytics (north-star)"),
    (r"ret_", "Retrieval (north-star)"),
    (r"llm_", "Composed LLM pipelines (north-star)"),
    (r"dq_", "Data-quality audits"),
    (r"profile_", "Column profiling"),
    (r"s\d_", "S1-S9 scans/filters/joins"),
    (r"p\d_", "P1-P8 projection/derivation"),
    (r"t\d_", "T1-T3 tree/fan-out"),
    (r"a1_", "A1 watermark"), (r"a3_", "A3 distinct ids"),
    (r"d1_", "D1 PII delete"),
    (r"dedup_", "Dedup (north-star)"),
    (r"graph_", "Graph analytics (north-star)"),
    (r"sim_", "Similarity search (north-star)"),
    (r"text_", "Text analysis (north-star)"),
    (r"mm_", "Multimodal (north-star)"),
    (r"stream_", "Streaming"),
    (r"tpch_", "TPC-H probe"),
    (r"window_", "Window functions"),
    (r"setops_", "Set operations"),
    (r"agg_", "Aggregate surfaces"),
    (r"topk_", "Top-k"), (r"approx_", "Approximate aggregates"),
    (r"skew_", "Skew handling"),
    (r"asof_", "As-of join"), (r"range_join_", "Range join"),
    (r"pivot_", "Pivot"), (r"json_", "JSON extraction"),
    (r"join_", "Join strategies"),
]


def family(name: str) -> str:
    for pattern, label in FAMILIES:
        if re.match(pattern, name):
            return label
    return "Other"


def synopsis(sql: str | None) -> str:
    if not sql:
        return "(rows-only: semantics pinned in tests)"
    flat = re.sub(r"\s+", " ", sql).strip()
    return flat[:110] + ("…" if len(flat) > 110 else "")


def main() -> None:
    from openedx_event_sink_clickhouse_spark.registry import REGISTRY
    n_sql = sum(1 for _, (_, sql) in REGISTRY.items() if sql)
    print("# QUERIES — registry inventory (auto-generated)\n")
    print(f"{len(REGISTRY)} queries, {n_sql} DuckDB-oracle-checked, "
          f"{len(REGISTRY) - n_sql} rows-only. "
          "Regenerate: `python tools/gen_query_inventory.py > QUERIES.md`\n")
    print("| query | family | oracle synopsis |")
    print("|---|---|---|")
    for name in sorted(REGISTRY):
        _, sql = REGISTRY[name]
        syn = synopsis(sql).replace("|", "\\|")
        print(f"| `{name}` | {family(name)} | {syn} |")


if __name__ == "__main__":
    main()
