"""Generate QUERIES.md: the full registry inventory (name, family,
oracle mode, synopsis) so coverage is auditable at a glance.

Run: python tools/gen_query_inventory.py > QUERIES.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

FAMILIES = [
    ("flagship_", "Flagship pipeline (A1+A2+P1-P5)"),
    ("serialize_", "EP2 serializers"),
    ("scd2_", "SCD type-2 history"),
    ("cur_", "Corpus curation (north-star)"),
    ("evt_", "Event analytics (north-star)"),
    ("ret_", "Retrieval (north-star)"),
    ("llm_", "Composed LLM pipelines (north-star)"),
    ("dq_", "Data-quality audits"),
    ("profile_", "Column profiling"),
    ("s", "S1-S9 scans/filters/joins"),
    ("p", "P1-P8 projection/derivation"),
    ("t", "T1-T3 tree/fan-out"),
    ("a1", "A1 watermark"), ("a3", "A3 distinct ids"),
    ("d1", "D1 PII delete"),
    ("dedup_", "Dedup (north-star)"),
    ("graph_", "Graph analytics (north-star)"),
    ("sim_", "Similarity search (north-star)"),
    ("text_", "Text analysis (north-star)"),
    ("mm_", "Multimodal (north-star)"),
    ("stream_", "Streaming"),
    ("tpch_", "TPC-H probe"),
    ("window_", "Window functions"),
    ("setops_", "Set operations"),
    ("agg_", "Aggregate surfaces"),
    ("topk_", "Top-k"), ("approx_", "Approximate aggregates"),
    ("skew_", "Skew handling"),
    ("asof_", "As-of join"), ("range_join_", "Range join"),
    ("pivot_", "Pivot"), ("json_", "JSON extraction"),
]


def family(name: str) -> str:
    for prefix, label in FAMILIES:
        if name.startswith(prefix):
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
