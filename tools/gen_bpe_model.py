"""Regenerate the pinned BPE merge table embedded in registry.py
(``BPE_PINNED_MERGES``): the verbatim ``bpe_train`` output on the
sf0.001 documents corpus, 48 merges. The registry pins the model so the
ENCODER is hash-audited against a DuckDB replay oracle (the production
shape: train once, version the model, replay everywhere); re-run this
after a corpus regeneration and paste the printed list if it changes.

Usage: python tools/gen_bpe_model.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openedx_event_sink_clickhouse_spark.operators.bpe import bpe_train
from openedx_event_sink_clickhouse_spark.session import get_spark
from openedx_event_sink_clickhouse_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("gen-bpe-model")
    docs = load_table(spark, "documents", sf_dir)
    merges = bpe_train(docs, n_merges=48)
    products = [a + b for a, b in merges]
    assert len(set(products)) == len(products), (
        "merge products not distinct — the string-replay oracle is only "
        "exact for all-distinct products; lower n_merges or extend the "
        "oracle before pinning this model")
    print("BPE_PINNED_MERGES: list[tuple[str, str]] = [")
    for pair in merges:
        print(f"    {pair!r},")
    print("]")


if __name__ == "__main__":
    main()
