"""Measured recall@10 for the two-level IVF auto path.

At ``n > flat_cell_cap * 8`` (524k vectors at the 65,536 default)
``ivf_fit_auto`` dispatches to the two-level quantizer; this tool
measures that path's recall@10 against brute force on the same
deterministic clustered corpus the docops ANN bench uses, plus the
fraction of the corpus scanned (the recall-per-scan trade COVERAGE.md
tracks for the flat path).

Usage: python tools/two_level_recall.py [rows] [queries] [nprobe]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from pyspark.sql import functions as F

    from clkhash_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign_two_level,
        ivf_fit_auto,
        ivf_topk_auto,
    )
    from clkhash_spark.session import build_session
    from docops_job import synthetic_embeddings

    spark = build_session(app_name="two-level-recall", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    emb = synthetic_embeddings(spark, rows).persist()
    emb.count()
    queries = (
        emb.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .persist()
    )
    queries.count()

    t0 = time.time()
    index = ivf_fit_auto(emb)
    fit_s = time.time() - t0
    assert index.kind == "two_level", (
        f"expected the two-level dispatch at n={rows}, got {index.kind}"
    )

    # Default to the SAME clamp ivf_topk_auto ships as its production
    # default (similarity.py) so a no-argument run measures the
    # configuration the engine actually uses (ADVICE r5: the old
    # cells//64 formula measured a superseded config).
    eff_probe = nprobe or max(16, min(1024, index.num_cells // 128))

    # scan fraction: probed-cell occupancy / corpus size
    assigned = ivf_assign_two_level(
        emb.select("vec_id", "embedding"), index.quantizer
    ).persist()
    sizes = {
        r["centroid_id"]: r["n"]
        for r in assigned.groupBy("centroid_id")
        .agg(F.count("*").alias("n")).collect()
    }

    t1 = time.time()
    approx = ivf_topk_auto(emb, queries, k=10, index=index,
                           nprobe=eff_probe)
    approx_sets: dict = {}
    for r in approx.collect():
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    query_s = time.time() - t1

    t2 = time.time()
    brute = brute_force_topk(emb, queries, k=10)
    brute_sets: dict = {}
    for r in brute.collect():
        brute_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    brute_s = time.time() - t2

    hits = sum(
        len(approx_sets.get(q, set()) & brute_sets[q]) for q in brute_sets
    )
    recall = hits / (len(brute_sets) * 10)

    import numpy as np
    qrows = queries.collect()
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    probe_cells = index.quantizer.probe_np(qmat, eff_probe)
    scanned = sum(
        sizes.get(int(c), 0) for cells in probe_cells for c in cells
    )
    scan_frac = scanned / (len(qrows) * rows)

    print(json.dumps({
        "rows": rows,
        "queries": n_queries,
        "kind": index.kind,
        "num_cells": index.num_cells,
        "nprobe": eff_probe,
        "fit_seconds": round(fit_s, 2),
        "query_seconds": round(query_s, 2),
        "brute_seconds": round(brute_s, 2),
        "recall_at_10": round(recall, 4),
        "scan_fraction": round(scan_frac, 4),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
