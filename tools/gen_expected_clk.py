"""Generate committed expected outputs for the 4 CLK-family queries so
the driver's DuckDB gate can hash-check them (they contain HMAC-SHA1/MD5,
which SQL cannot express).

Independence: every expected CLK comes from the *scalar* reference-parity
encoder (``core/hashing.py::encode_record`` — proven byte-exact against
data61/clkhash by the 651 golden vectors in tests/golden_vectors.json),
NOT from the Spark batch path under test. The linkage expectations come
from a brute-force all-pairs numpy Dice + union-find over those scalar
CLKs — no LSH, no Spark operators — then cross-checked against the
live pipeline before being written.

Outputs (tests/expected/):
- clk_encode_<sf>.parquet  : url, text_md5, clk_b64, popcount  (per SF —
  the oracle SQL joins on (url, text_md5) against the live ``documents``
  view, so one static SQL string works at every scale factor)
- clk_linkage_clusters.parquet : cluster_size, n_clusters
- clk_linkage_f1.parquet       : tp, predicted, truth, precision, recall, f1

Usage: python tools/gen_expected_clk.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXPECTED_DIR = os.path.join(REPO, "tests", "expected")
SECRET = "spark-graft-secret"
SF_DIRS = {
    "sf0001": "/root/testdata/sf0.001",
    "sf001": "/root/testdata/sf0.01",
    "sf01": "/root/testdata/sf0.1",
}
FIXTURE_ROWS = 2000
FIXTURE_SEED = 42
THRESHOLD = 0.75


def scalar_clks(texts):
    """Encode texts with the scalar (non-Spark) reference-parity path."""
    from clkhash_spark.core import generate_key_lists
    from clkhash_spark.core.hashing import encode_record
    from clkhash_spark.pipeline import webpages_schema

    schema = webpages_schema()
    keys = generate_key_lists(
        SECRET,
        len(schema.fields),
        key_size=schema.kdf_key_size,
        salt=schema.kdf_salt,
        info=schema.kdf_info,
        kdf=schema.kdf_type,
        hash_algo=schema.kdf_hash,
    )
    out = [encode_record([t], schema, keys) for t in texts]
    packed = [p for p, _ in out]
    pops = np.array([c for _, c in out], dtype=np.int32)
    return packed, pops


def write_encode_expectations() -> None:
    import base64

    import duckdb

    for tag, sf_dir in SF_DIRS.items():
        path = os.path.join(sf_dir, "documents.parquet")
        rows = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{path}') ORDER BY doc_id"
        ).fetchall()
        texts = [t for _, t in rows]
        packed, pops = scalar_clks(texts)
        table = pa.table(
            {
                "url": pa.array([str(d) for d, _ in rows], pa.string()),
                "text_md5": pa.array(
                    [hashlib.md5(t.encode()).hexdigest() for t in texts],
                    pa.string(),
                ),
                "clk_b64": pa.array(
                    [base64.b64encode(p).decode() for p in packed],
                    pa.string(),
                ),
                "popcount": pa.array(pops, pa.int32()),
            }
        )
        out = os.path.join(EXPECTED_DIR, f"clk_encode_{tag}.parquet")
        pq.write_table(table, out)
        print(f"wrote {out}: {table.num_rows} rows, "
              f"mean popcount {pops.mean():.1f}")


def brute_force_clusters(urls, packed, pops):
    """All-pairs Dice >= THRESHOLD + union-find — the LSH-free oracle."""
    n = len(urls)
    bits = np.unpackbits(
        np.frombuffer(b"".join(packed), dtype=np.uint8)
    ).reshape(n, -1).astype(np.float32)
    inter = bits @ bits.T  # [n, n] intersection popcounts
    denom = pops[:, None].astype(np.float64) + pops[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        dice = np.where(denom > 0, 2.0 * inter / denom, 0.0)
    ii, jj = np.where(np.triu(dice >= THRESHOLD, k=1))

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ii.tolist(), jj.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    groups = {}
    for idx in range(n):
        groups.setdefault(find(idx), []).append(urls[idx])
    pair_set = set()
    for members in groups.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pair_set.add((ms[x], ms[y]))
    return groups, pair_set


def write_linkage_expectations() -> None:
    from clkhash_spark.pipeline import LinkageConfig, run_linkage, webpages_schema
    from clkhash_spark.session import build_session
    from clkhash_spark.sources.webpages import synthetic_webpages, webpages_truth

    spark = build_session(app_name="gen-expected-clk", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    pages = synthetic_webpages(spark, FIXTURE_ROWS, seed=FIXTURE_SEED).cache()
    rows = pages.select("url", "text").orderBy("url").collect()
    urls = [r["url"] for r in rows]
    packed, pops = scalar_clks([r["text"] for r in rows])

    groups, predicted_pairs = brute_force_clusters(urls, packed, pops)
    sizes = {}
    for members in groups.values():
        sizes[len(members)] = sizes.get(len(members), 0) + 1

    truth_rows = webpages_truth(pages).collect()  # (url, entity_id)
    by_entity = {}
    for r in truth_rows:
        by_entity.setdefault(r["entity_id"], []).append(r["url"])
    truth_pairs = set()
    for members in by_entity.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                truth_pairs.add((ms[x], ms[y]))
    tp = len(predicted_pairs & truth_pairs)
    precision = tp / len(predicted_pairs) if predicted_pairs else 0.0
    recall = tp / len(truth_pairs) if truth_pairs else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )

    # Cross-check the LSH pipeline against the brute-force oracle before
    # pinning anything.
    result = run_linkage(
        spark,
        pages.select("url", "text"),
        LinkageConfig(schema=webpages_schema(), secret=SECRET),
    )
    pipe_sizes = {
        r["cluster_size"]: r["n_clusters"]
        for r in result.clusters.groupBy("cluster_id")
        .count()
        .withColumnRenamed("count", "cluster_size")
        .groupBy("cluster_size")
        .count()
        .withColumnRenamed("count", "n_clusters")
        .collect()
    }
    if pipe_sizes != sizes:
        print("MISMATCH pipeline vs brute-force cluster sizes:")
        print("  brute-force:", dict(sorted(sizes.items())))
        print("  pipeline:   ", dict(sorted(pipe_sizes.items())))
        spark.stop()
        raise SystemExit(1)
    print("pipeline == brute-force oracle:", dict(sorted(sizes.items())))
    print(f"tp={tp} predicted={len(predicted_pairs)} "
          f"truth={len(truth_pairs)} P={precision:.6f} R={recall:.6f} "
          f"F1={f1:.6f}")

    pq.write_table(
        pa.table(
            {
                "cluster_size": pa.array(
                    sorted(sizes.keys()), pa.int64()
                ),
                "n_clusters": pa.array(
                    [sizes[k] for k in sorted(sizes.keys())], pa.int64()
                ),
            }
        ),
        os.path.join(EXPECTED_DIR, "clk_linkage_clusters.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "tp": pa.array([tp], pa.int64()),
                "predicted": pa.array([len(predicted_pairs)], pa.int64()),
                "truth": pa.array([len(truth_pairs)], pa.int64()),
                "precision": pa.array([round(precision, 6)], pa.float64()),
                "recall": pa.array([round(recall, 6)], pa.float64()),
                "f1": pa.array([round(f1, 6)], pa.float64()),
            }
        ),
        os.path.join(EXPECTED_DIR, "clk_linkage_f1.parquet"),
    )
    spark.stop()
    print("wrote clk_linkage_clusters.parquet / clk_linkage_f1.parquet")


def _febrl_rows(path):
    """Replicate sources/febrl.load_febrl_party semantics in pure
    Python: trim ASCII spaces (Spark F.trim), missing -> ''."""
    import csv

    from clkhash_spark.sources.febrl import FEBRL_FEATURES

    rows = []
    with open(path, newline="") as fp:
        for rec in csv.DictReader(fp):
            key = rec["rec_id"].strip(" ")
            rows.append(
                (key, [(rec.get(f) or "").strip(" ")
                       for f in FEBRL_FEATURES])
            )
    return rows


def write_febrl_expectations() -> None:
    """Brute-force (LSH-free, Spark-free) two-party mutual-best matching
    from scalar CLKs; cross-checked against the live pipeline."""
    from clkhash_spark.core import generate_key_lists
    from clkhash_spark.core.hashing import encode_record
    from clkhash_spark.entry_queries import q_clk_febrl_two_party
    from clkhash_spark.session import build_session
    from clkhash_spark.sources.febrl import FEBRL_TESTDATA, febrl_schema

    threshold = 0.8
    schema = febrl_schema()
    keys = generate_key_lists(
        SECRET, len(schema.fields), key_size=schema.kdf_key_size,
        salt=schema.kdf_salt, info=schema.kdf_info, kdf=schema.kdf_type,
        hash_algo=schema.kdf_hash,
    )

    def encode_party(name):
        rows = _febrl_rows(os.path.join(FEBRL_TESTDATA, name))
        ids = [k for k, _ in rows]
        out = [encode_record(vals, schema, keys) for _, vals in rows]
        n = len(rows)
        bits = np.unpackbits(
            np.frombuffer(b"".join(p for p, _ in out), dtype=np.uint8)
        ).reshape(n, -1).astype(np.float32)
        pops = np.array([c for _, c in out], dtype=np.float64)
        return ids, bits, pops

    ids_a, bits_a, pops_a = encode_party("dirty_1000_50_1.csv")
    ids_b, bits_b, pops_b = encode_party("dirty_1000_50_2.csv")
    inter = bits_a @ bits_b.T
    denom = pops_a[:, None] + pops_b[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        dice = np.where(denom > 0, 2.0 * inter / denom, 0.0)
    eligible = dice >= threshold
    # mutual best among eligible pairs; ties break toward the smaller
    # other-side key (mirrors scoring.one_to_one_matching)
    order_b = np.argsort(ids_b)
    order_a = np.argsort(ids_a)
    pairs = []
    masked = np.where(eligible, dice, -1.0)
    for i in range(len(ids_a)):
        cand = masked[i]
        if cand.max() < 0:
            continue
        best = cand.max()
        js = [j for j in order_b if cand[j] == best]
        j = js[0]
        col = masked[:, j]
        best_col = col.max()
        iis = [x for x in order_a if col[x] == best_col]
        if iis[0] == i:
            pairs.append((ids_a[i], ids_b[j], round(float(dice[i, j]), 6)))

    spark = build_session(app_name="gen-expected-febrl", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    live = {
        (r["id_a"], r["id_b"], round(r["score"], 6))
        for r in q_clk_febrl_two_party(spark, "").collect()
    }
    spark.stop()
    if live != set(pairs):
        print("MISMATCH pipeline vs brute-force FEBRL matching:")
        print("  only brute-force:", sorted(set(pairs) - live)[:5])
        print("  only pipeline:   ", sorted(live - set(pairs))[:5])
        raise SystemExit(1)
    tp = sum(1 for a, b, _ in pairs if a == b)
    print(f"FEBRL pipeline == brute-force: {len(pairs)} pairs, "
          f"{tp} true (truth=500)")
    pairs.sort()
    pq.write_table(
        pa.table(
            {
                "id_a": pa.array([p[0] for p in pairs], pa.string()),
                "id_b": pa.array([p[1] for p in pairs], pa.string()),
                "score": pa.array([p[2] for p in pairs], pa.float64()),
            }
        ),
        os.path.join(EXPECTED_DIR, "clk_febrl_pairs.parquet"),
    )
    print("wrote clk_febrl_pairs.parquet")


if __name__ == "__main__":
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    write_encode_expectations()
    write_linkage_expectations()
    write_febrl_expectations()
