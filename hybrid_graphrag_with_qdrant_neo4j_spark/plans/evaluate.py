"""ANN index quality evaluation over a built KG: recall@k of the
written (partition-pruned) index against the exact brute-force scan, on
a deterministic sample of the corpus's own vectors.

The pytest recall gates freeze this check at build time; this verb is
the OPERATIONAL twin — run it after appends/reindex/prune to see where
recall actually sits before touching ``n_probe`` or scheduling a
``reindex``.  The reference has no equivalent (Qdrant reports only its
internal optimizer status); at 100 TB "what recall am I serving" must
be measurable without a rebuild, and both sides here are bounded batch
jobs: exact = one brute-force pass per 4096 queries, indexed = one
partition-pruned scan per pass (the facade's own batch operators).

Sampling self-queries from the stored vectors makes ground truth free
(the exact top-k over the same table) and deterministic (xxhash64-seeded
order), so two runs on the same KG report the same number.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession, functions as F

from ..operators import ann_index as AI, similarity as S
from ..operators.retrieval import _vector_search_many_vecs
from .checkpoint import _data_path, load_manifest
from .pipeline import ANN_INDEX_STAGE


def evaluate_ann(
    spark: SparkSession,
    kg_dir: str,
    sample: int = 64,
    top_k: int = 10,
    n_probe: int = 3,
    seed: int = 7,
) -> dict:
    """Report the written ANN index's serving quality at ``n_probe``:

      {"family", "n_vectors", "n_queries", "top_k", "n_probe",
       "recall_at_k", "mean_scan_fraction" (ivf),
       "exact_wall_sec", "indexed_wall_sec", "params"}

    recall@k is averaged over ``sample`` self-queries (vectors drawn
    from ``chunk_embeddings`` in xxhash64(seed) order — deterministic,
    no full-table collect); ground truth is the exact cosine top-k over
    the same table.  Ties at the top_k boundary break (score desc,
    id asc) on BOTH sides — the operators' shared contract — so a
    recall of 1.0 is exact equality, not tie luck.  Wall times cover
    the whole batch on each side (N queries = one bounded job), so
    their ratio is the batch speedup the index is actually buying.
    """
    man = load_manifest(kg_dir, ANN_INDEX_STAGE)
    idx_path = os.path.join(kg_dir, ANN_INDEX_STAGE)
    if man is None or not os.path.isdir(os.path.join(idx_path, "vectors")):
        raise ValueError(
            f"no ANN index under {kg_dir!r} — build with ann_index=... or reindex"
        )
    family = man.get("family")
    id_col = man.get("id_col", "chunk_id")

    emb = spark.read.parquet(_data_path(kg_dir, "chunk_embeddings")).select(
        "chunk_id", "embedding"
    )
    n_vectors = emb.count()
    qrows = (
        emb.orderBy(F.xxhash64("chunk_id", F.lit(seed)), F.col("chunk_id"))
        .limit(min(sample, n_vectors))
        .collect()
    )
    qvecs = [(r["chunk_id"], list(r["embedding"])) for r in qrows]
    if not qvecs:
        raise ValueError("chunk_embeddings is empty — nothing to evaluate")

    t0 = time.perf_counter()
    exact = {
        (r["query_id"], str(r["chunk_id"]))
        for r in _vector_search_many_vecs(emb, qvecs, top_k=top_k).collect()
    }
    exact_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    if family == "ivf":
        got_df = AI.ivf_index_topk_many(
            spark, idx_path, qvecs, top_k=top_k, n_probe=n_probe, id_col=id_col
        )
    elif family == "lsh":
        got_df = AI.lsh_index_topk_many(
            spark, idx_path, qvecs, top_k=top_k, id_col=id_col
        )
    else:
        raise ValueError(f"unknown ann index family in manifest: {family!r}")
    got = {(r["query_id"], str(r[id_col])) for r in got_df.collect()}
    indexed_wall = time.perf_counter() - t0

    # per-query recall, then mean — a query with fewer than top_k
    # exact neighbors (tiny corpus) is scored against what exists
    per_q: dict = {}
    for qid, _ in qvecs:
        want = {c for q, c in exact if q == qid}
        hit = {c for q, c in got if q == qid}
        per_q[qid] = len(want & hit) / max(len(want), 1)
    recall = sum(per_q.values()) / len(per_q)

    out = {
        "family": family,
        "n_vectors": n_vectors,
        "n_queries": len(qvecs),
        "top_k": top_k,
        "n_probe": n_probe if family == "ivf" else None,
        "recall_at_k": round(recall, 4),
        "exact_wall_sec": round(exact_wall, 2),
        "indexed_wall_sec": round(indexed_wall, 2),
        "params": man.get("params", {}),
    }
    if family == "ivf":
        # mean over queries of (probed-bucket bytes / index bytes): the
        # honest "how much of the table does a query read" number
        cunit = AI.read_ivf_centroids(spark, idx_path)
        fracs = [
            AI.scan_fraction(
                idx_path,
                [f"_centroid={c}" for c in S._probe_centroids(cunit, v, n_probe)],
            )
            for _, v in qvecs
        ]
        out["mean_scan_fraction"] = round(sum(fracs) / len(fracs), 4)
    return out
