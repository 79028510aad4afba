"""Unit tests for queries.similarity — the guarantees parity can't
see: LSH is a sound candidate pruner (subset of ground truth), brute
kNN agrees with numpy, and the scale paths plan the right joins."""

from __future__ import annotations

import contextlib
import io

import numpy as np


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def test_lsh_pairs_are_subset_of_brute_pairs(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    brute = {
        (r["ida"], r["idb"])
        for r in QUERIES["sim_pairs_threshold"](spark, sf_dir).collect()
    }
    lsh = {
        (r["ida"], r["idb"]) for r in QUERIES["sim_lsh_pairs"](spark, sf_dir).collect()
    }
    assert lsh <= brute
    assert brute  # non-vacuous at test SF


def test_knn_brute_matches_numpy(spark, sf_dir):
    from mapreducecf_spark.queries.similarity import KNN_K, QUERY_STRIDE
    from mapreducecf_spark.registry import QUERIES
    from mapreducecf_spark.sources import load_table

    rows = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    got = QUERIES["sim_knn_brute"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["q_id"], r["rnk"])):
        by_q.setdefault(r["q_id"], []).append(r["neighbor_id"])

    for qi in np.where(ids % QUERY_STRIDE == 0)[0]:
        cos = np.round(Vn @ Vn[qi], 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-cos[i], ids[i]),
        )
        expect = [int(ids[i]) for i in order[:KNN_K]]
        assert by_q[int(ids[qi])] == expect


def test_scale_paths_plan_equi_joins(spark, sf_dir):
    """LSH candidates and the IVF fine search must be equi-joins —
    the 100 TB guarantee that nothing degrades to all-pairs."""
    from mapreducecf_spark.registry import QUERIES

    for name in ("sim_lsh_pairs", "dedup_embedding_cosine", "sim_ivf_knn"):
        p = _plan(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in p, name
    # brute kNN broadcasts the query batch: one pass over the big side
    p = _plan(QUERIES["sim_knn_brute"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p
