"""Similarity-search operators over the driver-provided embeddings table:
brute-force exactness vs numpy, IVF/LSH candidate quality, blocked pairs."""

import math

import numpy as np
import pytest

from goprowl_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb_df):
    rows = emb_df.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, mat


@pytest.fixture(scope="module")
def query_vec(emb_np):
    ids, mat = emb_np
    return [float(x) for x in mat[list(ids).index(0)]]


def np_topk(ids, mat, q, k):
    qv = np.array(q)
    sims = (mat @ qv) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = sorted(zip(-sims, ids))
    return [(int(i), float(-s)) for s, i in order[:k]]


def test_cosine_topk_exact(spark, emb_df, emb_np, query_vec):
    ids, mat = emb_np
    exp = np_topk(ids, mat, query_vec, 10)
    got = [
        (r["vec_id"], r["cosine"])
        for r in SIM.cosine_topk(emb_df, query_vec, k=10).collect()
    ]
    assert [i for i, _ in got] == [i for i, _ in exp]
    for (gi, gs), (ei, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9)


def test_ivf_topk_subset_of_brute_force_space(spark, emb_df, emb_np, query_vec):
    ids, mat = emb_np
    got = SIM.ivf_topk(emb_df, query_vec, k=10, n_centroids=8, nprobe=3).collect()
    assert 0 < len(got) <= 10
    # every returned cosine must be a real cosine (verify against numpy)
    qv = np.array(query_vec)
    lookup = {int(i): mat[j] for j, i in enumerate(ids)}
    for r in got:
        v = lookup[r["vec_id"]]
        exp = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        assert r["cosine"] == pytest.approx(exp, rel=1e-9)
    # the query vector itself (vec 0) lives in a probed cluster → recalled
    assert got[0]["vec_id"] == 0 and got[0]["cosine"] == pytest.approx(1.0)


def test_lsh_bucket_contains_query_itself(spark, emb_df, query_vec):
    got = SIM.lsh_bucket_topk(emb_df, query_vec, k=5, n_planes=6).collect()
    assert got and got[0]["vec_id"] == 0
    assert got[0]["cosine"] == pytest.approx(1.0)


def test_cosine_pairs_blocked(spark, emb_df, emb_np):
    ids, mat = emb_np
    labels = {r["vec_id"]: r["label"] for r in emb_df.collect()}
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in SIM.cosine_pairs(emb_df, threshold=0.95).collect()
    }
    # verify each returned pair against numpy and the block rule
    lookup = {int(i): mat[j] for j, i in enumerate(ids)}
    for (a, b), c in got.items():
        assert labels[a] == labels[b] and a < b
        va, vb = lookup[a], lookup[b]
        exp = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert c == pytest.approx(exp, rel=1e-9) and c >= 0.95
