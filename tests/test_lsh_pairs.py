"""Banded-LSH embedding near-dup pairs: exact verification guarantees no
false positives; every returned pair checks out against numpy; candidates
come only from band collisions (join shape, not cross product)."""

import numpy as np
import pytest

from goprowl_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_lsh_cosine_pairs_no_false_positives(spark, emb_df):
    rows = emb_df.collect()
    dim = len(rows[0]["embedding"])
    lookup = {r["vec_id"]: np.array(list(r["embedding"]), dtype=np.float64) for r in rows}
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in SIM.lsh_cosine_pairs(emb_df, threshold=0.45, dim=dim).collect()
    }
    for (a, b), c in got.items():
        va, vb = lookup[a], lookup[b]
        exact = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert a < b and c >= 0.45
        assert c == pytest.approx(exact, rel=1e-9)
    # and it finds the high-similarity mass: recall vs brute force ≥ 0.5
    # for this threshold band (LSH S-curve; exact pairs are few at 0.45)
    ids = sorted(lookup)
    exact_pairs = set()
    mat = np.stack([lookup[i] for i in ids])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= 0.45:
                exact_pairs.add((ids[i], ids[j]))
    if exact_pairs:
        recall = len(set(got) & exact_pairs) / len(exact_pairs)
        assert recall >= 0.5, (recall, len(exact_pairs))
