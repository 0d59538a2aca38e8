"""Pipeline operators on synthetic inputs with known ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_sharing_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from delta_sharing_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    near_dup_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    far = "completely different words appear in this sentence here now ok"
    rows = [(0, base), (1, base), (2, near), (3, far)]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedup:
    def test_exact(self, spark, docs):
        out = {r["survivor_id"]: r["n_copies"]
               for r in exact_dedup(docs, "doc_id", "text").collect()}
        assert out[0] == 2  # docs 0,1 identical -> survivor 0
        assert out[2] == 1 and out[3] == 1

    def test_jaccard(self, spark, docs):
        pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(docs, "doc_id", "text",
                                              threshold=0.3).collect()}
        assert pairs[(0, 1)] == 1.0          # identical
        assert 0.3 <= pairs[(0, 2)] < 1.0    # near-dup
        assert (0, 3) not in pairs           # unrelated

    def test_minhash_finds_identical(self, spark, docs):
        sigs = minhash_signatures(docs, "doc_id", "text")
        cand = {(r["id_a"], r["id_b"])
                for r in minhash_lsh_candidates(sigs, "doc_id").collect()}
        assert (0, 1) in cand
        assert (0, 3) not in cand

    def test_simhash(self, spark, docs):
        fps = simhash_fingerprints(docs, "doc_id", "text")
        rows = {r["doc_id"]: r for r in fps.collect()}
        assert rows[0]["simhash"] == rows[1]["simhash"]
        assert len(rows[0]["simhash"]) == 64
        # int chunks encode the same bits
        for c in range(4):
            assert rows[0][f"fp_{c}"] == rows[1][f"fp_{c}"]
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in simhash_near_pairs(fps, "doc_id",
                                             max_hamming=16).collect()}
        assert pairs[(0, 1)] == 0
        assert pairs.get((0, 2), 99) <= 16


@pytest.fixture(scope="module")
def vectors(spark):
    # 3 orthogonal-ish clusters in 8 dims
    rows = []
    for i in range(9):
        base = [0.0] * 8
        base[i // 3] = 1.0
        base[(i // 3) + 4] = 0.1 * (i % 3)
        rows.append((i, [float(x) for x in base], i // 3))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


class TestSimilarity:
    def test_brute_force_topk(self, spark, vectors):
        out = brute_force_topk(vectors.filter("vec_id = 0"), vectors, k=2)
        rows = out.orderBy("rank").collect()
        assert [r["neighbor_id"] for r in rows] == [1, 2]  # same cluster

    def test_ivf_matches_brute_force_here(self, spark, vectors):
        bf = brute_force_topk(vectors.filter("vec_id < 3"), vectors, k=2)
        ivf = ivf_topk(vectors.filter("vec_id < 3"), vectors, "label",
                       k=2, nprobe=1, dim=8)
        assert sorted(map(tuple, bf.collect())) == \
            sorted(map(tuple, ivf.collect()))

    def test_near_dup_pairs_threshold(self, spark, vectors):
        pairs = near_dup_pairs(vectors, threshold=0.99)
        for r in pairs.collect():
            assert r["cos"] >= 0.99
