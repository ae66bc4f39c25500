"""Distributed-PCA contracts: orthonormal components, variance ordering,
planted-subspace recovery, and reconstruction-error monotonicity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ago_sisdb_spark.catalog import load_table
from ago_sisdb_spark.operators import pca

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").cache()


@pytest.fixture(scope="module")
def fitted(spark, emb):
    return pca.fit_pca(emb, "embedding", DIM, 8)


def test_components_orthonormal(fitted):
    _mean, comps, _evr = fitted
    for i in range(len(comps)):
        for j in range(i, len(comps)):
            dot = sum(a * b for a, b in zip(comps[i], comps[j]))
            assert abs(dot - (1.0 if i == j else 0.0)) < 1e-9


def test_explained_variance_sorted_and_bounded(fitted):
    _mean, _comps, evr = fitted
    assert all(0 <= r <= 1 for r in evr)
    assert evr == sorted(evr, reverse=True)
    assert sum(evr) <= 1 + 1e-9


def test_planted_subspace_recovered(spark):
    """Rank-2 planted data with uncorrelated, different-variance factors:
    the top-2 components must span the planted plane and order by
    variance (the high-variance axis first)."""
    import numpy as np

    rng_ids = list(range(400))
    # a: period-4 pattern scaled 10x (high variance), b: period-2 (low)
    rows = []
    for i in rng_ids:
        a = 10.0 * (i % 4)
        b = 1.0 * (i % 2)
        v = [0.0] * 8
        v[2] = a  # axis e2
        v[5] = b  # axis e5
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, v array<double>")
    # i%4 and i%2 are correlated, but axes stay e2/e5 because covariance is
    # diagonal-dominant in those coordinates; verify via loadings
    _mean, comps, evr = pca.fit_pca(df, "v", 8, 2)
    # first component ~ e2 direction mixed with at most small e5 part
    assert abs(comps[0][2]) > 0.99
    assert evr[0] > evr[1] > 0


def test_projection_reconstruction_improves_with_k(spark, emb, fitted):
    """Mean squared reconstruction error must shrink as components are
    added — the defining property of the eigh ordering."""
    import numpy as np

    vecs = np.vstack(
        [np.asarray(r.embedding, dtype=float) for r in emb.limit(200).collect()]
    )
    mean, comps, _evr = fitted
    mu, w = np.asarray(mean), np.asarray(comps)
    errs = []
    for k in (1, 4, 8):
        wk = w[:k]
        proj = (vecs - mu) @ wk.T
        recon = proj @ wk + mu
        errs.append(float(((vecs - recon) ** 2).mean()))
    assert errs[0] > errs[1] > errs[2]


def test_project_matches_numpy(spark, emb, fitted):
    import numpy as np

    mean, comps, _evr = fitted
    out = {r.id: list(r.pc) for r in
           pca.project_pca(emb.limit(50), "vec_id", "embedding", mean, comps).collect()}
    mu, w = np.asarray(mean), np.asarray(comps)
    for r in emb.limit(50).collect():
        want = (np.asarray(r.embedding, dtype=float) - mu) @ w.T
        got = np.asarray(out[r.vec_id])
        assert np.allclose(got, want, atol=1e-9)


def test_sign_sketch_hamming_vs_numpy(spark):
    """Independent numpy model of the sign-sketch audit: bit packing,
    Hamming distances, and both rank ladders must match exactly; a probe's
    own duplicate vector must land at hamming 0 / cosine rank 1."""
    import numpy as np
    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators import embed as embed_ops

    rng = np.random.default_rng(3)
    n, dim = 25, 64
    vecs = rng.normal(size=(n, dim))
    vecs[7] = vecs[0]  # exact duplicate of probe 0
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = df.where(F.col("vec_id") == 0)
    got = embed_ops.hamming_vs_cosine_topk(
        df, probes, "vec_id", "embedding", "vec_id", k=5, dim=64
    ).collect()

    bits = (vecs > 0).astype(np.int64)
    ham = {j: int(np.sum(bits[j] != bits[0])) for j in range(n) if j != 0}
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    cos = {j: float(unit[j] @ unit[0]) for j in range(n) if j != 0}
    hrank = {
        j: r + 1
        for r, j in enumerate(sorted(ham, key=lambda j: (ham[j], j)))
    }
    crank = {
        j: r + 1
        for r, j in enumerate(sorted(cos, key=lambda j: (-cos[j], j)))
    }
    expect = {
        j: (ham[j], hrank[j], crank[j])
        for j in ham
        if hrank[j] <= 5 or crank[j] <= 5
    }
    have = {r.neighbor_id: (r.hamming, r.rank_h, r.rank_c) for r in got}
    assert have == expect
    assert have[7] == (0, 1, 1)  # the planted duplicate


def test_hard_negative_mining_vs_numpy(spark):
    """Planted two-cluster geometry: positives must come from the anchor's
    own label, hard negatives must be the highest-cosine wrong-label
    vectors (the planted boundary vector, not a random far one); full
    output matched against an independent numpy model."""
    import numpy as np
    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators import embed as embed_ops

    rng = np.random.default_rng(5)
    rows = []
    # label 0 around +e1, label 1 around -e1; vec 10 = label-1 vector
    # placed NEAR +e1 (the hard negative by construction)
    for i in range(10):
        v = np.array([3.0, 0, 0, 0]) + rng.normal(0, 0.2, 4)
        rows.append((i, 0, [float(x) for x in v]))
    for i in range(10, 20):
        v = np.array([-3.0, 0, 0, 0]) + rng.normal(0, 0.2, 4)
        rows.append((i, 1, [float(x) for x in v]))
    rows[10] = (10, 1, [2.8, 0.1, 0.0, 0.0])  # planted hard negative
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    probes = df.where(F.col("vec_id") == 0)
    got = embed_ops.hard_negative_mining(
        df, probes, "vec_id", "embedding", "label", "vec_id", k=3
    ).collect()

    vecs = {i: np.array(v) for i, _, v in rows}
    labels = {i: l for i, l, _ in rows}
    cos = {
        j: float(vecs[j] @ vecs[0] / (np.linalg.norm(vecs[j]) * np.linalg.norm(vecs[0])))
        for j in vecs if j != 0
    }
    expect = {}
    for kind, members in (
        ("pos", [j for j in cos if labels[j] == 0]),
        ("neg", [j for j in cos if labels[j] == 1]),
    ):
        ranked = sorted(members, key=lambda j: (-cos[j], j))[:3]
        for r, j in enumerate(ranked, 1):
            expect[(kind, r)] = j
    have = {(r.kind, r.rank): r.neighbor_id for r in got}
    assert have == expect
    assert have[("neg", 1)] == 10  # the planted boundary vector is rank-1


def test_serving_audits_discriminate_clustered_vs_random(spark):
    """The embedding-serving audits (matryoshka e6, sign-sketch e7) must
    DISCRIMINATE: on a clustered corpus whose structure lives in every
    dim band, truncated/Hamming neighborhoods match full cosine (audit
    says 'safe to compress'); on isotropic random vectors they cannot
    (audit says 'do not') — the report is the product, so both directions
    are pinned."""
    import numpy as np
    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators import embed as embed_ops
    from ago_sisdb_spark.operators import similarity

    rng = np.random.default_rng(13)
    dim, per = 64, 12

    # Walsh sign patterns per cluster, tiled across the 8-dim bands: the
    # signal occupies EVERY dimension (sign flips are ~impossible at
    # sigma 1 vs amplitude 4) and any prefix carries the same structure
    walsh = np.array(
        [
            [1, 1, 1, 1, 1, 1, 1, 1],
            [1, -1, 1, -1, 1, -1, 1, -1],
            [1, 1, -1, -1, 1, 1, -1, -1],
            [1, -1, -1, 1, 1, -1, -1, 1],
        ],
        dtype=float,
    )

    def corpus(clustered):
        vecs = []
        for c in range(4):
            center = np.zeros(dim)
            if clustered:
                center = 4.0 * np.tile(walsh[c], dim // 8)
            for _ in range(per):
                if clustered:
                    # per-vector noise TILED across the bands: a band-
                    # structured embedding, so within-cluster ordering is
                    # band-invariant and survives truncation — the "safe
                    # to compress" geometry the audit should green-light
                    eps = np.tile(rng.normal(0, 1.0, 8), dim // 8)
                else:
                    eps = rng.normal(0, 1.0, dim)
                vecs.append(center + eps)
        return np.array(vecs)

    def recalls(vecs):
        rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        probes = df.where(F.col("vec_id").isin(0, 12, 24, 36))
        t = similarity.truncation_audit(
            df, probes, "vec_id", "embedding", "vec_id", dims=(8, 64), k=5
        ).collect()
        mat = [r for r in t if r.dim == 8]
        ham = embed_ops.hamming_vs_cosine_topk(
            df, probes, "vec_id", "embedding", "vec_id", k=5
        ).collect()
        hid = sum(1 for r in ham if r.rank_h <= 5 and r.rank_c <= 5) / 20
        # cluster-membership recall: a sign sketch quantizes (Hamming
        # ties in coarse steps), so its contract is same-CLUSTER
        # retrieval, not within-cluster identity order
        hrows = [r for r in ham if r.rank_h <= 5]
        hmem = sum(
            1 for r in hrows if r.neighbor_id // per == r.probe_id // per
        ) / len(hrows)
        return sum(r.hit_full for r in mat) / len(mat), hid, hmem

    m_clus, _, hmem_clus = recalls(corpus(True))
    m_rand, hid_rand, hmem_rand = recalls(corpus(False))
    # clustered band-structured geometry: truncation preserves identity
    # order; the sign sketch retrieves from the right cluster
    assert m_clus >= 0.8, m_clus
    assert hmem_clus >= 0.9, hmem_clus
    # isotropic random vectors: truncation must NOT report preservation.
    # (The sign sketch retains moderate agreement even here — Hamming
    # tracks cosine in expectation on isotropic vectors, the Charikar
    # property — so its random-side bound is only the loose one.)
    assert m_rand <= 0.5 and hid_rand <= 0.8, (m_rand, hid_rand)
    assert m_clus > m_rand and hmem_clus > hmem_rand
