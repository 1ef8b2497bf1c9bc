"""Similarity-search invariants: brute-force is ground truth; LSH variants
are subsets/approximations of it."""

from __future__ import annotations

from engine.similarity import TOP_K, q60_knn_brute, q61_knn_lsh_bucketed, q62_brp_lsh_join


def test_brute_force_shape_and_ordering(spark, sf_dir):
    rows = q60_knn_brute(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == TOP_K
        rs = sorted(rs, key=lambda r: r.rank)
        sims = [r.cosine for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r.vec_id != qid for r in rs)
        assert all(-1.000001 <= s <= 1.000001 for s in sims)


def test_lsh_results_subset_of_bucket(spark, sf_dir):
    brute = {(r.query_id, r.vec_id): r.cosine for r in q60_knn_brute(spark, sf_dir).collect()}
    lsh = q61_knn_lsh_bucketed(spark, sf_dir).collect()
    # LSH cosine values must agree with brute-force where pairs overlap
    for r in lsh:
        if (r.query_id, r.vec_id) in brute:
            assert abs(brute[(r.query_id, r.vec_id)] - r.cosine) < 1e-9


def test_brp_lsh_pairs_canonical(spark, sf_dir):
    rows = q62_brp_lsh_join(spark, sf_dir).collect()
    assert all(r.vec_a < r.vec_b for r in rows)
    assert all(r.euclidean_dist >= 0 for r in rows)


def _topk_pairs(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


def test_multiprobe_lsh_recall_floor(spark, sf_dir):
    # Weak-neighbor fixture (top-10 cosine ~0.3): single-bucket probing
    # measured 0.02 recall; Hamming<=2 multi-probe measured 0.38 at
    # sf0.001 and 0.24 at sf0.01 (recall falls with N at fixed
    # n_planes — the documented reason n_planes must scale ~log2 N).
    # Floor 0.15 holds at every test SF with ~8x headroom over the
    # single-bucket recall, so a silent fall-back to single-bucket
    # probing would still fail loudly.
    from engine.similarity import q60_knn_brute, q61_knn_lsh_bucketed

    brute = _topk_pairs(q60_knn_brute(spark, sf_dir))
    lsh = _topk_pairs(q61_knn_lsh_bucketed(spark, sf_dir))
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.15


def test_ivf_recall_floor(spark, sf_dir):
    # measured 0.72 at nprobe=6 (0.58 at 4, 0.80 at 8); floor 0.5
    from engine.similarity import q60_knn_brute, q65_knn_ivf

    brute = _topk_pairs(q60_knn_brute(spark, sf_dir))
    ivf = _topk_pairs(q65_knn_ivf(spark, sf_dir))
    assert len(brute & ivf) / len(brute) >= 0.5


def _lsh_candidate_count(spark, sf_dir, n_planes):
    # the exact candidate-generation join q66 runs, without the top-20
    from pyspark.sql import functions as F

    from engine.similarity import _bucket, _corpus_normed, _probe_masks

    corpus = _corpus_normed(spark, sf_dir).withColumn(
        "bucket", F.expr(_bucket("emb", n_planes)).cast("int")
    )
    probes = corpus.select(
        F.col("vec_id").alias("vec_a"),
        F.explode(F.array(*[F.lit(m) for m in _probe_masks(n_planes)])).alias("mask"),
        "bucket",
    ).select("vec_a", F.expr("int(bucket ^ mask)").alias("probe_bucket"))
    return probes.join(
        corpus, (F.col("probe_bucket") == F.col("bucket")) & (F.col("vec_a") < F.col("vec_id"))
    ).count()


def test_bucket_occupancy_bounded_and_scales_with_planes(spark, sf_dir):
    # The within-bucket join output is quadratic in bucket occupancy,
    # so n_planes must GROW with corpus size (VERDICT r2's one
    # scale-killer) — at a FIXED 8 bits, candidates grow ~N^2/256 (at
    # sf0.1 that is 289k pairs for N=2000, ~144/doc). Pin the law the
    # parameter exists for: at the width a deployment would pick for
    # this N (≈ log2(N) - 1, keeping expected occupancy ~2), the
    # candidate set stays ~linear in N; and widening by 4 more bits
    # shrinks it further (measured 7.5x from 8 -> 12 bits at sf0.001).
    import math

    from engine.session import table

    n = table(spark, sf_dir, "embeddings").count()
    planes = max(8, math.ceil(math.log2(n)) - 1)
    c_sized = _lsh_candidate_count(spark, sf_dir, planes)
    c_wider = _lsh_candidate_count(spark, sf_dir, planes + 4)
    assert c_sized < 60 * n, (
        f"candidates superlinear at the N-sized width: {c_sized} pairs "
        f"for N={n} at {planes} planes"
    )
    assert c_wider < c_sized / 3, (
        f"wider bucket space did not shrink candidates: {c_wider} vs {c_sized}"
    )


def test_q66_n_planes_parameter_threads_through(spark, sf_dir):
    # q66 at 12 planes must still emit canonical, correctly-scored pairs
    # (recall drops by design; correctness of what IS returned must not)
    from engine.similarity import q66_embedding_near_dup

    base = {(r.vec_a, r.vec_b): r.cosine for r in q66_embedding_near_dup(spark, sf_dir).collect()}
    wide = q66_embedding_near_dup(spark, sf_dir, n_planes=12).collect()
    assert len(wide) == 20
    for r in wide:
        assert r.vec_a < r.vec_b
        if (r.vec_a, r.vec_b) in base:
            assert abs(base[(r.vec_a, r.vec_b)] - r.cosine) < 1e-9


def test_embedding_near_dup_recall_floor(spark, sf_dir):
    # exact top-20 cosine pairs vs q66's multi-probe LSH top-20.
    # Measured 0.55 at sf0.001, 0.30 at sf0.1 (single-bucket was
    # 0.05): at 8 fixed planes on this weak-pair fixture (top-20
    # cosine ~0.5, Hamming<=2 collision ~0.47 per pair) recall decays
    # as the top-20 boundary crowds — the n_planes/probe-radius knob
    # is the recovery path at scale. Floor 0.25 holds at every test
    # SF and still sits 5x above the single-bucket baseline.
    import numpy as np

    from engine.session import table
    from engine.similarity import q66_embedding_near_dup

    rows = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    E = np.array([r.embedding for r in rows], dtype=float)
    norms = np.linalg.norm(E, axis=1)
    S = (E @ E.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(ids), 1)
    sims = S[iu]
    order = np.argsort(-sims)[:20]
    exact = {
        (int(min(ids[iu[0][k]], ids[iu[1][k]])), int(max(ids[iu[0][k]], ids[iu[1][k]])))
        for k in order
    }
    got = {(r.vec_a, r.vec_b) for r in q66_embedding_near_dup(spark, sf_dir).collect()}
    assert len(exact & got) / 20 >= 0.25


def test_pq_ann_recall_floor_and_determinism(spark, sf_dir):
    """4-bit PQ codes + ADC scan + exact rerank must recover most of
    the true top-10 (measured 0.84 mean at sf0.001/sf0.01, 0.78 at
    sf0.1 with the corpus-scaled rerank budget) and be
    bit-deterministic (seeded codebooks, fixed iteration count)."""
    from engine.similarity import q60_knn_brute, q76_pq_ann

    exact, got = {}, {}
    for r in q60_knn_brute(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    pq1 = q76_pq_ann(spark, sf_dir).collect()
    for r in pq1:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.6
    pq2 = q76_pq_ann(spark, sf_dir).collect()
    assert sorted(map(tuple, pq1)) == sorted(map(tuple, pq2))


def test_ivfpq_recall_floor_and_determinism(spark, sf_dir):
    """IVF-PQ (residual ADC within probed cells) reads
    ~(nprobe/nlist)·m/2 bytes per corpus vector, so its recall sits
    below both single-lever tiers on this weak-neighbor fixture
    (measured 0.60 at sf0.001 at the derived (16, 6) geometry vs 0.72
    each); floor 0.45. Probing every cell isolates the residual
    quantizer (measured 0.66, floor 0.55) and must dominate the
    restricted run. Seeded end-to-end, so bit-deterministic."""
    from engine.similarity import q60_knn_brute, q76b_ivfpq_ann

    exact, got = {}, {}
    for r in q60_knn_brute(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    r1 = q76b_ivfpq_ann(spark, sf_dir).collect()
    for r in r1:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    mean_restricted = sum(recalls) / len(recalls)
    assert mean_restricted >= 0.45

    full = {}
    for r in q76b_ivfpq_ann(spark, sf_dir, nlist=16, nprobe=16).collect():
        full.setdefault(r.query_id, set()).add(r.vec_id)
    full_recalls = [len(exact[q] & full.get(q, set())) / len(exact[q]) for q in exact]
    mean_full = sum(full_recalls) / len(full_recalls)
    assert mean_full >= 0.55
    assert mean_full >= mean_restricted

    r2 = q76b_ivfpq_ann(spark, sf_dir).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_recall_report_floors(spark, sf_dir):
    # The driver-visible ANN-quality surface: one row per tier, each
    # above the same floors the per-tier tests pin (lsh 0.15 / ivf 0.5
    # / pq 0.6 / ivfpq 0.45 — measured 0.24-0.38 / 0.72 / 0.78-0.84 /
    # 0.60 across SFs).
    from engine.similarity import ann_recall_report

    rows = {r.tier: r for r in ann_recall_report(spark, sf_dir).collect()}
    assert set(rows) == {
        "lsh_multiprobe",
        "ivf",
        "pq_adc",
        "ivfpq_adc",
        # r9: the q62-vs-q61 threshold-join parity rows (r8 verdict 7)
        "brp_threshold_join",
        "lsh_threshold_join",
        "lsh_banded_threshold_join",
    }
    floors = {
        "lsh_multiprobe": 0.15,
        "ivf": 0.5,
        "pq_adc": 0.6,
        "ivfpq_adc": 0.45,
        # measured 0.86-0.87 / 0.13-0.15 / 0.36-0.37 across SFs
        "brp_threshold_join": 0.75,
        "lsh_threshold_join": 0.08,
        "lsh_banded_threshold_join": 0.25,
    }
    for tier, r in rows.items():
        assert r.recall_at_10 >= floors[tier], (tier, r.recall_at_10)
        assert r.n_hits == round(r.recall_at_10 * r.n_truth)
    # OR-amplification is monotone: q62's table count (3 bands) must
    # beat single-band at the identical threshold
    assert (
        rows["lsh_banded_threshold_join"].recall_at_10
        >= rows["lsh_threshold_join"].recall_at_10
    )


def test_scale_knob_derivation_laws(spark, sf_dir):
    # r3 VERDICT's two fixture-scale constants are now derived from the
    # corpus count. Pin both ends of each law: at fixture N the FLOOR
    # binds (so the fixed-width DuckDB oracles for q61/q66 stay valid
    # and q75's clustering is unchanged), and at 10^9 rows the derived
    # values are the ones the docstrings promise.
    from engine.session import table
    from engine.similarity import (
        N_PLANES,
        SEMDEDUP_K,
        SEMDEDUP_TARGET_CELL,
        TARGET_BUCKET_OCCUPANCY,
        _derive_n_planes,
        _derive_semdedup_k,
    )

    n = table(spark, sf_dir, "embeddings").count()
    assert _derive_n_planes(n) == N_PLANES
    assert _derive_semdedup_k(n) == SEMDEDUP_K
    big = 1_000_000_000
    planes = _derive_n_planes(big)
    assert 24 <= planes <= 32
    assert big / (1 << planes) <= TARGET_BUCKET_OCCUPANCY
    k = _derive_semdedup_k(big)
    assert big / k <= SEMDEDUP_TARGET_CELL
    # monotone: more data never shrinks the knobs
    assert _derive_n_planes(4 * big) >= planes
    assert _derive_semdedup_k(4 * big) >= k
    # IVF geometry: floor binds at fixture N (measured recalls hold);
    # at 10^9 rows nlist ~ sqrt(N)/3 and the probed FRACTION matches
    # the fixture's 6/16 recall/cost point
    from engine.similarity import IVF_NLIST, IVF_NPROBE, _derive_ivf

    assert _derive_ivf(n) == (IVF_NLIST, IVF_NPROBE)
    nlist, nprobe = _derive_ivf(big)
    assert nlist >= 10_000
    assert abs(nprobe / nlist - IVF_NPROBE / IVF_NLIST) < 0.01
    assert _derive_ivf(4 * big)[0] >= nlist


def test_semdedup_cell_occupancy_bounded(spark, sf_dir):
    # Mirror of the LSH occupancy test for q75: the within-cell pair
    # volume Σ|cell|² drives the candidate join, and the k derivation
    # exists to keep it ~N·target_cell instead of N². At the derived k
    # the measured volume must stay within a small balance factor of
    # the ideal N²/k (measured 1.23–1.43x across fixture SFs) and far
    # under the all-pairs wall.
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from engine.session import table
    from engine.similarity import _derive_semdedup_k

    c = table(spark, sf_dir, "embeddings").select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    n = c.count()
    k = _derive_semdedup_k(n)
    km = KMeans(k=k, seed=42, maxIter=10, featuresCol="features", predictionCol="cell").fit(c)
    sizes = [
        r.cnt
        for r in km.transform(c).groupBy("cell").agg(F.count(F.lit(1)).alias("cnt")).collect()
    ]
    pair_vol = sum(s * s for s in sizes)
    assert pair_vol <= 4 * n * n / k, f"cells unbalanced: {sorted(sizes)}"
    assert pair_vol < n * n / 2, "within-cell volume approaching all-pairs"


def test_banded_lsh_derivation_law():
    """OR-amplification sizing: 1 band at fixture widths (oracles
    untouched); at the width a 10^9-row corpus derives, enough bands
    that the modeled recall of a cosine-0.9 pair clears the target."""
    from engine.similarity import (
        LSH_TARGET_RECALL,
        LSH_TARGET_SIM,
        MAX_LSH_BANDS,
        _collision_prob,
        _derive_n_bands,
        _derive_n_planes,
    )

    from engine.similarity import _modeled_recall

    assert _derive_n_bands(8) == 1
    planes = _derive_n_planes(1_000_000_000)
    bands = _derive_n_bands(planes)
    assert 2 <= bands <= MAX_LSH_BANDS
    p = _collision_prob(planes, LSH_TARGET_SIM)
    assert 1 - (1 - p) ** bands >= LSH_TARGET_RECALL
    # monotone: wider planes never need fewer bands
    assert _derive_n_bands(planes + 4) >= bands
    # cap honesty: past 26 planes the MAX_LSH_BANDS cap binds and the
    # target is NOT met — the docs promise graceful degradation, not
    # 0.9; pin the modeled numbers so a silent cap change surfaces
    assert _derive_n_bands(27) == MAX_LSH_BANDS
    assert 0.85 <= _modeled_recall(27, MAX_LSH_BANDS) < LSH_TARGET_RECALL
    assert 0.60 <= _modeled_recall(33, MAX_LSH_BANDS) < 0.75


def test_banded_lsh_recall_improves(spark, sf_dir):
    """Force a width where one band visibly under-recalls (16 planes
    on the fixture); the derived multi-band run must recall at least
    as much of the exact top-20 as the single-band run (band 0 is the
    single-band geometry, so the candidate set is a superset —
    recall is monotone), and every returned cosine must be exact."""
    import numpy as np

    from engine.session import table
    from engine.similarity import _derive_n_bands, q66_embedding_near_dup

    assert _derive_n_bands(16) >= 2  # the width actually amplifies
    rows = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    E = np.array([r.embedding for r in rows], dtype=float)
    S = (E @ E.T) / np.outer(np.linalg.norm(E, axis=1), np.linalg.norm(E, axis=1))
    iu = np.triu_indices(len(ids), 1)
    order = np.argsort(-S[iu])[:20]
    exact_pairs = {
        (int(min(ids[iu[0][k]], ids[iu[1][k]])), int(max(ids[iu[0][k]], ids[iu[1][k]]))): S[iu][k]
        for k in order
    }
    single = {(r.vec_a, r.vec_b) for r in q66_embedding_near_dup(spark, sf_dir, n_planes=16, n_bands=1).collect()}
    multi_rows = q66_embedding_near_dup(spark, sf_dir, n_planes=16).collect()
    multi = {(r.vec_a, r.vec_b) for r in multi_rows}
    assert len(multi_rows) == 20
    r_single = len(single & set(exact_pairs)) / 20
    r_multi = len(multi & set(exact_pairs)) / 20
    assert r_multi >= r_single, (r_multi, r_single)
    for r in multi_rows:
        assert r.vec_a < r.vec_b
        if (r.vec_a, r.vec_b) in exact_pairs:
            assert abs(exact_pairs[(r.vec_a, r.vec_b)] - r.cosine) < 1e-6


def test_banded_q61_contract_holds(spark, sf_dir):
    """Banded q61 keeps the single-band output contract: ≤ TOP_K rows
    per query, exact cosines (spot-checked vs brute force), dense
    ranks ordered by descending similarity."""
    from engine.similarity import q60_knn_brute, q61_knn_lsh_bucketed

    brute = {(r.query_id, r.vec_id): r.cosine for r in q60_knn_brute(spark, sf_dir).collect()}
    rows = q61_knn_lsh_bucketed(spark, sf_dir, n_planes=16, n_bands=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) <= 10
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cosine for r in rs]
        assert sims == sorted(sims, reverse=True)
        for r in rs:
            if (r.query_id, r.vec_id) in brute:
                assert abs(brute[(r.query_id, r.vec_id)] - r.cosine) < 1e-9


def test_two_level_quantizer_occupancy_and_determinism(spark, sf_dir):
    """The r4 scale-killer fix: above TWO_LEVEL_MIN_K the quantizer
    fits coarse √k KMeans + per-cell sub-clusters instead of flat
    Lloyd. Forced on at fixture scale with k far above what the floor
    would derive: every row gets exactly one cell, the fine-cell count
    is ~k (within allocation rounding), the within-cell pair volume
    stays within the same balance factor the flat occupancy test pins,
    and two fits are bit-identical (seeded sample + seeded Lloyd)."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from engine.session import table
    from engine.similarity import fit_quantizer

    corpus = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    n = corpus.count()
    k = max(16, n // 8)  # cells of ~8 — well-populated two-level regime
    qz = fit_quantizer(spark, corpus, k, seed=42, max_iter=5, force_two_level=True)
    cells = qz.assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    sizes = [r.n for r in cells]
    assert sum(sizes) == n                       # total assignment, 1 cell/row
    assert len(sizes) <= 2 * k                   # ~k fine cells (alloc rounding)
    assert len(sizes) >= k / 4
    pair_vol = sum(s * s for s in sizes)
    assert pair_vol <= 8 * n * n / k, f"two-level cells unbalanced: max={max(sizes)}"
    # determinism: a second fit reproduces the exact assignment
    qz2 = fit_quantizer(spark, corpus, k, seed=42, max_iter=5, force_two_level=True)
    a = sorted((r.vec_id, r.cell) for r in qz.assigned.select("vec_id", "cell").collect())
    b = sorted((r.vec_id, r.cell) for r in qz2.assigned.select("vec_id", "cell").collect())
    assert a == b
    # probing returns valid, deterministic cells nearest the query
    import numpy as np

    qv = np.array(corpus.select("emb").head().emb)
    probed = qz.probe(qv, 6)
    assert len(probed) == 6 and len(set(probed)) == 6
    assert probed == qz2.probe(qv, 6)


def test_two_level_ivf_search_recall(spark, sf_dir):
    """q65 with the two-level quantizer forced must still SEARCH well,
    not just partition well: recall vs the exact baseline stays above
    a floor comparable to the flat path's (flat measured 0.58-0.80 at
    nprobe 4-8; two-level cells differ, so pin a conservative floor)."""
    from engine.similarity import q60_knn_brute, q65_knn_ivf

    brute = _topk_pairs(q60_knn_brute(spark, sf_dir))
    ivf2 = _topk_pairs(q65_knn_ivf(spark, sf_dir, force_two_level=True))
    assert len(brute & ivf2) / len(brute) >= 0.4


def test_two_level_semdedup_planted_clusters(spark, tmp_path):
    """q75 with the two-level quantizer forced must preserve SemDeDup
    semantics on planted paraphrase clusters — same contract as the
    flat-path planted test: each tight group collapses to one
    component with the min-id keeper."""
    import numpy as np

    from engine.similarity import q75_semantic_dedup

    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    for g in range(3):
        base = rng.randn(64) * 3          # well-separated group centers
        for _ in range(4):
            v = base + 0.02 * rng.randn(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(60):
        rows.append((vid, [float(x) for x in rng.randn(64)]))
        vid += 1
    sf_dir = str(tmp_path / "synth2l")
    # single part file: a multi-file planted fixture is read with
    # size-packed splits whose tie order is not stable, so the KMeans
    # input partitioning (and a borderline two-level fit) could vary
    # run to run — the driver fixtures are single files, so pin the
    # planted one the same way (observed ~1/200 suite flake)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).coalesce(1).write.parquet(sf_dir + "/embeddings.parquet")
    out = q75_semantic_dedup(
        spark, sf_dir, k=9, threshold=0.9, force_two_level=True
    ).collect()
    groups = {r.component: r for r in out}
    assert len(groups) == 3
    assert sorted(groups) == [0, 4, 8]
    for comp, r in groups.items():
        assert r.group_size == 4 and r.n_dropped == 3 and r.keeper == comp


def test_semantic_dedup_planted_clusters(spark, tmp_path):
    """SemDeDup semantics at a REAL threshold (0.9): planted paraphrase
    clusters (base vector + small noise) must each collapse to one
    group with the min-id keeper; unrelated random vectors must stay
    out of every group."""
    import numpy as np

    from engine.similarity import q75_semantic_dedup

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for g in range(3):                       # 3 planted groups of 4
        base = rng.randn(64)
        for _ in range(4):
            v = base + 0.05 * rng.randn(64)
            rows.append((vid, [float(x) for x in v], g))
            vid += 1
    for _ in range(50):                      # unrelated background
        rows.append((vid, [float(x) for x in rng.randn(64)], -1))
        vid += 1
    sf_dir = str(tmp_path / "synth")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(sf_dir + "/embeddings.parquet")
    out = q75_semantic_dedup(spark, sf_dir, k=6, threshold=0.9).collect()
    groups = {r.component: r for r in out}
    # exactly the 3 planted groups, each of size 4, keeper = min vec_id
    assert len(groups) == 3
    assert sorted(groups) == [0, 4, 8]
    for comp, r in groups.items():
        assert r.group_size == 4 and r.n_dropped == 3 and r.keeper == comp


def test_semantic_dedup_fixture_groups_consistent(spark, sf_dir):
    """On the real fixture (near-orthogonal embeddings, demo threshold):
    groups are disjoint, keepers are component minima, and every
    grouped pair really clears the threshold per brute-force check."""
    from engine.similarity import q75_semantic_dedup

    out = q75_semantic_dedup(spark, sf_dir).collect()
    assert all(r.keeper == r.component for r in out)
    assert all(r.group_size >= 2 for r in out)
    total_members = sum(r.group_size for r in out)
    assert len({r.component for r in out}) == len(out)
    assert total_members >= 2 * len(out)


def test_semantic_decontamination_planted(spark, tmp_path):
    """q105 on a planted embedding space: an eval-identical corpus
    vector is contaminated with n_hits=1 and max_eval_sim=1; an
    orthogonal one is clean with max 0; a negated eval vector scores
    -1 (max over the single eval) and stays clean.  Exercises the
    high-threshold regime the fixture corpus can't (no planted
    cross-holdout near-dups there)."""
    from engine.similarity import q105_semantic_decontamination

    dim = 4
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # eval (vec_id % 50 == 0)
        (1, [1.0, 0.0, 0.0, 0.0]),   # exact contamination
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal — clean
        (3, [-1.0, 0.0, 0.0, 0.0]),  # antipodal — clean
        (4, [1.0, 1.0, 0.0, 0.0]),   # cos = 1/sqrt(2) ≈ 0.707
    ]
    sf = str(tmp_path / "sem")
    spark.createDataFrame(rows, "vec_id bigint, embedding array<double>").write.parquet(
        sf + "/embeddings.parquet"
    )
    out = {
        r.vec_id: (r.max_eval_sim, r.n_hits, r.contaminated)
        for r in q105_semantic_decontamination(spark, sf, threshold=0.9).collect()
    }
    assert out[1] == (1.0, 1, True)
    assert out[2] == (0.0, 0, False)
    assert out[3] == (-1.0, 0, False)
    assert out[4][2] is False and abs(out[4][0] - 0.707107) < 1e-6


def test_semantic_decontamination_fallback_path_equal(spark, sf_dir):
    """The giant-eval fallback (broadcast join of eval rows +
    partial-agg groupBy) must produce exactly the broadcast-array
    default's rows — same max, same hits, same flags."""
    from engine.similarity import q105_semantic_decontamination

    a = {
        r.vec_id: (r.max_eval_sim, r.n_hits, r.contaminated)
        for r in q105_semantic_decontamination(spark, sf_dir).collect()
    }
    b = {
        r.vec_id: (r.max_eval_sim, r.n_hits, r.contaminated)
        for r in q105_semantic_decontamination(
            spark, sf_dir, broadcast_evals=False
        ).collect()
    }
    assert a == b and len(a) > 0


def test_semantic_decontamination_empty_eval_set(spark, tmp_path):
    """With NO eval vectors (no vec_id % 50 == 0), both q105 paths
    must agree: every corpus vector reported, n_hits 0, contaminated
    False (never NULL — a NULL flag slips past boolean driver
    checks), max_eval_sim honestly NULL."""
    from engine.similarity import q105_semantic_decontamination

    rows = [(i, [float(i), 1.0, 0.0]) for i in range(1, 6)]  # ids 1..5
    sf = str(tmp_path / "noev")
    spark.createDataFrame(rows, "vec_id bigint, embedding array<double>").write.parquet(
        sf + "/embeddings.parquet"
    )
    for bc in (True, False):
        out = q105_semantic_decontamination(spark, sf, broadcast_evals=bc).collect()
        assert len(out) == 5, bc
        assert all(r.n_hits == 0 and r.contaminated is False for r in out), bc
        assert all(r.max_eval_sim is None for r in out), bc


def test_quantizer_empty_cell_fallback(spark, sf_dir, monkeypatch):
    """SUBFIT_GATE_FACTOR=0 admits no sample rows anywhere, forcing
    every cell onto the coarse-centroid-fallback codebook: the
    two-level fit must still assign every vector (no KeyError) with
    sub == 0 everywhere."""
    import numpy as np
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    import engine.similarity as sim
    from engine.session import table

    monkeypatch.setattr(sim, "SUBFIT_GATE_FACTOR", 0)
    corpus = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    n = corpus.count()
    q = sim.fit_quantizer(
        spark, corpus, max(16, n // 8), seed=7, max_iter=5, force_two_level=True
    )
    assigned = q.assigned
    assert assigned.count() == n
    assert assigned.filter(assigned.cell.isNull()).count() == 0
    cells = q.probe(np.zeros(len(corpus.first().emb)), nprobe=4)
    assert len(cells) > 0


def test_scaling_law_report_consistent_with_derivations(spark, sf_dir):
    """The report's fixture row must equal the LIVE derivations (so
    the driver record can't drift from the code), the hypothetical
    rows must show the documented behavior: plane width grows with N,
    modeled recall ≥ target while bands fit under the cap and
    degrades past it, and the quantizer path flips to two-level
    exactly when derived k exceeds TWO_LEVEL_MIN_K."""
    from engine.similarity import (
        LSH_TARGET_RECALL,
        MAX_LSH_BANDS,
        TWO_LEVEL_MIN_K,
        _derive_ivf,
        _derive_n_bands,
        _derive_n_planes,
        _derive_semdedup_k,
        scaling_law_report,
    )

    rows = {r.n_label: r for r in scaling_law_report(spark, sf_dir).collect()}
    fx = rows["fixture"]
    assert fx.lsh_n_planes == _derive_n_planes(fx.n_corpus)
    assert fx.lsh_n_bands == _derive_n_bands(fx.lsh_n_planes)
    assert (fx.ivf_nlist, fx.ivf_nprobe) == _derive_ivf(fx.n_corpus)
    assert fx.semdedup_k == _derive_semdedup_k(fx.n_corpus)
    assert rows["1e6"].lsh_n_planes < rows["1e9"].lsh_n_planes < rows["1e12"].lsh_n_planes
    for label in ("fixture", "1e6", "1e9"):
        assert rows[label].lsh_modeled_recall >= LSH_TARGET_RECALL
    assert rows["1e12"].lsh_n_bands == MAX_LSH_BANDS
    assert rows["1e12"].lsh_modeled_recall < LSH_TARGET_RECALL  # cap honesty
    for r in rows.values():
        assert (r.quantizer_path == "two_level") == (r.semdedup_k > TWO_LEVEL_MIN_K)
    from engine.text import BLOOM_BITS_PER_KEY, BLOOM_MAX_BITS, _derive_bloom_bits

    for r in rows.values():
        assert r.bloom_bits == _derive_bloom_bits(r.n_corpus)
        assert r.bloom_bits & (r.bloom_bits - 1) == 0  # power of two
    assert rows["1e6"].bloom_bits >= 10**6 * BLOOM_BITS_PER_KEY
    # cap honesty: at 1e9+ keys the broadcast budget binds
    assert rows["1e9"].bloom_bits == BLOOM_MAX_BITS
    assert rows["1e12"].bloom_bits == BLOOM_MAX_BITS


def test_embedding_drift_numpy_parity_and_planted_shift(spark, sf_dir, tmp_path):
    """q110's per-dimension smd must equal an independent numpy
    computation on the fixture (1e-9 before rounding ⇒ equal at the
    6-decimal output grid), and a planted mean shift on one dimension
    must be the ONLY flagged drift."""
    import numpy as np
    from engine.similarity import DRIFT_SNAP_MOD, DRIFT_SMD_THRESHOLD, q110_embedding_drift
    from engine.session import table

    rows = {r.dim: r for r in q110_embedding_drift(spark, sf_dir).collect()}
    data = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    a = np.array([r.embedding for r in data if r.vec_id % DRIFT_SNAP_MOD != 0], dtype=np.float64)
    b = np.array([r.embedding for r in data if r.vec_id % DRIFT_SNAP_MOD == 0], dtype=np.float64)
    smd = (b.mean(0) - a.mean(0)) / np.sqrt((a.var(0) + b.var(0)) / 2)
    assert len(rows) == a.shape[1]
    for d in range(a.shape[1]):
        assert abs(rows[d].smd - round(float(smd[d]), 6)) <= 2e-6, d

    # planted: shift dim 5 of snapshot B by +1.0 — strong drift there,
    # nowhere else
    rng = np.random.RandomState(11)
    n, dim = 600, 8
    emb = rng.normal(0, 1, size=(n, dim))
    ids = np.arange(n)
    emb[ids % DRIFT_SNAP_MOD == 0, 5] += 1.0
    sf_dir2 = str(tmp_path / "drift")
    spark.createDataFrame(
        [(int(i), [float(v) for v in emb[i]], 0) for i in ids],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(sf_dir2 + "/embeddings.parquet")
    got = {r.dim: r for r in q110_embedding_drift(spark, sf_dir2).collect()}
    assert got[5].drifted and got[5].smd > 0.5
    for d in range(dim):
        if d != 5:
            assert not got[d].drifted, (d, got[d].smd)
    assert DRIFT_SMD_THRESHOLD < 0.5

    # dead rows (NaN / Inf components) must not poison the report: a
    # planted NaN/Inf row changes NOTHING about the finite statistics
    import math

    spark.createDataFrame(
        [(int(i), [float(v) for v in emb[i]], 0) for i in ids]
        + [
            (n, [float("nan")] * dim, 0),
            (n + 1, [float("inf")] * dim, 0),
        ],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(str(tmp_path / "drift_dead") + "/embeddings.parquet")
    dead = {
        r.dim: r
        for r in q110_embedding_drift(spark, str(tmp_path / "drift_dead")).collect()
    }
    for d in range(dim):
        assert math.isfinite(dead[d].smd)
        assert abs(dead[d].smd - got[d].smd) < 1e-6, d


def test_wide_lsh_buckets_and_banding_survive_int32(spark, sf_dir):
    """Regression for the r5 review finding: at the 36-plane width a
    1e12-row corpus derives (scaling_law_report's last row), bucket
    values reach 2^35 and the old int casts threw CAST_OVERFLOW under
    ANSI mode. Pin that (a) a 36-plane bucket value exceeding int32
    evaluates fine and (b) the multi-band q61 path runs end-to-end at
    that width and keeps the contract shape."""
    from pyspark.sql import functions as F

    from engine.similarity import TOP_K, _bucket, q61_knn_lsh_bucketed

    df = spark.createDataFrame(
        [(i, [1.0] * 64) for i in range(4)], "vec_id long, emb array<double>"
    )
    vals = [
        r.b
        for r in df.select(
            F.expr(_bucket("emb", 36)).cast("bigint").alias("b")
        ).collect()
    ]
    assert vals == [(1 << 36) - 1] * 4  # all-positive dims -> all sign bits set

    out = q61_knn_lsh_bucketed(spark, sf_dir, n_planes=36, n_bands=2)
    rows = out.collect()
    assert out.columns == ["query_id", "vec_id", "bucket", "cosine", "rank"]
    assert all(1 <= r.rank <= TOP_K for r in rows)



def test_embedding_drift_constant_dims_dont_divide_by_zero(spark, tmp_path):
    """Regression for the r5 review finding: zero-pooled-variance
    dimensions (constant in both snapshots — zero-padded encoder dims
    are a real artifact) used to divide by zero, throwing under ANSI
    mode or emitting NULL `drifted` flags under legacy mode. Equal
    constant means => smd 0 / not drifted; a constant-dim level shift
    => +-Infinity / drifted."""
    import numpy as np

    from engine.similarity import DRIFT_SNAP_MOD, q110_embedding_drift

    rng = np.random.RandomState(7)
    n = 400
    emb = rng.normal(0, 1, size=(n, 4))
    emb[:, 1] = 0.0            # constant-equal in both snapshots
    emb[:, 2] = 3.25           # constant but shifted in snapshot B
    ids = np.arange(n)
    emb[ids % DRIFT_SNAP_MOD == 0, 2] = 4.25
    sf = str(tmp_path / "const")
    spark.createDataFrame(
        [(int(i), [float(v) for v in emb[i]], 0) for i in ids],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(sf + "/embeddings.parquet")
    got = {r.dim: r for r in q110_embedding_drift(spark, sf).collect()}
    assert got[1].smd == 0.0 and got[1].drifted is False
    assert got[2].smd == float("inf") and got[2].drifted is True
    for d in (0, 3):
        assert got[d].drifted is False and abs(got[d].smd) < 0.25


def test_zero_norm_vectors_excluded_everywhere(spark, tmp_path):
    """A zero vector (dead encoder row — real at crawl scale) has no
    defined cosine. Left in, it normalizes to a NaN array whose NaN
    similarity sorts ABOVE every real score in a descending rank
    (Spark treats NaN as largest), polluting every top-k. The
    _corpus_normed exclusion must keep it out of brute-force kNN and
    near-dup results entirely, with no NaN anywhere."""
    import math

    import numpy as np

    from engine.similarity import q60_knn_brute, q66_embedding_near_dup

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(30)]
    rows.append((30, [0.0] * 8))            # dead row: zero vector
    rows.append((31, [float("nan")] * 8))   # dead row: NaN components
    rows.append((32, [float("inf")] + [0.0] * 7))  # fp-overflow row
    sf_dir = str(tmp_path / "zeronorm")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).coalesce(1).write.parquet(sf_dir + "/embeddings.parquet")
    dead = {30, 31, 32}
    knn = q60_knn_brute(spark, sf_dir).collect()
    assert knn, "non-degenerate corpus must produce neighbors"
    assert all(r.vec_id not in dead for r in knn)
    assert all(math.isfinite(r.cosine) for r in knn)
    nd = q66_embedding_near_dup(spark, sf_dir).collect()
    assert all(not dead & {r.vec_a, r.vec_b} for r in nd)
    assert all(math.isfinite(r.cosine) for r in nd)


def test_zero_norm_vectors_excluded_quantizer_ops(spark, tmp_path):
    """The quantizer-backed operators (q65 IVF, q75 SemDeDup, q76 PQ,
    q76b IVF-PQ) fit KMeans / codebooks on RAW vectors and normalize
    AFTER cell assignment — the r5 ADVICE found that path unguarded:
    a dead encoder row normalized to a NaN array whose NaN similarity
    out-ranked every real neighbor in q65, and NaN >= threshold is
    TRUE under Spark's NaN-is-largest ordering, so one dead row merged
    unrelated q75 dedup components. All four now route their corpus
    through _corpus_finite; planted zero/NaN/Inf rows must vanish."""
    import math

    import numpy as np

    from engine.similarity import (
        q65_knn_ivf,
        q75_semantic_dedup,
        q76_pq_ann,
        q76b_ivfpq_ann,
    )

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(30)]
    rows.append((30, [0.0] * 8))            # dead row: zero vector
    rows.append((31, [float("nan")] * 8))   # dead row: NaN components
    rows.append((32, [float("inf")] + [0.0] * 7))  # fp-overflow row
    sf_dir = str(tmp_path / "zeronorm_q")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).coalesce(1).write.parquet(sf_dir + "/embeddings.parquet")
    dead = {30, 31, 32}
    for fn in (q65_knn_ivf, q76_pq_ann, q76b_ivfpq_ann):
        knn = fn(spark, sf_dir).collect()
        assert knn, f"{fn.__name__}: non-degenerate corpus must produce neighbors"
        assert all(r.vec_id not in dead for r in knn), fn.__name__
        assert all(math.isfinite(r.cosine) for r in knn), fn.__name__
    # at an unreachable threshold nothing pairs — before the guard the
    # NaN row paired with every vector in its cell and this was nonempty
    assert q75_semantic_dedup(spark, sf_dir, threshold=0.999).count() == 0
    comps = q75_semantic_dedup(spark, sf_dir).collect()
    assert all(r.component not in dead and r.keeper not in dead for r in comps)


def test_q105_empty_eval_set_keeps_corpus_rows(spark, tmp_path):
    """r7 exploration-fuzzer find, pinned: with NO finite eval vector
    (the only % SEM_DECON_MOD == 0 row is NaN), every corpus vector
    still gets a row — NULL max_eval_sim, 0 hits, clean — on BOTH
    engines (the oracle's inner-join form silently dropped them)."""
    import duckdb

    import __spark_entry__ as contract

    rows = [
        (0, [float("nan")] + [0.0] * 7, 0),  # the would-be eval row
        (1, [0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 1),
        (2, [0.0, -0.25, 0.0, 0.0, 0.0, 0.0, 0.25, 0.0], 2),
    ]
    d = str(tmp_path / "q105_empty_eval")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).write.parquet(d + "/embeddings.parquet")
    got = {
        r.vec_id: r
        for r in contract.queries()["q105_semantic_decontamination"](spark, d).collect()
    }
    assert set(got) == {1, 2}
    for r in got.values():
        assert r.max_eval_sim is None and r.n_hits == 0 and r.contaminated is False
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    odf = con.execute(contract.oracle_sql()["q105_semantic_decontamination"]).fetchdf()
    assert sorted(odf.vec_id) == [1, 2]


def test_quantizer_single_row_corpus(spark, tmp_path):
    """r7 exploration-fuzzer find, pinned: a 1-row corpus must not
    crash the KMeans-backed tier (MLlib requires k >= 2 and its ||
    init AIOOBEs when k exceeds the row count) — fit_quantizer clamps
    k to the corpus size and serves the single-cell case without a
    fit. Each operator returns its empty/sane frame."""
    from engine.similarity import q65_knn_ivf, q75_semantic_dedup, q76b_ivfpq_ann

    d = str(tmp_path / "one_vec")
    spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.25], 0)], "vec_id bigint, embedding array<double>, label int"
    ).write.parquet(d + "/embeddings.parquet")
    assert q65_knn_ivf(spark, d).count() == 0       # query==corpus row: excluded
    assert q75_semantic_dedup(spark, d).count() == 0  # no pairs, no components
    assert q76b_ivfpq_ann(spark, d).count() == 0

    # the sharper variant the row-count clamp missed: several rows but
    # ONE distinct finite point (duplicates + zero vectors) — k must
    # clamp to DISTINCT embeddings, not rows
    d2 = str(tmp_path / "dup_vecs")
    v = [-1.5, 0.0, 0.75, -1.25]
    spark.createDataFrame(
        [(0, v, 0), (1, list(v), 1), (2, [0.0] * 4, 2)],
        "vec_id bigint, embedding array<double>, label int",
    ).write.parquet(d2 + "/embeddings.parquet")
    assert q65_knn_ivf(spark, d2).count() == 2      # the twin pair finds itself
    assert q75_semantic_dedup(spark, d2).count() == 1  # one duplicate group
    assert q76b_ivfpq_ann(spark, d2).count() == 2


def test_hard_negatives_numpy_recount(spark, sf_dir):
    """q123 against an independent numpy recount: per anchor, the
    different-label top-k by cosine with (sim desc, vec_id) ties, the
    best same-label positive, margins, and the violation flag."""
    import numpy as np

    from engine.session import table
    from engine.similarity import N_QUERIES, TOP_K, q123_hard_negatives

    rows = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    vecs, labels = {}, {}
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        n = float(np.sqrt((v * v).sum()))
        if n > 0 and np.isfinite(n):
            vecs[r.vec_id] = v / n
            labels[r.vec_id] = r.label
    got = list(q123_hard_negatives(spark, sf_dir).collect())
    by_anchor: dict = {}
    for r in got:
        by_anchor.setdefault(r.query_id, []).append(r)
    for qid in (i for i in range(N_QUERIES) if i in vecs):
        q, ql = vecs[qid], labels[qid]
        sims = {
            vid: float(q @ v) for vid, v in vecs.items() if vid != qid
        }
        pos = max(
            (s for vid, s in sims.items() if labels[vid] == ql), default=None
        )
        negs = sorted(
            ((vid, s) for vid, s in sims.items() if labels[vid] != ql),
            key=lambda t: (-t[1], t[0]),
        )[:TOP_K]
        mine = by_anchor[qid]
        assert [r.vec_id for r in mine] == [vid for vid, _ in negs]
        for r, (vid, s) in zip(mine, negs):
            assert abs(r.cosine - s) < 6e-7  # emitted at round-6
            assert r.neg_label == labels[vid] != ql
            if pos is None:
                assert r.margin is None and r.harder_than_positive
            else:
                assert abs(r.margin - (pos - s)) < 6e-7
                assert r.harder_than_positive == (s >= pos)


def test_hard_negatives_planted_semantics(spark, tmp_path):
    """Planted geometry: an anchor whose nearest different-label
    vector is CLOSER than its best positive must flag it
    harder_than_positive with a negative margin; an anchor class with
    no second member gets NULL margin and flag TRUE on every negative;
    a degenerate zero vector never appears."""
    from engine.similarity import q123_hard_negatives

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),     # anchor A
        (1, [0.99, 0.1, 0.0, 0.0], 1),    # hard negative (closer than pos)
        (2, [0.8, 0.6, 0.0, 0.0], 0),     # A's best positive
        (3, [0.0, 1.0, 0.0, 0.0], 1),     # easy negative
        (4, [0.0, 0.0, 1.0, 0.0], 7),     # anchor B: label 7 is unique
        (5, [0.0] * 4, 1),                # degenerate: excluded
    ]
    d = str(tmp_path / "q123")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).write.parquet(d + "/embeddings.parquet")
    out = list(q123_hard_negatives(spark, d).collect())
    assert all(r.vec_id != 5 for r in out)
    a = [r for r in out if r.query_id == 0]
    assert a[0].vec_id == 1 and a[0].harder_than_positive and a[0].margin < 0
    easy = next(r for r in a if r.vec_id == 3)
    assert not easy.harder_than_positive and easy.margin > 0
    b = [r for r in out if r.query_id == 4]
    assert b and all(r.margin is None and r.harder_than_positive for r in b)


def test_q62_refuses_beyond_input_bound(spark, sf_dir, monkeypatch):
    """q62 is the bounded library-parity demo (r8 verdict item 7): its
    shuffle is quadratic in corpus size, so beyond Q62_INPUT_BOUND it
    must refuse loudly and point at the scale path, not melt."""
    import pytest

    from engine import similarity

    monkeypatch.setattr(similarity, "Q62_INPUT_BOUND", 10)
    with pytest.raises(ValueError, match="q61"):
        similarity.q62_brp_lsh_join(spark, sf_dir)


def test_threshold_join_recall_sentinel_beyond_bound(spark, sf_dir, monkeypatch):
    """Beyond Q62_INPUT_BOUND the recall report must NOT die with q62's
    refusal (r9 ADVICE): the brp tier degrades to a NULL sentinel row
    and every other tier still reports real numbers — on a corpus too
    big for the library demo, those rows are the whole point."""
    from engine import similarity

    monkeypatch.setattr(similarity, "Q62_INPUT_BOUND", 10)
    rows = {r.tier: r for r in similarity._threshold_join_recall(spark, sf_dir).collect()}
    assert set(rows) == {
        "brp_threshold_join",
        "lsh_threshold_join",
        "lsh_banded_threshold_join",
    }
    brp = rows["brp_threshold_join"]
    assert brp.recall_at_10 is None and brp.n_hits is None
    assert brp.n_truth > 0  # the exact truth leg still ran
    for tier in ("lsh_threshold_join", "lsh_banded_threshold_join"):
        assert rows[tier].recall_at_10 is not None
        assert rows[tier].n_truth == brp.n_truth
