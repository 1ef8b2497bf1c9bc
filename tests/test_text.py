"""Dedup / text-analysis invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.session import table
from engine.text import (
    N_MINHASH,
    minhash_signatures,
    q52_ngram_jaccard,
    q54_minhash_candidates,
    q55_simhash,
    q57_quality_score,
)


def test_minhash_identical_docs_share_signature(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(20)
    dup = d.withColumn("doc_id", F.col("doc_id") + 1_000_000)  # same text, new ids
    sigs = minhash_signatures(d.unionByName(dup))
    a = {(r.doc_id, r.seed): r.minhash for r in sigs.filter("doc_id < 1000000").collect()}
    b = {(r.doc_id - 1_000_000, r.seed): r.minhash for r in sigs.filter("doc_id >= 1000000").collect()}
    assert a == b
    assert len(a) == 20 * N_MINHASH


def test_simhash_stable_and_bounded(spark, sf_dir):
    rows = q55_simhash(spark, sf_dir).collect()
    assert all(0 <= r.simhash < (1 << 16) for r in rows)
    again = {r.doc_id: r.simhash for r in q55_simhash(spark, sf_dir).collect()}
    assert {r.doc_id: r.simhash for r in rows} == again


def test_minhash_candidates_estimate_tracks_true_jaccard(spark, sf_dir):
    """Strong MinHash estimates must track true Jaccard. Truth is
    computed HERE from the shingle sets of the involved docs — q52's
    output can't serve as truth because it cuts at jaccard >= 0.2, so
    a candidate at true 0.1-0.2 would misread as 0.0. And with 8
    signatures a few est>=0.5 flukes are expected once the corpus is
    large (P(est>=4/8 | j=0.05) is tiny but the pair count is ~N^2/2),
    so the claim is aggregate: >=80% of strong candidates are truly
    similar, and none of them is an outright stranger by median."""
    from engine.text import _with_shingles

    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in q54_minhash_candidates(spark, sf_dir).collect()}
    strong = sorted(p for p, e in est.items() if e >= 0.5)
    assert strong, "fixture should produce at least one strong candidate"
    docs = sorted({d for p in strong for d in p})
    sh = (
        _with_shingles(table(spark, sf_dir, "documents").filter(F.col("doc_id").isin(docs)))
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("s"))
        .collect()
    )
    sets = {r.doc_id: set(r.s) for r in sh}
    true_j = [
        len(sets[a] & sets[b]) / len(sets[a] | sets[b]) for a, b in strong
    ]
    frac_plausible = sum(j >= 0.1 for j in true_j) / len(true_j)
    assert frac_plausible >= 0.8, (frac_plausible, sorted(zip(true_j, strong))[:5])


def test_quality_score_bounds(spark, sf_dir):
    rows = q57_quality_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 < r.distinct_ratio <= 1.0
        assert r.bucket in ("high", "mid", "low")


def test_connected_components_known_graph(spark):
    """Both implementations — driver union-find (small graphs) and the
    distributed min-label loop (forced via driver_threshold=0) — must
    produce identical components on a known graph incl. a cycle and a
    chain longer than one propagation hop."""
    from engine.text import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20), (3, 4), (4, 5)],
        "src bigint, dst bigint",
    )
    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    small = {r.doc_id: r.component for r in connected_components(edges).collect()}
    assert small == want
    dist = {
        r.doc_id: r.component
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert dist == want


def test_minhash_lsh_candidate_recall(spark, sf_dir):
    """q54's banded candidates must recall (almost) every true
    near-dup pair: measured 28/28 pairs with exact jaccard >= 0.5
    found at sf0.001 (floor 0.85 for seed robustness). This is the
    guarantee that makes q52's candidate-restricted verification
    sound."""
    from engine.text import _with_shingles, q54_minhash_candidates
    from engine.session import table
    from collections import defaultdict

    docs = defaultdict(set)
    for r in _with_shingles(table(spark, sf_dir, "documents")).collect():
        docs[r.doc_id].add(r.shingle)
    ids = sorted(docs)
    exact = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(docs[a] & docs[b])
            if inter and inter / len(docs[a] | docs[b]) >= 0.5:
                exact.add((a, b))
    cand = {(r.doc_a, r.doc_b) for r in q54_minhash_candidates(spark, sf_dir).collect()}
    assert exact, "fixture should contain planted near-dups"
    assert len(exact & cand) / len(exact) >= 0.85


def test_substring_dedup_catches_misaligned_duplicates(spark):
    """q113's whole point vs q97: a duplicated run that starts at a
    DIFFERENT token offset in the copying doc is still removed.  Doc
    1 embeds doc 0's tokens 5..16 after a 3-token prefix (alignment
    shifted by 2 mod CHUNK_TOKENS); the expected survivor set is
    computed independently in python."""
    import hashlib

    from pyspark.sql import Row

    from engine.text import SUBSTR_W, _substring_dedup

    a = [f"a{i}" for i in range(20)]
    b = ["x0", "x1", "x2"] + a[5:17] + ["y0", "y1"]
    out = {
        r.doc_id: r
        for r in _substring_dedup(
            spark.createDataFrame(
                [Row(doc_id=0, text=" ".join(a)), Row(doc_id=1, text=" ".join(b))]
            )
        ).collect()
    }
    # first occurrence keeps everything
    assert out[0].n_removed == 0 and out[0].n_dup_windows == 0
    assert out[0].clean_text_hash == hashlib.md5(" ".join(a).encode()).hexdigest()
    # python reference for doc 1: dup window starts are every i with
    # b[i:i+W] a window of doc 0, i.e. starts 3..(3+12-W); coverage
    # removes exactly the embedded run
    starts = [
        i
        for i in range(len(b) - SUBSTR_W + 1)
        if " ".join(b[i : i + SUBSTR_W]) in " ".join(a)
    ]
    removed = {p for s in starts for p in range(s, s + SUBSTR_W)}
    kept = [t for p, t in enumerate(b) if p not in removed]
    assert starts, "fixture construction must plant at least one dup window"
    assert out[1].n_dup_windows == len(starts)
    assert out[1].n_removed == len(removed)
    assert out[1].clean_text_hash == hashlib.md5(" ".join(kept).encode()).hexdigest()


def test_substring_dedup_global_invariants(spark, sf_dir):
    """Corpus-wide accounting: duplicate window occurrences equal
    total windows minus distinct window contents (every content keeps
    exactly one occurrence), and coverage is consistent per doc (a
    doc with dup windows loses at least one full window's tokens; a
    doc without loses none)."""
    from pyspark.sql import functions as F

    from engine.session import table
    from engine.text import SUBSTR_W, q113_substring_dedup

    out = q113_substring_dedup(spark, sf_dir).cache()
    d = table(spark, sf_dir, "documents")
    wins = d.select(
        F.explode(
            F.expr(
                f"CASE WHEN size(split(trim(text), ' +')) >= {SUBSTR_W} THEN"
                f" transform(sequence(0, size(split(trim(text), ' +')) - {SUBSTR_W}),"
                f" i -> concat_ws(' ', slice(split(trim(text), ' +'), i + 1, {SUBSTR_W})))"
                f" ELSE cast(array() as array<string>) END"
            )
        ).alias("w")
    )
    total, distinct = wins.count(), wins.distinct().count()
    agg = out.agg(
        F.sum("n_dup_windows").alias("dups"),
        F.count_if((F.col("n_dup_windows") > 0) & (F.col("n_removed") < SUBSTR_W)).alias("under"),
        F.count_if((F.col("n_dup_windows") == 0) & (F.col("n_removed") > 0)).alias("ghost"),
        F.count_if(F.col("n_removed") > F.col("n_tokens")).alias("over"),
    ).collect()[0]
    assert agg.dups == total - distinct
    assert agg.under == 0 and agg.ghost == 0 and agg.over == 0
    assert out.count() == d.count()
    out.unpersist()


def test_boilerplate_scrub_removes_all_occurrences(spark):
    """q114 vs q97: the template span disappears from EVERY document,
    including the first occurrence; unique content survives intact."""
    import hashlib

    from pyspark.sql import Row

    from engine.text import BOILER_MIN_COUNT, CHUNK_TOKENS, _boilerplate_scrub

    template = [f"tpl{i}" for i in range(CHUNK_TOKENS)]
    rows, expected = [], {}
    for d in range(BOILER_MIN_COUNT + 1):
        body = [f"d{d}w{i}" for i in range(CHUNK_TOKENS)]
        rows.append(Row(doc_id=d, text=" ".join(template + body)))
        expected[d] = " ".join(body)
    # one doc below the bar: a chunk repeated BOILER_MIN_COUNT-1 times
    # total (here: only in this doc) stays
    rows.append(Row(doc_id=99, text=" ".join([f"u{i}" for i in range(CHUNK_TOKENS)])))
    expected[99] = " ".join(f"u{i}" for i in range(CHUNK_TOKENS))
    out = {r.doc_id: r for r in _boilerplate_scrub(spark.createDataFrame(rows)).collect()}
    for d, exp in expected.items():
        assert out[d].clean_text_hash == hashlib.md5(exp.encode()).hexdigest(), d
    assert all(out[d].n_boiler == 1 for d in range(BOILER_MIN_COUNT + 1))
    assert out[99].n_boiler == 0


def test_paragraph_dedup_global_invariants(spark, sf_dir):
    """Every distinct chunk survives exactly once across the corpus,
    and the first document (lowest doc_id) keeps all its chunks."""
    from pyspark.sql import functions as F

    from engine.session import table
    from engine.text import CHUNK_TOKENS, q97_paragraph_dedup

    out = q97_paragraph_dedup(spark, sf_dir)
    kept_total = out.agg(F.sum("n_kept")).collect()[0][0]

    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " +")
    distinct_chunks = (
        d.select("doc_id", toks.alias("t"))
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(size(t) / {CHUNK_TOKENS}.0) as int) - 1),"
                    f" i -> concat_ws(' ', slice(t, i * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS})))"
                )
            ).alias("chunk")
        )
        .distinct()
        .count()
    )
    assert kept_total == distinct_chunks
    first = out.orderBy("doc_id").first()
    assert first.n_kept == first.n_chunks


def test_pii_scrub_redacts_planted_pii(spark, tmp_path):
    """q78 semantics on planted PII: counts per class and full
    redaction (no pattern survives in the scrubbed text)."""
    from pyspark.sql import Row

    from engine.text import _PII_PATTERNS, q78_pii_scrub

    rows = [
        Row(doc_id=0, lang="en",
            text="contact john.doe+x@corp.example.com or 555-867-5309 x"),
        Row(doc_id=1, lang="en",
            text="ssn 123-45-6789 server 10.0.255.7 and 192.168.1.1 ok"),
        Row(doc_id=2, lang="en", text="no pii here at all"),
    ]
    sf_dir = str(tmp_path / "pii")
    spark.createDataFrame(rows).write.parquet(sf_dir + "/documents.parquet")
    out = {r.doc_id: r for r in q78_pii_scrub(spark, sf_dir).collect()}
    assert (out[0].n_email, out[0].n_phone) == (1, 1)
    assert (out[1].n_ssn, out[1].n_ipv4) == (1, 2)
    assert all(
        getattr(out[2], f"n_{k}") == 0 for k in _PII_PATTERNS
    )
    # doc 2 untouched -> hash equals md5 of the original
    import hashlib

    assert out[2].scrubbed_hash == hashlib.md5(b"no pii here at all").hexdigest()
    # redaction happened: doc 0 scrubbed text no longer matches patterns
    from engine.session import table

    d = table(spark, sf_dir, "documents")
    scrubbed = F.col("text")
    from engine.text import _PII_PATTERNS as P

    for name, p in P.items():
        scrubbed = F.regexp_replace(scrubbed, p, f"[{name.upper()}]")
    txt = d.filter(F.col("doc_id") == 0).select(scrubbed.alias("s")).first().s
    assert "[EMAIL]" in txt and "[PHONE]" in txt and "@" not in txt


def test_corpus_mix_budget_and_determinism(spark, sf_dir):
    """q79 invariants: no language oversampled (selected <= available,
    rate <= 1), the binding language runs at rate ~1, realized counts
    track rate*n within binomial-ish slack, and the selection is
    identical across runs (md5, not rand)."""
    from engine.text import q79_corpus_mix

    rows = q79_corpus_mix(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 < r.rate_ppm <= 1_000_000
        assert 0 <= r.n_selected <= r.n_before
        expect = r.n_before * r.rate_ppm / 1e6
        assert abs(r.n_selected - expect) <= max(5, 0.35 * expect)
    assert max(r.rate_ppm for r in rows) >= 999_000  # binding lang ~ rate 1
    again = q79_corpus_mix(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_decontaminate_planted_overlap(spark, tmp_path):
    """q48 semantics on planted train/eval overlap: a corpus doc
    sharing >= DECON_MIN_HITS shingles with an eval doc is flagged; a
    single shared shingle is not; eval docs and <3-token docs are
    absent from the output."""
    from pyspark.sql import Row

    from engine.text import DECON_MIN_HITS, q48_decontaminate

    rows = [
        Row(doc_id=0, lang="en", text="alpha beta gamma delta epsilon zeta eta"),  # eval
        Row(doc_id=1, lang="en", text="alpha beta gamma delta prose"),   # 2 shared shingles
        Row(doc_id=2, lang="en", text="totally different words here today"),  # 0 hits
        Row(doc_id=3, lang="en", text="one two"),                        # no shingles
        Row(doc_id=50, lang="en", text="iota kappa lambda mu nu"),       # eval
        Row(doc_id=4, lang="en", text="iota kappa lambda filler words"), # 1 hit only
    ]
    sf_dir = str(tmp_path / "decon")
    spark.createDataFrame(rows).write.parquet(sf_dir + "/documents.parquet")
    out = {r.doc_id: r for r in q48_decontaminate(spark, sf_dir).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].n_hits == 2 and out[1].contaminated
    assert out[2].n_hits == 0 and not out[2].contaminated
    assert out[4].n_hits == 1 and not out[4].contaminated
    assert DECON_MIN_HITS == 2  # the planted expectations above encode it


def test_span_decontaminate_planted(spark, tmp_path):
    """q48b semantics on planted span overlap: only the chunk holding
    an eval shingle is removed (the doc survives), a fully
    contaminated doc reassembles to md5(''), an eval shingle
    straddling the chunk seam is NOT matched (the documented
    boundary caveat), and eval docs are absent."""
    import hashlib

    from pyspark.sql import Row

    from engine.text import CHUNK_TOKENS, q48b_span_decontaminate

    assert CHUNK_TOKENS == 12  # planted layouts below encode it
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    filler = [f"w{i}" for i in range(24)]
    # doc 1: chunk0 carries the eval 3-gram "e1 e2 e3"; chunk1 clean
    d1 = ["e1", "e2", "e3"] + filler[:9] + filler[9:21]
    # doc 2: clean, 13 tokens -> 12-token chunk + 1-token tail chunk
    d2 = filler[:13]
    # doc 3: single chunk, contaminated -> everything removed
    d3 = ["x1", "e1", "e2", "e3", "x2"]
    # doc 4: "e1 e2 e3" straddles the seam (tokens 11,12 | 13)
    d4 = filler[:10] + ["e1", "e2", "e3"] + filler[10:21]
    rows = [
        Row(doc_id=0, lang="en", text="e1 e2 e3 e4 e5"),  # eval
        Row(doc_id=1, lang="en", text=" ".join(d1)),
        Row(doc_id=2, lang="en", text=" ".join(d2)),
        Row(doc_id=3, lang="en", text=" ".join(d3)),
        Row(doc_id=4, lang="en", text=" ".join(d4)),
    ]
    sf_dir = str(tmp_path / "spandecon")
    spark.createDataFrame(rows).write.parquet(sf_dir + "/documents.parquet")
    out = {r.doc_id: r for r in q48b_span_decontaminate(spark, sf_dir).collect()}
    assert set(out) == {1, 2, 3, 4}
    r1 = out[1]
    assert (r1.n_chunks, r1.n_removed) == (2, 1)
    assert r1.clean_text_hash == md5(" ".join(d1[12:]))
    r2 = out[2]
    assert (r2.n_chunks, r2.n_removed) == (2, 0)
    assert r2.removed_rate == 0.0
    assert r2.clean_text_hash == md5(" ".join(d2[:12]) + " " + d2[12])
    r3 = out[3]
    assert (r3.n_chunks, r3.n_removed) == (1, 1)
    assert r3.removed_rate == 1.0
    assert r3.clean_text_hash == md5("")
    r4 = out[4]  # seam straddle: nothing removed
    assert (r4.n_chunks, r4.n_removed) == (2, 0)
    assert r4.clean_text_hash == md5(" ".join(d4))


def test_span_decontaminate_consistent_with_doc_level(spark, sf_dir):
    """Cross-operator invariant: a chunk's shingles are a subset of
    its document's shingles, so q48b can only remove chunks from docs
    q48 sees at least one hit in — a doc with q48 n_hits = 0 must
    have q48b n_removed = 0, and any removal implies n_hits >= 1.
    Both queries must also agree on the corpus doc set (modulo docs
    with no shingles, which q48 omits)."""
    from engine.text import q48_decontaminate, q48b_span_decontaminate

    hits = {r.doc_id: r.n_hits for r in q48_decontaminate(spark, sf_dir).collect()}
    spans = {r.doc_id: r.n_removed for r in q48b_span_decontaminate(spark, sf_dir).collect()}
    assert set(hits) <= set(spans)  # q48b covers every doc q48 scores
    removed_docs = {d for d, n in spans.items() if n > 0}
    assert removed_docs, "fixture must exercise the removal path"
    for d in removed_docs:
        assert hits.get(d, 0) >= 1, f"doc {d}: chunk removed but q48 saw no hits"
    for d, n in hits.items():
        if n == 0:
            assert spans[d] == 0, f"doc {d}: q48 clean but q48b removed chunks"


def test_decontaminate_fixture_invariants(spark, sf_dir):
    from engine.text import DECON_HOLDOUT_MOD, DECON_MIN_HITS, q48_decontaminate

    rows = q48_decontaminate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_id % DECON_HOLDOUT_MOD != 0     # eval never in output
        assert 0 <= r.n_hits <= r.n_shingles
        assert r.contaminated == (r.n_hits >= DECON_MIN_HITS)
        assert 0 <= (r.n_hits / r.n_shingles) - r.contam_rate < 1e-6  # trunc6


def test_sequence_packing_stream_invariants(spark, sf_dir):
    """q49: within each shard the token stream is contiguous (no gaps
    or overlaps in doc_id order), window indices follow floor/ceil
    arithmetic, and docs genuinely straddle window boundaries (the
    concat-and-chop semantics under test)."""
    from engine.text import PACK_SHARDS, PACK_WINDOW, q49_sequence_packing

    rows = q49_sequence_packing(spark, sf_dir).collect()
    by_shard: dict = {}
    for r in rows:
        assert r.shard == r.doc_id % PACK_SHARDS
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == PACK_SHARDS
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in rs:
            assert r.start_tok == pos and r.end_tok == pos + r.n_tokens
            pos = r.end_tok
            assert r.first_window == r.start_tok // PACK_WINDOW
            assert r.last_window == (r.end_tok - 1) // PACK_WINDOW
            assert r.n_windows == r.last_window - r.first_window + 1
    assert any(r.n_windows > 1 for r in rows)


def test_greedy_packing_invariants_and_mirror(spark, sf_dir):
    """q49b: per (shard, bin) the fill never exceeds the budget unless
    a single doc is itself oversized; a new bin opens ONLY when the
    doc would overflow the previous one (greedy first-fit-in-order);
    and the distributed applyInPandas result equals a driver-side
    greedy mirror over the same (shard, doc_id, n_tokens) stream."""
    from engine.text import PACK_SHARDS, PACK_WINDOW, q49_sequence_packing, q49b_greedy_packing

    rows = q49b_greedy_packing(spark, sf_dir).collect()
    # token counts must agree with q49's (same tokenization)
    toks_a = {r.doc_id: r.n_tokens for r in rows}
    toks_b = {r.doc_id: r.n_tokens for r in q49_sequence_packing(spark, sf_dir).collect()}
    assert toks_a == toks_b

    by_shard: dict = {}
    for r in rows:
        assert r.shard == r.doc_id % PACK_SHARDS
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.doc_id)
        # driver-side greedy mirror
        bin_id, fill = 0, 0
        for r in rs:
            if fill > 0 and fill + r.n_tokens > PACK_WINDOW:
                bin_id += 1
                fill = 0
            fill += r.n_tokens
            assert (r.bin_id, r.bin_fill) == (bin_id, fill), r
            # fit invariant: within budget unless the doc alone overflows
            assert r.bin_fill <= PACK_WINDOW or r.bin_fill == r.n_tokens


def test_connected_components_random_graphs_paths_agree(spark):
    """Randomized equivalence: on seeded random graphs (mixed density,
    self-loops, duplicate and reversed edges) the driver union-find
    and the distributed min-label loop must emit identical labelings,
    and every label must be the true component minimum per a
    reference BFS."""
    import random

    from engine.text import connected_components

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 40, 60), (3, 25, 80)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        small = {r.doc_id: r.component for r in connected_components(df).collect()}
        dist = {
            r.doc_id: r.component
            for r in connected_components(df, driver_threshold=0).collect()
        }
        assert small == dist, f"paths diverge (seed {seed})"
        # reference BFS over the undirected adjacency
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        seen: set = set()
        for start in sorted(adj):
            if start in seen:
                continue
            comp: set = {start}
            frontier = [start]
            while frontier:
                nxt = {nb for node in frontier for nb in adj[node]} - comp
                comp |= nxt
                frontier = list(nxt)
            seen |= comp
            lo = min(comp)
            for node in comp:
                assert small[node] == lo, (seed, node)


def test_repetition_signals_planted(spark, tmp_path):
    """q57b semantics on planted docs: a degenerate repeat is flagged
    with the exact fractions, a diverse doc is clean with zero dup
    fractions, and a too-short doc gets all-zero signals."""
    from pyspark.sql import Row

    from engine.text import q57b_repetition_signals

    rows = [
        Row(doc_id=0, lang="en", text="spam spam spam spam"),      # 3x "spam spam"
        Row(doc_id=1, lang="en", text="one two three four five six seven"),
        Row(doc_id=2, lang="en", text="solo"),                     # no n-grams at all
    ]
    sf_dir = str(tmp_path / "rep")
    spark.createDataFrame(rows).write.parquet(sf_dir + "/documents.parquet")
    out = {r.doc_id: r for r in q57b_repetition_signals(spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2}
    # doc 0: tot2=3 dis2=1 top2=3; tot3=2 dis3=1 top3=2
    assert abs(out[0].dup_2gram_frac - 2 / 3) < 1e-5
    assert out[0].top_2gram_frac == 1.0
    assert abs(out[0].dup_3gram_frac - 1 / 2) < 1e-5
    assert out[0].repetitive
    # doc 1: 6 distinct 2-grams -> dup 0, top 1/6 <= 0.20 cap
    assert out[1].dup_2gram_frac == 0.0 and out[1].dup_3gram_frac == 0.0
    assert abs(out[1].top_2gram_frac - 1 / 6) < 1e-5
    assert not out[1].repetitive
    # doc 2: no grams -> zeros, not flagged
    assert out[2].dup_2gram_frac == 0.0 and out[2].top_3gram_frac == 0.0
    assert not out[2].repetitive


def test_heavy_hitters_exact_and_guarantee(spark, sf_dir):
    """q67b must equal the brute-force exact top-k (the two-phase
    Misra-Gries candidates + recount is exact, not approximate), and
    the fixture must satisfy the capture precondition that PROVES it:
    kth count > N/(capacity+1)."""
    from engine.session import table
    from engine.text import HH_CAPACITY, HH_TOPK, q67b_heavy_hitters

    got = [(r.tok, r.n_occurrences, r.rank) for r in q67b_heavy_hitters(spark, sf_dir).collect()]
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
    )
    exact = (
        toks.groupBy("tok").count()
        .orderBy(F.desc("count"), "tok")
        .limit(HH_TOPK)
        .collect()
    )
    want = [(r.tok, r["count"], i + 1) for i, r in enumerate(exact)]
    assert got == want
    n_total = toks.count()
    assert want[-1][1] > n_total / (HH_CAPACITY + 1), (
        "fixture no longer satisfies the MG capture bound; raise HH_CAPACITY"
    )


def test_rag_chunking_covers_every_token(spark, sf_dir):
    """q49c layout invariants per doc: chunk_idx dense from 0, starts
    advance by the stride, every chunk holds 1..W tokens, the last
    chunk ends exactly at n_tokens, and consecutive chunks overlap by
    W - S tokens (except a short tail)."""
    from engine.session import table
    from engine.text import RAG_CHUNK_STRIDE, RAG_CHUNK_TOKENS, q49c_rag_chunking

    n_tok = {
        r.doc_id: r.n
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(F.trim(F.col("text")), " +")).alias("n"))
        .collect()
    }
    per_doc: dict = {}
    for r in q49c_rag_chunking(spark, sf_dir).collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(n_tok)
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = n_tok[doc_id]
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.start_tok == c.chunk_idx * RAG_CHUNK_STRIDE
            assert 1 <= c.n_chunk_tokens <= RAG_CHUNK_TOKENS
        last = chunks[-1]
        assert last.start_tok + last.n_chunk_tokens == n
        # full chunks everywhere but the tail
        for c in chunks[:-1]:
            assert c.n_chunk_tokens == RAG_CHUNK_TOKENS


def test_component_representatives_match_q80_clusters(spark, sf_dir):
    """q80b must agree with q80 on the clustering itself (same
    components, same sizes) and pick the max-quality member (ties ->
    lowest doc_id) as keeper."""
    from engine.text import (
        q54_minhash_candidates,
        q57_quality_score,
        q80_dedup_components,
        q80b_component_representatives,
        connected_components,
    )

    reps = {r.component: r for r in q80b_component_representatives(spark, sf_dir).collect()}
    base = {r.component: r for r in q80_dedup_components(spark, sf_dir).collect()}
    assert set(reps) == set(base)
    assert {c: r.cluster_size for c, r in reps.items()} == {
        c: r.cluster_size for c, r in base.items()
    }
    # keeper really is the argmax-quality member of its component
    pairs = q54_minhash_candidates(spark, sf_dir).filter(F.col("est_jaccard") >= 0.5)
    comps = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    ).collect()
    members: dict = {}
    for r in comps:
        members.setdefault(r.component, []).append(r.doc_id)
    quality = {r.doc_id: r.quality for r in q57_quality_score(spark, sf_dir).collect()}
    for comp, rep in reps.items():
        best = min(members[comp], key=lambda d: (-quality[d], d))
        assert rep.keeper_doc_id == best
        assert rep.keeper_quality == quality[best]


def test_rag_chunking_boundary_lengths(spark, tmp_path):
    """q49c at the exact layout boundaries: n = 1, W-1, W, W+1, 2S,
    W+S (last chunk exactly full), W+S+1 — chunk counts and tail
    lengths must follow the stride formula with no empty chunks."""
    from pyspark.sql import Row

    from engine.text import RAG_CHUNK_STRIDE as S
    from engine.text import RAG_CHUNK_TOKENS as W
    from engine.text import q49c_rag_chunking

    cases = [1, W - 1, W, W + 1, 2 * S, W + S, W + S + 1]
    rows = [
        Row(doc_id=i, lang="en", text=" ".join(f"w{j}" for j in range(n)))
        for i, n in enumerate(cases)
    ]
    sf_dir = str(tmp_path / "chunk_edges")
    spark.createDataFrame(rows).write.parquet(sf_dir + "/documents.parquet")
    per_doc: dict = {}
    for r in q49c_rag_chunking(spark, sf_dir).collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(cases):
        chunks = sorted(per_doc[i], key=lambda r: r.chunk_idx)
        want_chunks = 1 + max(0, -(-(n - W) // S))  # 1 + ceil(max(0, n-W)/S)
        assert len(chunks) == want_chunks, (n, [c.n_chunk_tokens for c in chunks])
        assert chunks[-1].start_tok + chunks[-1].n_chunk_tokens == n
        assert all(c.n_chunk_tokens >= 1 for c in chunks)
        # every token index is covered by at least one chunk
        covered = set()
        for c in chunks:
            covered |= set(range(c.start_tok, c.start_tok + c.n_chunk_tokens))
        assert covered == set(range(n))


def test_unigram_logprob_orders_rare_above_common(spark, tmp_path):
    """q57c semantics on a planted corpus: a doc made of the corpus's
    dominant token scores the LOWEST mean negative log-prob, a doc of
    hapax tokens the highest, and every score lies in (0, ln N]."""
    import math

    from pyspark.sql import Row

    from engine.text import q57c_unigram_logprob

    common = " ".join(["the"] * 50)
    rows = [
        Row(doc_id=0, lang="en", text=common),          # all-dominant doc
        Row(doc_id=1, lang="en", text="the the quark"), # mostly dominant
        Row(doc_id=2, lang="en", text="zeta xylo qoph"),  # all hapax
    ]
    sf_dir = str(tmp_path / "lm")
    spark.createDataFrame(rows).write.parquet(sf_dir + "/documents.parquet")
    out = {r.doc_id: r for r in q57c_unigram_logprob(spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2}
    n_total = 50 + 3 + 3
    for r in out.values():
        assert 0 < r.avg_neg_logprob <= math.log(n_total) + 1e-9
    assert out[0].avg_neg_logprob < out[1].avg_neg_logprob < out[2].avg_neg_logprob
    # exact value for the pure-dominant doc: -ln(52/56)
    assert abs(out[0].avg_neg_logprob - (-math.log(52 / n_total))) < 1e-5
    # hapax doc: every token has count 1 -> -ln(1/56)
    assert abs(out[2].avg_neg_logprob - math.log(n_total)) < 1e-5


def test_incremental_dedup_planted_statuses(spark, tmp_path):
    """q102 on a planted corpus: a batch doc whose canonical form
    exists in history is dup_of_history (even when the batch also
    repeats it); of batch-only duplicates the lowest doc_id is the
    keeper ('new') and later ones are dup_in_batch; unseen content is
    'new'. Canonicalization (lower/trim/squeeze) must apply before
    fingerprinting."""
    from engine.text import q102_incremental_dedup

    rows = [
        # history (doc_id % 3 != 0)
        (1, "Alpha  Beta", "en", "h", 10),
        (2, "gamma", "en", "h", 5),
        # batch (doc_id % 3 == 0)
        (3, "alpha beta", "en", "b", 10),   # canonical dup of history 1
        (6, "delta epsilon", "en", "b", 13),  # new, duplicated by 9
        (9, "Delta  Epsilon ", "en", "b", 14),  # dup_in_batch of 6
        (12, "zeta", "en", "b", 4),          # new
    ]
    sf_dir = str(tmp_path / "incr")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(sf_dir + "/documents.parquet")
    out = {r.doc_id: r.status for r in q102_incremental_dedup(spark, sf_dir).collect()}
    assert out == {
        3: "dup_of_history",
        6: "new",
        9: "dup_in_batch",
        12: "new",
    }


def test_bloom_incremental_dedup_matches_exact(spark, sf_dir, tmp_path):
    """q102b (bloom-prefiltered) must produce EXACTLY q102's answer —
    the bloom has no false negatives by construction, so the
    prefilter is invisible in the output: checked on the fixture and
    on the planted corpus that exercises all three statuses (the
    fixture yields only 'new'). Also pins the derivation law
    (power-of-two bits ≥ 16/key) and the bitmap OR-merge property the
    incremental-maintenance story rests on."""
    from engine.text import (
        BLOOM_MIN_BITS,
        _derive_bloom_bits,
        q102_incremental_dedup,
        q102b_bloom_incremental_dedup,
    )

    exact = sorted(map(tuple, q102_incremental_dedup(spark, sf_dir).collect()))
    bloom = sorted(map(tuple, q102b_bloom_incremental_dedup(spark, sf_dir).collect()))
    assert exact == bloom

    rows = [
        (1, "Alpha  Beta", "en", "h", 10),
        (2, "gamma", "en", "h", 5),
        (3, "alpha beta", "en", "b", 10),
        (6, "delta epsilon", "en", "b", 13),
        (9, "Delta  Epsilon ", "en", "b", 14),
        (12, "zeta", "en", "b", 4),
    ]
    planted = str(tmp_path / "bloom_incr")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(planted + "/documents.parquet")
    out = {r.doc_id: r.status for r in q102b_bloom_incremental_dedup(spark, planted).collect()}
    assert out == {3: "dup_of_history", 6: "new", 9: "dup_in_batch", 12: "new"}

    assert _derive_bloom_bits(1) == BLOOM_MIN_BITS
    assert _derive_bloom_bits(10**6) == 1 << 24  # 16.8M bits ≥ 16e6
    assert _derive_bloom_bits(10**6) & (_derive_bloom_bits(10**6) - 1) == 0

    # OR-merge: membership in (A | B) == membership in A or in B —
    # numpy model of the same bit algebra the fold uses
    import numpy as np

    rng = np.random.RandomState(7)
    bits = BLOOM_MIN_BITS
    pos_a = rng.randint(0, bits, size=64)
    pos_b = rng.randint(0, bits, size=64)
    def _bm(pos):
        m = np.zeros(bits // 8, dtype=np.uint8)
        np.bitwise_or.at(m, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return m
    merged = _bm(pos_a) | _bm(pos_b)
    both = _bm(np.concatenate([pos_a, pos_b]))
    assert np.array_equal(merged, both)


def test_quality_classifier_floor_and_determinism(spark, sf_dir):
    """The hashed-TF logistic model must RECOVER the heuristic weak
    labels on the held-out fold well above chance (measured 0.94-0.95
    across SFs; floor 0.8 — the labels are a deterministic function
    of text, so a working text model should separate them), with both
    classes present in the fold, and be run-to-run deterministic
    (seeded split, fixed LBFGS iteration budget)."""
    from engine.text_ml import ml_quality_classifier

    r1 = ml_quality_classifier(spark, sf_dir).collect()
    n = len(r1)
    assert n > 0
    labels = {r.label for r in r1}
    assert labels == {0, 1}
    acc = sum(r.correct for r in r1) / n
    assert acc >= 0.8, acc
    r2 = ml_quality_classifier(spark, sf_dir).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_bpe_train_planted_merge_sequence(spark, tmp_path):
    """BPE trainer on a planted corpus with a hand-computed merge
    sequence, pinning the three semantics that define subword-nmt
    compatibility: overlapping pairs all COUNT ("aaa" contributes 2
    to (a,a)), merging is greedy left-to-right ("aaa" -> [aa, a], not
    [a, aa]), and newly-merged symbols participate in later rounds
    ((aa, a) merges in round 1)."""
    from engine.text import q103b_bpe_train

    rows = [(i, "aaa", "en", "p", 3) for i in range(5)] + [
        (10 + i, "ab", "en", "p", 2) for i in range(3)
    ]
    sf = str(tmp_path / "bpe")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(sf + "/documents.parquet")
    got = [
        (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in q103b_bpe_train(spark, sf).collect()
    ]
    assert got == [
        (0, "a", "a", "aa", 10),   # 2 overlapping (a,a) per "aaa" x5
        (1, "aa", "a", "aaa", 5),  # greedy left-to-right left [aa, a]
        (2, "a", "b", "ab", 3),
    ]


def test_bpe_train_matches_pair_census_and_decreases(spark, sf_dir):
    """On the fixture corpus: round-0's learned rule IS q103's top
    census pair (same statistic, independently computed paths), and
    pair counts are non-increasing in rank (each merge can only
    remove occurrences of existing pairs; a created pair (x, a+b)
    inherits at most count(x, a))."""
    from engine.text import q103_bpe_pair_census, q103b_bpe_train

    merges = q103b_bpe_train(spark, sf_dir).orderBy("rank").collect()
    assert len(merges) >= 3
    top = q103_bpe_pair_census(spark, sf_dir).limit(1).collect()[0]
    assert (merges[0].left_sym, merges[0].right_sym, merges[0].pair_count) == (
        top.left_sym,
        top.right_sym,
        top.pair_count,
    )
    counts = [m.pair_count for m in merges]
    assert counts == sorted(counts, reverse=True)
    assert all(m.merged == m.left_sym + m.right_sym for m in merges)
    assert [m.rank for m in merges] == list(range(len(merges)))


def test_temperature_mixture_flattens_and_binds(spark, sf_dir):
    """q104 invariants: (1) sampling rates never exceed 1 (no
    oversampling — UniMax's defining constraint) and the budget-
    binding language sits at rate ~1; (2) sqrt-flattening moves the
    head language's target share BELOW its raw share and the tail
    language's ABOVE it; (3) selections are subsets."""
    from engine.session import table
    from engine.text import q104_temperature_mixture

    rows = q104_temperature_mixture(spark, sf_dir).collect()
    assert all(0 <= r.rate_ppm <= 1_000_000 for r in rows)
    assert max(r.rate_ppm for r in rows) >= 999_999  # binding lang at ~1.0
    n_tot = sum(r.n_tokens_before for r in rows)
    shares = {r.lang: r.n_tokens_before / n_tot for r in rows}
    head = max(rows, key=lambda r: r.n_tokens_before)
    tail = min(rows, key=lambda r: r.n_tokens_before)
    if head.n_tokens_before != tail.n_tokens_before:
        assert head.p_target < shares[head.lang]
        assert tail.p_target > shares[tail.lang]
    for r in rows:
        assert 0 <= r.docs_selected
        assert 0 <= r.tokens_selected <= r.n_tokens_before


def test_bpe_merge_fold_matches_reference_impl(spark):
    """The JVM aggregate()-fold merge (_merge_pair) against a plain-
    Python reference implementation of subword-nmt's merge step, over
    randomized symbol sequences INCLUDING multi-char symbols and
    pathological overlap runs — all evaluated in one DataFrame pass."""
    import random

    from engine.text import _merge_pair

    def ref_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    rng = random.Random(42)
    alphabet = ["a", "b", "c", "aa", "ab", "ba"]
    cases = []
    for i in range(60):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        a, b = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((i, syms, a, b, ref_merge(syms, a, b)))
    # pathological overlap runs
    cases.append((60, ["a"] * 7, "a", "a", ref_merge(["a"] * 7, "a", "a")))
    cases.append((61, ["aa", "a", "a", "aa"], "aa", "a", ref_merge(["aa", "a", "a", "aa"], "aa", "a")))
    df = spark.createDataFrame(
        [(i, s, a, b) for i, s, a, b, _ in cases],
        "i int, syms array<string>, a string, b string",
    )
    # one pass: group rows by (a, b) pair so each distinct pair gets
    # one _merge_pair expression
    by_pair: dict[tuple, list] = {}
    for i, s, a, b, want in cases:
        by_pair.setdefault((a, b), []).append((i, want))
    import pyspark.sql.functions as F

    got: dict[int, list] = {}
    for (a, b), members in by_pair.items():
        ids = [i for i, _ in members]
        rows = (
            df.filter(F.col("i").isin(ids))
            .select("i", _merge_pair(F.col("syms"), a, b).alias("m"))
            .collect()
        )
        got.update({r.i: list(r.m) for r in rows})
    for i, _, a, b, want in cases:
        assert got[i] == want, (i, a, b, got[i], want)


def test_bpe_tokenize_invariants(spark, sf_dir):
    """q103c: every doc satisfies ws_tokens <= bpe_tokens <= non-space
    chars; token counts are non-increasing in the number of applied
    merges; zero merges degenerate to character count."""
    import pyspark.sql.functions as F

    from engine.session import table
    from engine.text import q103c_bpe_tokenize

    full = {r.doc_id: r for r in q103c_bpe_tokenize(spark, sf_dir).collect()}
    none = {r.doc_id: r for r in q103c_bpe_tokenize(spark, sf_dir, n_merges=0).collect()}
    chars = {
        r.doc_id: r.n
        for r in table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.length(F.regexp_replace(F.trim(F.col("text")), " +", "")).alias("n"),
        )
        .collect()
    }
    assert full.keys() == none.keys()
    for doc_id, r in full.items():
        assert r.ws_tokens <= r.bpe_tokens <= chars[doc_id]
        assert r.bpe_tokens <= none[doc_id].bpe_tokens  # merges only shrink
        assert none[doc_id].bpe_tokens == chars[doc_id]  # 0 merges = chars


def test_leakage_safe_split_clusters_move_together(spark, tmp_path, sf_dir):
    """q106's defining property: near-duplicate documents land in the
    SAME split even when their own ids would hash to different splits
    (that is exactly the train/test leakage a per-doc split causes).
    Planted corpus: three exact-duplicate groups with ids chosen far
    apart, plus distinct singletons; every group must be
    split-homogeneous with split_key = min id of the group. On the
    fixture corpus: splits are keyed per component, fractions are
    sane, and q80's clusters are split-homogeneous."""
    import pyspark.sql.functions as F

    from engine.text import q106_leakage_safe_split

    base = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "lorem ipsum dolor sit amet consectetur",
    ]
    rows = []
    for g, txt in enumerate(base):
        for j in range(3):  # ids spread across the hash space
            rows.append((g * 1000 + j * 337 + 1, txt, "en", "p", len(txt)))
    for i in range(40):  # singletons
        rows.append((10_000 + i, f"unique document number {i} with words {i*7}", "en", "p", 30))
    sf = str(tmp_path / "leak")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(sf + "/documents.parquet")
    out = q106_leakage_safe_split(spark, sf).collect()
    by_key: dict = {}
    splits_of_group: dict = {}
    for r in out:
        by_key.setdefault(r.split_key, set()).add(r.split)
    assert all(len(s) == 1 for s in by_key.values())  # key-homogeneous
    for g in range(len(base)):
        ids = {g * 1000 + j * 337 + 1 for j in range(3)}
        recs = [r for r in out if r.doc_id in ids]
        assert len(recs) == 3
        assert len({r.split for r in recs}) == 1, f"group {g} split across sets"
        assert all(r.split_key == min(ids) for r in recs)

    fx = q106_leakage_safe_split(spark, sf_dir).collect()
    n = len(fx)
    frac_train = sum(r.split == "train" for r in fx) / n
    assert 0.6 <= frac_train <= 0.95  # 80% nominal, hash noise + clusters
    assert {r.split for r in fx} <= {"train", "val", "test"}


def test_pmi_collocations_planted(spark, tmp_path):
    """A pair that ALWAYS co-occurs ('new york' — every occurrence of
    either word is in the pair) must out-score a pair of
    independently common words, and the min-count floor must drop
    rare pairs."""
    from engine.text import PMI_MIN_PAIR, q109_pmi_collocations

    filler = "the cat sat on the mat"
    rows = [(i, f"new york {filler}", "en", "p", 30) for i in range(PMI_MIN_PAIR + 2)]
    # 'the mat' / 'the cat' co-occur but 'the' is everywhere → low PMI
    rows += [(100 + i, "rare pair", "en", "p", 9) for i in range(PMI_MIN_PAIR - 1)]
    sf_dir = str(tmp_path / "pmi")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(sf_dir + "/documents.parquet")
    got = q109_pmi_collocations(spark, sf_dir).collect()
    pairs = {(r.w1, r.w2): r.pmi for r in got}
    assert ("new", "york") in pairs
    assert ("rare", "pair") not in pairs  # below the count floor
    assert pairs[("new", "york")] == max(pairs.values())
    the_pairs = [v for (a, b), v in pairs.items() if a == "the" or b == "the"]
    assert all(pairs[("new", "york")] > v for v in the_pairs)


def test_dsir_selection_matches_independent_python(spark, sf_dir):
    """q111's distributed DSIR pipeline must agree with a from-scratch
    single-machine reimplementation (hashlib md5 buckets, python
    Counter censuses, math.log llr grid) on the full ranked top-50 —
    pinning the hash mapping, the smoothing, the llr integer grid, and
    the exact-bigint score accumulation end to end."""
    import hashlib
    import math
    import re
    from collections import Counter

    from engine.text import (
        DSIR_BUCKETS,
        DSIR_TARGET_QUALITY,
        DSIR_TOP,
        q57_quality_score,
        q111_dsir_selection,
    )
    from engine.session import table

    quality = {
        r.doc_id: r.quality for r in q57_quality_score(spark, sf_dir).collect()
    }
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS

    per_doc: dict[int, list[int]] = {}
    is_target: dict[int, bool] = {}
    for r in docs:
        toks = re.split(" +", r.text.strip().lower())
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        per_doc[r.doc_id] = [bucket(g) for g in grams]
        is_target[r.doc_id] = quality[r.doc_id] >= DSIR_TARGET_QUALITY

    ct: Counter = Counter()
    cr: Counter = Counter()
    for did, bs in per_doc.items():
        (ct if is_target[did] else cr).update(bs)
    nt, nr = sum(ct.values()), sum(cr.values())
    llr6 = {
        b: math.floor(
            math.log(
                (ct.get(b, 0) + 1)
                * float(nr + DSIR_BUCKETS)
                / ((c + 1) * float(nt + DSIR_BUCKETS))
            )
            * 1e6
        )
        for b, c in cr.items()
    }
    scored = [
        (did, len(bs), sum(llr6[b] for b in bs))
        for did, bs in per_doc.items()
        if not is_target[did]
    ]
    scored.sort(key=lambda x: (-x[2], x[0]))
    expected = [
        (did, n, s, i + 1) for i, (did, n, s) in enumerate(scored[:DSIR_TOP])
    ]

    got = [
        (r.doc_id, r.n_grams, r.dsir_score, r.rank)
        for r in q111_dsir_selection(spark, sf_dir).collect()
    ]
    assert got == expected


def test_dedup_recall_report_floors_and_consistency(spark, sf_dir):
    """The LSH banding (4 bands x 2 rows) gives a j=0.8 pair collision
    probability 1-(1-0.8^2)^4 ~ 0.98, and the fixture's planted dups
    are higher-sim than that — pin recall >= 0.9 at the top tier, and
    the report's internal arithmetic (missed complement, recall
    quotient, monotone true-pair counts as tiers tighten)."""
    from engine.text import DEDUP_RECALL_TIERS, dedup_recall_report

    rows = {r.threshold: r for r in dedup_recall_report(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(DEDUP_RECALL_TIERS)
    top = rows[max(DEDUP_RECALL_TIERS)]
    assert top.true_pairs > 0
    assert top.recall >= 0.9
    prev_true = None
    for t in sorted(rows):
        r = rows[t]
        assert 0 <= r.recalled <= r.true_pairs
        assert r.missed == r.true_pairs - r.recalled
        assert abs(r.recall - (r.recalled / r.true_pairs)) < 1e-6
        if prev_true is not None:
            assert r.true_pairs <= prev_true  # tighter tier, fewer pairs
        prev_true = r.true_pairs


def test_packing_invariants_report_all_true(spark, sf_dir):
    """packing_invariants_report is q49b's driver-visible invariant
    surface: every bin's capacity_ok / fill_consistent / greedy_tight
    flag must be true, bin totals must account for every document
    token, and a tight budget must actually exercise the multi-bin
    path (otherwise the flags are vacuous)."""
    from engine.session import table
    from engine.text import packing_invariants_report

    rows = packing_invariants_report(spark, sf_dir, window=64).collect()
    assert rows
    assert any(r.bin_id > 0 for r in rows), "budget must force multiple bins"
    assert all(r.capacity_ok for r in rows)
    assert all(r.fill_consistent for r in rows)
    assert all(r.greedy_tight for r in rows)
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents")
    total = d.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), " +"))).alias("t")
    ).collect()[0].t
    assert sum(r.tokens for r in rows) == total
    assert sum(r.docs for r in rows) == d.count()


def test_dedup_recall_sampled_truth_leg_unbiased(spark, sf_dir):
    """r6: the truth leg runs on a content-addressed doc sample above
    DEDUP_RECALL_SAMPLE_MAX_DOCS so the audit's exact self-join scales.
    Forcing the sample at fixture scale (budget = half the corpus) must
    (a) actually shrink the audited population, (b) keep true_pairs > 0
    so the estimate is live, and (c) report recall within ±0.02 of the
    full-truth value per tier — candidate status is independent of the
    sampling hash, so the sampled recall is unbiased."""
    from engine.session import table
    from engine.text import dedup_recall_report

    n_docs = table(spark, sf_dir, "documents").count()
    full = {r.threshold: r for r in dedup_recall_report(spark, sf_dir, sample_max_docs=n_docs).collect()}
    samp = {r.threshold: r for r in dedup_recall_report(spark, sf_dir, sample_max_docs=n_docs // 2).collect()}
    assert all(r.sample_docs == n_docs for r in full.values())
    for t, r in samp.items():
        assert 0 < r.sample_docs < n_docs
        assert r.true_pairs > 0
        assert abs(r.recall - full[t].recall) <= 0.02, (t, r.recall, full[t].recall)
        # cost side stays full-corpus: sampling the audit must not
        # change the candidate count
        assert r.lsh_candidates == full[t].lsh_candidates


def test_source_quota_cap_planted_skew(spark, tmp_path):
    """q115 on a planted skewed corpus: a hot source with 3x the cap
    must keep EXACTLY the cap's best-(quality, doc_id) docs — i.e. the
    two-phase salted top-K must equal the single-window answer — while
    a small source keeps everything with contiguous ranks."""
    from engine.text import SOURCE_CAP, q115_source_quota_cap, q57_quality_score

    rows = []
    # hot source: 3*CAP docs of graded quality (longer text => higher
    # length term), small source: 3 docs
    for i in range(3 * SOURCE_CAP):
        rows.append((i, " ".join(f"tok{j}" for j in range(i + 2)), "en", "hot", 10))
    for i in range(3):
        rows.append((1000 + i, "alpha beta gamma", "en", "small", 10))
    # tie source: 2*CAP byte-identical docs => identical quality; the
    # doc_id tie-break must hold ACROSS phase-1 shards (keeper = the
    # CAP lowest ids, whatever shard they hashed to)
    for i in range(2 * SOURCE_CAP):
        rows.append((2000 + i, "same text every time", "en", "ties", 10))
    d = str(tmp_path / "quota")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")

    out = q115_source_quota_cap(spark, d).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src["hot"]) == SOURCE_CAP
    assert len(by_src["small"]) == 3
    assert [r.doc_id for r in sorted(by_src["ties"], key=lambda r: r.src_rank)] == [
        2000 + i for i in range(SOURCE_CAP)
    ]
    # single-window expected answer from the independently computed
    # q57 quality (the two-phase shards must not change membership)
    q = {r.doc_id: r.quality for r in q57_quality_score(spark, d).collect()}
    hot_ids = [i for i, *_ in rows if i < 1000]
    expected = sorted(hot_ids, key=lambda i: (-q[i], i))[:SOURCE_CAP]
    got = [r.doc_id for r in sorted(by_src["hot"], key=lambda r: r.src_rank)]
    assert got == expected
    for src, rs in by_src.items():
        assert sorted(r.src_rank for r in rs) == list(range(1, len(rs) + 1))
        qs = [r.quality for r in sorted(rs, key=lambda r: r.src_rank)]
        assert qs == sorted(qs, reverse=True)


def test_bm25_matches_independent_python(spark, sf_dir):
    """q116's distributed BM25 must agree with a from-scratch python
    implementation (Counter tf/df, math.log idf, per-term 1e-6 floor
    grid, exact integer accumulation) on the full ranked top-k of
    every query — pinning tokenization, the Okapi formula, the
    truncation grid, and the (score, doc_id) ranking end to end."""
    import math
    import re
    from collections import Counter

    from engine.session import table
    from engine.text import BM25_B, BM25_K1, BM25_QUERY_TERMS, BM25_TOPK, q116_bm25_topk

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: re.split(" +", r.text.strip().lower()) for r in docs}
    n_docs = len(docs)
    total = sum(len(t) for t in toks.values())
    all_terms = {t for ts in BM25_QUERY_TERMS.values() for t in ts}
    tf = {d: Counter(t for t in ts if t in all_terms) for d, ts in toks.items()}
    df = Counter(t for d in tf.values() for t in d)

    expected = []
    for qid, terms in sorted(BM25_QUERY_TERMS.items()):
        scored = []
        for d, ts in toks.items():
            s = 0
            for t in terms:
                f = tf[d].get(t, 0)
                if not f:
                    continue
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                norm = (f * (BM25_K1 + 1.0)) / (
                    f + BM25_K1 * (1.0 - BM25_B + BM25_B * (len(ts) * n_docs / total))
                )
                s += math.floor(idf * norm * 1e6)
            if s:
                scored.append((-s, d))
        scored.sort()
        for rank, (neg, d) in enumerate(scored[:BM25_TOPK], 1):
            expected.append((qid, rank, d, -neg / 1e6))

    got = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in q116_bm25_topk(spark, sf_dir).collect()
    ]
    assert got == expected


def test_weighted_sample_matches_independent_python(spark, sf_dir):
    """q117's distributed A-ES sample must agree with a from-scratch
    python implementation (hashlib md5 uniforms, math.log keys, 1e-6
    floor grid, top-N by (key, doc_id)) on the full ranked sample —
    and the sample must be duplicate-free and quality-tilted (the
    whole point of weighting: sample mean quality > corpus mean)."""
    import hashlib
    import math

    from engine.session import table
    from engine.text import WEIGHTED_SAMPLE_N, q117_weighted_sample, q57_quality_score

    quality = {r.doc_id: r.quality for r in q57_quality_score(spark, sf_dir).collect()}
    keyed = []
    for d, w in quality.items():
        h = int(hashlib.md5(f"wsample:{d}".encode()).hexdigest()[:15], 16)
        u = (h % 1000000 + 1) / 1000001.0
        keyed.append((-math.floor(math.log(u) / w * 1e6), d))
    keyed.sort()
    expected = [(r + 1, d, -neg) for r, (neg, d) in enumerate(keyed[:WEIGHTED_SAMPLE_N])]

    out = q117_weighted_sample(spark, sf_dir).collect()
    got = [(r.rank, r.doc_id, r.key_1e6) for r in out]
    assert got == expected
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids)) == min(WEIGHTED_SAMPLE_N, len(quality))
    sample_mean = sum(quality[i] for i in ids) / len(ids)
    corpus_mean = sum(quality.values()) / len(quality)
    assert sample_mean > corpus_mean


def test_incremental_neardup_planted_statuses(spark, tmp_path):
    """q118 on a planted split (batch = doc_id % 3 == 0): an exact
    near-dup of a history doc labels near_dup_of_history with the
    history doc as evidence; two batch twins label the LATER one
    near_dup_in_batch (keep-first); a unique doc and a sub-shingle
    doc are new; history docs get no row at all."""
    from engine.text import q118_incremental_neardup

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten eleven"
    rows = [
        (1, t1, "en", "src0", len(t1)),     # history original
        (0, t1, "en", "src0", len(t1)),     # batch: dup of history
        (3, t2, "en", "src0", len(t2)),     # batch: first of a twin pair
        (6, t2, "en", "src0", len(t2)),     # batch: later twin -> in-batch
        (9, "a b", "en", "src0", 3),        # batch: sub-shingle -> new
        (12, "totally different words here entirely unrelated content stream", "en", "src0", 10),
        (2, "history only content that matches nothing in the batch at all", "en", "src0", 10),
    ]
    d = str(tmp_path / "incr_neardup")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in q118_incremental_neardup(spark, d).collect()}
    assert set(out) == {0, 3, 6, 9, 12}  # batch docs only
    assert out[0].status == "near_dup_of_history" and out[0].match_id == 1
    assert out[3].status == "new" and out[3].match_id is None
    assert out[6].status == "near_dup_in_batch" and out[6].match_id == 3
    assert out[9].status == "new"
    assert out[12].status == "new"


def test_q118_band_cap_bounds_hot_band(spark):
    """The r6 verdict's watch item, planted: a boilerplate batch where
    hundreds of near-identical docs share one band key. Uncapped, the
    within-batch self-join would generate O(B²) pairs; the capped
    candidate generator must emit exactly min(i, cap) candidates for
    the i-th doc of the band — linear in B — while keep-first
    evidence (the band's earliest doc) survives for every doc."""
    from pyspark.sql import functions as F

    from engine.text import NEARDUP_BAND_CAP, _batch_band_candidates

    n = 300  # > 4 * cap: the quadratic regime if the cap were absent
    sig = [11, 22, 33, 44, 55, 66, 77, 88]
    batch = spark.createDataFrame(
        [(i, sig, 42) for i in range(n)], "doc_id bigint, sig array<bigint>, band_key bigint"
    )
    cands = _batch_band_candidates(batch)
    expected = sum(min(i, NEARDUP_BAND_CAP) for i in range(n))
    assert cands.count() == expected < n * (n - 1) // 2
    # every doc past position 0 still has the band's earliest doc
    # (keep-first's reported evidence) among its candidates
    firsts = cands.groupBy("doc_id").agg(F.min("match_id").alias("m"))
    assert firsts.filter("m != 0").count() == 0
    assert firsts.count() == n - 1


def test_q118_band_cap_never_binds_on_fixture(spark, sf_dir):
    """The cap is a no-op at fixture scale — the largest within-batch
    band group sits far below NEARDUP_BAND_CAP, so q118's contract
    output (and its un-mirrored oracle) cannot depend on the bound."""
    from pyspark.sql import functions as F

    from engine.text import INCR_BATCH_MOD, NEARDUP_BAND_CAP, _banded_signatures
    from engine.session import table

    batch = _banded_signatures(table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % INCR_BATCH_MOD == 0
    )
    biggest = (
        batch.groupBy("band_key").count().agg(F.max("count").alias("m")).collect()[0].m
    )
    assert biggest < NEARDUP_BAND_CAP


def test_q118_history_store_probe_elides_history_shuffle(spark, sf_dir):
    """Pins the SCALING.md claim as a plan shape (r6 verdict item 3):
    with the standing (band_key, doc_id, sig) store persisted bucketed
    on band_key, the ingest probe join reads the store co-located —
    the ONLY exchange under the join is the batch side's. At 100 TB
    this is the difference between shuffling a TB-scale batch and
    shuffling the standing corpus every day."""
    from pyspark.sql import functions as F

    from engine.io import write_bucketed
    from engine.session import table
    from engine.text import INCR_BATCH_MOD, _banded_signatures

    bands = _banded_signatures(table(spark, sf_dir, "documents"))
    hist = bands.filter(F.col("doc_id") % INCR_BATCH_MOD != 0)
    spark.sql("DROP TABLE IF EXISTS q118_hist_store")
    write_bucketed(hist, "q118_hist_store", "band_key", 8)

    store = spark.table("q118_hist_store")
    batch = bands.filter(F.col("doc_id") % INCR_BATCH_MOD == 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = batch.alias("n").join(store.alias("h"), "band_key")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # bucketed scan active on the history side...
        assert "SelectedBucketsCount" in plan
        # ...and the join sees exactly ONE band_key exchange: the
        # batch side's. A history-side shuffle would make it two.
        assert plan.count("Exchange hashpartitioning(band_key") == 1
        assert probe.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS q118_hist_store")


def test_context_budget_report_exact_recount(spark, sf_dir):
    """q119's per-window counts must equal an exact python recount of
    the fixture (same whitespace tokenization, ceil-div windows,
    integer-ppm utilization)."""
    from engine.session import table
    from engine.text import CONTEXT_LENGTHS, q119_context_budget_report

    texts = [r.text for r in table(spark, sf_dir, "documents").select("text").collect()]
    toks = [len(t.strip().split()) if t.strip() else 1 for t in texts]
    got = {r.context_len: r for r in q119_context_budget_report(spark, sf_dir).collect()}
    assert sorted(got) == sorted(CONTEXT_LENGTHS)
    for L in CONTEXT_LENGTHS:
        windows = sum((n + L - 1) // L for n in toks)
        r = got[L]
        assert r.n_docs == len(toks)
        assert r.docs_fit == sum(1 for n in toks if n <= L)
        assert r.docs_split == sum(1 for n in toks if n > L)
        assert r.windows == windows
        assert r.total_tokens == sum(toks)
        assert r.utilization_ppm == (sum(toks) * 1_000_000) // (windows * L)


def test_q120_budget_selection_exact_recount(spark, sf_dir):
    """q120's selection must equal the python greedy recount: docs in
    (quality_1e6 DESC, doc_id) order, kept while the inclusive token
    total fits budget = total·BUDGET_PPM div 1e6 — the crossing doc is
    dropped, never split, and every kept doc's rank/cum is global."""
    from engine.session import table
    from engine.text import BUDGET_PPM, q120_budget_selection

    rows = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    docs = []
    for r in rows:
        toks = [t for t in r.text.strip().split() if t] or [""]
        n_tok = len(toks)
        n_dis = len(set(toks))
        mean_len = sum(len(t) for t in toks) / n_tok
        raw = 0.4 * min(n_tok / 100.0, 1.0) + 0.3 * (n_dis / n_tok) + 0.3 * min(mean_len / 10.0, 1.0)
        import math

        docs.append((math.floor(raw * 1e6), r.doc_id, n_tok))
    total = sum(n for _, _, n in docs)
    budget = total * BUDGET_PPM // 1_000_000
    docs.sort(key=lambda t: (-t[0], t[1]))
    expected, cum = [], 0
    for rank, (q1e6, doc_id, n_tok) in enumerate(docs, 1):
        cum += n_tok
        if cum <= budget:
            expected.append((rank, doc_id, q1e6, n_tok, cum))
    got = [
        (r.sel_rank, r.doc_id, r.quality_1e6, r.n_tokens, r.cum_tokens)
        for r in q120_budget_selection(spark, sf_dir).collect()
    ]
    assert got == expected
    assert got, "budget selects nothing at fixture scale — recount broken"


def test_q120_empty_corpus_selects_nothing(spark, tmp_path):
    from engine.text import q120_budget_selection

    d = str(tmp_path / "q120_empty")
    spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    assert q120_budget_selection(spark, d).count() == 0


def test_q121_source_diversity_exact_recount(spark, sf_dir):
    """Simpson/effective-source numbers are pure bigint arithmetic —
    recount exactly, and pin the monoculture invariant (one source ⇒
    simpson 1e6, effective exactly 1.000)."""
    from collections import Counter

    from engine.session import table
    from engine.text import q121_source_diversity_report

    pairs = Counter(
        (r.lang, r.source)
        for r in table(spark, sf_dir, "documents").select("lang", "source").collect()
    )
    by_lang: dict = {}
    for (lang, _), c in pairs.items():
        n, k, sq = by_lang.get(lang, (0, 0, 0))
        by_lang[lang] = (n + c, k + 1, sq + c * c)
    expected = sorted(
        (lang, n, k, sq * 1_000_000 // (n * n), n * n * 1000 // sq)
        for lang, (n, k, sq) in by_lang.items()
    )
    got = [
        (r.lang, r.n_docs, r.n_sources, r.simpson_ppm, r.eff_sources_1e3)
        for r in q121_source_diversity_report(spark, sf_dir).collect()
    ]
    assert got == expected


def test_q121_monoculture_effective_sources_is_one(spark, tmp_path):
    from engine.text import q121_source_diversity_report

    rows = [(i, f"doc {i}", "en", "only-src", 5) for i in range(7)]
    d = str(tmp_path / "q121_mono")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = q121_source_diversity_report(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_sources, r.simpson_ppm, r.eff_sources_1e3) == (1, 1_000_000, 1000)


def test_q122_token_entropy_exact_recount(spark, sf_dir):
    """The fold's grid entropy must equal an independent Python
    recount (Counter per doc, same floor-grid formula) on every
    fixture doc — run-length counting, the numerator sum, and the
    integer division all re-derived from scratch."""
    import math
    from collections import Counter

    from engine.session import table
    from engine.text import ENTROPY_MIN_1E6, q122_token_entropy

    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    got = {r.doc_id: r for r in q122_token_entropy(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        toks = text.strip().split()
        toks = toks if toks else [""]
        c = Counter(toks)
        n = sum(c.values())
        acc = sum(math.floor(v * math.log(v) * 1e6) for v in c.values())
        ent = math.floor(math.log(n) * 1e6) - acc // n
        r = got[doc_id]
        assert (r.n_tokens, r.n_distinct, r.entropy_1e6) == (n, len(c), ent), doc_id
        assert r.low_entropy == (ent < ENTROPY_MIN_1E6)


def test_q122_entropy_planted_semantics(spark, tmp_path):
    """Planted docs pin the semantics: a one-token doc and a
    constant-token doc have entropy exactly 0 (flagged), a uniform
    k-distinct doc has entropy ~ln(k) (grid), and repetition LOWERS
    entropy at equal length — the signal q57's length term misses."""
    import math

    from engine.text import ENTROPY_MIN_1E6, q122_token_entropy

    rows = [
        (0, "lonely", "en", "s", 6),                      # 1 token -> 0
        (1, " ".join(["buy"] * 400), "en", "s", 1600),    # spam -> 0
        (2, " ".join(f"w{i}" for i in range(64)), "en", "s", 256),  # uniform
        (3, " ".join(f"w{i % 8}" for i in range(64)), "en", "s", 256),  # 8 tokens cycled
    ]
    d = str(tmp_path / "q122")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in q122_token_entropy(spark, d).collect()}
    assert out[0].entropy_1e6 == 0 and out[0].low_entropy
    assert out[1].entropy_1e6 == 0 and out[1].low_entropy
    # uniform 64-distinct: ln(64) on the grid, never flagged
    assert abs(out[2].entropy_1e6 - math.floor(math.log(64) * 1e6)) <= 1
    assert not out[2].low_entropy
    # same length, 8 distinct cycled: exactly ln(8) (uniform runs of 8)
    assert abs(out[3].entropy_1e6 - math.floor(math.log(8) * 1e6)) <= 1
    assert out[3].entropy_1e6 < out[2].entropy_1e6
    assert (out[3].entropy_1e6 < ENTROPY_MIN_1E6) == out[3].low_entropy


def test_hybrid_rrf_matches_independent_python(spark, sf_dir):
    """q124 against a from-scratch python implementation of BOTH legs
    and the fusion: Counter tf/df/cf, the Okapi and Dirichlet-QL
    formulas on the 1e-6 floor grid, per-leg (score, doc_id) pools of
    RRF_POOL, and integer 1e9//(K+rank) fusion — the whole pipeline
    re-derived independently."""
    import math
    import re
    from collections import Counter

    from engine.session import table
    from engine.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERY_TERMS,
        BM25_TOPK,
        QL_MU,
        RRF_K,
        RRF_POOL,
        q124_hybrid_rrf,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: re.split(" +", r.text.strip().lower()) for r in docs}
    n_docs = len(docs)
    total = sum(len(t) for t in toks.values())
    all_terms = {t for ts in BM25_QUERY_TERMS.values() for t in ts}
    tf = {d: Counter(t for t in ts if t in all_terms) for d, ts in toks.items()}
    df = Counter(t for d in tf.values() for t in d)
    cf = Counter()
    for d in tf.values():
        cf.update(d)

    def bm25_leg(qid, terms):
        scored = []
        for d, ts in toks.items():
            s = 0
            hit = False
            for t in terms:
                f = tf[d].get(t, 0)
                if not f:
                    continue
                hit = True
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                norm = (f * (BM25_K1 + 1.0)) / (
                    f + BM25_K1 * (1.0 - BM25_B + BM25_B * (len(ts) * n_docs / total))
                )
                s += math.floor(idf * norm * 1e6)
            if hit:
                scored.append((-s, d))
        scored.sort()
        return [d for _, d in scored[:RRF_POOL]]

    def ql_leg(qid, terms):
        scored = []
        for d, ts in toks.items():
            s = 0
            hit = False
            for t in terms:
                f = tf[d].get(t, 0)
                if not f:
                    continue
                hit = True
                s += math.floor(math.log(1.0 + f / (QL_MU * cf[t] / total)) * 1e6)
            if hit:
                s += len(terms) * math.floor(math.log(QL_MU / (len(ts) + QL_MU)) * 1e6)
                scored.append((-s, d))
        scored.sort()
        return [d for _, d in scored[:RRF_POOL]]

    expected = []
    for qid, terms in sorted(BM25_QUERY_TERMS.items()):
        legs = {"bm25": bm25_leg(qid, terms), "ql": ql_leg(qid, terms)}
        fused: dict = {}
        for leg, pool in legs.items():
            for r, d in enumerate(pool, 1):
                e = fused.setdefault(d, {"score": 0, "legs": 0, "bm25": None, "ql": None})
                e["score"] += 1_000_000_000 // (RRF_K + r)
                e["legs"] += 1
                e[leg] = r
        ranked = sorted(fused.items(), key=lambda kv: (-kv[1]["score"], kv[0]))
        for rank, (d, e) in enumerate(ranked[:BM25_TOPK], 1):
            expected.append((qid, rank, d, e["score"], e["legs"], e["bm25"], e["ql"]))

    got = [
        (r.query_id, r.rank, r.doc_id, r.rrf_score, r.n_legs, r.bm25_rank, r.ql_rank)
        for r in q124_hybrid_rrf(spark, sf_dir).collect()
    ]
    assert got == expected


def test_hybrid_rrf_bm25_leg_consistent_with_q116(spark, sf_dir):
    """The fused frame's bm25_rank must agree with q116's own ranking
    wherever both emit a row — the factored _retrieval_frames helper
    did not fork the leg's semantics."""
    from engine.text import q116_bm25_topk, q124_hybrid_rrf

    q116_ranks = {
        (r.query_id, r.doc_id): r.rank for r in q116_bm25_topk(spark, sf_dir).collect()
    }
    for r in q124_hybrid_rrf(spark, sf_dir).collect():
        if (r.query_id, r.doc_id) in q116_ranks:
            assert r.bm25_rank == q116_ranks[(r.query_id, r.doc_id)], r
        assert r.n_legs in (1, 2)
        assert (r.bm25_rank is not None) + (r.ql_rank is not None) == r.n_legs


def test_q125_mad_matches_independent_python(spark, sf_dir):
    """q125's census-based doubled-unit medians and outlier census
    must equal a from-scratch python recount (statistics-free: sorted
    lists, explicit low/high middles) per language."""
    from collections import defaultdict

    from engine.session import table
    from engine.text import MAD_K, q125_length_outliers

    by_lang = defaultdict(list)
    for r in table(spark, sf_dir, "documents").select("lang", "text").collect():
        toks = r.text.strip().split()
        by_lang[r.lang].append(len(toks) if toks else 1)

    def med2(vals):
        s = sorted(vals)
        n = len(s)
        return s[(n + 1) // 2 - 1] + s[n // 2]

    expected = []
    for lang in sorted(by_lang):
        vs = by_lang[lang]
        m2 = med2(vs)
        devs = [abs(2 * v - m2) for v in vs]
        mad2 = med2(devs)
        n_out = sum(1 for d in devs if d > MAD_K * mad2)
        expected.append(
            (lang, len(vs), m2, mad2, max(devs), n_out, n_out * 1_000_000 // len(vs))
        )
    got = [
        (r.lang, r.n_docs, r.med2_tokens, r.mad2_tokens, r.max_dev2, r.n_outliers,
         r.outlier_ppm)
        for r in q125_length_outliers(spark, sf_dir).collect()
    ]
    assert got == expected


def test_q125_planted_outliers_fire(spark, tmp_path):
    """A planted 10000-token doc in a tight 50-token population must
    be the language's single outlier; a single-doc language and an
    all-identical-length language (MAD 0: every deviation > 0 flags)
    exercise the degenerate medians."""
    rows = []
    for i in range(20):
        rows.append((i, " ".join(["w"] * (50 + (i % 5))), "en", "s", 100))
    rows.append((20, " ".join(["w"] * 10000), "en", "s", 20000))  # the outlier
    rows.append((21, " ".join(["w"] * 7), "solo", "s", 14))       # 1-doc lang
    for i in range(22, 26):
        rows.append((i, " ".join(["w"] * 30), "const", "s", 60))  # MAD 0
    rows.append((26, " ".join(["w"] * 31), "const", "s", 62))     # dev 2 > 3*0

    from engine.text import q125_length_outliers

    d = str(tmp_path / "q125")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = {r.lang: r for r in q125_length_outliers(spark, d).collect()}
    en = out["en"]
    assert en.n_outliers == 1 and en.n_docs == 21
    assert en.max_dev2 == abs(2 * 10000 - en.med2_tokens)
    solo = out["solo"]
    assert (solo.n_docs, solo.med2_tokens, solo.mad2_tokens, solo.n_outliers) == (1, 14, 0, 0)
    const = out["const"]  # median 30, MAD 0 -> the 31-token doc flags
    assert const.mad2_tokens == 0 and const.n_outliers == 1


def test_q126_vocab_drift_matches_independent_python(spark, sf_dir):
    """q126 against a from-scratch python recount: both snapshot
    censuses, ppm arithmetic, the |shift| ranking, and the novelty
    summary columns."""
    from collections import Counter

    from engine.session import table
    from engine.text import VOCAB_SNAP_MOD, VOCAB_TOPK, q126_vocab_drift

    a, b = Counter(), Counter()
    for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect():
        toks = r.text.strip().lower().split()
        toks = toks if toks else [""]
        (b if r.doc_id % VOCAB_SNAP_MOD == 0 else a).update(toks)
    a_toks, b_toks = sum(a.values()), sum(b.values())
    vocab = set(a) | set(b)
    novel = {t for t in b if t not in a}
    novel_ppm = len(novel) * 1_000_000 // len(set(b)) if b else 0
    rows = []
    for t in vocab:
        ap = a[t] * 1_000_000 // a_toks if a_toks else 0
        bp = b[t] * 1_000_000 // b_toks if b_toks else 0
        rows.append((t, a[t], b[t], ap, bp, bp - ap))
    rows.sort(key=lambda r: (-abs(r[5]), r[0]))
    expected = [
        (i + 1, t, ac, bc, ap, bp, sh, ac == 0, len(novel), novel_ppm)
        for i, (t, ac, bc, ap, bp, sh) in enumerate(rows[:VOCAB_TOPK])
    ]
    got = [
        (r.rank, r.tok, r.a_count, r.b_count, r.a_ppm, r.b_ppm, r.shift_ppm,
         r.is_novel, r.n_novel_types, r.novel_ppm)
        for r in q126_vocab_drift(spark, sf_dir).collect()
    ]
    assert got == expected


def test_q126_planted_novelty_and_empty_snapshot(spark, tmp_path):
    """A token appearing ONLY in snapshot B must rank with is_novel
    and be counted in the novelty summary; a corpus that lands
    entirely in one snapshot must report (not crash on) the empty
    other side — ppm against an empty snapshot is defined 0."""
    from engine.text import q126_vocab_drift

    rows = [
        (0, "spamcoin spamcoin spamcoin", "en", "s", 26),  # doc 0 -> B
        (1, "alpha beta gamma", "en", "s", 16),            # A
        (2, "alpha beta delta", "en", "s", 16),            # A
        (3, "alpha spamcoin", "en", "s", 14),              # B
    ]
    d = str(tmp_path / "q126")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = {r.tok: r for r in q126_vocab_drift(spark, d).collect()}
    assert out["spamcoin"].is_novel and out["spamcoin"].b_count == 4
    assert out["spamcoin"].a_ppm == 0
    assert all(r.n_novel_types == 1 for r in out.values())
    assert not out["alpha"].is_novel

    # all docs in snapshot B (single doc_id 0): A side empty
    d2 = str(tmp_path / "q126b")
    spark.createDataFrame(
        [(0, "x y z", "en", "s", 5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(d2 + "/documents.parquet")
    out2 = q126_vocab_drift(spark, d2).collect()
    assert len(out2) == 3
    assert all(r.a_ppm == 0 and r.is_novel for r in out2)
    assert all(r.novel_ppm == 1_000_000 for r in out2)


def test_q127_stratified_sample_matches_python_and_q117_keys(spark, sf_dir):
    """q127's per-language top-K must equal the python A-ES recount
    per language (same md5 uniform, same grid key), and its keys must
    agree with q117's global keys on shared docs (one key law, two
    cuts)."""
    import hashlib
    import math

    from engine.session import table
    from engine.text import STRAT_SAMPLE_K, q117_weighted_sample, q127_stratified_sample

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()

    def quality(text):
        toks = text.strip().split()
        toks = toks if toks else [""]
        n = len(toks)
        mean_len = len("".join(toks)) / n
        raw = (0.4 * min(n / 100.0, 1.0) + 0.3 * (len(set(toks)) / n)
               + 0.3 * min(mean_len / 10.0, 1.0))
        return math.floor(raw * 1e6) / 1e6

    def key(doc_id, q):
        h = int(hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:15], 16)
        u = (h % 1000000 + 1) / 1000001.0
        return math.floor(math.log(u) / q * 1e6)

    by_lang: dict = {}
    keys = {}
    for r in docs:
        k = key(r.doc_id, quality(r.text))
        keys[r.doc_id] = k
        by_lang.setdefault(r.lang, []).append((-k, r.doc_id))
    expected = []
    for lang in sorted(by_lang):
        for i, (nk, did) in enumerate(sorted(by_lang[lang])[:STRAT_SAMPLE_K], 1):
            expected.append((lang, i, did, -nk))
    got = [
        (r.lang, r.rank, r.doc_id, r.key_1e6)
        for r in q127_stratified_sample(spark, sf_dir).collect()
    ]
    assert got == expected
    # key law shared with q117: same doc -> same key
    for r in q117_weighted_sample(spark, sf_dir).collect():
        assert keys[r.doc_id] == r.key_1e6


def test_q128_bigram_lm_matches_independent_python(spark, sf_dir):
    """q128 against a from-scratch python bigram LM: censuses via
    Counters, the interpolated probability, the per-position 1e-6
    floor grid, and the integer mean — the whole train+apply pipeline
    re-derived."""
    import math
    from collections import Counter

    from engine.session import table
    from engine.text import LM_LAMBDA, q128_bigram_logprob

    docs = {}
    for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect():
        toks = r.text.strip().lower().split()
        docs[r.doc_id] = toks if toks else [""]
    uni, bi = Counter(), Counter()
    for toks in docs.values():
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    total = sum(uni.values())
    ctx = Counter()
    for (w1, _), c in bi.items():
        ctx[w1] += c
    got = {r.doc_id: r for r in q128_bigram_logprob(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for doc_id, toks in docs.items():
        pairs = list(zip(toks, toks[1:]))
        s = sum(
            math.floor(
                -math.log(
                    LM_LAMBDA * (bi[p] / ctx[p[0]])
                    + (1.0 - LM_LAMBDA) * (uni[p[1]] / total)
                )
                * 1e6
            )
            for p in pairs
        )
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_bigrams == len(pairs)
        assert r.too_short == (len(toks) < 2)
        assert r.nll_mean_1e6 == (s // len(pairs) if pairs else 0), doc_id


def test_q128_context_separates_scrambled_from_real(spark, tmp_path):
    """The bigram signal q57c cannot produce: two docs with IDENTICAL
    unigram distributions — one in the corpus's dominant word order,
    one scrambled — must score differently, the in-order doc better
    (lower mean NLL). A 1-token doc is too_short with score 0."""
    from engine.text import q128_bigram_logprob

    ordered = "the cat sat on the mat " * 10
    rows = [(i, ordered.strip(), "en", "s", len(ordered)) for i in range(8)]
    rows.append((8, ("cat the on sat mat the " * 10).strip(), "en", "s", 120))
    rows.append((9, "solo", "en", "s", 4))
    d = str(tmp_path / "q128")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in q128_bigram_logprob(spark, d).collect()}
    assert out[0].nll_mean_1e6 < out[8].nll_mean_1e6  # order matters
    assert out[9].too_short and out[9].nll_mean_1e6 == 0


def test_q129_defense_verdicts_consistent_with_members(spark, sf_dir):
    """q129 must agree row-by-row with its members: q48's verdict on
    every shingled doc, q105's on every scored vector, clean defaults
    elsewhere, and contaminated_any = the OR."""
    from engine.session import table
    from engine.similarity import q105_semantic_decontamination
    from engine.text import q48_decontaminate, q129_decontamination_defense

    ng = {r.doc_id: r for r in q48_decontaminate(spark, sf_dir).collect()}
    sem = {r.vec_id: r for r in q105_semantic_decontamination(spark, sf_dir).collect()}
    all_ids = {
        r.doc_id for r in table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    out = {r.doc_id: r for r in q129_decontamination_defense(spark, sf_dir).collect()}
    assert set(out) == all_ids
    for doc_id, r in out.items():
        n = ng.get(doc_id)
        s = sem.get(doc_id)
        assert r.ngram_hits == (n.n_hits if n else 0)
        assert r.ngram_contaminated == (n.contaminated if n else False)
        assert r.semantic_scored == (s is not None)
        assert r.semantic_hits == (s.n_hits if s else 0)
        assert r.semantic_contaminated == (s.contaminated if s else False)
        assert r.contaminated_any == (r.ngram_contaminated or r.semantic_contaminated)
    # both detectors actually contribute on the fixture
    assert any(r.ngram_contaminated for r in out.values())
    assert any(r.semantic_contaminated for r in out.values())


def test_q129_catches_paraphrase_only_and_verbatim_only(spark, tmp_path):
    """The reason defense-in-depth exists: a doc can be flagged by
    exactly one detector. Planted: an eval-vector twin with disjoint
    TEXT (semantic-only hit) and a doc sharing eval shingles whose
    vector is orthogonal to every eval vector (ngram-only hit)."""
    from engine.similarity import SEM_DECON_MOD
    from engine.text import DECON_HOLDOUT_MOD, q129_decontamination_defense

    # eval docs are doc_id % DECON_HOLDOUT_MOD == 0 (q48); eval vectors are
    # vec_id % SEM_DECON_MOD == 0 (q105)
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (0, eval_text, "en", "s", len(eval_text)),                    # eval doc + eval vec
        (1, "totally different words here nothing shared at all", "en", "s", 48),
        (2, eval_text + " and more trailing context words", "en", "s", 70),
    ]
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # eval vector
        (1, [0.999, 0.02, 0.0, 0.0], 1),  # paraphrase: near the eval vector
        (2, [0.0, 0.0, 1.0, 0.0], 2),   # orthogonal: semantically clean
    ]
    assert 0 % DECON_HOLDOUT_MOD == 0 and 0 % SEM_DECON_MOD == 0
    d = str(tmp_path / "q129")
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<double>, label int"
    ).write.parquet(d + "/embeddings.parquet")
    out = {r.doc_id: r for r in q129_decontamination_defense(spark, d).collect()}
    # doc 1: no shared shingles, but its vector sits on the eval vector
    assert not out[1].ngram_contaminated and out[1].semantic_contaminated
    assert out[1].contaminated_any
    # doc 2: shares the full eval shingle run, orthogonal vector
    assert out[2].ngram_contaminated and not out[2].semantic_contaminated
    assert out[2].contaminated_any


def test_q130_source_quality_matches_independent_python(spark, sf_dir):
    """q130's type-1 order statistics and the corpus median must equal
    a from-scratch python recount (sorted lists, ceil-rank indexing)
    for every source."""
    import math
    from collections import defaultdict

    from engine.session import table
    from engine.text import q130_source_quality_report

    def q1e6(text):
        toks = text.strip().split()
        toks = toks if toks else [""]
        n = len(toks)
        mean_len = len("".join(toks)) / n
        raw = (0.4 * min(n / 100.0, 1.0) + 0.3 * (len(set(toks)) / n)
               + 0.3 * min(mean_len / 10.0, 1.0))
        return math.floor(raw * 1e6)

    by_src = defaultdict(list)
    allq = []
    for r in table(spark, sf_dir, "documents").select("source", "text").collect():
        v = q1e6(r.text)
        by_src[r.source].append(v)
        allq.append(v)

    def at(vals, num, den):
        s = sorted(vals)
        rank = -(-len(s) * num // den)  # ceil
        return s[rank - 1]

    corpus_med = at(allq, 1, 2)
    expected = sorted(
        (src, len(vs), at(vs, 1, 4), at(vs, 1, 2), at(vs, 3, 4), corpus_med,
         at(vs, 1, 2) < corpus_med)
        for src, vs in by_src.items()
    )
    got = [
        (r.source, r.n_docs, r.q25_1e6, r.median_1e6, r.q75_1e6,
         r.corpus_median_1e6, r.below_corpus_median)
        for r in q130_source_quality_report(spark, sf_dir).collect()
    ]
    assert got == expected


def test_q130_planted_low_quality_source_flags(spark, tmp_path):
    """A source of repetitive junk must sit below the corpus median
    with its whole IQR under the good source's; a single-doc source
    gets all three quartiles equal to its one score."""
    from engine.text import q130_source_quality_report

    rows = []
    for i in range(10):
        rows.append((i, " ".join(f"w{j}-{i}" for j in range(60)), "en", "good", 300))
    for i in range(10, 20):
        rows.append((i, " ".join(["spam"] * 60), "en", "junk", 300))
    rows.append((20, "just one modest doc here", "en", "solo", 24))
    d = str(tmp_path / "q130")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = {r.source: r for r in q130_source_quality_report(spark, d).collect()}
    assert out["junk"].below_corpus_median and not out["good"].below_corpus_median
    assert out["junk"].q75_1e6 < out["good"].q25_1e6
    solo = out["solo"]
    assert solo.n_docs == 1 and solo.q25_1e6 == solo.median_1e6 == solo.q75_1e6


def test_q133_containment_planted_asymmetry(spark, tmp_path):
    """q133 semantics on a planted quote-expansion: doc 1's shingle
    set is FULLY contained in doc 2 (doc 2 = doc 1 + a suffix), so
    contain_a = 1.0 exactly while contain_b < 1 — the asymmetric
    signal Jaccard alone blurs; the unrelated doc 3 pairs with
    nothing. Counts are exact integers: n_inter = |shingles(doc 1)|
    = 20 tokens -> 18 3-shingles."""
    from engine.text import q133_shingle_containment

    base = " ".join(f"w{i}" for i in range(20))
    container = base + " " + " ".join(f"x{i}" for i in range(4))
    rows = [
        (1, base, "en", "web", len(base)),
        (2, container, "en", "web", len(container)),
        (3, " ".join(f"z{i}" for i in range(25)), "en", "web", 99),
    ]
    d = str(tmp_path / "contain")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = q133_shingle_containment(spark, d).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(1, 2)]
    r = out[0]
    assert r.n_inter == 18
    assert r.contain_a == 1.0
    assert 0 < r.contain_b < 1.0
    assert r.max_containment == 1.0


def test_q133_recount_matches_shingle_sets(spark, sf_dir):
    """Every q133 row re-derived from raw shingle sets in Python over
    the q54 candidate pairs: intersection counts and both directed
    containments must agree exactly (1e-6 rounding grid)."""
    from engine.text import CONTAIN_MIN, q54_minhash_candidates, q133_shingle_containment
    from engine.session import table

    import re

    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }

    def shingles(t):  # distinct word-3-grams (_with_shingles semantics)
        toks = [x for x in re.split(" +", t.strip()) if x != ""]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {i: shingles(t) for i, t in docs.items()}
    cands = {(r.doc_a, r.doc_b) for r in q54_minhash_candidates(spark, sf_dir).collect()}
    want = {}
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        if not inter:
            continue
        ca, cb = round(inter / len(sh[a]), 6), round(inter / len(sh[b]), 6)
        if max(ca, cb) >= CONTAIN_MIN:
            want[(a, b)] = (inter, ca, cb, max(ca, cb))
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.contain_a, r.contain_b, r.max_containment)
        for r in q133_shingle_containment(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_q134_funnel_planted_one_drop_per_gate(spark, tmp_path):
    """q134 semantics on a planted corpus engineered to lose exactly
    one document at every gate: the holdout doc leaves at stage 1, an
    exact copy at stage 2, a near-dup at stage 3, a degenerate
    low-quality doc at stage 4, and a doc quoting the holdout at
    stage 5 — two clean survivors remain. Counts are cumulative (each
    stage applies to the previous survivors) and drop_ppm is exact
    integer ppm of the previous stage."""
    from engine.text import q134_curation_funnel

    hi = " ".join(f"w{i}" for i in range(120))          # high quality
    near = hi + " " + " ".join(f"n{i}" for i in range(6))
    holdout = " ".join(f"e{i}" for i in range(40))       # the eval doc
    # quality-ok text QUOTING 6 consecutive eval tokens (>= 2 shingles)
    contam = " ".join(f"c{i}" for i in range(100)) + " e10 e11 e12 e13 e14 e15"
    rows = [
        (1, hi, "en", "web", len(hi)),
        (2, hi, "en", "web", len(hi)),           # exact dup -> stage 2
        (3, near, "en", "web", len(near)),       # near dup  -> stage 3
        (4, "x x x x x", "en", "web", 9),        # low quality -> stage 4
        (5, contam, "en", "web", len(contam)),   # contaminated -> stage 5
        (6, " ".join(f"z{i}" for i in range(110)), "en", "web", 400),
        (100, holdout, "en", "web", len(holdout)),  # 100 % 50 == 0 -> holdout
    ]
    d = str(tmp_path / "funnel134")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = {r.stage: r for r in q134_curation_funnel(spark, d).collect()}
    assert [out[i].n_docs for i in range(6)] == [7, 6, 5, 4, 3, 2]
    assert [out[i].n_dropped for i in range(6)] == [0, 1, 1, 1, 1, 1]
    assert out[1].gate == "holdout_carveout" and out[5].gate == "decontaminated"
    # exact integer ppm of the previous stage
    assert out[1].drop_ppm == 1_000_000 // 7
    assert out[5].drop_ppm == 1_000_000 // 3


def test_q135_incremental_funnel_planted_drops(spark, tmp_path):
    """q135 semantics on a planted two-snapshot corpus: the delta
    (added: doc_id % 7 == 0; changed: % 11 == 0) loses an exact copy
    of a STANDING doc and a within-delta duplicate at stage 2, a
    near-dup of a standing doc and a near-dup of an earlier delta doc
    at stage 3, a degenerate doc at stage 4, and a holdout-quoting doc
    at stage 5 — two clean survivors (one added, one changed). Stage 1
    drops nothing structurally: holdout ids (% 50) are multiples of 5
    and so never inside snapshot B — eval sets aren't part of the
    crawl, which is also why gate 5 reads the FROZEN original holdout
    text."""
    from engine.text import q135_incremental_curation

    hi = " ".join(f"w{i}" for i in range(120))
    hi_near = hi + " " + " ".join(f"n{i}" for i in range(6))
    stand4 = " ".join(f"s{i}" for i in range(110))
    stand4_near = stand4 + " " + " ".join(f"m{i}" for i in range(6))
    holdout = " ".join(f"e{i}" for i in range(40))
    contam = " ".join(f"c{i}" for i in range(100)) + " e10 e11 e12 e13 e14 e15"
    changed_txt = " ".join(f"v{i}" for i in range(110))
    rows = [
        # standing corpus (in A and B, unedited): ids ∉ {5,7,11}-mods
        (1, " ".join(f"a{i}" for i in range(115)), "en", "web"),
        (2, " ".join(f"u{i}" for i in range(105)), "en", "web"),
        (3, " ".join(f"t{i}" for i in range(100)), "en", "web"),
        (4, stand4, "en", "web"),
        # delta (added): % 7 == 0, ∉ 5/11-mods
        (7, hi, "en", "web"),            # clean survivor
        (14, " ".join(f"t{i}" for i in range(100)), "en", "web"),  # = id 3 -> s2
        (21, hi, "en", "web"),           # within-delta dup of 7 -> s2
        (28, stand4_near, "en", "web"),  # near-dup of standing 4 -> s3
        (56, hi_near, "en", "web"),      # near-dup of earlier delta 7 -> s3
        (42, "x x x x x", "en", "web"),  # low quality -> s4
        (49, contam, "en", "web"),       # quotes holdout -> s5
        # delta (changed): % 11 == 0, in A, gets ' rev2' in B
        (33, changed_txt, "en", "web"),  # clean survivor
        # frozen eval doc: % 50 == 0 ⇒ never in snapshot B, feeds gate 5
        (100, holdout, "en", "web"),
    ]
    d = str(tmp_path / "funnel135")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(d + "/documents.parquet")
    out = {r.stage: r for r in q135_incremental_curation(spark, d).collect()}
    assert [out[i].n_docs for i in range(6)] == [8, 8, 6, 4, 3, 2]
    assert [out[i].n_dropped for i in range(6)] == [0, 0, 2, 2, 1, 1]
    assert out[0].gate == "delta_ingested" and out[3].gate == "near_dup"
    assert out[2].drop_ppm == 2 * 1_000_000 // 8
    assert out[3].drop_ppm == 2 * 1_000_000 // 6


def test_q135_delta_matches_q107_diff_and_index_path(spark, sf_dir):
    """Cross-operator consistency: q135's delta_ingested count equals
    q107's added+changed diff rows (same snapshot constants), and the
    ``index_table=`` path (standing side probed from the persisted
    build_band_index store) is byte-identical to the in-plan one."""
    from pyspark.sql import functions as F

    from engine.relational import q107_snapshot_diff
    from engine.text import build_band_index, q135_incremental_curation

    out = q135_incremental_curation(spark, sf_dir).collect()
    n_delta = [r.n_docs for r in out if r.stage == 0][0]
    n_diff = (
        q107_snapshot_diff(spark, sf_dir)
        .filter(F.col("status").isin("added", "changed"))
        .count()
    )
    assert n_delta == n_diff
    spark.sql("DROP TABLE IF EXISTS q135_idx")
    build_band_index(spark, sf_dir, "q135_idx", n_buckets=8)
    try:
        via = q135_incremental_curation(spark, sf_dir, index_table="q135_idx").collect()
        assert [tuple(r) for r in via] == [tuple(r) for r in out]
    finally:
        spark.sql("DROP TABLE IF EXISTS q135_idx")


def test_q135_two_night_admission_cycle(spark, tmp_path):
    """The full nightly CYCLE over a curated-corpus band store (r9
    verdict item 6): night 1 curates a planted delta doc and ADMITS it
    (q135_admit_survivors appends its band rows); night 2 then flags
    both a re-ingest of that doc (self-match against its own store
    rows) and a fresh near-dup of it as near_dup-of-history — neither
    is expressible from the snapshot mod-math, ONLY the appended store
    knows night 1 happened. The appended store is byte-equal to a
    from-scratch rebuild over standing ∪ admitted, and the probe-only
    night-1 run over the curated store equals the default in-plan
    funnel."""
    from pyspark.sql import functions as F

    from engine.text import (
        build_band_index,
        q135_admit_survivors,
        q135_incremental_curation,
    )

    hi = " ".join(f"w{i}" for i in range(120))
    hi_near = hi + " " + " ".join(f"n{i}" for i in range(6))
    standing = [
        (1, " ".join(f"a{i}" for i in range(115)), "en", "web"),
        (2, " ".join(f"u{i}" for i in range(105)), "en", "web"),
        (3, " ".join(f"t{i}" for i in range(100)), "en", "web"),
        (4, " ".join(f"s{i}" for i in range(110)), "en", "web"),
    ]
    holdout = [(100, " ".join(f"e{i}" for i in range(40)), "en", "web")]
    schema = "doc_id bigint, text string, lang string, source string"

    # night 1: X (id 7 ⇒ added) is a clean survivor
    d1 = str(tmp_path / "night1")
    spark.createDataFrame(
        standing + [(7, hi, "en", "web")] + holdout, schema
    ).write.parquet(d1 + "/documents.parquet")
    # night 2: X re-ingested + Y (id 21 ⇒ added), a near-dup of X
    d2 = str(tmp_path / "night2")
    spark.createDataFrame(
        standing + [(7, hi, "en", "web"), (21, hi_near, "en", "web")] + holdout,
        schema,
    ).write.parquet(d2 + "/documents.parquet")

    for t in ("n1_idx", "n1_idx_rebuild"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        # curated-corpus store = the standing split only
        stand_df = spark.createDataFrame(standing, schema)
        build_band_index(spark, d1, "n1_idx", n_buckets=8, docs=stand_df)

        # night-1 probe over the curated store ≡ the default in-plan run
        default1 = [tuple(r) for r in q135_incremental_curation(spark, d1).collect()]
        via1 = [
            tuple(r)
            for r in q135_incremental_curation(
                spark, d1, index_table="n1_idx", index_is_corpus=True
            ).collect()
        ]
        assert via1 == default1

        # night-1 close: X survives and is admitted into the store
        surv1 = q135_incremental_curation(
            spark, d1, index_table="n1_idx", index_is_corpus=True, return_survivors=True
        )
        assert [r.doc_id for r in surv1.collect()] == [7]
        q135_admit_survivors(spark, d1, "n1_idx")

        # byte-equality: appended store == rebuild over standing ∪ admitted
        admitted = spark.createDataFrame(standing + [(7, hi, "en", "web")], schema)
        build_band_index(spark, d1, "n1_idx_rebuild", n_buckets=8, docs=admitted)
        assert sorted(map(tuple, spark.table("n1_idx").collect())) == sorted(
            map(tuple, spark.table("n1_idx_rebuild").collect())
        )

        # night 2 WITHOUT the admission (mod-math standing only): X
        # survives again and Y only loses to X within-batch — history
        # doesn't know night 1 happened
        base2 = {r.stage: r for r in q135_incremental_curation(spark, d2).collect()}
        assert base2[3].n_dropped == 1  # Y vs X within-delta keep-first
        assert base2[5].n_docs == 1  # X sails through again
        # night 2 WITH the appended store: X self-matches its admitted
        # rows, Y near-dups them — both flagged as history dups
        via2 = {
            r.stage: r
            for r in q135_incremental_curation(
                spark, d2, index_table="n1_idx", index_is_corpus=True
            ).collect()
        }
        assert via2[2].n_docs == 2  # both enter the near-dup gate
        assert via2[3].n_docs == 0 and via2[3].n_dropped == 2
        assert via2[5].n_docs == 0
        surv2 = q135_incremental_curation(
            spark, d2, index_table="n1_idx", index_is_corpus=True, return_survivors=True
        )
        assert surv2.count() == 0
    finally:
        for t in ("n1_idx", "n1_idx_rebuild"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_q136_curriculum_shards_exact_recount_and_balance(spark, sf_dir):
    """q136 vs a from-scratch python recount (sort by (quality desc,
    doc_id), round-robin mod N_SHARDS), plus the properties the
    operator exists for: shard doc counts differ by at most one, and
    round-robin over the quality order stratifies tokens — no shard's
    token sum strays far from the mean (loose 25% bound; measured
    spread is a few percent on every fixture SF)."""
    import math

    from engine.session import table
    from engine.text import N_SHARDS, q136_curriculum_shards

    rows = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    docs = []
    for r in rows:
        toks = r.text.strip().split() if r.text.strip() else [""]
        n = len(toks)
        nd = len(set(toks))
        alpha = len("".join(toks))
        q = math.floor(
            (0.4 * min(n / 100.0, 1.0) + 0.3 * (nd / n) + 0.3 * min(alpha / n / 10.0, 1.0))
            * 1e6
        )
        docs.append((q, r.doc_id, n))
    docs.sort(key=lambda x: (-x[0], x[1]))
    exp = {s: [0, 0] for s in range(N_SHARDS)}
    for i, (q, _, n) in enumerate(docs):
        exp[i % N_SHARDS][0] += 1
        exp[i % N_SHARDS][1] += n
    got = {r.shard_id: r for r in q136_curriculum_shards(spark, sf_dir).collect()}
    assert sorted(got) == list(range(N_SHARDS))
    for s in range(N_SHARDS):
        assert (got[s].n_docs, got[s].sum_tokens) == tuple(exp[s]), s
    counts = [got[s].n_docs for s in range(N_SHARDS)]
    assert max(counts) - min(counts) <= 1
    tokens = [got[s].sum_tokens for s in range(N_SHARDS)]
    mean = sum(tokens) / len(tokens)
    assert all(abs(t - mean) / mean < 0.25 for t in tokens), tokens


def test_q137_dup_ngram_planted_and_recount(spark, tmp_path):
    """q137 semantics on a planted corpus: a 13-gram shared across two
    docs marks exactly one position in each; a doc that repeats its own
    13-token span carries intra-doc duplicated positions (the
    memorization signal distinct-shingle views hide); sub-13-token docs
    are excluded. Full frame cross-checked against an independent
    python recount."""
    from collections import Counter

    from engine.text import MEM_NGRAM_N, q137_dup_ngram_report

    n = MEM_NGRAM_N
    span = [f"s{i}" for i in range(n)]  # one exact 13-token span
    rows = [
        # doc 1: the span + unique tail -> exactly 1 dup position
        (1, " ".join(span + [f"a{i}" for i in range(7)]), "en", "web"),
        # doc 2: unique head + the same span -> exactly 1 dup position
        (2, " ".join([f"b{i}" for i in range(5)] + span), "en", "web"),
        # doc 3: its own span twice (self-repetition)
        (3, " ".join(span + span), "en", "web"),
        # doc 4: all unique
        (4, " ".join(f"c{i}" for i in range(2 * n)), "en", "web"),
        # doc 5: sub-window -> excluded
        (5, " ".join(f"d{i}" for i in range(n - 1)), "en", "web"),
    ]
    d = str(tmp_path / "q137")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in q137_dup_ngram_report(spark, d).collect()}

    # independent recount
    census: Counter = Counter()
    per_doc: dict[int, list[str]] = {}
    for doc_id, text, *_ in rows:
        toks = text.split()
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if grams:
            per_doc[doc_id] = grams
            census.update(grams)
    assert set(out) == set(per_doc)  # doc 5 excluded
    for doc_id, grams in per_doc.items():
        dup = sum(1 for g in grams if census[g] > 1)
        r = out[doc_id]
        assert (r.n_grams, r.n_dup_grams) == (len(grams), dup), doc_id
        assert r.dup_ppm == dup * 1_000_000 // len(grams)

    # the planted spot-claims the fixture encodes
    assert out[1].n_dup_grams == 1 and out[2].n_dup_grams == 1
    assert out[3].n_dup_grams >= 2  # self-repeat: both span positions
    assert out[4].n_dup_grams == 0


def test_q138_padded_batch_manifest_recount_and_invariants(spark, sf_dir):
    """q138 vs an independent python recount (pad → shard → enumerate →
    batch) plus the invariants the manifest exists for: every doc
    assigned exactly once (token conservation), no batch exceeds the
    padded-token budget unless it is a single over-budget doc, batch
    indices are dense per (bucket, shard), and waste is exactly the
    pad-to-bucket slack."""
    import hashlib

    from pyspark.sql import functions as F

    from engine.session import table
    from engine.text import (
        BATCH_SHARDS,
        BATCH_TOKENS,
        PAD_QUANTUM,
        q138_padded_batch_manifest,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = [
        (r.doc_id, r.n)
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(F.trim(F.col("text")), " +")).alias("n"))
        .collect()
    ]
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for doc_id, n in docs:
        padded = ((n + PAD_QUANTUM - 1) // PAD_QUANTUM) * PAD_QUANTUM
        groups.setdefault((padded, h60(str(doc_id)) % BATCH_SHARDS), []).append((doc_id, n))
    expect: dict[tuple[int, int, int], list[int]] = {}
    for (padded, shard), members in groups.items():
        cap = max(1, BATCH_TOKENS // padded)
        for i, (doc_id, n) in enumerate(sorted(members)):
            expect.setdefault((padded, shard, i // cap), []).append(n)

    out = {(r.padded_len, r.shard, r.batch_idx): r for r in q138_padded_batch_manifest(spark, sf_dir).collect()}
    assert set(out) == set(expect)
    for key, lens in expect.items():
        r = out[key]
        padded = key[0]
        assert r.n_docs == len(lens)
        assert r.real_tokens == sum(lens)
        assert r.padded_tokens == len(lens) * padded
        assert r.waste_ppm == (r.padded_tokens - r.real_tokens) * 1_000_000 // r.padded_tokens
        # budget invariant: within budget, or a lone over-budget doc
        assert r.padded_tokens <= BATCH_TOKENS or (r.n_docs == 1 and padded > BATCH_TOKENS)
    # conservation: every doc exactly once
    assert sum(r.n_docs for r in out.values()) == len(docs)
    # dense batch indices per (bucket, shard)
    for (padded, shard), members in groups.items():
        idxs = sorted(b for (p, s, b) in out if (p, s) == (padded, shard))
        assert idxs == list(range(len(idxs)))


def test_q139_funnel_acceptance_parity_and_planted_drop(spark, sf_dir, tmp_path):
    """q139's two drift-guards: per-stage n_docs equals q134's funnel
    (the restated spines cannot diverge) and the stage-0 census equals
    q137's corpus totals. Then the semantics on a planted corpus: an
    exact duplicate doc carries shared 13-gram mass at ingest that
    exact_dedup erases — dup_ppm falls to zero from stage 2 on."""
    from engine.text import (
        q134_curation_funnel,
        q137_dup_ngram_report,
        q139_funnel_acceptance,
    )

    acc = {r.stage: r for r in q139_funnel_acceptance(spark, sf_dir).collect()}
    fun = {r.stage: r for r in q134_curation_funnel(spark, sf_dir).collect()}
    assert set(acc) == set(fun) == set(range(6))
    for i in range(6):
        assert acc[i].n_docs == fun[i].n_docs, i
        assert acc[i].gate == fun[i].gate, i
    rep = q137_dup_ngram_report(spark, sf_dir).collect()
    assert acc[0].n_grams == sum(r.n_grams for r in rep)
    assert acc[0].n_dup_grams == sum(r.n_dup_grams for r in rep)

    # planted: doc 1 and its exact copy (id 2) share every 13-gram;
    # the rest are unique docs long enough to survive the quality gate
    long_a = " ".join(f"w{i}" for i in range(120))
    rows = [
        (1, long_a, "en", "web"),
        (2, long_a, "en", "web"),          # exact copy -> dropped at s2
        (3, " ".join(f"u{i}" for i in range(110)), "en", "web"),
        (100, " ".join(f"e{i}" for i in range(40)), "en", "web"),  # holdout
    ]
    d = str(tmp_path / "q139")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(d + "/documents.parquet")
    out = {r.stage: r for r in q139_funnel_acceptance(spark, d).collect()}
    assert out[0].n_dup_grams == 2 * 108  # both copies' positions count
    assert out[1].n_dup_grams == 2 * 108  # holdout carve touches neither
    assert out[2].n_dup_grams == 0        # exact_dedup erased the mass
    assert out[2].dup_ppm == 0 and out[5].dup_ppm == 0
    assert out[2].n_docs == out[1].n_docs - 1
