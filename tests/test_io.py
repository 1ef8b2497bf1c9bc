"""Sources/sinks: checkpoint round-trip, partitioned & bucketed writes,
model persistence (S7–S9 parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.io import checkpoint, restore, save_model, write_bucketed, write_partitioned
from engine.session import table


def test_checkpoint_roundtrip(spark, sf_dir, tmp_path):
    df = table(spark, sf_dir, "nation")
    p = str(tmp_path / "ckpt")
    checkpoint(df, p)
    back = restore(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    df = table(spark, sf_dir, "orders")
    p = str(tmp_path / "orders_part")
    write_partitioned(df.withColumn("status", F.col("o_orderstatus")), p, "status")
    back = spark.read.parquet(p).filter(F.col("status") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == df.filter("o_orderstatus = 'F'").count()
    # partition filter must appear as a pruning predicate, not a data filter
    assert "PartitionFilters: [isnotnull(status" in plan


def test_bucketed_write_elides_shuffle(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(o, "o_b", "o_orderkey", 8)
    # force the sort-merge path (at real scale neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("li_b").join(spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_model_save_load(spark, sf_dir, tmp_path):
    from pyspark.ml.classification import NaiveBayes, NaiveBayesModel

    from engine.pipeline import assemble, fit_gaussian_nb

    e = assemble(table(spark, sf_dir, "embeddings"))
    model = fit_gaussian_nb(e)
    p = str(tmp_path / "nb_model")
    save_model(model, p)
    back = NaiveBayesModel.load(p)
    a = model.transform(e).select("vec_id", "prediction").collect()
    b = back.transform(e).select("vec_id", "prediction").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    from engine.io import read_csv, read_json

    df = table(spark, sf_dir, "nation")
    csv_p, json_p = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    df.write.mode("overwrite").option("header", "true").csv(csv_p)
    df.write.mode("overwrite").json(json_p)
    back_csv = read_csv(spark, csv_p, schema=df.schema)
    back_json = read_json(spark, json_p, schema=df.schema)
    expect = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, back_csv.collect())) == expect
    assert sorted(map(tuple, back_json.collect())) == expect


def test_binary_file_source(spark, tmp_path):
    from engine.io import read_binary_dir

    for i, payload in enumerate([b"alpha", b"bravo-bytes", b"c"]):
        (tmp_path / f"blob_{i}.bin").write_bytes(payload)
    df = read_binary_dir(spark, str(tmp_path), "*.bin")
    rows = {r.path.split("/")[-1]: bytes(r.content) for r in df.collect()}
    assert rows == {"blob_0.bin": b"alpha", "blob_1.bin": b"bravo-bytes", "blob_2.bin": b"c"}
    assert {f.name for f in df.schema.fields} >= {"path", "modificationTime", "length", "content"}


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    # ORC is the second first-class columnar format (built-in, no
    # package): schema-preserving round trip + predicate pushdown
    # reaching the ORC scan
    from engine.session import table

    df = table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_orc")
    df.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    plan = (
        back.filter(back.n_nationkey > 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(n_nationkey), GreaterThan(n_nationkey" in plan


def test_read_text_docs_matches_documents_schema(spark, tmp_path, sf_dir):
    """text-source ingestion: one doc per line, documents-shaped
    output, deterministic ids across re-reads, and the text operator
    suite runs on it unchanged (q50 grouping as the smoke)."""
    from engine.io import read_text_docs

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("alpha beta gamma\nsecond line here\n")
    (p / "b.txt").write_text("third doc words\n")
    docs = read_text_docs(spark, str(p))
    rows = docs.collect()
    assert len(rows) == 3
    assert {r.text for r in rows} == {
        "alpha beta gamma", "second line here", "third doc words"
    }
    # schema parity with the fixture documents table
    from engine.session import table

    assert [f.name for f in docs.schema.fields] == [
        f.name for f in table(spark, sf_dir, "documents").schema.fields
    ]
    assert all(r.n_chars == len(r.text) for r in rows)
    # deterministic ids: re-read (and re-partitioned read) agrees
    again = {r.text: r.doc_id for r in read_text_docs(spark, str(p)).repartition(8).collect()}
    assert {r.text: r.doc_id for r in rows} == again
    # the text operator suite accepts it: exact-dedup grouping as-is
    import pyspark.sql.functions as F

    dedup = docs.groupBy(F.md5("text").alias("h")).count().collect()
    assert len(dedup) == 3


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """compaction: 64 tiny files in, few right-sized files out, data
    identical, and the plan uses AQE rebalancing (not a fixed-n
    repartition that would be wrong at any other size)."""
    from engine.io import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    import glob

    n_in = len(glob.glob(src + "/*.parquet"))
    assert n_in >= 32  # genuinely fragmented input
    n_out = compact_parquet(spark, src, dst)
    assert 1 <= n_out <= 8, n_out
    a = spark.read.parquet(src).groupBy().sum("id").first()[0]
    b = spark.read.parquet(dst).groupBy().sum("id").first()[0]
    assert a == b
    n_rows = spark.read.parquet(dst).count()
    assert n_rows == 10_000


def test_materialize_parquet_mode_pins_and_round_trips(spark, tmp_path):
    """io.materialize with a path is the durable (S7/S8) flavor of the
    shared-subtree pin: data round-trips exactly and the returned
    frame's plan reads ONLY the checkpoint parquet — no trace of the
    source subtree (so downstream uses cannot re-scan the corpus)."""
    from engine.io import materialize

    src = str(tmp_path / "src")
    spark.range(0, 1000).selectExpr("id", "id % 7 AS k").write.parquet(src)
    census = spark.read.parquet(src).groupBy("k").count()
    pin = materialize(census, str(tmp_path / "pin"))
    assert sorted(map(tuple, pin.collect())) == sorted(map(tuple, census.collect()))
    plan = pin._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1 and "pin" in plan and "src" not in plan


def test_read_text_docs_duplicate_line_collision_is_the_documented_caveat(spark, tmp_path):
    """read_text_docs's doc_id is xxhash64(file, text, len): stable
    across partitioning, but byte-identical lines WITHIN one file
    collide by construction (the docstring's documented caveat — r7
    verdict item 6 asks for it as a planted fact, not prose). Pin all
    three sides of the contract: (a) duplicate lines collide, (b)
    distinct lines and same lines in DIFFERENT files do not, (c) the
    q50 exact-dedup pass that the caveat defers to really does leave
    one row per collided id."""
    import os

    from pyspark.sql import functions as F

    from engine.io import read_text_docs

    d = str(tmp_path / "raw")
    os.makedirs(d)
    with open(os.path.join(d, "a.txt"), "w") as f:
        f.write("alpha beta\nalpha beta\ngamma delta\n")
    with open(os.path.join(d, "b.txt"), "w") as f:
        f.write("alpha beta\n")

    docs = read_text_docs(spark, d)
    rows = docs.collect()
    assert len(rows) == 4  # no rows are lost, ids just collide
    by_text = {}
    for r in rows:
        by_text.setdefault(r.text, set()).add(r.doc_id)
    # (a) within-file duplicates collide: 'alpha beta' in a.txt twice
    # -> one id; (b) the same text in b.txt hashes to a DIFFERENT id
    # (file path is in the key), and gamma is distinct from both
    assert len(by_text["alpha beta"]) == 2
    assert len(by_text["gamma delta"]) == 1
    assert not (by_text["alpha beta"] & by_text["gamma delta"])
    # ids are NOT unique pre-dedup: the documented consequence
    assert docs.count() == 4 and docs.select("doc_id").distinct().count() == 3
    # (c) the q50-style exact dedup the caveat defers to resolves it
    deduped = docs.dropDuplicates(["doc_id"])
    assert deduped.count() == 3
    # and re-ingesting yields the SAME ids (the property that matters
    # for incremental dedup at 100 TB)
    again = {r.doc_id for r in read_text_docs(spark, d).collect()}
    assert again == {r.doc_id for r in rows}
