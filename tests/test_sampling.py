"""Deterministic content-hash sampling + weighted corpus mixing — the
reproducible-curation operators (df.sample is partition-seeded and not
reproducible across cluster shapes). Membership is a pure function of the
row key, so it must be identical across runs, partitionings, and engines
(DuckDB re-derives it in SQL)."""

from fractions import Fraction

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mdbloom.spark.textops import (SAMPLE_SPACE, mix_corpora,
                                   mix_thresholds, sample_deterministic,
                                   sample_hash, stratified_sample)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"lang{i % 4}", f"doc body {i}") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "text string").cache()


def test_sample_deterministic_and_partition_stable(docs):
    a = sorted(r.doc_id for r in
               sample_deterministic(docs, ["doc_id"], 0.3).collect())
    b = sorted(r.doc_id for r in
               sample_deterministic(docs.repartition(17), ["doc_id"], 0.3)
               .collect())
    assert a == b and len(a) > 0
    # rate within 4 sigma of Bernoulli(0.3) on 2000 rows (sigma ~ 10.2)
    assert abs(len(a) - 600) < 82


def test_samples_nest_by_fraction(docs):
    """hash-threshold sampling gives NESTED samples: the 10% sample is a
    subset of the 30% sample — the property that makes scaling a mix up
    or down reproducible."""
    s10 = {r.doc_id for r in
           sample_deterministic(docs, ["doc_id"], 0.1).collect()}
    s30 = {r.doc_id for r in
           sample_deterministic(docs, ["doc_id"], 0.3).collect()}
    assert s10 <= s30


def test_salt_gives_independent_sample(docs):
    a = {r.doc_id for r in
         sample_deterministic(docs, ["doc_id"], 0.5, salt="s1").collect()}
    b = {r.doc_id for r in
         sample_deterministic(docs, ["doc_id"], 0.5, salt="s2").collect()}
    assert a != b
    # overlap near 25% of the corpus for independent 50% samples
    assert abs(len(a & b) - 500) < 100


def test_sample_fraction_bounds(docs):
    with pytest.raises(ValueError):
        sample_deterministic(docs, ["doc_id"], 1.5)
    assert sample_deterministic(docs, ["doc_id"], 0.0).count() == 0
    assert sample_deterministic(docs, ["doc_id"], 1.0).count() == 2000


def test_stratified_rates_and_default(docs):
    out = stratified_sample(docs, "lang", {"lang0": 1.0, "lang1": 0.2},
                            ["doc_id"]).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in out}
    assert got["lang0"] == 500          # kept whole
    assert abs(got.get("lang1", 0) - 100) < 55  # 4 sigma
    assert "lang2" not in got and "lang3" not in got  # default 0.0


def test_mix_thresholds_exact_math():
    sizes, weights = [1000, 400, 50], [5, 3, 1]
    thrs = mix_thresholds(sizes, weights)
    # binding source = max w/n (here the 50-row corpus at weight 1)
    c = min(Fraction(n, w) for n, w in zip(sizes, weights))
    for thr, n, w in zip(thrs, sizes, weights):
        want = (SAMPLE_SPACE * c.numerator * w) // (c.denominator * n)
        assert thr == want
    assert thrs[2] == SAMPLE_SPACE  # binding source kept whole
    with pytest.raises(ValueError):
        mix_thresholds([10, 10], [1.5, 1])
    with pytest.raises(ValueError):
        mix_thresholds([10, 0], [1, 1])


def test_mix_corpora_proportions(spark):
    a = spark.range(3000).select(F.col("id").alias("doc_id"),
                                 F.lit("a").alias("src"))
    b = spark.range(3000, 3600).select(F.col("id").alias("doc_id"),
                                       F.lit("b").alias("src"))
    out = mix_corpora([(a, 2), (b, 1)], ["doc_id"]).cache()
    got = {r.src: r["count"]
           for r in out.groupBy("src").count().collect()}
    # binding source is b (600 rows at weight 1) -> kept whole; a is
    # downsampled to ~1200 for a 2:1 mix
    assert got["b"] == 600
    assert abs(got["a"] - 1200) < 135  # 4 sigma at p=0.4, n=3000
    # deterministic: second call identical
    again = mix_corpora([(a, 2), (b, 1)], ["doc_id"])
    assert sorted(r.doc_id for r in out.collect()) == \
        sorted(r.doc_id for r in again.collect())


def test_sample_membership_matches_duckdb(spark, docs):
    """The membership rule is engine-portable: DuckDB recomputes the same
    60-bit md5 threshold test and picks the identical rows — the property
    the q51 oracle relies on."""
    thr = int(0.37 * SAMPLE_SPACE)
    got = sorted(r.doc_id for r in
                 docs.where(sample_hash(["doc_id"], "q51") < F.lit(thr))
                 .collect())
    pdf = docs.select("doc_id").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    want = [r[0] for r in con.execute(f"""
        SELECT doc_id FROM t
        WHERE ('0x' || substr(md5(cast(doc_id AS VARCHAR) || chr(31)
                                  || 'q51'), 1, 15))::UBIGINT < {thr}
        ORDER BY doc_id""").fetchall()]
    assert got == want and len(got) > 0


def test_sample_exact_n_deterministic_and_nested(docs):
    from mdbloom.spark.textops import sample_exact_n
    s100 = sorted(r.doc_id for r in
                  sample_exact_n(docs, ["doc_id"], 100).collect())
    again = sorted(r.doc_id for r in
                   sample_exact_n(docs.repartition(13), ["doc_id"], 100)
                   .collect())
    assert len(s100) == 100 and s100 == again
    s150 = sorted(r.doc_id for r in
                  sample_exact_n(docs, ["doc_id"], 150).collect())
    assert set(s100) <= set(s150)
    # top-n plan, not a global sort
    plan = sample_exact_n(docs, ["doc_id"], 100) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mix_corpora_token_budget(spark):
    """size_col weighs sources by token budget, not doc count: a source
    of few long docs balances one of many short ones."""
    from mdbloom.spark.textops import mix_corpora
    # a: 2000 docs x 10 tokens (20k); b: 100 docs x 100 tokens (10k)
    a = spark.range(2000).select(F.col("id").alias("doc_id"),
                                 F.lit(10).alias("n_tok"),
                                 F.lit("a").alias("src"))
    b = spark.range(5000, 5100).select(F.col("id").alias("doc_id"),
                                       F.lit(100).alias("n_tok"),
                                       F.lit("b").alias("src"))
    # 1:1 token mix -> binding source is b (10k tokens at weight 1);
    # a downsamples to ~10k tokens = ~1000 docs
    out = mix_corpora([(a, 1), (b, 1)], ["doc_id"], size_col="n_tok")
    got = {r.src: (r["cnt"], r["tok"]) for r in
           out.groupBy("src").agg(F.count("*").alias("cnt"),
                                  F.sum("n_tok").alias("tok")).collect()}
    assert got["b"] == (100, 10000)          # kept whole
    assert abs(got["a"][1] - 10000) < 1400   # ~4 sigma on token sum
    # doc-count mode differs: a falls to ~100 DOCS (vs ~1000 in token
    # mode) because the 1:1 target is now row counts
    out2 = mix_corpora([(a, 1), (b, 1)], ["doc_id"])
    got2 = {r.src: r["count"]
            for r in out2.groupBy("src").count().collect()}
    assert got2["b"] == 100
    assert abs(got2["a"] - 100) < 45  # 4 sigma at p=0.05, n=2000


def test_sample_hash_null_key_excluded_matches_sql(spark):
    """NULL keys hash to NULL and drop out of every sample — the same
    rows SQL's NULL-propagating || concatenation would drop; and
    multi-column keys must not collide (NULL,'x') with ('x',NULL)."""
    from mdbloom.spark.textops import sample_deterministic
    df = spark.createDataFrame(
        [(None, "x"), ("x", None), ("a", "b")], "k1 string, k2 string")
    kept = sample_deterministic(df, ["k1", "k2"], 1.0).collect()
    assert [(r.k1, r.k2) for r in kept] == [("a", "b")]


def test_stratified_default_fraction_validated(docs):
    with pytest.raises(ValueError, match="default_fraction"):
        stratified_sample(docs, "lang", {"lang0": 0.5}, ["doc_id"],
                          default_fraction=1.7)


def test_dedup_clusters_releases_checkpoints(spark):
    from mdbloom.spark.textops import dedup_clusters
    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    out = dedup_clusters(pairs)
    out.count()
    after = sc._jsc.sc().getPersistentRDDs().size()
    # edges + all but the FINAL label checkpoint released (the returned
    # frame still needs its own blocks)
    assert after <= before + 1


# ----------------------- sequence packing -----------------------

def test_pack_sequences_chunk_arithmetic(docs):
    """bin_id/bin_offset follow the running token sum in hash order:
    recompute driver-side from the operator's own hash column order."""
    from mdbloom.spark.textops import pack_sequences
    toked = docs.withColumn(
        "n_tokens",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long") +
        F.col("doc_id") % 13)  # vary the lengths
    got = pack_sequences(toked, budget=512, key_cols=["doc_id"],
                         salt="t").toPandas()
    order = toked.select("doc_id",
                         sample_hash(["doc_id"], "t").alias("h")) \
        .toPandas().sort_values(["h", "doc_id"])["doc_id"].tolist()
    g = got.set_index("doc_id")
    pre = 0
    for d in order:
        assert g.loc[d, "bin_id"] == pre // 512
        assert g.loc[d, "bin_offset"] == pre % 512
        pre += int(g.loc[d, "n_tokens"])


def test_pack_sequences_partitioning_invariant(docs):
    from mdbloom.spark.textops import pack_sequences
    docs = docs.withColumn("n_tokens", F.lit(7).cast("long"))
    a = pack_sequences(docs, 100, ["doc_id"]).select(
        "doc_id", "bin_id", "bin_offset").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(docs.repartition(13), 100, ["doc_id"]).select(
        "doc_id", "bin_id", "bin_offset").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # every bin except the last is fully covered: offsets of docs
    # starting in bin k are < budget and bins are contiguous from 0
    assert set(a["bin_id"]) == set(range(int(a["bin_id"].max()) + 1))
    assert (a["bin_offset"] < 100).all() and (a["bin_offset"] >= 0).all()
    # scale shape: distributed prefix sum — range exchange, per-partition
    # windows, NO single-partition global window
    plan = pack_sequences(docs, 100, ["doc_id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan
