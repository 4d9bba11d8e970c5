"""Text expression library edge cases: short-document shingles,
fingerprint permutation behavior, quality-score bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark.functions import text


def _one(spark, text_value, col):
    df = spark.createDataFrame([(text_value,)], "text string")
    return df.select(col.alias("v")).collect()[0].v


def test_shingles_short_doc_empty(spark):
    assert _one(spark, "one two", text.shingles("text", 3)) == []
    assert _one(spark, "one two three", text.shingles("text", 3)) == ["one two three"]
    assert _one(spark, "a b c d", text.shingles("text", 3)) == ["a b c", "b c d"]


def test_fingerprints_permutation(spark):
    fp = lambda t: _one(spark, t, text.doc_fingerprint("text"))
    rh = lambda t: _one(spark, t, text.rolling_content_hash("text"))
    # word-set equal, different order: set fingerprint collides,
    # rolling hash distinguishes
    assert fp("a b c") == fp("c b a") == fp("a a b c")
    assert rh("a b c") != rh("c b a")
    assert rh("a b c") == rh("a b c")


def test_quality_score_bounds(spark, sf_dir):
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(text.quality_score("text", ["the", "a"]).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def test_jaro_winkler_matches_duckdb_exactly(spark, sf_dir):
    """The pandas-UDF Jaro-Winkler must equal DuckDB's built-in
    float-for-float on EVERY blocked candidate pair — this exact
    equality is what entitles the linkage query's oracle to use
    jaro_winkler_similarity."""
    import duckdb

    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    grams = names.select(
        "name",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(name) - 2),"
                    " i -> substring(name, i, 3))"
                )
            )
        ).alias("gram"),
    )
    a = grams.select(F.col("name").alias("name_a"), "gram")
    b = grams.select(F.col("name").alias("name_b"), "gram")
    cand = (
        a.join(b, "gram")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    got = {
        (r["name_a"], r["name_b"]): r["jw"]
        for r in cand.withColumn(
            "jw", text.jaro_winkler("name_a", "name_b")
        ).collect()
    }
    assert len(got) > 100
    con = duckdb.connect()
    for (na, nb), jw in got.items():
        expect = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [na, nb]
        ).fetchone()[0]
        assert jw == expect, (na, nb, jw, expect)


def test_bpe_learn_merges_matches_literal_sennrich_loop(spark, sf_dir):
    """Literal-python BPE reference (Sennrich et al.'s get_stats /
    merge_vocab loop, written against word-frequency dicts) replayed
    over the same corpus — pins BOTH the Spark fold and the positional
    SQL oracle. Also asserts merges genuinely chain (some later merge
    consumes an earlier round's merged symbol) on a planted corpus."""
    import collections
    import os

    import pyarrow.parquet as pq

    from pipeline_query_engine_demo_spark.plans import llm, training

    def python_bpe(word_counts, rounds):
        vocab = {w: tuple(w) for w in word_counts}
        out = []
        for r in range(rounds):
            stats = collections.Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    stats[(syms[i], syms[i + 1])] += word_counts[w]
            if not stats:
                break
            (a, b), cnt = min(
                stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((r, a, b, a + b, cnt))
            for w, syms in vocab.items():
                ns, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                vocab[w] = tuple(ns)
        return out

    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).to_pandas()["text"]
    wc = collections.Counter(
        w for t in texts for w in str(t).split(" ") if w != ""
    )
    expect = python_bpe(wc, llm._BPE_ROUNDS)
    got = [
        (r["merge_round"], r["left_sym"], r["right_sym"], r["merged_sym"], r["pair_count"])
        for r in training.bpe_learn_merges(spark, sf_dir).orderBy("merge_round").collect()
    ]
    assert got == expect

    # planted corpus where merges MUST chain: 'ababab' repeated makes
    # (a,b) win round 0 and then (ab,ab) win round 1
    import pandas as pd
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame({"text": ["ababab ababab", "ababab zz"]}).to_parquet(
            os.path.join(d, "documents.parquet")
        )
        wc2 = collections.Counter({"ababab": 3, "zz": 1})
        expect2 = python_bpe(wc2, llm._BPE_ROUNDS)
        got2 = [
            (r["merge_round"], r["left_sym"], r["right_sym"], r["merged_sym"], r["pair_count"])
            for r in training.bpe_learn_merges(spark, d).orderBy("merge_round").collect()
        ]
        assert got2 == expect2
        assert expect2[1][:2] == (1, "ab") and expect2[1][2] == "ab"


def test_feature_hashing_matches_python_md5_replay(spark, sf_dir):
    """Exact md5 replay of the hashing trick for every sampled doc."""
    import hashlib

    from pipeline_query_engine_demo_spark.plans.training import feature_hashing_docs

    out = {}
    for r in feature_hashing_docs(spark, sf_dir).collect():
        out[(r["doc_id"], r["bucket"])] = (r["weight"], r["n_terms"])
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 97 == 0)
        .select("doc_id", "text")
        .collect()
    )
    assert docs
    exp = {}
    for d in docs:
        for tok in d["text"].split(" "):
            if not tok:
                continue
            h = hashlib.md5(f"fh|{tok}".encode()).hexdigest()
            bucket = int(h[:8], 16) % 64
            sgn = 1 if int(h[8], 16) % 2 == 0 else -1
            w, n = exp.get((d["doc_id"], bucket), (0, 0))
            exp[(d["doc_id"], bucket)] = (w + sgn, n + 1)
    assert out == exp
    # signs must actually cancel somewhere (both polarities in play)
    assert any(w < n for (w, n) in out.values())
    assert all(abs(w) <= n for (w, n) in out.values())


def test_js_divergence_matches_bruteforce_and_bounds(spark, sf_dir):
    import math

    from pipeline_query_engine_demo_spark.plans.llm import _JSD_TOPK
    from pipeline_query_engine_demo_spark.plans.training import js_divergence_sources

    out = {
        (r["source_a"], r["source_b"]): r["jsd_bits"]
        for r in js_divergence_sources(spark, sf_dir).collect()
    }
    assert out
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    cnt: dict = {}
    glob: dict = {}
    for d in docs:
        for tok in d["text"].split(" "):
            if not tok:
                continue
            cnt[(d["source"], tok)] = cnt.get((d["source"], tok), 0) + 1
            glob[tok] = glob.get(tok, 0) + 1
    support = sorted(glob, key=lambda t: (-glob[t], t))[:_JSD_TOPK]
    sources = sorted({s for s, _ in cnt})
    totals = {
        s: sum(cnt.get((s, t), 0) for t in support) for s in sources
    }
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            acc = 0.0
            for t in support:
                p = cnt.get((sa, t), 0) / totals[sa]
                q = cnt.get((sb, t), 0) / totals[sb]
                m = (p + q) / 2.0
                if p > 0:
                    acc += p * math.log(p / m)
                if q > 0:
                    acc += q * math.log(q / m)
            jsd = acc / (2.0 * math.log(2))
            got = out[(sa, sb)]
            assert math.isclose(got, jsd, rel_tol=0, abs_tol=1e-5), (sa, sb)
            assert -1e-9 <= got <= 1.0 + 1e-9
    assert len(out) == len(sources) * (len(sources) - 1) // 2


def test_keyword_tag_docs_matches_python_sets(spark, sf_dir):
    """Dictionary tagging must equal a python set-intersection per doc:
    sorted matches, comma-joined, zero-match docs kept with 0/''."""
    from pipeline_query_engine_demo_spark.plans.llm import KEYWORDS
    from pipeline_query_engine_demo_spark.plans.training import keyword_tag_docs
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    got = {
        r.doc_id: (r.n_matches, r.matched)
        for r in keyword_tag_docs(spark, sf_dir).collect()
    }
    assert set(got) == set(texts)
    kw = set(KEYWORDS)
    any_zero = any_hit = False
    for did, text in texts.items():
        m = sorted(set(text.split(" ")) & kw)
        assert got[did] == (len(m), ",".join(m)), did
        any_zero |= not m
        any_hit |= bool(m)
    assert any_hit  # the lexicon actually fires on the fixture
