"""Semantic tests for the round-7 session-4 LLM-pipeline queries:
1-D Wasserstein source distance and content-defined chunking dedup.

The registry gate proves DuckDB parity; these replay the math in pure
python so a parity-preserving-but-wrong formula can't slip through on
both engines at once.
"""

from __future__ import annotations

import hashlib

import pytest

from pipeline_query_engine_demo_spark.plans.dedup import cdc_chunk_dedup
from pipeline_query_engine_demo_spark.plans.training import wasserstein_doc_lengths


def test_wasserstein_matches_ecdf_integral(spark, sf_dir):
    out = {(r["s1"], r["s2"]): r for r in wasserstein_doc_lengths(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(int(r["n_chars"]))
    srcs = sorted(by_src)
    pairs = [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]]
    assert set(out) == set(pairs)
    for s1, s2 in pairs:
        x, y = by_src[s1], by_src[s2]
        n1, n2 = len(x), len(y)
        vals = sorted(set(x) | set(y))
        mass = 0
        for v, nv in zip(vals, vals[1:]):
            c1 = sum(1 for u in x if u <= v)
            c2 = sum(1 for u in y if u <= v)
            mass += abs(c1 * n2 - c2 * n1) * (nv - v)
        w1 = mass / (n1 * n2)
        r = out[(s1, s2)]
        assert (r["n1"], r["n2"]) == (n1, n2)
        assert r["w1_chars"] == pytest.approx(w1, abs=1e-6)
    # W1 is a metric on these step ECDFs: symmetric by construction
    # here, but the triangle inequality is a real invariant to spot-check
    if len(srcs) >= 3:
        a, b, c = srcs[0], srcs[1], srcs[2]
        assert (
            out[(a, c)]["w1_chars"]
            <= out[(a, b)]["w1_chars"] + out[(b, c)]["w1_chars"] + 1e-6
        )


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cdc_chunks(text: str, mod: int = 128) -> list[str]:
    """Pure-python replay of the query's boundary rule: cut after
    position p+7 whenever the 8-gram at p hashes to 0 mod `mod`."""
    n = len(text)
    cuts = [
        p + 7
        for p in range(1, max(n - 6, 1))
        if _hash60(text[p - 1 : p + 7]) % mod == 0 and p + 7 < n
    ]
    starts = [1] + [c + 1 for c in cuts]
    ends = cuts + [n]
    return [text[s - 1 : e] for s, e in zip(starts, ends)]


def test_cdc_chunk_dedup_matches_python_chunker(spark, sf_dir):
    out = {r["source"]: r for r in cdc_chunk_dedup(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    chunks: list = []
    for r in docs:
        for ch in _cdc_chunks(r["text"]):
            chunks.append((r["source"], hashlib.md5(ch.encode()).hexdigest(), len(ch)))
    freq: dict = {}
    for _, h, _ in chunks:
        freq[h] = freq.get(h, 0) + 1
    per_src: dict = {}
    for src, h, clen in chunks:
        tot = per_src.setdefault(src, [0, 0, 0, 0])  # n, ndup, chars, dupchars
        tot[0] += 1
        tot[2] += clen
        if freq[h] > 1:
            tot[1] += 1
            tot[3] += clen
    assert set(out) == set(per_src)
    for src, (nch, ndup, chars, dupchars) in per_src.items():
        r = out[src]
        assert r["n_chunks"] == nch
        assert r["n_dup_chunks"] == ndup
        assert r["avg_chunk_chars"] == pytest.approx(chars / nch, abs=1e-6)
        assert r["dup_char_ratio"] == pytest.approx(dupchars / chars, abs=1e-6)


def test_cdc_boundaries_are_content_defined():
    """The property that justifies CDC over fixed-size blocks: an edit
    near the front only reshapes chunks up to the first boundary after
    it; everything later re-aligns because boundaries depend on local
    content, not absolute offsets."""
    base = "".join(
        f"line {i}: the quick brown fox jumps over the lazy dog\n"
        for i in range(200)
    )
    edited = "INSERTED HEADER :: " + base
    c_base = _cdc_chunks(base)
    c_edit = _cdc_chunks(edited)
    assert len(c_base) > 5, "fixture must produce several chunks"
    # all but the leading chunk(s) survive the edit verbatim
    shared = set(c_base) & set(c_edit)
    assert len(shared) >= len(set(c_base)) - 2
    # a fixed-size blocker would share nothing after a 19-char shift
    fixed_base = [base[i : i + 128] for i in range(0, len(base), 128)]
    fixed_edit = [edited[i : i + 128] for i in range(0, len(edited), 128)]
    assert len(set(fixed_base) & set(fixed_edit)) <= 1


def test_quantile_normalize_matches_python(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.training import (
        quantile_normalize_lengths,
    )

    out = {r["source"]: r for r in quantile_normalize_lengths(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    all_v = sorted(int(r["n_chars"]) for r in docs)
    nn = len(all_v)
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(
            (int(r["n_chars"]), r["doc_id"])
        )
    assert set(out) == set(by_src)
    for src, rows in by_src.items():
        rows.sort()
        n_s = len(rows)
        origs, norms = [], []
        for r_idx, (v, _) in enumerate(rows, start=1):
            k = (r_idx * nn + n_s - 1) // n_s
            origs.append(v)
            norms.append(all_v[k - 1])
        r = out[src]
        assert r["n_docs"] == n_s
        assert r["mean_orig"] == pytest.approx(sum(origs) / n_s, abs=1e-6)
        assert r["mean_norm"] == pytest.approx(sum(norms) / n_s, abs=1e-6)
        assert r["mean_abs_shift"] == pytest.approx(
            sum(abs(a - b) for a, b in zip(norms, origs)) / n_s, abs=1e-6
        )
    # post-normalization, every source's mean sits near the global mean
    gmean = sum(all_v) / nn
    for src in by_src:
        assert abs(out[src]["mean_norm"] - gmean) < abs(
            out[src]["mean_orig"] - gmean
        ) + max(all_v) * 0.1
