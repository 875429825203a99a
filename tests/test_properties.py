"""Property-based tests (hypothesis) for the sketch kernels — the pure
numpy units behind the dedup operators, testable at thousands of cases
per second with no JVM round trip. The Spark-level behavior (recall vs
exact oracles, batch parity) is covered in test_dedup_similarity.py.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_project_spark.operators.dedup import (
    N_HASHES,
    minhash_kernel,
    simhash_kernel,
)

hash_sets = st.sets(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=60
)


def _scramble(values) -> list[int]:
    """splitmix64 finalizer: the kernel's contract input is xxhash64
    output (uniform bits — minhash_signatures hashes shingle strings
    JVM-side first). The multiply-add permutation family is NOT min-wise
    independent over structured raw integers, so the estimation property
    below is stated — as in production — over hash-distributed inputs."""
    out = []
    for v in values:
        z = (v & (2**64 - 1)) or 0x9E3779B97F4A7C15
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % 2**64
        z = (z ^ (z >> 27)) * 0x94D049BB133111EB % 2**64
        z ^= z >> 31
        out.append(z - 2**63)  # back to int64 range
    return out


@settings(max_examples=200, deadline=None)
@given(hash_sets, hash_sets)
def test_minhash_estimates_jaccard(a: set, b: set):
    """P(min collides) = Jaccard exactly, so the 128-hash estimate must
    land within 5 sigma of the true value (sigma = sqrt(j(1-j)/128))."""
    sa = minhash_kernel(_scramble(sorted(a)))
    sb = minhash_kernel(_scramble(sorted(b)))
    est = float(np.mean(sa == sb))
    true_j = len(a & b) / len(a | b)
    sigma = max((true_j * (1 - true_j) / N_HASHES) ** 0.5, 1 / N_HASHES)
    assert abs(est - true_j) <= 5 * sigma


@settings(max_examples=200, deadline=None)
@given(hash_sets, hash_sets)
def test_minhash_union_is_elementwise_min(a: set, b: set):
    """sig(A ∪ B) == elementwise min(sig(A), sig(B)) — the mergeability
    property that makes signatures partial-aggregatable (map-side combine
    of per-partition signatures is exact, not approximate)."""
    sa, sb = minhash_kernel(sorted(a)), minhash_kernel(sorted(b))
    su = minhash_kernel(sorted(a | b))
    assert np.array_equal(
        su.astype(np.uint64), np.minimum(sa.astype(np.uint64), sb.astype(np.uint64))
    )


@settings(max_examples=200, deadline=None)
@given(hash_sets)
def test_minhash_permutation_invariance(a: set):
    """Signature is a set property: input order can't matter."""
    fwd = minhash_kernel(sorted(a))
    rev = minhash_kernel(sorted(a, reverse=True))
    assert np.array_equal(fwd, rev)


@settings(max_examples=200, deadline=None)
@given(hash_sets)
def test_simhash_vote_scale_invariance(a: set):
    """Duplicating every token doubles every ±1 vote but flips no sign —
    simhash is invariant to uniform repetition (why dd5 feeds
    array_distinct'd tokens without changing semantics)."""
    once = simhash_kernel(sorted(a))
    twice = simhash_kernel(sorted(a) * 2)
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(hash_sets, st.integers(min_value=0, max_value=59))
def test_simhash_small_edit_small_hamming(a: set, drop_k: int):
    """Removing one token flips at most popcount-of-votes-at-margin bits;
    empirically the hamming distance for a 1-element edit of an n-set is
    bounded well below 64 — sanity that near-identical docs bucket near
    each other. (Exact bound: bits whose vote margin was ±1.)"""
    items = sorted(a)
    if len(items) < 2:
        return
    edited = items[: drop_k % len(items)] + items[drop_k % len(items) + 1 :]
    h1, h2 = simhash_kernel(items), simhash_kernel(edited)
    hamming = bin((h1 ^ h2) & (2**64 - 1)).count("1")
    # a single ±1 vote change can only flip bits whose margin was 0 or 1;
    # for hashes ~uniform, margin-<=1 bits number ~sqrt(n) on average — 64
    # is the absolute ceiling, and equality-heavy small sets stay low.
    assert hamming <= 64
    if len(items) >= 30:
        assert hamming <= 40  # loose empirical ceiling at 5+ sigma


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100,
                max_value=100,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_pairwise_cosine_matrix_properties(vecs):
    """The dd6 bucket kernel's normalized-matmul cosine: symmetric,
    bounded in [-1, 1], and 1 on the diagonal for nonzero vectors."""
    m = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    if (norms == 0).any():
        return
    n = m / norms
    sim = n @ n.T
    assert np.allclose(sim, sim.T, atol=1e-12)
    assert (sim <= 1 + 1e-9).all() and (sim >= -1 - 1e-9).all()
    assert np.allclose(np.diag(sim), 1.0, atol=1e-9)


def test_stratified_sample_rates(spark, sf_dir):
    """sampleBy hits each stratum's requested fraction within binomial
    tolerance (5 sigma), and emits no duplicate rows."""
    from etl_project_spark.catalog import load_table
    from etl_project_spark.registry import all_queries

    docs = load_table(spark, sf_dir, "documents")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    fractions = {"src0": 0.8, "src1": 0.5, "src2": 0.25, "src3": 0.1}
    out = {
        r["source"]: (r["n_sampled"], r["n_unique"])
        for r in all_queries()["smp1_stratified_sample"](spark, sf_dir).collect()
    }
    for src, frac in fractions.items():
        n = totals.get(src, 0)
        if n == 0:
            continue
        got, uniq = out.get(src, (0, 0))
        assert got == uniq  # Bernoulli sampling never duplicates
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(got - n * frac) <= 5 * sigma + 1


def _winnow_py(text: str, k: int, w: int) -> set[str]:
    """Pure-Python reference of the MOSS winnowing rule (md5-gram,
    min-per-window) used to pin tx10's Spark formulation."""
    import hashlib

    lt = text.lower()
    hs = [
        hashlib.md5(lt[i : i + k].encode()).hexdigest()[:8]
        for i in range(len(lt) - k + 1)
    ]
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


def test_winnowing_matches_reference_and_guarantee(spark):
    """tx10's Spark winnowing == a pure-Python reference on arbitrary
    docs, and the MOSS guarantee holds: two docs sharing a substring of
    length >= k+w-1 share at least one fingerprint."""
    from etl_project_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps"
    rows = [
        (1, "alpha beta gamma " + shared + " tail one"),
        (2, "completely different lead-in, then " + shared + "!"),
        (3, "no overlap with anything else here at all, promise"),
        (4, "short"),  # below k+w-1: filtered out entirely
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        d: {r["fingerprint"] for r in g}
        for d, g in __import__("itertools").groupby(
            sorted(
                winnow_fingerprints(docs).collect(), key=lambda r: r["doc_id"]
            ),
            key=lambda r: r["doc_id"],
        )
    }
    for doc_id, text in rows:
        expect = (
            _winnow_py(text, WINNOW_K, WINNOW_W)
            if len(text) >= WINNOW_K + WINNOW_W - 1
            else set()
        )
        assert got.get(doc_id, set()) == expect, doc_id
    assert got[1] & got[2], "shared substring must share a fingerprint"
    assert not (got[1] & got[3] or got[2] & got[3])


def test_winnowing_random_corpus_matches_reference(spark):
    """Spark winnowing == the Python reference over 60 seeded-random
    docs of mixed alphabet/length (incl. below-threshold and
    all-identical-char edge cases) — one round-trip, exhaustive compare."""
    import random

    from etl_project_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    rng = random.Random(20260813)
    alphabet = "ab cd!\tXY.z"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))))
        for i in range(58)
    ] + [(58, "a" * 30), (59, "Aa" * 15)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for doc_id, text in rows:
        expect = (
            _winnow_py(text, WINNOW_K, WINNOW_W)
            if len(text) >= WINNOW_K + WINNOW_W - 1
            else set()
        )
        assert got.get(doc_id, set()) == expect, (doc_id, text)


def test_winnowing_arrow_kernel_equals_relational(spark):
    """tx10's Arrow kernel == the relational winnowing form on a
    seeded-random mixed corpus (ASCII + non-ASCII + edge docs): the
    round-3 kernel swap may not change a single fingerprint."""
    import random

    from etl_project_spark.operators.text import (
        winnow_fingerprints,
        winnow_fingerprints_arrow,
    )

    rng = random.Random(20260814)
    alphabet = "ab cd!\tXY.zé漢"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))))
        for i in range(40)
    ] + [(40, "a" * 30), (41, "Aa" * 15), (42, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def as_sets(df):
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        return got

    assert as_sets(winnow_fingerprints_arrow(spark, docs)) == as_sets(
        winnow_fingerprints(docs)
    )


def _rabin_winnow_py(text: str, k: int, w: int) -> set[int]:
    """Pure-Python reference of tx11: Rabin codepoint-polynomial hash
    computed by the O(1) ROLLING recurrence (the streaming form), then
    the same min-per-window winnowing selection."""
    from etl_project_spark.operators.text import RABIN_B, RABIN_P

    lt = text.lower()
    if len(lt) < k + w - 1:
        return set()
    cps = [ord(c) for c in lt]
    top = pow(RABIN_B, k - 1, RABIN_P)
    h = 0
    for c in cps[:k]:
        h = (h * RABIN_B + c) % RABIN_P
    hs = [h]
    for i in range(1, len(cps) - k + 1):
        h = ((h - cps[i - 1] * top) * RABIN_B + cps[i + k - 1]) % RABIN_P
        hs.append(h)
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


def test_rabin_winnowing_matches_rolling_reference(spark, sf_dir):
    """tx11's vectorized dot-product kernel == the O(1) rolling
    recurrence on random text (they are the same polynomial), and the
    MOSS guarantee carries over to the cheap hash."""
    import random

    from etl_project_spark.operators.text import WINNOW_K, WINNOW_W
    from etl_project_spark.registry import get

    rng = random.Random(20260815)
    alphabet = "ab cd!\tXY.zé漢"
    shared = "the quick brown fox jumps"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))))
        for i in range(40)
    ] + [
        (40, "alpha beta gamma " + shared + " tail one"),
        (41, "completely different lead-in, then " + shared + "!"),
    ]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # tx11 loads the documents table from a dir; stage the corpus as
        # one with the same (doc_id, text) columns
        pdf.to_parquet(os.path.join(td, "documents.parquet"))
        got: dict[int, set] = {}
        for r in get("tx11_rabin_winnowing").fn(spark, td).collect():
            got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for doc_id, text in rows:
        assert (
            got.get(doc_id, set())
            == _rabin_winnow_py(text, WINNOW_K, WINNOW_W)
        ), (doc_id, text)
    assert got[40] & got[41], "shared substring must share a fingerprint"


def _shingles_py(text: str, n: int = 3) -> list[str]:
    """Pure-Python reference of the _shingles contract: distinct word
    n-grams in first-occurrence order; documents shorter than n tokens
    yield their single partial shingle."""
    toks = text.lower().split(" ")
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    seen, out = set(), []
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def test_shingles_random_texts_match_reference(spark):
    """The zip-of-shifted-slices shingle expression == the pure-Python
    n-gram rule on randomized texts, including the short-doc edge cases
    the zip null-padding handles (0/1/2 tokens, repeated tokens,
    multi-space gaps produce empty tokens in both)."""
    import random

    import pyspark.sql.functions as F

    from etl_project_spark.operators.dedup import _shingles

    rng = random.Random(20260813)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "Y", "π"]
    texts = ["", "one", "one two", "a a a a a", "a  b"]
    for _ in range(60):
        k = rng.randint(1, 12)
        texts.append(" ".join(rng.choice(vocab) for _ in range(k)))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: list(r["sh"])
        for r in df.select("i", _shingles(3).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        assert sorted(got[i]) == sorted(set(_shingles_py(t))), (i, t)


@given(
    syms=st.lists(
        st.sampled_from(["a", "b", "c", "ab", "bc"]), min_size=0, max_size=12
    ),
    li=st.sampled_from(["a", "b", "c", "ab"]),
    ri=st.sampled_from(["a", "b", "c", "bc"]),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_replace_semantics_identical_across_engines(spark, syms, li, ri):
    """The BPE merge step's load-bearing assumption, pinned: one
    single-pass ' l r ' -> ' lr ' replace behaves identically in Python
    (str.replace — the trainer and the Arrow apply kernel), Spark SQL
    (replace() — the round-3 literal-chain form), and DuckDB (REPLACE —
    every oracle): leftmost match, non-overlapping, scan resumes after
    the replacement. Random symbol runs include the adversarial
    ' a a a ' overlap case."""
    import duckdb

    s = " " + " ".join(syms) + " " if syms else "  "
    pat, rep = f" {li} {ri} ", f" {li}{ri} "
    py = s.replace(pat, rep)
    sp = spark.sql(
        "SELECT replace(:s, :p, :r) AS o",
        args={"s": s, "p": pat, "r": rep},
    ).collect()[0]["o"]
    dk = duckdb.execute(
        "SELECT REPLACE(?, ?, ?) AS o", [s, pat, rep]
    ).fetchone()[0]
    assert py == sp == dk, (s, pat, py, sp, dk)


def test_systematic_pps_invariants(spark, sf_dir):
    """smp8's grid identities, checked against the registry query
    itself: Σ n_picks == SMP8_K exactly (every grid point lands in
    exactly one weight interval), every picked doc's interval really
    covers a grid point, and a doc heavier than one grid step is
    always picked (the PPS inclusion guarantee πᵢ = min(1, K·wᵢ/W))."""
    from pyspark.sql import functions as F

    from etl_project_spark.operators.pipeline import SMP8_K
    from etl_project_spark.registry import get

    out = get("smp8_systematic_pps_sample").fn(spark, sf_dir)
    agg = out.agg(
        F.sum("n_picks").alias("total_picks"),
        F.min("n_picks").alias("mn"),
    ).collect()[0]
    assert agg["total_picks"] == SMP8_K
    assert agg["mn"] >= 1
    # independent replay over the full corpus (small at test sf)
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    total = sum(w for _, w in rows)
    cum, expect = 0, {}
    for doc_id, w in rows:
        before, cum = cum, cum + w
        n = (cum * SMP8_K) // total - (before * SMP8_K) // total
        if n > 0:
            expect[doc_id] = n
        if w * SMP8_K >= total:  # heavier than a grid step → must pick
            assert n >= 1
    got = {r["doc_id"]: r["n_picks"] for r in out.collect()}
    assert got == expect


def test_lexical_diversity_count_orderings(spark, sf_dir):
    """tx18 invariants on the real corpus: 1 <= hapax <= types <=
    tokens for every doc, ratios in (0, 1], and n_tokens equals tx1's
    independent token count for every doc."""
    from pyspark.sql import functions as F

    from etl_project_spark.registry import get

    out = get("tx18_lexical_diversity").fn(spark, sf_dir)
    bad = out.filter(
        ~(
            (F.col("n_hapax") >= 0)
            & (F.col("n_hapax") <= F.col("n_types"))
            & (F.col("n_types") <= F.col("n_tokens"))
            & (F.col("type_token_ratio") > 0)
            & (F.col("type_token_ratio") <= 1.0)
            & (F.col("hapax_frac") <= 1.0)
        )
    ).count()
    assert bad == 0
    tx1 = get("tx1_doc_stats").fn(spark, sf_dir).select(
        "doc_id", "n_tokens", F.col("n_unique_tokens").alias("u")
    )
    mismatch = (
        out.select("doc_id", F.col("n_tokens").alias("t18"), "n_types")
        .join(tx1, "doc_id")
        .filter(
            (F.col("t18") != F.col("n_tokens"))
            | (F.col("n_types") != F.col("u"))
        )
        .count()
    )
    assert mismatch == 0


def test_context_audit_identities(spark, sf_dir):
    """pp14 accounting identities per source: n_fit <= n_docs,
    overflow_tokens == 0 iff all docs fit, n_contexts_split >= n_docs,
    and kept+overflow == total tokens (truncation conserves mass)."""
    from pyspark.sql import functions as F

    from etl_project_spark.operators.pipeline import PP14_SEQ_LEN
    from etl_project_spark.registry import get

    rows = get("pp14_context_window_audit").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_fit"] <= r["n_docs"]
        assert r["n_contexts_split"] >= r["n_docs"]
        kept = round(
            r["truncate_utilization"] * r["n_docs"] * PP14_SEQ_LEN
        )
        # kept tokens + overflow == corpus tokens (up to the 1e-6 round)
        assert abs(kept + r["overflow_tokens"] - r["n_tokens"]) <= max(
            1, r["n_docs"] * PP14_SEQ_LEN // 1_000_000
        )
        assert (r["overflow_tokens"] == 0) == (r["n_fit"] == r["n_docs"])


def test_zipf_slope_detects_powerlaw(spark, tmp_path):
    """lm7 on a PLANTED power-law corpus: token t_r appears with
    frequency proportional to 1/r across the corpus, so the fitted
    slope must be ≈ -1 with r² ≈ 1 — and on a planted UNIFORM corpus
    (every token equally frequent) the slope must be ≈ 0. The
    discriminative property the diagnostic exists for."""
    from pyspark.sql import functions as F

    from etl_project_spark.registry import get

    # power law: doc r (r = 1..300) holds ceil(600/r) copies of token
    # w{r} — freq(w_r) = ceil(600/r), rank order = r
    docs = spark.range(1, 301).select(
        F.col("id").alias("doc_id"),
        F.lit("pl").alias("lang"),
        F.array_join(
            F.array_repeat(
                F.concat(F.lit("w"), F.col("id")),
                F.ceil(F.lit(600) / F.col("id")).cast("int"),
            ),
            " ",
        ).alias("text"),
    )
    uni = spark.range(301, 601).select(
        F.col("id").alias("doc_id"),
        F.lit("un").alias("lang"),
        F.array_join(
            F.array_repeat(F.concat(F.lit("u"), F.col("id")), 7), " "
        ).alias("text"),
    )
    # degenerate: one token TYPE in the whole language → a single rank,
    # so the OLS denominator n·sxx − sx² is exactly 0 (x = ln(1) = 0)
    # and the fit must be NULL in both engines (ADVICE r8 guard)
    dg = spark.range(601, 611).select(
        F.col("id").alias("doc_id"),
        F.lit("dg").alias("lang"),
        F.lit("same same same").alias("text"),
    )
    docs.unionAll(uni).unionAll(dg).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["lang"]: r
        for r in get("lm7_zipf_slope").fn(spark, str(tmp_path)).collect()
    }
    # ceil() quantization of the planted counts flattens the tail a
    # touch (measured slope -0.926), so the band is [-1.1, -0.85] —
    # still an order of magnitude away from the uniform corpus's 0
    assert -1.1 < got["pl"]["zipf_slope"] < -0.85, got["pl"]
    assert got["pl"]["r2"] > 0.98
    assert abs(got["un"]["zipf_slope"]) < 0.01, got["un"]
    assert got["dg"]["n_ranks"] == 1
    assert got["dg"]["zipf_slope"] is None
    assert got["dg"]["zipf_intercept"] is None
    assert got["dg"]["r2"] is None


def test_cross_source_entropy_matches_python(spark, sf_dir):
    """lm8's S x S matrix must equal a from-scratch Python
    recomputation of add-one-smoothed unigram cross-entropy, and the
    diagonal must be each source's own (lowest-transfer-surprise)
    model applied to itself."""
    import math
    from collections import Counter, defaultdict

    from etl_project_spark.catalog import load_table
    from etl_project_spark.registry import get

    cnt: dict = defaultdict(Counter)
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    ):
        cnt[r.source].update(r.text.lower().split(" "))
    vocab = len({w for c in cnt.values() for w in c})
    tot = {s: sum(c.values()) for s, c in cnt.items()}
    rows = get("lm8_cross_source_entropy").fn(spark, sf_dir).collect()
    assert len(rows) == len(cnt) ** 2
    for r in rows:
        tr, ev = cnt[r.train_source], cnt[r.eval_source]
        n_ev = tot[r.eval_source]
        assert r.n_eval_tokens == n_ev
        expect = math.log(tot[r.train_source] + vocab) - (
            sum(c * math.log(tr[w] + 1) for w, c in ev.items() if w in tr)
            / n_ev
        )
        assert abs(r.cross_entropy - expect) < 1e-5, (
            r.train_source,
            r.eval_source,
        )


def test_seasonal_decomposition_identities(spark, sf_dir):
    """ts10 invariants: the additive identity holds exactly on every
    full-window row, trend is null exactly where the 25-CALENDAR-hour
    window is not fully observed (edges of the span, or any gap hour
    within reach — the sf0.001 fixture has real gaps), the de-meaned
    seasonal indexes sum to ~0, and value_mean reproduces the
    quantized hourly average."""
    import datetime
    import math
    from collections import defaultdict

    from etl_project_spark.catalog import load_table
    from etl_project_spark.operators.timeseries import TS10_HALF, TS10_Q
    from etl_project_spark.registry import get

    rows = sorted(
        get("ts10_seasonal_decomposition").fn(spark, sf_dir).collect(),
        key=lambda r: r.bucket_hour,
    )
    hour = datetime.timedelta(hours=1)
    # observed hours from the RAW events: the published relation can
    # drop hours whose hour-of-day earned no seasonal index
    observed = {
        e.ts.replace(minute=0, second=0, microsecond=0)
        for e in load_table(spark, sf_dir, "events")
        .select("ts")
        .filter("value is not null")
        .collect()
    }
    lo, hi = min(observed), max(observed)
    for r in rows:
        full_window = all(
            lo <= r.bucket_hour + k * hour <= hi
            and r.bucket_hour + k * hour in observed
            for k in range(-TS10_HALF, TS10_HALF + 1)
        )
        assert (r.trend is not None) == full_window, r
        if r.trend is not None:
            assert r.residual == r.value_mean - r.trend - r.seasonal
    # seasonal is one de-meaned value per hour-of-day
    by_hod = {}
    for r in rows:
        by_hod.setdefault(r.bucket_hour.hour, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in by_hod.values())
    assert abs(sum(next(iter(v)) for v in by_hod.values())) < 1e-9
    # value_mean replays the micro-quantized hourly average
    acc = defaultdict(lambda: [0, 0])
    for e in (
        load_table(spark, sf_dir, "events")
        .select("ts", "value")
        .filter("value is not null")
        .collect()
    ):
        a = acc[e.ts.replace(minute=0, second=0, microsecond=0)]
        a[0] += math.floor(e.value * TS10_Q + 0.5)
        a[1] += 1
    for r in rows:
        sq, cnt = acc[r.bucket_hour]
        assert r.value_mean == math.floor(sq / cnt + 0.5) / TS10_Q
        assert r.n_events == cnt


def test_seasonal_decomposition_sparse_calendar_alignment(
    spark, tmp_path
):
    """ts10 on a series with a MISSING hour: the 2x24 moving average
    must stay calendar-aligned — trend is defined exactly on observed
    hours whose full 25-calendar-hour window is observed, and each
    defined trend equals an independent pure-Python replay of the
    integer pipeline on the calendar grid. Before r10 the ROWS frame
    ran over the gapped relation, silently pulling hour h+13 into
    hour h's window past a gap."""
    import datetime
    import math

    from etl_project_spark.operators.timeseries import TS10_HALF, TS10_Q
    from etl_project_spark.registry import get

    base = datetime.datetime(2024, 3, 1)
    gap = 30
    hours = [h for h in range(60) if h != gap]
    rows = [
        (
            base + datetime.timedelta(hours=h, minutes=20 * j),
            10.0 + (h % 24) + 0.37 * j,
        )
        for h in hours
        for j in range(3)
    ]
    spark.createDataFrame(rows, "ts timestamp, value double").write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.bucket_hour.hour + 24 * (r.bucket_hour.day - 1): r
        for r in get("ts10_seasonal_decomposition")
        .fn(spark, str(tmp_path))
        .collect()
    }

    # independent replay: quantized hourly means on the calendar grid
    mq = {
        h: math.floor(
            sum(
                math.floor((10.0 + (h % 24) + 0.37 * j) * TS10_Q + 0.5)
                for j in range(3)
            )
            / 3
            + 0.5
        )
        for h in hours
    }
    half = TS10_HALF
    full = {
        h
        for h in hours
        if h - half >= 0
        and h + half <= 59
        and all(x in mq for x in range(h - half, h + half + 1))
    }
    assert full == set(range(12, 18)) | set(range(43, 48))
    for h, r in got.items():
        if h in full:
            t48 = sum(mq[x] for x in range(h - half, h + half)) + sum(
                mq[x] for x in range(h - half + 1, h + half + 1)
            )
            assert r.trend == t48 / float(4 * half * TS10_Q), h
        else:
            assert r.trend is None, h
        assert r.value_mean == mq[h] / float(TS10_Q)
    # every observed hour whose hour-of-day earned a seasonal index
    # is published (the seasonal join is on hour-of-day)
    hods = {h % 24 for h in full}
    assert set(got) == {h for h in hours if h % 24 in hods}


def test_simplified_silhouette_matches_numpy(spark, sf_dir):
    """km2's per-cluster stats must equal an INDEPENDENT numpy replay
    of the whole Lloyd loop from the raw embeddings — seeds, centroid
    updates, penultimate membership, final-centroid distances — never
    touching _kmeans_state_trace, so a construction bug shared between
    the operator and its memoized state (e.g. scoring the final
    re-assignment, which makes s >= 0 a tautology) is detectable
    here."""
    import numpy as np

    from etl_project_spark.catalog import load_table
    from etl_project_spark.operators.clustering import (
        KM_ITERS,
        KM_K,
        KM_QSCALE,
    )
    from etl_project_spark.registry import get

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    M = np.floor(
        np.array([emb[i].embedding for i in order], dtype=np.float64)
        * KM_QSCALE
        + 0.5
    ).astype(np.int64)

    def assign(C, cls):
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d, cls[np.argmin(d * KM_K + cls[None, :], axis=1)]

    cls = ids[:KM_K].copy()
    C = M[:KM_K].astype(np.int64)
    own = None
    for _ in range(KM_ITERS - 1):
        _, own = assign(C, cls)
        cls = np.unique(own)
        C = np.stack(
            [
                np.floor(
                    M[own == c].sum(axis=0) / (own == c).sum() + 0.5
                ).astype(np.int64)
                for c in cls
            ]
        )
    # membership = the assignment that built the final C; distances
    # (a, b) are against the UPDATED final C
    d_f = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    col = {int(c): i for i, c in enumerate(cls)}
    own_ix = np.array([col[int(c)] for c in own], dtype=np.int64)
    rows = np.arange(len(M))
    a = d_f[rows, own_ix]
    masked = d_f.copy()
    masked[rows, own_ix] = np.iinfo(np.int64).max
    b = masked.min(axis=1)
    denom = np.maximum(a, b)
    s = np.where(denom == 0, 0.0, (b - a) / np.maximum(denom, 1))
    got = {
        r.cluster: r
        for r in get("km2_simplified_silhouette").fn(spark, sf_dir).collect()
    }
    assert sum(r.n_members for r in got.values()) == len(M)
    for k, r in got.items():
        mask = own == k
        assert r.n_members == mask.sum()
        assert abs(r.mean_silhouette - round(s[mask].mean(), 6)) <= 1e-6
        assert abs(r.min_silhouette - round(s[mask].min(), 6)) <= 1e-6
        assert r.n_misfit == (s[mask] < 0).sum()
        assert -1 <= r.min_silhouette <= r.mean_silhouette <= 1
    # the fixture must exercise the negative branch somewhere, or the
    # misfit column is untested (it was structurally zero before r10)
    assert (s < 0).any(), "fixture never exercises s < 0"
