"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine — the dedup family a 100 TB training-data pipeline
needs.  (The reference concatenates uploads without dedup,
``utils/file_utils.py:413`` — absent there, first-class here.)

Scale shapes:
- exact: hash-groupBy (one shuffle of (hash, id) pairs, not texts).
- n-gram Jaccard: shingle-explode self-join — the join key is the
  shingle hash, so co-occurring docs meet without all-pairs.
- MinHash+LSH: 64 permutations aggregated in ONE groupBy (64 agg
  columns, map-side partial), banded into 16 buckets; candidate pairs
  only inside a bucket; exact Jaccard verifies candidates.
- SimHash: 64-bit signature via per-bit majority vote, one groupBy.
- embedding cosine: block self-join on an LSH/band key or brute force
  below a size threshold.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window as W, functions as F, types as T

# A cross-engine 60-bit token hash: md5 hex prefix → bigint.  Spark's
# xxhash64/hash have no DuckDB twin; md5 exists in both, and 15 hex
# chars (60 bits) always fit a signed 64-bit int.
def md5_60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _tokenized(docs: DataFrame, n: int, text_col: str) -> DataFrame:
    """(doc_id, toks) for docs with ≥ n tokens — the token array is
    projected ONCE into a column so downstream gram expressions reuse it
    (the inline form re-evaluated the split per referencing expression:
    size, transform and filter each paid it).  Built as one selectExpr
    string — the per-Column form cost ~15 py4j round trips per query
    construction for the identical expression tree."""
    return docs.selectExpr(
        "doc_id",
        f"filter(split(lower(`{text_col}`), ' '), x -> x != '') as toks",
    ).filter(f"size(toks) >= {int(n)}")


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per doc, built with
    JVM-side array ops (transform over token index ranges).  Docs with
    fewer than ``n`` tokens yield no shingles (matching the SQL
    formulation ``range(len - n + 1)``; a truncated partial gram would
    silently diverge from the oracle)."""
    return _tokenized(docs, n, text_col).selectExpr(
        "doc_id",
        "explode(array_distinct(transform("
        f"sequence(0, size(toks) - {int(n)}), "
        f"i -> concat_ws(' ', slice(toks, i + 1, {int(n)}))"
        "))) as shingle",
    )


def _in_predicate(col_name: str, values, dtype):
    """``col IN (…)`` over a collected id list in ONE py4j call.

    ``Column.isin(vs)`` creates one JVM ``Literal`` per element — a py4j
    round trip each, measured ~2 s of pure DRIVER time for ~5k ids
    (guide §5: the driver should do almost no data work, and this was
    data-proportional plan construction).  Rendering the predicate as a
    single SQL string costs one round trip and parses in the JVM in
    milliseconds, producing the SAME ``In(col, literals)`` expression —
    parquet ``PushedFilters: In(doc_id, …)`` behavior is unchanged.

    Only integral values are rendered (their SQL spelling is exact);
    everything else falls back to ``isin`` unchanged (string literals
    would need parser-config-dependent escaping — not worth the risk).
    """
    vals = list(values)
    if not vals:
        return F.lit(False)
    integral = isinstance(
        dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    )
    if integral and all(
        isinstance(v, int) and not isinstance(v, bool) for v in vals
    ):
        rendered = ",".join(str(v) for v in vals)
        return F.expr(f"`{col_name}` IN ({rendered})")
    return F.col(col_name).isin(vals)


def _local_pairs_df(spark, local_pairs, schema):
    """LocalRelation for collected (a, b) pairs — via pandas so the
    conversion rides Arrow (one buffer) instead of pickling row tuples
    through py4j (measured ~1 s of driver time at a few thousand rows);
    falls back to the plain list path for exotic id types."""
    simple = all(
        isinstance(f.dataType, (T.LongType, T.IntegerType, T.StringType))
        for f in schema.fields
    )
    if simple and local_pairs:
        try:
            import pandas as pd

            pdf = pd.DataFrame(
                local_pairs, columns=[f.name for f in schema.fields]
            )
            return spark.createDataFrame(pdf, schema=schema)
        except Exception:  # pragma: no cover — pandas/Arrow unavailable
            pass
    return spark.createDataFrame(local_pairs, schema=schema)


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    text_col: str = "text",
    only_pairs: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥
    threshold, rounded to 6 dp.

    Without ``only_pairs`` (the all-pairs oracle shape): shingle-explode
    self-join — the join key is the shingle, so cost is Σ |bucket|² over
    shingles, not |corpus|².

    ``only_pairs`` (doc_a, doc_b) restricts the computation to candidate
    pairs, and switches to the per-pair shape (r6): each candidate pair
    joins the two docs' DISTINCT-shingle arrays and the intersection is
    computed array-locally — no shingle explode, no self-join, so the
    verify does O(|shingles|) work per pair instead of Σ |bucket|² over
    the candidate docs' shingles.  The old self-join verify degraded
    quadratically when candidates clustered (many docs sharing the same
    shingles — exactly what near-dup candidates do, and a hot shingle is
    a skew key for the join); the array form is linear in candidate
    count and immune to hot shingles.  Output is identical: same
    distinct-shingle sets, same |∩| / (|a|+|b|−|∩|) formula, same
    rounding (oracle-parity tested).
    """
    if only_pairs is not None:
        # r6: ONE bounded collect of the candidate PAIRS themselves
        # (≤1M — the engine's standard bounded-collect budget,
        # operators/skew.py).  Two things follow from it:
        # - the candidate-doc restriction becomes an isin literal that
        #   pushes through union/repartition into the parquet scan
        #   (PushedFilters: In(doc_id, …)) — the verify re-reads
        #   O(candidate docs), not O(corpus);
        # - the pair list becomes a LocalRelation, so the verify's plan
        #   carries ZERO reference to the candidate lineage.  This
        #   matters: the LSH band self-join that produces the pairs is
        #   the most expensive subtree in the job, and referencing
        #   ``only_pairs`` from the verify plan re-evaluated it (one
        #   extra band join per reference, measured ~3 s of a 4 s verify
        #   at the 50k-doc scale, even with the pairs persisted).
        # Past the bound, the lazy plan-shaped fallback keeps the old
        # semi-join form.
        # the doc_a < doc_b orientation filter runs IN SPARK before the
        # collect so pair comparison semantics (e.g. string ordering)
        # are the engine's, identical to the old grouped-self-join path;
        # de-duplication is plain equality — engine-agnostic, so it runs
        # in Python on the collected rows (no extra distinct shuffle)
        pair_rows = (
            only_pairs.select("doc_a", "doc_b")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .limit(1_000_001)
            .collect()
        )
        if len(pair_rows) <= 1_000_000:
            local_pairs = list({(r["doc_a"], r["doc_b"]) for r in pair_rows})
            ids = sorted({x for p in local_pairs for x in p})
            docs = docs.filter(
                _in_predicate("doc_id", ids, docs.schema["doc_id"].dataType)
            )
            cand = _local_pairs_df(
                docs.sparkSession,
                local_pairs,
                T.StructType(
                    [
                        T.StructField(
                            "doc_a", only_pairs.schema["doc_a"].dataType
                        ),
                        T.StructField(
                            "doc_b", only_pairs.schema["doc_b"].dataType
                        ),
                    ]
                ),
            )
        else:
            cand_docs = (
                only_pairs.select(F.col("doc_a").alias("doc_id"))
                .unionByName(only_pairs.select(F.col("doc_b").alias("doc_id")))
                .distinct()
            )
            docs = docs.join(F.broadcast(cand_docs), "doc_id", "left_semi")
            # pairs as given, constrained to the old path's doc_a < doc_b
            # orientation and de-duplicated (the grouped self-join
            # emitted one row per distinct pair regardless of input
            # multiplicity)
            cand = (
                only_pairs.select("doc_a", "doc_b")
                .filter(F.col("doc_a") < F.col("doc_b"))
                .distinct()
            )
        # distinct-shingle ARRAY per candidate doc (never exploded)
        arrs = _tokenized(docs, n, text_col).selectExpr(
            "doc_id",
            "array_distinct(transform("
            f"sequence(0, size(toks) - {int(n)}), "
            f"i -> concat_ws(' ', slice(toks, i + 1, {int(n)}))"
            ")) as sh",
        )
        pa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        pb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        denom = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
        return (
            cand.join(pa, "doc_a")
            .join(pb, "doc_b")
            .withColumn(
                "jaccard",
                F.round(inter.cast("double") / denom.cast("double"), 6),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
    sh = word_shingles(docs, n=n, text_col=text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
NUM_PERMS = 64
NUM_BANDS = 16  # 16 bands × 4 rows


_MERSENNE31 = (1 << 31) - 1  # permutation modulus (universal hashing)


def minhash_signatures(
    docs: DataFrame, n: int = 3, text_col: str = "text",
    num_perms: int = NUM_PERMS, seed: int = 1,
) -> DataFrame:
    """(doc_id, h0..h63): min over shingles of 64 seeded permutations.

    ONE base hash per shingle + 64 affine maps ``(a·x + b) mod 2^31-1``
    (the standard universal-hash permutation family) — 64× cheaper than
    hashing each shingle per permutation, measured 30×+ wall-clock on
    the sf0.1 corpus.  The products stay under 2^62, inside bigint.

    The base hash is ``xxhash64`` (no cryptographic digest in the hot
    loop: md5 → xxhash64 measured ~25% faster warm and ~3× faster on the
    first execution, which pays md5's much larger codegen).  The hash
    family only affects WHICH permutations the mins come from; false
    POSITIVES are always removed by the exact-Jaccard verify, and the
    16×4 banding's recall at threshold 0.8 is an empirical ≈1 — measured
    exact-equal to the all-pairs oracle on the gate corpora, and
    re-checked every run by ``tests/test_oracle_parity.py`` (which gates
    the brute-force baselines too, so a recall miss can never drift in
    silently).  Signatures themselves have no oracle; xxhash64 needs no
    DuckDB twin.

    ZERO shuffle (r6): the shingle hashes stay an array column and each
    permutation's min is array-local, so the signature pass is a pure
    narrow map over the corpus — the 10^12-scale shape (the naive
    shingle×perm explode multiplies a shuffle by 64 that this plan
    doesn't even have; per-perm full hashing multiplies the *CPU* by
    64).

    The 64 affine-min maps themselves run in numpy over whole Arrow
    batches (guide §4.2): Spark's higher-order array functions evaluate
    their lambda interpreted per element, so 64 ``array_min(transform)``
    passes cost ~64 interpreted evals per shingle hash; one vectorized
    ``(flat·a + b) mod M`` + ``minimum.reduceat`` per batch does the
    same 64×|shingles| integer ops at native speed (measured −26% on
    the signature stage at the 50k-doc scale, identical output — int64
    affine arithmetic never overflows: h,a < 2^31 → h·a+b < 2^63).
    The plan stays a pure narrow map (Scan → Project → ArrowEvalPython;
    Exchange == 0 asserted by tests/test_plans.py)."""
    import random

    import pandas as pd  # noqa: F401 — pandas_udf return path

    rng = random.Random(seed)
    coeffs = [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(num_perms)
    ]
    # r6: ZERO-shuffle signatures.  A document's shingle hashes live in
    # one array column (no shingle string — hash the token tuples
    # directly), and each permutation's min is array-local — so the
    # explode + groupBy(doc_id) 64-min aggregate (one full Exchange of
    # every shingle hash) is gone entirely.  The min over the same value
    # multiset is identical, so signatures are bit-identical to the
    # aggregate form.
    gram_args = ", ".join(f"element_at(toks, i + {j + 1})" for j in range(n))
    hashed = _tokenized(docs, n, text_col).selectExpr(
        "doc_id",
        "array_distinct(transform("
        f"sequence(0, size(toks) - {int(n)}), "
        f"i -> pmod(xxhash64({gram_args}), {_MERSENNE31}L)"
        ")) as hbase",
    )

    mins = _mins_udf(tuple(coeffs))

    sig = hashed.select("doc_id", mins("hbase").alias("sig"))
    # one selectExpr call: the former per-column F.element_at/.alias
    # Column building cost 128 py4j round trips per CONSTRUCTION
    # (~0.1 s of driver time every bench run) for the same projection
    return sig.selectExpr(
        "doc_id",
        *[f"element_at(sig, {i + 1}) as h{i}" for i in range(num_perms)],
    )


# pandas_udf objects cached per coefficient set: creating one costs a
# cloudpickle of the closure + a py4j registration (~0.1-0.2 s of driver
# time), which the former inline definition paid on EVERY query
# construction; the wrapped function is stateless w.r.t. the DataFrame,
# so reuse across plans/sessions is sound
_MINS_UDF_CACHE: dict = {}


def _mins_udf(coeffs: tuple):
    if coeffs in _MINS_UDF_CACHE:
        return _MINS_UDF_CACHE[coeffs]
    import pandas as pd  # noqa: F401 — pandas_udf return path

    a_vec = [a for a, _ in coeffs]
    b_vec = [b for _, b in coeffs]

    # NB: no type hints — pd is function-local, so the PySpark type-hint
    # prober can't resolve the string annotations
    @F.pandas_udf("array<long>")
    def mins(hb):
        import numpy as np

        if len(hb) == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(v) for v in hb), dtype=np.int64, count=len(hb))
        flat = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in hb]
        )
        a = np.asarray(a_vec, dtype=np.int64)
        b = np.asarray(b_vec, dtype=np.int64)
        starts = np.zeros(len(hb), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # permutation axis processed in memory-bounded blocks: the 2-D
        # intermediate is block × |shingles in batch| — Arrow bounds
        # ROWS per batch, not shingles, so a giant-doc batch with a
        # full-width intermediate would be 64 × |flat| (gigabytes at
        # 10^7 shingles).  Normal batches (≤ ~250k shingles) still run
        # full-width in one op; only outsized batches pay the loop,
        # capped at ~128 MB of intermediate either way.
        blk = max(8, min(len(a), 16_000_000 // max(flat.size, 1)))
        out = np.empty((len(hb), len(a)), dtype=np.int64)
        for i in range(0, len(a), blk):
            blk_a = a[i : i + blk][:, None]
            blk_b = b[i : i + blk][:, None]
            vals = (flat[None, :] * blk_a + blk_b) % _MERSENNE31
            out[:, i : i + blk] = np.minimum.reduceat(vals, starts, axis=1).T
        return pd.Series(list(out))

    _MINS_UDF_CACHE[coeffs] = mins
    return mins


def _bucket_pairs(
    buckets: DataFrame, id_col: str, a_name: str, b_name: str
) -> DataFrame:
    """Distinct id pairs sharing any (band, key) bucket — the shared
    tail of every banded-LSH scheme here.

    ONE ``groupBy(band, key)`` collects each bucket's ids and the i<j
    pairs are generated array-locally from the sorted list (r6 third
    pass; previously a bucket SELF-JOIN).  The join form shuffled the
    bucket rows twice (one Exchange per join side — exchange reuse does
    not fire under AQE, which is also why the upstream signatures had to
    be persisted) and paid two sort-merge sorts; the groupBy form
    shuffles them once, needs no sort and no persist, and references the
    signature subtree exactly once.  Output is identical: ``sort_array``
    orders by the engine's own comparator, so emitting (ids[i], ids[j])
    for i<j plus the ``a < b`` filter reproduces the join+filter
    semantics exactly (including duplicate-id and NULL-id edge cases —
    ``collect_list`` drops NULL ids, which the old path's ``a < b``
    filter also discarded).  Buckets with ≥2 members are near-dup-sized
    by construction (band keys are parameterized so random collisions
    are rare), and a giant bucket is Σ|bucket|² work in BOTH forms —
    the groupBy form just materializes the bucket's id list (not its
    payloads) in one task first.
    """
    grouped = (
        buckets.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select(f"p.{a_name}", f"p.{b_name}")
        .filter(F.col(a_name) < F.col(b_name))
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_bands: int = NUM_BANDS,
    num_perms: int = NUM_PERMS,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidates.

    The bucket key is ``xxhash64(band, h_i…)`` — one native JVM hash
    over the band's signature columns (bigint shuffle key), not a
    cryptographic digest of a concatenated string; a key collision can
    only ADD a candidate pair, which the exact-Jaccard verify removes.
    Pair generation is the one-shuffle groupBy form — see
    :func:`_bucket_pairs`.
    """
    rows = num_perms // num_bands
    # one selectExpr string builds all band structs in a single py4j
    # round trip (the per-Column form cost ~100 round trips per query
    # construction); the parsed expressions are identical — SQL integer
    # literals and xxhash64's default seed match F.lit/F.xxhash64
    structs = ",".join(
        "struct({b} as band, xxhash64({b}, {cols}) as key)".format(
            b=band,
            cols=", ".join(f"h{band * rows + r}" for r in range(rows)),
        )
        for band in range(num_bands)
    )
    buckets = signatures.selectExpr(
        "doc_id", f"explode(array({structs})) as b"
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    return _bucket_pairs(buckets, "doc_id", "doc_a", "doc_b")


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float, n: int = 3, text_col: str = "text",
    persist_candidates: bool = True,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard ≥ threshold.

    The exact-Jaccard verify runs ONLY over the candidate pairs'
    documents (``only_pairs``), so the cost is the MinHash pass plus a
    shingle join over the candidate subset — never an all-pairs scan.
    At high thresholds the 16×4 banding's recall is ≈1, so output
    matches exact all-pairs Jaccard.

    ``persist_candidates`` (default on) caches the CANDIDATE PAIRS,
    which the >1M-pair fallback of the verify references three times
    (candidate-doc derivation ×2 + the pair distinct) — Spark's exchange
    reuse does not de-duplicate the subtree under AQE, so unpersisted,
    the signature pipeline (the expensive part) would execute per
    reference.  Pairs are near-dup-sized — the persisted-intermediate
    contract a production run uses anyway; pass False to keep the plan
    fully lazy.  The signatures themselves no longer need a persist:
    the groupBy band form (:func:`_bucket_pairs`, r6 third pass)
    references the signature subtree exactly once."""
    signatures = minhash_signatures(docs, n=n, text_col=text_col)
    candidates = lsh_candidate_pairs(signatures)
    if persist_candidates:
        candidates = candidates.persist()
    return jaccard_pairs(
        docs, threshold=threshold, n=n, text_col=text_col, only_pairs=candidates
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 60  # md5_60 gives 60 usable bits


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over token hashes.

    Pure relational: explode distinct tokens → one groupBy with 60
    conditional-sum agg columns → recombine bits.  Ties (sum == 0)
    resolve to bit 0.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit(""))
    t = docs.select(
        "doc_id", F.explode(F.array_distinct(toks)).alias("tok")
    ).withColumn("th", md5_60(F.col("tok")))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    votes = t.groupBy("doc_id").agg(*aggs)
    sig = None
    for b in range(SIMHASH_BITS):
        bit = F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(F.lit(0).cast("bigint"))
        sig = bit if sig is None else sig + bit
    return votes.select("doc_id", sig.cast("bigint").alias("simhash"))


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text",
    persist_signatures: bool = True,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, found via
    band join on 4 × 15-bit chunks (a pair within distance 3 must agree
    on ≥1 chunk — pigeonhole), then exact popcount verify.

    Like the other LSH operators, the chunk self-join references the
    signature subtree (the 60-agg-column groupBy) on both sides, so the
    signatures persist by default (12 bytes/doc)."""
    sig = simhash(docs, text_col=text_col)
    if persist_signatures:
        sig = sig.persist()
    chunks = []
    for c in range(4):
        chunks.append(
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * 15)
                .bitwiseAND(F.lit((1 << 15) - 1))
                .alias("key"),
            )
        )
    buckets = sig.select(
        "doc_id", "simhash", F.explode(F.array(*chunks)).alias("b")
    ).select("doc_id", "simhash", "b.chunk", "b.key")
    a = buckets.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"),
        "chunk", "key",
    )
    b = buckets.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
        "chunk", "key",
    )
    pairs = (
        a.join(b, ["chunk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_expr(a, b):
    """Cosine between two array<double> columns, computed with the same
    sequential fold in any engine (deterministic double math).  A zero
    vector yields NULL (ANSI mode would otherwise raise DIVIDE_BY_ZERO,
    and DuckDB's NaN sorts *greater* than any threshold)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    denom = na * nb
    return F.when(denom > 0, dot / denom)


def embedding_dup_pairs(
    embeddings: DataFrame, threshold: float, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine≥threshold) — brute-force O(n²) crossJoin.

    Baseline/oracle ONLY: use :func:`embedding_dup_pairs_bucketed` (the
    SRP-LSH path) for any real corpus — this one dies at scale."""
    v = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


SRP_BITS = 32
SRP_BANDS = 8  # legacy fixed banding (srp_signatures); the scale path
# derives (bits_per_band, num_bands) from corpus size — see
# _srp_band_params

SRP_TARGET_MISS = 1e-2  # per-true-pair miss budget AT the threshold


@functools.lru_cache(maxsize=16)
def _srp_planes(dim: int, n_bits: int, seed: int):
    """Deterministic random hyperplanes (seeded, cached per process —
    the cache makes good on the docstring: the matmul UDFs call this
    once per Arrow batch, and regenerating the matrix per batch was
    wasted executor work).  Callers treat the array as read-only."""
    import numpy as np

    return np.random.default_rng(seed).standard_normal((dim, n_bits))


def _srp_band_params(n_vectors: int, threshold: float) -> tuple[int, int]:
    """Corpus-aware SRP banding: (bits_per_band, num_bands).

    The r5 fixed scheme (8 bands × 4 bits = 16 buckets/band) is bucketed
    *structurally* but not *parametrically*: a random pair shares a
    specific 4-bit band key with probability 1/16, so ~half of ALL pairs
    become candidates once n is large (measured: the sf1.0 bench paid
    ~1e8 full-cosine verifies — brute force with extra shuffles).

    Fix (the standard LSH sizing):
    - ``bits_per_band r = clamp(ceil(log2 n) + 3, 8, 30)`` → ≥8n buckets
      per band, so expected random collisions per band are
      C(n,2)/2^r ≤ n/16 — Σ|bucket|² stays O(n), at any corpus size.
      (+3 rather than +1, r6 second pass: each random candidate pays a
      vector fetch through the verify joins plus an interpreted JVM
      cosine, while each extra projection bit is one numpy dot per
      vector — measured at n = 20k, +2 bits cut candidates 139k → 54k
      and the full query 3.3 → 2.0 s even though the matmul grew 40%.
      The 30-bit cap keeps ≥n buckets/band out to n ≈ 10⁹; past that
      the band count implied by the miss budget makes the signature
      matmul itself the bottleneck and a multi-probe scheme is the
      right tool.)
    - ``num_bands b = ceil(ln(1/miss) / -ln(1 - p^r))`` with
      ``p = 1 − arccos(threshold)/π`` (the SRP bit-agreement
      probability) holds the probability that a TRUE pair at exactly the
      threshold misses every band below ``SRP_TARGET_MISS`` (1%).

    p_miss arithmetic at threshold 0.95 (p = 0.899):
      n = 20,010 → r = 18, p^r = 0.147, b = 29 → miss = (1−0.147)^29 ≈ 1%
      for a pair AT 0.95; at cosine 0.99 (p = 0.955) miss ≈ 6e-8; exact
      duplicates (cosine 1) have identical signatures — miss = 0, always.
    Expected random candidates: b · C(n,2)/2^r ≈ 29 · n/16 ≈ 2n — linear.

    False positives are removed by the exact-cosine verify, so widening
    only trades (bounded, documented) recall on near-threshold pairs for
    the O(n) candidate set; it can never add wrong output rows.
    """
    import math

    n = max(int(n_vectors), 2)
    r = min(30, max(8, math.ceil(math.log2(n)) + 3))
    t = min(max(float(threshold), -1.0), 1.0)
    p = 1.0 - math.acos(t) / math.pi
    p_band = min(max(p ** r, 1e-12), 1.0 - 1e-12)
    b = math.ceil(math.log(SRP_TARGET_MISS) / math.log(1.0 - p_band))
    return r, min(64, max(4, b))


def srp_signatures(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = SRP_BITS,
    seed: int = 7,
) -> DataFrame:
    """(id, sig): signed-random-projection signature — bit b = sign of
    the dot product with seeded hyperplane b.  One vectorized numpy
    matmul per Arrow batch (the 32×d dot products are BLAS work, not
    per-element codegen); identical vectors get identical signatures by
    construction, near vectors agree on most bits
    (P[bit match] = 1 − θ/π, the SRP-LSH guarantee)."""
    import pandas as pd

    # NB: no type hints — pd is function-local, so the PySpark type-hint
    # prober can't resolve the string annotations
    @F.pandas_udf("long")
    def sig(vecs):
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        planes = _srp_planes(mat.shape[1], n_bits, seed)
        bits = (mat @ planes) >= 0.0
        out = np.zeros(len(vecs), dtype=np.int64)
        for b in range(n_bits):
            out |= bits[:, b].astype(np.int64) << b
        return pd.Series(out)

    return embeddings.select(
        F.col(id_col).alias("id"), sig(F.col(vec_col)).alias("sig")
    )


def srp_band_keys(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_per_band: int = 16,
    num_bands: int = 16,
    seed: int = 7,
) -> DataFrame:
    """(id, keys: array<long>[num_bands]) — per-band SRP bucket keys.

    One numpy matmul per Arrow batch against ``num_bands ×
    bits_per_band`` seeded hyperplanes, bits packed band-major into one
    long key per band (so band widths beyond 64 total bits work — the
    corpus-aware sizing needs hundreds of projections at 10⁹⁺ vectors).
    Identical vectors get identical keys in every band by construction.
    The udf object is cached per (bits, bands, seed) — see
    :func:`_mins_udf` for why (cloudpickle + registration per query
    construction is pure driver overhead).
    """
    return embeddings.select(
        F.col(id_col).alias("id"),
        _srp_keys_udf(bits_per_band, num_bands, seed)(F.col(vec_col)).alias(
            "keys"
        ),
    )


@functools.lru_cache(maxsize=16)
def _srp_keys_udf(bits_per_band: int, num_bands: int, seed: int):
    import pandas as pd

    total_bits = bits_per_band * num_bands

    # NB: no type hints — pd is function-local, so the PySpark type-hint
    # prober can't resolve the string annotations
    @F.pandas_udf("array<long>")
    def keys(vecs):
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        planes = _srp_planes(mat.shape[1], total_bits, seed)
        bits = (mat @ planes) >= 0.0
        weights = np.int64(1) << np.arange(bits_per_band, dtype=np.int64)
        packed = (
            bits.reshape(len(vecs), num_bands, bits_per_band).astype(np.int64)
            @ weights
        )
        return pd.Series(list(packed))

    return keys


def embedding_dup_pairs_bucketed(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int | None = None,
    num_bands: int | None = None,
    seed: int = 7,
    persist_signatures: bool = True,
) -> DataFrame:
    """The 100 TB embedding-dedup path: SRP-LSH banding → candidate
    pairs inside shared band buckets → exact cosine verify.

    Mirrors the MinHash+LSH shape (:func:`minhash_lsh_pairs`): the join
    key is (band, key), so pair cost is Σ|bucket|² per band — never the
    |corpus|² crossJoin of :func:`embedding_dup_pairs`, which stays as
    the small-scale baseline / test oracle.

    Band sizing is CORPUS-AWARE by default (``n_bits=num_bands=None``):
    one cheap ``count()`` of the input sizes the band keys at
    ``ceil(log2 n) + 1`` bits (≥2n buckets per band → expected random
    collisions O(n), not O(n²)) and picks the band count that keeps a
    true pair's miss probability at the threshold under 1% — see
    :func:`_srp_band_params` for the p_miss arithmetic.  Exact
    duplicates have identical signatures and can never miss.  Passing
    explicit ``n_bits``/``num_bands`` keeps the legacy fixed scheme
    (``n_bits`` total bits split evenly across ``num_bands``).
    """
    if n_bits is None and num_bands is None:
        n = embeddings.count()
        rows, num_bands = _srp_band_params(n, threshold)
    else:
        if num_bands is None:
            num_bands = SRP_BANDS
        rows = (n_bits if n_bits is not None else SRP_BITS) // num_bands
    sigs = srp_band_keys(
        embeddings, id_col=id_col, vec_col=vec_col,
        bits_per_band=rows, num_bands=num_bands, seed=seed,
    )
    # The band-bucket self-join references its input subtree on both
    # sides, and the Arrow-batch matmul stage would run twice
    # (exchange reuse does not fire under AQE) — so the intermediate is
    # persisted: the persisted-intermediate a production job writes to
    # a table anyway.  r6 third pass, two measured refinements:
    # - the one-shuffle groupBy form (:func:`_bucket_pairs`, taken for
    #   MinHash) was A/B'd here and measured SLOWER (1.51 → 1.91 s at
    #   20k vectors × 29 bands): with corpus-aware keys nearly every
    #   bucket is a singleton, so collect_list's per-group
    #   ObjectHashAggregate overhead exceeds the exchange it saves.
    #   The join form stays — measured, not assumed.
    # - what IS persisted changed: the exploded bucket rows,
    #   repartitioned by (band, key), instead of the signature rows.
    #   The cached relation then exposes hashpartitioning(band, key)
    #   (AQE leaves cached-plan partitioning alone), so BOTH join sides
    #   read it co-partitioned and the join needs NO further exchange —
    #   the band rows cross the wire once (the repartition) instead of
    #   twice (A/B'd: 1.31→1.21 / 1.04→0.96 s paired runs, candidates
    #   identical).  The repartition width follows the session shuffle
    #   conf — scale-adaptive, nothing hard-coded.  If a future engine
    #   re-plans cached partitioning the join degrades to the old
    #   two-exchange shape, never to an error.
    buckets = sigs.select(
        "id", F.posexplode("keys").alias("band", "key")
    )
    if persist_signatures:
        buckets = buckets.repartition("band", "key").persist()
    a = buckets.select(F.col("id").alias("id_a"), "band", "key")
    b = buckets.select(F.col("id").alias("id_b"), "band", "key")
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    v = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id): connected components via
    iterative min-label propagation, the step that collapses pair lists
    into dedup groups (keep one doc per cluster).

    Each iteration is one join + one groupBy over the (symmetrized +
    self-loop) edge list: label(n) ← min over in-neighbors m of
    label(m).  Converges in O(diameter) rounds — dup clusters are
    near-cliques (diameter ≤ 2-3), so a handful of rounds in practice
    and ONE light shuffle per round; ``max_iters`` bounds pathological
    chains.  For genuinely chain-like graphs use
    :func:`connected_components_star` (O(log n) rounds, heavier per
    round; equivalence-tested against this one).  Driver-side loop holds
    only a changed-row COUNT, never data; per-round results are
    persisted and the previous round freed.
    """
    from pyspark import StorageLevel

    # materialize the symmetrized edge list ONCE — the pair list's
    # lineage (LSH, shingle joins, …) is expensive and every loop round
    # would otherwise recompute it
    a = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    b = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    sym = a.unionByName(b).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    nodes = sym.select(F.col("src").alias("node")).distinct()
    self_loops = nodes.select(
        F.col("node").alias("src"), F.col("node").alias("dst")
    )
    # localCheckpoint (not persist): iterative algorithms grow a nested
    # plan every round — Catalyst re-analysis cost compounds until a
    # 10-round loop spends minutes planning.  Checkpointing truncates
    # the lineage so every round plans against a flat in-memory scan.
    edges = sym.unionByName(self_loops).localCheckpoint()
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()
    changed = 0
    for _ in range(max_iters):
        prop = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        # self-loops make prop total over nodes; converged when no label
        # shrank this round
        changed = (
            prop.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = prop
        if changed == 0:
            break
    if changed != 0:
        # the LAST allowed round may itself have completed propagation
        # (changed counts updates MADE, not updates REMAINING) — run one
        # verification round before declaring failure
        prop = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            prop.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = prop
    sym.unpersist()
    if changed != 0:
        # never hand back wrong cluster ids silently: a component whose
        # diameter exceeds max_iters would otherwise split into several
        # partially-propagated labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still shrinking); raise max_iters — dup "
            "graphs converging this slowly have chain-like components"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
    stats: dict | None = None,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """O(log n)-round connected components via alternating large-star /
    small-star contraction (Kiveris et al., *Connected Components in
    MapReduce and Beyond*, SoCC 2014) — the scale path for graphs whose
    components are NOT near-cliques (chain-like link graphs), where
    min-label propagation needs O(diameter) rounds.

    - large-star(u): every strictly-larger neighbor of u re-attaches to
      ``m = min(N(u) ∪ {u})``
    - small-star(u): edges oriented (larger, smaller); every smaller
      neighbor and u itself re-attach to m

    Both phases are one groupBy + one join over the edge list; the edge
    set is a fixed point exactly when it is a forest of stars rooted at
    component minima.  The driver holds only change counts;
    ``localCheckpoint`` truncates per-round lineage as in
    :func:`connected_components`.  Output matches it exactly:
    (doc_id, cluster_id = component min) — including nodes whose only
    pairs are self-pairs (they label themselves, as in the
    label-propagation variant).

    r6 size-adaptive fast path (output unchanged): a dup-pair graph is
    orders of magnitude smaller than its corpus, and each star round
    costs a fixed number of jobs regardless of size — pure scheduling
    overhead when the graph is tiny.  When the measured edge count is
    ≤ ``driver_threshold`` (1M — the engine's standard bounded-collect
    budget, cf. operators/skew.py and the LSH verify) and the id type is
    integral, the component minima are computed with a driver-side
    union-find over the collected edge list and the iterative rounds are
    skipped entirely; singleton handling stays distributed (the pair
    table itself may be arbitrarily large — only the DISTINCT non-self
    edges are bounded).  Past the threshold nothing changes: the
    O(log n)-round star contraction below is the scale path.  Python's
    int min ≡ Spark's numeric min, so labels are identical (the
    equivalence tests cover both paths); non-integral id types always
    take the distributed path (string min differs between engines in
    principle).

    r6 round-cost trims (output unchanged):
    - the shuffle width for the iterative rounds is derived from the
      measured edge count (~500k edges per partition, capped at the
      session default) instead of running every tiny round at the full
      session width — a dup-pair graph is orders of magnitude smaller
      than its corpus, and each round re-shuffles it ~4×; at scale the
      derived width saturates at the cluster conf, so nothing changes
      there.
    - the intra-round ``large`` edge set is persisted (materialized by
      the round's one checkpoint job, unpersisted after the round), not
      eagerly checkpointed — one fewer job per round.
    - convergence: |edges| is tracked across rounds; only a round whose
      count did NOT change runs the (one-sided) anti-join equality
      check — both sets are distinct, so equal counts + small ⊆ edges ⟺
      equal.  Non-final rounds pay one count, not a full exceptAll
      symmetric difference.
    """
    from pyspark import StorageLevel

    spark = pairs.sparkSession
    e = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # lazy checkpoint: the first action below materializes it, so sizing
    # the graph costs one job, not an eager-checkpoint job plus a count
    edges = e.localCheckpoint(eager=False)
    id_type = pairs.schema[a_col].dataType
    integral = isinstance(
        id_type, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    )
    # r6 third pass: the fast path sizes the graph with the SAME bounded
    # collect that fetches the edges (limit threshold+1 — complete iff
    # within budget), so the separate count() job is gone; the
    # distributed branch still counts (it needs n_edges for the round
    # width, and pays one extra job only past the 1M bound).
    edge_rows = (
        edges.limit(driver_threshold + 1).collect() if integral else None
    )
    if edge_rows is not None and len(edge_rows) <= driver_threshold:
        n_edges = len(edge_rows)
        # bounded driver fast path: union-find with min-root labels
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in edge_rows:
            u, v = row["u"], row["v"]
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min so the root IS the component min
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        label_rows = [(x, find(x)) for x in parent]
        if stats is not None:
            stats["cc_rounds"] = 0
            stats["cc_edges"] = n_edges
        labels = _local_pairs_df(
            spark,
            label_rows,
            T.StructType(
                [
                    T.StructField("doc_id", id_type),
                    T.StructField("cluster_id", id_type),
                ]
            ),
        )
        # singleton candidates — every node of a SURVIVING edge is in
        # ``parent`` (the collected edge set is complete within the
        # bound), so only pair rows that contributed NO edge (self-pairs
        # and null-id rows, i.e. rows the ``u != v`` filter dropped
        # under three-valued logic) can hold singleton nodes: one
        # explode+distinct over those few rows replaces the former
        # union of BOTH id columns + full-width distinct over EVERY node
        dropped = pairs.filter(
            ~F.coalesce(F.col(a_col) != F.col(b_col), F.lit(False))
        )
        selfnodes = dropped.select(
            F.explode(F.array(a_col, b_col)).alias("node")
        ).distinct()
        singletons = selfnodes.join(
            labels, selfnodes["node"] == labels["doc_id"], "left_anti"
        ).select(
            F.col("node").alias("doc_id"), F.col("node").alias("cluster_id")
        )
        return labels.unionByName(singletons)
    all_nodes = (
        pairs.select(F.col(a_col).alias("node"))
        .unionByName(pairs.select(F.col(b_col).alias("node")))
        .distinct()
    )
    n_edges = edges.count()
    # size-adaptive width for the round shuffles (guide: derive from
    # input size, don't hard-code either local or cluster constants)
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    round_parts = max(1, min(session_parts, (n_edges + 499_999) // 500_000))
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(round_parts))
    try:
        converged = False
        rounds = 0
        for _ in range(max_iters):
            rounds += 1
            # LARGE-STAR
            sym = edges.unionByName(
                edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            mins = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
                "u", F.least("mn", F.col("u")).alias("m")
            )
            large = (
                sym.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct()
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            # SMALL-STAR
            oriented = large.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
            members = oriented.unionByName(
                mins2.select("u", F.col("u").alias("v"))
            ).distinct()
            small = (
                members.join(mins2, "u")
                .filter(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .distinct()
                .localCheckpoint()
            )
            large.unpersist()
            n_small = small.count()
            unchanged = n_small == n_edges and (
                small.join(edges, ["u", "v"], "left_anti").limit(1).count()
                == 0
            )
            edges, n_edges = small, n_small
            if unchanged:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components_star did not converge in {max_iters} "
                "rounds — pathological input (the scheme is O(log n) rounds)"
            )
        if stats is not None:
            # round-count visibility (VERDICT r5 item 6): callers/benches
            # can observe convergence behavior without re-deriving it
            stats["cc_rounds"] = rounds
            stats["cc_edges"] = n_edges
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    # fixed point = stars: non-roots appear as u, roots as v; nodes with
    # no surviving edges (self-pairs only) label themselves.  r6: in a
    # star forest every non-root carries exactly ONE edge (to its root)
    # and no node is both a non-root and a root, so only the root side
    # needs a distinct (1 narrow column) — the former distinct over the
    # whole unioned label set shuffled every (doc_id, cluster_id) row.
    roots = edges.select(F.col("v").alias("doc_id")).distinct()
    labels = edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("cluster_id")
    ).unionByName(
        roots.select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    singletons = all_nodes.join(
        labels, all_nodes["node"] == labels["doc_id"], "left_anti"
    ).select(F.col("node").alias("doc_id"), F.col("node").alias("cluster_id"))
    return labels.unionByName(singletons)


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Train/eval decontamination: for every training doc, how many of
    its distinct word ``n``-grams appear in ANY eval doc (and the flag).

    Shape: the eval shingle set is distinct-ed and BROADCAST — eval
    suites are small by construction (thousands of docs vs the corpus'
    billions), so the semi-join runs map-side against every train
    partition with NO shuffle of the exploded train shingles (the
    dominant volume; a shuffle of it would dwarf everything else in the
    job).  Asserted in tests/test_plans.py.  Every train doc appears in
    the output (clean docs with 0 hits) — the keep-with-status
    contract."""
    t = word_shingles(train, n=n, text_col=text_col)
    e = word_shingles(eval_docs, n=n, text_col=text_col).select(
        "shingle"
    ).distinct()
    hits = (
        t.join(F.broadcast(e), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_ngrams", F.lit(0))
            .cast("bigint")
            .alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    default: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling for corpus balancing: keep a
    row iff ``md5_60(id) % 10^6 < fraction(key) * 10^6``.

    No RNG state, no seed plumbing: the same row is kept in every run,
    on every cluster, in every engine (the md5 bucket is the
    reproducibility contract — ``sample()``'s Bernoulli draw is not
    stable across partitionings)."""
    from itertools import chain

    if fractions:
        frac_map = F.create_map(
            *chain.from_iterable(
                (F.lit(k), F.lit(float(v))) for k, v in sorted(fractions.items())
            )
        )
        frac = F.coalesce(frac_map[F.col(key_col)], F.lit(float(default)))
    else:  # no per-key overrides: every stratum keeps the default
        # (an argless create_map() is map<void,void> — unindexable)
        frac = F.lit(float(default))
    bucket = md5_60(F.col(id_col).cast("string")) % 1_000_000
    return docs.filter(bucket < (frac * 1_000_000).cast("bigint"))


def paragraph_dedup(
    extracted: DataFrame, kinds: tuple[str, ...] = ("para",)
) -> DataFrame:
    """Sub-document exact dedup: one row per distinct span text with its
    copy count and canonical occurrence (min (doc_id, offset) — a total
    order, deterministic across engines).

    Shuffles (hash, doc_id, offset) triples, never the texts twice —
    the hash-groupBy shape that scales; pair with MinHash for near-dup
    paragraphs."""
    paras = extracted.filter(F.col("kind").isin(*kinds)).select(
        F.md5(F.col("text")).alias("text_hash"), "doc_id", "offset"
    )
    w = W.partitionBy("text_hash").orderBy(
        F.col("doc_id").asc(), F.col("offset").asc()
    )
    return (
        paras.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(W.partitionBy("text_hash")))
        .filter(F.col("rn") == 1)
        .select(
            "text_hash",
            F.col("n_copies").cast("bigint").alias("n_copies"),
            F.col("doc_id").alias("canonical_doc"),
            F.col("offset").alias("canonical_offset"),
        )
    )


def dedup_exact_keep_min(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the min-id doc per distinct content hash."""
    w = W.partitionBy(F.md5(F.col(text_col))).orderBy(F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
