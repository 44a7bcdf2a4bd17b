"""Deduplication operators for large-scale corpus cleaning.

All hot paths are pure Catalyst expressions (xxhash64, transform,
array_min, explode) — no Python in the row loop — so they whole-stage
codegen and scale linearly with executors.

Scale design (100 TB corpus):
- exact dedup: hash-groupBy on a 64/128-bit content hash. Shuffle carries
  (hash, doc_id), never the text. O(rows) shuffle of ~24 bytes/row.
- MinHash-LSH: per-doc signature is computed map-side (no shuffle);
  the only shuffles are the band-bucket exchange (rows × n_bands keys)
  and the candidate-pair verify join. Candidate pairs — not all pairs —
  hit the O(n^2) step, which is the whole point of LSH banding.
- SimHash: 64-bit signature map-side; near-dup = same signature bucket
  (or Hamming<=3 via bit-rotation tables at scale).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from libcolumnfile_spark.queries import pin, query, T
from libcolumnfile_spark.tables import spread as _spread

# ---------------------------------------------------------------------------
# Exact deduplication
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep the min-id row per distinct content (deterministic, unlike
    dropDuplicates which keeps an arbitrary row).

    Shuffle note: groups on md5(content) so the exchange carries a fixed
    16-byte key even for multi-MB documents.
    """
    content_hash = F.md5(F.concat_ws(" ", *content_cols))
    return (
        df.withColumn("__h", content_hash)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .withColumnRenamed("__h", "content_hash")
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash + LSH banding
# ---------------------------------------------------------------------------

# Mersenne prime 2^31-1: with a, b, h all < 2^31, a*h+b < 2^62 so the
# affine rehash never overflows int64 (Spark 4 runs ANSI mode: overflow
# throws instead of wrapping).
_MERSENNE_31 = (1 << 31) - 1


def _hash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family
    h_i(x) = (a_i * x + b_i) mod 2^31-1 — same trick Spark MLlib's
    MinHashLSH uses, re-derived here so everything stays in SQL expressions.
    """
    # splitmix64-ish integer sequence; deterministic, no RNG state needed.
    params = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n_hashes):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        a = (z % (_MERSENNE_31 - 1)) + 1  # a != 0
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        b = x % _MERSENNE_31
        params.append((a, b))
    return params


def shingles_from_tokens(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams from a token-array column, as array<string>.

    ``tokens`` MUST be a materialized attribute (a column selected in a
    previous projection), not an inline split() expression: Catalyst
    inlines non-attribute subexpressions into HOF lambdas and
    re-evaluates them PER ELEMENT, turning O(grams) slicing into
    O(tokens x grams) re-tokenization — measured 3.5 s vs 0.4 s at
    sf0.1 (same trap documented on hashed_grams).
    """
    n_sh = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    # guard: empty token array -> empty shingle array (sequence(1,0) is empty)
    return F.array_distinct(F.when(n_sh > 0, grams).otherwise(F.array().cast("array<string>")))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column, as an array<string>.

    Pure Catalyst: split -> sequence -> transform(slice) -> array_distinct.
    Convenience one-expression form — in pipelines, materialize the token
    array first and use shingles_from_tokens (see its docstring for the
    measured inlining trap).
    """
    return shingles_from_tokens(F.split(F.lower(text), r"\s+"), n)


def gram_rows(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Distinct (id, gram) ROWS of word n-grams — the whole-stage-codegen
    gram construction: posexplode tokens, window lead() to join n
    consecutive tokens, distinct. Measured 3.7x faster at sf0.1 than
    exploding a HOF-built gram array (transform lambdas evaluate
    interpreted, and Generate over the interpreted array re-pays that
    cost per output row). Costs one token-level shuffle (the window
    partitionBy) — the xxhash64 numpy kernel (minhash_band_keys_kernel)
    remains the zero-shuffle production path; this shape exists for the
    md5-family operators whose every value must be SQL-reproducible.
    """
    from pyspark.sql import Window

    t = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    ).filter(F.size("toks") >= n)
    rows = t.select("id", F.posexplode("toks").alias("pos", "tok"))
    w = Window.partitionBy("id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", k).over(w) for k in range(1, n)]
    g = rows.select(
        "id", F.concat_ws(" ", *leads).alias("g"), leads[-1].alias("_last")
    )
    return g.filter(F.col("_last").isNotNull()).select("id", "g").dropDuplicates(
        ["id", "g"]
    )


def shingle_hashes(shingle_col: Column) -> Column:
    """array<bigint>: base 31-bit hash per shingle (xxhash64 mod p).

    Materialize this ONCE per row (withColumn) before fanning out to
    n_hashes affine rehashes — hashing the strings once instead of
    n_hashes times is the dominant cost saving (string hash vs two
    integer mults). CollapseProject keeps non-cheap exprs used more than
    once as their own projection, so the reuse is real.
    """
    return F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_31)))


def token_hashes(text: Column) -> Column:
    """array<bigint>: one 31-bit hash per whitespace token."""
    tokens = F.split(F.lower(text), r"\s+")
    return F.transform(tokens, lambda t: F.pmod(F.xxhash64(t), F.lit(_MERSENNE_31)))


def hashed_grams(th: Column, n: int = 3) -> Column:
    """array<bigint>: distinct hashed word n-gram shingles from a
    PRE-MATERIALIZED token-hash column — shingle strings never exist; a
    shingle hash is a small-coefficient combination of n consecutive
    token hashes (pure integer ops).

    IMPORTANT: ``th`` must be a materialized column reference, not an
    inline expression — it's referenced n times inside the transform
    lambda, and Catalyst inlines (re-evaluates) non-attribute
    subexpressions per reference, turning O(tokens) hashing into
    O(tokens * shingles). That inlining was a measured 2x regression.

    Overflow safety under ANSI mode: each element is already below 2^31,
    coefficients are 31^k (k < n), so sums stay far below 2^63.
    """
    m = F.greatest(F.size(th) - (n - 1), F.lit(0))

    def gram(i: Column) -> Column:
        acc = None
        for k in range(n):
            term = F.element_at(th, i + k) * F.lit(31 ** (n - 1 - k))
            acc = term if acc is None else acc + term
        return F.pmod(acc, F.lit(_MERSENNE_31))

    grams = F.transform(F.sequence(F.lit(1), m), gram)
    return F.array_distinct(
        F.when(m > 0, grams).otherwise(F.array().cast("array<bigint>"))
    )


def _flatten_arrays(series: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat, lens, rowid) for a Series of int64 arrays — the ragged-array
    layout every vectorized kernel here operates on. Per-row work is a
    single O(rows) copy loop; all math after that is whole-batch numpy.
    """
    n = len(series)
    lens = np.fromiter(
        (0 if x is None else len(x) for x in series), dtype=np.int64, count=n
    )
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.empty(offs[-1], dtype=np.int64)
    for i, x in enumerate(series):
        if lens[i]:
            flat[offs[i] : offs[i + 1]] = x
    rowid = np.repeat(np.arange(n, dtype=np.int64), lens)
    return flat, lens, rowid


def _gram_hashes_flat(
    flat: np.ndarray, rowid: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hashed word n-grams over the flattened token-hash layout: same
    polynomial as hashed_grams (sum of h[i+k] * 31^(n-1-k) mod 2^31-1), so
    numpy and Catalyst paths produce identical gram/MinHash values.
    Returns (gram_hashes, gram_rowid) with grams sorted by row.
    """
    total = flat.size
    if total < n:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    g = np.zeros(total - (n - 1), dtype=np.int64)
    for k in range(n):
        # elements < 2^31 and coefficients 31^k (k<n) keep sums << 2^63
        g += flat[k : total - (n - 1) + k] * (31 ** (n - 1 - k))
    g %= _MERSENNE_31
    valid = rowid[: total - (n - 1)] == rowid[n - 1 :]
    return g[valid], rowid[: total - (n - 1)][valid]


def minhash_band_keys_kernel(
    n_hashes: int = 16, n_bands: int = 8, shingle_n: int = 3, seed: int = 42
):
    """Arrow-batched numpy kernel: token-hash array -> array of n_bands LSH
    bucket keys (band index = array position; pair with posexplode).

    Why a pandas UDF when the rest of the pipeline is pure Catalyst: the
    signature is n_hashes affine rehashes over every gram — higher-order
    functions evaluate their lambdas interpreted per element, so the
    Catalyst form costs O(grams x n_hashes) interpreted evals (~16M at
    sf0.1; measured multi-second). Here the same math is four whole-batch
    numpy passes: gram polynomial, (n_hashes x grams) rehash matrix,
    minimum.reduceat per row, and a mixed band fold. Map-side only — the
    kernel never shuffles; Python sees compact int64 arrays over Arrow,
    never the text.
    """
    rows_per_band = n_hashes // n_bands
    params = _hash_params(n_hashes, seed)
    A = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    B = np.array([b for _, b in params], dtype=np.int64)[:, None]

    @F.pandas_udf("array<bigint>")
    def kernel(th: pd.Series) -> pd.Series:
        nrows = len(th)
        flat, lens, rowid = _flatten_arrays(th)
        g, grow = _gram_hashes_flat(flat, rowid, shingle_n)
        empty = np.empty(0, dtype=np.int64)
        if g.size == 0:
            return pd.Series([empty] * nrows)
        counts = np.bincount(grow, minlength=nrows)
        starts = np.clip(np.searchsorted(grow, np.arange(nrows)), 0, g.size - 1)
        # (n_hashes, grams) affine rehash; a*g < 2^62 so int64 is safe
        sig = np.minimum.reduceat((g[None, :] * A + B) % _MERSENNE_31, starts, axis=1)
        # FNV-style fold of rows_per_band signature values per band;
        # uint64 wraparound is the intended mixing
        su = sig.astype(np.uint64)
        keys = np.zeros((n_bands, nrows), dtype=np.uint64)
        for band in range(n_bands):
            acc = np.zeros(nrows, dtype=np.uint64)
            for r in range(rows_per_band):
                acc = acc * np.uint64(0x100000001B3) + su[band * rows_per_band + r]
            keys[band] = acc
        keys_i64 = keys.astype(np.int64).T  # (nrows, n_bands)
        has = counts > 0
        return pd.Series(
            [keys_i64[i] if has[i] else empty for i in range(nrows)]
        )

    return kernel


def gram_set_kernel(shingle_n: int = 3):
    """Arrow-batched numpy kernel: token-hash array -> sorted distinct
    hashed n-gram array (the exact-Jaccard verify representation). Same
    polynomial as hashed_grams, so values match the Catalyst path.
    """

    @F.pandas_udf("array<bigint>")
    def kernel(th: pd.Series) -> pd.Series:
        nrows = len(th)
        flat, lens, rowid = _flatten_arrays(th)
        g, grow = _gram_hashes_flat(flat, rowid, shingle_n)
        empty = np.empty(0, dtype=np.int64)
        if g.size == 0:
            return pd.Series([empty] * nrows)
        bounds = np.searchsorted(grow, np.arange(nrows + 1))
        return pd.Series(
            [np.unique(g[bounds[i] : bounds[i + 1]]) for i in range(nrows)]
        )

    return kernel


def minhash_signature_from_hashes(hash_col: Column, n_hashes: int = 32, seed: int = 42) -> Column:
    """array<bigint> MinHash signature over pre-computed base hashes:
    sig_i = min over h of (a_i * h + b_i) mod 2^31-1.
    """

    def rehash(a: int, b: int):
        # single-arg closure: pyspark inspects lambda arity, so default-arg
        # capture (lambda h, a=a: ...) would be mis-read as a 3-arg HOF.
        def fn(h):
            return F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_31))

        return fn

    cols = [
        F.array_min(F.transform(hash_col, rehash(a, b)))
        for a, b in _hash_params(n_hashes, seed)
    ]
    return F.array(*cols)


def minhash_signature(shingle_col: Column, n_hashes: int = 32, seed: int = 42) -> Column:
    """Convenience one-expression form; prefer the two-step
    shingle_hashes -> minhash_signature_from_hashes in pipelines so the
    per-shingle string hash is computed once, not n_hashes times.
    """
    return minhash_signature_from_hashes(shingle_hashes(shingle_col), n_hashes, seed)


def lsh_band_keys(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """array<struct<band:int, key:bigint>>: hash each band of the signature
    into a bucket key. Docs sharing any (band, key) are candidate pairs.
    """
    bands = []
    for band in range(n_bands):
        start = band * rows_per_band + 1  # slice is 1-based
        band_sig = F.slice(sig, start, rows_per_band)
        key = F.xxhash64(F.concat_ws(",", F.transform(band_sig, lambda v: v.cast("string"))))
        bands.append(F.struct(F.lit(band).alias("band"), key.alias("key")))
    return F.array(*bands)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element array columns.

    One array_intersect per pair; |A∪B| = |A|+|B|-|A∩B| (inputs are
    array_distinct'd), so the second hash-set build that array_union
    would cost is avoided — this runs once per candidate PAIR, the
    hottest expression in the verify stage.
    """
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact jaccard >= threshold) found
    via MinHash-LSH banding.

    Plan shape: map-side signature -> explode n_bands keys -> shuffle on
    (band,key) -> within-bucket self-join -> distinct candidate pairs ->
    exact-verify join back to shingle sets. Only candidates pay the
    verify cost; the all-pairs product never materializes.
    """
    rows_per_band = n_hashes // n_bands
    # spread the compute-heavy signature map work across all cores: a small
    # single-file input otherwise plans as ONE partition and serializes the
    # per-row shingling+hashing (at real scale, file splits do this for free)
    # Pre-filter on the CHEAP token-count proxy (== "has >= 1 shingle"),
    # never on size(hs): Catalyst pushes filters through projections by
    # inlining the aliased expression, so filtering on the shingle array
    # would re-run the whole hashing pipeline inside the pushed filter —
    # below the repartition, i.e. serially. Measured 5x regression.
    spread = _spread(df).filter(
        F.size(F.split(F.lower(F.col(text_col)), r"\s+")) >= shingle_n
    )
    # token-hash shingles: the whole signature pipeline runs in integer
    # ops, no shingle strings ever materialize (tokens are hashed
    # JVM-side with codegen'd xxhash64; Python only ever sees int64
    # arrays over Arrow).
    toks = spread.select(
        F.col(id_col).alias("id"), token_hashes(F.col(text_col)).alias("th")
    )
    # One persisted artifact feeds everything downstream (banding AND the
    # verify stage): (id, token-hash array) — compact integers, a tiny
    # fraction of the raw text. Every later stage replays from this
    # cache instead of re-scanning + re-tokenizing the corpus. No eager
    # count: the first action (the candidate count below) populates the
    # cache as a side effect — an extra materialization job would only
    # add a scheduling round-trip.
    toks = pin(toks)
    # signature + banding in ONE vectorized numpy kernel (map-side, no
    # shuffle) — see minhash_band_keys_kernel for the measured rationale
    bands_udf = minhash_band_keys_kernel(n_hashes, n_bands, shingle_n)
    banded = toks.select(
        "id", F.posexplode(bands_udf(F.col("th"))).alias("band", "key")
    )
    # Candidate pairs via ONE groupBy shuffle (not a self-join, which
    # would shuffle banded twice): collect ids per (band, key) bucket,
    # expand within-bucket pairs. Bucket sizes bound the quadratic term
    # explicitly — a skewed bucket is visible as a hot key here, which
    # AQE splits; the within-bucket pair expansion is pure codegen.
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x: F.transform(
                    F.col("ids"),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        ),
        lambda p: p.id_a < p.id_b,
    )
    candidates = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    # candidates feeds three consumers (the broadcast id set and both
    # sides of the verify join); without a persist the whole banding
    # pipeline re-executes per consumer — measured ~0.8 s × 3 at sf0.1.
    # The frame is tiny (pairs that share a band), so this is cheap
    # insurance at any scale.
    candidates = pin(candidates)

    # Verify stage recomputes shingles ONLY for candidate docs: semi-join
    # the corpus down to candidate ids first (candidates are the tiny
    # side — broadcast), then compute exact Jaccard. At 100 TB this is
    # the whole point of LSH: the expensive exact step touches
    # O(candidates), not O(corpus).
    cand_ids, n_ids_est = _candidate_ids(candidates)
    # hint only while the estimated id set is broadcast-sized — a
    # dup-heavy corpus can make candidates O(corpus) and a forced
    # broadcast would flood the driver (same policy as the doc-payload
    # gate below at _BROADCAST_DOC_LIMIT)
    ci = F.broadcast(cand_ids) if n_ids_est <= _BROADCAST_DOC_LIMIT else cand_ids
    cand_docs = toks.join(ci, "id", "left_semi").select(
        "id", gram_set_kernel(shingle_n)(F.col("th")).alias("sh")
    )
    return _pairwise_jaccard(candidates, cand_docs, n_ids_est, threshold)


# Candidate-doc gram arrays broadcast up to this many docs (~2 KB/doc ->
# ~300 MB build side); past it the verify falls back to shuffle joins.
_BROADCAST_DOC_LIMIT = 150_000


def _candidate_ids(candidates: DataFrame) -> tuple[DataFrame, int]:
    """(cand_ids, n_ids_upper_bound) from a persisted candidate-pair set.

    The count materializes the persisted candidate pipeline (one job, and
    the only eager materialization in the whole operator). The id set is
    NOT distinct'd by default — the broadcast semi-join downstream dedups
    for free, and 2*n_pairs is a sound upper bound for the broadcast
    decision. Only when that bound crosses the broadcast budget do we pay
    the distinct-count job to learn the true id count (e.g. permissive
    blocking where every doc is a candidate: 394k pairs over 5k docs at
    sf0.1 — the bound says "huge", the truth says "tiny, broadcast").

    The decision is fully deterministic (counts over deterministic
    hashing), and the stderr line below proves it per run: round 2's
    bench recorded q_dedup_minhash at 9.0 s vs 2.2 s committed on
    identical code, and a controlled A/B reproduced the swing only under
    host CPU contention (a concurrent 32-core job), never across runs on
    an idle host (10 runs: 1.7-2.3 s). With the strategy logged, any
    future swing is attributable from the bench stderr alone.
    """
    n_pairs = candidates.count()
    cand_ids = candidates.select(F.col("id_a").alias("id")).unionByName(
        candidates.select(F.col("id_b").alias("id"))
    )
    n_ids_est = 2 * n_pairs
    if n_ids_est > _BROADCAST_DOC_LIMIT:
        cand_ids = pin(cand_ids.distinct())
        n_ids_est = cand_ids.count()
    strategy = "broadcast" if n_ids_est <= _BROADCAST_DOC_LIMIT else "shuffle"
    print(
        f"[dedup] candidate_pairs={n_pairs} ids_est={n_ids_est} verify_join={strategy}",
        file=sys.stderr,
    )
    return cand_ids, n_ids_est


def _pairwise_jaccard(
    candidates: DataFrame, cand_docs: DataFrame, n_ids: int, threshold: float
) -> DataFrame:
    """Exact-Jaccard verify: annotate each (id_a, id_b) candidate pair with
    both gram sets and filter on similarity.

    Join strategy: the DOC side (one gram array per candidate doc) is
    broadcast when it fits the broadcast budget, so the whole verify is a
    single map-side stage over the candidate pairs — zero shuffles, and
    the wide pair×array intermediate is streamed, never exchanged.
    Catalyst cannot make this call itself: the gram arrays come out of a
    pandas UDF, whose output size the optimizer estimates as unknown ->
    sort-merge join. We know |cand_docs| exactly (n_ids, already counted
    off the persisted candidate set), so the operator decides like AQE
    would with perfect stats. Past the budget (~150k candidate docs at
    ~2 KB/doc gram array) it falls back to shuffle joins, which AQE
    skew-splits — the scale-safe path.
    """
    # Both join sides are the SAME relation — keep their plan subtrees
    # canonically identical (alias(), not column renames) so Spark's
    # ReuseExchange rule builds the broadcast hash table ONCE and probes
    # it from both joins.
    cd = F.broadcast(cand_docs) if n_ids <= _BROADCAST_DOC_LIMIT else cand_docs
    return (
        candidates.join(cd.alias("da"), F.col("id_a") == F.col("da.id"))
        .join(cd.alias("db"), F.col("id_b") == F.col("db.id"))
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("da.sh"), F.col("db.sh")), 4).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# Deterministic cross-engine MinHash (oracle-checkable variant)
# ---------------------------------------------------------------------------


def md5_gram_hash(gram: Column) -> Column:
    """31-bit base hash computable IDENTICALLY in Spark and DuckDB:
    first 15 hex chars of md5 (60 bits, sign-safe) parsed as an integer,
    mod 2^31-1. Verified value-equal across engines. The production path
    uses xxhash64 (JVM codegen, no DuckDB analog); this family exists so
    a full MinHash pipeline can be value-checked against a SQL oracle.
    """
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long"),
        F.lit(_MERSENNE_31),
    )


def minhash_exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash dedup with ONE band spanning the whole signature: candidate
    pairs are docs whose entire n_hashes-value signature is identical,
    verified with exact Jaccard on the string gram sets.

    This is the deterministic, engine-portable variant of
    minhash_lsh_dedup: same shingling, same affine hash family
    h_i(x) = (a_i*x + b_i) mod 2^31-1, but the base gram hash is the
    md5-derived one (md5_gram_hash) so a DuckDB oracle reproduces the
    exact candidate set and output — no banding randomness, no
    engine-specific hash. Recall is lower than banded LSH (signature
    equality ~= jaccard^n_hashes); it exists as the value-checkable
    anchor for the hash-family math shared with the production path.

    Plan shape: map-side gram hashing + signature (pure Catalyst,
    whole-stage codegen) -> self-join on the signature key (one shuffle
    per side, AQE-managed) -> exact-Jaccard verify on candidate pairs.
    Text is trimmed before tokenizing on BOTH engines (Java split drops
    trailing empty tokens, DuckDB's string_split_regex keeps them).
    """
    params = _hash_params(n_hashes, seed)
    # Gram ARRAYS are needed anyway for the exact-Jaccard verify, so the
    # cheapest shape (measured 1.7 s vs 3.3 s for a window-lead
    # row-wise rebuild at sf0.1) is: build the arrays once (HOF from a
    # materialized token attribute — see shingles_from_tokens), persist,
    # and run hashing/signature/self-join off the CACHE. No filter on
    # the gram array: Catalyst would push it below the repartition with
    # the whole gram pipeline inlined (serial scan — the documented
    # minhash_lsh_dedup trap); size(grams)>0 is equivalent to the cheap
    # token-count filter in `spread`.
    spread = _spread(df).filter(
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")) >= shingle_n
    )
    toks = spread.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    )
    g = pin(toks.select(
        "id", shingles_from_tokens(F.col("toks"), shingle_n).alias("grams")
    ))
    g.count()
    # hash + rehash AFTER exploding from the cache, as plain
    # projections/aggregates (whole-stage codegen — md5+conv inside a
    # transform() lambda runs interpreted per element); the signature is
    # n_hashes map-side partial mins, so the groupBy exchange carries
    # n_hashes values per DOC, not per gram.
    h = g.select("id", F.explode("grams").alias("gram")).select(
        "id", md5_gram_hash(F.col("gram")).alias("h")
    )
    sig = h.groupBy("id").agg(
        *[
            F.min(F.pmod(F.col("h") * F.lit(pa) + F.lit(pb), F.lit(_MERSENNE_31)))
            .cast("string")
            .alias(f"_s{i}")
            for i, (pa, pb) in enumerate(params)
        ]
    )
    sig = sig.select(
        "id", F.concat_ws(",", *[f"_s{i}" for i in range(n_hashes)]).alias("sig_key")
    )
    s = g.join(sig, "id")
    # Gram-set collapse before the pair stage (round 9 — the
    # q_dedup_containment recipe): docs with IDENTICAL gram sets
    # (replicas, mirrors, boilerplate clones) collapse to one
    # representative keyed by the md5 of the sorted gram set. The
    # jaccard verify then runs once per DISTINCT-set pair (identical
    # sets give identical jaccard against any third set), and member
    # pairs expand through id-only joins: same-set pairs are jaccard
    # 1.0 by construction, cross-set pairs inherit the rep-level value.
    # Without this, a duplication-heavy corpus (the x100 probe
    # replicates every doc 100x) pays C(dup,2) array-intersect verifies
    # per clone group — measured 268 s at x100 vs ~4 s collapsed; the
    # output rows are the same required pairs either way, but they must
    # cost an id-join, not a gram-array verify. Every join is pinned
    # shuffle_hash: no side is construction-bounded and post-join size
    # estimates riding a broadcast is the exact failure containment hit.
    gkey = F.md5(F.concat_ws("\x1f", F.sort_array(F.col("grams"))))
    s = s.withColumn("gkey", gkey)
    members = s.select("id", "sig_key", "gkey")
    reps = s.groupBy("sig_key", "gkey").agg(F.min_by("grams", "id").alias("grams"))
    ra = reps.select(
        F.col("sig_key"), F.col("gkey").alias("ga"), F.col("grams").alias("grams_a")
    )
    rb = reps.select(
        F.col("sig_key"), F.col("gkey").alias("gb"), F.col("grams").alias("grams_b")
    )
    rep_pairs = (
        ra.hint("shuffle_hash")
        .join(
            rb.hint("shuffle_hash"),
            (ra["sig_key"] == rb["sig_key"]) & (F.col("ga") < F.col("gb")),
        )
        .select(
            ra["sig_key"].alias("sig_key"),
            "ga",
            "gb",
            F.round(jaccard(F.col("grams_a"), F.col("grams_b")), 4).alias(
                "jaccard_sim"
            ),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )
    ma = members.select(
        F.col("sig_key"), F.col("gkey").alias("ga"), F.col("id").alias("ida")
    )
    mb = members.select(
        F.col("sig_key"), F.col("gkey").alias("gb"), F.col("id").alias("idb")
    )
    cross = (
        rep_pairs.hint("shuffle_hash")
        .join(ma.hint("shuffle_hash"), ["sig_key", "ga"])
        .join(mb.hint("shuffle_hash"), ["sig_key", "gb"])
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "jaccard_sim",
        )
    )
    # identical gram sets imply identical signatures, so the sig_key
    # predicate is redundant on this arm; jaccard of two equal nonempty
    # sets is exactly 1.0, which any threshold <= 1 admits
    x, y = members.alias("x"), members.alias("y")
    same = (
        x.hint("shuffle_hash")
        .join(
            y.hint("shuffle_hash"),
            (F.col("x.gkey") == F.col("y.gkey")) & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.lit(1.0).alias("jaccard_sim"),
        )
        .filter(F.lit(1.0) >= F.lit(threshold))
    )
    return cross.unionByName(same)


def _minhash_verified_oracle(
    n_hashes: int = 4, shingle_n: int = 3, threshold: float = 0.5, seed: int = 42
) -> str:
    """DuckDB replica of minhash_exact_dedup: identical trim/lower/split
    tokenization, identical word n-grams, identical md5-derived base hash,
    identical affine rehash constants, signature-equality candidates,
    exact string-gram Jaccard. Every step is value-deterministic in both
    engines, so this is a FULL oracle (not rows-only) for the MinHash
    hash-family math.
    """
    p = _MERSENNE_31
    sig_key = " || ',' || ".join(
        f"CAST(list_min(list_transform(hs, x -> ({a} * x + {b}) % {p})) AS VARCHAR)"
        for a, b in _hash_params(n_hashes, seed)
    )
    n1 = shingle_n - 1
    return (
        "WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks "
        "  FROM documents), "
        "g AS (SELECT doc_id, list_distinct(list_transform("
        f"    generate_series(1, len(toks) - {n1}), "
        f"    i -> array_to_string(toks[i:i+{n1}], ' '))) AS grams "
        f"  FROM t WHERE len(toks) >= {shingle_n}), "
        "h AS (SELECT doc_id, grams, list_transform(grams, "
        f"  s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {p}) AS hs "
        "  FROM g WHERE len(grams) > 0), "
        f"s AS (SELECT doc_id, grams, {sig_key} AS sig_key FROM h), "
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "  len(list_intersect(a.grams, b.grams)) AS inter, "
        "  len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS un "
        "  FROM s a JOIN s b ON a.sig_key = b.sig_key AND a.doc_id < b.doc_id) "
        "SELECT id_a, id_b, round(CAST(inter AS DOUBLE) / un, 4) AS jaccard_sim "
        f"FROM pairs WHERE round(CAST(inter AS DOUBLE) / un, 4) >= {threshold}"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


@F.pandas_udf(LongType())
def _simhash_vote(hcol: pd.Series) -> pd.Series:
    """Arrow-batched bit-vote kernel for SimHash.

    Why a pandas UDF when everything else here is pure Catalyst: the
    bit-vote is 64 adds per TOKEN, and Spark's higher-order functions
    (aggregate/zip_with/transform) evaluate their lambdas interpreted,
    per element. Measured at sf0.1: HOF vote loop 1.7 s steady-state vs
    0.66 s for the numpy kernel (and 5.1 s vs 2.3 s first-run — the HOF
    expression alone is a multi-second codegen compile). The tokens are
    hashed JVM-side (xxhash64, codegen) so Python only sees compact
    int64 arrays over Arrow; the kernel is map-only — no shuffle, scales
    linearly with executors.
    """
    shifts = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(hcol), dtype=np.int64)
    for i, h in enumerate(hcol):
        if h is None:
            continue
        a = np.asarray(h, dtype=np.uint64)
        if a.size == 0:
            continue
        # votes[j] = #tokens with bit j set; sign bit = majority
        votes = ((a[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
        bits = np.where(votes * 2 > a.size, np.uint64(1), np.uint64(0))
        out[i] = (bits << shifts).sum(dtype=np.uint64).astype(np.int64)
    return pd.Series(out)


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of an array<string> token column.

    Each token hashes to 64 bits (xxhash64, JVM-side); per bit position j
    the weighted vote is +1/-1 across tokens; the signature bit is the
    vote's sign. The vote/fold runs as a vectorized numpy kernel over
    Arrow batches (see _simhash_vote for the measured rationale).
    """
    return _simhash_vote(F.transform(tokens, lambda t: F.xxhash64(t)))


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of documents sharing an identical 64-bit SimHash signature.

    At scale, Hamming-distance<=k matching adds rotation tables; identical-
    signature grouping is the base operator (one hash-groupBy shuffle).
    """
    tokens = F.split(F.lower(F.col(text_col)), r"\s+")
    sigs = _spread(df).select(F.col(id_col).alias("id"), simhash64(tokens).alias("simhash"))
    # ids emitted as a sorted CSV string, not array<string>: every column
    # is scalar so generic row-canonicalizers (the driver's rows-only
    # check sorts a pandas frame of the result) can order the rows.
    return (
        sigs.groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.array_join(F.sort_array(F.collect_list("id")), ",").alias("ids_csv"),
        )
        .filter(F.col("group_size") > 1)
    )


def hamming_pairs(
    sig_df: DataFrame, k: int = 3, id_col: str = "id", sig_col: str = "sig"
) -> DataFrame:
    """ALL pairs (id_a < id_b) of 64-bit signatures within Hamming
    distance ``k`` — exact, via the pigeonhole block scheme (Manku,
    Jain, Sarma, WWW'07): split the 64 bits into k+1 blocks; two
    signatures within distance k must agree EXACTLY on at least one
    block (k flipped bits can dirty at most k blocks). So recall is 1
    by construction, and candidate generation is one banding shuffle on
    (block_index, block_value) — the same plan shape as MinHash-LSH
    banding, never an all-pairs product.

    Pure Catalyst end-to-end: block extraction is shift+mask, the verify
    is bit_count(sig_a XOR sig_b) — whole-stage codegen, no Python.

    Works on any 64-bit sketch column (SimHash here; any other 64-bit
    fingerprint gets the same operator for free).
    """
    n_blocks = k + 1
    # block widths as equal as 64 allows (e.g. k=3 -> 16/16/16/16)
    widths = [64 // n_blocks + (1 if i < 64 % n_blocks else 0) for i in range(n_blocks)]
    starts = [sum(widths[:i]) for i in range(n_blocks)]
    sig = F.col(sig_col)
    keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftrightunsigned(sig, starts[b])
                .bitwiseAND(F.lit((1 << widths[b]) - 1))
                .alias("key"),
            )
            for b in range(n_blocks)
        ]
    )
    banded = sig_df.select(
        F.col(id_col).alias("id"), sig.alias("sig"), F.explode(keys).alias("bk")
    ).select("id", "sig", "bk.blk", "bk.key")
    # one groupBy shuffle -> within-bucket pair expansion (codegen), the
    # same single-shuffle candidate plan as minhash_lsh_dedup's banding
    buckets = (
        banded.groupBy("blk", "key")
        .agg(F.sort_array(F.collect_list(F.struct("id", "sig"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("ds"),
                lambda x: F.transform(
                    F.col("ds"),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        F.bit_count(x["sig"].bitwiseXOR(y["sig"])).alias("hamming"),
                    ),
                ),
            )
        ),
        lambda p: (p["id_a"] < p["id_b"]) & (p["hamming"] <= k),
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", F.col("p.hamming").cast("int").alias("hamming"))
        .distinct()
    )


def simhash_hamming_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Near-duplicate pairs whose 64-bit SimHash signatures are within
    Hamming distance k (exact recall via hamming_pairs' pigeonhole
    banding). The identical-signature grouping (simhash_dedup) is the
    k=0 special case of this operator.
    """
    tokens = F.split(F.lower(F.col(text_col)), r"\s+")
    sigs = _spread(df).select(
        F.col(id_col).alias("id"), simhash64(tokens).alias("sig")
    )
    return hamming_pairs(sigs, k=k)


# ---------------------------------------------------------------------------
# N-gram Jaccard (exact, blocked)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    shingle_n: int = 3,
    threshold: float = 0.2,
    length_bucket: int | None = 64,
    anchor_block: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard pairs within a blocking key.

    Block = (block_col, length bucket[, min-gram anchor]):
    near-duplicates have near-equal length, so bucketing by
    n_chars/length_bucket bounds the O(n^2) per-block product (docs
    straddling a bucket boundary are the known miss; MinHash-LSH is the
    recall-safe path). A size-ratio prefilter (|A∩B|/|A∪B| >= t
    requires |A|/|B| >= t) skips the expensive array_intersect for
    obviously-dissimilar pairs.

    ``anchor_block=True`` adds a third blocking dimension: the doc's
    MINIMUM md5 gram hash — a 1-hash MinHash over its distinct gram
    set, i.e. a uniformly-random shared-gram anchor. Two docs block
    together only if they agree on that anchor, which by the MinHash
    property happens with probability equal to their Jaccard — so
    exact/near-exact duplicates (J -> 1) still pair with probability
    -> 1, while the per-block candidate product collapses from
    |length bucket|^2 (grows quadratically with corpus density) to
    |docs sharing one specific gram as their hash-min|^2. md5 family
    (md5_gram_hash) so a DuckDB oracle reproduces the anchor exactly.
    With the anchor on, ``nsh`` is the TRUE distinct-gram count (the
    grams are built anyway), making the size-ratio prefilter exactly
    recall-safe within the declared blocking.
    """
    df = _spread(df)
    blk_parts = [F.col(block_col) if block_col else F.lit("all")]
    if length_bucket:
        blk_parts.append((F.length(F.col(text_col)) / F.lit(length_bucket)).cast("int").cast("string"))
    # Candidate stage carries only (id, blk, nsh) — gram ARRAYS never
    # enter the self-join. trim before tokenizing: Java's split drops
    # TRAILING empty tokens but keeps a leading one, while DuckDB's
    # string_split_regex keeps both — trimming makes the token (hence
    # gram) sets identical across engines for text with edge whitespace
    if anchor_block:
        t = df.select(
            F.col(id_col).alias("id"),
            F.concat_ws("|", *blk_parts).alias("__blk0"),
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__toks"),
        )
        # grams materialize as an attribute before the anchor transform
        # (the shingles_from_tokens inlining contract)
        g = t.select(
            "id",
            "__blk0",
            shingles_from_tokens(F.col("__toks"), shingle_n).alias("__grams"),
        )
        keys = g.select(
            "id",
            F.concat_ws(
                "|",
                F.col("__blk0"),
                F.array_min(F.transform(F.col("__grams"), md5_gram_hash)).cast(
                    "string"
                ),
            ).alias("blk"),
            F.size("__grams").alias("nsh"),
        ).filter(F.col("nsh") > 0)
        # the anchor costs real map work (md5 per gram) and the self-join
        # reads keys from BOTH sides — persist so it runs once (the
        # token-count-only keys below are too cheap to be worth caching).
        # HOF transform beats explode+groupBy(min) here: the per-gram md5
        # is interpreted either way once inside a lambda, but the groupBy
        # adds a token-level exchange (measured 0.42 s vs 0.82 s, sf0.1)
        keys = pin(keys)
    else:
        # token count is the cheap proxy for shingle-set size in the
        # size-ratio prefilter (|sh| <= n_tokens - n + 1)
        keys = df.select(
            F.col(id_col).alias("id"),
            F.concat_ws("|", *blk_parts).alias("blk"),
            (F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")) - (shingle_n - 1)).alias("nsh"),
        ).filter(F.col("nsh") > 0)
    a = keys.alias("a")
    b = keys.alias("b")
    na, nb = F.col("a.nsh"), F.col("b.nsh")
    candidates = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.id") < F.col("b.id"))
        # size-ratio prefilter: |A n B| / |A u B| >= t needs |A|/|B| >= t
        & (na.cast("double") >= nb.cast("double") * threshold)
        & (nb.cast("double") >= na.cast("double") * threshold),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    # three consumers (broadcast id set + both join sides) — persist so
    # the blocked self-join runs once (same rationale as minhash_lsh_dedup)
    candidates = pin(candidates)
    # Verify stage: shingle ONLY the candidate docs (semi-join on the
    # broadcast candidate-id set), then exact Jaccard — the expensive
    # array work touches O(candidates), not O(corpus).
    cand_ids, n_ids_est = _candidate_ids(candidates)
    # hashed int grams, not shingle strings: the exact-Jaccard intersect
    # per pair is the hottest expression, and int64 set-intersects cost a
    # fraction of string ones (hash collisions at p=2^31-1 over ~1e2-1e3
    # grams/doc perturb jaccard by < 1e-6 — below the rounding we emit)
    ci = F.broadcast(cand_ids) if n_ids_est <= _BROADCAST_DOC_LIMIT else cand_ids
    cand_docs = df.join(
        ci, F.col(id_col) == cand_ids.id, "left_semi"
    ).select(
        F.col(id_col).alias("id"),
        gram_set_kernel(shingle_n)(token_hashes(F.trim(F.col(text_col)))).alias("sh"),
    )
    return _pairwise_jaccard(candidates, cand_docs, n_ids_est, threshold)


# ---------------------------------------------------------------------------
# Declared queries (driver correctness surface)
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle=(
        "SELECT md5(text) AS content_hash, min(doc_id) AS doc_id, "
        "count(*) AS dup_count FROM documents GROUP BY md5(text)"
    ),
    doc="Exact dedup: min-id survivor per distinct content hash.",
    tags=("dedup",),
)
def q_dedup_exact(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return exact_dedup(d, ["text"], "doc_id").select("content_hash", "doc_id", "dup_count")


@query(
    "q_dedup_minhash",
    oracle=None,  # LSH banding is engine-specific; rows-only + unit-tested
    doc="MinHash-LSH near-duplicate pairs on documents.text.",
    tags=("dedup", "lsh"),
)
def q_dedup_minhash(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return minhash_lsh_dedup(d, threshold=0.2)


@query(
    "q_dedup_minhash_verified",
    oracle=_minhash_verified_oracle(),
    doc=(
        "Deterministic MinHash dedup (md5-derived hash family, one band = "
        "full-signature equality) — the value-checkable anchor for the "
        "MinHash math shared with q_dedup_minhash's banded LSH path."
    ),
    tags=("dedup", "lsh"),
)
def q_dedup_minhash_verified(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return minhash_exact_dedup(d, n_hashes=4, threshold=0.5)


@query(
    "q_dedup_simhash",
    oracle=None,  # 64-bit signature grouping; rows-only + unit-tested
    doc="SimHash identical-signature groups on documents.text.",
    tags=("dedup",),
)
def q_dedup_simhash(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return simhash_dedup(d)


@query(
    "q_dedup_simhash_hamming",
    oracle=None,  # xxhash64-based signature; rows-only + exact-recall unit tests
    doc=(
        "SimHash near-dup pairs within Hamming distance 3 (pigeonhole "
        "block banding, recall 1 by construction)."
    ),
    tags=("dedup",),
)
def q_dedup_simhash_hamming(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return simhash_hamming_dedup(d, k=3)


# Blocking granularity for the declared exact-jaccard query: 16-char
# length buckets bound the within-block quadratic product (candidate
# pairs at sf0.1: 100k vs 394k with 64-char buckets — measured 4x less
# verify work). Exact blocked jaccard is the strict-blocking tool;
# MinHash-LSH (q_dedup_minhash) is the recall-safe path for dups whose
# lengths straddle a bucket edge.
_NGRAM_LENGTH_BUCKET = 16


def _ngram_oracle() -> str:
    """DuckDB replica of ngram_jaccard_pairs(block_col='lang', n=3,
    t=0.15, length_bucket=_NGRAM_LENGTH_BUCKET, anchor_block=True):
    same blocking key — lang | 16-char length bucket | min md5-gram-hash
    anchor — same word 3-gram sets, same inter/(|A|+|B|-inter) jaccard
    rounded to 4. The Spark path intersects HASHED grams (xxhash64 mod
    2^31-1) instead of strings; a collision would perturb the 4th
    decimal, but at the oracle SF (500 docs, ~200 grams/doc, p=2^31-1)
    the expected collision count is ~1e-3 — verified value-hash-equal at
    sf0.01 and sf0.1. The anchor itself is the md5 family
    (md5_gram_hash), identical in both engines.
    """
    b = _NGRAM_LENGTH_BUCKET
    p = _MERSENNE_31
    return (
        "WITH t AS (SELECT doc_id, lang, text, "
        "  string_split_regex(lower(trim(text)), '\\s+') AS toks "
        "  FROM documents), "
        "g0 AS (SELECT doc_id, lang, text, "
        "  list_distinct(list_transform(generate_series(1, len(toks) - 2), "
        "    i -> array_to_string(toks[i:i+2], ' '))) AS grams "
        "  FROM t WHERE len(toks) >= 3), "
        "g AS (SELECT doc_id, "
        f"  lang || '|' || CAST(CAST(floor(length(text) / {b}.0) AS INT) AS VARCHAR) "
        "    || '|' || CAST(list_min(list_transform(grams, s -> "
        f"      CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {p})) AS VARCHAR) AS blk, "
        "  grams FROM g0), "
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "  len(list_intersect(a.grams, b.grams)) AS inter, "
        "  len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS un "
        "  FROM g a JOIN g b ON a.blk = b.blk AND a.doc_id < b.doc_id) "
        "SELECT id_a, id_b, round(CAST(inter AS DOUBLE) / un, 4) AS jaccard_sim "
        "FROM pairs WHERE round(CAST(inter AS DOUBLE) / un, 4) >= 0.15"
    )


@query(
    "q_dedup_ngram",
    oracle=_ngram_oracle(),
    doc=(
        "Blocked exact n-gram Jaccard pairs (block = lang + 16-char "
        "length bucket + min md5-gram-hash anchor). The anchor is a "
        "1-hash MinHash: candidates must share their uniformly-random "
        "minimum gram, so near-exact dups (J -> 1) still pair while the "
        "within-block quadratic no longer tracks corpus density — the "
        "round-5 x10 candidate-growth fix, declared in the oracle like "
        "the length bucket."
    ),
    tags=("dedup",),
)
def q_dedup_ngram(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        d,
        block_col="lang",
        threshold=0.15,
        length_bucket=_NGRAM_LENGTH_BUCKET,
        anchor_block=True,
    )


# ---------------------------------------------------------------------------
# Passage-level dedup: chunk documents into fixed k-token passages,
# dedup passages globally, reassemble surviving text per document.
# ---------------------------------------------------------------------------

_PASSAGE_TOKENS = 8


def passage_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = _PASSAGE_TOKENS,
) -> DataFrame:
    """Sub-document (passage-level) exact dedup — the boilerplate-removal
    pass of a training-data pipeline: repeated passages (headers, license
    blocks, navigation chrome) are kept only at their first occurrence
    corpus-wide, and each document is reassembled from its surviving
    passages.

    A "passage" is a run of ``chunk_tokens`` consecutive whitespace
    tokens (fixture text has no paragraph breaks; real corpora would
    split on blank lines first and chunk within). First occurrence =
    smallest (doc_id, chunk index) over the passage's md5, decided by a
    row_number window over the hash — ONE shuffle keyed by passage hash
    (16 bytes + ids; passage text rides along only to be re-emitted).
    Reassembly is a per-doc sort_array(collect_list(struct(pos, chunk)))
    — grouping state bounded by document length.

    Output: (doc_id, n_chunks, n_kept, clean_text) for documents that
    keep at least one passage.
    """
    from pyspark.sql import Window

    chunks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
        )
        .filter(F.size("toks") >= 1)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size("toks") / float(chunk_tokens)).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(F.col("toks"), i * chunk_tokens + 1, chunk_tokens), " "
                    ),
                )
            ).alias("cpos", "chunk"),
        )
    )
    w_first = Window.partitionBy(F.md5(F.col("chunk"))).orderBy("doc_id", "cpos")
    w_doc = Window.partitionBy("doc_id")
    flagged = chunks.withColumn("rn", F.row_number().over(w_first)).withColumn(
        "n_chunks", F.count(F.lit(1)).over(w_doc).cast("bigint")
    )
    kept = flagged.filter(F.col("rn") == 1)
    return (
        kept.groupBy("doc_id", "n_chunks")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("cpos", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select("doc_id", "n_chunks", "n_kept", "clean_text")
    )


def _passage_oracle(chunk_tokens: int = _PASSAGE_TOKENS) -> str:
    k = chunk_tokens
    return (
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        "c AS (SELECT doc_id, "
        f"unnest(generate_series(0, CAST(ceil(len(toks) / {k}.0) AS INT) - 1)) AS cpos, "
        f"unnest(list_transform(generate_series(0, CAST(ceil(len(toks) / {k}.0) AS INT) - 1), "
        f"i -> array_to_string(toks[i * {k} + 1 : i * {k} + {k}], ' '))) AS chunk "
        "FROM t WHERE len(toks) >= 1), "
        "f AS (SELECT doc_id, cpos, chunk, "
        "row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, cpos) AS rn, "
        "count(*) OVER (PARTITION BY doc_id) AS n_chunks FROM c) "
        "SELECT doc_id, n_chunks, CAST(count(*) AS BIGINT) AS n_kept, "
        "string_agg(chunk, ' ' ORDER BY cpos) AS clean_text "
        "FROM f WHERE rn = 1 GROUP BY doc_id, n_chunks"
    )


@query(
    "q_dedup_passage",
    oracle=_passage_oracle(),
    doc=(
        "Passage-level exact dedup: fixed 8-token chunks, corpus-wide "
        "first-occurrence survivorship by md5, per-doc reassembly of "
        "surviving passages. One hash-keyed shuffle + one doc-keyed "
        "regroup."
    ),
    tags=("dedup", "pipeline"),
)
def q_dedup_passage(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return passage_dedup(d)


# ---------------------------------------------------------------------------
# Oracle-verified SimHash (md5 hash family, 16 bits) — the cross-engine
# twin of simhash_dedup, same role q_dedup_minhash_verified plays for
# MinHash: the production path keeps the xxhash64 numpy kernel, this
# variant makes the SimHash MATH value-checkable against a SQL oracle.
# ---------------------------------------------------------------------------

_SIMHASH_V_BITS = 16


def simhash_verified_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = _SIMHASH_V_BITS,
) -> DataFrame:
    """Identical-signature SimHash groups with an engine-portable hash
    family: distinct tokens hash via md5_gram_hash (31-bit, identical in
    DuckDB), bit b of the signature is the sign of the +-1 vote over
    token-hash bit b.

    Plan shape: explode distinct (doc, token-hash) rows, then ONE hash
    aggregation computing all ``n_bits`` votes as conditional sums —
    whole-stage-codegen'd integer CASEs, no interpreted HOF lambdas (the
    measured trap simhash64's numpy kernel also avoids), no Python. The
    vote input is vocabulary-bounded rows, the same exchange the
    repetition/tfidf operators ride.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        ).alias("tok"),
    )
    th = toks.select("id", md5_gram_hash(F.col("tok")).alias("h"))
    votes = th.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(n_bits)
        ]
    )
    sig = sum(
        [
            F.when(F.col(f"v{b}") >= 0, F.lit(1 << b)).otherwise(0)
            for b in range(n_bits)
        ],
        F.lit(0),
    ).cast("bigint")
    sigs = votes.select("id", sig.alias("simhash"))
    return (
        sigs.groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("ids_csv"),
        )
        .filter(F.col("group_size") > 1)
    )


def _simhash_verified_oracle(n_bits: int = _SIMHASH_V_BITS) -> str:
    p = _MERSENNE_31
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(n_bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(n_bits)
    )
    return (
        "WITH tok AS (SELECT DISTINCT doc_id AS id, "
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents), "
        "th AS (SELECT id, "
        f"CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {p} AS h FROM tok), "
        f"v AS (SELECT id, {votes} FROM th GROUP BY id), "
        f"s AS (SELECT id, CAST({sig} AS BIGINT) AS simhash FROM v) "
        "SELECT simhash, count(*) AS group_size, "
        "string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS ids_csv "
        "FROM s GROUP BY simhash HAVING count(*) > 1"
    )


@query(
    "q_dedup_simhash_verified",
    oracle=_simhash_verified_oracle(),
    doc=(
        "Oracle-verified SimHash (16-bit, md5 hash family): bit votes as "
        "codegen'd conditional sums over vocabulary-bounded (doc, "
        "token-hash) rows; identical-signature groups value-checked "
        "against DuckDB."
    ),
    tags=("dedup",),
)
def q_dedup_simhash_verified(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return simhash_verified_dedup(d)


def md5_minhash_sig_key_from_tokens(
    toks: Column,
    id_col: Column,
    n_hashes: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> Column:
    """md5_minhash_sig_key over a MATERIALIZED token-array column —
    callers must project the split() into an attribute first (the
    shingles_from_tokens inlining contract: a non-attribute tokens
    expression gets re-evaluated per shingle, O(tokens x grams)
    re-tokenization per row).

    Documents too short to shingle (< shingle_n tokens) get a per-doc
    ``short:<id>`` key: unique per id, they pass through dedup. A NULL
    id would make that key NULL (concat propagates NULL), silently
    merging every short null-id row into ONE survivor — instead the key
    falls back to ``short:~<md5(tokens)>``, so null-id short rows merge
    only when their text is identical (which IS a duplicate) and
    distinct texts always pass through. Deterministic, so the DuckDB
    oracle (md5_sig_key_sql) reproduces it; streaming-safe (pure
    expression, no nondeterministic id generator).

    Perf note: the md5 base hash dominates, so the n_hashes running
    minimums fold into ONE ``F.aggregate`` pass over the hashed gram
    array (struct accumulator) — the base hash evaluates exactly once
    per gram. The naive form (one ``array_min(transform(...))`` per
    affine row) re-evaluates md5 n_hashes times because Catalyst does
    not share subexpressions across interpreted HOF lambdas; measured
    ~4x slower at sf0.1. The batch path (minhash_exact_dedup) keeps
    the explode/groupBy whole-stage-codegen shape instead.
    """
    grams = shingles_from_tokens(toks, shingle_n)
    hs = F.transform(grams, md5_gram_hash)
    params = _hash_params(n_hashes, seed)

    init = F.struct(
        *[F.lit(_MERSENNE_31).cast("long").alias(f"m{i}") for i in range(n_hashes)]
    )

    def step(acc: Column, h: Column) -> Column:
        return F.struct(
            *[
                F.least(
                    acc[f"m{i}"],
                    F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_31)),
                ).alias(f"m{i}")
                for i, (a, b) in enumerate(params)
            ]
        )

    mins = F.aggregate(hs, init, step)
    parts = [mins[f"m{i}"].cast("string") for i in range(n_hashes)]
    null_id_fallback = F.concat(F.lit("~"), F.md5(F.concat_ws(" ", toks)))
    return F.when(
        F.size(toks) >= shingle_n, F.concat_ws(",", *parts)
    ).otherwise(
        F.concat(
            F.lit("short:"), F.coalesce(id_col.cast("string"), null_id_fallback)
        )
    )


def minhash_tokens(text_col: Column) -> Column:
    """The signature-key tokenization (lower/trim/whitespace-split) —
    project this into an attribute column BEFORE calling
    md5_minhash_sig_key_from_tokens (see its inlining contract)."""
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def md5_sig_key_kernel(n_hashes: int = 4, shingle_n: int = 3, seed: int = 42):
    """Arrow-batched kernel form of md5_minhash_sig_key_from_tokens:
    (token-array, id) -> signature-key string, VALUE-IDENTICAL to the
    Catalyst expression (tests/test_streaming.py pins equality row by
    row; q_stream_dedup_fuzzy's DuckDB oracle value-checks it end to
    end).

    Why it exists: the Catalyst form evaluates md5 + the n_hashes affine
    fold inside an interpreted F.aggregate lambda (~2 ms/doc — the
    streaming fuzzy-dedup throughput floor, stream_probe 0.4k rows/s).
    Here the per-gram base hash is one hashlib.md5 call (C speed) and
    the affine minima are ONE numpy (n_hashes x grams) matrix +
    minimum.reduceat over the whole batch — the same pattern as
    minhash_band_keys_kernel, but on the md5 family so oracles still
    reproduce every value. Tokenization stays in Catalyst (codegen'd
    split; also avoids Java-vs-Python regex whitespace-class drift).

    Map-side only; streaming-safe (stateless projection ahead of
    dropDuplicatesWithinWatermark).

    The id argument must be passed PRE-CAST to string in Catalyst
    (callers pass ``id_col.cast("string")``): Arrow int64-with-null
    batches convert to pandas float64, so a numeric id whose batch
    happens to contain a NULL id would otherwise format as "4.0" vs the
    Catalyst expression's "4" — a partitioning-dependent key divergence
    (and a precision loss past 2^53). Delegating the cast to Spark
    makes the kernel's string identical to the expression's by
    construction.
    """
    import hashlib

    params = _hash_params(n_hashes, seed)
    A = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    B = np.array([b for _, b in params], dtype=np.int64)[:, None]
    n1 = shingle_n - 1

    @F.pandas_udf("string")
    def kernel(toks: pd.Series, id_strs: pd.Series) -> pd.Series:
        n = len(toks)
        out: list = [None] * n
        hash_rows: list = []
        for r in range(n):
            t = toks.iloc[r]
            if t is None or len(t) < shingle_n:
                sid = id_strs.iloc[r]
                if sid is None or pd.isna(sid):
                    joined = " ".join(t) if t is not None else ""
                    out[r] = (
                        "short:~" + hashlib.md5(joined.encode("utf-8")).hexdigest()
                    )
                else:
                    out[r] = "short:" + sid
                continue
            m = len(t) - n1
            hs = np.empty(m, dtype=np.int64)
            for i in range(m):
                g = " ".join(t[i : i + shingle_n])
                hs[i] = (
                    int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                    % _MERSENNE_31
                )
            hash_rows.append(hs)
        if hash_rows:
            glens = np.fromiter((h.size for h in hash_rows), dtype=np.int64)
            starts = np.zeros(glens.size, dtype=np.int64)
            np.cumsum(glens[:-1], out=starts[1:])
            flat = np.concatenate(hash_rows)
            # elements < 2^31, a < 2^31 -> products < 2^62: int64-safe
            M = (flat[None, :] * A + B) % _MERSENNE_31
            mins = np.minimum.reduceat(M, starts, axis=1)
            j = 0
            for r in range(n):
                if out[r] is None:
                    out[r] = ",".join(
                        str(int(mins[k, j])) for k in range(n_hashes)
                    )
                    j += 1
        return pd.Series(out, dtype="object")

    return kernel


def md5_minhash_sig_key(
    text_col: Column,
    id_col: Column,
    n_hashes: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> Column:
    """Row-LOCAL deterministic MinHash signature key (md5 hash family,
    one band spanning the whole signature) — the streaming-safe form of
    minhash_exact_dedup's candidate key: a single projection expression
    with no explode/groupBy, so it runs inside a streaming select ahead
    of dropDuplicatesWithinWatermark. Same tokenization, grams, base
    hash (md5_gram_hash) and affine family as the batch operator, so a
    DuckDB oracle reproduces every key.

    ONE-EXPRESSION convenience form: the inline split() re-evaluates
    per shingle under Catalyst's lambda inlining (O(tokens x grams)
    re-tokenization per row). Hot paths (q_stream_dedup_fuzzy, the
    streaming fuzzy-dedup pipeline) materialize the token array first
    and call md5_minhash_sig_key_from_tokens — measured 2.2x on the
    sf0.1 signature stage (0.84 s -> 0.38 s warm).
    """
    return md5_minhash_sig_key_from_tokens(
        minhash_tokens(text_col), id_col, n_hashes, shingle_n, seed
    )


def md5_sig_key_sql(
    toks_expr: str,
    id_expr: str,
    n_hashes: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> str:
    """DuckDB scalar expression mirroring md5_minhash_sig_key, for use
    in oracles: ``toks_expr``/``id_expr`` are SQL fragments naming the
    token-list and id columns in scope."""
    p = _MERSENNE_31
    n1 = shingle_n - 1
    grams = (
        f"list_distinct(list_transform(generate_series(1, len({toks_expr}) - {n1}), "
        f"i -> array_to_string({toks_expr}[i:i+{n1}], ' ')))"
    )
    hs = (
        f"list_transform({grams}, s -> "
        f"CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {p})"
    )
    sig = " || ',' || ".join(
        f"CAST(list_min(list_transform({hs}, x -> ({a} * x + {b}) % {p})) AS VARCHAR)"
        for a, b in _hash_params(n_hashes, seed)
    )
    return (
        f"CASE WHEN len({toks_expr}) >= {shingle_n} THEN {sig} "
        f"ELSE 'short:' || COALESCE(CAST({id_expr} AS VARCHAR), "
        f"'~' || md5(COALESCE(array_to_string({toks_expr}, ' '), ''))) END"
    )


def corpus_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, content_hash, sig_key) for a corpus — the dedup key
    projection incremental_dedup screens with, exposed so callers whose
    batch and store derive from ONE scan can key it once (and persist
    the keyed frame) instead of paying the sig kernel per side."""
    # signature via the Arrow-batched kernel, not the Catalyst HOF
    # expression: value-identical by pinned test (test_streaming.py::
    # test_sig_key_kernel_equals_catalyst_expression) and ~14x/doc —
    # the store side re-keys the whole corpus here, so the map stage is
    # the cost center (measured 3.66 s -> ~1 s at sf0.1). Tokenization
    # stays in Catalyst (codegen split; also pins Java-regex semantics).
    kernel = md5_sig_key_kernel(n_hashes, shingle_n, seed)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
        minhash_tokens(F.col(text_col)).alias("__toks"),
    )
    return toks.select(
        "doc_id",
        "content_hash",
        kernel(F.col("__toks"), F.col("doc_id").cast("string")).alias("sig_key"),
    )


def incremental_dedup(
    batch: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    keyed_input: bool = False,
) -> DataFrame:
    """Incremental ingest dedup: screen a NEW batch against the already-
    ingested corpus without re-deduplicating history. Two stages inside
    the batch (exact content-hash first, then the row-local md5-MinHash
    signature collapses near-identical re-crawls), then two anti-joins
    drop survivors whose content hash OR fuzzy signature already exists
    in the store. ``store`` needs only (text, id) here, but in
    production it is the persisted (content_hash, sig_key) key table —
    each ingest appends its survivors' keys, so successive batches
    never rescan historical text.

    Output: (doc_id, content_hash, sig_key, dup_count) — the surviving
    batch docs, dup_count = how many batch docs collapsed into each.

    Scale design: every exchange is keyed by a hash/signature string —
    document bodies never shuffle. The store side is the 100 TB corpus'
    key set: it is NEVER broadcast (anti-joins shuffle both sides on the
    key; AQE handles skew), and at real scale it reads from the
    persisted key parquet, i.e. O(history keys) bytes, not O(history
    text). Batch-side work is one map pass + two key-bounded aggregates.
    """
    if keyed_input:
        b, s = batch, store
    else:
        b = corpus_keys(batch, text_col, id_col, n_hashes, shingle_n, seed)
        s = corpus_keys(store, text_col, id_col, n_hashes, shingle_n, seed)
    # within-batch stage 1: exact dedup (min-id survivor per content
    # hash). sig_key is text-determined for shingleable docs; min_by
    # keeps the SURVIVOR's key so short docs (id-suffixed keys) stay
    # per-survivor.
    exact = b.groupBy("content_hash").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("sig_key", "doc_id").alias("sig_key"),
        F.count(F.lit(1)).alias("n_exact"),
    )
    # within-batch stage 2: fuzzy collapse of the exact survivors
    fuzzy = exact.groupBy("sig_key").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("content_hash", "doc_id").alias("content_hash"),
        F.sum("n_exact").alias("dup_count"),
    )
    # history screen: anti-join the store's key sets (keys only — at
    # scale this is the persisted signature store, not a text scan).
    # Both anti-joins hinted shuffle_hash: the store side is O(history
    # keys) — construction-UNBOUNDED, so it must never ride a post-
    # aggregate size estimate into a broadcast (repo policy since the
    # containment AQE-broadcast OOM, da9de06); a plan contract pins this
    return (
        fuzzy.join(
            s.select("sig_key").distinct().hint("shuffle_hash"),
            "sig_key",
            "left_anti",
        )
        .join(
            s.select("content_hash").distinct().hint("shuffle_hash"),
            "content_hash",
            "left_anti",
        )
        .select("doc_id", "content_hash", "sig_key", "dup_count")
    )


def _incremental_oracle(
    modulus: int = 3, n_hashes: int = 4, shingle_n: int = 3, seed: int = 42
) -> str:
    sig = md5_sig_key_sql("toks", "doc_id", n_hashes, shingle_n, seed)
    return (
        "WITH d AS (SELECT doc_id, md5(text) AS content_hash, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        f"k AS (SELECT doc_id, content_hash, {sig} AS sig_key FROM d), "
        f"b AS (SELECT * FROM k WHERE doc_id % {modulus} = 0), "
        f"s AS (SELECT * FROM k WHERE doc_id % {modulus} <> 0), "
        "ex AS (SELECT content_hash, min(doc_id) AS doc_id, "
        "arg_min(sig_key, doc_id) AS sig_key, count(*) AS n_exact "
        "FROM b GROUP BY content_hash), "
        "fz AS (SELECT sig_key, min(doc_id) AS doc_id, "
        "arg_min(content_hash, doc_id) AS content_hash, "
        "CAST(sum(n_exact) AS BIGINT) AS dup_count FROM ex GROUP BY sig_key) "
        "SELECT doc_id, content_hash, sig_key, dup_count FROM fz "
        "WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.sig_key = fz.sig_key) "
        "AND NOT EXISTS (SELECT 1 FROM s WHERE s.content_hash = fz.content_hash)"
    )


@query(
    "q_dedup_incremental",
    oracle=_incremental_oracle(),
    doc=(
        "Incremental ingest dedup: new batch (doc_id % 3 = 0) dedupes "
        "within itself (exact hash, then fuzzy md5-MinHash signature) "
        "and anti-joins the historical store's key sets — the "
        "signature-store maintenance step of a continuously-ingesting "
        "corpus; keys shuffle, text bodies never do."
    ),
    tags=("dedup", "pipeline"),
)
def q_dedup_incremental(spark, sf_dir):
    # _spread: the sig kernel is the cost center and must not inherit a
    # one-row-group scan's single partition (see tables.spread). Batch
    # and store derive from ONE scan here, so key the corpus once and
    # persist the keyed frame — the kernel runs one pass instead of two
    # (measured 2.7 s -> ~1.2 s in-bench).
    d = _spread(T(spark, sf_dir, "documents"))
    keys = pin(corpus_keys(d))
    batch = keys.filter(F.col("doc_id") % 3 == 0)
    store = keys.filter(F.col("doc_id") % 3 != 0)
    return incremental_dedup(batch, store, keyed_input=True)


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-SUBSET duplicate pairs by Broder containment
    C(A,B) = |A n B| / |A|: doc A is (mostly) contained in doc B —
    the asymmetric relation Jaccard misses (a long aggregator page
    containing a short article scores low Jaccard but containment ~1).

    Blocking: doc A's single min md5-gram-hash anchor joins against
    doc B's full hashed gram posting rows. If C(A,B) >= t, A's
    uniformly-random minimum gram lies in B with probability >= t —
    a 1-hash MinHash bound, so recall is >= threshold by construction
    (exact for full subsets). A length prefilter (nb >= t * na) rides
    the same join condition.

    Scale design — gram-SET signature collapse, then the quadratic work
    runs on DISTINCT sets only:

    1. Docs collapse to their gram-set signature (md5 of the sorted
       hash array) — one groupBy carrying each hash array ONCE per doc.
       Real corpora are dup-heavy (that is why dedup operators exist),
       so distinct signatures << docs; exact replicas collapse to one
       representative BEFORE any pairing.
    2. Anchor blocking + array verify run between REPRESENTATIVES: the
       A side contributes one key row per distinct set, the B side one
       posting row per (set, gram). The verify join carries gram arrays
       once per candidate REP pair — the per-pair array shuffle that
       made the x100 replica probe output-bound now scales with
       distinct-set pairs, not doc pairs.
    3. Rep-level pairs expand back to doc pairs through two member
       joins (narrow rows), and same-signature members pair directly
       with containment exactly 1.0 — equal hash sets intersect fully,
       so this branch is identity-equal to running the verify join on
       those pairs, not an approximation.

    Like q_dedup_ngram, the exact intersect (and hence the signature)
    runs on 31-bit hashed grams (collision odds ~1e-3 at fixture scale,
    see _ngram_oracle's note); the oracle reproduces the md5 anchor
    exactly and intersects gram strings.
    """
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__toks"),
    )
    g = base.select(
        "id", shingles_from_tokens(F.col("__toks"), shingle_n).alias("__grams")
    ).filter(F.size("__grams") > 0)
    keyed = pin(
        g.select(
            "id",
            # bigint: DuckDB len() is BIGINT — keeps na/nb dtype-identical
            F.size("__grams").cast("bigint").alias("n"),
            F.transform(F.col("__grams"), md5_gram_hash).alias("hs"),
        ).withColumn(
            # order-free set signature: hs follows token order, so sort
            # before hashing; md5 (128-bit) keeps accidental signature
            # collisions far below the declared 31-bit gram-hash caveat
            "sig",
            F.md5(
                F.array_join(
                    F.transform(F.array_sort("hs"), lambda h: h.cast("string")), ","
                )
            ),
        )
    )
    members = keyed.select("sig", "id", "n")
    # pinned: reps feeds FOUR consumers (anchor side a, posting side e,
    # and both verify sides va/vb), and their column-pruned aggregate
    # subtrees differ, so without the pin each consumer re-runs the
    # groupBy(sig) exchange over the cached keyed frame (4 aggregate
    # shuffles for one logical aggregate — r11 plan audit). O(distinct
    # sigs) rows, the collapse's whole point is that this is small.
    reps = pin(
        keyed.groupBy("sig").agg(
            # n and hs-as-a-set are sig-determined; min_by pins a
            # deterministic representative array ordering
            F.min_by("n", "id").alias("n"),
            F.min_by("hs", "id").alias("hs"),
        )
    )
    a = reps.select(
        F.col("sig").alias("sig_a"),
        F.col("n").alias("na"),
        F.array_min("hs").alias("__anchor"),
    )
    e = reps.select(
        F.col("sig").alias("sig_b"),
        F.col("n").alias("nb"),
        F.explode("hs").alias("__h"),
    )
    # every join in this operator is hinted shuffle_hash: no side is
    # bounded by construction (reps is O(distinct sets), cand is
    # O(candidates), members is O(corpus)), and Catalyst's post-join
    # size estimates are unreliable enough that AQE attempted a
    # driver-OOM broadcast of a 5M-row candidate table at the x100
    # probe. Hash-partitioned joins on anchor/sig keys are the honest
    # arms at every scale.
    cand = a.hint("shuffle_hash").join(
        e.hint("shuffle_hash"),
        (F.col("__anchor") == F.col("__h"))
        & (F.col("sig_a") != F.col("sig_b"))
        & (F.col("nb").cast("double") >= F.lit(threshold) * F.col("na")),
    ).select("sig_a", "sig_b", "na", "nb")
    va = reps.select(F.col("sig").alias("sig_a"), F.col("hs").alias("__ha"))
    vb = reps.select(F.col("sig").alias("sig_b"), F.col("hs").alias("__hb"))
    inter = F.size(F.array_intersect("__ha", "__hb"))
    rep_pairs = (
        cand.hint("shuffle_hash")
        .join(va.hint("shuffle_hash"), "sig_a")
        .join(vb.hint("shuffle_hash"), "sig_b")
        .select(
            "sig_a",
            "sig_b",
            "na",
            "nb",
            F.round(inter.cast("double") / F.col("na"), 4).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
    ma = members.select(F.col("sig").alias("sig_a"), F.col("id").alias("doc_a"))
    mb = members.select(F.col("sig").alias("sig_b"), F.col("id").alias("doc_b"))
    cross = (
        rep_pairs.hint("shuffle_hash")
        .join(ma.hint("shuffle_hash"), "sig_a")
        .join(mb.hint("shuffle_hash"), "sig_b")
        .select("doc_a", "doc_b", "na", "nb", "containment")
    )
    # identical hash sets: anchor membership and the length prefilter
    # hold in both directions and the hash intersect is total, so every
    # ordered member pair is required output at containment exactly 1.0
    m1 = members.select("sig", F.col("id").alias("doc_a"), F.col("n").alias("na"))
    m2 = members.select("sig", F.col("id").alias("doc_b"), F.col("n").alias("nb"))
    same = (
        m1.hint("shuffle_hash")
        .join(m2.hint("shuffle_hash"), "sig")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            F.lit(1.0).alias("containment"),
        )
        # constant-folds: same-sig pairs exist in the output iff the
        # threshold admits full containment
        .filter(F.lit(1.0) >= F.lit(threshold))
    )
    return cross.unionByName(same)


def _containment_oracle(shingle_n: int = 3, threshold: float = 0.8) -> str:
    p = _MERSENNE_31
    n1 = shingle_n - 1
    return (
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        "g AS (SELECT doc_id, "
        f"list_distinct(list_transform(generate_series(1, len(toks) - {n1}), "
        f"i -> array_to_string(toks[i:i+{n1}], ' '))) AS grams "
        f"FROM t WHERE len(toks) >= {shingle_n}), "
        "a AS (SELECT doc_id, grams, len(grams) AS na, "
        "list_min(list_transform(grams, s -> "
        f"CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {p})) AS anchor FROM g), "
        "e AS (SELECT doc_id, len(grams) AS nb, grams, "
        "unnest(list_transform(grams, s -> "
        f"CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {p})) AS h FROM g), "
        "cand AS (SELECT a.doc_id AS doc_a, e.doc_id AS doc_b, a.na, e.nb, "
        "a.grams AS ga, e.grams AS gb FROM a JOIN e ON a.anchor = e.h "
        f"AND a.doc_id <> e.doc_id AND e.nb >= {threshold} * a.na) "
        "SELECT doc_a, doc_b, na, nb, "
        "round(CAST(len(list_intersect(ga, gb)) AS DOUBLE) / na, 4) AS containment "
        "FROM cand "
        f"WHERE round(CAST(len(list_intersect(ga, gb)) AS DOUBLE) / na, 4) >= {threshold}"
    )


@query(
    "q_dedup_containment",
    oracle=_containment_oracle(),
    doc=(
        "Near-subset duplicate pairs by Broder containment |AnB|/|A| — "
        "the asymmetric relation Jaccard misses (short doc inside a "
        "long aggregator page). Min-gram-anchor blocking (recall >= "
        "threshold by the 1-hash MinHash bound), length prefilter in "
        "the join condition, array-verify on candidates only."
    ),
    tags=("dedup",),
)
def q_dedup_containment(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return containment_pairs(d)


# ---------------------------------------------------------------------------
# Duplicate-cluster profile: the corpus-health diagnostic read BEFORE
# choosing a dedup strategy (a corpus whose duplication lives in a few
# giant clusters wants cluster-representative sampling; one with a long
# tail of pairs wants near-dup passes).
# ---------------------------------------------------------------------------


def dup_cluster_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Size distribution of exact-duplicate clusters.

    Output: one row per observed cluster size — (cluster_size,
    n_clusters, n_docs, redundant_docs) where redundant_docs counts the
    rows exact dedup would remove at that size.

    Scale design: ONE shuffle keyed by the 16-byte md5 of the content
    (ids/text never shuffled — the hash aggregate is map-side partial),
    then a histogram over cluster sizes whose cardinality is bounded by
    the largest cluster (hundreds of distinct sizes at any corpus
    scale). No joins, no driver state; the same plan at 100 TB is scan +
    two bounded exchanges.
    """
    sizes = (
        df.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias(
                "redundant_docs"
            ),
        )
    )


@query(
    "q_dup_cluster_stats",
    # The fixture corpus has no exact duplicates (every md5 is unique,
    # which would collapse the histogram to one trivial row), so the
    # declared query profiles the corpus PLUS a deterministic duplicated
    # subset (every doc_id % 7 == 0 appears twice) — the q_contamination
    # pseudo-benchmark precedent: the derivation is synthetic and
    # declared in the oracle; the OPERATOR is the real thing.
    oracle=(
        "WITH u AS (SELECT text FROM documents UNION ALL "
        "SELECT text FROM documents WHERE doc_id % 7 = 0), "
        "c AS (SELECT md5(text) AS h, count(*) AS cluster_size "
        "FROM u GROUP BY 1) "
        "SELECT cluster_size, count(*) AS n_clusters, "
        "CAST(cluster_size * count(*) AS BIGINT) AS n_docs, "
        "CAST((cluster_size - 1) * count(*) AS BIGINT) AS redundant_docs "
        "FROM c GROUP BY cluster_size"
    ),
    doc=(
        "Exact-duplicate cluster-size histogram: n_clusters / n_docs / "
        "redundant_docs per cluster size — one content-hash shuffle plus "
        "a bounded histogram aggregate (corpus + deterministic "
        "duplicated subset so multi-size clusters exist in the fixture)."
    ),
    tags=("dedup", "profile"),
)
def q_dup_cluster_stats(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    u = d.select("text").unionAll(d.filter(F.col("doc_id") % 7 == 0).select("text"))
    return dup_cluster_stats(u)


# ---------------------------------------------------------------------------
# Soft deduplication: instead of DROPPING duplicates (exact_dedup's
# min-id survivor), every document keeps a sampling weight 1/n over its
# exact-content cluster, so the EXPECTED contribution of each distinct
# content to training is one document ("SoftDeDup" reweighting). The
# hard-dedup decision becomes a knob downstream (threshold the weight)
# and no information is destroyed at the pipeline stage.
# ---------------------------------------------------------------------------


def soft_dedup_weights(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """(id, cluster_size, weight=1/cluster_size) for every row, keyed
    by the md5 of the content columns — exact_dedup's grouping with
    per-member reweighting instead of survivor selection.

    Scale design: one 16-byte-key count aggregate (map-side partial)
    and one hash-keyed join back to the id projection — the shuffle
    carries (hash, id) pairs, never document bodies, and the count
    table is distinct-content-sized. The join side is pinned
    shuffle_hash: the count table is ~corpus-sized (most content is
    unique), so a stats-estimated broadcast would die at real scale.
    No window: count() OVER (PARTITION BY hash) sorts the full corpus
    for a per-key constant.
    """
    content_hash = F.md5(F.concat_ws(" ", *content_cols))
    keyed = df.select(F.col(id_col), content_hash.alias("__h"))
    counts = keyed.groupBy("__h").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        keyed.join(counts.hint("shuffle_hash"), "__h")
        .select(
            id_col,
            "cluster_size",
            F.round(F.lit(1.0) / F.col("cluster_size"), 6).alias("weight"),
        )
    )


@query(
    "q_dedup_soft",
    oracle=(
        "WITH k AS (SELECT doc_id, md5(text) AS h FROM documents), "
        "c AS (SELECT h, count(*) AS cluster_size FROM k GROUP BY h) "
        "SELECT k.doc_id, c.cluster_size, "
        "round(1.0 / c.cluster_size, 6) AS weight "
        "FROM k JOIN c USING (h)"
    ),
    doc=(
        "Soft dedup: per-document sampling weight 1/cluster_size over "
        "exact-content clusters — reweighting instead of dropping, so "
        "each distinct content contributes one expected document."
    ),
    tags=("dedup", "pipeline"),
)
def q_dedup_soft(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return soft_dedup_weights(d, ["text"], "doc_id")


# ---------------------------------------------------------------------------
# Prefix-boilerplate dedup: documents sharing an identical opening
# k-token prefix — the scraped-header/template signal (same banner, same
# license block) that exact dedup misses because the bodies differ and
# passage dedup dilutes because the match is positional. The group
# report drives a strip-the-prefix cleanup rather than a drop.
# ---------------------------------------------------------------------------


def prefix_dedup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """(prefix_hash, n_docs, rep_id): groups of >= 2 documents whose
    first ``k`` whitespace tokens are identical, with the min-id
    representative (the exact_dedup survivor rule).

    Scale design: the prefix reduces to a 16-byte md5 BEFORE the
    exchange (document bodies never shuffle); one hash-keyed count
    aggregate with map-side partials is the whole operator."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    pref = F.md5(F.concat_ws(" ", F.slice(toks, 1, k)))
    return (
        df.filter(F.size(toks) >= k)
        .select(F.col(id_col), pref.alias("prefix_hash"))
        .groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("rep_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "q_dedup_prefix",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks "
        "FROM documents), "
        "p AS (SELECT doc_id, md5(array_to_string(toks[1:8], ' ')) AS h "
        "FROM t WHERE len(toks) >= 8) "
        "SELECT h AS prefix_hash, count(*) AS n_docs, "
        "min(doc_id) AS rep_id FROM p GROUP BY h HAVING count(*) >= 2"
    ),
    doc=(
        "Prefix-boilerplate groups: documents sharing an identical "
        "8-token opening (template headers/banners); prefixes reduce to "
        "16-byte md5 keys before the single count exchange."
    ),
    tags=("dedup", "text", "pipeline"),
)
def q_dedup_prefix(spark, sf_dir):
    return prefix_dedup_groups(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# LSH banding recall/precision eval — the dedup-quality twin of
# q_ann_recall: "how much true duplication does the banded MinHash
# candidate generator actually catch, and how much junk does it
# propose?" Measured per probe document against exact gram-set Jaccard
# ground truth, with the md5 hash family so every stage is
# engine-portable and the whole eval carries a full SQL oracle.
# ---------------------------------------------------------------------------


def lsh_recall_eval(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 4,
    n_bands: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.3,
    n_probes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """(probe_id, n_true, n_cand, n_hit, recall, precision) for the
    ``n_probes`` smallest eligible doc ids: ground truth = exact
    gram-Jaccard >= threshold against the whole corpus; candidates =
    sharing at least one of ``n_bands`` signature bands with the probe.

    Scale design: the probe set is CONSTRUCTION-BOUNDED (n_probes rows),
    so both eval arms broadcast it — ground truth is one map-side pass
    of the corpus against n_probes gram arrays (O(N * probes), linear,
    the q_ann_recall exact-arm shape), and the candidate arm is a
    broadcast join on (band_id, band_value). Nothing pair-scale ever
    shuffles; per-probe stats aggregate on the n_probes-bounded key.
    The production banded-LSH path (xxhash64 family) shares exactly
    this banding math — this eval pins its recall behavior with the
    value-checkable md5 family.
    """
    rows_per_band = n_hashes // n_bands
    params = _hash_params(n_hashes, seed)
    spread = _spread(df).filter(
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")) >= shingle_n
    )
    toks = spread.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    )
    g = pin(
        toks.select(
            "id", shingles_from_tokens(F.col("toks"), shingle_n).alias("grams")
        ).filter(F.size("grams") > 0)
    )
    g.count()
    h = g.select("id", F.explode("grams").alias("gram")).select(
        "id", md5_gram_hash(F.col("gram")).alias("h")
    )
    sig = h.groupBy("id").agg(
        *[
            F.min(F.pmod(F.col("h") * F.lit(pa) + F.lit(pb), F.lit(_MERSENNE_31)))
            .cast("string")
            .alias(f"_s{i}")
            for i, (pa, pb) in enumerate(params)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(
                "_", *[f"_s{b * rows_per_band + r}" for r in range(rows_per_band)]
            ).alias("band_val"),
        )
        for b in range(n_bands)
    ]
    bands = sig.select(
        "id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("id", "bs.band_id", "bs.band_val")

    # probes feed three consumers (gt arm, candidate arm, output spine):
    # pin so the TakeOrdered over the cached gram table runs once
    probes = pin(g.orderBy("id").limit(n_probes))
    # ground truth via inverted-index intersection instead of a cross
    # join: the old BroadcastNestedLoopJoin evaluated array_intersect
    # THREE times per (doc, probe) pair inside the join condition (no
    # common-subexpression elimination there — plan op (19) in
    # plans/r10/q_dedup_eval_before.txt). Explode grams once, broadcast-
    # hash-join on the gram itself against the probes' exploded grams
    # (n_probes x |grams| rows, construction-bounded), and COUNT matches
    # per pair — each intersection is computed exactly once as a join
    # cardinality. Set sizes ride along the exploded rows (constant per
    # group), so no N-scale size join afterwards; grams are
    # array_distinct'd upstream, so the match count IS |A∩B|. Pairs with
    # an empty intersection never appear, which is identical output for
    # any threshold > 0 (their jaccard is 0).
    assert threshold > 0, "inverted-index gt arm requires threshold > 0"
    g_ex = g.select(
        "id", F.size("grams").alias("sz"), F.explode("grams").alias("gram")
    )
    p_ex = probes.select(
        F.col("id").alias("pid"),
        F.size("grams").alias("psz"),
        F.explode("grams").alias("gram"),
    )
    inter = (
        g_ex.join(F.broadcast(p_ex), "gram")
        .filter(F.col("id") != F.col("pid"))
        .groupBy("pid", "id")
        .agg(
            F.count(F.lit(1)).alias("i"),
            F.min("sz").alias("sz"),
            F.min("psz").alias("psz"),
        )
    )
    # same arithmetic as round(jaccard(...), 4): |A∪B| = sz + psz - i,
    # always > 0 here (every doc has >= 1 gram)
    gt = (
        inter.filter(
            F.round(
                F.col("i").cast("double")
                / (F.col("sz") + F.col("psz") - F.col("i")).cast("double"),
                4,
            )
            >= threshold
        )
        .select("pid", "id", F.lit(1).alias("is_true"))
    )
    p_bands = bands.join(
        F.broadcast(probes.select(F.col("id").alias("pid"))),
        bands["id"] == F.col("pid"),
    ).select("pid", "band_id", "band_val")
    cand = (
        bands.join(F.broadcast(p_bands), ["band_id", "band_val"])
        .filter(F.col("id") != F.col("pid"))
        .select("pid", "id")
        .distinct()
        .select("pid", "id", F.lit(1).alias("is_cand"))
    )
    both = gt.join(cand, ["pid", "id"], "full_outer").select(
        "pid",
        F.coalesce("is_true", F.lit(0)).alias("is_true"),
        F.coalesce("is_cand", F.lit(0)).alias("is_cand"),
    )
    agg = both.groupBy("pid").agg(
        F.sum("is_true").alias("n_true"),
        F.sum("is_cand").alias("n_cand"),
        F.sum(F.col("is_true") * F.col("is_cand")).alias("n_hit"),
    )
    # every probe emits a row — a probe with neither truth nor
    # candidates is the (correct) "nothing to find, nothing proposed"
    # outcome, not a missing observation
    stats = (
        probes.select(F.col("id").alias("pid"))
        # agg is keyed by pid ⊆ probes: <= n_probes rows by construction,
        # broadcast kills the SortMergeJoin's two sort+exchange pairs
        .join(F.broadcast(agg), "pid", "left")
        .select(
            F.col("pid").alias("probe_id"),
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        )
    )
    return stats.select(
        "probe_id",
        "n_true",
        "n_cand",
        "n_hit",
        F.round(
            F.when(F.col("n_true") > 0, F.col("n_hit") / F.col("n_true")), 4
        ).alias("recall"),
        F.round(
            F.when(F.col("n_cand") > 0, F.col("n_hit") / F.col("n_cand")), 4
        ).alias("precision"),
    ).orderBy("probe_id")


def _lsh_recall_oracle(
    n_hashes: int = 4,
    n_bands: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.3,
    n_probes: int = 32,
    seed: int = 42,
) -> str:
    p = _MERSENNE_31
    mins = ", ".join(
        f"CAST(list_min(list_transform(hs, x -> ({a} * x + {b}) % {p})) AS VARCHAR)"
        f" AS s{i}"
        for i, (a, b) in enumerate(_hash_params(n_hashes, seed))
    )
    rows_per_band = n_hashes // n_bands
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        + " || '_' || ".join(f"s{b * rows_per_band + r}" for r in range(rows_per_band))
        + " AS band_val FROM s"
        for b in range(n_bands)
    )
    n1 = shingle_n - 1
    return (
        "WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks "
        "  FROM documents), "
        "g AS (SELECT doc_id, list_distinct(list_transform("
        f"    generate_series(1, len(toks) - {n1}), "
        f"    i -> array_to_string(toks[i:i+{n1}], ' '))) AS grams "
        f"  FROM t WHERE len(toks) >= {shingle_n}), "
        "ge AS (SELECT doc_id, grams FROM g WHERE len(grams) > 0), "
        "h AS (SELECT doc_id, grams, list_transform(grams, "
        f"  s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {p}) AS hs "
        "  FROM ge), "
        f"s AS (SELECT doc_id, {mins} FROM h), "
        f"bands AS ({band_rows}), "
        f"probes AS (SELECT doc_id AS pid FROM ge ORDER BY doc_id LIMIT {n_probes}), "
        "gt AS (SELECT pid, g2.doc_id AS id FROM ge g2 CROSS JOIN probes "
        "  JOIN ge gp ON gp.doc_id = pid "
        "  WHERE g2.doc_id <> pid AND "
        "  round(len(list_intersect(g2.grams, gp.grams)) / "
        "  CAST(len(g2.grams) + len(gp.grams) "
        f"  - len(list_intersect(g2.grams, gp.grams)) AS DOUBLE), 4) >= {threshold}), "
        "pb AS (SELECT pid, band_id, band_val FROM bands JOIN probes "
        "  ON bands.doc_id = pid), "
        "cand AS (SELECT DISTINCT pid, bands.doc_id AS id FROM bands "
        "  JOIN pb USING (band_id, band_val) WHERE bands.doc_id <> pid), "
        "u AS (SELECT coalesce(gt.pid, cand.pid) AS pid, "
        "  CASE WHEN gt.pid IS NULL THEN 0 ELSE 1 END AS is_true, "
        "  CASE WHEN cand.pid IS NULL THEN 0 ELSE 1 END AS is_cand "
        "  FROM gt FULL OUTER JOIN cand ON gt.pid = cand.pid AND gt.id = cand.id), "
        "a AS (SELECT pid, sum(is_true) AS st, sum(is_cand) AS sc, "
        "  sum(is_true * is_cand) AS sh FROM u GROUP BY pid) "
        "SELECT probes.pid AS probe_id, "
        "CAST(coalesce(st, 0) AS BIGINT) AS n_true, "
        "CAST(coalesce(sc, 0) AS BIGINT) AS n_cand, "
        "CAST(coalesce(sh, 0) AS BIGINT) AS n_hit, "
        "round(CASE WHEN coalesce(st, 0) > 0 "
        "THEN sh / CAST(st AS DOUBLE) END, 4) AS recall, "
        "round(CASE WHEN coalesce(sc, 0) > 0 "
        "THEN sh / CAST(sc AS DOUBLE) END, 4) AS precision "
        "FROM probes LEFT JOIN a ON probes.pid = a.pid ORDER BY probe_id"
    )


@query(
    "q_dedup_eval",
    oracle=_lsh_recall_oracle(),
    doc=(
        "LSH banding recall/precision eval (the q_ann_recall pattern "
        "for dedup): per-probe exact gram-Jaccard ground truth vs the "
        "2-band md5-family MinHash candidate generator — both arms "
        "broadcast the construction-bounded probe set, nothing "
        "pair-scale shuffles; the quantifying answer to 'is the banding "
        "scheme catching the duplication that exists?'"
    ),
    tags=("dedup", "stats", "pipeline"),
)
def q_dedup_eval(spark, sf_dir):
    return lsh_recall_eval(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Normalization dedup — the canonicalize-then-hash face of exact dedup:
# case, punctuation, and whitespace variants of the same content (the
# most common near-dup class in scraped corpora) collapse to one
# canonical form before the hash. Sits between q_dedup_exact (byte
# identity) and the fuzzy families (MinHash/SimHash) in aggressiveness.
# ---------------------------------------------------------------------------


def normalized_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Clusters of documents identical after canonicalization:
    (norm_hash, n_docs, keep_id) for clusters with n_docs >= 2, keeping
    the smallest id as the canonical representative.

    Normalization = lowercase, strip every non-alphanumeric/space
    character, collapse whitespace runs, trim — each step a shared-
    dialect regex (the q_pii_redact precedent) so the SQL oracle
    replicates byte-for-byte. Scale design: normalization is map-only
    Catalyst; documents reduce to a 16-byte md5 key before the single
    count/min aggregate (the q_dedup_soft key discipline — the exchange
    never carries text).
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    keyed = df.select(F.col(id_col).alias("id"), F.md5(norm).alias("norm_hash"))
    return (
        keyed.groupBy("norm_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keep_id"))
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "q_dedup_normalized",
    # the fixture corpus has no pure formatting variants (its near-dups
    # are word-level mutations), so the declared query runs the operator
    # over a deterministic re-ingest batch: every 10th document arrives
    # again UPPERCASED with trailing punctuation and doubled spacing —
    # the re-crawl/formatting-variant class this operator exists for
    # (the derived-input precedent: the q_pagerank/q_triangle_count doc
    # graphs). Each variant must collapse onto its original.
    oracle=(
        "WITH aug AS (SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 10000000, "
        "upper(regexp_replace(text, ' ', '  ', 'g')) || ' !!' "
        "FROM documents WHERE doc_id % 10 = 0), "
        "k AS (SELECT doc_id, md5(trim(regexp_replace("
        "regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), "
        "' +', ' ', 'g'))) AS norm_hash FROM aug) "
        "SELECT norm_hash, count(*) AS n_docs, min(doc_id) AS keep_id "
        "FROM k GROUP BY norm_hash HAVING count(*) >= 2"
    ),
    doc=(
        "Normalization dedup over a formatting-variant re-ingest batch: "
        "lowercase / strip punctuation / collapse whitespace via "
        "shared-dialect regexes, md5 the canonical form map-side, ONE "
        "16-byte-key count aggregate — collapses the case/punct/"
        "whitespace variant class exact dedup misses."
    ),
    tags=("dedup", "pipeline"),
)
def q_dedup_normalized(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    variants = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.upper(F.regexp_replace(F.col("text"), " ", "  ")), F.lit(" !!")
        ).alias("text"),
    )
    aug = d.select("doc_id", "text").unionByName(variants)
    return normalized_dedup(aug)


# ---------------------------------------------------------------------------
# Record linkage / entity resolution — fuzzy matching of STRUCTURED
# records (the row-level sibling of the document dedup families):
# candidate duplicate part listings found by attribute blocking plus
# edit-distance name matching, the classic Fellegi-Sunter blocking
# shape every catalog/CRM dedup runs.
# ---------------------------------------------------------------------------


def record_linkage(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    num_col: str,
    max_lev: int = 4,
    num_slack: int = 1,
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` candidate duplicate record pairs: (key_a, key_b,
    name_a, name_b, lev) where both records share ``block_col``, their
    ``num_col`` differ by at most ``num_slack``, and the name edit
    distance is <= ``max_lev``; ranked best-match-first.

    Scale design — neighborhood blocking, not a blocked cross join: one
    side is replicated under its 2*num_slack+1 neighboring numeric keys
    (a bounded constant), and the join is pure EQUALITY on
    (block, numeric key), so it hash-partitions; each true pair meets
    on exactly one key (the left record's own value) — no dedup pass
    needed. The quadratic term is bounded per (block, value) cell, the
    same discipline as the gram-anchor/LSH-band blocking in the
    document families. The edit distance runs post-join on candidate
    rows only (JVM levenshtein, no UDF).
    """
    a = df.select(
        F.col(id_col).alias("key_a"),
        F.col(name_col).alias("name_a"),
        F.col(block_col).alias("blk"),
        F.col(num_col).alias("k"),
    )
    b = df.select(
        F.col(id_col).alias("key_b"),
        F.col(name_col).alias("name_b"),
        F.col(block_col).alias("blk"),
        F.explode(
            F.array(
                *[F.col(num_col) + d for d in range(-num_slack, num_slack + 1)]
            )
        ).alias("k"),
    )
    pairs = (
        a.hint("shuffle_hash")
        .join(b.hint("shuffle_hash"), ["blk", "k"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("lev"),
        )
        .filter(F.col("lev") <= max_lev)
    )
    return pairs.orderBy("lev", "key_a", "key_b").limit(top_k)


@query(
    "q_record_linkage",
    oracle=(
        "SELECT a.p_partkey AS key_a, b.p_partkey AS key_b, "
        "a.p_name AS name_a, b.p_name AS name_b, "
        "CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev "
        "FROM part a JOIN part b ON a.p_type = b.p_type "
        "AND a.p_partkey < b.p_partkey "
        "AND abs(a.p_size - b.p_size) <= 1 "
        "AND levenshtein(a.p_name, b.p_name) <= 4 "
        "ORDER BY lev, key_a, key_b LIMIT 50"
    ),
    doc=(
        "Record linkage over the part catalog: (type, size+-1) "
        "neighborhood blocking — the slack side replicated under its 3 "
        "neighboring size keys so the join stays pure equality and "
        "hash-partitions — then JVM levenshtein <= 4 on candidates "
        "only; top-50 best-match pairs. The structured-record sibling "
        "of the document dedup families."
    ),
    tags=("dedup", "join", "pipeline"),
)
def q_record_linkage(spark, sf_dir):
    return record_linkage(
        T(spark, sf_dir, "part"), "p_partkey", "p_name", "p_type", "p_size"
    )


# ---------------------------------------------------------------------------
# Cross-split leakage detection — the INTERNAL twin of benchmark
# decontamination (q_contamination screens against an external
# registry): near-duplicate pairs that straddle the train/valid/test
# boundary leak training signal into evaluation even when every split
# was hash-clean at the row level. Run after splitting, before
# publishing an eval number.
# ---------------------------------------------------------------------------


def split_leakage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(split_a, split_b, n_pairs, n_docs_affected) for every split
    pair with at least one near-duplicate crossing it (signature-equal
    under the md5 MinHash family — the value-checkable anchor of the
    production banded path).

    Scale design: identical to the minhash signature pipeline (gram
    hashing map-side, one doc-keyed aggregate carrying n_hashes partial
    mins), then the pair join runs ON THE SIGNATURE KEY — only
    signature-collision groups ever pair, the same blocking bound as
    q_dedup_minhash_verified — with the split labels (a pure-map md5
    bucket, zero extra passes) riding the signature rows. The output
    aggregate is bounded by C(splits, 2).
    """
    from libcolumnfile_spark.operators.pipeline import split_assign

    params = _hash_params(n_hashes, seed)
    spread = _spread(df).filter(
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")) >= shingle_n
    )
    toks = spread.select(
        F.col(id_col).alias("id"),
        split_assign(F.col(id_col)).alias("split"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    )
    g = toks.select(
        "id", "split", shingles_from_tokens(F.col("toks"), shingle_n).alias("grams")
    ).filter(F.size("grams") > 0)
    h = g.select("id", "split", F.explode("grams").alias("gram")).select(
        "id", "split", md5_gram_hash(F.col("gram")).alias("h")
    )
    # split rides the aggregate key (it is a pure function of id), so
    # the signature table never needs a second doc-keyed join to
    # re-attach it — one less corpus-sized exchange
    sig = h.groupBy("id", "split").agg(
        *[
            F.min(F.pmod(F.col("h") * F.lit(pa) + F.lit(pb), F.lit(_MERSENNE_31)))
            .cast("string")
            .alias(f"_s{i}")
            for i, (pa, pb) in enumerate(params)
        ]
    )
    keyed = sig.select(
        "id",
        "split",
        F.concat_ws(",", *[f"_s{i}" for i in range(n_hashes)]).alias("sig_key"),
    )
    x, y = keyed.alias("x"), keyed.alias("y").hint("shuffle_hash")
    cross = (
        x.join(
            y,
            (F.col("x.sig_key") == F.col("y.sig_key"))
            & (F.col("x.id") < F.col("y.id"))
            & (F.col("x.split") != F.col("y.split")),
        )
        .select(
            F.least("x.split", "y.split").alias("split_a"),
            F.greatest("x.split", "y.split").alias("split_b"),
            F.col("x.id").alias("ida"),
            F.col("y.id").alias("idb"),
        )
    )
    return cross.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.size(
            F.array_distinct(
                F.flatten(F.collect_list(F.array("ida", "idb")))
            )
        ).alias("n_docs_affected"),
    )


def _split_leakage_oracle(
    n_hashes: int = 4, shingle_n: int = 3, seed: int = 42
) -> str:
    from libcolumnfile_spark.operators.pipeline import _bucket_sql

    p = _MERSENNE_31
    sig_key = " || ',' || ".join(
        f"CAST(list_min(list_transform(hs, x -> ({a} * x + {b}) % {p})) AS VARCHAR)"
        for a, b in _hash_params(n_hashes, seed)
    )
    bucket = _bucket_sql("doc_id")
    n1 = shingle_n - 1
    return (
        "WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks "
        "  FROM documents), "
        "g AS (SELECT doc_id, list_distinct(list_transform("
        f"    generate_series(1, len(toks) - {n1}), "
        f"    i -> array_to_string(toks[i:i+{n1}], ' '))) AS grams "
        f"  FROM t WHERE len(toks) >= {shingle_n}), "
        "h AS (SELECT doc_id, list_transform(grams, "
        f"  s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {p}) AS hs "
        "  FROM g WHERE len(grams) > 0), "
        f"s AS (SELECT doc_id, {sig_key} AS sig_key, "
        f"  CASE WHEN {bucket} < 80 THEN 'train' "
        f"  WHEN {bucket} < 90 THEN 'valid' ELSE 'test' END AS split FROM h), "
        "c AS (SELECT least(a.split, b.split) AS split_a, "
        "  greatest(a.split, b.split) AS split_b, a.doc_id AS ida, b.doc_id AS idb "
        "  FROM s a JOIN s b ON a.sig_key = b.sig_key AND a.doc_id < b.doc_id "
        "  AND a.split <> b.split) "
        "SELECT split_a, split_b, count(*) AS n_pairs, "
        "CAST(len(list_distinct(flatten(list(main.list_value(ida, idb))))) AS INT) "
        "AS n_docs_affected "
        "FROM c GROUP BY split_a, split_b"
    )


@query(
    "q_split_leakage",
    oracle=_split_leakage_oracle(),
    doc=(
        "Cross-split near-duplicate leakage audit: md5-family MinHash "
        "signatures with hash-bucket split labels riding the signature "
        "rows; the pair join is blocked on the signature key (only "
        "collision groups pair) and filtered to boundary-crossing "
        "pairs; output bounded by C(splits,2) — the internal twin of "
        "benchmark decontamination."
    ),
    tags=("dedup", "pipeline", "stats"),
)
def q_split_leakage(spark, sf_dir):
    return split_leakage(T(spark, sf_dir, "documents"))
