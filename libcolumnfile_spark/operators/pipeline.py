"""Training-data pipeline operators: deterministic sampling / dataset
splits, PII redaction, vocabulary extraction, and connected-components
clustering of near-duplicate pairs.

These are the corpus-management steps between the raw scans and the
dedup/similarity operators (operators/dedup.py, operators/similarity.py):
carve reproducible train/valid/test shards, scrub text, build token
vocabularies, and collapse pairwise near-duplicate evidence into
transitive clusters so one representative per cluster survives.

Reference parity note: libcolumnfile itself has none of these (no
sampling, no text functions, no graph step anywhere in
`/root/reference/src` or `/root/reference/tools`); they are north-star
extensions in the spirit of SURVEY.md §2.2's LLM-pipeline row. Every
operator here is a full DuckDB-oracle query (including the iterative
connected-components, whose oracle is a recursive CTE).

Scale notes are on each function; the common theme: everything is either
a pure map (sampling, redaction — no shuffle at all) or shuffles keys
/ compact edges, never document bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from libcolumnfile_spark.queries import T, pin, query
from libcolumnfile_spark.tables import maybe_broadcast as _mb
from libcolumnfile_spark.tables import spread as _spread

# ---------------------------------------------------------------------------
# Deterministic hash bucketing (sampling + dataset splits)
# ---------------------------------------------------------------------------


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets) from the md5 of the key's string form.

    Engine-portable by construction (md5 is bit-identical everywhere, so
    the same row lands in the same bucket in Spark, DuckDB, or any other
    tool touching the corpus) — unlike ``F.hash``/``rand(seed)``, which
    are engine- or partitioning-dependent. A pure map expression: sampling
    100 TB this way is a scan with zero shuffle, and the sample is
    reproducible row-by-row forever (the property training-data freezes
    require).
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % n_buckets
    )


def _bucket_sql(key_sql: str, n_buckets: int = 100) -> str:
    """DuckDB equivalent of hash_bucket (same md5 prefix, same modulus)."""
    return f"('0x' || substring(md5(CAST({key_sql} AS VARCHAR)), 1, 8))::BIGINT % {n_buckets}"


def split_assign(key: Column, train: int = 80, valid: int = 10) -> Column:
    """train/valid/test label from hash_bucket percentages (train+valid
    buckets out of 100; the rest is test)."""
    b = hash_bucket(key, 100)
    return (
        F.when(b < train, F.lit("train"))
        .when(b < train + valid, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


@query(
    "q_sample_hash",
    oracle=(
        "SELECT doc_id, lang FROM documents "
        f"WHERE {_bucket_sql('doc_id')} < 10"
    ),
    doc=(
        "Deterministic 10% corpus sample via md5 hash-bucketing — "
        "reproducible across engines and runs, zero shuffle (pure map)."
    ),
    tags=("pipeline", "sampling"),
)
def q_sample_hash(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.filter(hash_bucket(F.col("doc_id")) < 10).select("doc_id", "lang")


@query(
    "q_split_assign",
    oracle=(
        "SELECT CASE "
        f"WHEN {_bucket_sql('doc_id')} < 80 THEN 'train' "
        f"WHEN {_bucket_sql('doc_id')} < 90 THEN 'valid' "
        "ELSE 'test' END AS split, "
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars "
        "FROM documents GROUP BY 1"
    ),
    doc=(
        "Deterministic 80/10/10 train/valid/test split from the same "
        "hash-bucketing; per-split doc and char counts."
    ),
    tags=("pipeline", "sampling"),
)
def q_split_assign(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return (
        d.select(split_assign(F.col("doc_id")).alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars"))
    )


# ---------------------------------------------------------------------------
# Sequence packing (token-budget bin assignment for training batches)
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_groups: int = 64,
) -> DataFrame:
    """Assign documents to fixed token-budget training sequences
    (contiguous-fill packing): docs are hash-bucketed into ``n_groups``
    independent groups, and within each group (ordered by id) a doc
    joins the pack its cumulative token offset falls in —
    pack_id = floor((cumsum(tokens) - tokens) / budget).

    Scale design: packing is inherently sequential, so the sequential
    unit is the GROUP, not the corpus — groups pack independently and in
    parallel (one hash-partition shuffle + a per-group window cumsum;
    no global sort, no driver loop). ``n_groups`` is the parallelism
    knob: size it to ~shuffle-partition count at the target scale.
    Deterministic end-to-end (md5 bucketing + id order), so the same
    corpus always packs identically — the reproducibility property
    training-data freezes require. Docs longer than the budget start
    their own pack and overflow it (split oversized docs upstream).
    """
    from pyspark.sql import Window

    toks = F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    t = df.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(F.col(id_col), n_groups).alias("grp"),
        # bigint: F.size is int32, but the oracle's len() is BIGINT and
        # the driver hash is dtype-sensitive (int32 5 != int64 5)
        toks.cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "grp",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(float(budget))).alias("pack_id"),
    )


def _pack_oracle(budget: int = 512, n_groups: int = 64) -> str:
    return (
        "WITH t AS (SELECT doc_id, "
        f"{_bucket_sql('doc_id', n_groups)} AS grp, "
        "len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens "
        "FROM documents) "
        "SELECT doc_id, grp, n_tokens, "
        "CAST(floor((sum(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id "
        f"ROWS UNBOUNDED PRECEDING) - n_tokens) / {budget}.0) AS BIGINT) AS pack_id "
        "FROM t"
    )


@query(
    "q_pack_sequences",
    oracle=_pack_oracle(),
    doc=(
        "Token-budget sequence packing: hash-grouped contiguous fill — "
        "deterministic pack assignment for fixed-length training "
        "batches, parallel across groups (window cumsum per group)."
    ),
    tags=("pipeline", "packing"),
)
def q_pack_sequences(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return pack_sequences(d, budget=512, n_groups=64)


# ---------------------------------------------------------------------------
# Benchmark-contamination screening
# ---------------------------------------------------------------------------


def contamination_screen(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document n-gram overlap against a benchmark/eval set — the
    decontamination step of a training-data pipeline (drop or flag
    training docs that leak eval content).

    Output: (doc_id, n_grams, n_matched, contamination) for documents
    with at least one overlapping gram.

    Scale design: the benchmark gram set is DISTINCT + broadcast
    (benchmarks are tiny next to a 100 TB corpus), so corpus grams are
    matched map-side; the only shuffle carries (doc_id) partial counts
    for MATCHED grams — a corpus with little contamination shuffles
    almost nothing. Gram hashing uses the md5-derived cross-engine
    family (md5_gram_hash), so the whole screen is oracle-checkable.
    """
    from libcolumnfile_spark.operators.dedup import gram_rows, md5_gram_hash

    # Whole-stage-codegen gram rows (gram_rows: posexplode + window lead
    # — measured 3.7x over exploding HOF-built gram arrays), hashed as a
    # plain projection, then ONE left-broadcast-join + groupBy computes
    # total and matched gram counts in a single corpus pass.
    bench = (
        gram_rows(benchmark, text_col, id_col, shingle_n)
        .select(md5_gram_hash(F.col("g")).alias("h"))
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    hashed = gram_rows(_spread(df), text_col, id_col, shingle_n).select(
        F.col("id").alias("doc_id"), md5_gram_hash(F.col("g")).alias("h")
    )
    return (
        hashed.join(F.broadcast(bench), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_m").alias("n_matched"),
        )
        .filter(F.col("n_matched") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_matched",
            F.round(F.col("n_matched") / F.col("n_grams"), 6).alias("contamination"),
        )
    )


def _contamination_oracle(shingle_n: int = 3, modulus: int = 97) -> str:
    p = (1 << 31) - 1
    n1 = shingle_n - 1
    # dedup gram STRINGS before hashing (mirrors gram_rows' dropDuplicates
    # on the string form) — list_distinct over the HASHES would silently
    # collapse any within-doc 31-bit collision between distinct grams and
    # diverge the per-doc counts from the Spark side
    gram_strs = (
        "list_distinct(list_transform(generate_series(1, len(toks) - "
        f"{n1}), i -> array_to_string(toks[i:i+{n1}], ' ')))"
    )
    grams = (
        f"list_transform({gram_strs}, s -> "
        f"CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {p})"
    )
    return (
        "WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks "
        "FROM documents), "
        f"g AS (SELECT doc_id, {grams} AS hs FROM t WHERE len(toks) >= {shingle_n}), "
        f"b AS (SELECT DISTINCT unnest(hs) AS h FROM g WHERE doc_id % {modulus} = 0), "
        "e AS (SELECT doc_id, unnest(hs) AS h FROM g), "
        "tot AS (SELECT doc_id, len(hs) AS n_grams FROM g), "
        "m AS (SELECT e.doc_id, count(*) AS n_matched FROM e JOIN b ON e.h = b.h "
        "GROUP BY e.doc_id) "
        "SELECT tot.doc_id, n_grams, n_matched, "
        "round(CAST(n_matched AS DOUBLE) / n_grams, 6) AS contamination "
        "FROM tot JOIN m ON tot.doc_id = m.doc_id"
    )


@query(
    "q_contamination",
    oracle=_contamination_oracle(),
    doc=(
        "Benchmark-contamination screen: per-doc 3-gram overlap against "
        "a (deterministic pseudo-)benchmark subset — broadcast benchmark "
        "gram set, map-side matching, matched-grams-only shuffle."
    ),
    tags=("pipeline", "dedup"),
)
def q_contamination(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return contamination_screen(d, bench)


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination (the benchmark set too big to ship
# as a plain gram list)
# ---------------------------------------------------------------------------

_BLOOM_WORD_BITS = 63  # usable bits per BIGINT word: keeping the sign
#                        bit clear makes >> arithmetic-shift-safe and
#                        value-identical in Spark and DuckDB
_BLOOM_WORDS = 1024  # m = 64512 bits; at the fixture's ~5k benchmark
#                      gram inserts with k=2 the false-positive rate is
#                      ~2% — the production knob is m, not the plan
_BLOOM_PROBES = 2
_BLOOM_SEED = 7


def contamination_bloom_screen(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    n_words: int = _BLOOM_WORDS,
    n_probes: int = _BLOOM_PROBES,
    seed: int = _BLOOM_SEED,
) -> DataFrame:
    """Decontamination with a Bloom-bitset prefilter: benchmark grams are
    folded into an m-bit Bloom filter (k universal-hash probes over the
    md5 gram hash), corpus grams are tested against the bitset map-side,
    and only Bloom CANDIDATES reach the exact verify join. No false
    negatives by construction (every true match passes the Bloom), so
    n_matched is identical to contamination_screen's.

    Why this exists next to contamination_screen: the plain screen
    broadcasts the benchmark's distinct gram set — fine for one eval
    suite, but a consolidated held-out registry (every benchmark + all
    its paraphrases) can reach 10^8-10^9 grams, past broadcast budgets.
    The Bloom compresses membership to m bits CHOSEN AT BUILD TIME
    (n_words * 63 bits regardless of gram count), so the prefilter stays
    a constant-size structure; the expensive exact join then processes
    only the ~fp-rate fraction of a 100 TB corpus' grams, small enough
    to shuffle even when the benchmark side cannot broadcast.

    Plan shape: the bitset is a ``groupBy(word) -> bit_or(mask)``
    aggregate of at most ``n_words`` rows; each corpus gram joins that
    table k times BROADCAST (the bitset table is bounded by n_words,
    not by benchmark size) and tests its bit with shiftright/&. The
    per-doc gram/candidate counts aggregate straight off that map-side
    pass; ONLY the ~fp-fraction candidate gram rows then reach the
    exact verify join, which is hinted shuffle_hash on the gram hash —
    the bench gram set is the construction-UNBOUNDED side this operator
    exists for (10^8-10^9 grams), so it must never broadcast (repo
    policy since the containment AQE-broadcast OOM, da9de06). The
    matched counts rejoin the per-doc counts on doc_id (both sides
    O(docs), also shuffle_hash).

    Output: (doc_id, n_grams, n_candidates, n_matched, contamination)
    for docs with at least one Bloom candidate — n_candidates >
    n_matched rows quantify the false-positive cost actually paid.
    """
    from libcolumnfile_spark.operators.dedup import (
        _MERSENNE_31,
        _hash_params,
        gram_rows,
        md5_gram_hash,
    )

    w_bits = _BLOOM_WORD_BITS
    m = n_words * w_bits
    params = _hash_params(n_probes, seed)

    def probe_pos(h: Column, ab: tuple[int, int]) -> Column:
        a, b = ab
        return F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE_31)) % F.lit(m)

    # bench feeds TWO consumers (the bitset build and the exact verify
    # join); without a persist the benchmark scan + window-gram pipeline
    # + distinct re-executes per consumer. persist() is MEMORY_AND_DISK:
    # at registry scale (10^8-10^9 grams, the size this operator exists
    # for) the compact int64 hashes spill to disk rather than OOM, and
    # one materialization still beats two full re-derivations.
    bench = pin(
        gram_rows(benchmark, text_col, id_col, shingle_n)
        .select(md5_gram_hash(F.col("g")).alias("h"))
        .distinct()
    )
    # m-bit bitset as <= n_words (word, bits) rows: explode the k set
    # positions per gram, OR the per-position masks. Bounded output no
    # matter how many grams the benchmark registry holds.
    words = (
        bench.select(
            F.explode(F.array(*[probe_pos(F.col("h"), ab) for ab in params])).alias(
                "pos"
            )
        )
        .select(
            (F.col("pos") / w_bits).cast("long").alias("word"),
            (F.col("pos") % w_bits).cast("int").alias("bit"),
        )
        .selectExpr("word", "shiftleft(CAST(1 AS BIGINT), bit) AS mask")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )

    hashed = gram_rows(_spread(df), text_col, id_col, shingle_n).select(
        F.col("id").alias("doc_id"), md5_gram_hash(F.col("g")).alias("h")
    )
    probed = hashed
    for j, ab in enumerate(params):
        pos = probe_pos(F.col("h"), ab)
        probed = probed.withColumn(
            f"w{j}", (pos / w_bits).cast("long")
        ).withColumn(f"t{j}", (pos % w_bits).cast("int"))
        wj = words.select(
            F.col("word").alias(f"word{j}"), F.col("bits").alias(f"bits{j}")
        )
        # LEFT join so non-candidate grams still count toward n_grams;
        # a missing word row means the bit is unset -> not a candidate
        probed = probed.join(
            F.broadcast(wj), F.col(f"w{j}") == F.col(f"word{j}"), "left"
        )
    is_cand = None
    for j in range(n_probes):
        hit = F.expr(f"(shiftright(bits{j}, t{j}) & 1) = 1")
        is_cand = hit if is_cand is None else (is_cand & hit)
    flagged = probed.withColumn("_cand", F.coalesce(is_cand, F.lit(False)))
    # ONE corpus gram pass: the per-doc counts aggregate ALSO carries the
    # candidate hashes (collect_list skips the nulls of non-candidates),
    # so the verify arm replays from the doc-bounded aggregate instead of
    # re-running the full tokenize+md5+k-probe map pipeline a second time
    # (the old two-consumer shape executed that corpus-scale map twice).
    # Shuffle bytes are unchanged: the candidate hashes crossed the wire
    # anyway as the verify arm's (doc_id, h) rows; now they ride the
    # counts exchange with map-side partial collect_list. Per-doc array
    # size is n_candidates (the fp-fraction by design), bounded by the
    # doc's gram count.
    counts = pin(
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("_cand")).alias("n_candidates"),
            F.collect_list(F.when(F.col("_cand"), F.col("h"))).alias("_cand_hs"),
        )
        .filter(F.col("n_candidates") > 0)
    )
    # exact verify on Bloom CANDIDATES only: the unbounded bench gram
    # set shuffles against the fp-fraction candidate stream, never
    # broadcasts (see docstring)
    matched = (
        counts.select("doc_id", F.explode("_cand_hs").alias("h"))
        .join(bench.hint("shuffle_hash"), "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        counts.drop("_cand_hs")
        .join(matched.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            "n_candidates",
            F.coalesce(F.col("n_matched"), F.lit(0).cast("bigint")).alias(
                "n_matched"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_candidates",
            "n_matched",
            F.round(F.col("n_matched") / F.col("n_grams"), 6).alias("contamination"),
        )
    )


def _contamination_bloom_oracle(
    shingle_n: int = 3,
    modulus: int = 97,
    n_words: int = _BLOOM_WORDS,
    n_probes: int = _BLOOM_PROBES,
    seed: int = _BLOOM_SEED,
) -> str:
    from libcolumnfile_spark.operators.dedup import _MERSENNE_31, _hash_params

    p = _MERSENNE_31
    w_bits = _BLOOM_WORD_BITS
    m = n_words * w_bits
    params = _hash_params(n_probes, seed)
    n1 = shingle_n - 1
    # dedup gram STRINGS before hashing (mirrors gram_rows' dropDuplicates
    # on the string form) — list_distinct over the HASHES would silently
    # collapse any within-doc 31-bit collision between distinct grams and
    # diverge the per-doc counts from the Spark side
    gram_strs = (
        "list_distinct(list_transform(generate_series(1, len(toks) - "
        f"{n1}), i -> array_to_string(toks[i:i+{n1}], ' ')))"
    )
    grams = (
        f"list_transform({gram_strs}, s -> "
        f"CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {p})"
    )
    pos = [f"(({a} * h + {b}) % {p}) % {m}" for a, b in params]
    set_union = " UNION ALL ".join(f"SELECT {pj} AS pos FROM b" for pj in pos)
    cand_conds = " AND ".join(
        f"((w{j}.bits >> CAST(p{j} % {w_bits} AS INT)) & 1) = 1"
        for j in range(n_probes)
    )
    cand_joins = " ".join(
        f"JOIN words w{j} ON w{j}.word = p{j} // {w_bits}" for j in range(n_probes)
    )
    probe_cols = ", ".join(f"{pj} AS p{j}" for j, pj in enumerate(pos))
    return (
        "WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks "
        "FROM documents), "
        f"g AS (SELECT doc_id, {grams} AS hs FROM t WHERE len(toks) >= {shingle_n}), "
        f"b AS (SELECT DISTINCT unnest(hs) AS h FROM g WHERE doc_id % {modulus} = 0), "
        f"setbits AS ({set_union}), "
        f"words AS (SELECT pos // {w_bits} AS word, "
        f"bit_or(CAST(1 AS BIGINT) << CAST(pos % {w_bits} AS INT)) AS bits "
        "FROM setbits GROUP BY 1), "
        "e AS (SELECT doc_id, unnest(hs) AS h FROM g), "
        f"probe AS (SELECT doc_id, h, {probe_cols} FROM e), "
        f"cand AS (SELECT doc_id, h FROM probe {cand_joins} WHERE {cand_conds}), "
        "tot AS (SELECT doc_id, len(hs) AS n_grams FROM g), "
        "c AS (SELECT cand.doc_id, count(*) AS n_candidates, count(b.h) AS n_matched "
        "FROM cand LEFT JOIN b ON cand.h = b.h GROUP BY cand.doc_id) "
        "SELECT tot.doc_id, n_grams, n_candidates, n_matched, "
        "round(CAST(n_matched AS DOUBLE) / n_grams, 6) AS contamination "
        "FROM tot JOIN c ON tot.doc_id = c.doc_id"
    )


@query(
    "q_contamination_bloom",
    oracle=_contamination_bloom_oracle(),
    doc=(
        "Bloom-prefiltered decontamination: benchmark grams folded into "
        "a constant-size bit set (bit_or aggregate, <=1024 rows), corpus "
        "grams tested map-side via k broadcast bitset joins, exact "
        "verify only on Bloom candidates — the benchmark-too-big-to-"
        "broadcast variant of q_contamination, no false negatives."
    ),
    tags=("pipeline", "dedup"),
)
def q_contamination_bloom(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return contamination_bloom_screen(d, bench)


def _uniform01(key: Column) -> Column:
    """Deterministic uniform in (0,1) from the md5 of the key's string
    form: the first 48 md5 bits (exact in a double) shifted into the
    open interval. Engine-portable like hash_bucket — the same row draws
    the same uniform in Spark, DuckDB, or any md5-bearing tool."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 12), 16, 10).cast("long")
    return (h.cast("double") + F.lit(1.0)) / F.lit(float((1 << 48) + 1))


def _uniform01_sql(key_sql: str) -> str:
    return (
        f"((('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 12))::BIGINT) + 1.0) "
        f"/ {float((1 << 48) + 1)!r}"
    )


def weighted_sample(
    df: DataFrame, weight: Column, id_col: Column, k: int = 100
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-Res): per row draw the md5-uniform u and keep the top-k
    by priority u^(1/w) — equivalently by ln(u)/w, computed in log space
    so no pow() rounding crosses engines. Inclusion probability is
    proportional to weight (the quality-/length-weighted subsampling
    step of corpus curation), yet the sample is reproducible row-by-row
    forever, unlike rand()-based sampling.

    Scale: a pure map expression feeding TakeOrderedAndProject —
    per-partition top-k heaps, no global sort, no shuffle of anything
    but k rows per partition. Ordering ties are broken by id; ln()
    last-ulp differences between engines cannot flip the cut because
    48-bit uniforms spread adjacent priorities ~1e-3 apart at fixture
    k, ~1e-9 even at billion-row corpora — 7+ orders above ulp noise.
    """
    key = F.log(_uniform01(id_col)) / weight
    return (
        df.filter(weight > 0)
        .orderBy(key.desc(), id_col.asc())
        .limit(k)
    )


@query(
    "q_sample_weighted",
    oracle=(
        "SELECT doc_id, n_chars FROM documents WHERE n_chars > 0 "
        f"ORDER BY ln({_uniform01_sql('doc_id')}) / n_chars DESC, doc_id "
        "LIMIT 100"
    ),
    doc=(
        "Deterministic weighted sampling without replacement "
        "(Efraimidis-Spirakis A-Res, md5 uniforms, log-space priority): "
        "inclusion probability proportional to doc length, pure map + "
        "TakeOrderedAndProject, reproducible across engines."
    ),
    tags=("pipeline", "sampling"),
)
def q_sample_weighted(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return weighted_sample(d, F.col("n_chars"), F.col("doc_id")).select(
        "doc_id", "n_chars"
    )


@query(
    "q_sample_stratified",
    oracle=(
        "SELECT c_custkey, c_mktsegment FROM customer "
        f"WHERE {_bucket_sql('c_custkey')} < "
        "CASE c_mktsegment WHEN 'BUILDING' THEN 50 "
        "WHEN 'AUTOMOBILE' THEN 20 ELSE 10 END"
    ),
    doc=(
        "Deterministic STRATIFIED sample: per-stratum rates (50% of "
        "BUILDING, 20% of AUTOMOBILE, 10% elsewhere) from the same md5 "
        "hash-bucketing as q_sample_hash — the rebalancing move when one "
        "domain/language/source dominates a training corpus. Unlike "
        "df.sampleBy (seeded pseudo-random, partitioning-dependent), this "
        "is reproducible row-by-row across engines and runs, and remains "
        "a pure map: zero shuffle at any scale."
    ),
    tags=("pipeline", "sampling"),
)
def q_sample_stratified(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    rate = (
        F.when(F.col("c_mktsegment") == "BUILDING", F.lit(50))
        .when(F.col("c_mktsegment") == "AUTOMOBILE", F.lit(20))
        .otherwise(F.lit(10))
    )
    return c.filter(hash_bucket(F.col("c_custkey")) < rate).select(
        "c_custkey", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# Per-domain frequency capping
# ---------------------------------------------------------------------------


def hash_order(key: Column) -> Column:
    """Full 32-bit md5-prefix order key (hash_bucket without the modulus):
    a deterministic, engine-portable pseudo-random total order when
    paired with an id tiebreak."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def _hash_order_sql(key_sql: str) -> str:
    """DuckDB equivalent of hash_order (same md5 prefix, no modulus)."""
    return f"('0x' || substring(md5(CAST({key_sql} AS VARCHAR)), 1, 8))::BIGINT"


def domain_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int = 10,
    salt_buckets: int = 16,
) -> DataFrame:
    """Frequency-cap a corpus per domain/source: keep at most ``cap``
    rows per domain, chosen by deterministic md5 hash order (id
    tiebreak) — the web-corpus rebalancing move when a few hosts
    dominate a crawl, with a sample that is reproducible row-by-row
    across engines and runs (unlike any rand()-based pick).

    Output keeps the within-domain rank ``rn`` (1..cap).

    Scale design: TWO-PHASE selection to dodge the hot-domain window
    funnel — a single row_number window over domain_col would funnel a
    billion-doc host through one reducer. Phase 1 ranks within
    (domain, salt) — salt is a deterministic id hash, so each hot
    domain fans out over salt_buckets reducers and at most
    salt_buckets x cap rows survive per domain; phase 2 re-ranks the
    survivors per domain. Any row in a domain's global top-cap is
    top-cap within its salt bucket, and every row ranked above it also
    survives phase 1, so phase 2 reproduces exact global ranks. The
    phase-2 window sees <= salt_buckets x cap rows per domain — driver-
    bounded work no matter how skewed the crawl."""
    from pyspark.sql import Window

    h = df.withColumn("__h", hash_order(F.col(id_col))).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    )
    # nulls-last ordering: Spark windows default NULLS FIRST for ASC,
    # DuckDB NULLS LAST — align so a null id can never shift the ranks
    order = [F.col("__h").asc_nulls_last(), F.col(id_col).asc_nulls_last()]
    w1 = Window.partitionBy(domain_col, "__salt").orderBy(*order)
    survivors = (
        h.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= cap)
        .drop("__rn1", "__salt")
    )
    w2 = Window.partitionBy(domain_col).orderBy(*order)
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= cap)
        .drop("__h")
    )


@query(
    "q_domain_cap",
    oracle=(
        "SELECT doc_id, source, CAST(rn AS INT) AS rn FROM ("
        "SELECT doc_id, source, row_number() OVER (PARTITION BY source "
        f"ORDER BY {_hash_order_sql('doc_id')}, doc_id) AS rn "
        "FROM documents) WHERE rn <= 10"
    ),
    doc=(
        "Per-domain frequency cap: at most 10 docs per source, picked by "
        "deterministic md5 hash order — two-phase salted selection so a "
        "hot domain never funnels through one reducer; ranks are exact "
        "and the oracle replicates them with a single SQL window."
    ),
    tags=("pipeline", "sampling"),
)
def q_domain_cap(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return domain_cap(d.select("doc_id", "source"), "source", "doc_id", cap=10)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Kept to syntax shared by Java regex (Spark) and RE2 (DuckDB): character
# classes, +/{n,} quantifiers — no lookaround, no backreferences.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"


def redact_pii(text: Column) -> Column:
    """Replace email addresses and international-format phone numbers with
    typed placeholder tokens. A pure map over the text column — at 100 TB
    this is a single scan stage fused into whole-stage codegen; no UDF,
    no shuffle."""
    out = F.regexp_replace(text, _EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, _PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) occurrence counts (for scrub audit reports).
    BIGINT, matching DuckDB's len() — the driver hash is dtype-sensitive."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(_EMAIL_RE), 0)).cast("bigint"),
        F.size(F.regexp_extract_all(text, F.lit(_PHONE_RE), 0)).cast("bigint"),
    )


@query(
    "q_pii_redact",
    # The fixture text is synthetic and PII-free, so both sides first graft
    # a deterministic email + phone into each doc, then redact — the oracle
    # thereby checks the regex semantics themselves, not a no-op.
    oracle=(
        "WITH dirty AS (SELECT doc_id, "
        "concat('contact ', source, '@example.com or +1-555-', "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' re: ', text) AS text "
        "FROM documents) "
        "SELECT doc_id, "
        "regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
        "'<EMAIL>', 'g'), '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}', '<PHONE>', 'g') AS clean_text, "
        "len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails, "
        "len(regexp_extract_all(text, '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}')) AS n_phones "
        "FROM dirty"
    ),
    doc=(
        "PII scrub: synthesize a deterministic email+phone per doc, then "
        "redact with shared-dialect regexes; emits scrub-audit counts."
    ),
    tags=("pipeline", "text"),
)
def q_pii_redact(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    dirty = F.concat(
        F.lit("contact "),
        F.col("source"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" re: "),
        F.col("text"),
    )
    n_emails, n_phones = pii_counts(dirty)
    return d.select(
        "doc_id",
        redact_pii(dirty).alias("clean_text"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# Vocabulary extraction
# ---------------------------------------------------------------------------


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Top-k whitespace tokens by corpus frequency (lowercased).

    explode -> partial+final hash aggregate -> TakeOrderedAndProject:
    the shuffle carries one row per DISTINCT token per mapper (map-side
    combine), not one per occurrence, and top-k never sorts globally —
    per-partition k-heaps feed a k-merge on one reducer. (cnt, token)
    ordering is a total order, so the cut at k is deterministic.
    """
    tok = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )


@query(
    "q_vocab_topk",
    oracle=(
        "SELECT token, count(*) AS cnt FROM ("
        "SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS token "
        "FROM documents) WHERE token <> '' "
        "GROUP BY token ORDER BY cnt DESC, token LIMIT 100"
    ),
    doc="Corpus vocabulary: top-100 tokens by frequency (shuffle is O(distinct tokens)).",
    tags=("pipeline", "text"),
)
def q_vocab_topk(spark, sf_dir):
    return vocab_topk(T(spark, sf_dir, "documents"), "text", 100)


def vocab_coverage(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 1000
) -> DataFrame:
    """Per-document vocabulary coverage against the corpus top-k token
    vocabulary: n_tokens, n_oov, and the OOV rate — the
    tokenizer-coverage eval of a data pipeline (how much of each
    document a fixed vocabulary can represent; high-OOV docs are
    boilerplate, foreign-language leakage, or encoding damage).

    Scale design: the vocabulary is construction-BOUNDED at k rows
    (the one case repo policy allows a broadcast), so coverage testing
    is a map-side broadcast join over the token stream — one corpus
    pass, and the only exchange carries per-doc partial counts. The
    vocab build itself is vocab_topk's O(distinct tokens) shuffle +
    TakeOrdered; (cnt, token) is a total order, so the cut at k is
    deterministic cross-engine.
    """
    vocab = vocab_topk(df, text_col, k).select("token").withColumn(
        "_v", F.lit(1)
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_if(F.col("_v").isNull()).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


@query(
    "q_vocab_coverage",
    oracle=(
        "WITH tok AS (SELECT doc_id, "
        "unnest(regexp_split_to_array(lower(text), '\\s+')) AS token "
        "FROM documents), "
        "t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''), "
        "v AS (SELECT token FROM (SELECT token, count(*) AS cnt FROM t2 "
        "GROUP BY token ORDER BY cnt DESC, token LIMIT 1000)) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(count(*) FILTER (WHERE v.token IS NULL) AS BIGINT) AS n_oov, "
        "round(CAST(count(*) FILTER (WHERE v.token IS NULL) AS DOUBLE) "
        "/ count(*), 6) AS oov_rate "
        "FROM t2 LEFT JOIN v USING (token) GROUP BY doc_id"
    ),
    doc=(
        "Per-document OOV rate against the corpus top-1000 token "
        "vocabulary — tokenizer-coverage eval: bounded-k vocab "
        "broadcast, map-side membership test, per-doc count aggregate."
    ),
    tags=("pipeline", "text"),
)
def q_vocab_coverage(spark, sf_dir):
    return vocab_coverage(_spread(T(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Connected components (dedup-cluster transitive closure)
# ---------------------------------------------------------------------------


def star_edges(df: DataFrame, group_cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """O(n) star edges linking every group member to the group's min id.

    The standard blocking->edges step of a dedup pipeline: a clique per
    group would be O(group^2) edges; linking to the min is equivalent for
    connectivity and linear.

    Plan shape: ONE exchange keyed by the group columns and a window min
    over the established partitioning — the same-key window needs no
    second shuffle (guide §2.4), where the previous groupBy+join-back
    form paid the aggregate exchange AND a join (r11 interleaved A/B on
    q_dedup_cc: 1.43 -> 1.00 s together with dropping the caller's pin).
    Only (key, id) pairs move, never document bodies. Skew: a window
    cannot be AQE-split like a join, but star-contraction groups ARE
    duplicate clusters — smallish by construction in a near-dup pipeline
    (a pathologically hot blocking key means boilerplate that upstream
    filtering owns); if a corpus violates that, the groupBy+join form
    with AQE skew-join is the drop-in fallback.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols)
    return (
        df.withColumn("__mn", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("__mn"))
        .select(F.col(id_col).alias("src"), F.col("__mn").alias("dst"))
    )


def _union_find_labels(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Driver-side union-find with path compression; returns (id, comp)
    with comp = min id per component. O(E α(E)) — for edge sets that fit
    on the driver this beats any distributed fixpoint by orders of
    magnitude (zero shuffles, zero scheduling rounds)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp_min: dict[int, int] = {}
    members = set()
    for u, v in pairs:
        members.add(u)
        members.add(v)
    for x in members:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, r), x)
    return [(x, comp_min[find(x)]) for x in members]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(id, comp) labeling with comp = min node id in each component.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round is two
    grouped-min + join stages over the EDGE list only, and the edge list
    monotonically contracts toward stars centered at component minima.
    Convergence is O(log^2 n) rounds worst-case — independent of graph
    diameter, which is what makes it the 100 TB path (plain label
    propagation needs diameter rounds; a chain of 10^6 near-dup docs
    would need 10^6 shuffles). Each round's edge set is
    ``localCheckpoint``-ed: every round references the previous frame
    several times, so without truncation the logical plan grows
    exponentially in rounds (the analyzer, not the executor, becomes the
    bottleneck). On a cluster with dynamic allocation, swap in reliable
    ``checkpoint()`` — localCheckpoint state dies with an executor.

    ``nodes``: optional one-column DataFrame of all node ids; nodes
    without edges come back as singleton components (comp = id).
    Convergence is detected by an order-insensitive edge-set checksum
    (count + XOR of pair hashes; the edge set is distinct, so XOR is a
    faithful set fingerprint) — one tiny agg job per round.

    ``driver_threshold``: edge sets at or below this size short-circuit
    to driver-side union-find — the same size-based plan choice a
    broadcast join makes. Near-dup edge graphs are tiny relative to the
    corpus (edges exist only between near-duplicates), so even a 100 TB
    corpus commonly yields a driver-sized edge list; each distributed
    round costs several shuffles + a blocking action, which union-find
    replaces with one collect. Past the threshold (or with
    ``driver_threshold=0``) the alternating-star fixpoint runs — the
    O(log^2 n)-round any-scale path.
    """
    e = (
        edges.select(F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        # lazy: the checksum right below is the materializing action, so
        # each round costs one job, not a checkpoint job + a checksum job
        .localCheckpoint(eager=False)
    )

    if driver_threshold:
        # Size probe WITHOUT row transfer: limit(+1).count() aborts the
        # scan once the limit is hit and ships one number to the driver —
        # an oversized graph (the case the distributed path exists for)
        # must not pay a threshold-sized driver collect just to learn it
        # is oversized. Only a confirmed-small edge set is collected.
        n_edges = e.limit(driver_threshold + 1).count()
        if n_edges <= driver_threshold:
            probe = e.collect()
            spark = edges.sparkSession
            labels = spark.createDataFrame(
                _union_find_labels([(r["u"], r["v"]) for r in probe]),
                "id bigint, comp bigint",
            )
            if nodes is None:
                nodes = (
                    edges.select(F.col(src).cast("bigint").alias("id"))
                    .union(edges.select(F.col(dst).cast("bigint").alias("id")))
                    .distinct()
                )
            else:
                id_name = nodes.columns[0]
                nodes = nodes.select(F.col(id_name).cast("bigint").alias("id")).distinct()
            return nodes.join(F.broadcast(labels), "id", "left").select(
                "id", F.coalesce("comp", F.col("id")).alias("comp")
            )

    def checksum(d: DataFrame):
        row = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev_sum = checksum(e)
    for _ in range(max_iterations):
        if prev_sum[0] == 0:
            break
        # large-star: from each node's neighborhood (symmetrized edges),
        # connect strictly-larger neighbors to the neighborhood min.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("__mv")).select(
            "u", F.least("__mv", "u").alias("m")
        )
        ls = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            # no distinct here: duplicate edges don't change the min
            # aggregates below, and ss dedupes before the checksum —
            # skipping it saves one shuffle per round
        )
        # small-star: connect each node's smaller-or-equal neighbors (and
        # itself) to the min of that set. ls output is canonical (u > v).
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur_sum = checksum(ss)
        e = ss
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    # converged: e is a star forest (u -> component min). Non-root labels
    # come straight off the edges; roots and singletons label themselves.
    labels = e.groupBy("u").agg(F.min("v").alias("comp")).select(
        F.col("u").alias("id"), "comp"
    )
    if nodes is None:
        nodes = (
            edges.select(F.col(src).cast("bigint").alias("id"))
            .union(edges.select(F.col(dst).cast("bigint").alias("id")))
            .distinct()
        )
    else:
        id_name = nodes.columns[0]
        nodes = nodes.select(F.col(id_name).cast("bigint").alias("id")).distinct()
    return nodes.join(labels, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("comp")
    )


@query(
    "q_dedup_cc",
    # Recursive-CTE oracle: comp = min reachable id over the symmetrized
    # edge set (transitive closure by fixpoint, exact at oracle scale).
    oracle=(
        "WITH RECURSIVE d AS (SELECT doc_id, lang, n_chars, "
        "length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens "
        "FROM documents), "
        "m1 AS (SELECT lang, n_chars, min(doc_id) AS mn FROM d GROUP BY 1, 2), "
        "m2 AS (SELECT lang, n_tokens, min(doc_id) AS mn FROM d GROUP BY 1, 2), "
        "e AS (SELECT d.doc_id AS src, m1.mn AS dst FROM d JOIN m1 USING (lang, n_chars) WHERE d.doc_id <> m1.mn "
        "UNION SELECT d.doc_id, m2.mn FROM d JOIN m2 USING (lang, n_tokens) WHERE d.doc_id <> m2.mn), "
        "se AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e), "
        "cc(id, comp) AS (SELECT doc_id, doc_id FROM d "
        "UNION SELECT se.dst, cc.comp FROM cc JOIN se ON se.src = cc.id) "
        "SELECT id AS doc_id, min(comp) AS comp FROM cc GROUP BY id"
    ),
    doc=(
        "Near-dup cluster assignment: star edges from two overlapping "
        "blocking keys (lang+n_chars, lang+n_tokens), then alternating "
        "large/small-star connected components — the transitive-closure "
        "step that turns pairwise dup evidence into keep-one clusters."
    ),
    tags=("pipeline", "dedup", "iterative"),
)
def q_dedup_cc(spark, sf_dir):
    # UNPINNED (r11, reverting the round-10 pin the driver bench said
    # regressed 0.81x with inverse core scaling): with the window form
    # of star_edges, d has three single-pass consumers (two windows +
    # the nodes list) instead of five join sides, and the interleaved
    # r11 A/B measured the pin as a net LOSS in that shape (pin+window
    # 1.10 s vs no-pin+window 1.00 s; the old pin+join shape was 1.35) —
    # the cheap length/translate projection costs less to recompute than
    # the cache materialization + read.
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        (
            F.length("text")
            - F.length(F.translate(F.col("text"), " ", ""))
            + 1
        ).alias("n_tokens"),
    )
    e1 = star_edges(d, ["lang", "n_chars"])
    e2 = star_edges(d, ["lang", "n_tokens"])
    cc = connected_components(e1.union(e2), nodes=d.select("doc_id"))
    return cc.select(F.col("id").alias("doc_id"), "comp")


# ---------------------------------------------------------------------------
# End-to-end corpus pipeline: dedup -> quality gate -> per-language rollup
# in ONE composed plan (the composition smoke for the operator library).
# ---------------------------------------------------------------------------


@query(
    "q_corpus_pipeline",
    # avg_quality via exact DECIMAL(8,4) sum + one double division:
    # quality is a round(4) double whose decimal value is NOT exactly
    # representable, so a raw double avg depends on partial-agg order —
    # the decimal sum is exact on both engines, division is correctly
    # rounded, so the round(4) output is deterministic.
    oracle=(
        "WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)), "
        "s AS (SELECT d.doc_id, d.lang, d.text FROM documents d "
        "JOIN surv ON d.doc_id = surv.doc_id), "
        "c AS (SELECT doc_id, lang, "
        "CAST(length(text) AS BIGINT) AS n_chars_calc, "
        "CAST((length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS n_spaces, "
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        "  ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens, "
        "CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_alnum, "
        "CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper "
        "FROM s), "
        "r AS (SELECT doc_id, lang, n_tokens, "
        "CASE WHEN n_chars_calc > 0 THEN CAST(n_chars_calc - n_alnum AS DOUBLE) / n_chars_calc ELSE 0.0 END AS pr, "
        "CASE WHEN n_chars_calc > 0 THEN CAST(n_upper AS DOUBLE) / n_chars_calc ELSE 0.0 END AS ur "
        "FROM c), "
        "q AS (SELECT doc_id, lang, n_tokens, "
        "round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5 "
        "  + (1.0 - least(pr * 5.0, 1.0)) * 0.3 "
        "  + (1.0 - least(ur * 5.0, 1.0)) * 0.2, 4) AS quality FROM r) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, "
        "round(CAST(sum(CAST(quality AS DECIMAL(8,4))) AS DOUBLE) / count(*), 4) AS avg_quality "
        "FROM q WHERE quality >= 0.5 GROUP BY lang"
    ),
    doc=(
        "Composed corpus pipeline in one Catalyst plan: exact dedup "
        "(md5 min-id survivors) -> quality features -> quality >= 0.5 "
        "gate -> per-language rollup. The md5 exchange carries 16-byte "
        "keys; the survivor join broadcasts the (hash, id) side when "
        "small and shuffles otherwise; everything downstream is one "
        "partial+final agg."
    ),
    tags=("pipeline", "dedup", "quality"),
)
def q_corpus_pipeline(spark, sf_dir):
    from libcolumnfile_spark.operators.dedup import exact_dedup
    from libcolumnfile_spark.operators.text import quality_features

    d = T(spark, sf_dir, "documents")
    survivors = exact_dedup(d, ["text"], "doc_id").select("doc_id")
    s = d.join(survivors, "doc_id").select("doc_id", "lang", "text")
    # lang rides the feature projection (carry_cols) — the old
    # quality_features(s).join(s, "doc_id") self-join re-executed the
    # scan+survivor subtree twice and paid a doc-scale SortMergeJoin
    # just to re-attach one column
    q = quality_features(s, carry_cols=("lang",))
    kept = q.filter(F.col("quality") >= 0.5)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum(F.col("quality").cast("decimal(8,4)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# Corpus mixing: weighted source sampling, deterministic shuffle order,
# repeat-factor upsampling — the "data mixture" steps a training run
# performs after dedup/quality filtering.
# ---------------------------------------------------------------------------

_MIX_RATES = (("src1", 80), ("src2", 40))  # percent kept; others ↓
_MIX_DEFAULT = 15


def _mix_rate_col() -> Column:
    c = None
    for src, rate in _MIX_RATES:
        c = F.when(F.col("source") == src, rate) if c is None else c.when(
            F.col("source") == src, rate
        )
    return c.otherwise(F.lit(_MIX_DEFAULT))


_MIX_RATE_SQL = (
    "CASE "
    + " ".join(f"WHEN source = '{s}' THEN {r}" for s, r in _MIX_RATES)
    + f" ELSE {_MIX_DEFAULT} END"
)


@query(
    "q_mix_weighted",
    oracle=(
        "SELECT source, count(*) AS n_sampled FROM documents "
        f"WHERE {_bucket_sql('doc_id')} < {_MIX_RATE_SQL} "
        "GROUP BY source ORDER BY source"
    ),
    doc=(
        "Weighted data mixing: per-source keep rates (80%/40%/15%) applied "
        "through the SAME md5 hash-bucketing as q_sample_hash, so the mix "
        "is reproducible row-by-row across engines and runs and composes "
        "with the split assignment (a doc keeps one bucket for both "
        "decisions). Pure map + one tiny per-source count shuffle; at "
        "100 TB the sample rate per source is retuned by editing literals, "
        "not re-shuffling data."
    ),
    tags=("pipeline", "sampling", "mixing"),
)
def q_mix_weighted(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return (
        d.filter(hash_bucket(F.col("doc_id")) < _mix_rate_col())
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("source")
    )


@query(
    "q_shuffle_order",
    oracle=(
        "SELECT CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) "
        "AS BIGINT) AS position, doc_id "
        "FROM documents ORDER BY position LIMIT 100"
    ),
    doc=(
        "Deterministic global shuffle order (epoch-0 training order): sort "
        "key = md5(doc_id), reproducible on any engine with no stored "
        "state. The declared query materializes the head of the order as "
        "TakeOrderedAndProject (no global sort); a full-corpus epoch writes "
        "with repartitionByRange(shuffle_key) + sortWithinPartitions — "
        "total order across output shards without a single-node sort."
    ),
    tags=("pipeline", "sampling", "shuffle"),
)
def q_shuffle_order(spark, sf_dir):
    from pyspark.sql.window import Window

    d = T(spark, sf_dir, "documents")
    head = (
        d.select(F.md5(F.col("doc_id").cast("string")).alias("sk"), "doc_id")
        .orderBy("sk")
        .limit(100)
    )
    # window over the already-limited head (<=100 rows) — not the corpus
    return (
        head.withColumn(
            "position", F.row_number().over(Window.orderBy("sk")).cast("bigint")
        )
        .select("position", "doc_id")
        .orderBy("position")
    )


@query(
    "q_upsample_repeat",
    oracle=(
        "SELECT doc_id, source, unnest(generate_series(1, "
        "CASE WHEN source = 'src1' THEN 3 WHEN source = 'src2' THEN 2 "
        "ELSE 1 END)) AS copy_idx FROM documents"
    ),
    doc=(
        "Repeat-factor upsampling (epoch mixing): high-value sources are "
        "replicated 3x/2x via explode(sequence(1, factor)) — the standard "
        "way to overweight a source across an epoch without copying bytes "
        "at rest. Pure map-side row generation (no shuffle); each copy "
        "carries copy_idx so downstream packing can interleave epochs."
    ),
    tags=("pipeline", "sampling", "mixing"),
)
def q_upsample_repeat(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    factor = (
        F.when(F.col("source") == "src1", 3)
        .when(F.col("source") == "src2", 2)
        .otherwise(1)
        .cast("bigint")
    )
    return d.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1).cast("bigint"), factor)).alias("copy_idx"),
    )


# ---------------------------------------------------------------------------
# Dataset versioning: keyed upsert (MERGE) and snapshot diff — corpus
# refreshes and release-over-release audits.
# ---------------------------------------------------------------------------


@query(
    "q_upsert_merge",
    oracle=(
        "WITH updates AS ("
        f"SELECT doc_id, n_chars + 1000 AS n_chars, source FROM documents WHERE {_bucket_sql('doc_id')} < 20 "
        "UNION ALL "
        f"SELECT doc_id + 1000000 AS doc_id, n_chars, source FROM documents WHERE {_bucket_sql('doc_id')} < 5"
        ") "
        "SELECT doc_id, n_chars, source FROM updates "
        "UNION ALL "
        "SELECT d.doc_id, d.n_chars, d.source FROM documents d "
        "WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.doc_id = d.doc_id)"
    ),
    doc=(
        "Keyed upsert (SQL MERGE without a table format): an updates "
        "batch (20% modified rows + 5% inserts, derived deterministically "
        "from the fixture by hash bucket) replaces matching doc_ids and "
        "appends new ones — updates UNION (target ANTI-JOIN updates), the "
        "classic rewrite merge. At 100 TB the anti-join is the only "
        "shuffle and co-partitions with a bucketed target; an update "
        "batch small enough to broadcast makes the merge a pure map over "
        "the target partitions (AQE decides — no hint needed)."
    ),
    tags=("pipeline", "versioning"),
)
def q_upsert_merge(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id", "n_chars", "source")
    b = hash_bucket(F.col("doc_id"))
    updates = (
        d.filter(b < 20)
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .unionByName(
            d.filter(b < 5).withColumn("doc_id", F.col("doc_id") + 1000000)
        )
    )
    return updates.unionByName(
        d.join(updates.select("doc_id"), "doc_id", "left_anti")
    )


@query(
    "q_snapshot_diff",
    oracle=(
        f"WITH old AS (SELECT doc_id, n_chars FROM documents WHERE {_bucket_sql('doc_id')} < 90), "
        f"new AS (SELECT doc_id, CASE WHEN {_bucket_sql('doc_id')} BETWEEN 40 AND 59 "
        "THEN n_chars + 7 ELSE n_chars END AS n_chars "
        f"FROM documents WHERE {_bucket_sql('doc_id')} >= 10) "
        "SELECT change, count(*) AS n FROM ("
        "SELECT CASE WHEN o.doc_id IS NULL THEN 'added' "
        "WHEN n.doc_id IS NULL THEN 'removed' "
        "WHEN o.n_chars <> n.n_chars THEN 'changed' "
        "ELSE 'unchanged' END AS change "
        "FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id) x "
        "GROUP BY change ORDER BY change"
    ),
    doc=(
        "Snapshot diff (release-over-release corpus audit): two corpus "
        "versions (simulated deterministically by hash-bucket carve-outs "
        "and a payload perturbation) FULL OUTER JOIN on the key, each row "
        "classified added/removed/changed/unchanged, counted per class. "
        "One co-partitioned shuffle join on the key; payload equality "
        "would compare content HASHES at scale, never the bodies (the "
        "fixture compares the numeric payload directly)."
    ),
    tags=("pipeline", "versioning"),
)
def q_snapshot_diff(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    old = d.filter(b < 90).select("doc_id", "n_chars")
    new = (
        d.filter(b >= 10)
        .select(
            "doc_id",
            F.when(b.between(40, 59), F.col("n_chars") + 7)
            .otherwise(F.col("n_chars"))
            .alias("n_chars"),
        )
    )
    o, n = old.alias("o"), new.alias("n")
    return (
        o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
        .select(
            F.when(F.col("o.doc_id").isNull(), "added")
            .when(F.col("n.doc_id").isNull(), "removed")
            .when(F.col("o.n_chars") != F.col("n.n_chars"), "changed")
            .otherwise("unchanged")
            .alias("change")
        )
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change")
    )


def scd2_merge(
    dim: DataFrame,
    delta: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts: int,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 MERGE: apply a snapshot batch to
    a validity-interval dimension. ``dim`` carries (key, attrs...,
    valid_from, valid_to) with valid_to NULL marking the current
    version; ``delta`` carries (key, attrs...) — the new values
    observed at time ``ts``. For every delta key whose attributes
    ACTUALLY differ from the current version (null-safe compare: no-op
    re-deliveries must not mint versions), the current row closes at
    ``ts`` and a new current row opens; everything else passes through
    untouched. The metadata-versioning face of corpus refreshes — where
    q_upsert_merge overwrites, SCD2 keeps the full audit history every
    as-of query needs.

    Plan shape: ONE left shuffle join of the current slice against the
    delta (hinted shuffle_hash — the delta is a batch of arbitrary
    size, never broadcast on an estimate), whose output splits three
    ways by a change flag (closed / kept / opened); closed history
    passes through join-free. At 100 TB the dimension co-partitions
    with the delta on the key and the whole merge is that single
    exchange.
    """
    cur = dim.filter(F.col("valid_to").isNull())
    hist = dim.filter(F.col("valid_to").isNotNull())
    u = delta.select(
        F.col(key_col),
        *[F.col(a).alias(f"__u_{a}") for a in attr_cols],
        F.lit(1).alias("__m"),
    )
    j = cur.join(u.hint("shuffle_hash"), key_col, "left")
    differs = None
    for a in attr_cols:
        d = ~F.col(a).eqNullSafe(F.col(f"__u_{a}"))
        differs = d if differs is None else (differs | d)
    changed = (F.col("__m") == 1) & differs
    out_cols = [key_col, *attr_cols, "valid_from", "valid_to"]
    # the three output arms (closed / kept / opened) are emitted from ONE
    # pass over the joined stream as a per-row array + explode — filtering
    # j three times re-executed the whole shuffle join per consumer (3
    # physical ShuffledHashJoins / 6 table-scale exchange sides observed),
    # and the join output is the wrong thing to persist at dimension
    # scale. A changed row explodes to [closed, opened]; the rest to
    # [kept]. Row multiset identical to the old three-arm union.
    closed_s = F.struct(
        F.col(key_col).alias(key_col),
        *[F.col(a).alias(a) for a in attr_cols],
        F.col("valid_from").alias("valid_from"),
        F.lit(ts).cast("bigint").alias("valid_to"),
    )
    opened_s = F.struct(
        F.col(key_col).alias(key_col),
        *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
        F.lit(ts).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
    )
    kept_s = F.struct(
        F.col(key_col).alias(key_col),
        *[F.col(a).alias(a) for a in attr_cols],
        F.col("valid_from").alias("valid_from"),
        F.col("valid_to").alias("valid_to"),
    )
    rows = F.when(
        F.coalesce(changed, F.lit(False)), F.array(closed_s, opened_s)
    ).otherwise(F.array(kept_s))
    merged = j.select(F.explode(rows).alias("__r")).select("__r.*")
    return hist.select(*out_cols).unionByName(merged)


@query(
    "q_scd2_merge",
    oracle=(
        "WITH b AS (SELECT c_custkey, c_acctbal, c_mktsegment, "
        f"{_bucket_sql('c_custkey')} AS bk FROM customer), "
        "dim AS ("
        "SELECT c_custkey, c_acctbal, c_mktsegment, CAST(0 AS BIGINT) AS valid_from, "
        "CAST(NULL AS BIGINT) AS valid_to FROM b "
        "UNION ALL "
        "SELECT c_custkey, c_acctbal - 50.0, c_mktsegment, CAST(-1 AS BIGINT), "
        "CAST(0 AS BIGINT) FROM b WHERE bk < 5), "
        "delta AS ("
        "SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment "
        "FROM b WHERE bk < 30 "
        "UNION ALL "
        "SELECT c_custkey, c_acctbal, c_mktsegment FROM b WHERE bk >= 30 AND bk < 40), "
        "cur AS (SELECT * FROM dim WHERE valid_to IS NULL), "
        "hist AS (SELECT * FROM dim WHERE valid_to IS NOT NULL), "
        "j AS (SELECT cur.*, d.c_acctbal AS u_bal, d.c_mktsegment AS u_seg, "
        "d.c_custkey IS NOT NULL AND (d.c_acctbal IS DISTINCT FROM cur.c_acctbal "
        "OR d.c_mktsegment IS DISTINCT FROM cur.c_mktsegment) AS changed "
        "FROM cur LEFT JOIN delta d ON cur.c_custkey = d.c_custkey) "
        "SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, valid_to FROM hist "
        "UNION ALL "
        "SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, CAST(1 AS BIGINT) "
        "FROM j WHERE changed "
        "UNION ALL "
        "SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, valid_to "
        "FROM j WHERE NOT COALESCE(changed, FALSE) "
        "UNION ALL "
        "SELECT c_custkey, u_bal, u_seg, CAST(1 AS BIGINT), CAST(NULL AS BIGINT) "
        "FROM j WHERE changed"
    ),
    doc=(
        "SCD Type-2 MERGE over a validity-interval dimension: a delta "
        "batch (30% value changes + 10% no-op re-deliveries, derived by "
        "hash bucket; 5% of keys carry prior history rows) closes "
        "changed current versions at ts=1 and opens new ones; no-op "
        "deliveries mint NO versions (null-safe attribute compare). One "
        "left shuffle join split three ways by the change flag."
    ),
    tags=("pipeline", "versioning"),
)
def q_scd2_merge(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    bk = hash_bucket(F.col("c_custkey"))
    base = c.select("c_custkey", "c_acctbal", "c_mktsegment", bk.alias("__bk"))
    dim = base.select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit(0).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
    ).unionByName(
        base.filter(F.col("__bk") < 5).select(
            "c_custkey",
            (F.col("c_acctbal") - 50.0).alias("c_acctbal"),
            "c_mktsegment",
            F.lit(-1).cast("bigint").alias("valid_from"),
            F.lit(0).cast("bigint").alias("valid_to"),
        )
    )
    delta = base.filter(F.col("__bk") < 30).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        base.filter((F.col("__bk") >= 30) & (F.col("__bk") < 40)).select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
    )
    return scd2_merge(dim, delta, "c_custkey", ["c_acctbal", "c_mktsegment"], ts=1)


# ---------------------------------------------------------------------------
# Data quality: column profiling and constraint validation — the checks a
# pipeline runs before promoting a corpus snapshot.
# ---------------------------------------------------------------------------


@query(
    "q_profile_columns",
    oracle=(
        "SELECT 'doc_id' AS col, count(*) AS n_rows, count(doc_id) AS n_nonnull, "
        "count(DISTINCT doc_id) AS n_distinct, "
        "CAST(min(doc_id) AS VARCHAR) AS min_v, CAST(max(doc_id) AS VARCHAR) AS max_v "
        "FROM documents "
        "UNION ALL SELECT 'lang', count(*), count(lang), count(DISTINCT lang), "
        "min(lang), max(lang) FROM documents "
        "UNION ALL SELECT 'n_chars', count(*), count(n_chars), "
        "count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), "
        "CAST(max(n_chars) AS VARCHAR) FROM documents ORDER BY col"
    ),
    doc=(
        "Column profiling (rows / non-null / distinct / min / max per "
        "column, stringified for a uniform schema): ALL columns profile "
        "in ONE aggregate pass over the corpus (15 aggregate expressions, "
        "partial+final, O(1) shuffle rows), then unpivot to one row per "
        "column — the summary a snapshot publisher attaches to a "
        "release. The oracle's 3-scan UNION form produces identical "
        "values; the fused pass reads the data once."
    ),
    tags=("pipeline", "quality", "profiling"),
)
def q_profile_columns(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "n_chars"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nonnull"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nonnull, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return (
        wide.select(
            "n_rows",
            F.expr(
                f"stack({len(cols)}, {stack_args}) "
                "AS (col, n_nonnull, n_distinct, min_v, max_v)"
            ),
        )
        .select("col", "n_rows", "n_nonnull", "n_distinct", "min_v", "max_v")
        .orderBy("col")
    )


@query(
    "q_dq_constraints",
    oracle=(
        "SELECT 'acctbal_negative' AS rule, count(*) AS n_violations "
        "FROM customer WHERE c_acctbal < 0 "
        "UNION ALL SELECT 'discount_range', count(*) FROM lineitem "
        "WHERE l_discount < 0 OR l_discount > 0.1 "
        "UNION ALL SELECT 'doc_id_unique', count(*) FROM ("
        "SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) > 1) d "
        "UNION ALL SELECT 'lineitem_orderkey_fk', count(*) FROM lineitem "
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey) "
        "UNION ALL SELECT 'orders_custkey_fk', count(*) FROM orders "
        "WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey) "
        "ORDER BY rule"
    ),
    doc=(
        "Constraint validation (business-rule range checks, key "
        "uniqueness, referential integrity): each rule is one count — "
        "ranges push to the scan, uniqueness is a keyed aggregate, FKs "
        "are anti-join counts with the parent side broadcast (orders-> "
        "customer) or co-partitioned (lineitem->orders at scale). The "
        "expected answer on a healthy snapshot is all-zeros except the "
        "known-dirty business rule (negative balances exist in the "
        "fixture by construction)."
    ),
    tags=("pipeline", "quality", "validation"),
)
def q_dq_constraints(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = _spread(T(spark, sf_dir, "lineitem"))
    d = T(spark, sf_dir, "documents")

    def one(rule, df):
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(rule).alias("rule"), "n_violations"
        )

    dup_docs = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    li_orphans = li.join(
        o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti"
    )
    o_orphans = o.join(
        _mb(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"), "left_anti"
    )
    return (
        one("acctbal_negative", c.filter(F.col("c_acctbal") < 0))
        .unionByName(
            one(
                "discount_range",
                li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
            )
        )
        .unionByName(one("doc_id_unique", dup_docs))
        .unionByName(one("lineitem_orderkey_fk", li_orphans))
        .unionByName(one("orders_custkey_fk", o_orphans))
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# Small-file compaction (storage management)
#
# Beyond-reference pipeline operator: rewrite a fragmented table
# directory into files near a target size — the standard maintenance
# pass every large ingest pipeline needs (streaming sinks and wide
# fan-out writes leave thousands of KB-sized files whose per-file open
# cost then dominates scans; Delta/Iceberg ship it as OPTIMIZE /
# rewrite_data_files). The reference's closest concern is its writer's
# size-based segment flush (columnfile-writer.cc:55-111), which bounds
# segment size going DOWN; compaction bounds file count going UP.
# ---------------------------------------------------------------------------


def plan_compaction(src_path: str, target_bytes: int) -> int:
    """Output file count for compacting ``src_path``:
    ceil(parquet_bytes / target_bytes), sized through the
    scheme-dispatched fs layer so object-store sources (s3://, hdfs://,
    gs://, mock://) see their real bytes. Raises on a source with zero
    readable parquet bytes — the failure mode this guards is a listing
    that silently returns nothing (e.g. os.walk over a URI string),
    which would otherwise plan coalesce(1) over an arbitrarily large
    table."""
    import math

    from libcolumnfile_spark.sources.columnfile.fs import fs_du_suffix

    total, n_in = fs_du_suffix(src_path, ".parquet")
    if total <= 0 or n_in == 0:
        raise ValueError(
            f"compact_parquet: no parquet bytes found under {src_path!r} "
            "(empty source, or a backend the fs layer cannot list) — "
            "refusing to plan a degenerate 1-file rewrite"
        )
    return max(1, math.ceil(total / target_bytes))


def compact_parquet(
    spark,
    src_path: str,
    dest_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> int:
    """Rewrite ``src_path`` (a parquet dir) into ~``target_bytes`` files
    at ``dest_path``; returns the output file count.

    File count = ceil(input_bytes / target_bytes) from the source's
    actual file sizes, listed through the scheme-dispatched fs layer
    (sources/columnfile/fs.py) so ``s3://``/``hdfs://``/``gs://``/
    ``mock://`` sources size correctly — a bare os.walk over an
    object-store URI yields nothing, total=0, and every compaction
    would silently collapse to coalesce(1) through one task. A source
    with zero readable parquet bytes raises instead of degenerating.

    ``shuffle=False`` (default) uses coalesce: a LOCAL merge of input
    splits with no exchange — the cheap path when reducing file count,
    which is what compaction does. ``shuffle=True`` round-robins rows
    for evenly-sized output (one exchange of the data), matching Delta
    OPTIMIZE's rewrite. At 100 TB either runs embarrassingly parallel
    per output file; the decision is per partition-directory in
    practice (compact only dirs whose mean file size is under
    threshold).
    """
    from libcolumnfile_spark.sources.columnfile.fs import fs_du_suffix

    n_out = plan_compaction(src_path, target_bytes)
    df = spark.read.parquet(src_path)
    df = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    df.write.mode("overwrite").parquet(dest_path)
    return fs_du_suffix(dest_path, ".parquet")[1]


def _fragmented_documents_fixture(spark, sf_dir: str) -> tuple[str, str]:
    """One-time fixture: the documents table deliberately shattered into
    64 small files (the state a streaming sink leaves behind), plus the
    compacted rewrite. Same manifest-guarded conversion pattern as the
    csv/json/orc fixtures (sources/stock.py)."""
    import hashlib

    from libcolumnfile_spark.cache import cache_has, cache_path

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    frag = cache_path("stockcache", key, "docs_fragmented")
    compacted = cache_path("stockcache", key, "docs_compacted")
    if not cache_has("stockcache", key, "docs_fragmented", "_SUCCESS"):
        T(spark, sf_dir, "documents").repartition(64).write.mode("overwrite").parquet(frag)
    if not cache_has("stockcache", key, "docs_compacted", "_SUCCESS"):
        # 4 MB target: collapses the 64 shards to a handful of files at
        # any fixture SF while still exercising the ceil() sizing
        compact_parquet(spark, frag, compacted, target_bytes=4 * 1024 * 1024)
    return frag, compacted


@query(
    "q_compaction",
    oracle="SELECT doc_id, lang, source, n_chars FROM documents",
    doc=(
        "Small-file compaction (Delta OPTIMIZE / Iceberg "
        "rewrite_data_files analogue): the documents table shattered "
        "into 64 streaming-sink-style small files, compacted to "
        "~4 MB-target files via compact_parquet (coalesce: local merge, "
        "no exchange), then read back — the oracle pins losslessness "
        "(every row survives the rewrite bit-for-bit); "
        "tests/test_pipeline.py pins the file-count contract. Scale: "
        "file count derives from actual input bytes; coalesce runs "
        "embarrassingly parallel per output file with no shuffle."
    ),
    tags=("pipeline", "storage"),
)
def q_compaction(spark, sf_dir):
    _frag, compacted = _fragmented_documents_fixture(spark, sf_dir)
    return spark.read.parquet(compacted).select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance
# ---------------------------------------------------------------------------


def mv_maintain(
    base_state: DataFrame, changes: DataFrame, key: str = "lang"
) -> DataFrame:
    """Incremental maintenance of an additive aggregate view: merge the
    STORED per-group state with a signed change aggregate (CDC deltas:
    mult=+1 inserts, mult=-1 deletes) instead of recomputing over
    history. Counts and sums are self-maintainable (Gupta & Mumick,
    "Maintenance of Materialized Views"), so the merged state is exactly
    the full recompute — which is what the oracle checks, making the
    correctness gate a CROSS-METHOD equivalence, not a replay.

    ``base_state``: (key, n_docs, n_chars_sum) — the stored view.
    ``changes``: (key, mult, n_chars) rows — the delta batch.

    Scale: cost is O(delta) map work + a groups-bounded merge shuffle.
    Maintaining a view over a 100 TB corpus from a 100 GB daily delta
    touches the delta and the O(groups) state table only — never
    history. Groups whose count reaches zero drop out of the view.
    """
    delta_state = changes.groupBy(key).agg(
        F.sum("mult").cast("bigint").alias("n_docs"),
        F.sum(F.col("mult") * F.col("n_chars")).cast("bigint").alias("n_chars_sum"),
    )
    return (
        base_state.unionByName(delta_state)
        .groupBy(key)
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_chars_sum").cast("bigint").alias("n_chars_sum"),
        )
        .filter(F.col("n_docs") > 0)
    )


@query(
    "q_mv_maintain",
    # the oracle RECOMPUTES the view over the post-change membership —
    # the incremental merge must land on exactly this state
    oracle=(
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS n_chars_sum FROM documents "
        "WHERE (doc_id % 5 <> 0 AND doc_id % 7 <> 3) OR doc_id % 5 = 0 "
        "GROUP BY lang HAVING count(*) > 0"
    ),
    doc=(
        "Incremental materialized-view maintenance: stored per-language "
        "(count, char-sum) state merged with a signed CDC delta batch "
        "(inserts doc_id%5=0, deletes doc_id%7=3 of the base) — "
        "O(delta + groups), never a history rescan; the oracle is the "
        "full recompute, so the gate checks cross-method equivalence."
    ),
    tags=("pipeline", "versioning"),
)
def q_mv_maintain(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 5 != 0)
    # stored view state (in production: the persisted O(groups) table)
    base_state = base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars_sum"),
    )
    inserts = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select("lang", F.lit(1).alias("mult"), "n_chars")
    )
    deletes = (
        base.filter(F.col("doc_id") % 7 == 3)
        .select("lang", F.lit(-1).alias("mult"), "n_chars")
    )
    return mv_maintain(base_state, inserts.unionByName(deletes))


@query(
    "q_skew_report",
    oracle=(
        "WITH g AS (SELECT l_suppkey AS key, count(*) AS n FROM lineitem "
        "GROUP BY l_suppkey), "
        "s AS (SELECT CAST(sum(n) AS BIGINT) AS total, "
        "CAST(max(n) AS BIGINT) AS max_n, "
        "CAST(count(*) AS BIGINT) AS n_keys, "
        "round(CAST(max(n) AS DOUBLE) * count(*) / sum(n), 4) AS skew_factor "
        "FROM g), "
        "top AS (SELECT key, CAST(n AS BIGINT) AS n, "
        "round(CAST(n AS DOUBLE) / (SELECT total FROM s), 6) AS share "
        "FROM g ORDER BY n DESC, key LIMIT 5) "
        "SELECT top.key, top.n, top.share, s.n_keys, s.total, s.skew_factor "
        "FROM top CROSS JOIN s"
    ),
    doc=(
        "Per-key skew diagnostics: heaviest join/agg keys with row "
        "share, plus the max/mean group-size skew factor — the report "
        "run before choosing salting or AQE skew-join thresholds. One "
        "key-bounded aggregate + a 1-row stats cross join + top-k."
    ),
    tags=("pipeline", "diagnostics"),
)
def q_skew_report(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # 1-row stats: total rows, key count, skew factor (max/mean group
    # size). Broadcast back onto the top-k — never a driver collect.
    stats = g.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.max("n").cast("bigint").alias("max_n"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.round(
            F.max("n").cast("double") * F.count(F.lit(1)) / F.sum("n"), 4
        ).alias("skew_factor"),
    )
    top = g.orderBy(F.col("n").desc(), F.col("key").asc()).limit(5)
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            "key",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
            "n_keys",
            "total",
            "skew_factor",
        )
    )


def class_balance(df: DataFrame, label_col: str = "label") -> DataFrame:
    """Label-balance report for a training table: per-label counts
    reduced to one diagnostic row — distinct labels, total rows, the
    largest label share, and the chi-square statistic against the
    uniform distribution (the skew test that gates classifier training
    data before sampling weights are computed).

    One label-bounded hash aggregate, then single-row reductions: the
    only exchange carries one row per distinct label per mapper.
    """
    per = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n"))
    tot = per.agg(
        F.count(F.lit(1)).alias("n_labels"),
        F.sum("n").alias("n_rows"),
    )
    joined = per.crossJoin(F.broadcast(tot))
    exp = F.col("n_rows").cast("double") / F.col("n_labels")
    return (
        joined.agg(
            F.min("n_labels").alias("n_labels"),
            F.min("n_rows").alias("n_rows"),
            F.round(F.max(F.col("n") / F.col("n_rows")), 6).alias("max_share"),
            F.round(
                F.sum((F.col("n") - exp) * (F.col("n") - exp) / exp), 4
            ).alias("chi2_uniform"),
        )
    )


@query(
    "q_class_balance",
    oracle=(
        "WITH per AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label), "
        "tot AS (SELECT count(*) AS n_labels, CAST(sum(n) AS BIGINT) AS n_rows FROM per) "
        "SELECT min(n_labels) AS n_labels, min(n_rows) AS n_rows, "
        "round(max(n / CAST(n_rows AS DOUBLE)), 6) AS max_share, "
        "round(sum((n - n_rows / CAST(n_labels AS DOUBLE)) "
        "* (n - n_rows / CAST(n_labels AS DOUBLE)) "
        "/ (n_rows / CAST(n_labels AS DOUBLE))), 4) AS chi2_uniform "
        "FROM per CROSS JOIN tot"
    ),
    doc=(
        "Label-balance report (distinct labels, max share, chi-square "
        "vs uniform) over the embeddings training table: one "
        "label-bounded aggregate + single-row reductions."
    ),
    tags=("pipeline", "quality"),
)
def q_class_balance(spark, sf_dir):
    return class_balance(T(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Distribution matching: downsample-only acceptance resampling that
# rebalances a corpus toward a target group mix (the move behind
# "rebalance languages/domains before training"). Unlike the fixed-rate
# stratified sample (q_sample_stratified), the rates here are COMPUTED
# from the observed distribution: every group is thinned toward the
# target share, anchored so the scarcest group keeps 100%.
# ---------------------------------------------------------------------------


def distribution_match(
    df: DataFrame, group_col: str = "lang", id_col: str = "doc_id"
) -> DataFrame:
    """Per-group acceptance summary for a uniform target mix.

    With group counts n_g and a uniform target, the downsample-only
    solution anchored at the scarcest group accepts min(n)/n_g of group
    g. Acceptance is decided row-by-row by the engine-portable md5
    bucket (hash_bucket, parts-per-million grain) against an INTEGER
    threshold floor(1e6 * min(n) / n_g) — all-integer arithmetic, so
    Spark and any other engine accept exactly the same rows forever
    (the reproducibility bar q_sample_hash sets).

    Output: (group, n_docs, thr_ppm, n_sampled) per group.

    Scale design: one group-keyed count (map-side partial, group
    cardinality bounded — languages/domains are thousands at most), the
    1-row min broadcast back, and ONE scan of the corpus filtered by a
    pure map predicate joined to the per-group threshold (broadcast —
    the group table is construction-bounded). No row-scale shuffle: at
    100 TB this is two scans' worth of work, and the second scan is the
    sampling pass a real pipeline would fuse with its writer.
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    mn = counts.agg(F.min("n_docs").alias("mn"))
    # `div`, not `/`+floor: the float path would round differently from
    # integer division once 1e6 * min(n) passes 2^53 (real-corpus group
    # counts can), and the acceptance threshold must be engine-exact
    thr = counts.crossJoin(F.broadcast(mn)).select(
        "grp",
        "n_docs",
        F.expr("CAST((1000000 * mn) DIV n_docs AS BIGINT)").alias("thr_ppm"),
    )
    accepted = (
        df.select(F.col(group_col).alias("grp"), F.col(id_col).alias("__id"))
        .join(F.broadcast(thr.select("grp", "thr_ppm")), "grp")
        .filter(hash_bucket(F.col("__id"), 1_000_000) < F.col("thr_ppm"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        thr.join(accepted, "grp", "left")
        .select(
            F.col("grp").alias("grp"),
            "n_docs",
            "thr_ppm",
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
        )
    )


@query(
    "q_distribution_match",
    oracle=(
        "WITH n AS (SELECT lang AS grp, count(*) AS n_docs FROM documents "
        "GROUP BY 1), "
        "m AS (SELECT min(n_docs) AS mn FROM n), "
        "t AS (SELECT grp, n_docs, "
        "CAST((1000000 * mn) // n_docs AS BIGINT) AS thr_ppm "
        "FROM n CROSS JOIN m), "
        "s AS (SELECT d.lang AS grp, count(*) AS n_sampled FROM documents d "
        "JOIN t ON d.lang = t.grp WHERE "
        f"{_bucket_sql('d.doc_id', 1_000_000)} < t.thr_ppm GROUP BY 1) "
        "SELECT t.grp, t.n_docs, t.thr_ppm, "
        "CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled "
        "FROM t LEFT JOIN s ON t.grp = s.grp"
    ),
    doc=(
        "Distribution-matching resampler: downsample-only acceptance "
        "thresholds (ppm grain, all-integer arithmetic) that rebalance "
        "the corpus to a uniform language mix, anchored at the scarcest "
        "language; per-language before/after counts."
    ),
    tags=("pipeline", "sampling"),
)
def q_distribution_match(spark, sf_dir):
    return distribution_match(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# CDC changelog apply: reconstruct the current table state from a base
# snapshot plus an ordered insert/update/delete changelog — the batch
# face of change-data-capture ingestion (Debezium/Delta-CDF-style
# feeds), and the missing sibling of upsert_merge (latest-wins, no
# deletes) and scd2_merge (history-keeping). Deletes make it a distinct
# operator: the winning op per key decides PRESENCE, not just values.
# ---------------------------------------------------------------------------


def cdc_apply(
    snapshot: DataFrame,
    changelog: DataFrame,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D changelog to a snapshot: the highest-``seq`` op
    per key wins; a winning 'D' removes the key, a winning 'I'/'U'
    contributes its values. The snapshot participates as seq=0 inserts,
    so unchanged keys survive and a delete-then-reinsert sequence
    (D at seq s, I at seq s' > s) correctly resurrects the key.

    ``changelog`` must carry the snapshot's value columns plus
    (``op_col``, ``seq_col``); ``seq`` must be unique per key (CDC log
    offsets are), which makes the winner deterministic.

    Scale design: ONE union scan and ONE key-keyed struct-max aggregate
    — seq leads the struct, so lexicographic max IS highest-seq-wins and
    the winning row's values ride along in the same comparator. The
    aggregate is partial-aggregable (map-side combine collapses each
    task's log to its distinct keys before the exchange), so the single
    shuffle carries ~|keys| rows. The alternatives both lose at scale:
    max(seq)+join-back re-shuffles the full log twice more (measured
    x10 ratio 7.3 vs 1.9 for this form), and row_number over
    (key ORDER BY seq DESC) forces a full sort with no partial
    aggregation at all.
    """
    value_cols = [c for c in snapshot.columns if c != key_col]
    log = snapshot.select(
        F.col(key_col),
        F.lit("I").alias(op_col),
        F.lit(0).cast("int").alias(seq_col),
        *[F.col(c) for c in value_cols],
    ).unionByName(
        changelog.select(key_col, op_col, seq_col, *value_cols)
    )
    win = log.groupBy(key_col).agg(
        F.max(F.struct(seq_col, op_col, *value_cols)).alias("__w")
    )
    return (
        win.filter(F.col(f"__w.{op_col}") != "D")
        .select(
            key_col,
            F.col(f"__w.{op_col}").alias("last_op"),
            *[F.col(f"__w.{c}").alias(c) for c in value_cols],
        )
    )


@query(
    "q_cdc_apply",
    oracle=(
        "WITH log AS ("
        "SELECT o_orderkey, 'I' AS op, 0 AS seq, "
        "o_totalprice AS price, o_orderstatus AS status "
        "FROM orders WHERE o_orderkey % 7 <> 0 "
        "UNION ALL SELECT o_orderkey, 'U', 1, o_totalprice + 10.0, "
        "o_orderstatus FROM orders WHERE o_orderkey % 3 = 0 "
        "UNION ALL SELECT o_orderkey, 'D', 2, NULL, NULL "
        "FROM orders WHERE o_orderkey % 5 = 0 "
        "UNION ALL SELECT o_orderkey, 'I', 3, o_totalprice, "
        "o_orderstatus FROM orders WHERE o_orderkey % 7 = 0), "
        "w AS (SELECT o_orderkey, max({'seq': seq, 'op': op, "
        "'price': price, 'status': status}) AS m FROM log GROUP BY 1) "
        "SELECT o_orderkey, m.op AS last_op, "
        "m.price AS o_totalprice, m.status AS o_orderstatus "
        "FROM w WHERE m.op <> 'D'"
    ),
    doc=(
        "CDC changelog apply over orders: base snapshot (keys not "
        "divisible by 7) + a 3-step derived changelog (U: +10.0 price "
        "for keys %3=0; D: keys %5=0; late I: keys %7=0, exercising "
        "delete-then-reinsert) collapsed to current state by "
        "highest-seq-wins with delete semantics."
    ),
    tags=("pipeline", "versioning"),
)
def q_cdc_apply(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    snap = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    upd = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        F.lit(1).cast("int").alias("seq"),
        (F.col("o_totalprice") + F.lit(10.0)).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    dels = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(2).cast("int").alias("seq"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("string").alias("status"),
    )
    ins = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("I").alias("op"),
        F.lit(3).cast("int").alias("seq"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    changelog = upd.unionByName(dels).unionByName(ins)
    return cdc_apply(snap, changelog, "o_orderkey").select(
        "o_orderkey",
        "last_op",
        F.col("price").alias("o_totalprice"),
        F.col("status").alias("o_orderstatus"),
    )


# ---------------------------------------------------------------------------
# Gini concentration: how unequally the corpus is distributed across a
# grouping (sources, languages, domains) — the one-number "is this
# corpus dominated by a few feeds?" alarm that decides whether
# q_domain_cap / q_distribution_match need to run at all.
# ---------------------------------------------------------------------------


def gini_concentration(df: DataFrame, group_col: str) -> DataFrame:
    """One row: (n_groups, n_rows, gini) — Gini coefficient of the
    per-group row counts (0 = perfectly even, ->1 = one group holds
    everything), via the sorted-rank identity
    G = 2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n over ascending x.

    Scale design: one group-keyed count aggregate (map-side partials,
    group-cardinality-bounded output); the rank window runs over the
    GROUP table, not the corpus. The (count, group) order is total, so
    the rank — and G — is deterministic cross-engine.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("cnt", "g")
    ranked = counts.select(
        "cnt", F.row_number().over(w).alias("i")
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("cnt").alias("n_rows"),
        F.sum(F.col("i") * F.col("cnt")).alias("iw"),
    )
    n, tot = F.col("n_groups"), F.col("n_rows")
    gini = (F.lit(2.0) * F.col("iw")) / (n * tot) - (n + F.lit(1.0)) / n
    return s.select("n_groups", "n_rows", F.round(gini, 6).alias("gini"))


@query(
    "q_gini",
    oracle=(
        "WITH c AS (SELECT source AS g, count(*) AS cnt FROM documents "
        "GROUP BY 1), "
        "r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, g) AS i FROM c), "
        "s AS (SELECT count(*) AS n_groups, CAST(sum(cnt) AS BIGINT) "
        "AS n_rows, CAST(sum(i * cnt) AS BIGINT) AS iw FROM r) "
        "SELECT n_groups, n_rows, "
        "round(2.0 * iw / (n_groups * CAST(n_rows AS DOUBLE)) "
        "- (n_groups + 1.0) / n_groups, 6) AS gini FROM s"
    ),
    doc=(
        "Gini coefficient of per-source document counts — corpus-"
        "concentration alarm; rank window over the group-cardinality-"
        "bounded count table only."
    ),
    tags=("pipeline", "stats", "sampling"),
)
def q_gini(spark, sf_dir):
    return gini_concentration(T(spark, sf_dir, "documents"), "source")


# ---------------------------------------------------------------------------
# Privacy pair: k-anonymity audit + differentially-private count
# release. Together with q_pii_redact these are the three privacy
# postures a published dataset passes through: strip direct
# identifiers (redaction), verify quasi-identifiers don't re-identify
# (k-anonymity), and noise any released aggregate (DP).
# ---------------------------------------------------------------------------


def kanonymity_audit(
    df: DataFrame, qi_cols: list, k: int = 5
) -> DataFrame:
    """Equivalence classes over the quasi-identifier columns with fewer
    than ``k`` members — every row in such a class is re-identifiable
    by joining the published QI combination against an external source.

    Scale design: ONE QI-keyed count aggregate (map-side partials; the
    exchange is class-cardinality-bounded) + a count filter. The
    violating-class report IS the remediation worklist (generalize or
    suppress those combinations).
    """
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < k)
    )


@query(
    "q_kanonymity",
    oracle=(
        "SELECT lang, source, CAST(n_chars // 500 AS BIGINT) AS len_bucket, "
        "count(*) AS n FROM documents "
        "GROUP BY 1, 2, 3 HAVING count(*) < 5"
    ),
    doc=(
        "k-anonymity audit (k=5) over the (lang, source, length-bucket) "
        "quasi-identifiers: one class-keyed count exchange, violating "
        "classes reported as the generalize/suppress worklist — the "
        "re-identification check before publishing."
    ),
    tags=("pipeline", "privacy", "stats"),
)
def q_kanonymity(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select(
        "lang",
        "source",
        (F.col("n_chars") / 500).cast("bigint").alias("len_bucket"),
    )
    return kanonymity_audit(d, ["lang", "source", "len_bucket"])


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    salt: "str | None" = None,
) -> DataFrame:
    """(group, n_noisy) per group: true count + Laplace(1/epsilon)
    noise via the inverse-CDF of a seeded md5 uniform.

    WARNING — with ``salt=None`` this is a DP *mechanism demo*, NOT a
    private release: the noise derives solely from the PUBLIC group
    key's md5, so anyone can recompute it and recover the exact counts
    (zero effective differential privacy). An actual release MUST pass
    a secret, single-use per-release ``salt`` (same plan, same epsilon
    accounting); only the declared oracle query pins ``salt=None`` so
    DuckDB can verify the release arithmetic end-to-end.

    Scale design: one group-keyed count exchange; the noise is derived
    arithmetic on the group row. The (v + 0.5) / 2^32 uniform can never
    equal 0.5 exactly, so the inverse CDF never sees log(0).
    """
    cnt = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    seed_src = (
        F.col("grp")
        if salt is None
        else F.concat(F.lit(str(salt)), F.lit("|"), F.col("grp"))
    )
    u = (
        F.conv(F.substring(F.md5(seed_src), 1, 8), 16, 10).cast("double")
        + 0.5
    ) / F.lit(float(1 << 32))
    b = 1.0 / epsilon
    noise = (
        -F.lit(b)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return cnt.select(
        "grp", F.round(F.col("n") + noise, 4).alias("n_noisy")
    )


@query(
    "q_dp_counts",
    oracle=(
        "WITH c AS (SELECT source AS grp, count(*) AS n FROM documents "
        "GROUP BY 1), "
        "u AS (SELECT grp, n, "
        "(('0x' || substring(md5(grp), 1, 8))::BIGINT + 0.5) / 4294967296.0 "
        "AS u FROM c) "
        "SELECT grp, round(n - 1.0 * sign(u - 0.5) "
        "* ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS n_noisy FROM u"
    ),
    doc=(
        "Differentially-private per-source count release (epsilon=1 "
        "Laplace via inverse-CDF of a seeded md5 uniform — "
        "deterministic so the release arithmetic is oracle-checkable; "
        "production swaps one secret salt): one group-keyed count "
        "exchange, noise derived per group row."
    ),
    tags=("pipeline", "privacy", "stats"),
)
def q_dp_counts(spark, sf_dir):
    # salt=None (mechanism demo) ONLY so the DuckDB oracle can replay
    # the arithmetic; see the dp_noisy_counts warning.
    return dp_noisy_counts(T(spark, sf_dir, "documents"), "source", salt=None)


# ---------------------------------------------------------------------------
# RFM segmentation — the classic recency/frequency/monetary customer
# scoring over the order history: each dimension quintile-scored 1-5,
# customers grouped into the 125-cell RFM grid. The canonical
# "assemble per-entity features, score against corpus quantiles,
# segment" shape every feature-store batch job runs.
# ---------------------------------------------------------------------------


def rfm_segments(
    df: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """(r_score, f_score, m_score, n_customers, total_monetary) over
    the 125-cell RFM grid. Higher score = better (more recent, more
    frequent, more spend).

    Scale design: one customer-keyed aggregate builds the per-customer
    (recency, frequency, monetary) row; the reference date and all 12
    quintile cuts come from single-row aggregates over that CUSTOMER
    table (exact percentiles — the q_equidepth_hist recipe, no global
    sort) and ride broadcasts; scoring is a map-side bounded-array
    scan and the final exchange is 125-cell-bounded.
    """
    # monetary is an exact DECIMAL(18,2) sum: raw double sums differ in
    # the last ulp between engines (partial-aggregation order), which
    # both shifts quantile cuts by an ulp for the cut-defining customers
    # and lands grid-cell averages on round(.,4) boundaries (observed:
    # 1951278.65375). Exact money arithmetic removes the whole class.
    per_cust = df.groupBy(F.col(cust_col).alias("cust")).agg(
        F.max(F.col(date_col).cast("date")).alias("last_order"),
        F.count(F.lit(1)).cast("double").alias("freq"),
        F.sum(F.col(amount_col).cast("decimal(18,2)")).alias("monetary_dec"),
    ).withColumn("monetary", F.col("monetary_dec").cast("double"))
    ref = per_cust.agg(F.max("last_order").alias("ref_date"))
    rfm = per_cust.crossJoin(F.broadcast(ref)).select(
        "cust",
        F.datediff("ref_date", "last_order").cast("double").alias("rec"),
        "freq",
        "monetary",
        "monetary_dec",
    )
    qs = [0.2, 0.4, 0.6, 0.8]
    cuts = rfm.agg(
        F.percentile("rec", F.array(*[F.lit(q) for q in qs])).alias("rc"),
        F.percentile("freq", F.array(*[F.lit(q) for q in qs])).alias("fc"),
        F.percentile("monetary", F.array(*[F.lit(q) for q in qs])).alias("mc"),
    )
    scored = rfm.crossJoin(F.broadcast(cuts)).select(
        # lower recency is BETTER: score counts cuts the value sits below
        (1 + F.size(F.filter("rc", lambda t: F.col("rec") > t)))
        .alias("raw_r"),
        (1 + F.size(F.filter("fc", lambda t: F.col("freq") > t))).alias("f_score"),
        (1 + F.size(F.filter("mc", lambda t: F.col("monetary") > t))).alias(
            "m_score"
        ),
        "monetary_dec",
    ).select(
        (6 - F.col("raw_r")).alias("r_score"), "f_score", "m_score", "monetary_dec"
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        # the cell's money total stays EXACT decimal until one final
        # double cast — no round() anywhere: a per-cell average of
        # exact cents lands exactly ON round boundaries (observed
        # 1951278.65375), where Spark's BigDecimal HALF_UP and DuckDB's
        # scaled-double rounding disagree by construction
        F.sum("monetary_dec").cast("double").alias("total_monetary"),
    )


@query(
    "q_rfm_segments",
    oracle=(
        "WITH pc AS (SELECT o_custkey AS cust, "
        "max(CAST(o_orderdate AS DATE)) AS last_order, "
        "CAST(count(*) AS DOUBLE) AS freq, "
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_dec, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary "
        "FROM orders GROUP BY 1), "
        "r AS (SELECT max(last_order) AS ref_date FROM pc), "
        "rfm AS (SELECT cust, CAST(datediff('day', last_order, ref_date) "
        "AS DOUBLE) AS rec, freq, monetary, monetary_dec "
        "FROM pc CROSS JOIN r), "
        "c AS (SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS rc, "
        "quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fc, "
        "quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mc FROM rfm), "
        "s AS (SELECT 6 - (1 + len(list_filter(rc, t -> rec > t))) AS r_score, "
        "1 + len(list_filter(fc, t -> freq > t)) AS f_score, "
        "1 + len(list_filter(mc, t -> monetary > t)) AS m_score, monetary_dec "
        "FROM rfm CROSS JOIN c) "
        "SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score, "
        "CAST(m_score AS INT) AS m_score, count(*) AS n_customers, "
        "CAST(sum(monetary_dec) AS DOUBLE) AS total_monetary "
        "FROM s GROUP BY 1, 2, 3"
    ),
    doc=(
        "RFM customer segmentation: one customer-keyed aggregate, "
        "reference date + 12 exact quintile cuts from 1-row broadcasts "
        "(the q_equidepth_hist recipe — no global sort), map-side "
        "bounded-array scoring, 125-cell-bounded final exchange."
    ),
    tags=("pipeline", "agg", "stats"),
)
def q_rfm_segments(spark, sf_dir):
    return rfm_segments(T(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Mixture planning — the step BEFORE q_mix_weighted executes a mix:
# given target mixture weights and a token budget, compute per-source
# sampling rates and effective epoch counts from what's actually
# available. The planning table every pretraining data order starts
# from (and where over-epoching a scarce source becomes visible before
# any data moves).
# ---------------------------------------------------------------------------

_MIX_PLAN_WEIGHTS = {"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.2}
_MIX_PLAN_BUDGET = 50_000


def mixture_plan(
    df: DataFrame,
    weights: dict,
    total_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, available_tokens, target_tokens, rate, epochs) per
    source in the target mix: rate = sampled fraction when the source
    over-supplies (capped at 1), epochs > 1 flags repetition when it
    under-supplies.

    Scale design: ONE source-keyed token-count aggregate over the
    corpus (map-side partials, source-cardinality-bounded exchange);
    the weight table is a literal broadcast; everything after is
    derived arithmetic on the bounded source table.
    """
    spark = df.sparkSession
    avail = (
        df.select(
            F.col(source_col).alias("source"),
            F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
        )
        .groupBy("source")
        .agg(F.sum("tok").alias("available_tokens"))
    )
    w = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())], ["source", "w"]
    )
    planned = avail.join(F.broadcast(w), "source")
    target = F.round(F.col("w") * total_budget).cast("bigint")
    return planned.select(
        "source",
        "available_tokens",
        target.alias("target_tokens"),
        F.round(
            F.least(F.lit(1.0), target / F.col("available_tokens")), 6
        ).alias("rate"),
        F.round(target / F.col("available_tokens"), 4).alias("epochs"),
    )


def _mix_plan_oracle() -> str:
    wrows = " UNION ALL ".join(
        f"SELECT '{k}' AS source, CAST({v!r} AS DOUBLE) AS w"
        for k, v in sorted(_MIX_PLAN_WEIGHTS.items())
    )
    b = _MIX_PLAN_BUDGET
    return (
        "WITH a AS (SELECT source, "
        "sum(len(string_split_regex(lower(trim(text)), '\\s+'))) "
        "AS available_tokens FROM documents GROUP BY source), "
        f"w AS ({wrows}) "
        "SELECT a.source, CAST(available_tokens AS BIGINT) AS available_tokens, "
        f"CAST(round(w * {b}) AS BIGINT) AS target_tokens, "
        f"round(least(1.0, round(w * {b}) / CAST(available_tokens AS DOUBLE)), 6) "
        "AS rate, "
        f"round(round(w * {b}) / CAST(available_tokens AS DOUBLE), 4) AS epochs "
        "FROM a JOIN w ON a.source = w.source"
    )


@query(
    "q_mix_plan",
    oracle=_mix_plan_oracle(),
    doc=(
        "Pretraining mixture plan: per-source available tokens from ONE "
        "source-keyed aggregate vs literal target weights and a token "
        "budget — sampling rate (capped 1) and effective epochs per "
        "source; the planning table before q_mix_weighted moves data, "
        "where over-epoching a scarce source becomes visible first."
    ),
    tags=("pipeline", "sampling", "stats"),
)
def q_mix_plan(spark, sf_dir):
    return mixture_plan(
        T(spark, sf_dir, "documents"), _MIX_PLAN_WEIGHTS, _MIX_PLAN_BUDGET
    )


# ---------------------------------------------------------------------------
# Weight-of-evidence / information value — per-bucket predictive power
# of a categorical feature against a binary target ("how much does
# source membership tell you about being English?"). The feature-
# selection scorecard primitive: WoE is the log-odds shift per bucket,
# IV the divergence-weighted total; buckets with |WoE| near 0 carry no
# signal and can be merged.
# ---------------------------------------------------------------------------


def woe_iv(
    df: DataFrame, bucket_col: str, target_pred
) -> DataFrame:
    """(bucket, n_good, n_bad, woe, iv_term) per bucket of
    ``bucket_col``, target defined by the boolean ``target_pred``;
    rounded to 6. Laplace-smoothed (+0.5 per cell, +0.5*k on each
    total) so empty cells yield finite WoE instead of ln(0).

    Scale design: ONE bucket-keyed count aggregate over the data
    (map-side partials; exchange bounded by bucket cardinality) + one
    1-row smoothed-totals broadcast; WoE/IV are derived arithmetic on
    the bucket-bounded table. Counts stay exact integers until the
    final per-bucket division.
    """
    cells = df.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count_if(target_pred).alias("n_good"),
        F.count_if(~target_pred).alias("n_bad"),
    )
    tot = cells.agg(
        F.sum("n_good").alias("gt"),
        F.sum("n_bad").alias("bt"),
        F.count(F.lit(1)).alias("k"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    pg = (F.col("n_good") + 0.5) / (F.col("gt") + 0.5 * F.col("k"))
    pb = (F.col("n_bad") + 0.5) / (F.col("bt") + 0.5 * F.col("k"))
    woe = F.log(pg / pb)
    return j.select(
        "bucket",
        "n_good",
        "n_bad",
        F.round(woe, 6).alias("woe"),
        F.round((pg - pb) * woe, 6).alias("iv_term"),
    )


@query(
    "q_woe_iv",
    oracle=(
        "WITH c AS (SELECT source AS bucket, "
        "count(*) FILTER (lang = 'en') AS n_good, "
        "count(*) FILTER (lang <> 'en') AS n_bad FROM documents "
        "GROUP BY 1), "
        "t AS (SELECT sum(n_good) AS gt, sum(n_bad) AS bt, "
        "count(*) AS k FROM c) "
        "SELECT bucket, CAST(n_good AS BIGINT) AS n_good, "
        "CAST(n_bad AS BIGINT) AS n_bad, "
        "round(ln(((n_good + 0.5) / (gt + 0.5 * k)) "
        "/ ((n_bad + 0.5) / (bt + 0.5 * k))), 6) AS woe, "
        "round((((n_good + 0.5) / (gt + 0.5 * k)) "
        "- ((n_bad + 0.5) / (bt + 0.5 * k))) "
        "* ln(((n_good + 0.5) / (gt + 0.5 * k)) "
        "/ ((n_bad + 0.5) / (bt + 0.5 * k))), 6) AS iv_term "
        "FROM c CROSS JOIN t"
    ),
    doc=(
        "Weight-of-evidence / information-value scorecard of source "
        "predicting English: one bucket-keyed count exchange + a 1-row "
        "smoothed-totals broadcast, WoE/IV derived on the bucket-"
        "bounded table (Laplace +0.5 keeps empty cells finite) — the "
        "categorical feature-selection audit."
    ),
    tags=("pipeline", "stats", "eval"),
)
def q_woe_iv(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return woe_iv(d, "source", F.col("lang") == "en")


# ---------------------------------------------------------------------------
# Curriculum ordering — assign every document a difficulty bucket (by
# exact length quintile) and a within-bucket position; the curriculum
# schedule is the (position, bucket) interleave, feeding the trainer
# one round of each difficulty tier at a time instead of all-easy-
# then-all-hard. The deterministic ordering face of the splits family
# (q_split_assign hashes, q_temporal_split cuts time, this RANKS).
# ---------------------------------------------------------------------------


def curriculum_order(
    df: DataFrame,
    difficulty_col: str = "n_chars",
    id_col: str = "doc_id",
    n_buckets: int = 5,
) -> DataFrame:
    """(doc_id, bucket, pos): difficulty bucket by exact quantile cuts
    and 1-based position within the bucket (ordered by difficulty,
    id-tie-broken). Consuming rows sorted by (pos, bucket) yields the
    round-robin curriculum.

    Scale design: bucket assignment is the equidepth_histogram shape —
    ONE exact-percentile aggregate broadcasts the interior cuts, the
    bucket is a map-side array scan (no global ntile window, which
    would single-partition the corpus). Within-bucket positions come
    from a row_number window partitioned by bucket: parallelism =
    n_buckets, the honest cost of a total order per tier — at 100 TB
    swap in repartitionByRange + per-partition offsets (one count
    aggregate) for the same positions without the k-partition ceiling.
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(
        F.percentile(F.col(difficulty_col), F.array(*[F.lit(f) for f in fracs])).alias(
            "cuts"
        )
    )
    b = df.crossJoin(F.broadcast(cuts)).select(
        F.col(id_col).alias("doc_id"),
        F.col(difficulty_col).alias("__d"),
        F.size(
            F.filter(F.col("cuts"), lambda c: F.col(difficulty_col) > c)
        ).cast("int").alias("bucket"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket").orderBy(F.col("__d").asc(), F.col("doc_id").asc())
    return b.select(
        "doc_id", "bucket", F.row_number().over(w).alias("pos")
    )


@query(
    "q_curriculum_order",
    oracle=(
        "WITH c AS (SELECT quantile_cont(n_chars, [0.2, 0.4, 0.6, 0.8]) "
        "AS cuts FROM documents), "
        "b AS (SELECT doc_id, n_chars, "
        "CAST(len(list_filter(cuts, x -> n_chars > x)) AS INT) AS bucket "
        "FROM documents CROSS JOIN c) "
        "SELECT doc_id, bucket, CAST(row_number() OVER (PARTITION BY bucket "
        "ORDER BY n_chars, doc_id) AS INT) AS pos FROM b"
    ),
    doc=(
        "Curriculum schedule: exact length-quintile difficulty buckets "
        "(one percentile broadcast + map-side cut scan — no global "
        "ntile window) and within-bucket rank; sorting by (pos, bucket) "
        "interleaves one round of each tier — the difficulty-ordered "
        "counterpart of hash and temporal splits."
    ),
    tags=("pipeline", "window", "llm-pipeline"),
)
def q_curriculum_order(spark, sf_dir):
    return curriculum_order(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Uniform negative sampling — k deterministic random negatives per
# document for contrastive/ranking training: slot j's negative is the
# document at dense index md5(doc_id # j) mod N. The engine-portable
# md5 convention (q_sample_hash) makes every pick reproducible on any
# engine; the dual of q_hard_negatives' similarity-mined negatives.
# ---------------------------------------------------------------------------


def negative_sample(
    df: DataFrame, id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(doc_id, slot, neg_id) — ``k`` uniform negatives per document,
    drawn by md5 slot hash over the dense doc index; a self-draw
    deterministically advances one position (so negatives never equal
    the anchor).

    Scale design: the dense index is a row_number over the id order —
    at fixture scale one sorted run; at 100 TB swap in
    repartitionByRange + per-partition offsets (one count aggregate,
    the q_curriculum_order note) for the same index without the
    single-partition ceiling. Draws are a pure map fan-out (k structs
    per row), resolved by ONE index-keyed shuffle join back to the
    indexed table. Exchange = k x N join rows — linear in output, no
    pair blowup.
    """
    from pyspark.sql.window import Window

    ids = df.select(F.col(id_col).alias("doc_id"))
    n = ids.agg(F.count(F.lit(1)).alias("n_total"))
    w = Window.orderBy("doc_id")
    indexed = ids.withColumn("idx", F.row_number().over(w) - 1)
    draws = indexed.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "idx",
        "n_total",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("slot"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.col("doc_id"), F.col("slot"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    pick = F.pmod(h, F.col("n_total"))
    # self-draw advances one ring position
    pick = F.when(
        pick == F.col("idx"), F.pmod(pick + 1, F.col("n_total"))
    ).otherwise(pick)
    probes = draws.select("doc_id", "slot", pick.alias("pidx"))
    neg = indexed.select(
        F.col("idx").alias("pidx"), F.col("doc_id").alias("neg_id")
    )
    return probes.join(neg, "pidx").select("doc_id", "slot", "neg_id")


@query(
    "q_negative_sample",
    oracle=(
        "WITH ids AS (SELECT doc_id, "
        "CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx "
        "FROM documents), "
        "n AS (SELECT count(*) AS n_total FROM ids), "
        "d AS (SELECT doc_id, idx, n_total, u.slot FROM ids CROSS JOIN n "
        "CROSS JOIN unnest([0, 1, 2]) AS u(slot)), "
        "p AS (SELECT doc_id, slot, "
        "CASE WHEN ('0x' || substring(md5(doc_id || '#' || slot), 1, 15))"
        "::BIGINT % n_total = idx "
        "THEN (('0x' || substring(md5(doc_id || '#' || slot), 1, 15))"
        "::BIGINT % n_total + 1) % n_total "
        "ELSE ('0x' || substring(md5(doc_id || '#' || slot), 1, 15))"
        "::BIGINT % n_total END AS pidx FROM d) "
        "SELECT p.doc_id, CAST(p.slot AS INT) AS slot, i.doc_id AS neg_id "
        "FROM p JOIN ids i ON i.idx = p.pidx"
    ),
    doc=(
        "Deterministic uniform negative sampling (3 per doc) over the "
        "md5 hash of (doc, slot) mod the dense doc index — pure map "
        "fan-out + ONE index-keyed join back; self-draws advance one "
        "ring position; the uniform dual of q_hard_negatives."
    ),
    tags=("pipeline", "llm-pipeline"),
)
def q_negative_sample(spark, sf_dir):
    return negative_sample(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Population stability index — THE industry drift monitor for a scored
# population: decile the reference window, measure how the comparison
# window's mass redistributes across those fixed bins. Complements
# q_js_divergence (token distributions) and q_corpus_drift (content)
# with the standard scorecard-monitoring statistic; PSI > 0.2 is the
# canonical "retrain" alarm.
# ---------------------------------------------------------------------------


def psi_drift(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """(bucket, n_a, n_b, p_a, p_b, psi_term) per decile bucket of the
    FIRST-half distribution, comparing first vs second time half;
    rounded to 6. Laplace +0.5 per cell keeps empty bins finite. Total
    PSI = sum(psi_term).

    Scale design: one 1-row min/max broadcast splits time exactly in
    half; decile cuts are ONE exact-percentile aggregate over the
    reference half broadcast back (the equidepth_histogram shape);
    bucket assignment is a map-side array scan and the only other
    exchange is the n_bins-bounded count aggregate. Counts stay exact
    integers until the final per-bin division.
    """
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    span = df.agg(
        F.min(us(ts_col)).alias("mn"), F.max(us(ts_col)).alias("mx")
    )
    # exact integer-microsecond midpoint (2*t < mn+mx avoids any
    # fractional-seconds asymmetry between engines)
    v = df.crossJoin(F.broadcast(span)).select(
        F.col(value_col).alias("v"),
        (2 * us(ts_col) < F.col("mn") + F.col("mx")).cast("int").alias("is_a"),
    )
    fracs = [i / n_bins for i in range(1, n_bins)]
    cuts = v.filter(F.col("is_a") == 1).agg(
        F.percentile(F.col("v"), F.array(*[F.lit(f) for f in fracs])).alias(
            "cuts"
        )
    )
    b = v.crossJoin(F.broadcast(cuts)).select(
        F.size(F.filter(F.col("cuts"), lambda c: F.col("v") > c))
        .cast("int")
        .alias("bucket"),
        "is_a",
    )
    cells = b.groupBy("bucket").agg(
        F.count_if(F.col("is_a") == 1).alias("n_a"),
        F.count_if(F.col("is_a") == 0).alias("n_b"),
    )
    tot = cells.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"),
        F.count(F.lit(1)).alias("k"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    pa = (F.col("n_a") + 0.5) / (F.col("ta") + 0.5 * F.col("k"))
    pb = (F.col("n_b") + 0.5) / (F.col("tb") + 0.5 * F.col("k"))
    return j.select(
        "bucket",
        "n_a",
        "n_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )


@query(
    "q_psi",
    oracle=(
        "WITH span AS (SELECT epoch_us(min(ts)) AS mn, "
        "epoch_us(max(ts)) AS mx FROM events), "
        "v AS (SELECT value AS v, CASE WHEN 2 * epoch_us(ts) < mn + mx "
        "THEN 1 ELSE 0 END AS is_a FROM events CROSS JOIN span), "
        "c AS (SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, "
        "0.7, 0.8, 0.9]) AS cuts FROM v WHERE is_a = 1), "
        "b AS (SELECT CAST(len(list_filter(cuts, x -> v > x)) AS INT) "
        "AS bucket, is_a FROM v CROSS JOIN c), "
        "cells AS (SELECT bucket, count(*) FILTER (is_a = 1) AS n_a, "
        "count(*) FILTER (is_a = 0) AS n_b FROM b GROUP BY 1), "
        "t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS k "
        "FROM cells) "
        "SELECT bucket, CAST(n_a AS BIGINT) AS n_a, "
        "CAST(n_b AS BIGINT) AS n_b, "
        "round((n_a + 0.5) / (ta + 0.5 * k), 6) AS p_a, "
        "round((n_b + 0.5) / (tb + 0.5 * k), 6) AS p_b, "
        "round(((n_a + 0.5) / (ta + 0.5 * k) - (n_b + 0.5) "
        "/ (tb + 0.5 * k)) * ln(((n_a + 0.5) / (ta + 0.5 * k)) "
        "/ ((n_b + 0.5) / (tb + 0.5 * k))), 6) AS psi_term "
        "FROM cells CROSS JOIN t"
    ),
    doc=(
        "Population stability index of events.value between the first "
        "and second time halves over reference-half deciles: one 1-row "
        "time-split broadcast, ONE exact-percentile cut broadcast, "
        "map-side bucket scan, n_bins-bounded count aggregate — the "
        "scorecard drift alarm (PSI > 0.2 = retrain) next to JS-div "
        "and corpus-drift."
    ),
    tags=("pipeline", "stats", "eval"),
)
def q_psi(spark, sf_dir):
    return psi_drift(T(spark, sf_dir, "events"), "value", "ts")


# ---------------------------------------------------------------------------
# Group k-fold assignment — cross-validation folds that keep every
# document of a SOURCE in the same fold: when duplicates and style
# cluster by origin, row-hash folds leak near-dup content across the
# train/eval boundary (exactly what q_split_leakage measures);
# group-aware folds prevent it by construction. The third member of
# the split family: hash rows (q_split_assign), cut time
# (q_temporal_split), hash GROUPS (this).
# ---------------------------------------------------------------------------


def group_kfold(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str = "n_chars",
    k: int = 5,
) -> DataFrame:
    """(fold, n_groups, n_docs, doc_frac, weight_frac) per fold; fold =
    md5(group) mod k, so every group lands wholly in one fold on any
    engine. Fractions rounded to 6.

    Scale design: the fold is a map-side md5 of the GROUP key (no
    group table, no join — the assignment rides the row); the report
    is one k-bounded aggregate + a 1-row totals broadcast. Exact
    integer doc/weight counts until the final division.
    """
    fold = F.pmod(
        F.conv(F.substring(F.md5(F.col(group_col)), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(k),
    ).cast("int")
    cells = (
        df.select(
            fold.alias("fold"),
            F.col(group_col).alias("g"),
            F.col(weight_col).alias("w"),
        )
        .groupBy("fold")
        .agg(
            F.count_distinct("g").alias("n_groups"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").alias("wsum"),
        )
    )
    tot = cells.agg(
        F.sum("n_docs").alias("td"), F.sum("wsum").alias("tw")
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "fold",
        "n_groups",
        "n_docs",
        F.round(F.col("n_docs") / F.col("td"), 6).alias("doc_frac"),
        F.round(F.col("wsum") / F.col("tw"), 6).alias("weight_frac"),
    )


@query(
    "q_group_kfold",
    oracle=(
        "WITH c AS (SELECT CAST(('0x' || substring(md5(source), 1, 8))"
        "::BIGINT % 5 AS INT) AS fold, source AS g, n_chars AS w "
        "FROM documents), "
        "cells AS (SELECT fold, count(DISTINCT g) AS n_groups, "
        "count(*) AS n_docs, sum(w) AS wsum FROM c GROUP BY 1), "
        "t AS (SELECT sum(n_docs) AS td, sum(wsum) AS tw FROM cells) "
        "SELECT fold, CAST(n_groups AS BIGINT) AS n_groups, "
        "CAST(n_docs AS BIGINT) AS n_docs, "
        "round(CAST(n_docs AS DOUBLE) / td, 6) AS doc_frac, "
        "round(CAST(wsum AS DOUBLE) / tw, 6) AS weight_frac "
        "FROM cells CROSS JOIN t"
    ),
    doc=(
        "Group-aware k-fold assignment (every source wholly in one "
        "fold — the leakage-safe split when near-dups cluster by "
        "origin): map-side md5 of the GROUP key, one k-bounded "
        "aggregate + 1-row totals broadcast; completes the split "
        "family with hash-rows and cut-time."
    ),
    tags=("pipeline", "eval", "llm-pipeline"),
)
def q_group_kfold(spark, sf_dir):
    return group_kfold(T(spark, sf_dir, "documents"))
