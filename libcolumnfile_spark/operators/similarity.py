"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k as one Catalyst expression
(zip_with + aggregate — JVM-side, codegen'd, no UDF). Scale path:
random-hyperplane LSH bucketing so only same-bucket candidates are
scored, plus a pairwise all-near-neighbors variant.

Scale design (100 TB / billions of vectors):
- brute-force top-k plans as TakeOrderedAndProject: each partition keeps
  a k-heap, the driver merges P*k rows — no global sort, no shuffle of
  scores.
- LSH: bucket key is computed map-side from lit() hyperplanes (broadcast
  by closure, ~dims*n_planes*8 bytes); the only shuffle groups by bucket.
- pairwise join: bucketed self-join shuffles on the bucket key; within-
  bucket products are bounded by bucket size (tune n_planes for density).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from libcolumnfile_spark.queries import pin, query, T
from libcolumnfile_spark.tables import spread as _spread


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def deterministic_query_vector(dim: int, seed: int = 7) -> list[float]:
    """Seeded pseudo-random unit-ish query vector (no RNG state; same
    splitmix64 walk as dedup._hash_params so tests and oracle agree).
    """
    vals = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(dim):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        vals.append(((z >> 11) / float(1 << 53)) * 2.0 - 1.0)  # [-1, 1)
    return vals


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    Plans as TakeOrderedAndProject (per-partition k-heap); the id tiebreak
    makes boundary ties deterministic for correctness checks.
    """
    q = _lit_vec(query_vec)
    scored = _spread(df).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    return [deterministic_query_vector(dim, seed=seed * 1000 + p) for p in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (SRP) LSH bucket id: one sign bit per plane.

    Cross-engine determinism: dot() casts every element to double BEFORE
    multiply-accumulate, the same arithmetic as the oracle's
    CAST(embedding AS DOUBLE[]) + list_inner_product — so the sign test
    (hence bucket membership) agrees exactly between engines.
    """
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        bit = F.when(dot(vec, _lit_vec(plane)) >= 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's SRP bucket.

    At billions of vectors the bucket predicate prunes ~(1 - 2^-planes) of
    the corpus before any scoring; recall is tuned by n_planes (fewer
    planes = bigger buckets = higher recall, more compute).
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    # query bucket computed driver-side with the same arithmetic
    qb = 0
    for i, plane in enumerate(planes):
        d = sum(q * p for q, p in zip(query_vec, plane))
        qb |= (1 if d >= 0 else 0) << i
    q = _lit_vec(query_vec)
    candidates = df.filter(lsh_bucket(F.col(vec_col), planes) == F.lit(qb))
    return (
        candidates.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def adaptive_n_planes(
    n_vectors: int,
    target_pairs: int = 500_000,
    lo: int = 4,
    hi: int = 24,
) -> int:
    """Plane count sized so expected candidate pairs ~ n^2 / 2^planes
    stays near ``target_pairs``: n_planes = ceil(log2(n^2 / target)).

    This removes the quadratic-by-configuration failure mode of a FIXED
    plane count (the x100 probe measured 62 s at n_planes=6 / 200k
    vectors vs 3.6 s at n_planes=10): the bucket count now grows with
    the corpus, keeping per-bucket products bounded. Pair it with
    probes=1 (1-bit multi-probe) so the extra planes do not cost recall
    — a cos-similar pair straddling one hyperplane is still found.
    """
    import math

    if n_vectors < 2:
        return lo
    need = math.ceil(math.log2(max(1.0, float(n_vectors) * n_vectors / target_pairs)))
    return min(hi, max(lo, need))


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int | None = 4,
    seed: int = 13,
    probes: int = 0,
    kernel_min_pairs: int = 200_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP-bucketed self-join.

    ``n_planes=None`` self-tunes the plane count from the measured
    vector count (see adaptive_n_planes) — the scale-safe default;
    explicit values remain for oracle-pinned queries whose SQL replicates
    a fixed bucketing.

    probes=0: only same-bucket pairs are scored (cosine-similar vectors
    collide with high probability under SRP); the join shuffles on the
    bucket key.

    probes=1 is the SCALE configuration — multi-probe SRP: one side of
    the join explodes each vector to its own bucket plus all n_planes
    one-bit-flip neighbor buckets; the other side keeps its exact
    bucket. A pair is found iff their buckets differ in <= 1 sign bit,
    which recovers exactly the near-misses SRP loses as n_planes grows
    (a cos-similar pair straddling ONE hyperplane). The asymmetry means
    every qualifying pair matches exactly once (the probe side's key set
    contains at most one of the other side's bucket), so no distinct
    pass is needed. Cost model: candidate pairs ~ (n_planes+1) * n^2 /
    2^n_planes — raising n_planes by 2 quarters the quadratic term while
    probing keeps recall, vs probes=0 where shrinking buckets loses
    pairs. At 2^n_planes buckets the within-bucket product is the
    scale knob; this decouples it from recall.
    """
    from libcolumnfile_spark.tables import input_keyed_memo

    # probe actions memoized per (plan, input files): over immutable
    # fixtures the dim and cardinality never change, so repeat
    # invocations skip two jobs
    dim_probe = input_keyed_memo(
        df, "srp-dim", lambda: df.select(F.size(vec_col).alias("d")).first()
    )
    if n_planes is None:
        # one metadata-cheap count sizes the bucket space; multi-probe
        # keeps recall while the planes scale with the corpus
        n_planes = adaptive_n_planes(
            input_keyed_memo(df, "srp-count", df.count)
        )
        probes = 1
    planes = _hyperplanes(int(dim_probe["d"]), n_planes, seed)
    # Unit-normalize map-side: pair scoring then needs ONE dot product
    # instead of dot + two norms — the aggregate runs once per PAIR
    # (O(bucket^2)), the normalize once per VECTOR (O(n)). Measured 4x
    # on the sf0.1 self-join.
    # explicit double casts: float-precision squaring would diverge from
    # the (double-throughout) oracle arithmetic in the last ulps
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    # zero vectors stay zero (cos_sim 0 to everything), matching the
    # guarded cosine() semantics
    unit = F.when(norm > 0, F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)).otherwise(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * 0.0)
    )
    if n_planes >= 6:
        # Adaptive/scale region: the HOF bucket expression interprets
        # n_planes x dim lambda calls per vector (measured 8.9 s for 17
        # planes x 200k vectors, vs 2.4 s for one Arrow numpy kernel).
        # The kernel accumulates norm and every plane dot DIM-
        # SEQUENTIALLY (acc += M[:,d]*p[d]) — the exact HOF fold order —
        # so units and sign bits are bit-identical to the lsh_bucket
        # path (same argument as the IVF assign kernel; oracle parity
        # re-verified with the kernel forced on the fixed-plane
        # queries). Threshold >= 6: r10 A/B at sf0.1 (2k vectors,
        # interleaved fresh-JVM medians) measured the kernel FASTER at
        # 6+ planes — q_dedup_embedding 2.09 -> 1.52 s, q_sim_pairs
        # 0.91 -> 0.83, q_sim_pairs_probe 1.10 -> 0.95 — the per-vector
        # interpreted-HOF cost (norm + n_planes dots) overtakes the
        # Python round trip there; 4-plane queries keep the HOF path
        # (an earlier 4-plane A/B measured the kernel slower, 0.59 ->
        # 0.72 s: fewer dots to amortize).
        P = np.array(planes, dtype=np.float64)

        @F.pandas_udf("struct<bucket:bigint, v:array<double>>")
        def _prep(e: pd.Series) -> pd.DataFrame:
            if len(e) == 0:
                return pd.DataFrame({"bucket": [], "v": []})
            M = np.array(list(e), dtype=np.float64)
            nacc = np.zeros(len(M))
            for d in range(M.shape[1]):
                nacc += M[:, d] * M[:, d]
            nrm = np.sqrt(nacc)
            safe = np.where(nrm > 0, nrm, 1.0)
            U = M / safe[:, None]
            U[nrm == 0] = 0.0
            bucket = np.zeros(len(M), dtype=np.int64)
            for i in range(P.shape[0]):
                dacc = np.zeros(len(M))
                for d in range(M.shape[1]):
                    dacc += M[:, d] * P[i, d]
                bucket |= (dacc >= 0).astype(np.int64) << i
            return pd.DataFrame({"bucket": bucket, "v": list(U)})

        bucketed = (
            _spread(df)
            .select(F.col(id_col).alias("id"), _prep(F.col(vec_col)).alias("p"))
            .select("id", F.col("p.v").alias("v"), F.col("p.bucket").alias("bucket"))
        )
    else:
        bucketed = _spread(df).select(
            F.col(id_col).alias("id"),
            unit.alias("v"),
            lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        )
    # normalization + n_planes dot products feed both sides of the
    # self-join; persist so each vector is processed once, not twice
    # (count() force-fills the cache before the self-join scans twice)
    bucketed = pin(bucketed)
    n_vectors = bucketed.count()
    # Two physical strategies for the same logical pairs, picked by the
    # expected bucket size (n / 2^planes) — the count above is free (it
    # force-fills the cache anyway):
    # - small buckets: bucket-key self-join; per-pair dot is a codegen'd
    #   HOF aggregate. Wins while pair counts are modest (the join
    #   machinery is cheap, Python round-trips are not).
    # - large buckets: ONE applyInPandas kernel per bucket computing the
    #   blocked pair matrix. The per-pair interpreted-HOF cost makes the
    #   join path superlinear (measured at 20k vectors / 312-per-bucket:
    #   join 10.1 s vs kernel 2.3 s, and the kernel is near-FLAT from 2k
    #   to 20k vectors) — this is the 100 TB path.
    # The kernel accumulates the pair matrix DIM-SEQUENTIALLY
    # (S += col_d outer col_d), the exact left-to-right add order of the
    # HOF aggregate and the oracle's list_inner_product — bit-identical
    # dots, so both strategies produce oracle-equal round(6) output.
    # Rounding + the exact threshold cut stay in Spark (the kernel
    # pre-filters with a 1e-6 margin: round(6) moves a value < 5e-7, so
    # nothing that could round up to the threshold is lost). Row-blocks
    # of 1024 bound kernel memory to 1024 x bucket_size doubles.
    # switch on estimated CANDIDATE PAIRS (n^2 / buckets), not bucket
    # size: kernel overhead is per-group/per-vector, join cost is
    # per-pair — measured at 200k vectors / 4096 buckets (48 per bucket,
    # 9.8M pairs) the join path takes 27.8 s where the kernel runs in
    # ~4 s, while at 62k pairs (sf0.1) the join wins.
    use_kernel = probes == 0 and (
        n_vectors * (n_vectors / float(1 << n_planes)) >= kernel_min_pairs
    )
    if use_kernel:
        out_schema = "id_a long, id_b long, raw_dot double"
        margin = float(threshold) - 1e-6

        def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            k = len(pdf)
            if k < 2:
                return pd.DataFrame({"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64), "raw_dot": np.empty(0, np.float64)})
            pdf = pdf.sort_values("id")
            ids = pdf["id"].to_numpy()
            V = np.vstack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
            dim = V.shape[1]
            ia, ib, dots = [], [], []
            for s in range(0, k - 1, 1024):
                rows = V[s : s + 1024]
                nb = rows.shape[0]
                S = np.zeros((nb, k), dtype=np.float64)
                for d in range(dim):
                    S += rows[:, d : d + 1] * V[None, :, d][0]
                # upper triangle only: global row index < column index
                ri, ci = np.nonzero(S >= margin)
                keep = (ri + s) < ci
                ia.append(ids[ri[keep] + s])
                ib.append(ids[ci[keep]])
                dots.append(S[ri[keep], ci[keep]])
            return pd.DataFrame(
                {
                    "id_a": np.concatenate(ia) if ia else np.empty(0, np.int64),
                    "id_b": np.concatenate(ib) if ib else np.empty(0, np.int64),
                    "raw_dot": np.concatenate(dots) if dots else np.empty(0, np.float64),
                }
            )

        return (
            bucketed.groupBy("bucket")
            .applyInPandas(score_bucket, out_schema)
            .select(
                "id_a",
                "id_b",
                F.round(F.col("raw_dot"), 6).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )
    elif probes == 0:
        a = bucketed.alias("a")
        b = bucketed.alias("b")
        cond = (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    else:
        if probes != 1:
            raise ValueError("probes must be 0 or 1 (1-bit multi-probe)")
        probe_keys = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        probe_factor = n_planes + 1
        if probe_factor * n_vectors * (n_vectors / float(1 << n_planes)) >= kernel_min_pairs:
            # SCALE path (x100 probe evidence): the explode-join
            # materializes every candidate pair as a ROW carrying two
            # double vectors before the per-pair dot (measured 21.5 s at
            # 200k vectors / 11.5M output pairs). Instead: one shuffle by
            # probe key + a streaming kernel that per key-group (1) finds
            # candidates with a float32 GEMM (margin slack covers the
            # cast error), (2) exact-rescores ONLY the candidates with
            # the dim-sequential float64 accumulation — the HOF fold
            # order, so output is bit-identical to the join path — and
            # (3) emits finished (id_a, id_b, raw_dot) rows. No pair-
            # scale shuffle or rescore join exists anywhere. A pair
            # (bucket xor <= 1 bit) appears in every common probe-key
            # group; emitting only at key == min(bucket_a, bucket_b)
            # dedups exactly.
            #
            # Kernel dispatch is mapInPandas over key-sorted partitions,
            # NOT groupBy().applyInPandas: the adaptive regime makes
            # probe groups TINY (200k vectors / 17 planes -> 2^17 keys,
            # ~27 rows per group), so per-group Python dispatch dominated
            # the r4->r5 x100 drift (one UDF call + pandas frame per
            # group, ~131k calls). One call per ~10k-row Arrow batch with
            # in-kernel group splitting (np.diff boundaries; the last,
            # possibly batch-straddling group carries over to the next
            # batch) measured 9-17 s -> 4.4-5.6 s at x100, identical
            # output. Same exchange count: groupBy's hash partition +
            # in-partition sort is exactly repartition + sortWithin.
            emit = bucketed.select(
                "id", "v", "bucket", F.explode(probe_keys).alias("key")
            )
            # float32 unit-dot error is ~1e-5 at dim<=1024; 1e-3 slack,
            # and round(6) sits well inside it
            margin32 = float(threshold) - 1e-3

            def _score_groups(pdf: pd.DataFrame):
                keys = pdf["key"].to_numpy()
                ids = pdf["id"].to_numpy()
                buckets = pdf["bucket"].to_numpy()
                V = np.array(list(pdf["v"]), dtype=np.float64)
                V32 = V.astype(np.float32)
                bounds = np.flatnonzero(np.diff(keys)) + 1
                starts = np.concatenate(([0], bounds))
                ends = np.concatenate((bounds, [len(keys)]))
                out_a, out_b, out_d = [], [], []
                for g in range(len(starts)):
                    s, e = int(starts[g]), int(ends[g])
                    k = e - s
                    if k < 2:
                        continue
                    S = V32[s:e] @ V32[s:e].T
                    iu, ju = np.triu_indices(k, 1)
                    keep = S[iu, ju] >= margin32
                    iu, ju = iu[keep], ju[keep]
                    if not len(iu):
                        continue
                    b = buckets[s:e]
                    xor = b[iu] ^ b[ju]
                    one_bit = (xor & (xor - 1)) == 0  # 0 or a power of 2
                    at_min = np.minimum(b[iu], b[ju]) == keys[s]
                    iu, ju = iu[one_bit & at_min], ju[one_bit & at_min]
                    if not len(iu):
                        continue
                    A, B = V[s:e][iu], V[s:e][ju]
                    acc = np.zeros(len(iu))
                    for d in range(V.shape[1]):
                        acc += A[:, d] * B[:, d]
                    gi = ids[s:e]
                    out_a.append(np.minimum(gi[iu], gi[ju]))
                    out_b.append(np.maximum(gi[iu], gi[ju]))
                    out_d.append(acc)
                if not out_a:
                    return None
                return pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "raw_dot": np.concatenate(out_d),
                    }
                )

            def score_stream(batches):
                carry = None
                for pdf in batches:
                    if carry is not None and len(carry):
                        pdf = pd.concat([carry, pdf], ignore_index=True)
                    if not len(pdf):
                        continue
                    keys = pdf["key"].to_numpy()
                    # hold back the final key's rows — the group may
                    # continue in the next Arrow batch of this partition
                    cut = int(np.searchsorted(keys, keys[-1], side="left"))
                    carry = pdf.iloc[cut:]
                    body = pdf.iloc[:cut]
                    if len(body):
                        r = _score_groups(body)
                        if r is not None:
                            yield r
                if carry is not None and len(carry):
                    r = _score_groups(carry)
                    if r is not None:
                        yield r

            return (
                emit.repartition(F.col("key"))
                .sortWithinPartitions("key")
                .mapInPandas(score_stream, "id_a long, id_b long, raw_dot double")
                .select(
                    "id_a", "id_b", F.round(F.col("raw_dot"), 6).alias("cos_sim")
                )
                .filter(F.col("cos_sim") >= threshold)
            )
        a = bucketed.select(
            F.col("id"), F.col("v"), F.explode(probe_keys).alias("key")
        ).alias("a")
        b = bucketed.alias("b")
        cond = (F.col("a.key") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    # Pair scoring: the HOF aggregate dot is interpreted per element
    # (~us/pair) — fine for the oracle-SF pair counts, superlinear pain
    # at scale. Past the same measured pair threshold the kernel path
    # uses, score pairs with ONE Arrow-batched numpy kernel instead:
    # dim-sequential accumulation (acc += A[:,d]*B[:,d]) reproduces the
    # HOF fold order exactly, so both paths emit bit-identical dots and
    # the round(6)/threshold cut matches the oracle either way.
    # (x100 probe, 200k vectors, adaptive planes: 22.4 s HOF -> kernel
    # measured below 10 s.)
    probe_factor = (n_planes + 1) if probes else 1
    est_pairs = probe_factor * n_vectors * (n_vectors / float(1 << n_planes))
    if est_pairs >= kernel_min_pairs:

        @F.pandas_udf("double")
        def _pair_dot(va: pd.Series, vb: pd.Series) -> pd.Series:
            if len(va) == 0:
                return pd.Series([], dtype="float64")
            A = np.array(list(va), dtype=np.float64)
            B = np.array(list(vb), dtype=np.float64)
            acc = np.zeros(len(va))
            for d in range(A.shape[1]):
                acc += A[:, d] * B[:, d]
            return pd.Series(acc)

        score = F.round(_pair_dot(F.col("a.v"), F.col("b.v")), 6)
    else:
        score = F.round(dot(F.col("a.v"), F.col("b.v")), 6)
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            score.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# Declared queries
# ---------------------------------------------------------------------------

_QUERY_DIM = 64  # embeddings fixture dimension (FIXTURES.md T10)
_QUERY_VEC = deterministic_query_vector(_QUERY_DIM, seed=7)


def _duckdb_query_vec_sql() -> str:
    return "[" + ", ".join(f"{v!r}" for v in _QUERY_VEC) + "]::DOUBLE[]"


@query(
    "q_sim_topk",
    # DuckDB computes the same double-precision cosine; round(6) + id
    # tie-break makes the comparison stable.
    oracle=(
        "SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
        f"{_duckdb_query_vec_sql()}), 6) AS cos_sim "
        "FROM embeddings ORDER BY cos_sim DESC, vec_id LIMIT 10"
    ),
    doc="Brute-force cosine top-10 against a fixed seeded query vector.",
    tags=("similarity",),
)
def q_sim_topk(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _QUERY_VEC, k=10)


def _duckdb_vec(vec: list[float]) -> str:
    return "[" + ", ".join(f"{v!r}" for v in vec) + "]::DOUBLE[]"


def _duckdb_bucket_expr(planes: list[list[float]], vec_expr: str) -> str:
    """SRP bucket id in DuckDB SQL: bit i set iff dot(v, plane_i) >= 0 —
    the same sign test lsh_bucket computes. A sign could only disagree
    between engines if a dot product sits within float-accumulation
    noise (~1e-13) of zero; with seeded dense planes that never happens
    in the fixtures (verified value-hash-equal).
    """
    bits = [
        f"(CASE WHEN list_inner_product({vec_expr}, {_duckdb_vec(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(bits) + ")"


def _lsh_oracle() -> str:
    planes = _hyperplanes(_QUERY_DIM, 4, 13)
    qb = 0
    for i, plane in enumerate(planes):
        if sum(q * p for q, p in zip(_QUERY_VEC, plane)) >= 0:
            qb |= 1 << i
    bucket = _duckdb_bucket_expr(planes, "CAST(embedding AS DOUBLE[])")
    return (
        "SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
        f"{_duckdb_query_vec_sql()}), 6) AS cos_sim "
        f"FROM embeddings WHERE {bucket} = {qb} "
        "ORDER BY cos_sim DESC, vec_id LIMIT 10"
    )


@query(
    "q_sim_lsh",
    # The SRP bucket predicate is deterministic arithmetic, so even the
    # "approximate" path oracle-checks exactly: DuckDB reproduces the
    # bucket membership AND the cosine scores.
    oracle=_lsh_oracle(),
    doc="SRP-LSH-pruned cosine top-10 (the at-scale ANN path).",
    tags=("similarity", "lsh"),
)
def q_sim_lsh(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return lsh_topk(emb, _QUERY_VEC, k=10)


def _sim_pairs_oracle() -> str:
    # Mirrors cosine_near_pairs' exact FP path — normalize each vector
    # (double), THEN dot the unit vectors — not list_cosine_similarity,
    # which computes dot/(|a||b|) and differs in the last ulp (measured:
    # one sf0.01 pair rounds differently at 6 decimals).
    planes = _hyperplanes(_QUERY_DIM, 6, 13)
    bucket = _duckdb_bucket_expr(planes, "v")
    return (
        "WITH u AS (SELECT vec_id, "
        "CASE WHEN sqrt(list_inner_product(v, v)) > 0 "
        "  THEN list_transform(v, x -> x / sqrt(list_inner_product(v, v))) "
        "  ELSE list_transform(v, x -> x * 0.0) END AS uv, "
        f"{bucket} AS bkt "
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)) "
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "round(list_inner_product(a.uv, b.uv), 6) AS cos_sim "
        "FROM u a JOIN u b ON a.bkt = b.bkt AND a.vec_id < b.vec_id "
        "WHERE round(list_inner_product(a.uv, b.uv), 6) >= 0.2"
    )


@query(
    "q_sim_pairs",
    # Same-bucket pairs + exact cosine are both deterministic, so the
    # embedding near-dup operator value-hash-checks end to end (the
    # Spark side normalizes then dots; round(6) absorbs the last-ulp
    # difference vs DuckDB's direct cosine).
    oracle=_sim_pairs_oracle(),
    doc="Embedding near-duplicate pairs via SRP-bucketed self-join.",
    tags=("similarity", "dedup"),
)
def q_sim_pairs(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    # 6 planes = 64 buckets: ~n^2/128 candidate pairs — the knob that keeps
    # the self-join quadratic term in check as the corpus grows
    return cosine_near_pairs(emb, threshold=0.2, n_planes=6)


def _sim_pairs_probe_oracle() -> str:
    # Multi-probe candidate rule in SQL: buckets differing in <= 1 sign
    # bit (bit_count(xor(...)) <= 1) — exactly the pairs the 1-bit probe
    # explosion reaches. Same unit-normalize-then-dot FP path as
    # _sim_pairs_oracle.
    planes = _hyperplanes(_QUERY_DIM, 8, 13)
    bucket = _duckdb_bucket_expr(planes, "v")
    return (
        "WITH u AS (SELECT vec_id, "
        "CASE WHEN sqrt(list_inner_product(v, v)) > 0 "
        "  THEN list_transform(v, x -> x / sqrt(list_inner_product(v, v))) "
        "  ELSE list_transform(v, x -> x * 0.0) END AS uv, "
        f"{bucket} AS bkt "
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)) "
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "round(list_inner_product(a.uv, b.uv), 6) AS cos_sim "
        "FROM u a JOIN u b ON a.vec_id < b.vec_id "
        "  AND bit_count(xor(a.bkt, b.bkt)) <= 1 "
        "WHERE round(list_inner_product(a.uv, b.uv), 6) >= 0.2"
    )


@query(
    "q_sim_pairs_probe",
    oracle=_sim_pairs_probe_oracle(),
    doc=(
        "Embedding near-dup pairs via MULTI-PROBE SRP (8 planes = 256 "
        "buckets, 1-bit probes): the scale configuration — 4x smaller "
        "within-bucket quadratic term than q_sim_pairs' 64 buckets, with "
        "probing recovering the recall shrinking buckets would lose."
    ),
    tags=("similarity", "dedup", "lsh"),
)
def q_sim_pairs_probe(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return cosine_near_pairs(emb, threshold=0.2, n_planes=8, probes=1)


def _sim_pairs_auto_oracle(
    target_pairs: int = 500_000, lo: int = 4, hi: int = 24
) -> str:
    """FULL oracle for the self-tuned SRP configuration — closes the
    round-5 rows-only gap. The trick that makes static SQL replicate a
    count-dependent bucketing: plane i is generated independently of the
    total plane count (_hyperplanes seeds per index), so the adaptive
    n-plane bucket EQUALS the full hi-plane bucket masked to its low n
    bits. The oracle builds the 24-plane bucket once, derives n_planes
    from count(*) with the same ceil(log2(n^2/target)) clamp as
    adaptive_n_planes, and applies the 1-bit multi-probe rule
    (bit_count(xor) <= 1) on the MASKED buckets."""
    planes = _hyperplanes(_QUERY_DIM, hi, 13)
    bucket = _duckdb_bucket_expr(planes, "v")
    return (
        "WITH np AS (SELECT least(" + str(hi) + ", greatest(" + str(lo) + ", "
        f"CAST(ceil(log2(greatest(1.0, (c * c) / {target_pairs}.0))) AS INT))) AS p "
        "FROM (SELECT CAST(count(*) AS DOUBLE) AS c FROM embeddings)), "
        "m AS (SELECT ((CAST(1 AS BIGINT) << p) - 1) AS mask FROM np), "
        "u AS (SELECT vec_id, "
        "CASE WHEN sqrt(list_inner_product(v, v)) > 0 "
        "  THEN list_transform(v, x -> x / sqrt(list_inner_product(v, v))) "
        "  ELSE list_transform(v, x -> x * 0.0) END AS uv, "
        f"{bucket} AS fb "
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)) "
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "round(list_inner_product(a.uv, b.uv), 6) AS cos_sim "
        "FROM u a JOIN u b ON a.vec_id < b.vec_id "
        "  AND bit_count(xor(a.fb & (SELECT mask FROM m), "
        "                    b.fb & (SELECT mask FROM m))) <= 1 "
        "WHERE round(list_inner_product(a.uv, b.uv), 6) >= 0.2"
    )


@query(
    "q_sim_pairs_auto",
    # FULL oracle (round-5 item 8): the auto-sizing is a deterministic
    # function of count(*), replicated in SQL via the masked-full-bucket
    # identity (see _sim_pairs_auto_oracle). The recall contract vs the
    # fixed-plane configs stays pinned by
    # tests/test_operators.py::test_adaptive_near_pairs_recall_vs_fixed,
    # and the scale behavior by the x100 probe (BASELINE.md).
    oracle=_sim_pairs_auto_oracle(),
    doc=(
        "Embedding near-dup pairs with SELF-TUNED SRP: n_planes = "
        "ceil(log2(n^2/target)) from the measured vector count + 1-bit "
        "multi-probe, so candidate pairs stay ~constant-bounded as the "
        "corpus grows — the configuration that removes the fixed-plane "
        "quadratic at 100 TB (x100 probe: 200k vectors)."
    ),
    tags=("similarity", "dedup", "lsh"),
)
def q_sim_pairs_auto(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return cosine_near_pairs(emb, threshold=0.2, n_planes=None)


def _dedup_embedding_oracle(threshold: float) -> str:
    # Same unit-vector / SRP-bucket arithmetic as _sim_pairs_oracle, then
    # transitive closure by recursive-CTE fixpoint (exact at oracle SF).
    planes = _hyperplanes(_QUERY_DIM, 6, 13)
    bucket = _duckdb_bucket_expr(planes, "v")
    return (
        "WITH RECURSIVE u AS (SELECT vec_id, "
        "CASE WHEN sqrt(list_inner_product(v, v)) > 0 "
        "  THEN list_transform(v, x -> x / sqrt(list_inner_product(v, v))) "
        "  ELSE list_transform(v, x -> x * 0.0) END AS uv, "
        f"{bucket} AS bkt "
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)), "
        "e AS (SELECT a.vec_id AS src, b.vec_id AS dst "
        "FROM u a JOIN u b ON a.bkt = b.bkt AND a.vec_id < b.vec_id "
        f"WHERE round(list_inner_product(a.uv, b.uv), 6) >= {threshold}), "
        "se AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e), "
        "cc(id, comp) AS (SELECT vec_id, vec_id FROM embeddings "
        "UNION SELECT se.dst, cc.comp FROM cc JOIN se ON se.src = cc.id) "
        "SELECT id AS vec_id, min(comp) AS comp FROM cc GROUP BY id"
    )


@query(
    "q_dedup_embedding",
    oracle=_dedup_embedding_oracle(0.3),
    doc=(
        "Embedding-cosine near-duplicate CLUSTERING: SRP-bucketed "
        "cosine pairs (cosine_near_pairs) fed into alternating-star "
        "connected components (operators.pipeline.connected_components) "
        "— pairwise similarity evidence turned into keep-one-per-cluster "
        "labels, the semantic-dedup step of a training-data pipeline. "
        "Scale: edges are O(same-bucket near pairs), CC rounds are "
        "O(log^2 n) shuffles over compact (id, id) pairs."
    ),
    tags=("dedup", "similarity", "iterative"),
    adaptive=True,  # SRP bucket sizes + per-round CC edge sets are
    # data-dependent; forcing AQE off on micro inputs measured +0.32 s
)
def q_dedup_embedding(spark, sf_dir):
    from libcolumnfile_spark.operators.pipeline import connected_components

    emb = T(spark, sf_dir, "embeddings")
    pairs = cosine_near_pairs(emb, threshold=0.3, n_planes=6)
    cc = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        nodes=emb.select("vec_id"),
    )
    return cc.select(F.col("id").alias("vec_id"), "comp")


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbor
# ---------------------------------------------------------------------------


def ivf_build(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    n_iters: int = 2,
    seed: int = 29,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index: k-means coarse quantizer (deterministic seeded
    init + ``n_iters`` Lloyd steps, all DataFrame ops) and the assignment
    of every vector to its nearest centroid list.

    Returns (assigned_df with a ``__list`` column, centroids).

    Scale design: centroids are tiny (n_lists × dim doubles) and always
    broadcast; each Lloyd step is one map (argmin over broadcast
    centroids) + one groupBy(n_lists) — shuffle volume O(n_lists × dim),
    not O(rows). The final assignment is map-only. At 100 TB this is the
    standard IVF training loop (train on a sample, assign everything);
    here the sample is the corpus.
    """
    import numpy as np

    # deterministic init: n_lists vectors picked by hash order (a seeded
    # sample that's stable across partitionings)
    sample = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.pmod(F.xxhash64(F.col("id") + F.lit(seed)), F.lit(1 << 31)))
        .limit(n_lists)
        .collect()
    )
    centroids = [list(map(float, r["v"])) for r in sample]

    def nearest(vc, cents):
        # Arrow-batched numpy argmin over the broadcast centroid matrix
        # (closure-captured: n_lists x dim doubles). A pure-Catalyst CASE
        # chain over n_lists HOF distances re-evaluates each distance per
        # reference (measured 13.8s vs 0.9s for the whole query at
        # sf0.1) — the same interpreted-HOF trap as the simhash vote.
        from pyspark.sql.types import IntegerType

        C = np.asarray(cents, dtype=np.float64)  # (n_lists, dim)

        @F.pandas_udf(IntegerType())
        def argmin_list(vcol: pd.Series) -> pd.Series:
            V = np.stack([np.asarray(v, dtype=np.float64) for v in vcol])
            # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; ||v||^2 constant per row
            d = -2.0 * (V @ C.T) + (C * C).sum(axis=1)[None, :]
            return pd.Series(d.argmin(axis=1).astype("int32"))

        return argmin_list(vc)

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    for _ in range(n_iters):
        assigned = base.withColumn("__list", nearest(F.col("v"), centroids))
        means = (
            assigned.groupBy("__list")
            .agg(
                F.array(*[F.avg(F.col("v").getItem(i)) for i in range(len(centroids[0]))]).alias("c"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = list(centroids)
        for r in means:
            new[r["__list"]] = [float(x) for x in r["c"]]
        centroids = new
    assigned = base.withColumn("__list", nearest(F.col("v"), centroids))
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 29,
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose coarse-quantizer
    list is among the query's ``n_probe`` nearest centroids.

    The probe-list predicate prunes ~(1 - n_probe/n_lists) of the corpus
    before any scoring (same contract as lsh_topk; recall tuned by
    n_probe). Candidate scoring + top-k is the brute-force path on the
    surviving fraction — TakeOrderedAndProject, no global sort.
    """
    import numpy as np

    assigned, centroids = ivf_build(df, vec_col, id_col, n_lists=n_lists, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    order = sorted(
        range(len(centroids)),
        key=lambda i: float(((np.asarray(centroids[i]) - q) ** 2).sum()),
    )
    probes = order[:n_probe]
    qc = _lit_vec(query_vec)
    return (
        assigned.filter(F.col("__list").isin(probes))
        .select(F.col("id").alias(id_col), F.round(cosine(F.col("v"), qc), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


@query(
    "q_sim_ivf",
    oracle=None,  # approximate (probe-list-pruned); recall checked in unit tests
    doc=(
        "IVF-pruned cosine top-10: k-means coarse quantizer (broadcast "
        "centroids, O(n_lists x dim) shuffle per Lloyd step), then "
        "brute-force scoring over only the n_probe nearest lists — the "
        "inverted-file ANN scale path alongside SRP-LSH (q_sim_lsh). "
        "The index (assignments + centroids) is built once per corpus "
        "and cached, as in real ANN serving — queries pay only the "
        "probe-filtered scoring."
    ),
    tags=("similarity", "ivf"),
)
def q_sim_ivf(spark, sf_dir):
    import hashlib

    from libcolumnfile_spark.cache import cache_has, cache_path

    n_lists, n_probe, seed = 16, 4, 29
    key = hashlib.sha1(f"{sf_dir}|{n_lists}|{seed}".encode()).hexdigest()[:12]
    # Index persistence is ALL through the DataFrame layer (two parquet
    # tables under SPARK_GRAFT_CACHE_DIR: per-vector list assignments +
    # the n_lists centroid rows), so the cache lives on any
    # Spark-readable path — no driver-local files, exactly how a real
    # ANN deployment shares one index across sessions/executors.
    assigned_path = cache_path("ivfcache", key, "assigned")
    cent_path = cache_path("ivfcache", key, "centroids")
    if not cache_has("ivfcache", key, "centroids", "_SUCCESS"):
        emb = T(spark, sf_dir, "embeddings")
        assigned, centroids = ivf_build(emb, n_lists=n_lists, seed=seed)
        assigned.write.mode("overwrite").parquet(assigned_path)
        cdf = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "list_id INT, centroid ARRAY<DOUBLE>",
        )
        cdf.coalesce(1).write.mode("overwrite").parquet(cent_path)
    centroids_rows = spark.read.parquet(cent_path).orderBy("list_id").collect()
    centroids = [list(r.centroid) for r in centroids_rows]  # n_lists rows: driver-sized
    assigned = spark.read.parquet(assigned_path)
    q = np.asarray(_QUERY_VEC, dtype=np.float64)
    order = sorted(
        range(len(centroids)),
        key=lambda i: float(((np.asarray(centroids[i]) - q) ** 2).sum()),
    )
    probes = order[:n_probe]
    qc = _lit_vec(_QUERY_VEC)
    return (
        assigned.filter(F.col("__list").isin(probes))
        .select(F.col("id").alias("vec_id"), F.round(cosine(F.col("v"), qc), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Batch k-NN join: top-k neighbors for EVERY query vector in one pass
# (vs brute_force_topk's single query vector).
# ---------------------------------------------------------------------------


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt_buckets: int = 16,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Exact batch cosine k-NN join: for each query vector, its top-k
    corpus neighbors. Output (q_id, c_id, cos_sim, rn).

    Scale design: the query side is broadcast (a query batch is small
    next to a corpus — the asymmetric regime kNN joins run in), so
    scoring is map-side over corpus partitions with NO corpus shuffle.
    The top-k selection is TWO-PHASE to dodge the q_id-window skew trap
    (a single window over q_id funnels the whole scored set through
    n_queries reducers): phase 1 takes top-k within (q_id, salt) —
    corpus-hash salt, so ~salt_buckets * k rows survive per query —
    phase 2 re-ranks those survivors per q_id. Any global top-k row is
    top-k within its salt bucket, so the two-phase result is exact.

    With ``planes`` set, scoring is restricted to SRP same-bucket
    (query, corpus) pairs — the ANN regime: the broadcast join keys on
    the bucket id, so only ~2^-n_planes of the corpus is scored per
    query and the top-k is approximate with recall governed by
    n_planes. Same plan shape (broadcast + map-side + two-phase top-k);
    the bucket predicate just moves from "always true" to a join key.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("__cv")
    )
    if planes is None:
        cand = c.crossJoin(F.broadcast(q))
    else:
        qb = q.withColumn("__bkt", lsh_bucket(F.col("__qv"), planes))
        cb = c.withColumn("__bkt", lsh_bucket(F.col("__cv"), planes))
        cand = cb.join(F.broadcast(qb), "__bkt")
    scored = cand.select(
        "q_id",
        "c_id",
        F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cos_sim"),
    )
    return _two_phase_topk(scored, k, salt_buckets)


def _two_phase_topk(scored: DataFrame, k: int, salt_buckets: int = 16) -> DataFrame:
    """Exact per-query top-k over (q_id, c_id, cos_sim) rows without the
    q_id-window skew funnel: phase 1 takes top-k within (q_id,
    corpus-hash salt) so ~salt_buckets * k rows survive per query, phase
    2 re-ranks the survivors per q_id. Any global top-k row is top-k
    within its salt bucket, so the result is exact."""
    from pyspark.sql import Window

    w1 = Window.partitionBy("q_id", F.pmod(F.col("c_id"), F.lit(salt_buckets))).orderBy(
        F.desc("cos_sim"), F.asc("c_id")
    )
    survivors = scored.withColumn("__rn1", F.row_number().over(w1)).filter(
        F.col("__rn1") <= k
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        survivors.withColumn("rn", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "cos_sim", "rn")
    )


_KNN_ORACLE = (
    "WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv "
    "FROM embeddings WHERE vec_id < 8), "
    "c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv "
    "FROM embeddings WHERE vec_id >= 8), "
    "s AS (SELECT q_id, c_id, "
    "round(list_cosine_similarity(cv, qv), 6) AS cos_sim FROM c CROSS JOIN q), "
    "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id "
    "ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rn FROM s) "
    "SELECT q_id, c_id, cos_sim, rn FROM r WHERE rn <= 5"
)


@query(
    "q_sim_knn",
    oracle=_KNN_ORACLE,
    doc=(
        "Batch cosine k-NN join (8 query vectors x corpus): broadcast "
        "query side, map-side scoring, exact two-phase salted top-k per "
        "query (no q_id-window skew funnel)."
    ),
    tags=("similarity",),
)
def q_sim_knn(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return knn_join(
        emb.filter(F.col("vec_id") < 8),
        _spread(emb.filter(F.col("vec_id") >= 8)),
        k=5,
    )


_PROJ_DIM = 8
_PROJ_SEED = 11


def random_projection(
    df: DataFrame,
    out_dim: int = _PROJ_DIM,
    seed: int = _PROJ_SEED,
    dim: int = _QUERY_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: reduce embeddings to
    ``out_dim`` components against a SEEDED dense projection matrix
    (rows scaled by 1/sqrt(out_dim), the JL normalization) — the
    standard cheap pre-reduce before clustering/ANN when the full
    dimension is overkill. Emitted in exploded (id, j, comp) form: the
    component values are scalar doubles, so the cross-engine value
    check applies its float normalization (array cells would compare
    by repr).

    Pure map + row-local posexplode: the projection matrix is
    out_dim x dim LITERALS baked into the plan (seeded, reproducible
    anywhere — the md5-uniform family's vector analog), so 100 TB of
    embeddings project with zero shuffles and zero Python.
    """
    planes = [
        deterministic_query_vector(dim, seed=seed * 1000 + j)
        for j in range(out_dim)
    ]
    scale = 1.0 / math.sqrt(float(out_dim))
    comps = F.array(
        *[
            F.round(dot(F.col(vec_col), _lit_vec(p)) * F.lit(scale), 6)
            for p in planes
        ]
    )
    return _spread(df).select(
        F.col(id_col), F.posexplode(comps).alias("j", "comp")
    )


def _projection_oracle(
    out_dim: int = _PROJ_DIM, seed: int = _PROJ_SEED, dim: int = _QUERY_DIM
) -> str:
    scale = 1.0 / math.sqrt(float(out_dim))
    branches = []
    for j in range(out_dim):
        p = deterministic_query_vector(dim, seed=seed * 1000 + j)
        branches.append(
            f"SELECT vec_id, {j} AS j, "
            f"round(list_inner_product(CAST(embedding AS DOUBLE[]), "
            f"{_duckdb_vec(p)}) * {scale!r}, 6) AS comp FROM embeddings"
        )
    return " UNION ALL ".join(branches)


@query(
    "q_embedding_project",
    oracle=_projection_oracle(),
    doc=(
        "Johnson-Lindenstrauss random projection 64 -> 8 dims against a "
        "seeded literal matrix (1/sqrt(k) scaling): the cheap "
        "dimensionality pre-reduce of an embedding pipeline. Pure map + "
        "row-local explode, zero shuffles, zero Python."
    ),
    tags=("similarity", "pipeline"),
)
def q_embedding_project(spark, sf_dir):
    return random_projection(T(spark, sf_dir, "embeddings"))


_RECALL_K = 10
_RECALL_PLANES = 3  # coarse buckets: ~1/8 of the corpus scored per query


def ann_recall(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = _RECALL_K,
    n_planes: int = _RECALL_PLANES,
    seed: int = 13,
    dim: int = _QUERY_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall@k of the SRP-LSH ANN retrieval against exact
    brute force — the index-quality monitoring step every production
    ANN deployment runs (a quantizer drifts as the corpus distribution
    shifts; recall is the dial that says when to add probes or rebuild).

    Output: (q_id, n_exact, n_approx, n_hit, recall) where recall =
    |approx top-k ∩ exact top-k| / |exact top-k|. A query whose bucket
    holds no corpus vectors scores n_approx = 0, recall = 0 — silent
    dead buckets are precisely what this surfaces.

    Scale shape: both arms are knn_join's broadcast + map-side +
    two-phase-salted top-k (the approximate arm just keys the broadcast
    join on the bucket id), and every aggregate below them is over
    n_queries x k rows — bounded by construction.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    # ONE scored pass feeds both eval arms: the exact arm scores every
    # (query, corpus) pair anyway, and the approximate arm's candidate
    # set (same SRP bucket) is a SUBSET of those pairs — so compute
    # cos_sim once per pair, carry bucket equality as a flag, and derive
    # the approx arm by filtering. Halves the corpus scans/cosine
    # kernels and drops one broadcast vs running knn_join twice; the
    # pinned pair frame is (q_id, c_id, cos_sim, flag) — n_queries
    # skinny rows per corpus row, released at the next query invocation.
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("__cv"))
    qb = q.withColumn("__qbkt", lsh_bucket(F.col("__qv"), planes))
    cb = c.withColumn("__cbkt", lsh_bucket(F.col("__cv"), planes))
    scored = pin(
        cb.crossJoin(F.broadcast(qb)).select(
            "q_id",
            "c_id",
            F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cos_sim"),
            (F.col("__cbkt") == F.col("__qbkt")).alias("__same_bkt"),
        )
    )
    exact = _two_phase_topk(scored, k)
    approx = _two_phase_topk(scored.filter(F.col("__same_bkt")), k)
    # fused eval tail: flag-join the two bounded top-k sets (n_queries x
    # k rows each) and aggregate once per q_id — was 3 q_id aggregates +
    # a semi join + 2 left joins. Every query with a non-empty corpus
    # has exact top-k rows, so grouping the full outer join by q_id
    # covers exactly the oracle's n_exact key set.
    e = exact.select("q_id", "c_id", F.lit(1).alias("is_e"))
    a = approx.select("q_id", "c_id", F.lit(1).alias("is_a"))
    both = e.join(a, ["q_id", "c_id"], "full_outer").select(
        "q_id",
        F.coalesce("is_e", F.lit(0)).alias("is_e"),
        F.coalesce("is_a", F.lit(0)).alias("is_a"),
    )
    return (
        both.groupBy("q_id")
        .agg(
            F.sum("is_e").cast("bigint").alias("n_exact"),
            F.sum("is_a").cast("bigint").alias("n_approx"),
            F.sum(F.col("is_e") * F.col("is_a")).cast("bigint").alias("n_hit"),
        )
        .select(
            "q_id",
            "n_exact",
            "n_approx",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 6).alias("recall"),
        )
    )


def _ann_recall_oracle(
    k: int = _RECALL_K, n_planes: int = _RECALL_PLANES, seed: int = 13
) -> str:
    planes = _hyperplanes(_QUERY_DIM, n_planes, seed)
    bq = _duckdb_bucket_expr(planes, "qv")
    bc = _duckdb_bucket_expr(planes, "cv")
    return (
        "WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv "
        "FROM embeddings WHERE vec_id < 8), "
        "c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv "
        "FROM embeddings WHERE vec_id >= 8), "
        f"bq AS (SELECT q_id, qv, {bq} AS bkt FROM q), "
        f"bc AS (SELECT c_id, cv, {bc} AS bkt FROM c), "
        "s AS (SELECT q_id, c_id, round(list_cosine_similarity(cv, qv), 6) "
        "AS cos_sim FROM c CROSS JOIN q), "
        "e AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER ("
        "PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rn FROM s) "
        f"WHERE rn <= {k}), "
        "sa AS (SELECT bq.q_id, bc.c_id, "
        "round(list_cosine_similarity(bc.cv, bq.qv), 6) AS cos_sim "
        "FROM bc JOIN bq ON bc.bkt = bq.bkt), "
        "a AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER ("
        "PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rn FROM sa) "
        f"WHERE rn <= {k}), "
        "ne AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact FROM e GROUP BY q_id), "
        "na AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_approx FROM a GROUP BY q_id), "
        "nh AS (SELECT e.q_id, CAST(count(*) AS BIGINT) AS n_hit FROM e "
        "JOIN a ON e.q_id = a.q_id AND e.c_id = a.c_id GROUP BY e.q_id) "
        "SELECT ne.q_id, n_exact, COALESCE(n_approx, 0) AS n_approx, "
        "COALESCE(n_hit, 0) AS n_hit, "
        "round(CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_exact, 6) AS recall "
        "FROM ne LEFT JOIN na ON ne.q_id = na.q_id "
        "LEFT JOIN nh ON ne.q_id = nh.q_id"
    )


@query(
    "q_ann_recall",
    oracle=_ann_recall_oracle(),
    doc=(
        "ANN index-quality eval: per-query recall@10 of SRP-LSH "
        "(3-plane bucket join) against exact brute-force cosine over "
        "the same 8-query batch — both arms are broadcast + map-side + "
        "two-phase salted top-k; every downstream aggregate is bounded "
        "by n_queries x k."
    ),
    tags=("similarity", "lsh"),
)
def q_ann_recall(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return ann_recall(
        emb.filter(F.col("vec_id") < 8),
        _spread(emb.filter(F.col("vec_id") >= 8)),
    )


# ---------------------------------------------------------------------------
# Oracle-verified IVF mechanism: SEEDED (fixed) centroids, so assignment,
# list probing and candidate scoring are all plain double arithmetic a
# SQL oracle can replicate — the cross-engine twin of q_sim_ivf, which
# keeps the k-means-trained quantizer (iterative Lloyd steps are not
# SQL-expressible; its quality is unit-tested instead).
# ---------------------------------------------------------------------------

_IVF_V_LISTS = 16
_IVF_V_PROBE = 4
_IVF_V_SEED = 31


def _ivf_seeded_centroids(dim: int, n_lists: int = _IVF_V_LISTS) -> list[list[float]]:
    return [
        deterministic_query_vector(dim, seed=_IVF_V_SEED * 1000 + c)
        for c in range(n_lists)
    ]


def seeded_assign_udf(cents: list[list[float]]):
    """Arrow-batched argmax-by-dot list assignment over FIXED centroids
    (the seeded coarse quantizer shared by ivf_seeded_topk and
    semdedup). One numpy kernel, not n_lists Catalyst HOF dot columns:
    the lambda HOFs are interpreted per element (n_lists x dim x N rows
    of ~1 us lambda calls made the HOF form the slowest bench query at
    3.2 s warm for 2 k vectors). The kernel accumulates dim-sequentially
    (acc += M[:,i]*c_i), the exact fold order of F.aggregate's
    ((0+t1)+t2)+..., with float64 products — bit-identical dots, so the
    argmax (strict >, first-max-wins like the oracle's CASE) picks
    identical lists to the SQL oracle's greatest()/CASE chain."""
    import numpy as np

    cents_arr = [np.asarray(c, dtype=np.float64) for c in cents]

    def _assign_block(M: "np.ndarray") -> "np.ndarray":
        n = M.shape[0]
        best_d = np.full(n, -np.inf)
        best_c = np.zeros(n, dtype=np.int32)
        for c, cent in enumerate(cents_arr):
            acc = np.zeros(n)
            for i in range(M.shape[1]):
                acc += M[:, i] * cent[i]
            better = acc > best_d
            best_d = np.where(better, acc, best_d)
            best_c = np.where(better, np.int32(c), best_c)
        return best_c

    @F.pandas_udf("int")
    def _assign_list(emb: pd.Series) -> pd.Series:
        # empty Arrow batches (AQE-coalesced empty partitions) and null
        # embeddings make np.array ragged/1-D and crash M.shape[1]
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        null_mask = emb.isna()
        if null_mask.any():
            out = np.full(len(emb), -1, dtype=np.int32)
            valid = emb[~null_mask]
            if len(valid):
                out[(~null_mask).to_numpy()] = _assign_block(
                    np.array(list(valid), dtype=np.float64)
                )
            return pd.Series(out)
        return pd.Series(_assign_block(np.array(list(emb), dtype=np.float64)))

    return _assign_list


def ivf_seeded_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF top-k with a fixed seeded coarse quantizer: every vector is
    assigned to the centroid with the LARGEST dot product (one
    Arrow-batched numpy argmax kernel, bit-identical to the HOF fold —
    see the in-body note), the query probes its best ``_IVF_V_PROBE``
    lists, and only vectors in probed lists are cosine-scored.

    Plan: assignment is map-only (centroids ride the closure); the probe
    filter prunes ~(1 - probe/lists) of the corpus before scoring; the
    final top-k is TakeOrderedAndProject. The probed-list selection uses
    the same dot arithmetic driver-side, so the oracle replicates every
    stage in SQL.
    """
    dim = len(query_vec)
    cents = _ivf_seeded_centroids(dim)
    # query-side probe list: same argmax-by-dot arithmetic, driver-side
    qd = [(sum(q * c for q, c in zip(query_vec, cent)), i) for i, cent in enumerate(cents)]
    probe = [i for _, i in sorted(qd, key=lambda t: (-t[0], t[1]))[:_IVF_V_PROBE]]
    # List assignment runs as ONE Arrow-batched numpy kernel, not 16
    # Catalyst HOF dot columns: the lambda HOFs are interpreted per
    # element (16 lists x 64 dims x N rows of ~1 us lambda calls made
    # this the slowest bench query at 3.2 s warm for 2 k vectors), and
    # the two static-expression rewrites both lost — per-column chains +
    # argmax CASE explode under CollapseProject into a codegen OOM, and
    # an array<struct(dot, -c)> + array_max form ran 3x SLOWER than the
    # HOFs. The kernel accumulates dim-sequentially (acc += M[:,i]*c_i),
    # the exact fold order of F.aggregate's ((0+t1)+t2)+..., with
    # float64 products — bit-identical dots, so the argmax (strict >,
    # first-max-wins like the oracle's CASE) picks identical lists.
    # Cosine scoring of the ~probe/lists survivors stays in Catalyst so
    # round() semantics keep matching the oracle.
    # asNondeterministic: the probe filter references the UDF column, and
    # Catalyst otherwise pushes a copy of the filter below the projection
    # and evaluates the kernel TWICE per row (guide §4.4's duplication
    # trap — observed as two ArrowEvalPython nodes). The function is
    # pure; the marker only forbids the optimizer from duplicating it.
    _assign_list = seeded_assign_udf(cents).asNondeterministic()

    q = _lit_vec(query_vec)
    return (
        df.withColumn("__list", _assign_list(F.col(vec_col)))
        .filter(F.col("__list").isin(probe))
        .select(
            F.col(id_col),
            F.col("__list").cast("int").alias("list_id"),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _ivf_seeded_oracle() -> str:
    cents = _ivf_seeded_centroids(_QUERY_DIM)
    qd = [
        (sum(q * c for q, c in zip(_QUERY_VEC, cent)), i)
        for i, cent in enumerate(cents)
    ]
    probe = [i for _, i in sorted(qd, key=lambda t: (-t[0], t[1]))[:_IVF_V_PROBE]]
    dots = ", ".join(
        f"list_inner_product(v, {_duckdb_vec(c)}) AS d{i}" for i, c in enumerate(cents)
    )
    best = "greatest(" + ", ".join(f"d{i}" for i in range(_IVF_V_LISTS)) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = {best} THEN {i}" for i in range(_IVF_V_LISTS - 1))
        + f" ELSE {_IVF_V_LISTS - 1} END"
    )
    return (
        f"WITH d AS (SELECT vec_id, v, {dots} FROM "
        "(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)), "
        f"a AS (SELECT vec_id, v, CAST({case} AS INT) AS list_id FROM d) "
        "SELECT vec_id, list_id, "
        f"round(list_cosine_similarity(v, {_duckdb_query_vec_sql()}), 6) AS cos_sim "
        f"FROM a WHERE list_id IN ({', '.join(map(str, probe))}) "
        "ORDER BY cos_sim DESC, vec_id LIMIT 10"
    )


@query(
    "q_sim_ivf_seeded",
    oracle=_ivf_seeded_oracle(),
    doc=(
        "Oracle-verified IVF mechanism: fixed seeded coarse quantizer, "
        "argmax-dot list assignment, 4-of-16 list probe, cosine top-10 "
        "— every stage replicated in the SQL oracle (the k-means-trained "
        "variant q_sim_ivf keeps its rows-only check)."
    ),
    tags=("similarity", "ivf"),
)
def q_sim_ivf_seeded(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return ivf_seeded_topk(_spread(emb), _QUERY_VEC, k=10)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication: coarse clustering bounds the
# quadratic pair search, then within each cluster every vector with an
# EARLIER near-duplicate (unit-dot cosine >= threshold) is dropped.
# The cluster step uses the same fixed seeded quantizer as
# q_sim_ivf_seeded, so the whole operator is plain double arithmetic a
# SQL oracle replicates end to end.
# ---------------------------------------------------------------------------


def semdedup(
    df: DataFrame,
    threshold: float = 0.2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int | None = _IVF_V_LISTS,
) -> DataFrame:
    """Semantic dedup over an embedding column (the SemDeDup recipe:
    cluster, then prune near-duplicates WITHIN clusters only). A vector
    is removed iff some SMALLER-id vector in its cluster has
    round(cos, 6) >= threshold; survivors return with their cluster id.

    Scale design: the cluster key bounds the self-join — candidate
    pairs are sum(cluster_size^2), never corpus^2, and the cluster
    count is the knob: ``n_lists=None`` self-tunes to ~sqrt(N) clusters
    from a memoized count so expected per-cluster pair work stays FLAT
    as the corpus grows (the q_sim_pairs_auto precedent; measured at
    x100 / 200k vectors: 11.1 s auto vs 31.7 s at the fixed 16); the
    explicit default 16 is the oracle-pinned fixture configuration. Unit-
    normalization is map-side (once per vector, so the per-pair work is
    ONE dot), the anti-join shuffles only (id, unit-vec, cluster) rows
    on the cluster key, and the dominance rule (earliest id wins) needs
    no iteration — unlike connected-components dedup
    (q_dedup_embedding), membership is decided by one join; the anti-
    join also short-circuits on the first dominator found. FP path
    matches the oracle bit-for-bit: normalize-then-dot with sequential
    fold order (the q_sim_pairs precedent), round(6) absorbing the
    last ulp.
    """
    from libcolumnfile_spark.tables import input_keyed_memo

    # probe dim on the NULL-FILTERED frame: size(NULL) is -1, so a null
    # first row would build zero centroids and crash the assign kernel
    base = df.filter(F.col(vec_col).isNotNull())
    dim_probe = input_keyed_memo(
        base, "srp-dim", lambda: base.select(F.size(vec_col).alias("d")).first()
    )
    if dim_probe is None:  # empty (or all-null) corpus: nothing to dedup
        return df.select(
            F.col(id_col), F.lit(None).cast("int").alias("list_id")
        ).limit(0)
    if n_lists is None:
        import math

        n = input_keyed_memo(base, "srp-count", base.count)
        n_lists = max(1, int(math.isqrt(int(n))))
    cents = _ivf_seeded_centroids(int(dim_probe["d"]), n_lists)
    assign = seeded_assign_udf(cents)

    # explicit double casts: float-precision squaring would diverge from
    # the (double-throughout) oracle arithmetic in the last ulps
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    unit = F.when(
        norm > 0, F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    ).otherwise(F.transform(F.col(vec_col), lambda x: x.cast("double") * 0.0))

    # null embeddings can't be deduplicated (and the assign kernel's -1
    # sentinel would diverge from the oracle's CASE fallback): drop them
    # explicitly so the operator's contract is null-free
    a = base.select(
        F.col(id_col).alias("id"),
        unit.alias("v"),
        assign(F.col(vec_col)).alias("list_id"),
    )
    # normalization + assignment feed both sides of the self-join;
    # persist so each vector is processed once, not twice
    a = pin(a)
    a.count()
    survivors = a.alias("x").join(
        a.alias("y"),
        (F.col("y.list_id") == F.col("x.list_id"))
        & (F.col("y.id") < F.col("x.id"))
        & (F.round(dot(F.col("x.v"), F.col("y.v")), 6) >= F.lit(float(threshold))),
        "left_anti",
    )
    return survivors.select(
        F.col("id").alias(id_col), F.col("list_id").cast("int").alias("list_id")
    )


def _semdedup_oracle(threshold: float = 0.2) -> str:
    cents = _ivf_seeded_centroids(_QUERY_DIM)
    dots = ", ".join(
        f"list_inner_product(v, {_duckdb_vec(c)}) AS d{i}" for i, c in enumerate(cents)
    )
    best = "greatest(" + ", ".join(f"d{i}" for i in range(_IVF_V_LISTS)) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = {best} THEN {i}" for i in range(_IVF_V_LISTS - 1))
        + f" ELSE {_IVF_V_LISTS - 1} END"
    )
    return (
        # embedding IS NOT NULL mirrors semdedup's explicit null drop
        # (the kernel's -1 sentinel vs this CASE's ELSE arm would
        # otherwise diverge on null rows)
        f"WITH d AS (SELECT vec_id, v, {dots} FROM "
        "(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings "
        "WHERE embedding IS NOT NULL)), "
        f"a AS (SELECT vec_id, CAST({case} AS INT) AS list_id, "
        "CASE WHEN sqrt(list_inner_product(v, v)) > 0 "
        "  THEN list_transform(v, x -> x / sqrt(list_inner_product(v, v))) "
        "  ELSE list_transform(v, x -> x * 0.0) END AS uv FROM d) "
        "SELECT x.vec_id, x.list_id FROM a x WHERE NOT EXISTS ("
        "SELECT 1 FROM a y WHERE y.list_id = x.list_id AND y.vec_id < x.vec_id "
        f"AND round(list_inner_product(x.uv, y.uv), 6) >= {threshold})"
    )


@query(
    "q_semdedup",
    oracle=_semdedup_oracle(),
    doc=(
        "SemDeDup-style semantic dedup: seeded coarse clustering bounds "
        "the pair search, earliest-id near-duplicate (unit-dot cosine "
        ">= 0.2 at round 6) wins within each cluster. Every stage — "
        "assignment, normalization, pair dot, dominance anti-join — is "
        "replicated in the SQL oracle."
    ),
    tags=("similarity", "dedup", "llm-pipeline"),
)
def q_semdedup(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return semdedup(_spread(emb), threshold=0.2)


# ---------------------------------------------------------------------------
# Scalar int8 quantization of embeddings — the storage/serving
# compression step next to PQ (operators/pq.py): 4x smaller vectors,
# reconstruction error reported per vector.
# ---------------------------------------------------------------------------


def quantize_int8_stats(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization audit: scale = amax/127,
    code_i = floor(x_i/scale + 0.5) (floor(+0.5) instead of round() —
    Spark's HALF_UP BigDecimal rounding and DuckDB's scaled-double
    round() disagree at exact .5; floor is bit-identical everywhere),
    reconstruction x'_i = code_i * scale. Emits (vec_id, scale,
    max_abs_err, rmse) — the audit table a 100 TB embedding store keeps
    next to its quantized shards.

    Scale: pure map over the vector column, no shuffle. The per-vector
    arithmetic runs as ONE Arrow-batched numpy kernel, not Catalyst
    HOFs — the ~5 interpreted lambda passes per vector made the HOF
    form 6x slower at x10 (the same interpreted-HOF trap as the IVF
    assign kernel). The kernel accumulates the error-square sum
    DIM-SEQUENTIALLY (acc += err[:,i]^2), the exact fold order of
    F.aggregate and DuckDB's list_sum; max/abs/floor/divide are
    IEEE-exact elementwise, so every emitted double is bit-identical
    to the HOF form and the SQL oracle. round(6) stays in Catalyst so
    Spark's HALF_UP rounding semantics keep matching the oracle."""

    @F.pandas_udf("struct<scale:double, mae:double, rmse:double>")
    def _quant_stats(emb: pd.Series) -> pd.DataFrame:
        # empty Arrow batches and null embeddings make np.array ragged
        # (same guard as seeded_assign_udf); null rows emit null stats
        if len(emb) == 0:
            return pd.DataFrame({"scale": [], "mae": [], "rmse": []})
        null_mask = emb.isna()
        if null_mask.any():
            out = pd.DataFrame(
                {"scale": [None] * len(emb), "mae": [None] * len(emb), "rmse": [None] * len(emb)},
                index=emb.index, dtype="float64",
            )
            valid = emb[~null_mask]
            if len(valid):
                out.loc[~null_mask] = _quant_block(
                    np.array(list(valid), dtype=np.float64)
                ).set_index(valid.index)
            return out
        return _quant_block(np.array(list(emb), dtype=np.float64))

    def _quant_block(M: "np.ndarray") -> pd.DataFrame:
        amax = np.abs(M).max(axis=1)
        scale = np.where(amax > 0, amax / 127.0, 1.0)
        err = M - np.floor(M / scale[:, None] + 0.5) * scale[:, None]
        acc = np.zeros(len(M))
        for i in range(M.shape[1]):
            acc += err[:, i] * err[:, i]
        return pd.DataFrame(
            {
                "scale": scale,
                "mae": np.abs(err).max(axis=1),
                "rmse": np.sqrt(acc / M.shape[1]),
            }
        )

    s = df.select(F.col(id_col), _quant_stats(F.col(vec_col)).alias("q"))
    return s.select(
        F.col(id_col),
        F.round(F.col("q.scale"), 6).alias("scale"),
        F.round(F.col("q.mae"), 6).alias("max_abs_err"),
        F.round(F.col("q.rmse"), 6).alias("rmse"),
    )


_QUANT_ORACLE = (
    # the v IS NULL arm mirrors the kernel's null-stats rows (without it
    # the CASE's ELSE would emit scale=1.0 where Spark emits NULL)
    "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
    "s AS (SELECT vec_id, v, "
    "CASE WHEN v IS NULL THEN NULL "
    "  WHEN list_max(list_transform(v, x -> abs(x))) > 0 "
    "  THEN list_max(list_transform(v, x -> abs(x))) / 127.0 ELSE 1.0 END AS scale FROM v), "
    "e AS (SELECT vec_id, scale, "
    "list_transform(v, x -> x - floor(x / scale + 0.5) * scale) AS err, len(v) AS d FROM s) "
    "SELECT vec_id, round(scale, 6) AS scale, "
    "round(list_max(list_transform(err, x -> abs(x))), 6) AS max_abs_err, "
    "round(sqrt(list_sum(list_transform(err, x -> x * x)) / d), 6) AS rmse FROM e"
)


@query(
    "q_quantize_int8",
    oracle=_QUANT_ORACLE,
    doc=(
        "Symmetric int8 scalar quantization audit over the embedding "
        "column: per-vector scale, max reconstruction error, RMSE — one "
        "Arrow-batched kernel (map-only, no shuffle), floor(+0.5) "
        "rounding so the SQL oracle reproduces every code bit-for-bit."
    ),
    tags=("similarity", "multimodal"),
)
def q_quantize_int8(spark, sf_dir):
    return quantize_int8_stats(_spread(T(spark, sf_dir, "embeddings")))


# ---------------------------------------------------------------------------
# Per-group embedding drift: how far each subcorpus' centroid sits from
# the corpus centroid (cosine). The distribution-shift monitor a
# training pipeline runs per language/domain/snapshot before mixing —
# a group whose centroid drifts is a group whose content changed.
# ---------------------------------------------------------------------------


def embedding_drift(
    emb: DataFrame,
    docs: DataFrame,
    group_col: str = "lang",
    vec_col: str = "embedding",
) -> DataFrame:
    """(group, n_vecs, cos_to_global): cosine between each group's mean
    embedding and the corpus mean embedding.

    Scale design: ONE exchange keyed (group, dim) with map-side partial
    sums — the only row-scale work; everything downstream is
    groups x dim rows (the global per-dim sums derive from the
    PER-GROUP sums, not a second corpus pass). The final cosine is a
    64-term aggregate per group. At 100 TB this is a scan plus bounded
    aggregates; nothing broadcast is row-scale.

    FP tolerance: double sums are fold-order-dependent across
    partitionings and engines; the oracle replicates the same two-level
    sum structure and round(6) on the final cosine absorbs the ~1e-15
    relative divergence (the q_decay_score tolerance argument).
    """
    e = (
        emb.filter(F.col(vec_col).isNotNull())
        .join(
            docs.select(F.col("doc_id").alias("vec_id"), F.col(group_col).alias("grp")),
            "vec_id",
        )
        .select(
            "grp", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        .select("grp", "pos", F.col("val").cast("double").alias("val"))
    )
    per = e.groupBy("grp", "pos").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
    )
    glob = per.groupBy("pos").agg(
        F.sum("s").alias("gs"), F.sum("n").alias("gn")
    )
    m = per.join(glob, "pos").select(
        "grp",
        "n",
        (F.col("s") / F.col("n")).alias("lm"),
        (F.col("gs") / F.col("gn")).alias("gm"),
    )
    return m.groupBy("grp").agg(
        F.max("n").alias("n_vecs"),
        F.round(
            F.sum(F.col("lm") * F.col("gm"))
            / (
                F.sqrt(F.sum(F.col("lm") * F.col("lm")))
                * F.sqrt(F.sum(F.col("gm") * F.col("gm")))
            ),
            6,
        ).alias("cos_to_global"),
    )


@query(
    "q_embedding_drift",
    oracle=(
        "WITH e AS (SELECT d.lang AS grp, CAST(em.embedding AS DOUBLE[]) AS v "
        "FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id "
        "WHERE em.embedding IS NOT NULL), "
        "x AS (SELECT grp, unnest(generate_series(1, len(v))) AS pos, v FROM e), "
        "p AS (SELECT grp, pos, sum(v[pos]) AS s, count(*) AS n "
        "FROM x GROUP BY 1, 2), "
        "g AS (SELECT pos, sum(s) AS gs, CAST(sum(n) AS BIGINT) AS gn "
        "FROM p GROUP BY 1), "
        "m AS (SELECT p.grp, p.n, p.s / p.n AS lm, g.gs / g.gn AS gm "
        "FROM p JOIN g ON p.pos = g.pos) "
        "SELECT grp, CAST(max(n) AS BIGINT) AS n_vecs, "
        "round(sum(lm * gm) / (sqrt(sum(lm * lm)) * sqrt(sum(gm * gm))), 6) "
        "AS cos_to_global FROM m GROUP BY grp"
    ),
    doc=(
        "Per-language embedding-centroid drift vs the corpus centroid "
        "(cosine): one (group, dim)-keyed exchange with map-side partial "
        "sums; global sums derived from group sums, no second corpus "
        "pass."
    ),
    tags=("similarity", "pipeline", "quality"),
)
def q_embedding_drift(spark, sf_dir):
    return embedding_drift(
        T(spark, sf_dir, "embeddings"), T(spark, sf_dir, "documents")
    )


# ---------------------------------------------------------------------------
# Seeded Lloyd update (one k-means training step): the missing TRAIN
# face of the IVF family — q_sim_ivf_seeded proves the assignment
# mechanism, this proves the centroid UPDATE that an IVF/PQ trainer
# iterates: assign every vector to its argmax-dot seeded centroid, then
# recompute each centroid as the member mean. Fixed seeded starting
# centroids make the whole step plain double arithmetic a SQL oracle
# replicates (the q_sim_ivf_seeded recipe); the production trainer
# loops this step, which changes iteration count, not the per-step plan.
# ---------------------------------------------------------------------------


def kmeans_step(
    df: DataFrame,
    n_lists: int = _IVF_V_LISTS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One Lloyd iteration from the fixed seeded centroids: returns
    (list_id, n, dim, centroid_val) — member count and the updated
    per-dimension centroid mean (rounded to 6) for every non-empty list.

    Scale design: assignment is the Arrow-batched argmax kernel
    (seeded_assign_udf — map-only, no shuffle), and the update is a
    (list_id, dim)-keyed aggregate whose map-side combine collapses the
    exploded N x dim stream to n_lists x dim partial rows per map task —
    the exchange is corpus-size-independent, same bytes as the former
    65-buffer wide list-keyed aggregate, but the narrow 2-buffer
    aggregate stays in codegen where the wide row ran interpreted
    (measured 1.76 -> ~1.1 s at sf0.1; fisher_separability precedent).
    """
    base = df.filter(F.col(vec_col).isNotNull())
    from libcolumnfile_spark.tables import input_keyed_memo

    dim_probe = input_keyed_memo(
        base, "srp-dim", lambda: base.select(F.size(vec_col).alias("d")).first()
    )
    if dim_probe is None:
        return base.select(
            F.lit(0).alias("list_id"),
            F.lit(0).cast("bigint").alias("n"),
            F.lit(0).alias("dim"),
            F.lit(0.0).alias("centroid_val"),
        ).limit(0)
    dim = int(dim_probe["d"])
    cents = _ivf_seeded_centroids(dim, n_lists)
    assign = seeded_assign_udf(cents)
    v = base.select(assign(F.col(vec_col)).alias("list_id"), F.col(vec_col).alias("v"))
    # posexplode-then-aggregate (the fisher_separability shape, and the
    # oracle's own): a (list_id, dim)-keyed partial aggregate with 2
    # narrow codegen'd buffers instead of a 65-slot wide row that ran
    # interpreted. The exchange stays k x dim partial rows per map task
    # (map-side combine collapses the exploded N x dim stream), so the
    # shuffled bytes are unchanged and corpus-size-independent; per
    # (list, dim) group the count IS the list's member count.
    pe = v.select(
        "list_id", F.posexplode(F.col("v")).alias("dim", "x")
    ).select(
        "list_id",
        F.col("dim").cast("int").alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    return (
        pe.groupBy("list_id", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .select(
            "list_id",
            "n",
            "dim",
            F.round(F.col("s") / F.col("n"), 6).alias("centroid_val"),
        )
    )


def _kmeans_step_oracle() -> str:
    cents = _ivf_seeded_centroids(_QUERY_DIM)
    dots = ", ".join(
        f"list_inner_product(v, {_duckdb_vec(c)}) AS d{i}" for i, c in enumerate(cents)
    )
    best = "greatest(" + ", ".join(f"d{i}" for i in range(_IVF_V_LISTS)) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = {best} THEN {i}" for i in range(_IVF_V_LISTS - 1))
        + f" ELSE {_IVF_V_LISTS - 1} END"
    )
    return (
        "WITH d AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        f"dd AS (SELECT v, {dots} FROM d), "
        f"a AS (SELECT v, CAST({case} AS INT) AS list_id FROM dd), "
        "s AS (SELECT list_id, count(*) AS n FROM a GROUP BY 1), "
        "u AS (SELECT list_id, CAST(t.i AS INT) AS dim, sum(v[t.i + 1]) AS sm "
        f"FROM a CROSS JOIN generate_series(0, {_QUERY_DIM - 1}) t(i) "
        "GROUP BY 1, 2) "
        "SELECT u.list_id, s.n, u.dim, round(u.sm / s.n, 6) AS centroid_val "
        "FROM u JOIN s USING (list_id)"
    )


@query(
    "q_kmeans_step",
    oracle=_kmeans_step_oracle(),
    doc=(
        "One Lloyd update of the seeded IVF coarse quantizer: "
        "argmax-dot assignment (Arrow kernel, map-only) + ONE "
        "list-keyed aggregate carrying per-dim partial sums (exchange "
        "is k x (dim+1) doubles per task, corpus-size-independent); "
        "updated centroid means exploded to (list_id, n, dim, value) "
        "after aggregation."
    ),
    tags=("similarity", "ivf"),
)
def q_kmeans_step(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return kmeans_step(_spread(emb))


# ---------------------------------------------------------------------------
# Simplified silhouette — the cluster-quality score for the seeded
# coarse quantizer that q_kmeans_step updates and IVF/SemDeDup search
# through: per vector, a = distance to its own centroid, b = distance
# to the nearest OTHER centroid, s = (b - a) / max(a, b). The O(n*k)
# "simplified" form (distances to centroids, not all pairs) is the one
# that exists at corpus scale; full silhouette is O(n^2) by definition.
# ---------------------------------------------------------------------------


def _seeded_sq_dists_block(M, cents_arr, cc):
    """Row-block squared Euclidean distances to every centroid via the
    ip expansion d2 = <v,v> - 2<v,c> + <c,c>, every dot accumulated
    dim-sequentially in float64 — the same fold order as DuckDB's
    list_inner_product, so d2 (and therefore the argmin assignment and
    the sorted a/b pair) is bit-identical to the SQL oracle."""
    import numpy as np

    n, dim = M.shape
    vv = np.zeros(n)
    for i in range(dim):
        vv += M[:, i] * M[:, i]
    out = np.empty((n, len(cents_arr)))
    for c, cent in enumerate(cents_arr):
        vc = np.zeros(n)
        for i in range(dim):
            vc += M[:, i] * cent[i]
        out[:, c] = vv - 2.0 * vc + cc[c]
    return out


def silhouette_simplified(
    df: DataFrame, n_lists: int = _IVF_V_LISTS, vec_col: str = "embedding"
) -> DataFrame:
    """Per-cluster simplified silhouette vs the fixed seeded centroids:
    (list_id, n, mean_a, mean_sil) — member count, mean own-centroid
    distance, mean silhouette coefficient.

    Scale design: ONE Arrow-batched map-only kernel emits
    (list_id, a, b) per vector — centroids ride the closure, no
    shuffle — and the only exchange is the k-row-bounded per-cluster
    aggregate (map-side combine). Assignment is first-min-wins argmin
    of squared distance; a/b are the two smallest, so b is "nearest
    other centroid" even under exact ties. Distances use the same
    sequential-fold dot arithmetic as the SQL oracle (see
    _seeded_sq_dists_block), making every branch engine-identical;
    only the final means carry the round(4) float-order tolerance.
    """
    import numpy as np

    base = df.filter(F.col(vec_col).isNotNull())
    from libcolumnfile_spark.tables import input_keyed_memo

    dim_probe = input_keyed_memo(
        base, "srp-dim", lambda: base.select(F.size(vec_col).alias("d")).first()
    )
    if dim_probe is None:
        return base.select(
            F.lit(0).alias("list_id"),
            F.lit(0).cast("bigint").alias("n"),
            F.lit(0.0).alias("mean_a"),
            F.lit(0.0).alias("mean_sil"),
        ).limit(0)
    dim = int(dim_probe["d"])
    cents = _ivf_seeded_centroids(dim, n_lists)
    cents_arr = [np.asarray(c, dtype=np.float64) for c in cents]
    cc = []
    for cent in cents:
        acc = 0.0
        for x in cent:
            acc += x * x
        cc.append(acc)

    @F.pandas_udf("struct<list_id: int, a: double, b: double>")
    def _sil(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            return pd.DataFrame({"list_id": pd.Series([], dtype="int32"),
                                 "a": pd.Series([], dtype="float64"),
                                 "b": pd.Series([], dtype="float64")})
        M = np.array(list(emb), dtype=np.float64)
        d2 = _seeded_sq_dists_block(M, cents_arr, cc)
        assign = np.argmin(d2, axis=1).astype(np.int32)  # first-min-wins
        part = np.sort(d2, axis=1)[:, :2]
        return pd.DataFrame(
            {"list_id": assign, "a": np.sqrt(part[:, 0]), "b": np.sqrt(part[:, 1])}
        )

    per = base.select(_sil(F.col(vec_col)).alias("s")).select("s.*")
    sil = F.when(
        F.greatest("a", "b") > 0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(F.lit(0.0))
    return per.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("a"), 4).alias("mean_a"),
        F.round(F.avg(sil), 4).alias("mean_sil"),
    )


def _silhouette_oracle() -> str:
    cents = _ivf_seeded_centroids(_QUERY_DIM)
    cc = []
    for cent in cents:
        acc = 0.0
        for x in cent:
            acc += x * x
        cc.append(acc)
    dists = ", ".join(
        f"list_inner_product(v, v) - 2 * list_inner_product(v, {_duckdb_vec(c)})"
        f" + {cc[i]!r} AS d{i}"
        for i, c in enumerate(cents)
    )
    lst = "list_sort([" + ", ".join(f"d{i}" for i in range(_IVF_V_LISTS)) + "])"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = m THEN {i}" for i in range(_IVF_V_LISTS - 1))
        + f" ELSE {_IVF_V_LISTS - 1} END"
    )
    return (
        "WITH d AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings "
        "WHERE embedding IS NOT NULL), "
        f"dd AS (SELECT v, {dists} FROM d), "
        f"srt AS (SELECT *, {lst} AS ds FROM dd), "
        "ab AS (SELECT ds[1] AS m, sqrt(ds[1]) AS a, sqrt(ds[2]) AS b, * "
        "FROM srt), "
        f"asn AS (SELECT CAST({case} AS INT) AS list_id, a, b, "
        "CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b) "
        "ELSE 0.0 END AS sil FROM ab) "
        "SELECT list_id, count(*) AS n, round(avg(a), 4) AS mean_a, "
        "round(avg(sil), 4) AS mean_sil FROM asn GROUP BY list_id"
    )


@query(
    "q_silhouette",
    oracle=_silhouette_oracle(),
    doc=(
        "Per-cluster simplified silhouette of the seeded coarse "
        "quantizer: one map-only Arrow kernel emits (assigned list, "
        "own-centroid distance, nearest-other distance) per vector via "
        "sequential-fold ip-expansion distances (bit-identical to the "
        "SQL oracle's list_inner_product), then a k-row-bounded "
        "per-cluster aggregate — the O(n*k) cluster-quality eval that "
        "pairs with q_kmeans_step."
    ),
    tags=("similarity", "ivf", "stats"),
)
def q_silhouette(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return silhouette_simplified(_spread(emb))


# ---------------------------------------------------------------------------
# Cluster purity — EXTERNAL validity of the seeded coarse quantizer
# against the embeddings' ground-truth labels: per cluster, the
# majority label and the fraction of members carrying it. Pairs with
# q_silhouette (internal geometry) the way precision pairs with margin:
# "the clusters are tight — but are they the RIGHT clusters?"
# ---------------------------------------------------------------------------


def cluster_purity(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    n_lists: int = _IVF_V_LISTS,
) -> DataFrame:
    """(list_id, n, majority_label, purity) per non-empty seeded
    cluster; purity rounded to 6, majority ties broken by smallest
    label (engine-deterministic).

    Scale design: assignment is the shared Arrow argmax kernel
    (seeded_assign_udf — map-only, centroids ride the closure), then
    everything runs on the (cluster x label)-bounded contingency table:
    one cell-keyed count exchange, an n_lists-partition row_number
    window for the majority pick, one cluster-keyed total join. No
    per-vector shuffle beyond the first count's map-side partials.
    """
    base = df.filter(F.col(vec_col).isNotNull())
    from libcolumnfile_spark.tables import input_keyed_memo

    dim_probe = input_keyed_memo(
        base, "srp-dim", lambda: base.select(F.size(vec_col).alias("d")).first()
    )
    if dim_probe is None:
        return base.select(
            F.lit(0).alias("list_id"),
            F.lit(0).cast("bigint").alias("n"),
            F.lit(0).alias("majority_label"),
            F.lit(0.0).alias("purity"),
        ).limit(0)
    cents = _ivf_seeded_centroids(int(dim_probe["d"]), n_lists)
    assign = seeded_assign_udf(cents)
    from pyspark.sql.window import Window

    cells = (
        base.select(
            assign(F.col(vec_col)).alias("list_id"),
            F.col(label_col).alias("label"),
        )
        .groupBy("list_id", "label")
        .agg(F.count(F.lit(1)).alias("n_cell"))
    )
    w = Window.partitionBy("list_id").orderBy(
        F.col("n_cell").desc(), F.col("label").asc()
    )
    # cluster totals via an unordered window over the SAME partition key
    # — not a groupBy + self-join: the inner join inferred
    # isnotnull(list_id) and pushed it below the aggregate, which
    # re-evaluated the Arrow assign kernel per row (two ArrowEvalPython
    # nodes for one UDF, guide §4.4's duplication trap); the window form
    # shares the one list_id exchange and evaluates the kernel once.
    wt = Window.partitionBy("list_id")
    return (
        cells.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.sum("n_cell").over(wt))
        .filter(F.col("rn") == 1)
        .select(
            "list_id",
            "n",
            F.col("label").alias("majority_label"),
            F.round(F.col("n_cell") / F.col("n"), 6).alias("purity"),
        )
    )


def _cluster_purity_oracle() -> str:
    cents = _ivf_seeded_centroids(_QUERY_DIM)
    dots = ", ".join(
        f"list_inner_product(v, {_duckdb_vec(c)}) AS d{i}" for i, c in enumerate(cents)
    )
    best = "greatest(" + ", ".join(f"d{i}" for i in range(_IVF_V_LISTS)) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = {best} THEN {i}" for i in range(_IVF_V_LISTS - 1))
        + f" ELSE {_IVF_V_LISTS - 1} END"
    )
    return (
        "WITH d AS (SELECT CAST(embedding AS DOUBLE[]) AS v, label "
        "FROM embeddings), "
        f"dd AS (SELECT label, {dots} FROM d), "
        f"a AS (SELECT label, CAST({case} AS INT) AS list_id FROM dd), "
        "c AS (SELECT list_id, label, count(*) AS n_cell FROM a "
        "GROUP BY 1, 2), "
        "t AS (SELECT list_id, sum(n_cell) AS n FROM c GROUP BY 1), "
        "r AS (SELECT list_id, label, n_cell, row_number() OVER ("
        "PARTITION BY list_id ORDER BY n_cell DESC, label) AS rn FROM c) "
        "SELECT r.list_id, CAST(t.n AS BIGINT) AS n, "
        "r.label AS majority_label, "
        "round(CAST(r.n_cell AS DOUBLE) / t.n, 6) AS purity "
        "FROM r JOIN t USING (list_id) WHERE rn = 1"
    )


@query(
    "q_cluster_purity",
    oracle=_cluster_purity_oracle(),
    doc=(
        "External cluster validity: per seeded-quantizer cluster, the "
        "majority ground-truth label and purity — Arrow argmax "
        "assignment (map-only), then one (cluster x label)-bounded "
        "contingency exchange + a 16-partition majority window. The "
        "labeled counterpart of q_silhouette's internal geometry."
    ),
    tags=("similarity", "ivf", "eval", "stats"),
)
def q_cluster_purity(spark, sf_dir):
    return cluster_purity(_spread(T(spark, sf_dir, "embeddings")))


# ---------------------------------------------------------------------------
# Fisher separability per embedding dimension — between-class variance
# over within-class variance of each coordinate against the labels: the
# supervised feature-scoring pass ("which dimensions carry the label
# signal?") run before training a probe or pruning dimensions. The
# whole statistic decomposes into per-(label, dim) count/sum/sum-sq,
# so it's one wide aggregate — never a per-pair or per-row second pass.
# ---------------------------------------------------------------------------


def fisher_separability(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(dim, between_var, within_var, fisher) for every embedding
    dimension, rounded to 6; fisher = between/within (NULL if within
    degenerates to 0).

    Scale design: posexplode feeding a (label, dim)-keyed aggregate
    with map-side combine — each task emits at most labels x dims
    partial rows, so the exchange is corpus-size-independent. The
    variance decomposition
    (between = (sum s_l^2/n_l - S^2/N)/N, within = (Q - sum s_l^2/n_l)/N)
    is derived arithmetic on the dim-bounded table.
    """
    base = df.filter(F.col(vec_col).isNotNull())
    # posexplode-then-aggregate (the oracle's own shape): one Generate
    # feeding a (label, dim)-keyed partial aggregate — each task emits
    # at most labels x dims partial rows, so the exchange stays
    # corpus-size-independent exactly like the old 129-buffer wide
    # aggregate, but codegen handles 3 narrow aggregate buffers instead
    # of a 129-slot row (the wide form ran interpreted and 1.5-2x
    # slower at sf0.1), and the dim-probe driver action disappears.
    pl = base.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    lab = pl.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    g = lab.groupBy("dim").agg(
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("ssn"),
    )
    between = (F.col("ssn") - F.col("ss") * F.col("ss") / F.col("nn")) / F.col("nn")
    within = (F.col("qq") - F.col("ssn")) / F.col("nn")
    return g.select(
        "dim",
        F.round(between, 6).alias("between_var"),
        F.round(within, 6).alias("within_var"),
        F.round(
            F.when(
                F.col("qq") - F.col("ssn") > 0,
                (F.col("ssn") - F.col("ss") * F.col("ss") / F.col("nn"))
                / (F.col("qq") - F.col("ssn")),
            ),
            6,
        ).alias("fisher"),
    )


@query(
    "q_fisher_dims",
    oracle=(
        "WITH d AS (SELECT CAST(embedding AS DOUBLE[]) AS v, label "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        "u AS (SELECT label, CAST(t.i AS INT) AS dim, count(*) AS n, "
        "sum(v[t.i + 1]) AS s, sum(v[t.i + 1] * v[t.i + 1]) AS q "
        f"FROM d CROSS JOIN generate_series(0, {_QUERY_DIM - 1}) t(i) "
        "GROUP BY 1, 2), "
        "g AS (SELECT dim, sum(n) AS nn, sum(s) AS ss, sum(q) AS qq, "
        "sum(s * s / n) AS ssn FROM u GROUP BY 1) "
        "SELECT dim, round((ssn - ss * ss / nn) / nn, 6) AS between_var, "
        "round((qq - ssn) / nn, 6) AS within_var, "
        "round(CASE WHEN qq - ssn > 0 THEN (ssn - ss * ss / nn) "
        "/ (qq - ssn) END, 6) AS fisher FROM g"
    ),
    doc=(
        "Per-dimension Fisher separability (between-class / "
        "within-class variance vs the labels): one label-keyed wide "
        "aggregate of per-dim sums and sum-squares (exchange = "
        "labels x (2*dim+1) doubles, corpus-size-independent), per-dim "
        "explode after aggregation, variance decomposition on the "
        "dim-bounded table — the supervised feature-scoring pass."
    ),
    tags=("similarity", "eval", "stats"),
)
def q_fisher_dims(spark, sf_dir):
    # fine-sliced scan: embeddings sits below the coarse slice floor
    # (one scan task) and the 64-way posexplode is the dominant map cost
    return fisher_separability(_spread(T(spark, sf_dir, "embeddings")))


# ---------------------------------------------------------------------------
# Hard-negative mining — for each query vector, the corpus items MOST
# similar to it with a DIFFERENT label: the negatives that actually
# teach a contrastive/metric-learning model (uniform random negatives
# are trivially separable; the hard ones sit just across the boundary).
# The labeled variant of the kNN join: same broadcast + two-phase
# salted top-k plan, with the label-mismatch predicate riding the
# scoring join.
# ---------------------------------------------------------------------------


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    salt_buckets: int = 16,
) -> DataFrame:
    """(q_id, q_label, c_id, c_label, cos_sim, rn) — per query, its
    top-k most-similar corpus items with a different label.

    Scale design: the knn_join plan with the label predicate fused into
    the map-side scoring join — query batch broadcast (no corpus
    shuffle), mismatched-label candidates scored in place, exact
    two-phase salted top-k (top-k within (q_id, corpus-hash salt), then
    re-rank survivors) so no q_id window funnels the scored set through
    n_queries reducers. The predicate PRUNES before ranking: same-label
    rows never enter the top-k exchange.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("q_label"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("__cv"),
        F.col(label_col).alias("c_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            "c_id",
            "c_label",
            F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cos_sim"),
        )
    )
    w1 = Window.partitionBy(
        "q_id", F.pmod(F.col("c_id"), F.lit(salt_buckets))
    ).orderBy(F.desc("cos_sim"), F.asc("c_id"))
    survivors = scored.withColumn("__rn1", F.row_number().over(w1)).filter(
        F.col("__rn1") <= k
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        survivors.withColumn("rn", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("q_id", "q_label", "c_id", "c_label", "cos_sim", "rn")
    )


@query(
    "q_hard_negatives",
    oracle=(
        "WITH q AS (SELECT vec_id AS q_id, label AS q_label, "
        "CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8), "
        "c AS (SELECT vec_id AS c_id, label AS c_label, "
        "CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id >= 8), "
        "s AS (SELECT q_id, q_label, c_id, c_label, "
        "round(list_cosine_similarity(cv, qv), 6) AS cos_sim "
        "FROM c CROSS JOIN q WHERE c_label <> q_label), "
        "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id "
        "ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rn FROM s) "
        "SELECT q_id, q_label, c_id, c_label, cos_sim, rn FROM r "
        "WHERE rn <= 5"
    ),
    doc=(
        "Hard-negative mining for contrastive training: per query, the "
        "top-5 most-similar corpus vectors with a DIFFERENT label — the "
        "kNN-join plan (broadcast query batch, map-side scoring, exact "
        "two-phase salted top-k) with the label-mismatch predicate "
        "pruning before any ranking exchange."
    ),
    tags=("similarity", "llm-pipeline", "eval"),
)
def q_hard_negatives(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb.filter(F.col("vec_id") < 8),
        _spread(emb.filter(F.col("vec_id") >= 8)),
    )
