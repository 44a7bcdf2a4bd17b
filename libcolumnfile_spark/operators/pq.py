"""Product quantization (PQ) for compressed-domain ANN.

At 100 TB / billions of vectors, even the IVF index's float vectors
dominate storage and scan cost. PQ stores each vector as m sub-space
code indices (here m=8 codes of 4 bits -> 4 bytes/vector vs 256 bytes
of float32x64): queries score against the CODES via ADC (asymmetric
distance computation) — a per-query lookup table of query-to-centroid
dot products, built once driver-side, then a pure table-gather over the
code table. The float vectors are never touched at query time.

Spark-first shape:
- codebook training is distributed Lloyd per sub-space: ONE pandas-UDF
  assignment pass + ONE exploded groupBy mean per iteration; the driver
  sees only m x ksub centroid rows per round (bounded, like the IVF
  trainer at similarity.py);
- encoding is map-only (numpy kernel);
- ADC scoring is map-only (lookup-table gather) + TakeOrderedAndProject
  top-k — no shuffle anywhere on the query path.

Deterministic end-to-end: centroid init uses the shared splitmix64 walk
(deterministic_query_vector), assignment ties break on lowest code, and
empty cells keep their previous centroid — same corpus, same codebooks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libcolumnfile_spark.queries import T, query
from libcolumnfile_spark.operators.similarity import deterministic_query_vector


def _seeded_codebooks(dim: int, m: int, ksub: int, seed: int = 101) -> np.ndarray:
    """(m, ksub, dim/m) deterministic init vectors."""
    sub = dim // m
    cb = np.empty((m, ksub, sub), dtype=np.float64)
    for i in range(m):
        for c in range(ksub):
            cb[i, c] = deterministic_query_vector(sub, seed=seed + i * 1000 + c)
    return cb


def _vector_dim(df: DataFrame, vec_col: str) -> int:
    """Dim probe, memoized per (plan, input files) — one tiny job per
    train/encode call otherwise."""
    from libcolumnfile_spark.tables import input_keyed_memo

    return input_keyed_memo(
        df, f"pq-dim-{vec_col}", lambda: len(df.select(vec_col).first()[0])
    )


def train_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    seed: int = 101,
) -> np.ndarray:
    """Distributed Lloyd per sub-space. Returns (m, ksub, sub) float64.

    Each iteration is ONE mapInPandas pass emitting per-BATCH partial
    sums (subspace, code, pos, psum, pcnt) — at most m*ksub*sub rows
    per Arrow batch, regardless of corpus size — followed by a tiny
    final aggregation. Map-side combining keeps the shuffle
    O(batches * codebook), not O(vectors * dim): the same partial/final
    split Catalyst gives hash aggregates, applied to the numpy kernel."""
    dim = _vector_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    cb = _seeded_codebooks(dim, m, ksub, seed)
    vecs = df.select(F.col(vec_col).alias("v"))
    for _ in range(iters):
        cb_b = cb.copy()

        def partials(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                M = np.array(list(pdf["v"]), dtype=np.float64)
                rows = {"subspace": [], "code": [], "pos": [], "psum": [], "pcnt": []}
                for i in range(m):
                    S = M[:, i * sub : (i + 1) * sub]
                    # squared L2 argmin; np.argmin = lowest-code tie-break
                    d2 = ((S[:, None, :] - cb_b[i][None, :, :]) ** 2).sum(axis=2)
                    codes = np.argmin(d2, axis=1)
                    sums = np.zeros((ksub, sub))
                    np.add.at(sums, codes, S)
                    cnts = np.bincount(codes, minlength=ksub).astype(np.float64)
                    for c in np.nonzero(cnts)[0]:
                        for p in range(sub):
                            rows["subspace"].append(i)
                            rows["code"].append(int(c))
                            rows["pos"].append(p)
                            rows["psum"].append(sums[c, p])
                            rows["pcnt"].append(cnts[c])
                yield pd.DataFrame(rows)

        means = (
            vecs.mapInPandas(
                partials,
                schema="subspace int, code int, pos int, psum double, pcnt double",
            )
            .groupBy("subspace", "code", "pos")
            .agg((F.sum("psum") / F.sum("pcnt")).alias("mean"))
            .collect()
        )  # bounded: m * ksub * sub rows
        nxt = cb.copy()  # empty cells keep their previous centroid
        for r in means:
            # F.avg over doubles is partial-aggregation-order dependent at
            # the ~1e-15 relative level; rounding each iteration's
            # centroids to 12 decimals makes the codebooks bit-identical
            # across partitioning/layout changes (the determinism the
            # docstring promises), while perturbing Lloyd by far less
            # than its own convergence tolerance.
            nxt[r["subspace"], r["code"], r["pos"]] = round(r["mean"], 12)
        cb = nxt
    return cb


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>): 4 bytes of payload per vector at m=8/ksub=16
    in a columnar format (vs 256 for the float vectors). Map-only."""
    m, ksub, sub = codebooks.shape
    cb_b = codebooks

    @F.pandas_udf("array<int>")
    def enc(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        M = np.array(list(col), dtype=np.float64)
        codes = np.empty((len(M), m), dtype=np.int32)
        for i in range(m):
            S = M[:, i * sub : (i + 1) * sub]
            d2 = ((S[:, None, :] - cb_b[i][None, :, :]) ** 2).sum(axis=2)
            codes[:, i] = np.argmin(d2, axis=1)
        return pd.Series([list(map(int, row)) for row in codes])

    return df.select(F.col(id_col).alias("vec_id"), enc(F.col(vec_col)).alias("codes"))


def pq_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """ADC top-k over the code table: build the (m, ksub) dot-product
    lookup table driver-side (tiny), gather-sum per vector map-side,
    TakeOrderedAndProject for the top-k. Approximate by construction —
    the score is dot(query, reconstructed_centroid(codes))."""
    m, ksub, sub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    lut = np.empty((m, ksub), dtype=np.float64)
    for i in range(m):
        lut[i] = codebooks[i] @ q[i * sub : (i + 1) * sub]
    lut_b = lut

    @F.pandas_udf("double")
    def adc(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="float64")
        C = np.array(list(col), dtype=np.int64)  # (n, m)
        score = np.zeros(len(C))
        for i in range(m):
            score += lut_b[i][C[:, i]]
        return pd.Series(score)

    return (
        codes_df.select("vec_id", F.round(adc(F.col("codes")), 6).alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Declared queries
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Oracle-verified PQ mechanism (q_sim_pq_seeded): same encode + ADC
# machinery as q_sim_pq, but over the FIXED seeded codebooks (Lloyd
# iters=0), which makes every stage plain double arithmetic a DuckDB
# oracle replicates end to end — the q_sim_ivf_seeded recipe
# (similarity.py) applied to PQ. The Lloyd-trained variant q_sim_pq
# keeps its rows-only check + recall property tests; this twin is the
# driver-window representative so the hard gate carries a full hash
# oracle for the PQ path (VERDICT r8 item 2).
#
# FP-parity contract with the oracle (the q_sim_ivf_seeded precedent):
# - sub-space squared L2 accumulates POSITION-SEQUENTIALLY in float64:
#   acc += (v[p]-c[p])^2 for p = 0..sub-1, exactly SQL's left-assoc
#   (t1 + t2 + ... + t_sub) — bit-identical distances;
# - argmin is strict-< first-min-wins, the oracle's
#   CASE WHEN d = least(...) first-match;
# - the ADC lookup table is computed ONCE driver-side and embedded as
#   the same literal constants in both the kernel and the SQL, so the
#   score sum (left-assoc over m terms) is bit-identical too.
# ---------------------------------------------------------------------------

_PQ_V_M = 8
_PQ_V_KSUB = 16
_PQ_V_SEED = 101


def _pq_lut(codebooks: np.ndarray, query_vec: list[float]) -> list[list[float]]:
    """(m, ksub) query-to-centroid dot products as PYTHON floats,
    position-sequential fold — the shared constants of kernel + oracle."""
    m, ksub, sub = codebooks.shape
    lut: list[list[float]] = []
    for i in range(m):
        row = []
        for c in range(ksub):
            acc = 0.0
            for p in range(sub):
                acc += float(codebooks[i, c, p]) * float(query_vec[i * sub + p])
            row.append(acc)
        lut.append(row)
    return lut


def pq_seeded_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = _PQ_V_M,
    ksub: int = _PQ_V_KSUB,
    seed: int = _PQ_V_SEED,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ encode + ADC top-k over FIXED seeded codebooks. One map-only
    Arrow kernel per vector (encode + score fused — the codes are never
    shuffled), then TakeOrderedAndProject: zero shuffles on the query
    path, identical to pq_topk's plan shape."""
    # null embeddings can't be encoded (and a NULL distance would fall
    # through the oracle's CASE to code ksub-1, scoring a phantom row):
    # the operator's contract is null-free, filtered identically in SQL.
    # The dim probe also runs on the FILTERED frame — len(NULL) crashes.
    df = df.filter(F.col(vec_col).isNotNull())
    dim = _vector_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    cb = _seeded_codebooks(dim, m, ksub, seed)
    lut = np.array(_pq_lut(cb, query_vec))
    cb_b, lut_b = cb, lut

    @F.pandas_udf("codes_str string, adc_score double")
    def enc_score(col: pd.Series) -> pd.DataFrame:
        if len(col) == 0:
            return pd.DataFrame(
                {
                    "codes_str": pd.Series([], dtype=object),
                    "adc_score": pd.Series([], dtype="float64"),
                }
            )
        M = np.array(list(col), dtype=np.float64)
        n = len(M)
        codes = np.empty((n, m), dtype=np.int64)
        score = np.zeros(n)
        for i in range(m):
            S = M[:, i * sub : (i + 1) * sub]
            best_d = np.full(n, np.inf)
            best_c = np.zeros(n, dtype=np.int64)
            for c in range(ksub):
                cent = cb_b[i, c]
                acc = np.zeros(n)
                # position-sequential: bit-identical to the oracle's
                # left-assoc (t1 + ... + t_sub)
                for p in range(sub):
                    diff = S[:, p] - cent[p]
                    acc += diff * diff
                better = acc < best_d  # strict: first-min-wins
                best_d = np.where(better, acc, best_d)
                best_c = np.where(better, np.int64(c), best_c)
            codes[:, i] = best_c
            score += lut_b[i][best_c]
        strs = ["-".join(str(int(x)) for x in row) for row in codes]
        return pd.DataFrame({"codes_str": strs, "adc_score": score})

    return (
        df.select(F.col(id_col).alias("vec_id"), enc_score(F.col(vec_col)).alias("es"))
        .select(
            "vec_id",
            F.col("es.codes_str").alias("codes_str"),
            F.round(F.col("es.adc_score"), 6).alias("adc_score"),
        )
        .orderBy(F.desc("adc_score"), F.asc("vec_id"))
        .limit(k)
    )


def _pq_seeded_oracle(k: int = 10) -> str:
    from libcolumnfile_spark.operators.similarity import _QUERY_DIM, _QUERY_VEC

    m, ksub = _PQ_V_M, _PQ_V_KSUB
    sub = _QUERY_DIM // m
    cb = _seeded_codebooks(_QUERY_DIM, m, ksub, _PQ_V_SEED)
    lut = _pq_lut(cb, _QUERY_VEC)

    d_exprs = []
    for i in range(m):
        for c in range(ksub):
            terms = " + ".join(
                f"(v[{i * sub + p + 1}] - {float(cb[i, c, p])!r}) * "
                f"(v[{i * sub + p + 1}] - {float(cb[i, c, p])!r})"
                for p in range(sub)
            )
            d_exprs.append(f"{terms} AS d{i}_{c}")
    m_exprs = [
        "least(" + ", ".join(f"d{i}_{c}" for c in range(ksub)) + f") AS m{i}"
        for i in range(m)
    ]
    code_exprs = []
    for i in range(m):
        case = (
            "CASE "
            + " ".join(f"WHEN d{i}_{c} = m{i} THEN {c}" for c in range(ksub - 1))
            + f" ELSE {ksub - 1} END"
        )
        code_exprs.append(f"CAST({case} AS INT) AS c{i}")
    # CAST each lut literal: a bare decimal literal is DECIMAL in
    # DuckDB, and a DECIMAL sum would change both dtype and rounding
    lut_cases = [
        "(CASE c{i} ".format(i=i)
        + " ".join(
            f"WHEN {c} THEN CAST({lut[i][c]!r} AS DOUBLE)" for c in range(ksub)
        )
        + " END)"
        for i in range(m)
    ]
    codes_str = (
        "concat_ws('-', "
        + ", ".join(f"CAST(c{i} AS VARCHAR)" for i in range(m))
        + ")"
    )
    return (
        "WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        f"d AS (SELECT vec_id, {', '.join(d_exprs)} FROM b), "
        f"mm AS (SELECT *, {', '.join(m_exprs)} FROM d), "
        f"c AS (SELECT vec_id, {', '.join(code_exprs)} FROM mm) "
        f"SELECT vec_id, {codes_str} AS codes_str, "
        f"round({' + '.join(lut_cases)}, 6) AS adc_score "
        f"FROM c ORDER BY adc_score DESC, vec_id LIMIT {k}"
    )


@query(
    "q_sim_pq_seeded",
    oracle=_pq_seeded_oracle(),
    doc=(
        "Oracle-verified PQ mechanism: fixed seeded codebooks, fused "
        "encode+ADC Arrow kernel (map-only, zero query-path shuffles), "
        "first-min-wins sub-space argmin, literal shared lookup table — "
        "every stage replicated in the SQL oracle down to fold order "
        "(the Lloyd-trained variant q_sim_pq keeps its rows-only check)."
    ),
    tags=("similarity", "ann", "pq"),
)
def q_sim_pq_seeded(spark, sf_dir):
    from libcolumnfile_spark.operators.similarity import _QUERY_VEC

    emb = T(spark, sf_dir, "embeddings")
    return pq_seeded_topk(emb, _QUERY_VEC, k=10)


@query(
    "q_sim_pq",
    # rows-only: Lloyd-trained codebooks are engine-specific state (like
    # the IVF index); recall vs brute force is pinned by TestPq.
    doc=(
        "Product-quantization ANN: distributed per-sub-space Lloyd "
        "codebooks (driver sees m*ksub rows/round), map-only 4-byte "
        "encoding, ADC lookup-table top-k with TakeOrderedAndProject — "
        "the compressed-domain query path where float vectors are never "
        "read at query time."
    ),
    tags=("similarity", "ann", "pq"),
)
def q_sim_pq(spark, sf_dir):
    from libcolumnfile_spark.operators.similarity import _QUERY_VEC

    emb = T(spark, sf_dir, "embeddings")
    cb = train_codebooks(emb, iters=3)
    codes = pq_encode(emb, cb)
    return pq_topk(codes, cb, _QUERY_VEC, k=10)
