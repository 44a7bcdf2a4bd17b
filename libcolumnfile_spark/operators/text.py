"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (no UDFs) so they
run JVM-side at full scan speed — on a 100 TB corpus these are map-only
passes with zero shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from libcolumnfile_spark.queries import query, T
from libcolumnfile_spark.tables import spread as _spread

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language-ID. Real pipelines plug in larger lists; the operator shape
# (max-score over per-language marker hit counts) is what matters.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " in "],
    "es": [" el ", " la ", " de ", " que ", " los "],
    "fr": [" le ", " la ", " les ", " des ", " est "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "zh": ["的", "是", "了", "在", "我"],
}


def occurrence_count(text: Column, pattern: str) -> Column:
    """Number of occurrences of a literal pattern, via length arithmetic
    (JVM-side, no regex engine in the hot path)."""
    plen = len(pattern)
    return ((F.length(text) - F.length(F.replace(text, F.lit(pattern), F.lit("")))) / plen).cast("bigint")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+"))).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation
    runs via a tokenizing regex (one JVM regex pass)."""
    pieces = F.split(F.trim(text), r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])")
    return F.size(F.filter(pieces, lambda p: F.length(F.trim(p)) > 0)).cast("bigint")


def lang_scores(text: Column) -> list[Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return [
        sum([occurrence_count(padded, m) for m in markers], F.lit(0).cast("bigint")).alias(f"score_{lang}")
        for lang, markers in _LANG_MARKERS.items()
    ]


def lang_id(text: Column) -> Column:
    """Argmax-by-score language guess: 'und' when no marker hits.

    Deterministic tie-break by language-code order. NOTE: referencing
    this single Column repeats every marker count per reference site —
    prefer lang_id_frame for whole-table scoring (staged projections keep
    each full-text scan evaluated once).
    """
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {lang: sum([occurrence_count(padded, m) for m in markers], F.lit(0).cast("bigint"))
              for lang, markers in _LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (CASE evaluates in order)
    for lang in reversed(list(scores)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df + a lang_guess column, computed in three staged projections so
    Catalyst binds each expensive intermediate to an attribute instead of
    inlining it per reference: (1) the padded lowered text (one pass),
    (2) one score attribute per language (each marker count runs once),
    (3) argmax over the bound score attributes (cheap integer CASE).
    Identical results to lang_id(); measured ~3x faster at sf0.1.
    """
    langs = list(_LANG_MARKERS)
    padded = df.withColumn(
        "__padded", F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    )
    scored = padded.withColumns(
        {
            f"__score_{lang}": sum(
                [occurrence_count(F.col("__padded"), m) for m in markers],
                F.lit(0).cast("bigint"),
            )
            for lang, markers in _LANG_MARKERS.items()
        }
    )
    best = F.greatest(*[F.col(f"__score_{lang}") for lang in langs])
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when((F.col(f"__score_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return scored.withColumn("lang_guess", expr).drop(
        "__padded", *[f"__score_{lang}" for lang in langs]
    )


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document quality features: lengths, token stats, punct/space/
    uppercase ratios, and a composite quality score in [0,1].

    Staged projections: the full-text scans (regexp strips, space count,
    token split) are bound to attributes in step 1, so the ratio/score
    arithmetic in step 2 references each exactly once — Catalyst inlines
    non-attribute subexpressions per reference, which would otherwise
    re-run the regex passes up to 4x per row.

    ``carry_cols`` pass through unchanged — map-side column carriage so a
    caller needing (features + metadata) never has to join this frame
    back onto its own input (that join re-executes the input subtree AND
    pays a row-scale shuffle; q_corpus_pipeline measured 1.44 -> 0.74 s
    at sf0.1 dropping exactly that self-join).
    """
    t = F.col(text_col)
    counts = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.length(t).cast("bigint").alias("n_chars_calc"),
        occurrence_count(t, " ").alias("__n_spaces"),
        token_count(t).alias("n_tokens"),
        F.length(F.regexp_replace(t, r"[^A-Za-z0-9 ]", "")).cast("bigint").alias("__n_alnum"),
        F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("bigint").alias("__n_upper"),
    )
    n_chars = F.col("n_chars_calc")
    n_tokens = F.col("n_tokens")
    n_punct = n_chars - F.col("__n_alnum")
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    upper_ratio = F.when(n_chars > 0, F.col("__n_upper").cast("double") / n_chars).otherwise(0.0)
    avg_token_len = F.when(
        n_tokens > 0, (n_chars - F.col("__n_spaces")).cast("double") / n_tokens
    ).otherwise(0.0)
    # crude composite: long-enough docs with low punct/upper noise score high
    quality = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + (1.0 - F.least(upper_ratio * 5.0, F.lit(1.0))) * 0.2
    )
    return counts.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        "n_chars_calc",
        "n_tokens",
        F.round(avg_token_len, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(upper_ratio, 4).alias("upper_ratio"),
        F.round(quality, 4).alias("quality"),
    )


# Winnowing fingerprint parameters (Schleimer/Wilkerson/Aiken, SIGMOD'03
# "winnowing" / the MOSS scheme): k-char rolling grams, window-min pick.
_WINNOW_K = 8  # gram length (chars)
_WINNOW_W = 4  # winnow window (grams)
_WINNOW_B = 31  # polynomial base
_WINNOW_P = (1 << 31) - 1


# Scratch buffers for the flat-batch winnow kernel, reused across batches
# AND tasks of a reused Python worker (guide §4.5: module-level state with
# a PID guard — a forked worker must not inherit a parent's buffers).
# Reuse is the point: the round-10 flat-batch attempt was rejected because
# per-batch FRESH multi-MB allocations measured up to ~100x slower on a
# fault-taxed host class (first-touch page faults); buffers that are
# allocated once per worker and grown geometrically pay that tax once.
_WINNOW_SCRATCH: dict = {}


def _winnow_buffers(total: int):
    s = _WINNOW_SCRATCH
    if s.get("pid") != os.getpid():
        s.clear()
        s["pid"] = os.getpid()
        s["cap"] = 0
    if s["cap"] < total:
        s["cap"] = max(total, s["cap"] * 2, 1 << 16)
        for name in ("c", "g", "t", "p"):
            s[name] = np.empty(s["cap"], dtype=np.int64)
    return s["c"], s["g"], s["t"], s["p"]


def winnow_prints_kernel(k: int = _WINNOW_K, w: int = _WINNOW_W):
    """Arrow-batched numpy kernel: normalized text -> sorted distinct
    winnowed fingerprint array (array<bigint>).

    gram_i = sum_{j<k} codepoint(c_{i+j}) * B^j mod p — a polynomial
    k-gram hash over character codepoints (codepoint < 0x110000 and
    B^(k-1) = 31^7 so each term < 2^45; the k-term sum stays far below
    2^63). print_j = min(gram_j .. gram_{j+w-1}). The winnowed set is
    the standard document fingerprint for near-dup detection: any shared
    substring of length >= k + w - 1 guarantees a shared print.

    Why a pandas UDF: the per-position gram polynomial is O(chars * k)
    arithmetic — interpreted HOF lambdas would evaluate ~20M exprs at
    sf0.1 (the same measured trap as the simhash vote); here it is k
    strided whole-batch numpy passes. Map-only, no shuffle; Python sees
    only the text column and returns compact int64 arrays.

    FLAT-batch layout (r11): all docs of a batch concatenate into ONE
    codepoint array and the k multiply-add passes + w min passes run
    once over it, instead of ~(k + w + 4) numpy calls per document —
    the per-call dispatch overhead dominated the old per-doc loop
    (offline kernel A/B on the sf0.1 corpus: 195 -> 97 ms/batch; exact
    parity incl. None/short/unicode docs and arbitrary batch splits).
    Gram windows that straddle a document boundary are computed (cheap)
    but never read: each doc's slice of the print array stops at its own
    last valid window (m_i = len_i - k - w + 2), so boundary garbage
    cannot reach the output — the parity suite pins this. All large
    intermediates live in _WINNOW_SCRATCH (see above); per-doc
    allocations are only the unavoidable encode + np.unique outputs.
    """
    coeff = np.array([_WINNOW_B**j for j in range(k)], dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def kernel(texts: pd.Series) -> pd.Series:
        empty = np.empty(0, dtype=np.int64)
        enc = [s.encode("utf-32-le") if s is not None else b"" for s in texts]
        lens = np.array([len(b) >> 2 for b in enc], dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return pd.Series([empty] * len(enc))
        c, g, tb, p = _winnow_buffers(total)
        raw = np.frombuffer(b"".join(enc), dtype=np.uint32)
        cv = c[:total]
        np.copyto(cv, raw)
        n_total = max(total - (k - 1), 0)
        gv = g[:n_total]
        gv[:] = 0
        for j in range(k):
            np.multiply(cv[j : j + n_total], coeff[j], out=tb[:n_total])
            gv += tb[:n_total]
        gv %= _WINNOW_P
        m_total = max(n_total - (w - 1), 0)
        pv = p[:m_total]
        np.copyto(pv, gv[:m_total])
        for j in range(1, w):
            np.minimum(pv, gv[j : j + m_total], out=pv)
        starts = np.zeros(len(enc) + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        out = []
        for i in range(len(enc)):
            m = lens[i] - (k - 1) - (w - 1)
            if m <= 0:
                out.append(empty)
                continue
            st = starts[i]
            out.append(np.unique(pv[st : st + m]))
        return pd.Series(out)

    return kernel


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace-collapsed). Engine-portable (md5 exists in
    DuckDB too), so it doubles as the exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


# ---------------------------------------------------------------------------
# Declared queries
# ---------------------------------------------------------------------------


@query(
    "q_text_stats",
    oracle=(
        "SELECT doc_id, "
        "CAST(length(text) AS BIGINT) AS n_chars_calc, "
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens, "
        "round(CAST(length(replace(text, ' ', '')) AS DOUBLE) "
        "  / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS avg_token_len "
        "FROM documents"
    ),
    doc=(
        "Token/length stats via identical length-arithmetic on both "
        "engines (fixture text is single-space separated, so spaces+1 == "
        "whitespace token count)."
    ),
    tags=("text",),
)
def q_text_stats(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    t = F.col("text")
    n_chars = F.length(t).cast("bigint")
    n_spaces = occurrence_count(t, " ")
    n_tokens = (n_spaces + 1).cast("bigint")
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        F.round((n_chars - n_spaces).cast("double") / n_tokens, 4).alias("avg_token_len"),
    )


@query(
    "q_fingerprint",
    oracle=(
        "SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp "
        "FROM documents"
    ),
    doc="Normalized-text md5 fingerprint (portable dedup key).",
    tags=("text",),
)
def q_fingerprint(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def _lang_id_oracle() -> str:
    """DuckDB SQL computing the exact lang_id_frame heuristic: same
    marker tables, same occurrence-count length arithmetic (all integer
    ops), same first-language-wins tie-break — generated from
    _LANG_MARKERS so the two engines cannot drift.
    """
    score_exprs = []
    for lang, markers in _LANG_MARKERS.items():
        terms = [
            f"CAST((length(pd) - length(replace(pd, '{m}', ''))) / {len(m)} AS BIGINT)"
            for m in markers
        ]
        score_exprs.append(f"({' + '.join(terms)}) AS score_{lang}")
    langs = list(_LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lg} = {best} AND {best} > 0 THEN '{lg}'" for lg in langs
    ) + " ELSE 'und' END"
    return (
        "WITH p AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS pd FROM documents), "
        f"s AS (SELECT doc_id, lang, {', '.join(score_exprs)} FROM p) "
        f"SELECT doc_id, lang, {case} AS lang_guess FROM s"
    )


@query(
    "q_lang_id",
    oracle=_lang_id_oracle(),
    doc="Stopword-marker language ID over documents.text.",
    tags=("text",),
)
def q_lang_id(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    return lang_id_frame(d).select("doc_id", "lang", "lang_guess")


# Same staged arithmetic as quality_features, spelled in DuckDB SQL. All
# ratio/score math is IEEE double with identical expression trees, so the
# round(4) outputs agree bit-for-bit (same parity argument as
# q_text_stats, which has matched since round 1).
_QUALITY_ORACLE = (
    "WITH c AS (SELECT doc_id, "
    "CAST(length(text) AS BIGINT) AS n_chars_calc, "
    "CAST((length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS n_spaces, "
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "  ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens, "
    "CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_alnum, "
    "CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper "
    "FROM documents), "
    "r AS (SELECT doc_id, n_chars_calc, n_tokens, "
    "CASE WHEN n_tokens > 0 THEN CAST(n_chars_calc - n_spaces AS DOUBLE) / n_tokens ELSE 0.0 END AS atl, "
    "CASE WHEN n_chars_calc > 0 THEN CAST(n_chars_calc - n_alnum AS DOUBLE) / n_chars_calc ELSE 0.0 END AS pr, "
    "CASE WHEN n_chars_calc > 0 THEN CAST(n_upper AS DOUBLE) / n_chars_calc ELSE 0.0 END AS ur "
    "FROM c) "
    "SELECT doc_id, n_chars_calc, n_tokens, "
    "round(atl, 4) AS avg_token_len, "
    "round(pr, 4) AS punct_ratio, "
    "round(ur, 4) AS upper_ratio, "
    "round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5 "
    "  + (1.0 - least(pr * 5.0, 1.0)) * 0.3 "
    "  + (1.0 - least(ur * 5.0, 1.0)) * 0.2, 4) AS quality "
    "FROM r"
)


@query(
    "q_quality",
    oracle=_QUALITY_ORACLE,
    doc="Per-document quality features + composite score.",
    tags=("text",),
)
def q_quality(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    return quality_features(d)


def _winnow_pr_ctes() -> str:
    """Shared DuckDB CTE chain ending in ``pr(doc_id, prints)`` — the
    winnowed distinct-print set per document, generated from the k/w/B
    constants so engines can't drift. Used by the fingerprint summary
    oracle and the shared-span pair oracle."""
    k, w, b, p = _WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_P
    # CAST to BIGINT before the multiply: DuckDB ord() is INT32 and the
    # 31^j coefficients overflow int32 multiplication otherwise
    gram = " + ".join(
        f"CAST(ord(substring(t, i + {j}, 1)) AS BIGINT) * {b**j}" for j in range(k)
    )
    win = ", ".join(f"gl[j + {j}]" for j in range(w))
    return (
        "WITH nrm AS (SELECT doc_id, "
        "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM documents), "
        "g AS (SELECT doc_id, "
        f"list_transform(generate_series(1, length(t) - {k - 1}), i -> ({gram}) % {p}) AS gl "
        "FROM nrm), "
        "pr AS (SELECT doc_id, "
        f"list_distinct(list_transform(generate_series(1, len(gl) - {w - 1}), j -> least({win}))) AS prints "
        "FROM g)"
    )


def _winnow_oracle() -> str:
    """DuckDB replica of the winnowing fingerprint summary: same
    normalization, same codepoint polynomial (ord == utf-32 codepoint),
    same window-min winnow as winnow_prints_kernel."""
    return (
        _winnow_pr_ctes() + " "
        "SELECT doc_id, CAST(len(prints) AS BIGINT) AS n_prints, "
        "CAST(list_min(prints) AS BIGINT) AS min_print, "
        "CASE WHEN len(prints) > 0 THEN CAST(list_aggregate(prints, 'bit_xor') AS BIGINT) "
        "ELSE NULL END AS xor_print "
        "FROM pr"
    )


@query(
    "q_fingerprint_winnow",
    oracle=_winnow_oracle(),
    doc=(
        "Rolling-hash document fingerprint (winnowing, MOSS scheme): "
        "polynomial 8-char gram hashes, window-4 minima, distinct print "
        "set summarized per doc (count / min / xor fold). Map-only scan; "
        "at corpus scale the exploded (print, doc) pairs feed a "
        "group-by-print join to find shared-substring near-dups."
    ),
    tags=("text", "dedup"),
)
def q_fingerprint_winnow(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    prints = winnow_prints_kernel()(normalized)
    pr = d.select("doc_id", prints.alias("prints"))
    xor_fold = F.aggregate(
        F.col("prints"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc.bitwiseXOR(x),
    )
    return pr.select(
        "doc_id",
        F.size("prints").cast("bigint").alias("n_prints"),
        F.array_min("prints").alias("min_print"),
        F.when(F.size("prints") > 0, xor_fold).alias("xor_print"),
    )


# Shared-span pair parameters: a print shared by more than _SPAN_MAX_DF
# documents is boilerplate (license headers, navigation chrome) and is
# suppressed before pairing — the same stop-print rule MOSS applies.
_SPAN_MAX_DF = 16
_SPAN_MIN_COVERAGE = 0.15


def span_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = _SPAN_MAX_DF,
    min_coverage: float = _SPAN_MIN_COVERAGE,
) -> DataFrame:
    """Duplicated-SPAN detection between document pairs: two documents
    pair when they share winnowing fingerprints covering >= min_coverage
    of the smaller document's print set. Any shared substring of length
    >= k + w - 1 chars contributes a shared print (the winnowing
    guarantee), so high coverage means large copied spans — the
    substring-level dedup the suffix-array method targets ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022),
    re-expressed as group-by-print blocking instead of a global suffix
    sort.

    Scale design: prints explode to (print, doc) rows and pairs form
    ONLY within a print's posting list — one shuffle keyed by print.
    Posting lists longer than max_df are dropped before pairing
    (boilerplate prints pair everything with everything; real copied
    spans are rare across docs), so per-print pair output is bounded by
    C(max_df, 2) and total work by n_prints * C(max_df, 2) — never
    corpus-quadratic. The per-doc print-count side table is O(docs) and
    joins on doc_id after pair aggregation (pair cardinality is already
    collapsed), keeping the wide text bodies out of every exchange.
    """
    pr = df.select(
        F.col(id_col).alias("doc_id"),
        winnow_prints_kernel()(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
        ).alias("prints"),
    ).filter(F.size("prints") > 0)
    from libcolumnfile_spark.queries import pin

    e = pin(
        pr.select(
            "doc_id",
            F.size("prints").cast("bigint").alias("n_prints"),
            F.explode("prints").alias("fp"),
        )
    )
    rare = e.groupBy("fp").agg(F.count(F.lit(1)).alias("df_")).filter(
        F.col("df_") <= max_df
    )
    posts = e.join(rare.select("fp"), "fp")
    a = posts.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = posts.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    counts = e.select("doc_id", "n_prints").distinct()
    return (
        pairs.join(counts.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_prints", "na")
        .join(counts.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_prints", "nb")
        # filter on the RAW ratio (the oracle's WHERE is unrounded):
        # thresholding the rounded value would admit raw coverages in
        # [min_coverage - 5e-7, min_coverage) that the oracle excludes
        .withColumn("_cov_raw", F.col("n_shared") / F.least("na", "nb"))
        .filter(F.col("_cov_raw") >= min_coverage)
        .withColumn("coverage", F.round(F.col("_cov_raw"), 6))
        .select("doc_a", "doc_b", "n_shared", "coverage")
    )


def _span_dedup_oracle(
    max_df: int = _SPAN_MAX_DF, min_coverage: float = _SPAN_MIN_COVERAGE
) -> str:
    return (
        _winnow_pr_ctes() + ", "
        "pe AS (SELECT doc_id, CAST(len(prints) AS BIGINT) AS n_prints, "
        "unnest(prints) AS fp FROM pr WHERE len(prints) > 0), "
        f"rare AS (SELECT fp FROM pe GROUP BY fp HAVING count(*) <= {max_df}), "
        "posts AS (SELECT pe.doc_id, pe.n_prints, pe.fp FROM pe JOIN rare USING (fp)), "
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "count(*) AS n_shared, min(a.n_prints) AS na, min(b.n_prints) AS nb "
        "FROM posts a JOIN posts b ON a.fp = b.fp AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, n_shared, "
        "round(CAST(n_shared AS DOUBLE) / least(na, nb), 6) AS coverage "
        f"FROM pairs WHERE CAST(n_shared AS DOUBLE) / least(na, nb) >= {min_coverage}"
    )


@query(
    "q_dedup_span",
    oracle=_span_dedup_oracle(),
    doc=(
        "Duplicated-span pair detection: winnowing prints explode to "
        "posting lists, stop-prints (df > 16) suppressed, pairs form "
        "within posting lists only (bounded C(max_df,2) per print), "
        "coverage = shared prints / smaller print set. The scalable "
        "re-expression of substring-level (suffix-array) dedup."
    ),
    tags=("text", "dedup"),
)
def q_dedup_span(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    return span_dedup_pairs(d)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:
    duplicate-token fraction (1 - distinct/total) and top-token share
    (most frequent token / total) — high values flag boilerplate and
    degenerate repetition for corpus filtering.

    Plan shape: explode tokens -> two hash aggregations ((doc, token)
    then doc). Both aggregate map-side first (partial_count), so the
    exchanges carry one row per DISTINCT (doc, token) — bounded by
    vocabulary, not corpus length. No Python anywhere.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("n").alias("top_freq"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "dup_token_frac"
            ),
            F.round(F.col("top_freq") / F.col("n_tokens"), 6).alias(
                "top_token_share"
            ),
        )
    )


@query(
    "q_repetition",
    oracle=(
        "WITH tok AS (SELECT doc_id, "
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok "
        "FROM documents), "
        "c AS (SELECT doc_id, tok, count(*) AS n FROM tok GROUP BY doc_id, tok), "
        "d AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens, "
        "count(*) AS n_distinct, max(n) AS top_freq FROM c GROUP BY doc_id) "
        "SELECT doc_id, n_tokens, n_distinct, "
        "round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_frac, "
        "round(CAST(top_freq AS DOUBLE) / n_tokens, 6) AS top_token_share "
        "FROM d"
    ),
    doc=(
        "Gopher-style repetition quality: duplicate-token fraction and "
        "top-token share per document — vocabulary-bounded shuffles, "
        "pure Catalyst."
    ),
    tags=("text", "quality"),
)
def q_repetition(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return repetition_stats(d)


@query(
    "q_token_count",
    # Identical RE2-compatible tokenizing regex on both engines (no
    # lookarounds): word/digit runs plus single punctuation marks, the
    # BPE-ish token-estimate shape of LLM-corpus accounting.
    oracle=(
        "SELECT doc_id, "
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        "  ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS ws_tokens, "
        "CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens "
        "FROM documents"
    ),
    doc=(
        "Token counting: whitespace tokens + BPE-ish regex token "
        "estimate (alnum runs and individual punctuation). Map-only "
        "scan, one JVM regex pass per variant."
    ),
    tags=("text",),
)
def q_token_count(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    t = F.col("text")
    bpe = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))
    return d.select(
        "doc_id",
        token_count(t).alias("ws_tokens"),
        bpe.cast("bigint").alias("bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# TF-IDF scoring, inverted index, quality-percentile filtering
# ---------------------------------------------------------------------------


def tfidf_topk(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document (smooth idf: ln((N+1)/(df+1)) + 1).

    Plan shape: one token explode feeds BOTH aggregations — (doc, tok)
    term frequencies and per-token document frequencies — each a
    partial+final hash agg whose exchange carries one row per distinct
    key (vocabulary-bounded, not corpus-bounded). N arrives via a 1-row
    aggregate cross join (broadcast nested loop of a single row; no
    driver collect). The final per-doc top-k is a window row_number —
    its shuffle carries only the vocabulary-bounded tf rows.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        # dfreq is VOCABULARY-bounded (tokens, not documents — Heaps-law
        # sublinear), one of the deliberate broadcast exceptions: unhinting
        # it regressed the x10 contract 1.8->4.4x by shuffling the whole tf
        # side for a lookup table
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("doc_id", "tok", "tf", "df", "score", "rn")
    )


_TFIDF_ORACLE = (
    "WITH tok AS (SELECT doc_id, "
    "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents), "
    "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok), "
    "dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok), "
    "n AS (SELECT count(*) AS n_docs FROM documents), "
    "s AS (SELECT doc_id, tf.tok, tf, df, "
    "round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS score "
    "FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
    "ORDER BY score DESC, tok) AS rn FROM s) "
    "SELECT doc_id, tok, tf, df, score, rn FROM r WHERE rn <= 3"
)


@query(
    "q_tfidf",
    oracle=_TFIDF_ORACLE,
    doc=(
        "Top-3 TF-IDF terms per document (smooth idf). Vocabulary-bounded "
        "shuffles: the explode feeds two hash aggs whose exchanges carry "
        "distinct keys only; N via 1-row broadcast cross join."
    ),
    tags=("text",),
)
def q_tfidf(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    return tfidf_topk(d, k=3)


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings_cap: int = 20,
) -> DataFrame:
    """Token -> (document frequency, first-``postings_cap`` posting list).

    The posting-list head is bounded BEFORE the collect: a window
    row_number per token keeps only the first ``postings_cap`` doc ids,
    so the collect_list aggregation state is capped per token no matter
    how many documents contain it — full (unbounded) posting lists at
    corpus scale would instead be sharded by (tok, doc_id range). df is
    a separate count agg over the same distinct (tok, doc) rows.
    """
    from pyspark.sql import Window

    d0 = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).dropDuplicates(["tok", "doc_id"])
    dfreq = d0.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("tok").orderBy("doc_id")
    head = (
        d0.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= postings_cap)
        .groupBy("tok")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("postings_head")
        )
    )
    return dfreq.join(head, "tok").select("tok", "df", "postings_head")


_INVERTED_INDEX_ORACLE = (
    "WITH tok AS (SELECT DISTINCT doc_id, "
    "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents), "
    "dfreq AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok), "
    "r AS (SELECT tok, doc_id, row_number() OVER (PARTITION BY tok "
    "ORDER BY doc_id) AS rn FROM tok), "
    "head AS (SELECT tok, string_agg(CAST(doc_id AS VARCHAR), ',' "
    "ORDER BY doc_id) AS postings_head FROM r WHERE rn <= 20 GROUP BY tok) "
    "SELECT dfreq.tok, df, postings_head FROM dfreq JOIN head ON dfreq.tok = head.tok"
)


@query(
    "q_inverted_index",
    oracle=_INVERTED_INDEX_ORACLE,
    doc=(
        "Inverted-index build: token -> document frequency + capped "
        "posting-list head (window-bounded collect keeps aggregation "
        "state O(cap) per token)."
    ),
    tags=("text", "similarity"),
)
def q_inverted_index(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return inverted_index(d)


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 25,
) -> DataFrame:
    """Okapi BM25 retrieval for a bag-of-words query (Robertson et al.;
    idf in Lucene's non-negative form ln(1 + (N - df + 0.5)/(df + 0.5))).
    Returns the top-``topk`` documents by score (ties by doc_id).

    Plan shape — deliberately NOT the textbook explode/inverted-index
    pipeline: the query is a handful of terms, so per-(doc, term) tf is
    a row-local HOF count (size(filter(toks, = t)) per term) and the
    whole scoring pass is map-side. The only aggregates are ONE 1-row
    corpus-stats agg (N, avgdl, df per term — integer sums, so partial
    aggregation is EXACT and engine-order-independent) broadcast back
    via cross join, and the final TakeOrdered top-k. Zero doc- or
    token-keyed shuffles; at 100 TB this is one scan + a k-row sort.
    The ln() ulp + 5-term sum spread sit far inside round(6) (the
    q_lm_perplexity precedent), and the top-k orders by the ROUNDED
    score, so both engines cut the same set. A persisted-index variant
    would serve repeated queries from q_inverted_index's postings
    instead; this is the one-shot scan form.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    )

    def _eq(term: str):
        # single-arg closure: pyspark dispatches on lambda ARITY, and a
        # two-param `lambda x, t=t` reads as the (element, index) form —
        # the index then silently overrides the default (the dedup.py
        # _hash_params precedent)
        return lambda x: x == F.lit(term)

    per_doc = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.size(F.filter(F.col("toks"), _eq(t))).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint"))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    raw = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log(
            1.0 + (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        term = (idf * tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
        raw = term if raw is None else raw + term
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select("doc_id", raw.alias("raw"))
        .filter(F.col("raw") > 0)
        .select("doc_id", F.round(F.col("raw"), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(topk)


def chunk_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding-window token chunking with overlap — the context-window
    preparation step of a training/RAG pipeline: each document emits
    chunks of ``window`` tokens starting every ``stride`` tokens
    (overlap = window - stride keeps boundary-straddling content intact;
    the final chunk is the <= window-token tail). Complements
    pack_sequences (packs whole docs into budgets) and passage_dedup
    (disjoint chunks for dedup).

    Pure per-row fan-out: sequence(0, n-1, stride) -> posexplode ->
    slice/join — no shuffle anywhere; output size is rows x ~n/stride.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    ).filter(F.size("toks") >= 1)
    return toks.select(
        "doc_id",
        F.size("toks").alias("__n"),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0), F.size("toks") - 1, F.lit(stride)
                ),
                lambda s: F.array_join(F.slice(F.col("toks"), s + 1, window), " "),
            )
        ).alias("chunk_id", "chunk_text"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.least(
            F.lit(window).cast("bigint"),
            (F.col("__n") - F.col("chunk_id") * stride).cast("bigint"),
        ).alias("n_chunk_tokens"),
        "chunk_text",
    )


_CHUNK_WINDOW, _CHUNK_STRIDE = 32, 24


def _chunk_overlap_oracle(window: int = _CHUNK_WINDOW, stride: int = _CHUNK_STRIDE) -> str:
    return (
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        "s AS (SELECT doc_id, toks, len(toks) AS n, "
        f"unnest(generate_series(0, len(toks) - 1, {stride})) AS start "
        "FROM t WHERE len(toks) >= 1) "
        f"SELECT doc_id, CAST(start / {stride} AS BIGINT) AS chunk_id, "
        f"CAST(least({window}, n - start) AS BIGINT) AS n_chunk_tokens, "
        f"array_to_string(toks[start + 1 : start + {window}], ' ') AS chunk_text "
        "FROM s"
    )


@query(
    "q_chunk_overlap",
    oracle=_chunk_overlap_oracle(),
    doc=(
        "Sliding-window token chunking with overlap (32-token windows, "
        "stride 24): the context-window prep step for training/RAG "
        "pipelines. Pure per-row fan-out — sequence/posexplode/slice, "
        "zero shuffles."
    ),
    tags=("text", "pipeline", "llm-pipeline"),
)
def q_chunk_overlap(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    return chunk_overlap(d, window=_CHUNK_WINDOW, stride=_CHUNK_STRIDE)


_BM25_TERMS = ("hash", "join", "vector", "column", "filter")
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 25


def _bm25_oracle(
    terms: tuple[str, ...] = _BM25_TERMS,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    topk: int = _BM25_TOPK,
) -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms))
    )
    # identical left-to-right term order as the Spark expression: the
    # fold order matches, so the float sum is bit-comparable pre-round
    score = " + ".join(
        f"(ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) "
        f"* CAST(tf{i} AS DOUBLE) * ({k1} + 1.0)) "
        f"/ (CAST(tf{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    return (
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        f"p AS (SELECT doc_id, len(toks) AS dl, {tf_cols} FROM t), "
        "g AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl, "
        f"{df_cols} FROM p), "
        f"s AS (SELECT doc_id, ({score}) AS raw FROM p CROSS JOIN g) "
        "SELECT doc_id, round(raw, 6) AS bm25 FROM s WHERE raw > 0 "
        f"ORDER BY round(raw, 6) DESC, doc_id LIMIT {topk}"
    )


@query(
    "q_bm25_topk",
    oracle=_bm25_oracle(),
    doc=(
        "Okapi BM25 top-25 retrieval for a 5-term query over documents "
        "(Lucene idf form). Map-side scoring: per-term tf is a row-local "
        "HOF count, corpus stats (N, avgdl, per-term df) are one exact "
        "1-row integer agg broadcast back, top-k is TakeOrdered — zero "
        "doc/token-keyed shuffles."
    ),
    tags=("text", "similarity", "llm-pipeline"),
)
def q_bm25_topk(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    return bm25_topk(d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK)


_RRF_K = 60.0  # the standard reciprocal-rank-fusion constant (Cormack,
#                Clarke & Buettcher 2009); dampens the head so one
#                list's #1 cannot dominate a consistent #3-#5 presence
_RRF_LIST_K = 50
_RRF_TOPK = 25


def rrf_fuse(
    rankings: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k_const: float = _RRF_K,
    topk: int = _RRF_TOPK,
) -> DataFrame:
    """Reciprocal-rank fusion of scorer-heterogeneous ranking lists:
    rrf(d) = sum_i 1/(k + rank_i(d)), items absent from a list
    contribute 0 for it. The standard way to combine rankings whose
    scores are NOT calibrated against each other (lexical BM25 vs a
    quality prior vs embedding cosine) without learning fusion weights.

    Each input is an already-cut top-k list, so everything here is
    bounded by construction: rank assignment is a row_number over a
    k-row frame (the no-partition Window sorts k rows, not the corpus),
    the full-outer join unions <= sum(k_i) rows, and the final cut is a
    TakeOrdered. The expensive part of retrieval stays inside the
    upstream scorers, which keep their own scale shapes (bm25_topk:
    map-side scoring + 1-row stats broadcast; quality_features:
    map-only).

    Ranks tie-break by id, so fusion is deterministic cross-engine; the
    two reciprocal terms add left-to-right in both engines and round(6)
    absorbs nothing (sums of two exact binary fractions' quotients are
    identical expression trees).
    """
    from pyspark.sql import Window

    fused = None
    for i, (df, score_col) in enumerate(rankings):
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        r = df.select(id_col, F.row_number().over(w).alias(f"r{i}"))
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    rrf = None
    for i in range(len(rankings)):
        c = F.coalesce(
            F.lit(1.0) / (F.lit(k_const) + F.col(f"r{i}")), F.lit(0.0)
        )
        rrf = c if rrf is None else rrf + c
    return (
        fused.select(id_col, F.round(rrf, 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(topk)
    )


def _rank_fusion_oracle(
    terms: tuple[str, ...] = _BM25_TERMS,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    list_k: int = _RRF_LIST_K,
    k_const: float = _RRF_K,
    topk: int = _RRF_TOPK,
) -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"(ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) "
        f"* CAST(tf{i} AS DOUBLE) * ({k1} + 1.0)) "
        f"/ (CAST(tf{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    # quality composite: identical staged arithmetic to _QUALITY_ORACLE
    return (
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        f"p AS (SELECT doc_id, len(toks) AS dl, {tf_cols} FROM t), "
        "g AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl, "
        f"{df_cols} FROM p), "
        f"s AS (SELECT doc_id, ({score}) AS raw FROM p CROSS JOIN g), "
        "ba AS (SELECT doc_id, round(raw, 6) AS bm25 FROM s WHERE raw > 0 "
        f"ORDER BY round(raw, 6) DESC, doc_id LIMIT {list_k}), "
        "ra AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) "
        "AS r0 FROM ba), "
        "c AS (SELECT doc_id, "
        "CAST(length(text) AS BIGINT) AS n_chars_calc, "
        "CAST((length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS n_spaces, "
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        "  ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens, "
        "CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_alnum, "
        "CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper "
        "FROM documents), "
        "r AS (SELECT doc_id, "
        "CASE WHEN n_chars_calc > 0 THEN CAST(n_chars_calc - n_alnum AS DOUBLE) / n_chars_calc ELSE 0.0 END AS pr, "
        "CASE WHEN n_chars_calc > 0 THEN CAST(n_upper AS DOUBLE) / n_chars_calc ELSE 0.0 END AS ur, "
        "n_tokens FROM c), "
        "q AS (SELECT doc_id, "
        "round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5 "
        "  + (1.0 - least(pr * 5.0, 1.0)) * 0.3 "
        "  + (1.0 - least(ur * 5.0, 1.0)) * 0.2, 4) AS quality FROM r), "
        f"qb AS (SELECT doc_id, quality FROM q ORDER BY quality DESC, doc_id LIMIT {list_k}), "
        "rb AS (SELECT doc_id, row_number() OVER (ORDER BY quality DESC, doc_id) "
        "AS r1 FROM qb), "
        "f AS (SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id, r0, r1 "
        "FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id) "
        f"SELECT doc_id, round(COALESCE(1.0 / ({k_const} + CAST(r0 AS DOUBLE)), 0.0) "
        f"+ COALESCE(1.0 / ({k_const} + CAST(r1 AS DOUBLE)), 0.0), 6) AS rrf "
        f"FROM f ORDER BY rrf DESC, doc_id LIMIT {topk}"
    )


@query(
    "q_rank_fusion",
    oracle=_rank_fusion_oracle(),
    doc=(
        "Reciprocal-rank fusion (RRF, k=60) of two uncalibrated "
        "rankings — BM25 relevance for the 5-term query and the "
        "composite quality prior — the retrieve-relevant-AND-high-"
        "quality selection step of corpus curation. Rank assignment on "
        "bounded top-50 lists, full-outer union, TakeOrdered top-25."
    ),
    tags=("text", "similarity", "pipeline"),
)
def q_rank_fusion(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    bm = bm25_topk(d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, topk=_RRF_LIST_K)
    quality = (
        quality_features(d)
        .select("doc_id", "quality")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .limit(_RRF_LIST_K)
    )
    return rrf_fuse([(bm, "bm25"), (quality, "quality")])


@query(
    "q_quality_filter",
    # percent_rank is (rank-1)/(n-1) on both engines; the (quality,
    # doc_id) ordering makes every rank unique, so the >= 0.5 cut is
    # deterministic. quality itself is the round(4) composite from
    # q_quality (value-hash-verified since round 2).
    oracle=(
        "WITH c AS (SELECT doc_id, lang, "
        "CAST(length(text) AS BIGINT) AS n_chars_calc, "
        "CAST((length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS n_spaces, "
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        "  ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens, "
        "CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_alnum, "
        "CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper "
        "FROM documents), "
        "r AS (SELECT doc_id, lang, "
        "CASE WHEN n_chars_calc > 0 THEN CAST(n_chars_calc - n_alnum AS DOUBLE) / n_chars_calc ELSE 0.0 END AS pr, "
        "CASE WHEN n_chars_calc > 0 THEN CAST(n_upper AS DOUBLE) / n_chars_calc ELSE 0.0 END AS ur, "
        "n_tokens FROM c), "
        "q AS (SELECT doc_id, lang, "
        "round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5 "
        "  + (1.0 - least(pr * 5.0, 1.0)) * 0.3 "
        "  + (1.0 - least(ur * 5.0, 1.0)) * 0.2, 4) AS quality FROM r), "
        "p AS (SELECT doc_id, lang, quality, "
        "percent_rank() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS prank FROM q) "
        "SELECT doc_id, lang, quality, round(prank, 6) AS quality_rank "
        "FROM p WHERE prank >= 0.5"
    ),
    doc=(
        "Quality-percentile gate: keep the top half of documents per "
        "language by composite quality score (percent_rank window over "
        "the per-language partition) — the distribution-aware filtering "
        "step of a corpus pipeline, vs q_quality's raw features."
    ),
    tags=("text", "quality", "window"),
)
def q_quality_filter(spark, sf_dir):
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    # lang rides the feature projection (carry_cols) — joining the
    # features back onto d re-executed the scan and paid a doc-scale
    # shuffle join for one column (same fix as q_corpus_pipeline)
    scored = quality_features(d, carry_cols=("lang",)).select(
        "doc_id", "lang", "quality"
    )
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return (
        scored.withColumn("prank", F.percent_rank().over(w))
        .filter(F.col("prank") >= 0.5)
        .select(
            "doc_id",
            "lang",
            "quality",
            F.round("prank", 6).alias("quality_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate removal (document-frequency chunk filter) + Gopher-style
# quality rules — two standard corpus-cleaning passes.
# ---------------------------------------------------------------------------


def boilerplate_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 8,
    min_df: int = 5,
) -> DataFrame:
    """Corpus-wide boilerplate filter: a chunk (run of ``chunk_tokens``
    whitespace tokens; real corpora would split on paragraph breaks
    first) whose DOCUMENT FREQUENCY reaches ``min_df`` is boilerplate
    (nav chrome, license headers, template text) and is dropped from
    EVERY document — unlike passage_dedup (dedup.py), which keeps the
    first occurrence.

    Plan: chunk explode (map) -> df count per md5 (one partial+final
    agg keyed by 16-byte hashes) -> per-doc reassembly of surviving
    chunks (grouping state bounded by doc length). Two narrow shuffles
    total; chunk text never joins against itself.
    """
    chunks = (
        # length(trim(..)) > 0 mirrors the oracle's predicate: Spark's
        # split('') yields [''], so size(toks) >= 1 alone would admit
        # empty/whitespace-only docs and emit an empty-string chunk
        # (which could accumulate doc_freq and count as boilerplate)
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
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
        .withColumn("h", F.md5("chunk"))
    )
    dfreq = chunks.groupBy("h").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    keep = chunks.join(dfreq, "h").withColumn(
        "is_boiler", F.col("doc_freq") >= min_df
    )
    return (
        keep.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_boiler"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_boiler"),
                                F.struct("cpos", "chunk"),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select("doc_id", "n_chunks", "n_boiler", "clean_text")
    )


_GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "that")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    min_mean_len: float = 2.0,
    max_mean_len: float = 12.0,
    min_stopword_frac: float = 0.01,
    min_unique_frac: float = 0.20,
) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021 §A1.1
    shape): token-count bounds, mean token length band, stopword
    fraction floor, unique-token fraction floor. Pure Catalyst
    expressions — a single map-only pass at any corpus size; each rule
    is emitted as its own flag so downstream audits can attribute
    rejections."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>"))
        .otherwise(toks)
        .alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_unique"),
        F.aggregate(
            F.transform(F.col("toks"), lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("sum_len"),
        F.size(
            F.filter(F.col("toks"), lambda x: x.isin(*_GOPHER_STOPWORDS))
        ).cast("bigint").alias("n_stop"),
    )
    mean_len = F.when(F.col("n_tokens") > 0, F.col("sum_len") / F.col("n_tokens")).otherwise(0.0)
    stop_frac = F.when(F.col("n_tokens") > 0, F.col("n_stop") / F.col("n_tokens")).otherwise(0.0)
    uniq_frac = F.when(F.col("n_tokens") > 0, F.col("n_unique") / F.col("n_tokens")).otherwise(0.0)
    out = t.select(
        "doc_id",
        "n_tokens",
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_frac, 4).alias("stopword_frac"),
        F.round(uniq_frac, 4).alias("unique_frac"),
        F.col("n_tokens").between(min_tokens, max_tokens).alias("ok_count"),
        mean_len.between(min_mean_len, max_mean_len).alias("ok_len"),
        (stop_frac >= min_stopword_frac).alias("ok_stop"),
        (uniq_frac >= min_unique_frac).alias("ok_unique"),
    )
    return out.withColumn(
        "keep",
        F.col("ok_count") & F.col("ok_len") & F.col("ok_stop") & F.col("ok_unique"),
    )


_BOILER_ORACLE = (
    "WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t "
    "FROM documents WHERE length(trim(text)) > 0), "
    "chunks AS (SELECT doc_id, i - 1 AS cpos, "
    "array_to_string(t[(i-1)*8+1 : (i-1)*8+8], ' ') AS chunk "
    "FROM toks, UNNEST(generate_series(1, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS u(i)), "
    "dfreq AS (SELECT md5(chunk) AS h, count(DISTINCT doc_id) AS doc_freq "
    "FROM chunks GROUP BY 1) "
    "SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks, "
    "CAST(sum(CASE WHEN doc_freq >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler, "
    "coalesce(string_agg(CASE WHEN doc_freq < 5 THEN chunk END, ' ' ORDER BY cpos), '') AS clean_text "
    "FROM chunks c JOIN dfreq d ON md5(c.chunk) = d.h "
    "GROUP BY c.doc_id"
)

_GOPHER_ORACLE = (
    "WITH t AS (SELECT doc_id, "
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE string_split_regex(lower(trim(text)), '\\s+') END AS toks FROM documents), "
    "m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
    "CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique, "
    "CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS sum_len, "
    "CAST(len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','that'))) AS BIGINT) AS n_stop "
    "FROM t), "
    "x AS (SELECT doc_id, n_tokens, "
    "CASE WHEN n_tokens > 0 THEN CAST(sum_len AS DOUBLE) / n_tokens ELSE 0.0 END AS ml, "
    "CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS sf, "
    "CASE WHEN n_tokens > 0 THEN CAST(n_unique AS DOUBLE) / n_tokens ELSE 0.0 END AS uf "
    "FROM m) "
    "SELECT doc_id, n_tokens, round(ml, 4) AS mean_token_len, "
    "round(sf, 4) AS stopword_frac, round(uf, 4) AS unique_frac, "
    "n_tokens BETWEEN 10 AND 1000000 AS ok_count, "
    "ml BETWEEN 2.0 AND 12.0 AS ok_len, "
    "sf >= 0.01 AS ok_stop, uf >= 0.20 AS ok_unique, "
    "(n_tokens BETWEEN 10 AND 1000000) AND (ml BETWEEN 2.0 AND 12.0) "
    "AND sf >= 0.01 AND uf >= 0.20 AS keep "
    "FROM x"
)


@query(
    "q_boilerplate",
    oracle=_BOILER_ORACLE,
    doc=(
        "Document-frequency boilerplate removal: chunks appearing in >=5 "
        "distinct documents are dropped from every document (nav chrome "
        "/ license headers / template text), docs reassembled from "
        "surviving chunks — complements q_dedup_passage's keep-first "
        "semantics. Two narrow hash shuffles, no self-join."
    ),
    tags=("text", "pipeline", "dedup"),
)
def q_boilerplate(spark, sf_dir):
    return boilerplate_removal(_spread(T(spark, sf_dir, "documents")))


@query(
    "q_gopher_rules",
    oracle=_GOPHER_ORACLE,
    doc=(
        "Gopher-style heuristic quality rules: token-count bounds, mean "
        "token length band, stopword-fraction floor, unique-token "
        "fraction floor — per-rule flags + overall keep, one map-only "
        "Catalyst pass (no UDF, no shuffle)."
    ),
    tags=("text", "quality", "pipeline"),
)
def q_gopher_rules(spark, sf_dir):
    return gopher_rules(_spread(T(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Model-based quality filtering: linear classifier inference over hashed
# bag-of-words features — the fastText-style "quality classifier" gate
# (DCLM / FineWeb-Edu pattern) between heuristic rules and training.
# ---------------------------------------------------------------------------

_CLF_DIM = 64
_CLF_SEED = 23


def _clf_weights() -> list[float]:
    from libcolumnfile_spark.operators.similarity import (
        deterministic_query_vector,
    )

    return deterministic_query_vector(_CLF_DIM, seed=_CLF_SEED)


def classifier_score(
    text: Column,
    weights: list[float] | None = None,
    n_buckets: int = _CLF_DIM,
) -> Column:
    """Linear text-classifier inference over hashed bag-of-words
    features: each whitespace token md5-hashes to one of ``n_buckets``
    feature buckets and the document score is the MEAN bucket weight
    (length-normalized dot of the count vector with the weight vector).
    The fixed seeded weights stand in for trained parameters — the
    operator shape (hash features, dot weights, threshold) is exactly
    classifier-filtering a crawl.

    Scale: a pure Catalyst map expression — classifier inference at
    full scan speed with no UDF, no shuffle, no model server; the
    weight vector rides the plan as a literal array. Engine-portable by
    the same md5-bucket argument as pipeline.hash_bucket; the aggregate
    folds in list order, matching DuckDB's list_sum (probed
    bit-identical over the fixture before round(6))."""
    from libcolumnfile_spark.operators.pipeline import hash_bucket

    w = weights if weights is not None else _clf_weights()
    W = F.array(*[F.lit(float(x)) for x in w])
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    wsum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(W, (hash_bucket(t, n_buckets) + 1).cast("int")),
    )
    return F.round(wsum / F.size(toks), 6)


def _clf_oracle() -> str:
    from libcolumnfile_spark.operators.pipeline import _bucket_sql

    wlit = "[" + ", ".join(repr(float(x)) for x in _clf_weights()) + "]"
    bucket = _bucket_sql("tk", _CLF_DIM)
    return (
        "WITH t AS (SELECT doc_id, lang, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        "s AS (SELECT doc_id, lang, "
        f"round(list_sum(list_transform(toks, tk -> ({wlit})[({bucket}) + 1])) "
        "/ len(toks), 6) AS score FROM t) "
        "SELECT doc_id, lang, score FROM s WHERE score >= 0.0"
    )


@query(
    "q_classifier_filter",
    oracle=_clf_oracle(),
    doc=(
        "Model-based quality gate: hashed bag-of-words linear classifier "
        "scores every document map-side (mean md5-bucket weight, seeded "
        "weight vector) and the filter keeps score >= 0; the oracle "
        "replicates the hash, the weights, and the fold arithmetic."
    ),
    tags=("text", "quality", "pipeline", "llm-pipeline"),
)
def q_classifier_filter(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id", "lang", classifier_score(F.col("text")).alias("score")
    )
    return scored.filter(F.col("score") >= 0.0)


# ---------------------------------------------------------------------------
# N-gram language-model scoring (the CCNet-style perplexity filter):
# train a unigram LM on the corpus (MLE + add-one smoothing), score
# every document by its per-token negative log-likelihood. Low-NLL docs
# look like the corpus; high-NLL docs are noise/outliers — the classic
# LM-based quality gate between heuristic rules and training.
# ---------------------------------------------------------------------------


def lm_nll_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average negative log-likelihood under an add-one-
    smoothed unigram LM trained on the same corpus: p(tok) =
    (cnt+1)/(N+V), score = -mean(ln p(tok_i)).

    Scale: one explode + one token-count aggregate (shuffle O(vocab)),
    then a token-keyed join of the instance stream against the count
    table (broadcast while the vocab fits, shuffle join beyond) and a
    per-doc partial+final average. Cross-engine: ln() agrees with
    DuckDB within an ulp (the q_tfidf precedent) and the log-sum's
    summation-order spread (~n*eps) sits far inside the round(6)
    tolerance, so the oracle value-hash-checks exactly."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(totals))  # one row: N and V ride every task
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.col("cnt") + F.lit(1.0))
                    / (F.col("n_tokens") + F.col("vocab"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("nll"), 6).alias("avg_nll")
    )


_LM_ORACLE = (
    "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), "
    "'\\s+')) AS tok FROM documents), "
    "t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
    "c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok), "
    "g AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_tokens, "
    "CAST(count(*) AS DOUBLE) AS vocab FROM c) "
    "SELECT doc_id, round(avg(-ln((c.cnt + 1.0) / (g.n_tokens + g.vocab))), 6) "
    "AS avg_nll FROM t JOIN c USING (tok) CROSS JOIN g GROUP BY doc_id"
)


def perplexity_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    method: str = "ntile",
) -> DataFrame:
    """CCNet-style head/middle/tail corpus split (Wenzek et al. 2020):
    documents ranked by unigram-LM perplexity WITHIN THEIR LANGUAGE and
    cut into terciles — head (lowest NLL) is the Wikipedia-like slice,
    tail the noisiest; pipelines train on head+middle or reweight by
    split. Composes lm_nll_scores with a per-language tercile cut.

    The output PARTITIONS the corpus: every input doc appears exactly
    once. Unscorable docs (empty/whitespace-only text — zero tokens, no
    NLL) go to ``tail`` with a NULL avg_nll, per CCNet's
    noisiest-bucket routing; they never participate in the ranking.
    NULL-language docs form their own language group in BOTH methods.

    Two methods, same semantics:
    - ``"ntile"``: per-language ntile(3) — an exact per-language global
      rank, so parallelism is bounded by language cardinality (the
      q_quality_filter precedent). The oracle-checkable anchor.
    - ``"quantile"``: the 100 TB path — per-language 1/3 and 2/3 NLL
      percentiles (one two-number-per-language aggregate, broadcast
      back) + a map-side CASE. The score table feeds multiple consumers
      but stays UNPINNED: ReuseExchange shares its shuffles and caching
      it measured 2.4x worse at sf0.1 (see the inline A/B note). No
      per-language sort ever happens; parallelism stays at corpus
      width. Labels agree with ntile everywhere except exact-boundary
      ties (ntile splits a tied boundary value by rank; thresholds put
      all ties on one side) — the differential test pins the agreement.
    """
    from pyspark.sql import Window

    nll = lm_nll_scores(df, text_col, id_col)
    langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    # deliberately NOT pinned at the fork: the union branches (and the
    # quantile cuts aggregate) share identical exchange subtrees, so
    # ReuseExchange computes each shuffle once and the per-consumer
    # reduce-side work past the cached exchange output is a cheap
    # projection/filter. Pinning was the measured-worse choice — cache
    # fill of the score table cost 0.96 s vs 0.40 s unpinned at sf0.1
    # (A/B 2026-08-15); at extreme scale a caller looping over many
    # splits can persist the returned frame themselves.
    scored_all = langs.join(nll, id_col, "left")
    unscorable = scored_all.filter(F.col("avg_nll").isNull()).select(
        id_col,
        "lang",
        F.col("avg_nll"),
        F.lit("tail").alias("split"),
    )
    scored = scored_all.filter(F.col("avg_nll").isNotNull())
    if method == "quantile":
        cuts = scored.groupBy("lang").agg(
            F.expr(
                "percentile(avg_nll, array(CAST(1.0/3.0 AS DOUBLE), "
                "CAST(2.0/3.0 AS DOUBLE)))"
            ).alias("__q")
        ).withColumnRenamed("lang", "__clang")
        labeled = (
            # eqNullSafe: a NULL-language group must find its own cuts
            # row (a plain equi-join drops NULL keys silently)
            scored.join(
                F.broadcast(cuts),
                F.col("lang").eqNullSafe(F.col("__clang")),
            )
            .select(
                id_col,
                "lang",
                "avg_nll",
                F.when(F.col("avg_nll") <= F.col("__q")[0], F.lit("head"))
                .when(F.col("avg_nll") <= F.col("__q")[1], F.lit("middle"))
                .otherwise(F.lit("tail"))
                .alias("split"),
            )
        )
        return labeled.unionByName(unscorable)
    if method != "ntile":
        raise ValueError(f"unknown split method {method!r}")
    w = Window.partitionBy("lang").orderBy(F.asc("avg_nll"), F.asc(id_col))
    labeled = (
        scored.withColumn("__t", F.ntile(3).over(w))
        .select(
            id_col,
            "lang",
            "avg_nll",
            F.when(F.col("__t") == 1, F.lit("head"))
            .when(F.col("__t") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("split"),
        )
    )
    return labeled.unionByName(unscorable)


_PPL_SPLIT_ORACLE = (
    "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), "
    "'\\s+')) AS tok FROM documents), "
    "t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
    "c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok), "
    "g AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_tokens, "
    "CAST(count(*) AS DOUBLE) AS vocab FROM c), "
    "nll AS (SELECT doc_id, round(avg(-ln((c.cnt + 1.0) / (g.n_tokens + g.vocab))), 6) "
    "AS avg_nll FROM t JOIN c USING (tok) CROSS JOIN g GROUP BY doc_id), "
    "r AS (SELECT nll.doc_id, d.lang, avg_nll, "
    "ntile(3) OVER (PARTITION BY d.lang ORDER BY avg_nll, nll.doc_id) AS t3 "
    "FROM nll JOIN documents d ON nll.doc_id = d.doc_id) "
    "SELECT doc_id, lang, avg_nll, "
    "CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS split "
    "FROM r "
    # unscorable docs (zero tokens: empty/whitespace text) route to tail
    # with NULL NLL — the output partitions the corpus
    "UNION ALL SELECT d.doc_id, d.lang, CAST(NULL AS DOUBLE) AS avg_nll, "
    "'tail' AS split FROM documents d LEFT JOIN nll ON d.doc_id = nll.doc_id "
    "WHERE nll.doc_id IS NULL"
)


@query(
    "q_perplexity_split",
    # ntile over (round(6) avg_nll, doc_id) is a total order, so the
    # tercile assignment is deterministic in both engines
    oracle=_PPL_SPLIT_ORACLE,
    doc=(
        "CCNet head/middle/tail split: per-language unigram-LM "
        "perplexity terciles over documents (head = lowest NLL). "
        "Composes the oracled LM scorer with one per-language ntile; "
        "the at-scale variant swaps the rank for per-lang quantile "
        "thresholds (see perplexity_split docstring)."
    ),
    tags=("text", "quality", "llm-pipeline"),
)
def q_perplexity_split(spark, sf_dir):
    return perplexity_split(_spread(T(spark, sf_dir, "documents")))


@query(
    "q_lm_perplexity",
    oracle=_LM_ORACLE,
    doc=(
        "Unigram-LM perplexity scoring (CCNet-style quality gate): "
        "add-one-smoothed corpus LM, per-document average negative "
        "log-likelihood. One vocab-bounded aggregate + a token-keyed "
        "join; the oracle replicates counts, smoothing, and the ln() "
        "arithmetic."
    ),
    tags=("text", "quality", "llm-pipeline"),
)
def q_lm_perplexity(spark, sf_dir):
    return lm_nll_scores(_spread(T(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Bigram corpus statistics: collocation mining (PMI), bigram LM estimation,
# per-document token entropy, Zipf-law fit. The reference has no text layer
# (it stores bytes, tools/columnfile-cat.cc only reinterprets them); these
# are the corpus-statistics operators an LLM-data pipeline runs over the
# same stored tables.
# ---------------------------------------------------------------------------


def _bigram_pairs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent lowercased whitespace-token pairs (w1, w2), extracted
    map-side with array `transform` over the token array — no
    explode-then-self-join and no window: the only exchange in any
    consumer is its own aggregation. Inner tokens of a whitespace split
    are never empty, so the w1/w2 <> '' guard only drops the [''] array
    of blank documents."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    pairs = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(toks, i + F.lit(2)).alias("w2")
        ),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )


_BIGRAM_CTE = (
    "t AS (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS toks "
    "FROM documents), "
    "b AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM ("
    "SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t) "
    "WHERE toks[i] <> '' AND toks[i + 1] <> ''), "
    "pc AS (SELECT w1, w2, count(*) AS pair_cnt FROM b GROUP BY w1, w2)"
)


def cooc_pmi(df: DataFrame, text_col: str = "text", min_count: int = 3) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent token
    pairs, PMI = ln(c12 * N / (c1 * c2)) with c1/c2 the left/right
    positional marginals.

    Plan shape: one map-side bigram pass feeds a (w1, w2) hash aggregate
    whose exchange is bigram-VOCABULARY-bounded (Heaps-law sublinear, not
    corpus-bounded); the marginals are window sums over that same
    aggregate keyed by w1 then w2 (two vocabulary-bounded exchanges, no
    joins, no second corpus scan), and N arrives as a 1-row aggregate
    cross join (broadcast nested loop). min_count filters BEFORE the
    marginal windows would be wrong (marginals must see all pairs), so
    the filter sits after them — it only cuts the output.
    """
    from libcolumnfile_spark.queries import pin

    # pc feeds the 1-row N aggregate AND the marginal windows; without a
    # persist the corpus-scale bigram Generate+aggregate executes once
    # per consumer. The pinned frame is bigram-vocabulary-bounded
    # (Heaps-law sublinear), so the cache cost stays corpus-independent.
    # (Trades this query's plan memoization for a full corpus pass.)
    pc = pin(
        _bigram_pairs(df, text_col).groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("pair_cnt")
        )
    )
    n = pc.agg(F.sum("pair_cnt").cast("double").alias("n_bigrams"))
    from pyspark.sql import Window

    c1 = F.sum("pair_cnt").over(Window.partitionBy("w1"))
    c2 = F.sum("pair_cnt").over(Window.partitionBy("w2"))
    return (
        pc.withColumn("c1", c1)
        .withColumn("c2", c2)
        .crossJoin(F.broadcast(n))
        .filter(F.col("pair_cnt") >= min_count)
        .select(
            "w1",
            "w2",
            "pair_cnt",
            F.round(
                F.log(
                    F.col("pair_cnt") * F.col("n_bigrams")
                    / (F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@query(
    "q_cooc_pmi",
    oracle=(
        # marginal windows computed BEFORE the min-count filter (WHERE in
        # the same SELECT would filter the window input), hence the
        # subquery
        f"WITH {_BIGRAM_CTE}, "
        "n AS (SELECT CAST(sum(pair_cnt) AS DOUBLE) AS n_bigrams FROM pc), "
        "m AS (SELECT w1, w2, pair_cnt, "
        "sum(pair_cnt) OVER (PARTITION BY w1) AS c1, "
        "sum(pair_cnt) OVER (PARTITION BY w2) AS c2 FROM pc) "
        "SELECT w1, w2, pair_cnt, "
        "round(ln(pair_cnt * n_bigrams / (c1 * c2)), 6) AS pmi "
        "FROM m CROSS JOIN n WHERE pair_cnt >= 3"
    ),
    doc=(
        "Collocation mining: PMI of adjacent token pairs against "
        "positional marginals. Map-side bigram extraction; every "
        "exchange is bigram-vocabulary-bounded."
    ),
    tags=("text", "llm-pipeline"),
)
def q_cooc_pmi(spark, sf_dir):
    return cooc_pmi(_spread(T(spark, sf_dir, "documents")))


def bigram_lm(df: DataFrame, text_col: str = "text", min_count: int = 2) -> DataFrame:
    """Bigram language-model estimation with add-one smoothing:
    log P(w2|w1) = ln((c12 + 1) / (c1 + V)), V = # distinct continuation
    types. The count-based LM-training step of a data pipeline (the same
    estimator family the CCNet-style scorer q_lm_perplexity consumes,
    but conditional and trained, not just applied).

    Same vocabulary-bounded plan as cooc_pmi: one bigram aggregate, a
    w1-keyed window sum for the context marginal, and a 1-row cross join
    carrying V.
    """
    from libcolumnfile_spark.queries import pin

    # same two-consumer shape as cooc_pmi: pc feeds the V-types arm and
    # the marginal window — pin the vocabulary-bounded aggregate so the
    # corpus-scale bigram pass executes once
    pc = pin(
        _bigram_pairs(df, text_col).groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("pair_cnt")
        )
    )
    v = pc.select("w2").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("v_types")
    )
    from pyspark.sql import Window

    c1 = F.sum("pair_cnt").over(Window.partitionBy("w1"))
    return (
        pc.withColumn("c1", c1)
        .crossJoin(F.broadcast(v))
        .filter(F.col("pair_cnt") >= min_count)
        .select(
            "w1",
            "w2",
            "pair_cnt",
            F.round(
                F.log((F.col("pair_cnt") + 1.0) / (F.col("c1") + F.col("v_types"))),
                6,
            ).alias("log_p"),
        )
    )


@query(
    "q_ngram_lm",
    oracle=(
        f"WITH {_BIGRAM_CTE}, "
        "v AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v_types FROM pc), "
        # context marginal windows before the min-count filter (same
        # subquery reasoning as q_cooc_pmi)
        "m AS (SELECT w1, w2, pair_cnt, "
        "sum(pair_cnt) OVER (PARTITION BY w1) AS c1 FROM pc) "
        "SELECT w1, w2, pair_cnt, "
        "round(ln((pair_cnt + 1.0) / (c1 + v_types)), 6) AS log_p "
        "FROM m CROSS JOIN v WHERE pair_cnt >= 2"
    ),
    doc=(
        "Bigram LM estimation: add-one-smoothed conditional "
        "log-probabilities over adjacent token pairs (count-based LM "
        "training as a vocabulary-bounded aggregate)."
    ),
    tags=("text", "llm-pipeline"),
)
def q_ngram_lm(spark, sf_dir):
    return bigram_lm(_spread(T(spark, sf_dir, "documents")))


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram token entropy (nats): H = ln n - (1/n) * sum
    c*ln c over the doc's token histogram, plus the ln(n_distinct)-
    normalized form — the repetition/diversity quality signal (a
    low-entropy doc is boilerplate or degenerate repetition; Gopher's
    repetition rules approximate this, the entropy is the principled
    version).

    Two hash aggregates: (doc, token) counts then per-doc entropy — the
    first exchange carries one row per distinct token per doc (bounded
    by doc length), the second one row per doc. Blank documents have no
    tokens and are excluded on both engines.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    hist = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("double")
    distinct = F.count(F.lit(1))
    h = F.log(n) - F.sum(F.col("c") * F.log("c")) / n
    return hist.groupBy("doc_id").agg(
        n.cast("bigint").alias("n_tokens"),
        distinct.alias("n_distinct"),
        F.round(h, 6).alias("entropy"),
        F.round(
            F.when(distinct > 1, h / F.log(distinct.cast("double"))).otherwise(0.0), 6
        ).alias("norm_entropy"),
    )


@query(
    "q_token_entropy",
    oracle=(
        "WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), "
        "'\\s+')) AS tok FROM documents), "
        "h AS (SELECT doc_id, tok, count(*) AS c FROM t WHERE tok <> '' "
        "GROUP BY doc_id, tok) "
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
        "count(*) AS n_distinct, "
        "round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c), 6) AS entropy, "
        "round(CASE WHEN count(*) > 1 THEN "
        "(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c)) "
        "/ ln(CAST(count(*) AS DOUBLE)) ELSE 0.0 END, 6) AS norm_entropy "
        "FROM h GROUP BY doc_id"
    ),
    doc=(
        "Per-document unigram token entropy + normalized entropy: the "
        "diversity/repetition quality signal as two hash aggregates."
    ),
    tags=("text", "quality", "llm-pipeline"),
)
def q_token_entropy(spark, sf_dir):
    return token_entropy(_spread(T(spark, sf_dir, "documents")))


def zipf_fit(df: DataFrame, text_col: str = "text", head: int = 1000) -> DataFrame:
    """Zipf-law fit over the corpus token frequency distribution: OLS of
    ln(freq) on ln(rank) over the top-`head` ranks (rank by (cnt DESC,
    token) — a total order, so the head cut is deterministic
    cross-engine). Returns one row: corpus token count, vocabulary
    size, fitted slope/intercept/R² (a healthy natural-language corpus
    sits near slope -1; a flat slope flags template/boilerplate
    corpora, a cliff flags deduplication damage).

    The frequency table is vocabulary-bounded (Heaps-law sublinear), so
    the global row_number window — normally forbidden — ranks a
    bounded side, same argument as tfidf's dfreq broadcast; the
    regression itself is one partial+final aggregate.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = freq.agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
    )
    ranked = freq.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("tok"))),
    ).filter(F.col("rank") <= head)
    y = F.log(F.col("cnt").cast("double"))
    x = F.log(F.col("rank").cast("double"))
    fit = ranked.agg(
        F.round(F.regr_slope(y, x), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(y, x), 6).alias("zipf_r2"),
    )
    return totals.crossJoin(F.broadcast(fit))


@query(
    "q_zipf_fit",
    oracle=(
        "WITH t AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), "
        "'\\s+')) AS tok FROM documents), "
        "f AS (SELECT tok, count(*) AS cnt FROM t WHERE tok <> '' GROUP BY tok), "
        "r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM f), "
        "fit AS (SELECT round(regr_slope(ln(CAST(cnt AS DOUBLE)), "
        "ln(CAST(rank AS DOUBLE))), 6) AS zipf_slope, "
        "round(regr_intercept(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) "
        "AS zipf_intercept, "
        "round(regr_r2(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) "
        "AS zipf_r2 FROM r WHERE rank <= 1000), "
        "tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens, "
        "count(*) AS vocab_size FROM f) "
        "SELECT n_tokens, vocab_size, zipf_slope, zipf_intercept, zipf_r2 "
        "FROM tot CROSS JOIN fit"
    ),
    doc=(
        "Zipf-law fit of the corpus token frequency head (OLS of "
        "ln freq on ln rank, top-1000 ranks): corpus-health "
        "diagnostics as one vocabulary-bounded aggregate + regression."
    ),
    tags=("text", "llm-pipeline"),
)
def q_zipf_fit(spark, sf_dir):
    return zipf_fit(_spread(T(spark, sf_dir, "documents")))


def tokenizer_fertility(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language tokenizer fertility: BPE-ish tokens per whitespace
    word (the standard tokenizer-efficiency eval — fertility far above
    the corpus norm for a language flags a vocabulary that fragments
    it, the signal behind per-language vocab allocation). One map-only
    pass (two JVM regex counts per row) + one language-bounded hash
    aggregate."""
    t = F.col(text_col)
    bpe = F.size(
        F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("bigint")
    return (
        df.select(
            "lang", token_count(t).alias("ws"), bpe.alias("bpe")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            F.round(
                F.sum("bpe").cast("double") / F.sum("ws").cast("double"), 6
            ).alias("fertility"),
        )
    )


@query(
    "q_tokenizer_fertility",
    oracle=(
        "SELECT lang, count(*) AS n_docs, "
        "CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE length(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) "
        "AS ws_tokens, "
        "CAST(sum(length(regexp_extract_all(text, "
        "'[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe_tokens, "
        "round(CAST(sum(length(regexp_extract_all(text, "
        "'[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))) AS DOUBLE) "
        "/ sum(CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE length(string_split_regex(trim(text), '\\s+')) END), 6) "
        "AS fertility "
        "FROM documents GROUP BY lang"
    ),
    doc=(
        "Per-language tokenizer fertility (BPE-ish tokens per "
        "whitespace word): map-only token counting + language-bounded "
        "aggregate — the tokenizer-efficiency eval."
    ),
    tags=("text", "quality", "llm-pipeline"),
)
def q_tokenizer_fertility(spark, sf_dir):
    return tokenizer_fertility(_spread(T(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# N-gram novelty: what fraction of each document's n-grams appear
# NOWHERE else in the corpus. The content-originality signal dual to
# contamination (overlap vs a benchmark) and repetition (overlap with
# itself): low-novelty documents are templated/syndicated content even
# when no single near-duplicate partner exists.
# ---------------------------------------------------------------------------


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty): per-document count of
    DISTINCT whitespace n-grams, how many occur in no other document,
    and their ratio.

    Scale design: grams reduce to 16-byte md5 keys before any exchange
    (the gram TEXT never shuffles). ONE shuffle keyed by gram hash
    computes corpus doc-frequency with map-side partials; the per-doc
    join back is keyed by the same hash, so at 100 TB the work is
    O(total tokens) exchange bytes with no pair blowup — the same class
    as the winnowing fingerprint and contamination screens. Within-doc
    gram dedup happens on the STRING form before hashing (a 128-bit
    within-doc collision between distinct grams is the only thing that
    could diverge the counts; md5 makes that negligible, and the oracle
    hashes identically).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    ).filter(F.size("toks") >= n)
    # the sequence upper bound is clamped to >= 1: the explode below makes
    # Spark infer an isnotnull/size filter over this expression, and
    # FilterExec hoists IsNotNull conjuncts IN FRONT of the size(toks) >= n
    # guard — on a short doc the unclamped sequence(1, size-4) runs
    # DESCENDING and slice(toks, 0, n) throws INVALID_PARAMETER_VALUE.
    # Clamped rows emit one garbage gram and are then dropped by the
    # size guard, so output is unchanged (regression-tested).
    gram_arr = toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("toks") - (n - 1), F.lit(1))
                ),
                lambda i: F.array_join(F.slice(F.col("toks"), i, n), " "),
            )
        ).alias("grams"),
    )
    # The tokenize + gram-build + md5 map pass is the dominant cost:
    # pin the exploded (doc_id, h) table so it runs ONCE (the old shape
    # re-executed it for the join-back probe side and re-shuffled every
    # gram row a second time). Both outputs then read the cache: the
    # per-doc gram count is a doc-keyed count, and the novelty count
    # rides the single gram-keyed doc-frequency aggregate — a df = 1
    # gram belongs to exactly one document, so min(doc_id) IS its
    # owner, and grouping the df = 1 survivors by owner replaces the
    # old full-gram-table join entirely. One O(tokens) gram-keyed
    # exchange total, then doc-bounded aggregates.
    from libcolumnfile_spark.queries import pin

    grams = pin(
        gram_arr.select("doc_id", F.explode("grams").alias("gram")).select(
            "doc_id", F.md5(F.col("gram")).alias("h")
        )
    )
    counts = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    novel = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("df") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        counts.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0).cast("bigint")).alias(
                "n_novel"
            ),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0))
                / F.col("n_grams").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


@query(
    "q_ngram_novelty",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks "
        "FROM documents), "
        "g AS (SELECT doc_id, unnest(list_transform(list_distinct("
        "list_transform(generate_series(1, len(toks) - 4), "
        "i -> array_to_string(toks[i:i+4], ' '))), s -> md5(s))) AS h "
        "FROM t WHERE len(toks) >= 5), "
        "f AS (SELECT h, count(*) AS df FROM g GROUP BY 1) "
        "SELECT g.doc_id, count(*) AS n_grams, "
        "CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_novel, "
        "round(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) "
        "/ CAST(count(*) AS DOUBLE), 6) AS novelty "
        "FROM g JOIN f ON g.h = f.h GROUP BY g.doc_id"
    ),
    doc=(
        "Per-document 5-gram novelty vs the rest of the corpus: distinct "
        "grams hashed to 16-byte keys, one gram-keyed doc-frequency "
        "shuffle, hash-keyed join back — O(tokens) exchange, no pair "
        "blowup."
    ),
    tags=("text", "dedup", "quality"),
)
def q_ngram_novelty(spark, sf_dir):
    # fine-sliced scan: the tokenize + 5-gram explode + md5 map stage is
    # the dominant cost and documents is below the coarse slice floor
    # (one scan task); _spread fans it out without an exchange
    return ngram_novelty(_spread(T(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: the eval face of q_lang_id. A labeled
# corpus (the fixture's lang column) scored by the detector yields the
# (actual, predicted) contingency table + per-actual-language fractions
# — the precision/recall surface a pipeline reads before trusting the
# detector's routing decisions.
# ---------------------------------------------------------------------------


def langid_confusion(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(lang, lang_guess, n_docs, frac): contingency counts of actual
    label vs detector guess, with frac = row-normalized share of the
    actual language (the diagonal's frac IS per-language recall).

    Scale design: the detector is the existing map-only staged
    projection (lang_id_frame); the contingency aggregate is keyed by
    (lang, lang_guess) — cardinality languages^2, trivially bounded —
    and the row totals derive from the CONTINGENCY counts (a second
    aggregate over languages^2 rows), never a second corpus pass.
    """
    conf = (
        lang_id_frame(df, text_col)
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    totals = conf.groupBy("lang").agg(F.sum("n_docs").alias("__tot"))
    return (
        conf.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "lang_guess",
            "n_docs",
            F.round(
                F.col("n_docs") / F.col("__tot").cast("double"), 6
            ).alias("frac"),
        )
    )


def _langid_confusion_oracle() -> str:
    """Wraps the generated q_lang_id detector SQL (same marker tables,
    same integer occurrence arithmetic) in the contingency aggregate."""
    score_exprs = []
    for lang, markers in _LANG_MARKERS.items():
        terms = [
            f"CAST((length(pd) - length(replace(pd, '{m}', ''))) / {len(m)} AS BIGINT)"
            for m in markers
        ]
        score_exprs.append(f"({' + '.join(terms)}) AS score_{lang}")
    langs = list(_LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lg} = {best} AND {best} > 0 THEN '{lg}'" for lg in langs
    ) + " ELSE 'und' END"
    return (
        "WITH p AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS pd "
        "FROM documents), "
        f"s AS (SELECT doc_id, lang, {', '.join(score_exprs)} FROM p), "
        f"g AS (SELECT lang, {case} AS lang_guess FROM s), "
        "c AS (SELECT lang, lang_guess, count(*) AS n_docs FROM g "
        "GROUP BY 1, 2), "
        "t AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS tot FROM c "
        "GROUP BY 1) "
        "SELECT c.lang, c.lang_guess, c.n_docs, "
        "round(c.n_docs / CAST(t.tot AS DOUBLE), 6) AS frac "
        "FROM c JOIN t ON c.lang = t.lang"
    )


@query(
    "q_langid_confusion",
    oracle=_langid_confusion_oracle(),
    doc=(
        "Language-ID confusion matrix over the labeled corpus: map-only "
        "detector + languages^2-bounded contingency aggregate; the "
        "diagonal frac is per-language recall."
    ),
    tags=("text", "quality", "eval"),
)
def q_langid_confusion(spark, sf_dir):
    return langid_confusion(_spread(T(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Distinctive terms per source: smoothed log-odds ratio of each token's
# in-source vs rest-of-corpus rate (the Monroe/Colaresi/Quinn
# "fightin' words" statistic with a flat +0.5 prior). The corpus
# profiler behind "what is domain X actually about" — reads the same
# token counts TF-IDF does but contrasts source-vs-rest instead of
# doc-vs-corpus.
# ---------------------------------------------------------------------------


def topic_words(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    topk: int = 5,
    min_count: int = 5,
    alpha: float = 0.5,
) -> DataFrame:
    """(source, token, n_in_source, delta, rnk): top-k tokens per group
    by smoothed log-odds vs the rest of the corpus.

    Scale design: ONE (group, token)-keyed count is the only row-scale
    exchange; per-group totals, per-token totals, and the corpus total
    all DERIVE from it (vocabulary- and group-bounded aggregates, no
    second corpus pass). The per-token join back is vocabulary-bounded;
    the 1-row corpus total broadcasts. Ranking windows partition by
    group over vocabulary-bounded rows. FP parity: delta is rounded to
    6 BEFORE ranking, so the (delta, token) order both engines rank on
    is identical despite last-ulp ln() differences.
    """
    tk = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("tok"),
    )
    c = tk.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("cws"))
    s = c.groupBy("grp").agg(F.sum("cws").alias("cs"))
    w = c.groupBy("tok").agg(F.sum("cws").alias("cw"))
    g = s.agg(F.sum("cs").alias("ctot"))
    a = F.lit(alpha)
    d = (
        c.filter(F.col("cws") >= min_count)
        .join(F.broadcast(s), "grp")
        .join(w, "tok")
        .crossJoin(F.broadcast(g))
        .select(
            "grp",
            "tok",
            "cws",
            F.round(
                F.log((F.col("cws") + a) / (F.col("cs") - F.col("cws") + a))
                - F.log(
                    (F.col("cw") - F.col("cws") + a)
                    / (
                        F.col("ctot")
                        - F.col("cs")
                        - (F.col("cw") - F.col("cws"))
                        + a
                    )
                ),
                6,
            ).alias("delta"),
        )
    )
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.desc("delta"), F.asc("tok"))
    )
    return (
        d.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= topk)
        .select(
            F.col("grp").alias("source"),
            F.col("tok").alias("token"),
            F.col("cws").alias("n_in_source"),
            "delta",
            "rnk",
        )
    )


@query(
    "q_topic_words",
    oracle=(
        "WITH tk AS (SELECT source AS grp, "
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok "
        "FROM documents), "
        "c AS (SELECT grp, tok, count(*) AS cws FROM tk GROUP BY 1, 2), "
        "s AS (SELECT grp, CAST(sum(cws) AS BIGINT) AS cs FROM c GROUP BY 1), "
        "w AS (SELECT tok, CAST(sum(cws) AS BIGINT) AS cw FROM c GROUP BY 1), "
        "g AS (SELECT CAST(sum(cs) AS BIGINT) AS ctot FROM s), "
        "d AS (SELECT c.grp, c.tok, c.cws, "
        "round(ln((c.cws + 0.5) / (s.cs - c.cws + 0.5)) "
        "- ln((w.cw - c.cws + 0.5) / "
        "(g.ctot - s.cs - (w.cw - c.cws) + 0.5)), 6) AS delta "
        "FROM c JOIN s ON c.grp = s.grp JOIN w ON c.tok = w.tok "
        "CROSS JOIN g WHERE c.cws >= 5), "
        "r AS (SELECT *, row_number() OVER "
        "(PARTITION BY grp ORDER BY delta DESC, tok) AS rnk FROM d) "
        "SELECT grp AS source, tok AS token, cws AS n_in_source, delta, "
        "CAST(rnk AS INT) AS rnk FROM r WHERE rnk <= 5"
    ),
    doc=(
        "Top-5 distinctive tokens per source by smoothed log-odds vs the "
        "rest of the corpus (fightin'-words statistic, +0.5 prior): one "
        "(source, token) count exchange, all totals derived from it, "
        "delta rounded before ranking for cross-engine order parity."
    ),
    tags=("text", "profile"),
)
def q_topic_words(spark, sf_dir):
    return topic_words(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine pairs: document similarity through the INVERTED
# index instead of dense embeddings — the classic sparse-vector dual of
# q_sim_pairs/q_dedup_embedding. Pairs are generated ONLY through
# shared informative tokens (a df cap drops stop-tokens, which
# contribute negligible cosine mass but quadratic pair fan-out), so
# candidate volume is sum over kept tokens of C(df, 2) — the
# blocking-bounded regime every dedup operator here lives in.
# ---------------------------------------------------------------------------


def sparse_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int = 50,
    threshold: float = 0.35,
) -> DataFrame:
    """(doc_a, doc_b, cosine): TF-IDF cosine of every doc pair sharing
    at least one token with document frequency <= df_cap, at cosine >=
    threshold. NORMS use the full vocabulary (the score is the true
    TF-IDF cosine restricted to informative-token dot mass); only pair
    GENERATION is df-capped.

    Scale design: term weights come from one (doc, token) count plus a
    vocabulary-bounded df aggregate joined back on the token key; norms
    are one doc-keyed aggregate. The pair stage shuffles postings on
    the token key — fan-out per token is C(df<=cap, 2), so the
    quadratic term is capped by construction and the cap is the recall/
    cost knob (same role as LSH band width). The dot aggregate is
    keyed by the (a, b) pair — its cardinality IS the candidate
    volume, already blocking-bounded. FP: dot/norm sums are fold-order
    dependent; round(6) on the final cosine absorbs the ~1e-15
    divergence (the decay_score tolerance argument).
    """
    tk = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("tok"),
    )
    tf = tk.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("nd"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # the df table is vocabulary-sized — NOT construction-bounded at
    # 100 TB (Heaps' law keeps minting tokens) — so the join back onto
    # term counts is pinned shuffle_hash; Catalyst's fixture-scale size
    # estimate would happily broadcast it and die at scale
    w = (
        tf.join(dfreq.hint("shuffle_hash"), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "tok",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(F.col("nd").cast("double") / F.col("df").cast("double"))
            ).alias("w"),
        )
    )
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    kept = w.filter(F.col("df") <= df_cap).select("id", "tok", "w")
    a = kept.select(
        F.col("tok"), F.col("id").alias("ida"), F.col("w").alias("wa")
    )
    b = kept.select(
        F.col("tok"), F.col("id").alias("idb"), F.col("w").alias("wb")
    )
    dots = (
        a.hint("shuffle_hash")
        .join(b.hint("shuffle_hash"), "tok")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("ida"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("id").alias("idb"), F.col("nrm").alias("nb"))
    return (
        dots.hint("shuffle_hash")
        .join(na.hint("shuffle_hash"), "ida")
        .join(nb.hint("shuffle_hash"), "idb")
        .select(
            F.col("ida").alias("doc_a"),
            F.col("idb").alias("doc_b"),
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


@query(
    "q_sparse_sim",
    oracle=(
        "WITH tk AS (SELECT doc_id AS id, "
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok "
        "FROM documents), "
        "tf AS (SELECT id, tok, count(*) AS tf FROM tk GROUP BY 1, 2), "
        "nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd "
        "FROM documents), "
        "dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1), "
        "w AS (SELECT tf.id, tf.tok, dfq.df, "
        "tf.tf * ln(nd.nd / dfq.df) AS w "
        "FROM tf JOIN dfq ON tf.tok = dfq.tok CROSS JOIN nd), "
        "nrm AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1), "
        "kept AS (SELECT id, tok, w FROM w WHERE df <= 50), "
        "dots AS (SELECT a.id AS ida, b.id AS idb, sum(a.w * b.w) AS dot "
        "FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id "
        "GROUP BY 1, 2) "
        "SELECT dots.ida AS doc_a, dots.idb AS doc_b, "
        "round(dots.dot / (na.nrm * nb.nrm), 6) AS cosine "
        "FROM dots JOIN nrm na ON dots.ida = na.id "
        "JOIN nrm nb ON dots.idb = nb.id "
        "WHERE round(dots.dot / (na.nrm * nb.nrm), 6) >= 0.35"
    ),
    doc=(
        "Sparse TF-IDF cosine document pairs through the inverted index "
        "(df-capped postings join bounds the quadratic term; norms over "
        "the full vocabulary): the sparse dual of the dense embedding "
        "pair generators."
    ),
    tags=("text", "similarity", "dedup"),
)
def q_sparse_sim(spark, sf_dir):
    return sparse_cosine_pairs(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Corpus drift: Jensen-Shannon divergence contributions between the
# unigram distributions of two corpus slices — the monitoring operator
# a training pipeline runs between ingestion batches ("did this crawl
# shift the token distribution, and which tokens moved?"). Reported
# per-token so the drift is ACTIONABLE (which vocabulary moved), not
# just a scalar alarm.
# ---------------------------------------------------------------------------


def corpus_drift(
    df: DataFrame,
    slice_expr: Column,
    text_col: str = "text",
    top_k: int = 100,
    alpha: float = 0.5,
) -> DataFrame:
    """Top-``top_k`` tokens by Jensen-Shannon divergence contribution
    between slice 0 and slice 1 of the corpus (``slice_expr`` must
    evaluate to 0/1). Token probabilities are Lidstone-smoothed
    (``alpha`` over the union vocabulary) so tokens absent from one
    slice stay finite. Returns (token, cnt_a, cnt_b, js_contrib),
    js_contrib rounded to 9 places (the smoothed probabilities are
    exact integer-derived doubles, so cross-engine differences are
    ~1 ulp of libm's log — far below the 1e-9 grain).

    Scale design: one token-keyed count aggregate with map-side
    partials (the only corpus-sized shuffle, same class as q_tfidf's),
    a 1-row totals broadcast, a vocabulary-sized map for the JS terms,
    and TakeOrdered for the top-k — no sort of the full vocabulary.
    """
    toks = df.select(
        slice_expr.cast("int").alias("sl"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    c = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("sl") == 0, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("sl") == 1, 1).otherwise(0)).alias("cnt_b"),
    )
    s = c.agg(
        F.sum("cnt_a").alias("tot_a"),
        F.sum("cnt_b").alias("tot_b"),
        F.count(F.lit(1)).alias("v"),
    )
    a = F.lit(float(alpha))
    x = c.crossJoin(F.broadcast(s)).select(
        F.col("tok").alias("token"),
        "cnt_a",
        "cnt_b",
        ((F.col("cnt_a") + a) / (F.col("tot_a") + a * F.col("v"))).alias("p"),
        ((F.col("cnt_b") + a) / (F.col("tot_b") + a * F.col("v"))).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    contrib = F.round(
        0.5 * F.col("p") * F.log(F.col("p") / m)
        + 0.5 * F.col("q") * F.log(F.col("q") / m),
        9,
    )
    return (
        x.select("token", "cnt_a", "cnt_b", contrib.alias("js_contrib"))
        .orderBy(F.desc("js_contrib"), F.asc("token"))
        .limit(top_k)
    )


@query(
    "q_corpus_drift",
    oracle=(
        "WITH t AS (SELECT doc_id % 2 AS sl, "
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok "
        "FROM documents), "
        "c AS (SELECT tok, "
        "CAST(sum(CASE WHEN sl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a, "
        "CAST(sum(CASE WHEN sl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b "
        "FROM t GROUP BY tok), "
        "s AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a, "
        "CAST(sum(cnt_b) AS BIGINT) AS tot_b, count(*) AS v FROM c), "
        "x AS (SELECT tok AS token, cnt_a, cnt_b, "
        "(cnt_a + 0.5) / (tot_a + 0.5 * v) AS p, "
        "(cnt_b + 0.5) / (tot_b + 0.5 * v) AS q "
        "FROM c CROSS JOIN s) "
        "SELECT token, cnt_a, cnt_b, "
        "round(0.5 * p * ln(p / ((p + q) / 2)) "
        "+ 0.5 * q * ln(q / ((p + q) / 2)), 9) AS js_contrib "
        "FROM x ORDER BY js_contrib DESC, token ASC LIMIT 100"
    ),
    doc=(
        "Corpus drift monitor: top-100 tokens by Jensen-Shannon "
        "divergence contribution between the even- and odd-doc_id "
        "corpus slices (Lidstone-smoothed unigram distributions; one "
        "token-keyed aggregate + 1-row totals broadcast + TakeOrdered)."
    ),
    tags=("text", "quality", "pipeline"),
)
def q_corpus_drift(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return corpus_drift(d, F.col("doc_id") % 2)


# ---------------------------------------------------------------------------
# Readability scoring (Flesch reading ease): the classic prose-difficulty
# heuristic from words/sentence and syllables/word — a quality-routing
# signal orthogonal to gopher_rules (structure) and perplexity (LM fit):
# curriculum builders bucket corpora by reading level. Syllables use the
# standard vowel-group proxy ([aeiouy]+ runs), identical regex semantics
# in Java and RE2, so the score is engine-exact before rounding.
# ---------------------------------------------------------------------------


def readability(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch): Flesch
    reading ease 206.835 - 1.015*(words/sentences) - 84.6*(syllables/
    words), sentence count floored at 1 (fragments still score).

    Scale design: pure map — three regex passes per document, zero
    shuffles; rows ride idle cores (the q_gopher_rules shape). The
    regexes are linear-time character classes, no backtracking."""
    trimmed = F.trim(F.col(text_col))
    n_words = F.size(F.split(trimmed, r"\s+"))
    n_syll = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"), F.lit(0)))
    n_sent = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), F.lit(0)))
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent)
        - F.lit(84.6) * (n_syll.cast("double") / n_words)
    )
    return df.filter(F.length(trimmed) > 0).select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syll.cast("bigint").alias("n_syllables"),
        F.round(flesch, 4).alias("flesch"),
    )


@query(
    "q_readability",
    oracle=(
        "WITH b AS (SELECT doc_id, "
        "len(string_split_regex(trim(text), '\\s+')) AS n_words, "
        "greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences, "
        "len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables "
        "FROM documents WHERE length(trim(text)) > 0) "
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
        "CAST(n_sentences AS BIGINT) AS n_sentences, "
        "CAST(n_syllables AS BIGINT) AS n_syllables, "
        "round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences) "
        "- 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch "
        "FROM b"
    ),
    doc=(
        "Flesch reading-ease score per document (vowel-group syllable "
        "proxy, sentence count floored at 1): three linear regex passes, "
        "pure map, zero shuffles — the prose-difficulty routing signal."
    ),
    tags=("text", "quality"),
)
def q_readability(spark, sf_dir):
    return readability(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Classifier calibration (reliability bins): before a quality classifier
# gates a corpus, check whether its scores MEAN anything — bin documents
# by score and compare each bin's mean score against its observed
# positive rate. The eval face of q_classifier_filter, the way
# q_ann_recall is the eval face of the ANN index and q_langid_confusion
# of the language detector.
# ---------------------------------------------------------------------------


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n, mean_score, pos_rate): fixed-width score bins over the
    observed [min, max] with each bin's size, mean score, and positive-
    label rate — the reliability-diagram table (top score bin must show
    a higher pos_rate than the bottom, or the gate is noise).

    Scale design: one 1-row min/max aggregate broadcast back, then one
    bin-keyed aggregate with map-side partials (exchange bounded by
    n_bins) — two scans total, no row-scale shuffle. Degenerate
    all-equal-score corpora collapse to bin 0 instead of dividing by a
    zero width.
    """
    s = df.agg(F.min(score_col).alias("__mn"), F.max(score_col).alias("__mx"))
    j = df.crossJoin(F.broadcast(s))
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(n_bins))
    bin_ = (
        F.when(width == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor((F.col(score_col) - F.col("__mn")) / width),
            )
        )
        .cast("int")
    )
    return j.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(score_col), 6).alias("mean_score"),
        F.round(F.avg(F.col(label_col).cast("double")), 6).alias("pos_rate"),
    )


def _calibration_oracle() -> str:
    # same scorer SQL as q_classifier_filter, without the >= 0 gate
    from libcolumnfile_spark.operators.pipeline import _bucket_sql

    wlit = "[" + ", ".join(repr(float(x)) for x in _clf_weights()) + "]"
    bucket = _bucket_sql("tk", _CLF_DIM)
    return (
        "WITH t AS (SELECT doc_id, lang, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        "sc AS (SELECT CAST(lang = 'en' AS INT) AS label, "
        f"round(list_sum(list_transform(toks, tk -> ({wlit})[({bucket}) + 1])) "
        "/ len(toks), 6) AS score FROM t), "
        "mm AS (SELECT min(score) AS mn, max(score) AS mx FROM sc) "
        "SELECT CAST(CASE WHEN (mx - mn) / 10.0 = 0 THEN 0 "
        "ELSE least(9, floor((score - mn) / ((mx - mn) / 10.0))) END AS INT) "
        "AS bin, count(*) AS n, round(avg(score), 6) AS mean_score, "
        "round(avg(CAST(label AS DOUBLE)), 6) AS pos_rate "
        "FROM sc CROSS JOIN mm GROUP BY 1"
    )


@query(
    "q_calibration_bins",
    oracle=_calibration_oracle(),
    doc=(
        "Reliability-diagram table for the quality classifier: 10 "
        "fixed-width score bins (1-row min/max broadcast) with per-bin "
        "size, mean score, and en-label positive rate — the calibration "
        "eval run before trusting a classifier gate."
    ),
    tags=("text", "quality", "pipeline", "stats"),
)
def q_calibration_bins(spark, sf_dir):
    d = _spread(T(spark, sf_dir, "documents"))
    scored = d.select(
        (F.col("lang") == "en").cast("int").alias("label"),
        classifier_score(F.col("text")).alias("score"),
    )
    return calibration_bins(scored, "score", "label")


# ---------------------------------------------------------------------------
# Source vocabulary overlap: pairwise Jaccard similarity of the DISTINCT
# token vocabularies of every source pair — the "are these two crawls
# the same register/domain?" diagnostic that decides whether sources can
# share mixing weights, and the token-level dual of the document-level
# dedup operators.
# ---------------------------------------------------------------------------


def source_vocab_overlap(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(src_a, src_b, n_common, n_union, jaccard) for every unordered
    source pair (src_a < src_b lexicographically).

    Scale design: the corpus reduces to DISTINCT (source, token) pairs
    first (one token-keyed dedup aggregate — the only corpus-sized
    exchange); the pair join is keyed by token and fans out at most
    C(sources, 2) rows per token, so with S sources the intersection
    table is vocab x S^2 bounded — never corpus^2. Vocabulary sizes
    come from the same distinct table; the final Jaccard is a bounded
    S^2 join. Both token-keyed join sides are the SAME vocab-sized
    frame: pinned shuffle_hash so a stats estimate never broadcasts an
    unbounded vocabulary.
    """
    st = (
        df.select(
            F.col(group_col).alias("s"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
                )
            ).alias("tok"),
        )
        .distinct()
    )
    from libcolumnfile_spark.queries import pin

    st = pin(st)
    inter = (
        st.alias("x")
        .join(
            st.alias("y").hint("shuffle_hash"),
            (F.col("x.tok") == F.col("y.tok")) & (F.col("x.s") < F.col("y.s")),
        )
        .groupBy(F.col("x.s").alias("src_a"), F.col("y.s").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = st.groupBy("s").agg(F.count(F.lit(1)).alias("n_vocab"))
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("s", "src_a")), "src_a")
        .withColumnRenamed("n_vocab", "va")
        .join(F.broadcast(sizes.withColumnRenamed("s", "src_b")), "src_b")
        .withColumnRenamed("n_vocab", "vb")
        .select(
            "src_a",
            "src_b",
            "n_common",
            (F.col("va") + F.col("vb") - F.col("n_common")).alias("n_union"),
            F.round(
                F.col("n_common")
                / (F.col("va") + F.col("vb") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "q_source_overlap",
    oracle=(
        "WITH st AS (SELECT DISTINCT source AS s, "
        "unnest(list_distinct(string_split_regex(lower(trim(text)), "
        "'\\s+'))) AS tok FROM documents), "
        "i AS (SELECT x.s AS src_a, y.s AS src_b, count(*) AS n_common "
        "FROM st x JOIN st y ON x.tok = y.tok AND x.s < y.s "
        "GROUP BY 1, 2), "
        "z AS (SELECT s, count(*) AS n_vocab FROM st GROUP BY s) "
        "SELECT src_a, src_b, n_common, "
        "CAST(za.n_vocab + zb.n_vocab - n_common AS BIGINT) AS n_union, "
        "round(n_common / CAST(za.n_vocab + zb.n_vocab - n_common "
        "AS DOUBLE), 6) AS jaccard "
        "FROM i JOIN z za ON i.src_a = za.s JOIN z zb ON i.src_b = zb.s"
    ),
    doc=(
        "Pairwise source-vocabulary Jaccard: corpus reduced to distinct "
        "(source, token) pairs, token-keyed pair join bounded by "
        "C(sources,2) per token (shuffle_hash-pinned), sizes derived "
        "from the same distinct table — the register/domain similarity "
        "diagnostic before sharing mixing weights."
    ),
    tags=("text", "pipeline", "dedup"),
)
def q_source_overlap(spark, sf_dir):
    return source_vocab_overlap(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: cumulative share of all token occurrences
# covered by the top-k most frequent tokens — the "how big must the
# vocabulary be?" planning table a tokenizer build reads first (the
# inverse view of q_vocab_coverage's fixed-vocab OOV rate).
# ---------------------------------------------------------------------------


def vocab_coverage_curve(
    df: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """(rank, tok, freq, cum_coverage) for the ``top_k`` most frequent
    tokens, with cum_coverage = cumulative occurrence share under the
    (freq DESC, tok ASC) total order.

    Scale design: one token-keyed count aggregate is the only corpus-
    sized exchange; the rank/cumsum window runs over the VOCABULARY
    table (the q_zipf_fit head precedent), and the 1-row total rides
    the same window spec. Output bounded at top_k.
    """
    from pyspark.sql import Window

    tf = (
        df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    cum = Window.orderBy(F.desc("freq"), F.asc("tok")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    return (
        tf.select(
            F.row_number().over(w).alias("rank"),
            "tok",
            "freq",
            F.round(
                F.sum("freq").over(cum) / F.sum("freq").over(tot).cast("double"),
                6,
            ).alias("cum_coverage"),
        )
        .filter(F.col("rank") <= top_k)
    )


@query(
    "q_coverage_curve",
    oracle=(
        "WITH tf AS (SELECT unnest(string_split_regex(lower(trim(text)), "
        "'\\s+')) AS tok FROM documents), "
        "c AS (SELECT tok, count(*) AS freq FROM tf GROUP BY tok), "
        "r AS (SELECT row_number() OVER (ORDER BY freq DESC, tok) AS rank, "
        "tok, freq, "
        "sum(freq) OVER (ORDER BY freq DESC, tok "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
        "sum(freq) OVER () AS tot FROM c) "
        "SELECT CAST(rank AS INT) AS rank, tok, freq, "
        "round(cum / CAST(tot AS DOUBLE), 6) AS cum_coverage "
        "FROM r WHERE rank <= 100"
    ),
    doc=(
        "Vocabulary coverage curve: cumulative occurrence share of the "
        "top-100 tokens (one token-keyed aggregate; rank/cumsum windows "
        "over the vocabulary table only) — the vocab-size planning "
        "table, inverse of q_vocab_coverage's fixed-vocab OOV rate."
    ),
    tags=("text", "pipeline"),
)
def q_coverage_curve(spark, sf_dir):
    return vocab_coverage_curve(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Pairwise Jensen-Shannon divergence between source unigram
# distributions — the DISTRIBUTIONAL companion to q_source_overlap's
# set-Jaccard: two sources can share 90% of their vocabulary and still
# use it with completely different frequencies. JS (symmetric, bounded
# [0,1] in log2) is the standard corpus-similarity cell in a mixing
# study's source-by-source heatmap.
# ---------------------------------------------------------------------------


def source_js_divergence(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(src_a, src_b, n_common, js) for every unordered source pair
    SHARING at least one token — a pair with fully disjoint
    vocabularies (JS exactly 1) never reaches the inner join and is
    absent from the output by design (enshrined in the unit tests);
    real corpora never hit this, but a heatmap consumer should treat a
    missing cell as js = 1, not as missing data.

    Scale design: the corpus collapses to ONE (source, token)-keyed
    count aggregate; per-source totals are a source-cardinality-bounded
    broadcast. The pair join runs token-keyed (shuffle_hash both sides —
    a probability table is vocabulary-sized, never broadcast-safe) and
    emits at most C(sources, 2) rows per token. Tokens private to one
    side never enter the join: their JS mass is exactly
    0.5 * (1 - common_probability_mass) per side, recovered
    arithmetically from the common-token sums — no full-outer support
    union anywhere.
    """
    tf = (
        df.select(
            F.col("source").alias("s"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("tok"),
        )
        .groupBy("s", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = tf.groupBy("s").agg(F.sum("c").alias("t"))
    p = tf.join(F.broadcast(tot), "s").select(
        "s", "tok", (F.col("c") / F.col("t")).alias("p")
    )
    x, y = p.alias("x"), p.alias("y").hint("shuffle_hash")
    px, py = F.col("x.p"), F.col("y.p")
    log2 = lambda c: F.log(2.0, c)  # noqa: E731
    common_term = 0.5 * px * log2(2 * px / (px + py)) + 0.5 * py * log2(
        2 * py / (px + py)
    )
    pairs = (
        x.join(
            y,
            (F.col("x.tok") == F.col("y.tok")) & (F.col("x.s") < F.col("y.s")),
        )
        .groupBy(
            F.col("x.s").alias("src_a"), F.col("y.s").alias("src_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(common_term).alias("common"),
            F.sum(px).alias("pc"),
            F.sum(py).alias("qc"),
        )
    )
    return pairs.select(
        "src_a",
        "src_b",
        "n_common",
        F.round(
            F.col("common")
            + 0.5 * (1 - F.col("pc"))
            + 0.5 * (1 - F.col("qc")),
            6,
        ).alias("js"),
    )


@query(
    "q_js_divergence",
    oracle=(
        "WITH tf AS (SELECT source AS s, "
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok "
        "FROM documents), "
        "c AS (SELECT s, tok, count(*) AS c FROM tf GROUP BY 1, 2), "
        "t AS (SELECT s, sum(c) AS t FROM c GROUP BY s), "
        "p AS (SELECT c.s, tok, c / CAST(t AS DOUBLE) AS p "
        "FROM c JOIN t ON c.s = t.s), "
        "j AS (SELECT x.s AS src_a, y.s AS src_b, count(*) AS n_common, "
        "sum(0.5 * x.p * log2(2 * x.p / (x.p + y.p)) "
        "+ 0.5 * y.p * log2(2 * y.p / (x.p + y.p))) AS common, "
        "sum(x.p) AS pc, sum(y.p) AS qc "
        "FROM p x JOIN p y ON x.tok = y.tok AND x.s < y.s GROUP BY 1, 2) "
        "SELECT src_a, src_b, n_common, "
        "round(common + 0.5 * (1 - pc) + 0.5 * (1 - qc), 6) AS js FROM j"
    ),
    doc=(
        "Pairwise Jensen-Shannon divergence between source unigram "
        "distributions: one (source, token) count aggregate, token-"
        "keyed pair join bounded by C(sources,2) per token "
        "(shuffle_hash), single-side token mass recovered from the "
        "common-token probability sums — no full-outer support union."
    ),
    tags=("text", "stats", "pipeline"),
)
def q_js_divergence(spark, sf_dir):
    return source_js_divergence(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every document by
# the log-likelihood ratio of its unigrams under a TARGET distribution
# (one in-domain source) vs the RAW corpus distribution, add-1
# smoothed. The standard "find more data that looks like my target
# domain" selector a pretraining pipeline runs over a raw crawl.
# ---------------------------------------------------------------------------


def dsir_weights(
    df: DataFrame,
    target_source: str = "src0",
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` docs by DSIR importance weight: (doc_id, n_tok,
    weight) with weight = sum over doc tokens of
    log P_target(tok) - log P_raw(tok), add-1 smoothed over the shared
    vocabulary.

    Scale design: one token-keyed count aggregate carries BOTH
    distributions (count_if on the target source alongside the raw
    count — a second corpus pass would double the dominant cost);
    smoothing totals are a 1-row broadcast; the per-token log-ratio
    joins back to the exploded token stream token-keyed
    (shuffle_hash — a vocabulary table is unbounded); one doc-keyed sum
    and a TakeOrdered(top_k) finish. Rank on the ROUNDED weight with a
    doc_id tie-break so the cut is engine-stable.
    """
    toks = df.select(
        "doc_id",
        F.col("source").alias("s"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "tok"
        ),
    )
    vocab = toks.groupBy("tok").agg(
        F.count_if(F.col("s") == target_source).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    tot = vocab.agg(
        F.sum("ct").alias("tt"),
        F.sum("cr").alias("tr"),
        F.count(F.lit(1)).alias("v"),
    )
    lr = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        (
            F.log((F.col("ct") + 1) / (F.col("tt") + F.col("v")))
            - F.log((F.col("cr") + 1) / (F.col("tr") + F.col("v")))
        ).alias("lr"),
    )
    w = (
        toks.join(lr.hint("shuffle_hash"), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(F.sum("lr"), 4).alias("weight"),
        )
    )
    return w.orderBy(F.desc("weight"), "doc_id").limit(top_k)


@query(
    "q_dsir_weights",
    oracle=(
        "WITH toks AS (SELECT doc_id, source AS s, "
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok "
        "FROM documents), "
        "v AS (SELECT tok, count(*) FILTER (s = 'src0') AS ct, "
        "count(*) AS cr FROM toks GROUP BY tok), "
        "t AS (SELECT sum(ct) AS tt, sum(cr) AS tr, count(*) AS vv FROM v), "
        "lr AS (SELECT tok, ln((ct + 1) / CAST(tt + vv AS DOUBLE)) "
        "- ln((cr + 1) / CAST(tr + vv AS DOUBLE)) AS lr "
        "FROM v CROSS JOIN t), "
        "w AS (SELECT doc_id, count(*) AS n_tok, "
        "round(sum(lr), 4) AS weight "
        "FROM toks JOIN lr USING (tok) GROUP BY doc_id) "
        "SELECT doc_id, n_tok, weight FROM w "
        "ORDER BY weight DESC, doc_id LIMIT 50"
    ),
    doc=(
        "DSIR importance weights (Xie et al. 2023): per-doc unigram "
        "log-likelihood ratio of one target source vs the raw corpus, "
        "add-1 smoothed — both distributions from ONE token-keyed "
        "aggregate, 1-row smoothing broadcast, token-keyed log-ratio "
        "join back (shuffle_hash), doc-keyed sum + TakeOrdered(50) on "
        "the rounded weight."
    ),
    tags=("text", "pipeline"),
)
def q_dsir_weights(spark, sf_dir):
    return dsir_weights(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Quality-filter threshold sweep — the operating-point table read
# before committing to a filter cut: for each candidate threshold, how
# many documents and what fraction of the TOKEN budget survive. Run
# once per candidate model; the chosen point becomes
# q_classifier_filter's production threshold.
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS = [-0.2, -0.15, -0.1, -0.05, 0.0, 0.05, 0.1, 0.15, 0.2]


def threshold_sweep(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(threshold, n_kept, frac_docs, frac_tokens) for each candidate
    classifier threshold.

    Scale design: ONE algebraic aggregate computes every sweep point —
    per-threshold conditional doc and token sums ride the same 1-row
    exchange next to the totals (the q_corr_matrix shape); the
    per-threshold unpivot explodes after aggregation. Scoring is the
    map-side Catalyst classifier (no UDF, no shuffle). The naive form
    — one filtered pass per threshold — scans the corpus k times.
    """
    scored = df.select(
        classifier_score(F.col(text_col)).alias("s"),
        token_count(F.col(text_col)).alias("tok"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("tok").alias("t"),
    ]
    for i, th in enumerate(_SWEEP_THRESHOLDS):
        keep = F.col("s") >= F.lit(th)
        aggs.append(F.count_if(keep).alias(f"k{i}"))
        # no .otherwise(0): an all-dropped threshold must yield NULL to
        # match the oracle's sum(..) FILTER semantics, not a 0.0 row
        aggs.append(F.sum(F.when(keep, F.col("tok"))).alias(f"kt{i}"))
    s = scored.agg(*aggs)
    rows = [
        F.struct(
            F.lit(th).alias("threshold"),
            F.col(f"k{i}").alias("n_kept"),
            F.round(F.col(f"k{i}") / F.col("n"), 6).alias("frac_docs"),
            F.round(F.col(f"kt{i}") / F.col("t"), 6).alias("frac_tokens"),
        )
        for i, th in enumerate(_SWEEP_THRESHOLDS)
    ]
    return s.select(F.explode(F.array(*rows)).alias("x")).select("x.*")


def _threshold_sweep_oracle() -> str:
    from libcolumnfile_spark.operators.text import _clf_weights, _CLF_DIM
    from libcolumnfile_spark.operators.pipeline import _bucket_sql

    wlit = "[" + ", ".join(repr(float(x)) for x in _clf_weights()) + "]"
    bucket = _bucket_sql("tk", _CLF_DIM)
    sums = ["count(*) AS n", "sum(tok) AS t"]
    for i, th in enumerate(_SWEEP_THRESHOLDS):
        sums.append(f"count(*) FILTER (s >= {th!r}) AS k{i}")
        sums.append(f"sum(tok) FILTER (s >= {th!r}) AS kt{i}")
    rows = [
        f"SELECT CAST({th!r} AS DOUBLE) AS threshold, CAST(k{i} AS BIGINT) AS n_kept, "
        f"round(k{i} / CAST(n AS DOUBLE), 6) AS frac_docs, "
        f"round(kt{i} / CAST(t AS DOUBLE), 6) AS frac_tokens FROM a"
        for i, th in enumerate(_SWEEP_THRESHOLDS)
    ]
    return (
        "WITH t AS (SELECT text, string_split_regex(lower(trim(text)), '\\s+') "
        "AS toks FROM documents), "
        f"sc AS (SELECT round(list_sum(list_transform(toks, tk -> {wlit}"
        f"[({bucket}) + 1])) / len(toks), 6) AS s, "
        # empty-text guard: token_count() is 0 for blank docs, DuckDB's
        # unguarded len() would be 1 (the repo-standard oracle CASE)
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END AS tok "
        "FROM t), "
        f"a AS (SELECT {', '.join(sums)} FROM sc) "
        + " UNION ALL ".join(rows)
    )


@query(
    "q_threshold_sweep",
    oracle=_threshold_sweep_oracle(),
    doc=(
        "Quality-filter operating-point sweep: per-threshold surviving "
        "doc and token fractions, every sweep point computed by ONE "
        "algebraic aggregate over the map-side Catalyst classifier "
        "score (the q_corr_matrix single-exchange shape; the naive "
        "form scans the corpus once per threshold)."
    ),
    tags=("text", "pipeline", "stats"),
)
def q_threshold_sweep(spark, sf_dir):
    return threshold_sweep(T(spark, sf_dir, "documents"))




# ---------------------------------------------------------------------------
# NDCG@10 retrieval evaluation — graded ranking quality of the BM25
# scorer per single-term query, with relevance = (capped) raw term
# frequency. The index-quality eval for the IR family, the way
# q_ann_recall evaluates the ANN family: "the ranker returns SOMETHING
# — how close is it to the ideal ordering?"
# ---------------------------------------------------------------------------

_NDCG_K = 10


def ndcg_eval(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = _NDCG_K,
) -> DataFrame:
    """(term, dcg, idcg, ndcg) per single-term query: NDCG@k of the
    BM25 ranking against graded relevance rel = min(tf, 4), rounded
    to 6. Ranking and ideal ordering both tie-break by doc_id on the
    ROUNDED score, so both engines cut identical top-k sets.

    Scale design: identical map-side scoring pass as bm25_topk (per-
    term tf is a row-local HOF count; corpus stats are ONE exact 1-row
    integer agg broadcast back), then the per-(query, doc) candidate
    list — already filtered to tf > 0 — ranks under two query-
    partitioned row_number windows and collapses to one k-bounded
    aggregate per query. Window parallelism equals query-batch
    cardinality; a huge query batch would swap the windows for the
    two-phase salted top-k (the q_ann_recall machinery), same
    semantics.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    )

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    per_doc = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.size(F.filter(F.col("toks"), _eq(t))).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint"))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    branches = []
    for i, t in enumerate(terms):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        raw = (idf * tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
        branches.append(
            F.struct(
                F.lit(t).alias("term"),
                F.least(F.col(f"tf{i}"), F.lit(4)).cast("int").alias("rel"),
                F.round(raw, 6).alias("score"),
                (F.col(f"tf{i}") > 0).alias("hit"),
            )
        )
    cand = (
        per_doc.crossJoin(F.broadcast(stats))
        .select("doc_id", F.explode(F.array(*branches)).alias("x"))
        .select("doc_id", "x.term", "x.rel", "x.score", "x.hit")
        .filter(F.col("hit"))
    )
    from pyspark.sql.window import Window

    ws = Window.partitionBy("term").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    wr = Window.partitionBy("term").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ranked = cand.select(
        "term",
        "rel",
        F.row_number().over(ws).alias("rs"),
        F.row_number().over(wr).alias("rr"),
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1.0
    out = ranked.groupBy("term").agg(
        F.sum(
            F.when(F.col("rs") <= k, gain / F.log2(F.col("rs") + 1)).otherwise(0.0)
        ).alias("dcg_raw"),
        F.sum(
            F.when(F.col("rr") <= k, gain / F.log2(F.col("rr") + 1)).otherwise(0.0)
        ).alias("idcg_raw"),
    )
    return out.select(
        "term",
        F.round("dcg_raw", 6).alias("dcg"),
        F.round("idcg_raw", 6).alias("idcg"),
        F.round(F.col("dcg_raw") / F.col("idcg_raw"), 6).alias("ndcg"),
    )


def _ndcg_oracle(
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = _NDCG_K,
) -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms))
    )
    branches = " UNION ALL ".join(
        f"SELECT doc_id, '{t}' AS term, "
        f"CAST(least(tf{i}, 4) AS INT) AS rel, "
        f"round((ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) "
        f"* CAST(tf{i} AS DOUBLE) * ({k1} + 1.0)) "
        f"/ (CAST(tf{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b} * dl / avgdl)), "
        f"6) AS score FROM p CROSS JOIN g WHERE tf{i} > 0"
        for i, t in enumerate(terms)
    )
    return (
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        f"p AS (SELECT doc_id, len(toks) AS dl, {tf_cols} FROM t), "
        "g AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl, "
        f"{df_cols} FROM p), "
        f"u AS ({branches}), "
        "r AS (SELECT term, rel, "
        "row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) "
        "AS rs, "
        "row_number() OVER (PARTITION BY term ORDER BY rel DESC, doc_id) "
        "AS rr FROM u), "
        "d AS (SELECT term, "
        f"sum(CASE WHEN rs <= {k} THEN (pow(2.0, rel) - 1.0) / log2(rs + 1) "
        "ELSE 0.0 END) AS dcg_raw, "
        f"sum(CASE WHEN rr <= {k} THEN (pow(2.0, rel) - 1.0) / log2(rr + 1) "
        "ELSE 0.0 END) AS idcg_raw FROM r GROUP BY 1) "
        "SELECT term, round(dcg_raw, 6) AS dcg, round(idcg_raw, 6) AS idcg, "
        "round(dcg_raw / idcg_raw, 6) AS ndcg FROM d"
    )


@query(
    "q_ndcg",
    oracle=_ndcg_oracle(_BM25_TERMS),
    doc=(
        "NDCG@10 of the BM25 ranker per single-term query (relevance = "
        "capped term frequency): one map-side scoring pass + one exact "
        "1-row corpus-stats broadcast (the bm25_topk plan), then two "
        "query-partitioned rank windows over the tf>0 candidate list "
        "collapse to a k-bounded aggregate per query — the graded "
        "retrieval-quality eval next to q_ann_recall's recall."
    ),
    tags=("text", "similarity", "eval", "llm-pipeline"),
)
def q_ndcg(spark, sf_dir):
    return ndcg_eval(T(spark, sf_dir, "documents"), _BM25_TERMS)


# ---------------------------------------------------------------------------
# Quality-filter ablation — per-rule rejection attribution for the
# gopher_rules gate: how many docs each rule fails, and how many it
# UNIQUELY fails (would survive every other rule). The "which filter is
# actually doing the work / which can be dropped" audit run before
# tightening a pipeline gate; uniquely-failed counts are the marginal
# value of each rule.
# ---------------------------------------------------------------------------


def filter_ablation(flags: DataFrame) -> DataFrame:
    """(rule, n_fail, n_fail_only, fail_frac) per gopher rule, from the
    per-doc flag frame emitted by gopher_rules.

    Scale design: ONE algebraic aggregate computes every rule's fail
    and unique-fail count in a single pass (count_if columns with
    map-side combine — the q_threshold_sweep single-exchange shape);
    the per-rule unpivot explodes 4 structs on the 1-row result. The
    naive form scans the corpus once per rule arm.
    """
    rules = ["ok_count", "ok_len", "ok_stop", "ok_unique"]
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for r in rules:
        others = [c for c in rules if c != r]
        aggs.append(F.count_if(~F.col(r)).alias(f"fail_{r}"))
        only = ~F.col(r)
        for o in others:
            only = only & F.col(o)
        aggs.append(F.count_if(only).alias(f"only_{r}"))
    s = flags.agg(*aggs)
    structs = [
        F.struct(
            F.lit(r.replace("ok_", "")).alias("rule"),
            F.col(f"fail_{r}").alias("n_fail"),
            F.col(f"only_{r}").alias("n_fail_only"),
            F.round(F.col(f"fail_{r}") / F.col("n_docs"), 4).alias("fail_frac"),
        )
        for r in rules
    ]
    return s.select(F.explode(F.array(*structs)).alias("x")).select("x.*")


@query(
    "q_filter_ablation",
    oracle=(
        f"WITH g AS ({_GOPHER_ORACLE}), "
        "s AS (SELECT count(*) AS n, "
        + ", ".join(
            f"count(*) FILTER (NOT {r}) AS fail_{r}, "
            f"count(*) FILTER (NOT {r} AND "
            + " AND ".join(o for o in ["ok_count", "ok_len", "ok_stop", "ok_unique"] if o != r)
            + f") AS only_{r}"
            for r in ["ok_count", "ok_len", "ok_stop", "ok_unique"]
        )
        + " FROM g) "
        + " UNION ALL ".join(
            f"SELECT '{r.replace('ok_', '')}' AS rule, "
            f"fail_{r} AS n_fail, only_{r} AS n_fail_only, "
            f"round(CAST(fail_{r} AS DOUBLE) / n, 4) AS fail_frac FROM s"
            for r in ["ok_count", "ok_len", "ok_stop", "ok_unique"]
        )
    ),
    doc=(
        "Per-rule rejection attribution for the gopher quality gate "
        "(fail count, UNIQUE-fail count = the rule's marginal value, "
        "fail fraction): one algebraic aggregate computes all 4 rule "
        "arms in a single corpus pass, 4-struct unpivot on the 1-row "
        "result — the filter-tuning audit."
    ),
    tags=("text", "pipeline", "stats", "eval"),
)
def q_filter_ablation(spark, sf_dir):
    return filter_ablation(gopher_rules(_spread(T(spark, sf_dir, "documents"))))


# ---------------------------------------------------------------------------
# Heavy hitters via Misra-Gries + exact-recount verify — the top-k
# sketch completing the bounded-memory summary triad (count-min =
# frequency, HLL = cardinality, this = heavy hitters). The sketch is
# only the CANDIDATE GENERATOR: per-partition Misra-Gries summaries
# merge by counter addition (undercount <= n/k per partition, so any
# token with global frequency > n/k MUST survive the merge — no false
# negatives by the standard MG bound), and the final answer is an
# EXACT recount of the bounded candidate set — which is why the whole
# operator is SQL-oracle-able even though it runs a sketch.
# ---------------------------------------------------------------------------

_HH_K = 50


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = _HH_K,
) -> DataFrame:
    """(token, n, frac) for every token with frequency strictly above
    n_total/k, by exact recount of Misra-Gries candidates; frac rounded
    to 6.

    Scale design: tokens never shuffle raw — each partition keeps a
    <= k-counter MG summary inside one Arrow-batched mapInPandas pass
    (state carried across batches of the partition), the merged
    summary is <= partitions x k rows (construction-bounded, safely
    broadcast), and the exact recount is a map-side semi-filter +
    count aggregate over only candidate tokens. The n_total arm is one
    exact 1-row integer aggregate. At 100 TB the exchange is the
    summary rows, not the token stream.
    """
    toks = df.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("tok")
    ).filter(F.col("tok") != "")

    def _mg(batches):
        # emits the MG counters PLUS one NULL-token sentinel row carrying
        # the partition's exact token count, so n_total rides this pass
        # instead of a third full tokenize scan of the corpus
        counters: dict = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            for t in pdf["tok"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"tok": list(counters) + [None], "c": list(counters.values()) + [seen]}
        )

    from libcolumnfile_spark.queries import pin

    summary = toks.mapInPandas(_mg, schema="tok string, c long")
    # BOTH consumers (candidate set, total) read the merged summary —
    # null key included, its row carrying n_total — through a pinned
    # aggregate of <= k+1 rows, so the corpus-scale MG map stage
    # executes ONCE. (Exchange reuse alone does not dedupe it: the
    # isNull/isNotNull key filters push below the aggregate and diverge
    # the two subtrees — observed as two MapInPandas nodes — so the
    # explicit pin is required; it trades away this query's plan
    # memoization, the right side of the trade since the alternative
    # re-runs a full corpus pass.)
    grouped = pin(summary.groupBy("tok").agg(F.sum("c").alias("c")))
    cand = grouped.filter(F.col("tok").isNotNull()).select("tok")
    tot = grouped.filter(F.col("tok").isNull()).select(
        F.col("c").alias("n_total")
    )
    exact = (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("n") * k > F.col("n_total"))
        .select(
            F.col("tok").alias("token"),
            "n",
            F.round(F.col("n") / F.col("n_total"), 6).alias("frac"),
        )
    )


@query(
    "q_heavy_hitters",
    oracle=(
        "WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)), "
        "'\\s+')) AS tok FROM documents), "
        "t2 AS (SELECT tok FROM toks WHERE tok <> ''), "
        "n AS (SELECT count(*) AS n_total FROM t2), "
        "c AS (SELECT tok, count(*) AS cnt FROM t2 GROUP BY 1) "
        f"SELECT tok AS token, cnt AS n, "
        "round(CAST(cnt AS DOUBLE) / n_total, 6) AS frac "
        f"FROM c CROSS JOIN n WHERE cnt * {_HH_K} > n_total"
    ),
    doc=(
        "Heavy hitters (tokens above 1/50 of the stream) via per-"
        "partition Misra-Gries summaries merged by counter addition — "
        "no-false-negative candidates by the MG bound — then an EXACT "
        "map-side recount of the bounded candidate set: the top-k "
        "sketch completing count-min (frequency) and HLL "
        "(cardinality), exact output so the oracle is plain SQL."
    ),
    tags=("text", "sketch", "agg", "llm-pipeline"),
)
def q_heavy_hitters(spark, sf_dir):
    return heavy_hitters(_spread(T(spark, sf_dir, "documents")))
