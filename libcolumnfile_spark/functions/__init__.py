"""Column-function library: the engine's reusable scalar/array functions
re-exported in one flat namespace (the analog of ``pyspark.sql.functions``
for this engine's domain ops).

Everything here is a ``Column -> Column`` (or list) function — composable
inside any DataFrame expression, no DataFrame coupling. Implementations
live next to their operators; this module is the stable import surface:

    from libcolumnfile_spark import functions as CF
    df.select(CF.fingerprint(df.text), CF.simhash64(CF_tokens))
"""

from libcolumnfile_spark.operators.dedup import (  # noqa: F401
    hashed_grams,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    minhash_signature_from_hashes,
    shingle_hashes,
    shingles,
    simhash64,
    token_hashes,
)
from libcolumnfile_spark.operators.pipeline import (  # noqa: F401
    hash_bucket,
    redact_pii,
    split_assign,
)
from libcolumnfile_spark.operators.similarity import (  # noqa: F401
    cosine,
    dot,
    l2_norm,
    lsh_bucket,
)
from libcolumnfile_spark.operators.text import (  # noqa: F401
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    occurrence_count,
    token_count,
    winnow_prints_kernel,
)

__all__ = [
    "bpe_ish_token_count",
    "winnow_prints_kernel",
    "cosine",
    "dot",
    "fingerprint",
    "hash_bucket",
    "hashed_grams",
    "jaccard",
    "l2_norm",
    "lang_id",
    "lsh_band_keys",
    "lsh_bucket",
    "minhash_signature",
    "minhash_signature_from_hashes",
    "occurrence_count",
    "redact_pii",
    "shingle_hashes",
    "split_assign",
    "shingles",
    "simhash64",
    "token_count",
    "token_hashes",
]
