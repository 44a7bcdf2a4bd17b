"""Evidence probe for the round-5 incremental distributed BPE trainer:
k merges (default 1000) on the x10-replicated documents fixture with the
driver fast path DISABLED, so the frontier-rewrite + pair-count-delta
loop is what's measured. Records wall time, merges/sec, and the
driver-path parity on a prefix (the incremental loops must agree).

Usage: python tools/bpe_scale_probe.py [num_merges] [parity_prefix]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.operators import bpe
from libcolumnfile_spark.session import get_spark
from tools.scale_probe import ensure_x10


def main() -> int:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    parity_prefix = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("bpe-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    x10 = ensure_x10(spark)
    docs = spark.read.parquet(f"{x10}/documents.parquet")

    # parity first (cheap): distributed vs driver on a prefix of merges
    fast = bpe.train_bpe(docs, num_merges=parity_prefix)
    dist = bpe.train_bpe(
        docs, num_merges=parity_prefix, driver_vocab_threshold=0
    )
    parity = fast == dist

    t0 = time.monotonic()
    merges = bpe.train_bpe(
        docs, num_merges=num_merges, driver_vocab_threshold=0
    )
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "metric": "bpe_distributed_x10",
                "num_merges_requested": num_merges,
                "num_merges_trained": len(merges),
                "wall_s": round(wall, 1),
                "merges_per_sec": round(len(merges) / wall, 2),
                "parity_prefix": parity_prefix,
                "parity_ok": parity,
                "fixture": f"{x10}/documents.parquet",
            }
        )
    )
    spark.stop()
    return 0 if parity else 1


if __name__ == "__main__":
    raise SystemExit(main())
