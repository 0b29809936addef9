#!/usr/bin/env python
"""Generate a scaled testdata directory by replicating the sf0.1 fact
tables K times with key offsets (driver testdata tops out at sf0.1;
the scaling story needs a bigger corpus to be evidence, not prose).

Fact tables (lineitem, orders, events, documents, embeddings) replicate
K× with primary keys offset per copy so join/groupBy cardinalities grow
linearly; dimension tables (region..part) stay 1× like a real scale-up.
Text/embedding payloads repeat verbatim — which is exactly the hostile
case for the dedup family: every document gains K-1 exact duplicates,
so the LSH band buckets and fan-out caps see real pressure instead of
the near-empty buckets sf0.1 produces.

Usage: python tools/make_scale.py [K] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_OFFSET = 1_000_000_000


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1.0"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from quackml_spark.session import get_spark
    from quackml_spark.sources.tables import STANDARD_TABLES, load_table

    spark = get_spark(app_name="quackml-make-scale")
    spark.sparkContext.setLogLevel("ERROR")

    fact_keys = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
        "events": ["event_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    os.makedirs(out, exist_ok=True)
    for name in STANDARD_TABLES:
        path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, src, name)
        if name in fact_keys:
            copies = []
            for i in range(k):
                c = df
                for key in fact_keys[name]:
                    c = c.withColumn(key, F.col(key) + F.lit(i * KEY_OFFSET))
                copies.append(c)
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
        else:
            scaled = df
        dest = os.path.join(out, f"{name}.parquet")
        scaled.write.mode("overwrite").parquet(dest)
        print(name, spark.read.parquet(dest).count())
    spark.stop()


if __name__ == "__main__":
    main()
