"""Micro-benchmark: three bit-identical cosine implementations.

The similarity family's `_dot` is an interpreted higher-order-function
fold (aggregate/zip_with are CodegenFallback — per-element lambda
interpretation with boxing). Candidates that must stay BIT-IDENTICAL
(sequential left-fold order, float64, 0.0 init):

1. hof     — the current aggregate(zip_with(...)) fold
2. unroll  — static left-assoc expression tree over element_at (codegen)
3. arrow   — mapInPandas, sequential-over-dims vectorized-over-rows loop

Usage: python scripts/micro_cosine.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aroma_spark.operators.similarity import cosine
from aroma_spark.session import get_spark
from aroma_spark.sources.transcripts import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = get_spark("micro-cosine")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    dim = len(emb.select("embedding").head()[0])

    def timed(name, df):
        df.count()  # warmup
        walls = []
        for _ in range(3):
            t0 = time.time()
            n = df.count()
            walls.append(round(time.time() - t0, 3))
        s = df.agg(F.sum(F.col("cos"))).head()[0]
        print(f"{name}: walls={walls} rows={n} sum={s!r}", flush=True)

    # 1. current interpreted fold
    hof = pairs.select(
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos")
    )
    timed("hof", hof)

    # 2. unrolled codegen expression (same left-fold order, 0.0 init)
    def dot_unrolled(a, b):
        terms = [
            a.getItem(i).cast("double") * b.getItem(i).cast("double")
            for i in range(dim)
        ]
        return reduce(lambda x, y: x + y, terms, F.lit(0.0))

    def cos_unrolled(a, b):
        return dot_unrolled(a, b) / (
            F.sqrt(dot_unrolled(a, a)) * F.sqrt(dot_unrolled(b, b))
        )

    unroll = pairs.select(
        F.round(cos_unrolled(F.col("q_vec"), F.col("c_vec")), 6).alias("cos")
    )
    timed("unroll", unroll)

    # 3. arrow: sequential over dims, vectorized over rows
    import numpy as np
    import pandas as pd

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            A = np.stack(pdf["q_vec"].to_numpy()).astype(np.float64)
            B = np.stack(pdf["c_vec"].to_numpy()).astype(np.float64)
            dq = np.zeros(len(A))
            dc = np.zeros(len(A))
            dd = np.zeros(len(A))
            for d in range(A.shape[1]):
                dd += A[:, d] * B[:, d]
                dq += A[:, d] * A[:, d]
                dc += B[:, d] * B[:, d]
            yield pd.DataFrame(
                {"cos_raw": dd / (np.sqrt(dq) * np.sqrt(dc))}
            )

    arrow = pairs.select("q_vec", "c_vec").mapInPandas(
        fn, "cos_raw double"
    ).select(F.round(F.col("cos_raw"), 6).alias("cos"))
    timed("arrow", arrow)
    spark.stop()


if __name__ == "__main__":
    main()
