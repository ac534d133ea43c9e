#!/usr/bin/env python
"""Regenerate the pinned semantic-dedup quantizer centroids
(tia_data_pipeline_spark/operators/semantic_centers.py).

Deterministic: spark.ml KMeans k=8 seed=42 on the sf0.01 valid
embeddings, centers rounded to 6 dp. Re-running reproduces the
committed literals bit-for-bit; changing k/seed/SF is a CONTRACT
change (the q_semantic_dedup oracle embeds the same literals) and
requires re-running the parity suites.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tia_data_pipeline_spark.functions.vectors import valid_embeddings  # noqa: E402
from tia_data_pipeline_spark.operators import similarity as SIM  # noqa: E402
from tia_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="train-semantic-centers")
    emb = valid_embeddings(spark, SF_DIR).filter(F.col("vec_id").isNotNull())
    _, centers = SIM.ivf_build_index(emb, n_lists=8, seed=42)
    rounded = [[round(float(x), 6) for x in c] for c in centers]
    from tia_data_pipeline_spark.operators.semantic_centers import SEMANTIC_CENTERS

    if rounded == SEMANTIC_CENTERS:
        print("OK: regenerated centers match the committed literals bit-for-bit")
        return
    out = "/tmp/semantic_centers_regenerated.py"
    with open(out, "w") as fh:
        fh.write("SEMANTIC_CENTERS = [\n")
        for c in rounded:
            fh.write("    [\n")
            for i in range(0, len(c), 6):
                fh.write("        " + ", ".join(repr(v) for v in c[i : i + 6]) + ",\n")
            fh.write("    ],\n")
        fh.write("]\n")
    print(f"MISMATCH: full regenerated literals written to {out}")
    print("Diff against operators/semantic_centers.py; adopting them is a")
    print("CONTRACT change (re-run the parity suites).")


if __name__ == "__main__":
    main()
