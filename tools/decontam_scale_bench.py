"""Semantic-decontamination scale run → the SCALING.md round-9 row.

The claim under test: `semantic_decontaminate_ivf` buys the
inverted-file economics for the leak scan — per-eval-query scored
volume drops from |corpus| to the probed fraction — while flagging a
subset of the exact scan (unprobed cells are the recall dial, never a
false positive). Clustered corpus (32 Gaussian clusters, Zipf sizes —
the head cluster is the worst case for cell-probing), fixed 8-vector
eval set drawn from the first four cluster centers (the realistic
shape: contamination is localized near a few modes, most clusters are
clean), sizes 50k → 200k → 800k.

Per size: brute wall (|eval| x |corpus| map-side), trained-quantizer
build wall (charged separately — it is the shared
artifact:kmeans_cells in production), IVF probe wall at nprobe=2, and
flagged-id recall of IVF vs brute.

Run: python tools/decontam_scale_bench.py [sizes...]
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

D, C, ZIPF_S, THRESH, NPROBE, CELLS = 16, 32, 1.3, 0.9, 2, 16


def main() -> None:
    from pyspark.sql import functions as F

    from orestes_spark.operators import similarity
    from orestes_spark.session import get_spark

    spark = get_spark("decontam-scale")
    spark.range(1000).selectExpr("sum(id)").collect()
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000, 800_000]

    random.seed(11)
    centers = [[random.gauss(0.0, 1.0) for _ in range(D)] for _ in range(C)]
    w = [1.0 / (i + 1) ** ZIPF_S for i in range(C)]
    tot = sum(w)
    cuts = []
    acc = 0.0
    for wi in w:
        acc += wi / tot
        cuts.append(acc)
    cut_sql = "CASE " + " ".join(
        f"WHEN u < {c} THEN {i}" for i, c in enumerate(cuts)
    ) + f" ELSE {C - 1} END"
    # eval set: 2 slightly-jittered copies of the FIRST FOUR centers
    # (8 vecs) — contamination is localized, most clusters are clean;
    # ids offset far above the corpus range
    eval_rows = [
        (10_000_000 + 2 * i + j, [x + 0.01 * j for x in centers[i]])
        for i in range(4)
        for j in range(2)
    ]
    eval_df = spark.createDataFrame(
        eval_rows, "vec_id LONG, embedding ARRAY<FLOAT>"
    ).localCheckpoint()

    print("| corpus | brute s | flagged | train s | ivf s (nprobe=2) | ivf flagged | id recall |")
    print("|---|---|---|---|---|---|---|")
    for n in sizes:
        # jittered member vectors around each center, built in-plan
        center_arr = (
            "array(" + ", ".join(
                "array(" + ", ".join(repr(x) for x in centers[i]) + ")"
                for i in range(C)
            ) + ")"
        )
        corpus = (
            spark.range(n)
            .withColumn("u", F.rand(seed=5))
            .selectExpr("id AS vec_id", f"{cut_sql} AS cl")
            .selectExpr(
                "vec_id",
                f"transform(element_at({center_arr}, cl + 1),"
                " (x, i) -> cast(x + sin(vec_id * (i + 3)) * 0.25 AS FLOAT)) AS embedding",
            )
            .localCheckpoint()
        )
        t0 = time.perf_counter()
        exact = {
            r["vec_id"]
            for r in similarity.semantic_decontaminate(
                corpus, eval_df, threshold=THRESH, quantize=1000
            ).collect()
        }
        t_brute = time.perf_counter() - t0
        t0 = time.perf_counter()
        cells = similarity.kmeans_cosine(
            corpus, k=CELLS, iters=2, quantize=1000
        ).localCheckpoint()
        t_train = time.perf_counter() - t0
        labeled = corpus.join(cells, "vec_id")
        t0 = time.perf_counter()
        ivf = {
            r["vec_id"]
            for r in similarity.semantic_decontaminate_ivf(
                labeled, eval_df, threshold=THRESH, quantize=1000, nprobe=NPROBE
            ).collect()
        }
        t_ivf = time.perf_counter() - t0
        assert ivf <= exact, "IVF flagged an id the exact scan did not"
        rec = len(ivf) / len(exact) if exact else 1.0
        print(
            f"| {n:,} | {t_brute:.2f} | {len(exact):,} | {t_train:.2f}"
            f" | {t_ivf:.2f} | {len(ivf):,} | {rec:.3f} |"
        )


if __name__ == "__main__":
    main()
