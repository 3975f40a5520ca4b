"""Offline IVF centroid training → committed model artifact (r13
verdict item 1: the ``quality_classifier_trained`` pattern applied to
vectors).

Trains pyspark.ml k-means (``similarity.train_ivf_centroids`` —
distributed Lloyd's, k-means|| init) ONCE on the public
sf0.001 embeddings and writes the L2-normalized centroids to
``rt_bigdata_spark/models/ivf_centroids.json``. The registered
``ann_ivf_trained`` query and its DuckDB oracle then both consume the
SAME rounded literals from the artifact, so determinism does not depend
on k-means partition-layout reproducibility — exactly how a 100 TB
deployment ships an index model: train offline, version the centroids,
inline them as broadcast literals at query time.

    python scripts/train_ivf_model.py          # writes the artifact
    python scripts/train_ivf_model.py --check  # retrain + report drift vs committed

Rounding to 9 decimals matches the engine-wide similarity rounding
discipline (cosine/round(…, 9) everywhere); the rounded values ARE the
model — both engines load them verbatim.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

ARTIFACT = ROOT / "rt_bigdata_spark" / "models" / "ivf_centroids.json"
TRAIN_SF_DIR = "/root/testdata/sf0.001"
N_CENTROIDS = 16
SEED = 42
MAX_ITER = 20


def train() -> list[list[float]]:
    from rt_bigdata_spark.operators.similarity import train_ivf_centroids
    from rt_bigdata_spark.session import get_spark

    spark = get_spark()
    emb = spark.read.parquet(f"{TRAIN_SF_DIR}/embeddings.parquet")
    cents = train_ivf_centroids(
        emb, vec_col="embedding", n_centroids=N_CENTROIDS, seed=SEED, max_iter=MAX_ITER
    )
    return [[round(x, 9) for x in c] for c in cents]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="retrain and report max |Δ| vs the committed artifact")
    args = ap.parse_args()

    cents = train()
    if args.check and ARTIFACT.exists():
        committed = json.loads(ARTIFACT.read_text())["centroids"]
        drift = max(
            abs(a - b) for ca, cb in zip(cents, committed) for a, b in zip(ca, cb)
        )
        print(f"retrain drift vs committed: max|Δ|={drift:.3e} "
              f"({len(cents)}x{len(cents[0])} centroids)")
        return

    ARTIFACT.write_text(json.dumps({
        "n_centroids": N_CENTROIDS,
        "dim": len(cents[0]),
        "centroids": cents,
        "provenance": (
            f"pyspark.ml KMeans (k-means|| init, seed={SEED}, maxIter={MAX_ITER}) "
            f"on {TRAIN_SF_DIR}/embeddings.parquet via "
            "similarity.train_ivf_centroids; centroids L2-normalized then "
            "rounded to 9 decimals (the engine's similarity rounding "
            "discipline) — the rounded values ARE the model, consumed "
            "verbatim by both the Spark query and its DuckDB oracle"
        ),
    }, indent=1))
    print(f"wrote {ARTIFACT} ({N_CENTROIDS} centroids, dim {len(cents[0])})")


if __name__ == "__main__":
    main()
