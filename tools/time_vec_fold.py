"""Time the vectorized n-D LKF fold on pickled frames (no Spark)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main():
    frames = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vec_frames"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 9

    import artan_spark.operators.vectorized as V
    from artan_spark.operators.kalman import LinearKalmanFilter

    flt = (
        LinearKalmanFilter(3, 1)
        .setStateKeyCol("k")
        .setEventTimeCol("t")
        .setInitialStateCovariance(100.0 * np.eye(3))
        .setProcessNoise(np.zeros((3, 3)))
        .setMeasurementNoise(np.array([[100.0]]))
        .setVectorizedBatch(True)
    )
    fold = V.vectorized_lkf_fold_factory(flt._constants())

    for label in ("cells", "flat"):
        pdf = pd.read_pickle(os.path.join(frames, f"{label}.pkl"))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fold(pdf, None)
            times.append(round(time.perf_counter() - t0, 4))
        print(f"fold[{label}]: median {sorted(times)[len(times) // 2]:.4f}s  {times}", flush=True)


if __name__ == "__main__":
    main()
