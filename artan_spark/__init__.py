"""artan_spark — a PySpark-native online latent-state estimation engine.

A from-scratch rebuild of the capabilities of ozancicek/artan (reference at
/root/reference, Scala + Py4J) as idiomatic PySpark: DataFrame API +
``applyInPandas`` / ``applyInPandasWithState`` + numpy kernels. Nothing here
is a port of the reference's JVM execution machinery — operators are
re-expressed on Spark's own physical primitives (shuffle-by-key grouped
pandas folds, hash aggregates, windows), so Catalyst/Tungsten/AQE plan the
relational surroundings.

Layout
------
- ``linalg``      numpy kernels (Kalman predict/update, logpdfs, pinv/sqrt)
- ``types``       vector/matrix <-> Spark schema conventions
- ``params``      lightweight chainable param mixin + persistence
- ``operators``   stateful estimation operators (LKF/EKF/UKF/CKF/RLS/LMS,
                  smoother, mixtures, MMAE)
- ``functions``   scalar vector/matrix function library + aggregates
- ``plans``       large-scale pipeline query library (dedup, similarity
                  search, text analysis, relational)
- ``streaming``   streaming helpers + batch==stream test harness
- ``sources``     table readers / rate-source helpers
"""

__version__ = "0.1.0"
