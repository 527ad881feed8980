"""name_matcher_spark — PySpark-native record-linkage engine.

A from-scratch reimplementation of the query semantics of the reference
SRS-II Name Matching Application (Kirachon/Name_Matcher, Rust) as an
idiomatic PySpark pipeline: blocking -> candidate equi-joins -> Arrow-
vectorized fuzzy scoring -> household aggregation -> transitive
clustering, with stage-level Parquet checkpoints and lineage manifests.

Everything here derives from the public PySpark API and the reference's
documented behavior (file:line citations in docstrings point into
/root/reference for parity checking only — no code is copied).
"""

__version__ = "0.1.0"
