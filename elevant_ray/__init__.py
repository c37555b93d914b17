"""elevant_ray — a Ray-Data-native record-linkage / entity-linking engine.

From-scratch re-expression of the capabilities of ad-freiburg/elevant
(reference at /root/reference, cited by file:line in docstrings) as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- ``functions/``  pure per-document kernels (text extraction, span logic,
  mention typing, minhash, tokenization) — bit-parity with the reference
  where the north rule demands it.
- ``sources/``    parquet readers + deterministic fixture synthesis.
- ``stages/``     Dataset stage builders: dedup, blocking, scoring,
  clustering, evaluation, text stats, knn, dimension-table builds.
- ``pipelines/``  end-to-end assemblies (record linkage, evaluation).
- ``state/``      broadcast side-stores and checkpoint/resume manifests.
- ``registry``    user-extension surface: stage registry + JSON configs
  (the engine analog of the reference's Linkers enums / linking_system
  factory / per-linker config files).

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
