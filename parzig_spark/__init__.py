"""parzig_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch re-creation (NOT a port) of the encoding semantics exercised by
the reference Parquet decoder (unexge/parzig, /root/reference), expressed
Spark-first:

- pure numpy/pyarrow encode+decode kernels (``parzig_spark.codecs``) for
  PLAIN, RLE/bit-packed hybrid, dictionary, delta/frame-of-reference,
  delta-length strings, and FSST (from the public VLDB'20 paper — not in the
  reference, required by the north star);
- a sampled-stats codec auto-selector (``parzig_spark.selector``);
- partition-parallel encode/decode DataFrame transforms using vectorized
  Arrow ``mapInPandas`` (``parzig_spark.operators``), with explicit
  repartitioning + salting for skew;
- a manifest checkpoint store with atomic per-partition commit markers and
  anti-join resume (``parzig_spark.plans.manifest``);
- training-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) in ``parzig_spark.functions``.

Reference parity citations use file:line into /root/reference.
"""

__version__ = "0.1.0"
