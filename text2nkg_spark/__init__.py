"""text2nkg_spark — a PySpark-native n-ary knowledge-graph construction engine.

A from-scratch re-expression of the extraction semantics of LHRLAB/Text2NKG
(reference at /root/reference, NeurIPS 2024) as an idiomatic Spark pipeline:

    Iceberg/parquet transcript turns
      -> per-conversation document assembly      (window functions)
      -> mention detection                        (native SQL run-segmentation)
      -> span-triple candidate scoring            (Arrow mapInPandas, batched)
      -> 6-permutation ensemble + decode + NMS    (Arrow applyInPandas per sentence)
      -> n-ary fact assembly + compaction         (native SQL groupBy)
      -> entity canonicalization                  (MinHash-LSH + connected components)
      -> partitioned fact/entity tables + lineage manifests

Everything outside the two Arrow UDF families is declarative DataFrame/SQL so
Catalyst/AQE handle pushdown, pruning, broadcast and skew-join selection.
"""

__version__ = "0.1.0"

from text2nkg_spark.config import PipelineConfig
from text2nkg_spark.labels import LabelSpace

__all__ = ["PipelineConfig", "LabelSpace"]
