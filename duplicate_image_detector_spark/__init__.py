"""PySpark-native near-duplicate detection + clustering engine for webtext.

A from-scratch, Spark-first re-expression of the capabilities of
``logbarron/duplicate-image-detector`` (reference at /root/reference,
surveyed in SURVEY.md): two-tier exact/near duplicate detection over
Common-Crawl-style pages, transplanted from images to text:

- exact tier:      sha256(text) group-by          (ref: metadata-key grouping,
                   duplicate-detector.py:1346-1383)
- near tier:       MinHash-LSH candidates + exact-Jaccard verification
                   (ref: SSCD cosine theta-join :1385-1530 + ORB/RANSAC
                   verify :1237-1279)
- substring tier:  content-defined fingerprint sampling + longest-common-
                   substring verification (north-rule addition; no ref analog)
- clustering:      large-star/small-star iterative connected components
                   (ref: union-find DSU :1744-1777)
- representatives: window max-by score per cluster (ref: :1999, 2012-2016)
- resume:          per-stage parquet checkpoints keyed by config hash with
                   per-partition lineage counters (ref: .npz cache keyed by
                   md5(config), :439-451, 2700-2718)

Everything is declarative DataFrame code: shingling, MinHash, SimHash, LSH
banding, and Jaccard verification are built-in-function column expressions
(whole-stage codegen, no Python in the hot path); only the substring stage's
rolling-hash sampler and LCS verifier use Arrow-batched pandas UDFs.
"""

from duplicate_image_detector_spark.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
