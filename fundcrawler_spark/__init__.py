"""fundcrawler_spark — a from-scratch PySpark-native rebuild of the
capabilities of Jerry1014/FundCrawler (reference at /root/reference/,
read-only), re-expressed as a distributed URL-frontier + fetch scheduler
over Iceberg(-lite) tables of image+caption pairs.

Architecture (Spark-first, NOT a port):
  - DataFrame/SQL everywhere; zero per-row Python (pandas/Arrow UDFs only
    for batch kernels: fetch simulation, image decode, phash).
  - The reference's dataflow (seed scan -> 4-page fan-out -> rate-limited
    fetch -> barrier group-join -> regex projection -> CSV sink -> top-K
    analysis) becomes: seed DataFrame -> explode fan-out -> bloom-sharded
    seen-set anti-join -> per-host AIMD admission window -> applyInPandas
    fetch kernel -> pivot barrier join -> Column-expression regex
    projections -> Iceberg-lite append -> windowed top-K.

See SURVEY.md for the complete operator mapping with reference citations.
"""

__version__ = "0.1.0"
