"""PySpark-native analytics engine with the capabilities of the reference
EECS 485 P4 MapReduce framework (see /root/reference, SURVEY.md).

Two layers:

- ``mrlite``: parity engine reproducing the reference's observable contract
  (directory-of-text-files in, external map/reduce executables, md5 key
  partitioning, sorted per-partition text output).  See SURVEY.md SS2/SS3.
- ``operators``/``functions``/``sources``/``streaming``: the idiomatic
  DataFrame/SQL analytics surface (joins, aggregations, windows, dedup,
  similarity search, text analysis, multimodal plumbing) designed for
  100 TB-scale execution on a real cluster.
"""

from eeecs485_p4_mapreduce_spark.session import get_spark
from eeecs485_p4_mapreduce_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
__version__ = "0.1.0"
