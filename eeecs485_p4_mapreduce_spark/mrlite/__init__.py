"""mrlite — Spark-backed parity engine for the reference MapReduce contract.

Reproduces the observable behavior of the reference framework
(/root/reference, see SURVEY.md §2-§3): directory-of-text-files input,
external map/reduce executables speaking tab-separated key-value lines,
md5 hash partitioning, per-partition lexicographic sort before reduce, and
``part-%05d`` text output files.

The worker-side control plane (worker daemons, heartbeats, task dispatch
— SURVEY.md §2.6) is deliberately NOT rebuilt: Spark's scheduler,
executors and fault tolerance subsume it. The *submit* surface IS kept:
``MREngine.submit_job`` accepts exactly the fields of the reference's
``new_manager_job`` message (reference: mapreduce/submit.py:70-78), and
``MRManagerServer`` exposes the same TCP JSON endpoint the reference's
``mapreduce-submit`` client talks to, so existing submit scripts work
unchanged.
"""

from eeecs485_p4_mapreduce_spark.mrlite.engine import MREngine, MRJobResult
from eeecs485_p4_mapreduce_spark.mrlite.manager import MRManagerServer
from eeecs485_p4_mapreduce_spark.mrlite.partitioner import md5_partition

__all__ = ["MREngine", "MRJobResult", "MRManagerServer", "md5_partition"]
