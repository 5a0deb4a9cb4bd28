"""The mrlite job engine: the reference's MapReduce contract on Spark.

Pipeline (SURVEY.md §3.1, steps 5-10):

    directory scan → round-robin file split across num_mappers tasks →
    map (external executable via RDD.pipe, or Python callable) →
    md5(key) % num_reducers shuffle → per-partition (key, value) sort →
    reduce (external executable or callable) → part-%05d text files.

Everything data-plane runs distributed on Spark; the driver only lists
files and renames outputs. There is no collect() anywhere — map output
streams through executor-local subprocesses exactly like the reference's
worker pipes (reference contract: tests/test_worker_11.py enforces O(1)
memory streaming; RDD.pipe gives the same property).

Scale notes:
- ``parity_tasks=True`` pins the task counts to (num_mappers,
  num_reducers) like the reference. At 100 TB you set it False: input
  splitting falls back to Spark's size-based splits (maxPartitionBytes)
  and only the reduce width is honored.
- the md5 partitioner is only needed for per-partition-file parity with
  the reference; it rides pyspark's partitionBy, so the shuffle itself is
  Spark's machinery — md5 is uniform, so balance matches Murmur3.
"""

from __future__ import annotations

import itertools
import shutil
import tempfile
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession

from eeecs485_p4_mapreduce_spark.mrlite.partitioner import md5_partition

MapperFn = Callable[[str], Iterable[tuple[str, str]]]
ReducerFn = Callable[[str, Iterable[str]], Iterable[str]]


@dataclass
class MRJobResult:
    job_id: int
    output_directory: str
    output_paths: list[str] = field(default_factory=list)

    def read_lines(self) -> list[str]:
        """All output lines in partition order (debug/test helper)."""
        out: list[str] = []
        for p in self.output_paths:
            out.extend(Path(p).read_text().splitlines())
        return out


def _parse_kv(line: str) -> tuple[str, str]:
    """key TAB value; key = text before first tab (reference record format,
    SURVEY.md §1.1). A tab-less line maps to (line, "")."""
    head, _sep, tail = line.partition("\t")
    return (head, tail)


def _callable_map_partition(fn: MapperFn):
    def run(lines: Iterator[str]) -> Iterator[tuple[str, str]]:
        for line in lines:
            yield from fn(line)

    return run


def _callable_reduce_partition(fn: ReducerFn):
    """Group the sorted (key, value) stream by key and hand each group to
    the reducer — the streaming equivalent of the external reducer reading
    sorted lines (itertools.groupby keeps O(group) memory)."""

    def run(pairs: Iterator[tuple[str, str]]) -> Iterator[str]:
        for key, group in itertools.groupby(pairs, key=lambda kv: kv[0]):
            yield from fn(key, (v for _, v in group))

    return run


class MREngine:
    """Drop-in replacement for the reference's manager+workers cluster.

    One instance ≈ one manager: jobs get FIFO ids from 0 and run
    sequentially (reference: tmp/job-{id} numbering,
    tests/test_manager_01.py). ``spark.stop()`` is the shutdown path —
    the reference's shutdown fan-out maps to stopping the session
    (SURVEY.md §3.3).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._next_job_id = 0

    def _file_shuffle(self, mapped, intermediate_dir: str, job_id: int, num_reducers: int):
        """K2 debug shuffle: materialize map output as the reference's
        ``job-{j}/intermediate/maptask%05d-part%05d`` files, then build the
        reduce input by reading them back.

        Map task id == partition index of ``mapped`` (parity_tasks pins one
        partition per map task). Each map task streams its pairs into
        ``num_reducers`` open files routed by md5(key) — O(1) memory like
        the reference worker's per-partition file handles; file content is
        unsorted map-output order (§2.2 M3). The reduce side then sorts its
        merged input by (key, value) (§2.4 R1), reproducing the reference's
        read-intermediates-then-sort flow byte for byte.
        """
        inter = Path(intermediate_dir) / f"job-{job_id}" / "intermediate"
        if inter.exists():
            # Job ids restart at 0 per engine instance, so a reused
            # intermediate_dir can hold maptask files from a previous run
            # (possibly with a different num_mappers); the reduce side
            # globs maptask*, so stale files would silently merge into
            # the reduce input. Start from an empty dir every time.
            shutil.rmtree(inter)
        inter.mkdir(parents=True)
        base = str(inter)

        def dump(idx: int, pairs: Iterator[tuple[str, str]]) -> Iterator[int]:
            handles = [
                (Path(base) / f"maptask{idx:05d}-part{p:05d}").open(
                    "w", encoding="utf-8"
                )
                for p in range(num_reducers)
            ]
            try:
                for k, v in pairs:
                    handles[md5_partition(k, num_reducers)].write(f"{k}\t{v}\n")
            finally:
                for h in handles:
                    h.close()
            yield idx

        # Action = the reference's map→reduce barrier (§2.3 X2): every
        # intermediate file is on disk before any reduce task reads.
        mapped.mapPartitionsWithIndex(dump).count()

        def read_partition(idx: int, _elems) -> Iterator[tuple[str, str]]:
            rows: list[tuple[str, str]] = []
            for mp in sorted(Path(base).glob(f"maptask*-part{idx:05d}")):
                with mp.open(encoding="utf-8") as f:
                    for line in f:
                        rows.append(_parse_kv(line.rstrip("\n")))
            rows.sort()
            return iter(rows)

        sc = self.spark.sparkContext
        # parallelize(range(n), n) puts element i in partition i, so the
        # mapPartitionsWithIndex index is the reduce partition id.
        return sc.parallelize(range(num_reducers), num_reducers).mapPartitionsWithIndex(
            read_partition
        )

    def submit_job(
        self,
        input_directory: str,
        output_directory: str,
        mapper_executable: str | MapperFn | None = None,
        reducer_executable: str | ReducerFn | None = None,
        num_mappers: int = 2,
        num_reducers: int = 2,
        parity_tasks: bool = True,
        intermediate_dir: str | None = None,
    ) -> MRJobResult:
        """Run one MapReduce job; mirrors the reference's new_manager_job
        message fields and CLI defaults (2 mappers / 2 reducers —
        reference: mapreduce/submit.py:51-58).

        ``mapper_executable``/``reducer_executable`` accept either a path
        to an external executable (reference behavior: subprocess over
        stdin/stdout via RDD.pipe) or a Python callable (built-in fast
        path, see builtins.py for the protocol).

        ``intermediate_dir`` enables the reference's debug materialization
        (K2): map output is written to
        ``{intermediate_dir}/job-{job_id}/intermediate/maptask%05d-part%05d``
        (reference naming: tests/test_worker_08.py:160-175,
        tests/test_manager_03.py:169-171) and the reduce stage reads those
        files back — the data plane flows through inspectable files exactly
        like the reference's shared-tmp layout. Default (None) uses Spark's
        in-memory shuffle; the debug path trades speed for byte-level
        inspectability and assumes a filesystem shared by all executors
        (true in local mode and on any NFS/DBFS-style cluster tmp).
        """
        if mapper_executable is None or reducer_executable is None:
            raise ValueError("mapper and reducer are required")
        in_dir = Path(input_directory)
        if not in_dir.is_dir():
            raise FileNotFoundError(f"input directory {input_directory} not found")
        job_id = self._next_job_id
        self._next_job_id += 1

        # §2.1 S2: files sorted by name, dealt round-robin to map tasks.
        # Hidden files (.-/_ prefixed: _SUCCESS, .crc) are skipped, matching
        # Hadoop's input conventions — the reader would ignore them anyway.
        files = sorted(
            str(p)
            for p in in_dir.iterdir()
            if p.is_file() and not p.name.startswith((".", "_"))
        )
        if not files:
            raise FileNotFoundError(f"no input files in {input_directory}")
        sc = self.spark.sparkContext

        if parity_tasks:
            n_map = min(num_mappers, len(files))
            groups = [files[i::n_map] for i in range(n_map)]
            rdds = [sc.textFile(",".join(g)).coalesce(1) for g in groups]
            lines = sc.union(rdds)
        else:
            lines = sc.textFile(",".join(files))

        # Map stage (§2.2 M1): executable pipe or callable flatMap.
        if callable(mapper_executable):
            mapped = lines.mapPartitions(_callable_map_partition(mapper_executable))
        else:
            mapped = lines.pipe(str(mapper_executable), checkCode=True).map(_parse_kv)

        # Shuffle (§2.2 M2 + §2.4 R1): md5(key) partitioning, then sort
        # within each partition by (key, value) — the whole-line
        # lexicographic order the reference's merge-sort produces.
        if intermediate_dir is not None:
            shuffled = self._file_shuffle(
                mapped, intermediate_dir, job_id, num_reducers
            )
        else:
            shuffled = (
                mapped.map(lambda kv: (kv, None))
                .repartitionAndSortWithinPartitions(
                    numPartitions=num_reducers,
                    partitionFunc=lambda kv: md5_partition(kv[0], num_reducers),
                )
                .map(lambda kvn: kvn[0])
            )

        # Reduce stage (§2.4 R2).
        if callable(reducer_executable):
            reduced = shuffled.mapPartitions(
                _callable_reduce_partition(reducer_executable)
            )
        else:
            reduced = shuffled.map(lambda kv: f"{kv[0]}\t{kv[1]}").pipe(
                str(reducer_executable), checkCode=True
            )

        # Sink (§2.5 K1): exactly num_reducers files named part-%05d.
        out_dir = Path(output_directory)
        out_dir.mkdir(parents=True, exist_ok=True)
        staging = Path(tempfile.mkdtemp(prefix=f"mrlite-job-{job_id}-"))
        spark_out = staging / "out"
        reduced.saveAsTextFile(str(spark_out))
        output_paths: list[str] = []
        for part in sorted(spark_out.glob("part-*")):
            if part.suffix == ".crc":
                continue
            dest = out_dir / part.name.split(".")[0]
            shutil.move(str(part), str(dest))
            output_paths.append(str(dest))
        shutil.rmtree(staging, ignore_errors=True)
        if len(output_paths) != num_reducers:
            raise RuntimeError(
                f"expected {num_reducers} output files, wrote {len(output_paths)}"
            )
        return MRJobResult(job_id, str(out_dir), output_paths)
