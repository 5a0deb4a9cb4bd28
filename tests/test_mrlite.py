"""Golden-parity tests for the mrlite engine against the reference's own
test corpus, executables, and golden outputs (read at runtime from the
read-only reference checkout — nothing is copied).

Mirrors the reference's integration-test strategy (SURVEY.md §5):
- grep  → byte-exact compare vs grep_correct.txt  (test_integration_01)
- wc    → order-insensitive set compare vs word_count_correct.txt
          (test_integration_02/03, union of parts)
- per-partition md5 routing asserted like test_worker_08.
"""

from __future__ import annotations

from pathlib import Path

import pytest

REF = Path("/root/reference/tests/testdata")

pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference testdata not available"
)


@pytest.fixture(scope="module")
def engine(spark):
    from eeecs485_p4_mapreduce_spark.mrlite import MREngine

    return MREngine(spark)


def golden_wordcount() -> list[str]:
    return (REF / "correct/word_count_correct.txt").read_text().splitlines()


def golden_grep() -> bytes:
    return (REF / "correct/grep_correct.txt").read_bytes()


def test_md5_partition_matches_reference_routing():
    """The key→partition split pinned by reference tests/test_worker_08
    (2 partitions): {"", bye, hello} → 0, {world, hadoop, goodbye} → 1."""
    from eeecs485_p4_mapreduce_spark.mrlite import md5_partition

    assert [md5_partition(k, 2) for k in ("", "bye", "hello")] == [0, 0, 0]
    assert [md5_partition(k, 2) for k in ("world", "hadoop", "goodbye")] == [1, 1, 1]


def test_wordcount_external_executables(engine, tmp_path):
    """Reference wc_map.sh/wc_reduce.sh through RDD.pipe, 2x2 job;
    union of parts must equal the golden multiset exactly."""
    res = engine.submit_job(
        input_directory=str(REF / "input"),
        output_directory=str(tmp_path / "out"),
        mapper_executable=str(REF / "exec/wc_map.sh"),
        reducer_executable=str(REF / "exec/wc_reduce.sh"),
        num_mappers=2,
        num_reducers=2,
    )
    assert len(res.output_paths) == 2
    assert sorted(res.read_lines()) == sorted(golden_wordcount())


def test_wordcount_builtin_python(engine, tmp_path):
    """Pure-Python built-ins must reproduce the same golden output with a
    different topology (4 mappers, 1 reducer; sorted single partition)."""
    from eeecs485_p4_mapreduce_spark.mrlite import builtins as b

    res = engine.submit_job(
        input_directory=str(REF / "input"),
        output_directory=str(tmp_path / "out"),
        mapper_executable=b.wc_map,
        reducer_executable=b.wc_reduce,
        num_mappers=4,
        num_reducers=1,
    )
    assert len(res.output_paths) == 1
    # single sorted partition → byte-level line order is the golden's order
    assert res.read_lines() == sorted(golden_wordcount())


def test_grep_external_executables(engine, tmp_path):
    """Reference grep_map.py/grep_reduce.py, 2 mappers / 1 reducer —
    byte-exact against grep_correct.txt like reference test_integration_01."""
    res = engine.submit_job(
        input_directory=str(REF / "input"),
        output_directory=str(tmp_path / "out"),
        mapper_executable=str(REF / "exec/grep_map.py"),
        reducer_executable=str(REF / "exec/grep_reduce.py"),
        num_mappers=2,
        num_reducers=1,
    )
    assert Path(res.output_paths[0]).read_bytes() == golden_grep()


def test_grep_builtin_python(engine, tmp_path):
    from eeecs485_p4_mapreduce_spark.mrlite import builtins as b

    res = engine.submit_job(
        input_directory=str(REF / "input"),
        output_directory=str(tmp_path / "out"),
        mapper_executable=b.make_grep_map("product"),
        reducer_executable=b.grep_reduce,
        num_mappers=2,
        num_reducers=1,
    )
    assert "\n".join(res.read_lines()) + "\n" == golden_grep().decode()


def test_multireducer_partition_layout(engine, tmp_path):
    """With 2 reducers, each part file must contain exactly the keys the
    md5 partitioner routes to it, in sorted order (reference
    test_worker_08 analog)."""
    from eeecs485_p4_mapreduce_spark.mrlite import builtins as b, md5_partition

    res = engine.submit_job(
        input_directory=str(REF / "input"),
        output_directory=str(tmp_path / "out"),
        mapper_executable=b.wc_map,
        reducer_executable=b.wc_reduce,
        num_mappers=2,
        num_reducers=2,
    )
    for part_idx, path in enumerate(res.output_paths):
        lines = Path(path).read_text().splitlines()
        keys = [ln.split("\t", 1)[0] for ln in lines]
        assert keys == sorted(keys)
        assert all(md5_partition(k, 2) == part_idx for k in keys)


def test_fifo_job_ids(engine, tmp_path):
    from eeecs485_p4_mapreduce_spark.mrlite import builtins as b

    first = engine.submit_job(
        input_directory=str(REF / "input_small"),
        output_directory=str(tmp_path / "a"),
        mapper_executable=b.wc_map,
        reducer_executable=b.wc_reduce,
        num_mappers=1,
        num_reducers=1,
    )
    second = engine.submit_job(
        input_directory=str(REF / "input_small"),
        output_directory=str(tmp_path / "b"),
        mapper_executable=b.wc_map,
        reducer_executable=b.wc_reduce,
        num_mappers=1,
        num_reducers=1,
    )
    assert second.job_id == first.job_id + 1
    assert first.read_lines() == second.read_lines()


def test_streaming_large_input(engine, tmp_path):
    """Reference test_worker_11 analog: the 3.7 MB corpus must map+reduce
    through external pipes without error (O(1) streaming path), inside the
    reference's wall-clock envelope (<10 s map stage at
    /root/reference/tests/test_worker_11.py:122; we bound the WHOLE job at
    3x that, the same multiplier its autograder applies to timeouts)."""
    import time

    t0 = time.perf_counter()
    res = engine.submit_job(
        input_directory=str(REF / "input_large"),
        output_directory=str(tmp_path / "out"),
        mapper_executable=str(REF / "exec/wc_map.sh"),
        reducer_executable=str(REF / "exec/wc_reduce.sh"),
        num_mappers=2,
        num_reducers=2,
    )
    elapsed = time.perf_counter() - t0
    total = sum(
        int(ln.split("\t")[1]) for ln in res.read_lines() if "\t" in ln
    )
    assert total > 100_000  # ~640k tokens in the Tolstoy corpus
    assert elapsed < 30.0, f"3.7 MB map+reduce took {elapsed:.1f}s"


def test_intermediate_debug_materialization(engine, tmp_path):
    """K2 debug mode: the 2x2 wc job with intermediate_dir set must write
    the reference's exact scratch layout —
    job-{j}/intermediate/maptask%05d-part%05d
    (reference: tests/test_worker_08.py:160-175,
    tests/test_manager_03.py:169-171) — with BYTE-identical content to an
    independent oracle that pipes each round-robin file group through the
    reference's wc_map.sh and routes lines by md5(key), and the final
    output must still match the golden word count."""
    import subprocess

    from eeecs485_p4_mapreduce_spark.mrlite import md5_partition

    scratch = tmp_path / "scratch"
    res = engine.submit_job(
        input_directory=str(REF / "input"),
        output_directory=str(tmp_path / "out"),
        mapper_executable=str(REF / "exec/wc_map.sh"),
        reducer_executable=str(REF / "exec/wc_reduce.sh"),
        num_mappers=2,
        num_reducers=2,
        intermediate_dir=str(scratch),
    )
    inter = scratch / f"job-{res.job_id}" / "intermediate"
    names = sorted(p.name for p in inter.iterdir())
    assert names == [
        "maptask00000-part00000",
        "maptask00000-part00001",
        "maptask00001-part00000",
        "maptask00001-part00001",
    ]

    # Independent oracle: same round-robin split (sorted files, i::2),
    # same executable, same md5 routing — computed without the engine.
    files = sorted(p for p in (REF / "input").iterdir() if p.is_file())
    for m in range(2):
        group = files[m::2]
        blob = b"".join(p.read_bytes() for p in group)
        out = subprocess.run(
            [str(REF / "exec/wc_map.sh")], input=blob, capture_output=True,
            check=True,
        ).stdout.decode()
        expected = {0: [], 1: []}
        for line in out.splitlines():
            key = line.split("\t", 1)[0]
            expected[md5_partition(key, 2)].append(line + "\n")
        for p in range(2):
            got = (inter / f"maptask{m:05d}-part{p:05d}").read_text()
            assert got == "".join(expected[p]), f"maptask{m}-part{p} differs"

    assert sorted(res.read_lines()) == sorted(golden_wordcount())


def test_file_shuffle_equals_memory_shuffle(engine, tmp_path):
    """Metamorphic: the K2 debug file-shuffle path and the default
    in-memory Spark shuffle must produce BYTE-identical part files for
    the same job (2x2 external wc)."""
    kwargs = dict(
        input_directory=str(REF / "input"),
        mapper_executable=str(REF / "exec/wc_map.sh"),
        reducer_executable=str(REF / "exec/wc_reduce.sh"),
        num_mappers=2,
        num_reducers=2,
    )
    mem = engine.submit_job(
        output_directory=str(tmp_path / "mem"), **kwargs
    )
    dbg = engine.submit_job(
        output_directory=str(tmp_path / "dbg"),
        intermediate_dir=str(tmp_path / "scratch"),
        **kwargs,
    )
    for a, b in zip(mem.output_paths, dbg.output_paths):
        assert Path(a).read_bytes() == Path(b).read_bytes()
