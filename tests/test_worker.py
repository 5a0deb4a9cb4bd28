"""Worker wire-protocol parity tests (C3/C4 + task execution).

Each test replays a reference worker unit test over REAL sockets (the
reference mocks socket.socket; here a live fake-manager harness listens
on ephemeral TCP/UDP ports), using the reference's OWN executables and
fixtures read from /root/reference/tests/testdata — never copied into
this repo. The goldens asserted are the reference tests' own expected
values (cited per test).

No Spark needed: the worker is a pure control/exec shim. The final test
wires a real MRManagerServer and real MRWorkers together to prove the
two halves of the protocol interoperate (register → ack → heartbeats →
liveness → shutdown fan-out) — the hop the reference can never test
because its framework is starter stubs.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time
from pathlib import Path

import pytest

from eeecs485_p4_mapreduce_spark.mrlite.worker import MRWorker, send_json

REF_DATA = Path("/root/reference/tests/testdata")

pytestmark = pytest.mark.skipif(
    not REF_DATA.is_dir(), reason="reference testdata not available"
)

# Fast heartbeats for tests: shape-identical to the spec's 2 s cadence.
HB = 0.2


class FakeManager:
    """Test harness playing the manager's side of the wire: a TCP
    listener that records every JSON message (acking registers), and a
    UDP listener that records heartbeat datagrams with receive times."""

    def __init__(self, ack_registers: bool = True):
        self.ack_registers = ack_registers
        self.tcp_messages: list[dict] = []
        self.heartbeats: list[tuple[float, dict]] = []
        self.ack_time: float | None = None
        self._stop = threading.Event()
        self._cond = threading.Condition()

        self._tcp = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._tcp.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._tcp.bind(("localhost", 0))
        self.port = self._tcp.getsockname()[1]
        self._tcp.listen()
        self._tcp.settimeout(0.2)

        self._udp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._udp.bind(("localhost", 0))
        self.hb_port = self._udp.getsockname()[1]
        self._udp.settimeout(0.2)

        self._threads = [
            threading.Thread(target=self._tcp_loop, daemon=True),
            threading.Thread(target=self._udp_loop, daemon=True),
        ]
        for t in self._threads:
            t.start()

    def _tcp_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._tcp.accept()
            except socket.timeout:
                continue
            with conn:
                chunks = []
                while chunk := conn.recv(65536):
                    chunks.append(chunk)
            message = json.loads(b"".join(chunks).decode("utf-8"))
            with self._cond:
                self.tcp_messages.append(message)
                self._cond.notify_all()
            if (
                self.ack_registers
                and message.get("message_type") == "register"
            ):
                self.ack_time = time.monotonic()
                send_json(
                    message["worker_host"],
                    message["worker_port"],
                    {
                        "message_type": "register_ack",
                        "worker_host": message["worker_host"],
                        "worker_port": message["worker_port"],
                    },
                )
        self._tcp.close()

    def _udp_loop(self) -> None:
        while not self._stop.is_set():
            try:
                data, _ = self._udp.recvfrom(65536)
            except socket.timeout:
                continue
            self.heartbeats.append(
                (time.monotonic(), json.loads(data.decode("utf-8")))
            )
        self._udp.close()

    def wait_for(self, predicate, timeout: float = 10.0) -> None:
        with self._cond:
            assert self._cond.wait_for(
                lambda: predicate(self.tcp_messages), timeout=timeout
            ), f"timed out; got {self.tcp_messages}"

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)


@pytest.fixture()
def fake_manager():
    mgr = FakeManager()
    yield mgr
    mgr.stop()


@pytest.fixture()
def worker(fake_manager):
    w = MRWorker(
        port=0,
        manager_port=fake_manager.port,
        manager_hb_port=fake_manager.hb_port,
        heartbeat_interval=HB,
    ).start()
    yield w
    w.stop()
    w.join(timeout=5)


def _non_heartbeat(messages):
    return [m for m in messages if m.get("message_type") != "heartbeat"]


def test_register_then_heartbeats(fake_manager, worker):
    """Reference test_worker_01 + test_worker_02: the worker registers
    with the exact message shape, starts heartbeating only AFTER the
    ack, at one per interval, and exits 0 on shutdown."""
    fake_manager.wait_for(lambda ms: len(_non_heartbeat(ms)) >= 1)
    assert _non_heartbeat(fake_manager.tcp_messages) == [
        {
            "message_type": "register",
            "worker_host": "localhost",
            "worker_port": worker.port,
        }
    ]
    # 1.5 intervals after the ack the reference expects 2-3 heartbeats
    # (one immediate + one per interval) — tests/test_worker_02.py:92.
    # The upper bound is computed from MEASURED elapsed time so a loaded
    # CI box that overslept can't flake it (cadence, not wall clock).
    time.sleep(1.5 * HB)
    beats = list(fake_manager.heartbeats)
    assert fake_manager.ack_time is not None
    elapsed = time.monotonic() - fake_manager.ack_time
    assert 2 <= len(beats) <= elapsed / HB + 2
    for when, beat in beats:
        assert beat == {
            "message_type": "heartbeat",
            "worker_host": "localhost",
            "worker_port": worker.port,
        }
        assert fake_manager.ack_time is not None
        assert when >= fake_manager.ack_time  # none before the ack
    send_json("localhost", worker.port, {"message_type": "shutdown"})
    worker.join(timeout=5)
    assert not worker.is_alive()
    assert worker.exit_code == 0
    # Heartbeats stop after shutdown.
    n = len(fake_manager.heartbeats)
    time.sleep(2 * HB)
    assert len(fake_manager.heartbeats) == n


def test_no_heartbeat_without_ack():
    """The worker must stay silent on the UDP port until the manager
    acks its registration (reference test_worker_01 sequencing)."""
    mgr = FakeManager(ack_registers=False)
    w = MRWorker(
        port=0,
        manager_port=mgr.port,
        manager_hb_port=mgr.hb_port,
        heartbeat_interval=HB,
    ).start()
    try:
        mgr.wait_for(lambda ms: len(ms) >= 1)
        time.sleep(3 * HB)
        assert mgr.heartbeats == []
        assert not w.registered.is_set()
    finally:
        w.stop()
        w.join(timeout=5)
        mgr.stop()


def test_map_task(fake_manager, worker, tmp_path):
    """Reference test_worker_03/04: a map task runs the reference's own
    wc_map.sh, md5-routes by the pre-tab key, writes one file per
    partition, and reports finished with the exact message shape."""
    fake_manager.wait_for(lambda ms: len(_non_heartbeat(ms)) >= 1)
    out = tmp_path / "output"
    out.mkdir()
    send_json(
        "localhost",
        worker.port,
        {
            "message_type": "new_map_task",
            "task_id": 0,
            "executable": str(REF_DATA / "exec/wc_map.sh"),
            "input_paths": [str(REF_DATA / "input/file01")],
            "output_directory": str(out),
            "num_partitions": 2,
            "worker_host": "localhost",
            "worker_port": worker.port,
        },
    )
    fake_manager.wait_for(
        lambda ms: any(m.get("message_type") == "finished" for m in ms)
    )
    finished = [
        m
        for m in fake_manager.tcp_messages
        if m.get("message_type") == "finished"
    ]
    assert finished == [
        {
            "message_type": "finished",
            "task_id": 0,
            "output_paths": [
                str(out / "maptask00000-part00000"),
                str(out / "maptask00000-part00001"),
            ],
            "worker_host": "localhost",
            "worker_port": worker.port,
        }
    ]
    # Reference goldens (tests/test_worker_08.py:196-209): md5 routing
    # sends {"", bye, hello} to part 0 and {world} to part 1.
    part0 = (out / "maptask00000-part00000").read_text().splitlines()
    part1 = (out / "maptask00000-part00001").read_text().splitlines()
    assert sorted(part0) == ["\t1", "bye\t1", "hello\t1"]
    assert sorted(part1) == ["world\t1", "world\t1"]


def test_reduce_task(fake_manager, worker, tmp_path):
    """Reference test_worker_07: reduce over the reference's own
    (unsorted!) intermediate fixtures through its own wc_reduce.sh must
    produce its exact golden part-00000 — proving the worker sorts
    reduce input rather than trusting map-side order."""
    fake_manager.wait_for(lambda ms: len(_non_heartbeat(ms)) >= 1)
    out = tmp_path / "output"
    out.mkdir()
    send_json(
        "localhost",
        worker.port,
        {
            "message_type": "new_reduce_task",
            "task_id": 0,
            "executable": str(REF_DATA / "exec/wc_reduce.sh"),
            "input_paths": [
                str(REF_DATA / "test_worker_07/maptask00000-part00000"),
                str(REF_DATA / "test_worker_07/maptask00001-part00000"),
            ],
            "output_directory": str(out),
            "worker_host": "localhost",
            "worker_port": worker.port,
        },
    )
    fake_manager.wait_for(
        lambda ms: any(m.get("message_type") == "finished" for m in ms)
    )
    # Golden from reference tests/test_worker_07.py:120-125.
    assert (out / "part-00000").read_text() == "\t2\nbye\t1\nhello\t2\n"


def test_map_then_reduce_end_to_end(fake_manager, worker, tmp_path):
    """Reference test_worker_08: two map tasks then two reduce tasks on
    the worker's own intermediates reproduce the reference's golden
    per-partition word counts byte-for-byte."""
    fake_manager.wait_for(lambda ms: len(_non_heartbeat(ms)) >= 1)
    inter = tmp_path / "intermediate"
    out = tmp_path / "output"
    inter.mkdir()
    out.mkdir()

    def wait_finished(n: int) -> None:
        fake_manager.wait_for(
            lambda ms: sum(
                m.get("message_type") == "finished" for m in ms
            )
            >= n
        )

    for task_id, infile in enumerate(["input/file01", "input/file02"]):
        send_json(
            "localhost",
            worker.port,
            {
                "message_type": "new_map_task",
                "task_id": task_id,
                "executable": str(REF_DATA / "exec/wc_map.sh"),
                "input_paths": [str(REF_DATA / infile)],
                "output_directory": str(inter),
                "num_partitions": 2,
                "worker_host": "localhost",
                "worker_port": worker.port,
            },
        )
        wait_finished(task_id + 1)
    for task_id in (0, 1):
        send_json(
            "localhost",
            worker.port,
            {
                "message_type": "new_reduce_task",
                "task_id": task_id,
                "executable": str(REF_DATA / "exec/wc_reduce.sh"),
                "input_paths": [
                    str(inter / f"maptask00000-part{task_id:05d}"),
                    str(inter / f"maptask00001-part{task_id:05d}"),
                ],
                "output_directory": str(out),
                "worker_host": "localhost",
                "worker_port": worker.port,
            },
        )
        wait_finished(3 + task_id)
    # Goldens from reference tests/test_worker_08.py:226-242.
    assert (out / "part-00000").read_text() == "\t2\nbye\t1\nhello\t2\n"
    assert (
        out / "part-00001"
    ).read_text() == "goodbye\t1\nhadoop\t2\nworld\t2\n"


def test_manager_worker_cluster():
    """Both halves interoperate live: workers register with a real
    MRManagerServer (which acks — reference test_manager_02:126-133),
    heartbeat over UDP into its liveness table, die out of it after 5
    missed intervals, and receive the shutdown fan-out (reference
    test_manager_00 test_shutdown_workers)."""
    from eeecs485_p4_mapreduce_spark.mrlite import MRManagerServer

    # engine=None: no jobs are submitted in this test, only control.
    server = MRManagerServer(
        None, port=0, hb_port=0, heartbeat_interval=HB
    ).start()
    workers = [
        MRWorker(
            port=0,
            manager_port=server.port,
            manager_hb_port=server.hb_port,
            heartbeat_interval=HB,
        ).start()
        for _ in range(2)
    ]
    try:
        for w in workers:
            assert w.registered.wait(timeout=10)
        deadline = time.monotonic() + 10
        while len(server.alive_workers()) < 2:
            assert time.monotonic() < deadline
            time.sleep(0.05)
        assert {w.port for w in workers} == {
            r.port for r in server.alive_workers()
        }

        # Kill one worker silently: after 5 missed intervals it must
        # drop out of the liveness table (C4's miss-5-and-dead rule).
        workers[0].stop()
        workers[0].join(timeout=5)
        time.sleep(6 * HB)
        alive = server.alive_workers()
        assert [r.port for r in alive] == [workers[1].port]

        # Shutdown via the manager's public TCP endpoint must fan out
        # to the surviving registered worker, which exits 0.
        send_json("localhost", server.port, {"message_type": "shutdown"})
        workers[1].join(timeout=10)
        assert not workers[1].is_alive()
        assert workers[1].exit_code == 0
        server.join(timeout=10)
        assert not server.is_alive()
    finally:
        for w in workers:
            w.stop()
        server.stop()


def _golden_wordcount() -> list[str]:
    return (
        (REF_DATA / "correct/word_count_correct.txt")
        .read_text()
        .splitlines()
    )


def _wait_job_done(server, timeout: float = 60.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if server.jobs and server.jobs[0].done.is_set():
            return server.jobs[0]
        time.sleep(0.05)
    raise TimeoutError(f"job not finished: {server.jobs}")


def test_cluster_runs_reference_wc_job(tmp_path):
    """C5 end-to-end: a manager with a live registered fleet executes a
    new_manager_job by dispatching map/reduce tasks to the workers —
    the reference's own execution model — and the union of part files
    equals the reference's word_count_correct.txt golden multiset
    (reference test_integration_02's check)."""
    from eeecs485_p4_mapreduce_spark.mrlite import MRManagerServer

    server = MRManagerServer(
        None, port=0, hb_port=0, heartbeat_interval=HB
    ).start()
    workers = [
        MRWorker(
            port=0,
            manager_port=server.port,
            manager_hb_port=server.hb_port,
            heartbeat_interval=HB,
        ).start()
        for _ in range(2)
    ]
    try:
        for w in workers:
            assert w.registered.wait(timeout=10)
        out = tmp_path / "out"
        send_json(
            "localhost",
            server.port,
            {
                "message_type": "new_manager_job",
                "input_directory": str(REF_DATA / "input"),
                "output_directory": str(out),
                "mapper_executable": str(REF_DATA / "exec/wc_map.sh"),
                "reducer_executable": str(REF_DATA / "exec/wc_reduce.sh"),
                "num_mappers": 2,
                "num_reducers": 2,
            },
        )
        rec = _wait_job_done(server)
        assert rec.error is None
        assert rec.result is not None
        assert [Path(p).name for p in rec.result.output_paths] == [
            "part-00000",
            "part-00001",
        ]
        lines = [
            line
            for p in rec.result.output_paths
            for line in Path(p).read_text().splitlines()
        ]
        assert sorted(lines) == sorted(_golden_wordcount())
        # Both workers did map work (2 tasks, 2 idle workers).
        assert {ev["worker_port"] for ev in server.task_events[:2]} == {
            w.port for w in workers
        }
    finally:
        for w in workers:
            w.stop()
            w.join(timeout=5)
        server.stop()
        server.join(timeout=10)


class _ZombieWorker(MRWorker):
    """Registers and heartbeats like a real worker, then 'crashes'
    (stops heartbeating, never replies) on its first map task — the C7
    failure the reference fork never tests."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.got_task = threading.Event()

    def _run_map_task(self, message: dict) -> None:
        self.got_task.set()
        self._shutdown.set()  # silent death: no finished, no heartbeats


def test_dead_worker_task_reassigned(tmp_path):
    """C7: a worker that takes a task and dies silently falls out of
    liveness after 5 missed heartbeats; the manager requeues its task
    to the survivor and the job still completes with the golden
    output."""
    from eeecs485_p4_mapreduce_spark.mrlite import MRManagerServer

    server = MRManagerServer(
        None, port=0, hb_port=0, heartbeat_interval=HB
    ).start()
    zombie = _ZombieWorker(
        port=0,
        manager_port=server.port,
        manager_hb_port=server.hb_port,
        heartbeat_interval=HB,
    ).start()
    worker = MRWorker(
        port=0,
        manager_port=server.port,
        manager_hb_port=server.hb_port,
        heartbeat_interval=HB,
    ).start()
    try:
        assert zombie.registered.wait(timeout=10)
        assert worker.registered.wait(timeout=10)
        out = tmp_path / "out"
        send_json(
            "localhost",
            server.port,
            {
                "message_type": "new_manager_job",
                "input_directory": str(REF_DATA / "input"),
                "output_directory": str(out),
                "mapper_executable": str(REF_DATA / "exec/wc_map.sh"),
                "reducer_executable": str(REF_DATA / "exec/wc_reduce.sh"),
                "num_mappers": 2,
                "num_reducers": 2,
            },
        )
        rec = _wait_job_done(server)
        assert zombie.got_task.is_set()  # the zombie really took a task
        assert rec.error is None
        lines = [
            line
            for p in rec.result.output_paths
            for line in Path(p).read_text().splitlines()
        ]
        assert sorted(lines) == sorted(_golden_wordcount())
        # The zombie was evicted from the fleet when its task requeued.
        assert (zombie.host, zombie.port) not in server.workers
        # Every finished event came from the survivor.
        assert {ev["worker_port"] for ev in server.task_events} == {
            worker.port
        }
    finally:
        zombie.stop()
        worker.stop()
        for w in (zombie, worker):
            w.join(timeout=5)
        server.stop()
        server.join(timeout=10)


def test_reference_submit_client_drives_worker_fleet(tmp_path):
    """Full drop-in parity with ZERO Spark: the reference's OWN
    mapreduce-submit client (run as a subprocess) submits to our
    manager, which dispatches to our workers over the reference wire
    protocol, producing the reference's golden word count. This is the
    reference's entire deployment story — client, manager, workers —
    spoken end-to-end by this repo's native control plane."""
    import subprocess
    import sys

    from eeecs485_p4_mapreduce_spark.mrlite import MRManagerServer

    server = MRManagerServer(
        None, port=0, hb_port=0, heartbeat_interval=HB
    ).start()
    workers = [
        MRWorker(
            port=0,
            manager_port=server.port,
            manager_hb_port=server.hb_port,
            heartbeat_interval=HB,
        ).start()
        for _ in range(2)
    ]
    try:
        for w in workers:
            assert w.registered.wait(timeout=10)
        out = tmp_path / "out"
        proc = subprocess.run(
            [
                sys.executable,
                "/root/reference/mapreduce/submit.py",
                "--port", str(server.port),
                "--input", str(REF_DATA / "input"),
                "--output", str(out),
                "--mapper", str(REF_DATA / "exec/wc_map.sh"),
                "--reducer", str(REF_DATA / "exec/wc_reduce.sh"),
            ],
            capture_output=True,
            text=True,
            timeout=60,
        )
        assert proc.returncode == 0, proc.stderr
        rec = _wait_job_done(server)
        assert rec.error is None
        assert sorted(rec.result.read_lines()) == sorted(_golden_wordcount())
    finally:
        for w in workers:
            w.stop()
            w.join(timeout=5)
        server.stop()
        server.join(timeout=10)


def test_task_failure_reported_not_fatal(fake_manager, worker, tmp_path):
    """A bad executable must neither kill the worker nor go silent: the
    worker reports finished-with-error (an extra field reference
    tooling ignores) and stays fully alive for the next task."""
    fake_manager.wait_for(lambda ms: len(_non_heartbeat(ms)) >= 1)
    out = tmp_path / "out"
    out.mkdir()
    send_json(
        "localhost",
        worker.port,
        {
            "message_type": "new_map_task",
            "task_id": 7,
            "executable": "/nonexistent/mapper.sh",
            "input_paths": [str(REF_DATA / "input/file01")],
            "output_directory": str(out),
            "num_partitions": 1,
            "worker_host": "localhost",
            "worker_port": worker.port,
        },
    )
    fake_manager.wait_for(
        lambda ms: any(m.get("message_type") == "finished" for m in ms)
    )
    ev = [
        m
        for m in fake_manager.tcp_messages
        if m.get("message_type") == "finished"
    ][0]
    assert ev["task_id"] == 7
    assert ev["output_paths"] == []
    assert "error" in ev and "mapper" in ev["error"].lower() or ev["error"]
    # Worker still serves tasks afterwards.
    send_json(
        "localhost",
        worker.port,
        {
            "message_type": "new_map_task",
            "task_id": 8,
            "executable": str(REF_DATA / "exec/wc_map.sh"),
            "input_paths": [str(REF_DATA / "input/file01")],
            "output_directory": str(out),
            "num_partitions": 1,
            "worker_host": "localhost",
            "worker_port": worker.port,
        },
    )
    fake_manager.wait_for(
        lambda ms: sum(m.get("message_type") == "finished" for m in ms) >= 2
    )
    ok = [
        m
        for m in fake_manager.tcp_messages
        if m.get("message_type") == "finished" and not m.get("error")
    ]
    assert ok and ok[0]["task_id"] == 8


def test_bad_job_fails_cleanly_on_fleet(tmp_path):
    """End-to-end C7 bound: a deterministically-failing mapper must
    fail the JOB after bounded attempts — never hang the submitter,
    never kill the fleet."""
    from eeecs485_p4_mapreduce_spark.mrlite import MRManagerServer

    server = MRManagerServer(
        None, port=0, hb_port=0, heartbeat_interval=HB
    ).start()
    worker = MRWorker(
        port=0,
        manager_port=server.port,
        manager_hb_port=server.hb_port,
        heartbeat_interval=HB,
    ).start()
    try:
        assert worker.registered.wait(timeout=10)
        send_json(
            "localhost",
            server.port,
            {
                "message_type": "new_manager_job",
                "input_directory": str(REF_DATA / "input"),
                "output_directory": str(tmp_path / "out"),
                "mapper_executable": "/nonexistent/mapper.sh",
                "reducer_executable": str(REF_DATA / "exec/wc_reduce.sh"),
                "num_mappers": 2,
                "num_reducers": 1,
            },
        )
        rec = _wait_job_done(server, timeout=60)
        assert rec.error is not None
        assert "failed" in rec.error
        assert worker.is_alive()  # the fleet survives the bad job
    finally:
        worker.stop()
        worker.join(timeout=5)
        server.stop()
        server.join(timeout=10)


def test_reduce_handles_missing_trailing_newline(
    fake_manager, worker, tmp_path
):
    """A mapper whose last output line lacks its newline must not
    concatenate two records in the merged reduce input."""
    inter = tmp_path / "inter"
    out = tmp_path / "out"
    inter.mkdir()
    out.mkdir()
    (inter / "maptask00000-part00000").write_text("b\t1\na\t1")  # no \n
    (inter / "maptask00001-part00000").write_text("a\t1\nb\t1\n")
    fake_manager.wait_for(lambda ms: len(_non_heartbeat(ms)) >= 1)
    send_json(
        "localhost",
        worker.port,
        {
            "message_type": "new_reduce_task",
            "task_id": 0,
            "executable": str(REF_DATA / "exec/wc_reduce.sh"),
            "input_paths": [
                str(inter / "maptask00000-part00000"),
                str(inter / "maptask00001-part00000"),
            ],
            "output_directory": str(out),
            "worker_host": "localhost",
            "worker_port": worker.port,
        },
    )
    fake_manager.wait_for(
        lambda ms: any(m.get("message_type") == "finished" for m in ms)
    )
    assert (out / "part-00000").read_text() == "a\t2\nb\t2\n"


def test_worker_sigkilled_mid_task_is_reassigned(tmp_path):
    """C7, the hard case: a worker dies AFTER receiving a map task but
    BEFORE sending finished (SIGKILL mid-``sleep`` inside the
    reference's own wc_map_slow.sh). The victim is a REAL subprocess
    (`python -m ...mrlite --worker`), so the kill is a genuine process
    death: no finished message, no more heartbeats, its mapper child
    orphaned mid-write. The manager's miss-5 liveness rule plus the
    epoch/requeue path must hand the task to the survivor and the job
    must still produce correct output — and the atomic temp-name write
    discipline means the victim's half-written partition files never
    pollute the replacement attempt's output."""
    import subprocess
    import sys

    from eeecs485_p4_mapreduce_spark.mrlite import MRManagerServer

    server = MRManagerServer(
        None, port=0, hb_port=0, heartbeat_interval=HB
    ).start()
    victim = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "eeecs485_p4_mapreduce_spark.mrlite",
            "--worker",
            "--port",
            "0",
            "--manager-port",
            str(server.port),
            "--manager-hb-port",
            str(server.hb_port),
            "--heartbeat-interval",
            str(HB),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        # any cwd works: the manager dispatches ABSOLUTE intermediate
        # paths, so the victim need not share the manager's directory
        # (PYTHONPATH keeps the package importable from the foreign cwd)
        cwd=tmp_path,
        env={
            **os.environ,
            "PYTHONPATH": str(Path(__file__).resolve().parents[1]),
        },
    )
    survivor = MRWorker(
        port=0,
        manager_port=server.port,
        manager_hb_port=server.hb_port,
        heartbeat_interval=HB,
    ).start()
    try:
        import re

        line = victim.stdout.readline()
        m = re.search(r"worker on [\w.]+:(\d+)", line)
        assert m, line
        victim_port = int(m.group(1))
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and not (
            ("localhost", victim_port) in server.workers
            and survivor.registered.is_set()
        ):
            time.sleep(0.05)
        assert ("localhost", victim_port) in server.workers
        assert survivor.registered.is_set()

        out = tmp_path / "out"
        send_json(
            "localhost",
            server.port,
            {
                "message_type": "new_manager_job",
                "input_directory": str(REF_DATA / "input_small"),
                "output_directory": str(out),
                "mapper_executable": str(
                    REF_DATA / "exec/wc_map_slow.sh"
                ),
                "reducer_executable": str(REF_DATA / "exec/wc_reduce.sh"),
                "num_mappers": 2,
                "num_reducers": 1,
            },
        )
        # Wait until the victim has demonstrably STARTED its map task:
        # each attempt opens private maptask*-part*.tmp-{port} files in
        # the job's intermediate dir the moment it begins (the mapper
        # then sleeps 3 s before emitting anything).
        deadline = time.monotonic() + 20
        victim_tmp = []
        while time.monotonic() < deadline and not victim_tmp:
            victim_tmp = list(
                (Path.cwd() / "tmp").glob(
                    f"job-*/intermediate/*.tmp-*-{victim_port}-*"
                )
            )
            time.sleep(0.05)
        assert victim_tmp, "victim never started its map task"
        victim.kill()  # SIGKILL: mid-sleep, no finished, no cleanup
        victim.wait(timeout=10)

        rec = _wait_job_done(server, timeout=60)
        assert rec.error is None
        # The victim fell out of the fleet when its task was requeued.
        assert ("localhost", victim_port) not in server.workers
        # Every finished event came from the survivor.
        assert {ev["worker_port"] for ev in server.task_events} == {
            survivor.port
        }
        import collections

        expected = collections.Counter(
            tok
            for f in sorted((REF_DATA / "input_small").iterdir())
            for tok in f.read_text().lower().split()
        )
        lines = [
            line
            for p in rec.result.output_paths
            for line in Path(p).read_text().splitlines()
        ]
        assert sorted(lines) == sorted(
            f"{w}\t{c}" for w, c in expected.items()
        )
    finally:
        if victim.poll() is None:
            victim.kill()
        survivor.stop()
        survivor.join(timeout=5)
        server.stop()
        server.join(timeout=10)


class _RssSampler:
    """Sample CURRENT RSS of this process from /proc/self/statm on a
    50 ms cadence and keep the max — the reference's MemoryProfiler
    shape (tests/utils/memory.py:11,28-33; ported pattern, not copied
    code) but against live RSS instead of ru_maxrss: the getrusage
    high-water mark is already pinned by whatever ran earlier in the
    pytest process, which would make a growth assertion vacuously pass.
    Linux-only, like the CI box."""

    INTERVAL = 0.05
    _PAGE = os.sysconf("SC_PAGE_SIZE")

    @staticmethod
    def _rss_bytes() -> int:
        with open("/proc/self/statm", encoding="ascii") as f:
            return int(f.read().split()[1]) * _RssSampler._PAGE

    def __init__(self):
        self._stop = threading.Event()
        self.base = self._rss_bytes()
        self.peak = self.base
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, self._rss_bytes())
            self._stop.wait(self.INTERVAL)

    def stop(self) -> int:
        """Return max RSS growth (bytes) observed since construction."""
        self._stop.set()
        self._thread.join(timeout=5)
        self.peak = max(self.peak, self._rss_bytes())
        return self.peak - self.base


@pytest.mark.skipif(
    not Path("/proc/self/statm").exists(), reason="needs Linux procfs"
)
def test_map_task_memory_envelope(fake_manager, worker, tmp_path):
    """Reference test_worker_11 analog, the MEMORY half: mapping the
    3.6 MB input_large corpus through the reference's own wc_map.sh
    must not grow this process's RSS by more than 1 MiB (the
    reference's exact bound at tests/test_worker_11.py:121) — the
    worker's map loop streams the mapper's stdout line-at-a-time
    (worker.py `for line in proc.stdout`), so peak memory is O(1) in
    input size, not O(file). The wc_map.sh subprocess's own memory is
    outside our RSS and is streaming anyway (the reference relies on
    the same decomposition).

    A small warm-up map runs first so one-time costs (subprocess
    machinery imports, allocator arenas) are paid outside the profiled
    window, mirroring the reference profiler's start-after-register
    sequencing."""
    fake_manager.wait_for(lambda ms: len(_non_heartbeat(ms)) >= 1)
    out_warm = tmp_path / "warm"
    out_warm.mkdir()
    send_json(
        "localhost",
        worker.port,
        {
            "message_type": "new_map_task",
            "task_id": 0,
            "executable": str(REF_DATA / "exec/wc_map.sh"),
            "input_paths": [str(REF_DATA / "input/file01")],
            "output_directory": str(out_warm),
            "num_partitions": 2,
            "worker_host": "localhost",
            "worker_port": worker.port,
        },
    )
    fake_manager.wait_for(
        lambda ms: any(m.get("message_type") == "finished" for m in ms)
    )

    out = tmp_path / "large"
    out.mkdir()
    sampler = _RssSampler()
    t0 = time.monotonic()
    send_json(
        "localhost",
        worker.port,
        {
            "message_type": "new_map_task",
            "task_id": 1,
            "executable": str(REF_DATA / "exec/wc_map.sh"),
            "input_paths": [
                str(REF_DATA / "input_large" / f"file{i:02d}")
                for i in (1, 2, 3, 4)
            ],
            "output_directory": str(out),
            "num_partitions": 4,
            "worker_host": "localhost",
            "worker_port": worker.port,
        },
    )
    fake_manager.wait_for(
        lambda ms: sum(
            1 for m in ms if m.get("message_type") == "finished"
        )
        >= 2,
        timeout=30.0,
    )
    elapsed = time.monotonic() - t0
    growth = sampler.stop()
    # Sanity: the map really ran over the large corpus (~640k tokens).
    n_lines = sum(
        sum(1 for _ in p.open(encoding="utf-8"))
        for p in out.glob("maptask00001-part*")
    )
    assert n_lines > 100_000
    assert growth < 1 * 1024 * 1024, f"RSS grew {growth} B during map"
    assert 0 < elapsed < 30.0


def test_job_root_cleanup_never_reaps_a_tenant_fleet(tmp_path):
    """Regression: with the collision fallback NESTED inside
    tmp/job-{id}, the owning fleet's cleanup must not rmtree the
    whole root while another fleet's m{port} scratch lives in it —
    each fleet removes only its own subtree, and the shared root is
    reaped by whichever fleet leaves last (empty-dir rmdir)."""
    from eeecs485_p4_mapreduce_spark.mrlite.manager import MRManagerServer

    root = tmp_path / "tmp" / "job-0"
    owner_inter = root / "intermediate"
    tenant = root / "m6001"
    tenant_inter = tenant / "intermediate"
    tenant_inter.mkdir(parents=True)
    (tenant_inter / "maptask00000-part00000").write_text("k\tv\n")
    owner_inter.mkdir()
    (owner_inter / "maptask00000-part00000").write_text("k\tv\n")

    # Owner leaves first: tenant's in-flight scratch must survive.
    MRManagerServer._cleanup_job_root(root, owner_inter, fallback=False)
    assert not owner_inter.exists()
    assert (tenant_inter / "maptask00000-part00000").read_text() == "k\tv\n"
    assert root.exists(), "root must survive while a tenant lives in it"

    # Tenant leaves last: its subtree goes, and the now-empty shared
    # root is reaped with it.
    MRManagerServer._cleanup_job_root(tenant, tenant_inter, fallback=True)
    assert not tenant.exists()
    assert not root.exists(), "last fleet out reaps the shared root"

    # Reverse order on a fresh tree: tenant first, then owner.
    tenant_inter.mkdir(parents=True)
    owner_inter.mkdir()
    MRManagerServer._cleanup_job_root(tenant, tenant_inter, fallback=True)
    assert not tenant.exists() and root.exists()
    MRManagerServer._cleanup_job_root(root, owner_inter, fallback=False)
    assert not root.exists()
