"""TCP job-submission endpoint: the reference's ``mapreduce-manager``
network surface (the C1 hop that SURVEY §2.6 initially left out).

Protocol — pinned by the reference's own client
(reference: mapreduce/submit.py:70-89): a client opens a TCP connection,
sends ONE JSON message, and closes without waiting for a response
(fire-and-forget). Message types handled:

- ``new_manager_job`` with fields ``input_directory``,
  ``output_directory``, ``mapper_executable``, ``reducer_executable``,
  ``num_mappers``, ``num_reducers`` — exactly the dict the reference
  client builds (submit.py:70-78).
- ``shutdown`` — stop accepting work, finish the in-flight job, drop the
  queue, exit (reference: tests/test_manager_00 sends shutdown as the
  clean exit path).

Jobs run FIFO on a single runner thread — the reference manager also
serializes jobs (FIFO ids from 0; tests/test_manager_05/06 queue a second
job behind the first). The data plane is Spark via ``MREngine``; this
module is ONLY the network control surface, so scripts that today call
``mapreduce-submit`` against the reference can point at this endpoint
unchanged.

Malformed messages are ignored, matching the reference manager's
behavior of discarding undecodable JSON rather than crashing — but the
drop is OBSERVABLE: ``malformed_count`` increments per discarded
message so an operator can tell "client never sent" apart from "server
discarded garbage" without packet captures.
"""

from __future__ import annotations

import json
import queue
import socket
import threading
from dataclasses import dataclass, field

from eeecs485_p4_mapreduce_spark.mrlite.engine import MREngine, MRJobResult


@dataclass
class JobRecord:
    """One submitted job's lifecycle, observable by tests/tools."""

    message: dict
    result: MRJobResult | None = None
    error: str | None = None
    done: threading.Event = field(default_factory=threading.Event)


class MRManagerServer:
    """Threaded TCP server speaking the reference's submit protocol.

    ``port=0`` binds an ephemeral port (read ``self.port`` after
    ``start()``). ``start()`` returns immediately; ``join()`` blocks until
    a shutdown message (or ``stop()``) has been processed.
    """

    def __init__(self, engine: MREngine, host: str = "localhost", port: int = 6000):
        self.engine = engine
        self.host = host
        self.port = port
        self.jobs: list[JobRecord] = []
        #: messages discarded as undecodable JSON (observability counter;
        #: the discard itself is reference-matching behavior)
        self.malformed_count = 0
        self._queue: queue.Queue[JobRecord | None] = queue.Queue()
        self._sock: socket.socket | None = None
        self._threads: list[threading.Thread] = []
        self._shutdown = threading.Event()

    def start(self) -> "MRManagerServer":
        sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        sock.bind((self.host, self.port))
        self.port = sock.getsockname()[1]
        sock.listen()
        sock.settimeout(0.5)  # so the accept loop notices shutdown
        self._sock = sock
        for target in (self._accept_loop, self._runner_loop):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    # -- network side ------------------------------------------------------

    def _accept_loop(self) -> None:
        assert self._sock is not None
        while not self._shutdown.is_set():
            try:
                conn, _addr = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            with conn:
                chunks = []
                try:
                    while chunk := conn.recv(65536):
                        chunks.append(chunk)
                except OSError:
                    continue
            try:
                message = json.loads(b"".join(chunks).decode("utf-8"))
            except (ValueError, UnicodeDecodeError):
                # reference behavior: discard undecodable messages (but
                # count the drop so operators can see it happening)
                self.malformed_count += 1
                continue
            self._dispatch(message)
        self._sock.close()

    def _dispatch(self, message: dict) -> None:
        mtype = message.get("message_type")
        if mtype == "new_manager_job":
            rec = JobRecord(message=message)
            self.jobs.append(rec)
            if self._shutdown.is_set():
                # The runner loop has exited (or is exiting); queueing now
                # would leave rec.done forever unset for a waiting client.
                rec.error = "dropped: shutdown"
                rec.done.set()
            else:
                self._queue.put(rec)
        elif mtype == "shutdown":
            self._shutdown.set()
            self._queue.put(None)  # wake the runner

    # -- job side ----------------------------------------------------------

    def _runner_loop(self) -> None:
        while True:
            rec = self._queue.get()
            if rec is None or self._shutdown.is_set():
                # Drain everything still queued (including the record we
                # may have just dequeued): a client blocked on rec.done
                # must never hang because shutdown raced its submit.
                leftovers = [] if rec is None else [rec]
                while not self._queue.empty():
                    extra = self._queue.get_nowait()
                    if extra is not None:
                        leftovers.append(extra)
                for dropped in leftovers:
                    if not dropped.done.is_set():
                        dropped.error = "dropped: shutdown"
                        dropped.done.set()
                break
            try:
                rec.result = self.engine.submit_job(
                    input_directory=rec.message["input_directory"],
                    output_directory=rec.message["output_directory"],
                    mapper_executable=rec.message["mapper_executable"],
                    reducer_executable=rec.message["reducer_executable"],
                    num_mappers=int(rec.message.get("num_mappers", 2)),
                    num_reducers=int(rec.message.get("num_reducers", 2)),
                )
            except Exception as exc:  # noqa: BLE001 — survive bad jobs
                rec.error = f"{type(exc).__name__}: {exc}"
            finally:
                rec.done.set()

    # -- lifecycle ---------------------------------------------------------

    def stop(self) -> None:
        """Local equivalent of receiving a shutdown message."""
        self._shutdown.set()
        self._queue.put(None)

    def join(self, timeout: float | None = None) -> None:
        for t in self._threads:
            t.join(timeout)

    def is_alive(self) -> bool:
        return any(t.is_alive() for t in self._threads)
