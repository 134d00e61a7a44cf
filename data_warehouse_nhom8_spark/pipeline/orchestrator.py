"""Orchestration contracts (SURVEY.md intro (c)): retry with backoff,
mutual-exclusion locking, ledger-driven success detection.

The reference implements these in shell around cron (reference
extract/run_topcv_scraper_with_retry.sh: retry budget :22-23,
PID-liveness lock file :133-145, DB-status-based success detection
:186-196 — NOT exit codes; loadtowh twin in
load_to_wh_with_retry.sh:48-49,90-98). The engine keeps the exact
semantics as a library:

  * success is read from the run ledger, not the callable's return —
    a job that wrote a Failed row "failed" even if it returned;
  * a lock file with PID liveness guards concurrent runs of the same
    process; stale locks (dead PID) are broken, as the reference does;
  * the retry budget and interval come from RetryPolicy (config.xml
    parity); `sleeper` is injectable so tests don't wait 15 minutes.

Spark-level task retries cover intra-job failures; this layer covers
job-level reruns — the distinction the reference draws between MySQL
transactions and its cron wrappers.
"""

from __future__ import annotations

import datetime
import os
from collections.abc import Callable

from data_warehouse_nhom8_spark.pipeline.config import RetryPolicy
from data_warehouse_nhom8_spark.pipeline.ledger import RunLedger


class LockHeld(RuntimeError):
    pass


class ProcessLock:
    """PID-liveness lock file (reference run_topcv_scraper_with_retry.sh:133-145)."""

    def __init__(self, locks_path: str, process: str):
        os.makedirs(locks_path, exist_ok=True)
        self.path = os.path.join(locks_path, f"{process}.lock")

    def acquire(self) -> None:
        # O_CREAT|O_EXCL makes creation atomic — a bare exists()+open()
        # lets two simultaneous starters both "acquire" (the race the
        # lock exists to prevent). One retry after breaking a stale lock.
        for _attempt in range(2):
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return
            except FileExistsError:
                try:
                    pid = int(open(self.path).read().strip())
                except (ValueError, OSError):
                    pid = -1
                if pid > 0 and _alive(pid):
                    raise LockHeld(f"{self.path} held by live pid {pid}")
                try:
                    os.remove(self.path)  # stale lock: holder is dead
                except FileNotFoundError:
                    pass
        raise LockHeld(f"{self.path}: could not acquire after breaking stale lock")

    def release(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def run_with_retry(
    job: Callable[[], None],
    ledger: RunLedger,
    process: str,
    run_date: datetime.date,
    policy: RetryPolicy = RetryPolicy(),
    locks_path: str | None = None,
    sleeper: Callable[[float], None] | None = None,
) -> bool:
    """Run `job` until the LEDGER says Success, up to the retry budget.

    Returns True iff the ledger shows Success for (process, run_date)
    when we stop. The job itself is responsible for writing its ledger
    rows (open_run/close_run) — this wrapper only reads them, exactly
    like the reference's wrapper re-queries extract_log instead of
    trusting the exit code.
    """
    import time as _time

    sleep = sleeper or _time.sleep
    lock = ProcessLock(locks_path, process) if locks_path else None

    for attempt in range(1, policy.max_attempts + 1):
        if ledger.is_done(process, run_date):  # skip-if-done gate
            return True
        if lock is not None:
            lock.acquire()
        try:
            job()
        except Exception:
            pass  # success is decided by the ledger, not the exception
        finally:
            if lock is not None:
                lock.release()
        if ledger.is_done(process, run_date):
            return True
        if attempt < policy.max_attempts:
            sleep(policy.retry_interval_sec)
    return ledger.is_done(process, run_date)
