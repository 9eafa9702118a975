"""Overlap INDEPENDENT Spark actions from driver threads.

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially (optimization guide section 2.6). For pipelines built from
many small jobs - the IVM folds' merges, probe collects, and version
diffs - the per-job tail leaves most executor cores idle, and submitting
independent jobs from a small thread pool lets the next job's tasks
back-fill them. Default FIFO scheduling gives exactly the back-fill
behaviour wanted: the earlier job takes resources first, later jobs use
what is left.

The caller owns the independence proof. In catalog terms that means: no
thunk reads a table another thunk merges/overwrites (a concurrent writer
would flip the version pointer mid-read-plan), and no two thunks write
the SAME table (the version counter is read-modify-write on the driver).
Distinct tables' merges touch distinct directories and distinct pointer
files, so they compose; shared CACHED upstream frames are fine (the
block manager is thread-safe).
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark import inheritable_thread_target


def run_concurrently(*thunks: Callable[[], Any]) -> list[Any]:
    """Run independent action-bearing callables on driver threads and
    return their results in submission order.

    ``inheritable_thread_target`` carries the parent's JVM thread-local
    properties (job group / description) into each worker thread and
    cleans them up afterwards - the documented PySpark idiom for driver
    threads. Exceptions propagate: the first thunk's failure (in order)
    re-raises after all threads finish, so a failed merge never goes
    unnoticed while its siblings complete.
    """
    if len(thunks) <= 1:
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(inheritable_thread_target(t)) for t in thunks]
        # gather everything before raising: sibling jobs run to
        # completion either way (they share the session), and their
        # results/errors are deterministic in submission order
        return [f.result() for f in futures]
