"""Scratch-directory placement for ephemeral staging and checkpoints.

Several declared queries build their own short-lived working state:
streaming replays stage micro-batch files and write a fresh streaming
checkpoint (offset log + commit log + state-store deltas, every one of
which the engine fsyncs before a micro-batch can commit), and the
snapshot/merge scenario queries seed a scratch table, merge into it,
and read it back — all removed before the query returns. None of that
I/O is the computation under test; it is harness plumbing whose
latency is pure fsync/rename cost on the backing filesystem.

``scratch_dir`` places those directories on a RAM-backed filesystem
when one is available (guide §6 — I/O layout): ``$MRS_SCRATCH_DIR`` if
set, else ``/dev/shm`` when present and writable, else the ordinary
``tempfile`` default. On a cluster, point ``MRS_SCRATCH_DIR`` at fast
local disk (or durable storage for a replay whose checkpoint must
survive the driver) — the data is ephemeral by construction, so the
default only has to be fast, not durable. Results are byte-identical
wherever the scratch lives; only the commit latency changes.
"""

from __future__ import annotations

import os
import tempfile

_ENV = "MRS_SCRATCH_DIR"
_SHM = "/dev/shm"


def scratch_root() -> str | None:
    """The directory scratch space is created under, or None for the
    tempfile default (honours $TMPDIR)."""
    root = os.environ.get(_ENV)
    if root:
        return root
    if os.path.isdir(_SHM) and os.access(_SHM, os.W_OK):
        return _SHM
    return None


def scratch_dir(prefix: str) -> str:
    """mkdtemp under the scratch root. Caller owns removal."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
