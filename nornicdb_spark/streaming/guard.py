"""High-water batch-id guard shared by the maintained indexes.

Every maintained index's replay idempotency (dynamic partition
overwrite of ``src_batch=N`` dirs, or src_batch-exclusion + anti-join)
assumes a batch_id identifies ONE batch for the life of the index.
Structured Streaming guarantees that through the stream's CHECKPOINT —
but an operator who resets the checkpoint while keeping the index path
restarts batch ids at 0, and the "replay" machinery then silently
destroys state: dynamic overwrite REPLACES the original batch-0
partitions (fulltext postings / IVF codes / near-dup matches vanish),
and the merge-log anti-join DROPS genuinely new merges (connectivity
under-merges forever). This marker makes that operator mistake loud.

The marker is a driver-side file beside the index tables: replays of
the LATEST batch (the only kind foreachBatch re-delivers) satisfy
``batch_id >= high_water``; anything below is a checkpoint/index
mismatch and raises. ``record`` after a batch's writes; ``reset`` on
(re)bootstrap, which starts a fresh stream era. On an object store,
stage the marker through the same client as the tables.
"""

from __future__ import annotations

import os

__all__ = ["check_batch", "record_batch", "max_batch_seen"]

_MARKER = "_max_batch"


def max_batch_seen(path: str) -> int | None:
    try:
        with open(os.path.join(path, _MARKER)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def record_batch(path: str, batch_id: int, reset: bool = False) -> None:
    os.makedirs(path, exist_ok=True)
    prior = None if reset else max_batch_seen(path)
    hi = int(batch_id) if prior is None else max(int(batch_id), prior)
    with open(os.path.join(path, _MARKER), "w") as f:
        f.write(str(hi))


def check_batch(path: str, batch_id: int) -> None:
    prior = max_batch_seen(path)
    if prior is not None and int(batch_id) < prior:
        raise ValueError(
            f"batch_id {batch_id} is below this index's high-water mark "
            f"{prior}: the stream checkpoint does not match the index "
            "path (reset checkpoint over an existing index?). Refusing "
            "to ingest — replays are only valid for the latest batch. "
            "Re-bootstrap or point the stream at a fresh index path."
        )
