"""IO hardening for the raster read seam.

Reference: FileLayerProvider.scala:68-79 wraps every GDAL open/read in
fixed-count retry with backoff (remote object stores throw transient
errors routinely at fleet scale); :142-157 switches a product read to ONE
full-asset read when the requested windows cover most of the asset (one
range request beats hundreds of small ones).

Ours: ``with_retries`` is the seam wrapper (executors call it around every
window read — inert for the deterministic synthetic reader, load-bearing
the day a GDAL/object-store reader plugs in), and
``dense_cover_fraction`` is the read-full heuristic's decision input.
Retry counts surface through an optional callback — in a cluster job the
caller hands in a Spark accumulator's ``add``.
"""

from __future__ import annotations

import time
from typing import Callable

#: reference defaults (FileLayerProvider retries with short exponential
#: backoff a handful of times before failing the task — Spark's own task
#: retry is the outer loop)
DEFAULT_RETRIES = 4
DEFAULT_BACKOFF_S = 0.05

#: exceptions considered transient (network/file-handle classes); anything
#: else propagates immediately — retrying a ValueError hides bugs
TRANSIENT = (IOError, OSError, TimeoutError)


def with_retries(
    fn: Callable,
    retries: int = DEFAULT_RETRIES,
    backoff_s: float = DEFAULT_BACKOFF_S,
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException], None] | None = None,
) -> Callable:
    """Wrap ``fn`` with retry-on-transient-error + exponential backoff
    (0.05s, 0.1s, 0.2s, ...). After ``retries`` failed attempts the last
    exception propagates (Spark's task retry takes over). ``on_retry``
    receives (attempt_index, exception) per retry — pass an accumulator's
    ``add`` composed with logging to surface flake rates in the metrics
    table."""

    # retries counts ATTEMPTS; anything below 1 would silently return None
    # without ever invoking fn — reject it loudly instead
    if retries < 1:
        raise ValueError(f"retries must be >= 1 (attempts), got {retries}")

    def wrapped(*args, **kwargs):
        delay = backoff_s
        for attempt in range(retries):
            try:
                return fn(*args, **kwargs)
            except TRANSIENT as ex:
                if attempt == retries - 1:
                    raise
                if on_retry is not None:
                    on_retry(attempt, ex)
                sleep(delay)
                delay *= 2

    wrapped.__name__ = getattr(fn, "__name__", "wrapped")
    return wrapped


def dense_cover_fraction(keys, c0: int, r0: int, c1: int, r1: int) -> float:
    """Fraction of the bounding key rectangle [c0..c1] x [r0..r1] covered by
    ``keys`` — the decision input for the read-full-asset heuristic
    (FileLayerProvider.scala:142-157: above ~50%, one full read + slice
    beats per-window reads)."""
    area = (c1 - c0 + 1) * (r1 - r0 + 1)
    return len(set(keys)) / area if area > 0 else 0.0
