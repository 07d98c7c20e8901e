"""Pipeline variable substitution (F3).

The reference substitutes `%currentTimestamp%` (unix epoch **milliseconds**,
second resolution — `now().Unix()*1000`) into the user's custom aggregation
pipeline JSON before parsing it
(/root/reference/internal/mongo/variables/replace.go:17-30). The clock is an
injectable seam so tests pin time exactly (replace_test.go:11-13).

In the Spark engine the substitution runs at PLAN BUILD time on the driver —
the pipeline string is folded to a constant before Catalyst sees it, so the
filter it produces is still pushed down to the scan.
"""

from __future__ import annotations

import time
from collections.abc import Callable

CURRENT_TIMESTAMP = "%currentTimestamp%"


def replace_variables(text: str, *, now: Callable[[], float] | None = None) -> str:
    """Replace every supported %variable% in `text`.

    `now` returns epoch seconds (float ok); defaults to time.time. The
    substituted value is `int(now()) * 1000` — millisecond units at second
    resolution, byte-compatible with the reference (replace.go:18-20).
    """
    clock = now or time.time
    if CURRENT_TIMESTAMP in text:
        text = text.replace(CURRENT_TIMESTAMP, str(int(clock()) * 1000))
    return text
