"""Progress / time-left estimation (reference A5 parity).

The reference estimates time left as items-left x average time per item
(/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/timereport/TimeLeftEstimationProvider.java:24-45),
computed from the job's elapsed time and processed-item count. This
estimator keeps that shape but averages over a ROLLING window of recent
batches, so a long run converges to the current throughput instead of
being dragged by a slow warm-up batch.
"""

from __future__ import annotations

from collections import deque


class TimeLeftEstimator:
    """items-left x rolling average time-per-item.

    ``record(n_items, wall_s)`` after each batch; ``eta_s`` / ``rate`` read
    the estimate. With fewer than one recorded batch the estimate is 0.0
    (unknown), matching the reference's behavior before the first timestamp
    pair exists.
    """

    def __init__(self, total_items: int, window: int = 16):
        if total_items < 0:
            raise ValueError("total_items must be >= 0")
        self.total_items = int(total_items)
        self.done_items = 0
        self._recent: deque[tuple[int, float]] = deque(maxlen=window)

    def record(self, n_items: int, wall_s: float) -> None:
        self.done_items += int(n_items)
        self._recent.append((int(n_items), float(wall_s)))

    @property
    def items_left(self) -> int:
        return max(0, self.total_items - self.done_items)

    @property
    def rate(self) -> float:
        """Recent items/sec (0.0 until something is recorded)."""
        items = sum(n for n, _ in self._recent)
        wall = sum(w for _, w in self._recent)
        return items / wall if wall > 0 else 0.0

    @property
    def eta_s(self) -> float:
        """Estimated seconds to finish the remaining items."""
        r = self.rate
        return self.items_left / r if r > 0 else 0.0
