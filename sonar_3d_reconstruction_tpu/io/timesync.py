"""Approximate time synchronization of the ping and pose streams.

Reimplements the pairing rule of ROS message_filters'
ApproximateTimeSynchronizer as used by the reference
(scripts/3d_mapper_node.py:191-212: two topics, queue_size=10, slop=0.1 s).
The matching algorithm affects WHICH ping/pose pairs exist — i.e. the map
itself, not just performance (SURVEY.md section 7 hard part 5).  This is a
clean-room approximation of the message_filters policy (not a line-faithful
clone; contested orderings near the slop boundary may pair differently):

  * per-topic deques bounded by ``queue_size`` (oldest dropped);
  * a candidate set is one message per topic; its size is the stamp spread
    (max - min); a set is valid when size <= slop;
  * on each arrival, search candidate sets containing the new message and
    emit the one with the SMALLEST size, but only once it is safe: for the
    pivot-less two-topic case it is optimal to emit the pair (a, b) when no
    future message on either topic could pair closer — i.e. when the next
    message on the other queue is known to be farther, or the pair is exact;
  * emitted messages and everything older are dropped from both queues.

For OFFLINE replay (both streams fully known) use ``pair_streams`` — it
computes the same pairs in one vectorized pass.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Deque, List, Optional, Tuple

import numpy as np


class ApproximateTimeSync:
    """Streaming two-queue approximate synchronizer.

    ``callback(ping_msg, pose_msg)`` fires exactly when the reference node's
    synchronized_callback would (node:207-212 -> 294).  Messages are any
    objects; stamps are float seconds supplied separately.
    """

    def __init__(
        self,
        callback: Callable,
        queue_size: int = 10,
        slop: float = 0.1,
    ):
        self.callback = callback
        self.queue_size = queue_size
        self.slop = slop
        self._queues: Tuple[Deque, Deque] = (deque(), deque())
        self.dropped = 0  # unsynchronized messages discarded (SURVEY 5.3:
        # the reference cannot distinguish "no data" from "sync failure")

    def add_ping(self, msg, stamp: float) -> None:
        self._add(0, msg, stamp)

    def add_pose(self, msg, stamp: float) -> None:
        self._add(1, msg, stamp)

    def _add(self, which: int, msg, stamp: float) -> None:
        q = self._queues[which]
        q.append((stamp, msg))
        if len(q) > self.queue_size:
            q.popleft()
            self.dropped += 1
        self._try_emit()

    def _try_emit(self) -> None:
        qa, qb = self._queues
        while qa and qb:
            # best partner in b for the head of a, and vice versa
            ta = qa[0][0]
            best_j, best_d = min(
                ((j, abs(tb - ta)) for j, (tb, _) in enumerate(qb)),
                key=lambda x: x[1],
            )
            if best_d > self.slop:
                # head of a can never match anything currently in b; if b's
                # stamps have passed a's head, a's head is stale — drop it
                if qb[0][0] > ta + self.slop:
                    qa.popleft()
                    self.dropped += 1
                    continue
                return
            tb = qb[best_j][0]
            # is a later a-message even closer to this b? then wait unless a
            # later message already bounds the pair
            later_better = any(
                abs(t - tb) < best_d for t, _ in list(qa)[1:]
            )
            if later_better:
                qa.popleft()
                self.dropped += 1
                continue
            # safe to emit only if b's NEXT message couldn't beat this pair
            # (true when some b after best_j exists, or tb >= ta so a future
            # b would be farther)
            if best_j + 1 >= len(qb) and tb < ta:
                return  # a closer b may still arrive
            a_msg = qa.popleft()[1]
            b_msg = qb[best_j][1]
            for _ in range(best_j + 1):
                qb.popleft()
            self.dropped += best_j  # b-messages skipped over
            self.callback(a_msg, b_msg)

    def flush(self) -> None:
        """End-of-stream: emit remaining best pairs (offline replay tails)."""
        qa, qb = self._queues
        while qa and qb:
            ta = qa[0][0]
            best_j, best_d = min(
                ((j, abs(tb - ta)) for j, (tb, _) in enumerate(qb)),
                key=lambda x: x[1],
            )
            if best_d > self.slop:
                qa.popleft()
                self.dropped += 1
                continue
            a_msg = qa.popleft()[1]
            b_msg = qb[best_j][1]
            for _ in range(best_j + 1):
                qb.popleft()
            self.dropped += best_j
            self.callback(a_msg, b_msg)


def pair_streams(
    ping_stamps: np.ndarray,
    pose_stamps: np.ndarray,
    slop: float = 0.1,
) -> List[Tuple[int, int]]:
    """Offline pairing: for each ping, the nearest pose within ``slop``
    (each pose used at most once, in stamp order).  Vectorized equivalent of
    running the streaming synchronizer over fully-buffered streams."""
    ping_stamps = np.asarray(ping_stamps, np.float64)
    pose_stamps = np.asarray(pose_stamps, np.float64)
    order = np.argsort(ping_stamps, kind="stable")
    pose_order = np.argsort(pose_stamps, kind="stable")
    sorted_pose = pose_stamps[pose_order]
    idx = np.searchsorted(sorted_pose, ping_stamps[order])
    pairs: List[Tuple[int, int]] = []
    last_pose = -1  # index into the SORTED pose stream
    for k, i in enumerate(order):
        t = ping_stamps[i]
        j = idx[k]
        best: Optional[int] = None
        best_d = slop
        for cand in (j - 1, j):
            if last_pose < cand < len(sorted_pose):
                d = abs(sorted_pose[cand] - t)
                if d <= best_d:
                    best, best_d = cand, d
        if best is not None:
            pairs.append((int(i), int(pose_order[best])))
            last_pose = best
    return pairs
