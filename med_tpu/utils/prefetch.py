"""Host->device double-buffered prefetch.

The reference's DataLoader feeds batches synchronously and the device stalls
on every host transfer (plus per-batch metric syncs). Here batch transfer is
started ``depth`` batches ahead (JAX device_put is async), so the TPU never
waits on input I/O (SURVEY.md §7 layer 3).
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    batches: Iterable[dict], depth: int = 2, sharding=None
) -> Iterator[dict]:
    """Yield batches already resident on device, keeping ``depth`` transfers
    in flight. Keys starting with '_' stay on host."""

    def put(batch):
        out = {}
        for k, v in batch.items():
            if k.startswith("_"):
                out[k] = v
            elif sharding is not None:
                out[k] = jax.device_put(v, sharding)
            else:
                out[k] = jax.device_put(v)
        return out

    queue = collections.deque()
    it = iter(batches)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        nxt: Optional[dict] = None
        try:
            nxt = put(next(it))
        except StopIteration:
            pass
        yield queue.popleft()
        if nxt is not None:
            queue.append(nxt)
