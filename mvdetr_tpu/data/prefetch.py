"""Host-side prefetch: overlap batch preparation + H2D transfer with compute.

The reference overlaps data preparation with GPU compute via DataLoader worker
processes (`/root/reference/main.py:70-73`). The TPU-native equivalent is a
producer thread that pulls host batches (themselves assembled by the
FrameDataset's worker pool) and stages them on device with ``jax.device_put``
ahead of the consuming train step — classic double buffering. With ``size=2``
the chip never waits on the host link unless the host is slower than the step
itself.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


def prefetch_to_device(iterator: Iterator, size: int = 2, shardings=None, put=None) -> Iterator:
    """Yield items from ``iterator`` staged on device ``size`` items ahead.

    ``shardings``: optional pytree of NamedShardings matching the item
    structure (dict leaves), e.g. :func:`mvdetr_tpu.parallel.batch_shardings`.
    Without it, items land on the default device. ``put``: optional callable
    ``item -> device item`` overriding the placement entirely (multi-host
    global-array assembly).
    """
    if put is None:
        put = lambda item: _put(item, shardings)
    if size <= 0:
        for item in iterator:
            yield put(item)
        return

    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    errors = []

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        except Exception as exc:  # surfaced on the consumer side
            errors.append(exc)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True, name="prefetch_to_device")
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
    thread.join()
    if errors:
        raise errors[0]


def _put(item, shardings):
    if shardings is None:
        return jax.device_put(item)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), item, shardings,
        is_leaf=lambda x: not isinstance(x, dict),
    )
