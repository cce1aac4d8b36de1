"""Host-side frame prefetch: overlap dataset decode/resize with device compute.

The reference's main loop reads, undistorts, and resizes each frame on the
host BETWEEN device steps (`main.py:247-250` — dataset[i] then create_frame),
so the GPU idles for the image-decode latency every frame. Here a worker
thread keeps a small bounded queue of preprocessed frames ahead of the
consumer: while the chip runs frame t's encode/decode/track, the host is
already decoding and resizing frame t+1 (and t+2).

Depth 2 is enough — preprocessing is tens of ms, a frame step is ~50 ms —
and the bounded queue keeps memory flat on long sequences.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Tuple


class FramePrefetcher:
    """Iterate (i, timestamp, resized) over dataset[lo:hi) with readahead.

    `preprocess` is called in the worker thread as preprocess(img) — e.g.
    `lambda img: resize_img(img, dataset.img_size)`. Exceptions raised by the
    dataset or preprocess are re-raised in the consumer at the failing index.
    """

    _SENTINEL = object()

    def __init__(
        self,
        dataset,
        preprocess: Callable,
        lo: int = 0,
        hi: Optional[int] = None,
        depth: int = 2,
    ):
        self.dataset = dataset
        self.preprocess = preprocess
        self.lo = lo
        self.hi = len(dataset) if hi is None else hi
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._work, name="frame-prefetch", daemon=True
        )

    def _work(self):
        try:
            for i in range(self.lo, self.hi):
                if self._stop.is_set():
                    return
                try:
                    timestamp, img = self.dataset[i]
                    item = (i, timestamp, self.preprocess(img))
                except BaseException as e:  # surface at the consumer
                    self._put((i, None, e))
                    return
                self._put(item)
        finally:
            self._put(self._SENTINEL)

    def _put(self, item):
        # Bounded put that still honors stop() while the queue is full
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue
        if item is self._SENTINEL:
            # the sentinel must ALWAYS land, or a consumer blocked in get()
            # after a cross-thread stop() hangs forever; drain one slot if
            # the queue is full (its content is moot once stopped)
            while True:
                try:
                    self._q.put_nowait(item)
                    return
                except queue.Full:
                    try:
                        self._q.get_nowait()
                    except queue.Empty:
                        pass

    def __iter__(self) -> Iterator[Tuple[int, float, dict]]:
        self._thread.start()
        try:
            while True:
                item = self._q.get()
                if item is self._SENTINEL:
                    return
                i, timestamp, payload = item
                if isinstance(payload, BaseException):
                    raise RuntimeError(f"prefetch failed at frame {i}") from payload
                yield i, timestamp, payload
        finally:
            self.stop()

    def stop(self):
        """Terminate the worker (used on early exit, e.g. viewer terminate)."""
        self._stop.set()


def uploading_preprocess(resize_fn: Callable) -> Callable:
    """Wrap a resize preprocess so the worker thread ALSO uploads the
    normalized image to the device ("img_dev" in the payload): the main
    loop's make_frame then pays no host->device transfer on the critical
    path (~5-20 ms/frame on a relay-backed TPU). JAX transfers are
    thread-safe; the upload of frame t+1 rides under frame t's compute."""
    import jax.numpy as jnp

    def fn(img):
        out = resize_fn(img)
        out["img_dev"] = jnp.asarray(out["img"])  # (1, h, w, 3) batched
        return out

    return fn
