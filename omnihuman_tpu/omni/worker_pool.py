"""Multiprocessing worker pool with child-exception propagation.

Capability parity with reference Omnihuman/worker_pool.py:13-93
(`WorkerPool`, `AsyncWorkerExceptionsWrapper`): map/starmap sync + async
variants where a child exception is re-raised in the parent (instead of
the silent hangs vanilla multiprocessing can produce), used by the batch
feature extractor for async .npy writes (extract_feature.py).
"""

from __future__ import annotations

import multiprocessing.pool
import traceback
from typing import Any, Callable, Iterable, List


class AsyncWorkerExceptionsWrapper:
    """Wraps a callable so exceptions carry their child traceback."""

    def __init__(self, callable_: Callable):
        self.__callable = callable_

    def __call__(self, *args, **kwargs):
        try:
            return self.__callable(*args, **kwargs)
        except Exception as e:
            raise type(e)(
                f"{e}\n--- child traceback ---\n{traceback.format_exc()}"
            ) from e


class WorkerPool(multiprocessing.pool.Pool):
    """Pool whose async APIs surface child exceptions in the parent."""

    def map(self, func, iterable: Iterable, chunksize=None) -> List[Any]:
        return super().map(AsyncWorkerExceptionsWrapper(func), iterable,
                           chunksize)

    def starmap(self, func, iterable: Iterable, chunksize=None) -> List[Any]:
        return super().starmap(AsyncWorkerExceptionsWrapper(func), iterable,
                               chunksize)

    def map_async(self, func, iterable: Iterable, chunksize=None,
                  callback=None, error_callback=None):
        return super().map_async(AsyncWorkerExceptionsWrapper(func),
                                 iterable, chunksize, callback,
                                 error_callback)

    def apply_async(self, func, args=(), kwds=None, callback=None,
                    error_callback=None):
        return super().apply_async(AsyncWorkerExceptionsWrapper(func), args,
                                   kwds or {}, callback, error_callback)
