"""Host staging-buffer allocation at hugepage speed.

On this class of virtualized host a first-touch page fault costs ~5 us
per 4 KB page, so any freshly allocated GB-scale buffer is written at
~200 MB/s no matter how fast the writer is (measured: the native RNG
runs 190 M draws/s into warm pages, 18 M draws/s into fresh ones).
``MADV_HUGEPAGE`` cuts the fault count 512x (measured 9.4x faster
first-touch end-to-end), so every large host staging buffer — RNG
output, factor-layout copies, dense A assembly — allocates here.

Anonymous mmap pages read as zero on first touch, so these buffers are
drop-in replacements for ``np.zeros`` as well as ``np.empty``.
"""

from __future__ import annotations

import ctypes
import math
import mmap

import numpy as np

_MADV_HUGEPAGE = 14
# Below this, regular allocation is fine (few pages; THP granule is 2 MB).
_MIN_BYTES = 4 << 20


def hugepage_empty(shape, dtype) -> np.ndarray:
    """np.empty with THP-backed pages for large buffers (contents are
    zero on first touch — anonymous mmap semantics)."""
    dtype = np.dtype(dtype)
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    nbytes = math.prod(shape) * dtype.itemsize
    if nbytes < _MIN_BYTES:
        return np.empty(shape, dtype)
    buf = mmap.mmap(-1, nbytes)
    try:
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        ctypes.CDLL(None).madvise(
            ctypes.c_void_p(addr), ctypes.c_size_t(nbytes), _MADV_HUGEPAGE
        )
    except Exception:  # pragma: no cover - madvise is advisory anyway
        pass
    return np.frombuffer(buf, dtype).reshape(shape)


def hugepage_zeros(shape, dtype) -> np.ndarray:
    """Zero-initialized THP-backed buffer (anonymous pages are zero)."""
    a = hugepage_empty(shape, dtype)
    if a.base is None:  # small fallback: np.empty is NOT zeroed
        a[...] = 0
    return a


def take_cast(src: np.ndarray, idx: np.ndarray, out: np.ndarray, chunk: int = 1 << 16):
    """``out[:len(idx)] = src[idx].astype(out.dtype)`` without
    materializing the gathered array in the source dtype (an f64->f32
    factor permute at 1M x 1000 would otherwise stage an 8 GB temp
    through cold pages).  np.take requires matching dtypes, so casts go
    through one reusable chunk-sized temp."""
    n = len(idx)
    tmp = None if src.dtype == out.dtype else np.empty((min(chunk, n), *src.shape[1:]), src.dtype)
    for i in range(0, n, chunk):
        j = min(i + chunk, n)
        if tmp is None:
            np.take(src, idx[i:j], axis=0, out=out[i:j])
        else:
            np.take(src, idx[i:j], axis=0, out=tmp[: j - i])
            out[i:j] = tmp[: j - i]
    return out
