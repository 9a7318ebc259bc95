"""Host→device transfer helpers tuned for the tunneled TPU runtime.

The axon relay moves one synchronous ``device_put`` at ~47 MB/s; splitting a
multi-GB block into row chunks and enqueueing them back-to-back pipelines the
host-side serialization against the wire and measures ~62 MB/s (+32%) on the
same link. The chunks are concatenated on device (one HBM pass, ~7 ms for
5 GB) — peak HBM during the build is 2× the block, which fits the v5e's
16 GB beside the engine's other build-time residents.

For low-precision storage the cast happens HOST-side per chunk before the
put, halving the bytes on the wire (the device would otherwise receive fp32
and round after).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Below this, one put is fine — chunk bookkeeping would only add dispatches.
_CHUNK_MIN_BYTES = 128 * 1024 * 1024
_DEFAULT_CHUNKS = 8


def upload_rows(a: np.ndarray, dtype=None, chunks: int = _DEFAULT_CHUNKS):
    """Transfer ``a`` to the default device, chunked along axis 0.

    ``dtype``: optional storage dtype; narrower-than-source dtypes are cast
    on the HOST per chunk so the wire carries the narrow bytes.
    """
    want = jnp.dtype(dtype) if dtype is not None else a.dtype
    if a.nbytes < _CHUNK_MIN_BYTES or a.ndim == 0 or a.shape[0] < chunks:
        return jnp.asarray(a, dtype=dtype)
    cast_host = want.itemsize < a.dtype.itemsize
    bounds = np.linspace(0, a.shape[0], chunks + 1).astype(np.int64)
    parts = [
        jax.device_put(
            np.asarray(a[s:e], dtype=want) if cast_host else a[s:e]
        )
        for s, e in zip(bounds[:-1], bounds[1:])
    ]
    out = jnp.concatenate(parts, axis=0)
    del parts
    if out.dtype != want:
        out = out.astype(want)
    return out
