from .pytree import pytree_dataclass, static_field, replace
from .keys import as_key, split_like, key_iter, KeyArray
from .profiling import trace, Timer, throughput
from .transfer import (TransferVerificationError, safe_device_get)

__all__ = [
    "pytree_dataclass",
    "static_field",
    "replace",
    "as_key",
    "split_like",
    "key_iter",
    "KeyArray",
    "trace",
    "Timer",
    "throughput",
    "safe_device_get",
    "TransferVerificationError",
]
