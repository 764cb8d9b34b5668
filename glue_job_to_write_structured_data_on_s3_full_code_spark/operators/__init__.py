from .top1 import top1_per_group
from .surrogate import sequential_key, scalable_key
from .fallback_join import FallbackTier, fallback_join
from .incremental import anti_join_new_rows
from .reconcile import reconcile

__all__ = [
    "top1_per_group",
    "sequential_key",
    "scalable_key",
    "FallbackTier",
    "fallback_join",
    "anti_join_new_rows",
    "reconcile",
]
