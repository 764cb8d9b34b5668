from .parquet import TABLES, checkpoint_stage, load_tables, register_views, read_table
from .snapshot import (
    write_snapshot,
    overwrite_partition,
    add_partition,
    show_partitions,
    stamp_snapshot,
)

__all__ = [
    "TABLES",
    "load_tables",
    "register_views",
    "read_table",
    "checkpoint_stage",
    "write_snapshot",
    "overwrite_partition",
    "add_partition",
    "show_partitions",
    "stamp_snapshot",
]
