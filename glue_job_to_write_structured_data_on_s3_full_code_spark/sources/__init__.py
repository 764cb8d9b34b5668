from .files import read_csv, read_json, read_orc, write_csv, write_json, write_orc
from .raw import read_raw_objects, read_raw_text
from .parquet import (
    TABLES,
    checkpoint_stage,
    load_tables,
    materialize_result,
    register_views,
    read_table,
    table_input_bytes,
)
from .snapshot import (
    write_snapshot,
    overwrite_partition,
    add_partition,
    ensure_table,
    show_partitions,
    stamp_snapshot,
    sync_partitions,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_orc",
    "write_orc",
    "write_csv",
    "write_json",
    "TABLES",
    "load_tables",
    "register_views",
    "read_table",
    "read_raw_objects",
    "read_raw_text",
    "checkpoint_stage",
    "materialize_result",
    "write_snapshot",
    "overwrite_partition",
    "add_partition",
    "ensure_table",
    "show_partitions",
    "stamp_snapshot",
    "sync_partitions",
]
