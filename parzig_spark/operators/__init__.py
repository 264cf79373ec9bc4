from .aggregate import aggregate_store  # noqa: F401
from .compact import compact_store, gc_store, plan_compaction, repair_rewrites, rewrite_store  # noqa: F401
from .delete import delete_rows  # noqa: F401
from .evolve import add_columns, drop_columns  # noqa: F401
from .inspect import files_table, rollback_store, snapshots_table  # noqa: F401
from .refs import (  # noqa: F401
    create_ref,
    drop_ref,
    list_refs,
    read_ref,
    refs_table,
    resolve_ref,
    update_ref,
)
from .decode import decode_table, decoded_schema, register_store  # noqa: F401
from .encode import column_digest, encode_table, plan_partitions  # noqa: F401
from .upsert import upsert_rows  # noqa: F401
from .changes import changes_table  # noqa: F401
from .quality import check_store  # noqa: F401
from .wap import publish_ref, stage_batch  # noqa: F401
from .verify import verify_roundtrip, verify_store  # noqa: F401
