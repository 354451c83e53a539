from lakeforge.ops.dedup import dedup_exact, dedup_keep_first, latest_per_key
from lakeforge.ops.joins import broadcast_left_join, full_outer_coalesce, resolve_interval_key
from lakeforge.ops.merge import merge_full_history
from lakeforge.ops.normalize import normalize_entity, require_keys
from lakeforge.ops.quality import duplicate_keys, table_summary
from lakeforge.ops.scd2 import scd2
from lakeforge.ops.star import build_bridge, build_dim_date, build_snapshot_fact

__all__ = [
    "normalize_entity",
    "require_keys",
    "dedup_exact",
    "dedup_keep_first",
    "latest_per_key",
    "merge_full_history",
    "scd2",
    "broadcast_left_join",
    "full_outer_coalesce",
    "resolve_interval_key",
    "build_dim_date",
    "build_bridge",
    "build_snapshot_fact",
    "table_summary",
    "duplicate_keys",
]
