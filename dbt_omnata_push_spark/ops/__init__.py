from .rownum import with_global_index
from .batching import with_batch_number, collect_batches
from .records import record_struct, record_json
from .incremental import anti_join_incremental, high_watermark_filter, is_empty

__all__ = [
    "with_global_index",
    "with_batch_number",
    "collect_batches",
    "record_struct",
    "record_json",
    "anti_join_incremental",
    "high_watermark_filter",
    "is_empty",
]
