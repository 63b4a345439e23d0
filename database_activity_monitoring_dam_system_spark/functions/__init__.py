from .scalars import (
    classify_operation,
    decode_hex_argument,
    extract_table_name,
    extract_username,
    infer_operation_status,
    is_system_query,
    query_fingerprint,
)
from .severity import severity_label, severity_rank, severity_greatest

__all__ = [
    "classify_operation",
    "decode_hex_argument",
    "extract_table_name",
    "extract_username",
    "infer_operation_status",
    "is_system_query",
    "query_fingerprint",
    "severity_label",
    "severity_rank",
    "severity_greatest",
]
