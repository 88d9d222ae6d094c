"""Scalar expression library (SURVEY.md §2.8).

Every function here returns a pyspark Column built from built-in
expressions — JVM-side, codegen-friendly, no Python UDFs in the hot
path.
"""

from tmdataloader_spark.functions.paths import (
    parse_nth_value,
    get_last_path_component,
    replace_last_path_component,
    path_components,
    path_hlevel,
    path_prefixes_expr,
    escape_like,
)
from tmdataloader_spark.functions.values import (
    is_numeric,
    is_not_numeric_flag,
    usubjid,
    normalize_chars,
    normalize_whitespace,
)
from tmdataloader_spark.functions.timepoints import (
    timestamp_to_timepoint,
    timepoint_minutes,
    build_metadata_xml,
)

__all__ = [
    "parse_nth_value",
    "get_last_path_component",
    "replace_last_path_component",
    "path_components",
    "path_hlevel",
    "path_prefixes_expr",
    "escape_like",
    "is_numeric",
    "is_not_numeric_flag",
    "usubjid",
    "normalize_chars",
    "normalize_whitespace",
    "timestamp_to_timepoint",
    "timepoint_minutes",
    "build_metadata_xml",
]
