"""Writers / sinks (SURVEY.md §2.7): Spark DataFrame → statistical
file formats. Single-file formats with row-count headers ⇒ a pre-pass
aggregation job (widths/counts/ranges) + a driver-side streaming
assembly over toLocalIterator (the Spark translation of the
reference's two-pass sink_stata, pybindings.rs:951-1096)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_epoch_seconds(c: Column) -> Column:
    """Wall-clock seconds since 1970-01-01 00:00:00 for TIMESTAMP or
    TIMESTAMP_NTZ, without any timezone interpretation (NTZ cannot be
    cast to double in Spark 4; field arithmetic sidesteps session-tz
    coupling entirely)."""
    return (
        F.unix_date(F.to_date(c)).cast("double") * 86400.0
        + F.hour(c) * 3600.0
        + F.minute(c) * 60.0
        + F.second(c).cast("double")
        + F.date_format(c, "SSSSSS").cast("double") / 1e6
    )
