"""Writers / sinks (SURVEY.md §2.7): Spark DataFrame → statistical
file formats. Single-file formats with row-count headers ⇒ a pre-pass
aggregation job (widths/counts/ranges) + a driver-side streaming
assembly over toLocalIterator (the Spark translation of the
reference's two-pass sink_stata, pybindings.rs:951-1096)."""
