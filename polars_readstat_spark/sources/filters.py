"""Filter pushdown for the readstat data source (Spark 4.1
`pushFilters`).

The reference applies predicates batch-wise after decode (P4,
reference __init__.py:657-659; README.md:71-73 "filters applied after
reading"). The Spark translation is stronger: accepted filters are
applied to each Arrow batch *inside the Python worker*, so filtered
rows never cross the Python→JVM boundary — on a selective predicate
that transfer is the scan's dominant cost. Unsupported filters are
returned to Spark and evaluated by Catalyst above the scan as usual.

Accepted shapes: comparisons / In / IsNull / StringStartsWith-style on
top-level columns, plus Not of those. Everything else is declined —
correctness never depends on acceptance.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)


def _compile(f: Filter):
    """Filter → callable(RecordBatch) -> BooleanArray, or None if the
    shape isn't supported batch-side."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(f, Not):
        inner = _compile(f.child)
        if inner is None:
            return None

        def neg(batch, _inner=inner):
            m = _inner(batch)
            # Kleene: NOT null stays null (dropped by filter)
            return pc.invert(m)

        return neg

    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1:
        return None
    col = attr[0]

    def c(batch):
        if col not in batch.schema.names:
            raise ValueError(f"pushed filter references unknown column {col}")
        return batch.column(batch.schema.get_field_index(col))

    if isinstance(f, EqualTo):
        return lambda b: pc.equal(c(b), pa.scalar(f.value))
    if isinstance(f, EqualNullSafe):
        if f.value is None:
            # <=> NULL means "is null"; the fill_null(equal(col, None))
            # formulation would be an all-true mask — decline instead of
            # risking wrong rows if Spark ever pushes this shape
            return None
        return lambda b: pc.fill_null(pc.equal(c(b), pa.scalar(f.value)),
                                      False)
    if isinstance(f, GreaterThan):
        return lambda b: pc.greater(c(b), pa.scalar(f.value))
    if isinstance(f, GreaterThanOrEqual):
        return lambda b: pc.greater_equal(c(b), pa.scalar(f.value))
    if isinstance(f, LessThan):
        return lambda b: pc.less(c(b), pa.scalar(f.value))
    if isinstance(f, LessThanOrEqual):
        return lambda b: pc.less_equal(c(b), pa.scalar(f.value))
    if isinstance(f, In):
        values = list(f.value)
        if any(v is None for v in values):
            # SQL IN drops null rows (NULL comparison yields NULL) but
            # pc.is_in null-matches them — decline rather than diverge
            return None
        return lambda b: pc.is_in(c(b), value_set=pa.array(values))
    if isinstance(f, IsNull):
        return lambda b: pc.is_null(c(b))
    if isinstance(f, IsNotNull):
        return lambda b: pc.is_valid(c(b))
    if isinstance(f, StringStartsWith):
        return lambda b: pc.starts_with(c(b), f.value)
    if isinstance(f, StringEndsWith):
        return lambda b: pc.ends_with(c(b), f.value)
    if isinstance(f, StringContains):
        return lambda b: pc.match_substring(c(b), f.value)
    return None


class BatchFilterReader(DataSourceReader):
    """Outermost reader wrapper: accepts what it can at pushFilters
    time, applies the conjunction per batch (null → row dropped, SQL
    semantics), delegates everything else."""

    def __init__(self, inner: DataSourceReader):
        self.inner = inner
        self._preds = []

    def pushFilters(self, filters):
        rest = []
        for f in filters:
            fn = _compile(f)
            if fn is None:
                rest.append(f)
            else:
                self._preds.append(fn)
        return rest

    def partitions(self):
        return self.inner.partitions()

    def read(self, partition):
        if not self._preds:
            yield from self.inner.read(partition)
            return
        import pyarrow.compute as pc

        for batch in self.inner.read(partition):
            mask = None
            for p in self._preds:
                m = p(batch)
                mask = m if mask is None else pc.and_kleene(mask, m)
            yield batch.filter(mask)