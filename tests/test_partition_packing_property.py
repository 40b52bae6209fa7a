"""Property tests for MultiFileReader's small-file packing: the
invariant that matters is EXACTNESS — every inner partition appears
in the output exactly once, in order (row values and path lineage
follow from it). A packing bug here is silent data loss/duplication,
the worst failure class a scan can have, so the arithmetic gets a
hypothesis sweep, not just the two example-based tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from polars_readstat_spark.sources.datasource import (
    MultiFileReader,
    MultiPart,
    MultiPartGroup,
)


class _FakeReader:
    def __init__(self, nparts):
        self._parts = list(range(nparts))

    def partitions(self):
        return self._parts


def _build(file_parts, sizes, target, tmp_path):
    """A MultiFileReader over fake readers with controlled sizes —
    paths are real files so getsize works; size None = missing."""
    import os

    paths = []
    for i, sz in enumerate(sizes):
        p = str(tmp_path / f"f{i}.dta")
        if sz is None:
            p = str(tmp_path / f"missing{i}.dta")  # never created
        else:
            with open(p, "wb") as f:
                f.write(b"\0" * min(sz, 1 << 20))
            # lie about big sizes via truncate (sparse) to keep disk flat
            if sz > (1 << 20):
                os.truncate(p, sz)
        paths.append(p)
    readers = [_FakeReader(n) for n in file_parts]
    return MultiFileReader(readers, paths, None, coalesce_target=target)


@settings(max_examples=120, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # partitions per file
            st.one_of(
                st.none(),  # stat fails
                st.integers(min_value=0, max_value=1 << 31),
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    target=st.integers(min_value=0, max_value=64),
)
def test_packing_preserves_every_unit_exactly_once(
    data, target, tmp_path_factory
):
    tmp = tmp_path_factory.mktemp("pack")
    file_parts = [n for n, _ in data]
    sizes = [s for _, s in data]
    rd = _build(file_parts, sizes, target, tmp)
    out = rd.partitions()

    flat = []
    for p in out:
        if isinstance(p, MultiPartGroup):
            assert len(p.units) >= 2  # singletons stay bare MultiPart
            flat.extend(p.units)
        else:
            assert isinstance(p, MultiPart)
            flat.append(p)
    # exactness: same multiset, same order as the unpacked plan
    expect = [
        (i, j) for i, n in enumerate(file_parts) for j in range(n)
    ]
    got = [(u.file_idx, u.inner) for u in flat]
    assert got == expect

    total_units = sum(file_parts)
    if target <= 0 or total_units <= target:
        # packing off: nothing grouped
        assert len(out) == total_units
    else:
        # never fewer groups than... the bin math guarantees >= 1;
        # the parallelism floor comes from per_bin = total/target
        assert 1 <= len(out) <= total_units
        # unknown-size files never share a bin with anything
        for p in out:
            if isinstance(p, MultiPartGroup):
                assert all(
                    sizes[u.file_idx] is not None for u in p.units
                )


@settings(max_examples=60, deadline=None)
@given(
    nfiles=st.integers(min_value=2, max_value=200),
    target=st.integers(min_value=1, max_value=32),
)
def test_tiny_files_pack_to_at_least_target(
    nfiles, target, tmp_path_factory
):
    """All-tiny directories must keep AT LEAST `target` output
    partitions (never starve the cores) while actually packing when
    there are more units than the target."""
    tmp = tmp_path_factory.mktemp("tiny")
    rd = _build([1] * nfiles, [1000] * nfiles, target, tmp)
    out = rd.partitions()
    if nfiles <= target:
        assert len(out) == nfiles
    else:
        assert target <= len(out) < nfiles or len(out) == nfiles
        # tiny files: open-cost-bounded bins => genuinely packed
        if nfiles > 2 * target:
            assert len(out) < nfiles
