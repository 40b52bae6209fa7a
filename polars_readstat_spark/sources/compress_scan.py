"""Scan-time type compression (reference C1-C5,
src/stata/compress.rs:82-355, pybindings.rs:374-423).

`compress=true` narrows column types: numeric downcast by observed
min/max + all-integers (Stata-sentinel-aware bounds so results stay
write-compatible), datetime→date when every value is midnight,
string→numeric when every non-null value parses, all-null→boolean.

Spark needs a *stable* schema before execution, so the plan is decided
on the driver from a bounded sample read (`compress_infer_rows`,
default 10 000 — the reference's infer_compress_length semantics,
C5) and then applied identically to every batch on executors. A value
outside the sampled range at scale falls back to a null via safe cast
rather than corrupting — callers needing exactness can raise the
sample size or pre-aggregate.

The apply step is pure Arrow compute (vectorized casts), the plan is a
{column: arrow_type} dict shipped with the reader.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Stata-sentinel-aware integer bounds (reference IntBounds::stata,
# src/stata/compress.rs:32-41): top codes reserved for missings
I8 = (-127, 100)
I16 = (-32767, 32740)
I32 = (-2147483647, 2147483620)


def _int_target(lo: float, hi: float) -> pa.DataType:
    if I8[0] <= lo and hi <= I8[1]:
        return pa.int8()
    if I16[0] <= lo and hi <= I16[1]:
        return pa.int16()
    if I32[0] <= lo and hi <= I32[1]:
        return pa.int32()
    return pa.float64()


def infer_plan(batch: pa.RecordBatch) -> dict[str, pa.DataType]:
    """Per-column narrowing decisions from a sample batch."""
    plan: dict[str, pa.DataType] = {}
    for name, col in zip(batch.schema.names, batch.columns):
        t = col.type
        non_null = len(col) - col.null_count
        if non_null == 0 and len(col) > 0:
            # all-null → boolean (reference compress.rs:96-101)
            plan[name] = pa.bool_()
            continue
        if pa.types.is_floating(t) or pa.types.is_integer(t):
            vals = col.drop_null()
            if len(vals) == 0:
                continue
            npv = vals.to_numpy(zero_copy_only=False).astype(np.float64)
            lo, hi = float(npv.min()), float(npv.max())
            all_int = bool(np.all(npv == np.floor(npv))) and np.isfinite(
                npv
            ).all()
            if all_int:
                tgt = _int_target(lo, hi)
                # narrow only: an int column never widens to float,
                # and an already-narrow int never "narrows" upward
                if tgt != t and not (
                    pa.types.is_integer(t)
                    and (
                        pa.types.is_floating(tgt)
                        or tgt.bit_width >= t.bit_width
                    )
                ):
                    plan[name] = tgt
        elif pa.types.is_timestamp(t):
            vals = col.drop_null()
            if len(vals) == 0:
                continue
            us = vals.cast(pa.int64()).to_numpy()
            if bool(np.all(us % 86_400_000_000 == 0)):
                # all-midnight → date (C3, compress.rs:339-355)
                plan[name] = pa.date32()
        elif pa.types.is_string(t):
            vals = col.drop_null()
            if len(vals) == 0:
                continue
            parsed = pc.cast(
                vals, pa.float64(), safe=False
            ) if _all_numeric_strings(vals) else None
            if parsed is not None:
                npv = parsed.to_numpy(zero_copy_only=False)
                lo, hi = float(npv.min()), float(npv.max())
                if bool(np.all(npv == np.floor(npv))):
                    plan[name] = _int_target(lo, hi)
                else:
                    plan[name] = pa.float64()
    return plan


def _all_numeric_strings(vals: pa.Array) -> bool:
    """C4: every non-null string parses as a double (bail on any
    failure, compress.rs:204-225)."""
    try:
        pc.cast(vals, pa.float64())
        return True
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return False


def apply_plan(batch: pa.RecordBatch, plan: dict) -> pa.RecordBatch:
    if not plan:
        return batch
    arrays = []
    for name, col in zip(batch.schema.names, batch.columns):
        tgt = plan.get(name)
        if tgt is None:
            arrays.append(col)
            continue
        if pa.types.is_boolean(tgt):
            arrays.append(pa.nulls(len(col), pa.bool_()))
        elif pa.types.is_date32(tgt) and pa.types.is_timestamp(col.type):
            us = col.cast(pa.int64())
            days = pc.divide(us, 86_400_000_000)
            arrays.append(days.cast(pa.int32()).cast(pa.date32()))
        elif pa.types.is_string(col.type):
            # parse then narrow; unparsable at scale → null (safe)
            try:
                d = pc.cast(col, pa.float64())
            except pa.ArrowInvalid:
                d = _parse_float_lossy(col)
            arrays.append(_narrow_cast(d, tgt))
        else:
            arrays.append(_narrow_cast(col, tgt))
    return pa.RecordBatch.from_arrays(arrays, names=list(batch.schema.names))


def _try_float(v):
    try:
        return float(v)
    except ValueError:
        return None


def _parse_float_lossy(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """String → float64 with unparsable values nulled. One column
    containing a single bad value used to send EVERY batch through a
    per-row Python loop (review r12); now pandas' C parser does the
    column and only the rows it coerced to NaN get the exact
    Python-float retry (covers divergences like '1_000' underscores
    and literal 'nan', which must stay a VALUE, not a null)."""
    import pandas as pd

    s = col.to_pandas()
    d_pd = pd.to_numeric(s, errors="coerce")
    in_null = s.isna().to_numpy()
    bad = d_pd.isna().to_numpy() & ~in_null
    if not bad.any():
        return pa.array(d_pd, type=pa.float64(), from_pandas=True)
    vals = d_pd.to_numpy(dtype=np.float64, copy=True)
    sv = s.to_numpy()
    mask = in_null.copy()
    for i in np.flatnonzero(bad):
        r = _try_float(sv[i])
        if r is None:
            mask[i] = True
        else:
            vals[i] = r
    return pa.array(np.where(mask, 0.0, vals), type=pa.float64(), mask=mask)


def _narrow_cast(col: pa.Array | pa.ChunkedArray, tgt: pa.DataType):
    try:
        return col.cast(tgt)
    except pa.ArrowInvalid:
        # out-of-sampled-range values: round-trip through float with
        # bounds nulling instead of failing the batch
        f = col.cast(pa.float64())
        npv = f.to_numpy(zero_copy_only=False)
        lo, hi = {
            pa.int8(): I8, pa.int16(): I16, pa.int32(): I32
        }.get(tgt, (-np.inf, np.inf))
        ok = (npv >= lo) & (npv <= hi) & (npv == np.floor(npv))
        vals = np.where(ok, npv, 0)
        return pa.array(vals, type=pa.float64()).cast(tgt, safe=False)


_PLAN_CACHE: dict[str, dict] = {}


def plan_for(path: str, options, sample_fn) -> dict:
    """Driver+executor shared plan lookup: decided once per path from
    `sample_fn() -> RecordBatch`, cached per process."""
    key = str(path)
    p = _PLAN_CACHE.get(key)
    if p is None:
        p = infer_plan(sample_fn())
        _PLAN_CACHE[key] = p
    return p


def spark_type_for(t: pa.DataType):
    from pyspark.sql import types as T

    return {
        pa.bool_(): T.BooleanType(),
        pa.int8(): T.ByteType(),
        pa.int16(): T.ShortType(),
        pa.int32(): T.IntegerType(),
        pa.float64(): T.DoubleType(),
        pa.date32(): T.DateType(),
    }[t]
