"""Shared helpers for the query pipelines: pruned reads, partial
aggregation, explicit partitioned hash join.

Performance rules baked in (SURVEY.md opening brief):
- always pass ``columns=`` to read_parquet (prune at the read);
- pre-aggregate inside map_batches before any groupby shuffle;
- broadcast small sides with ``ray.put`` instead of shuffling a join.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


class EmptyTableError(ValueError):
    """Designed loud failure: a REQUIRED input table has zero rows.

    Ray Data never invokes a map_batches fn over a 0-row dataset, so the
    very first map stage of any pipeline over an empty table erases the
    schema and the query dies later with a misleading KeyError deep in a
    task (STATUS item 26's root cause).  The ``load()``-level guard
    turns every such death into this one uniform, documented error at
    pipeline-construction time.  Mid-pipeline empties (post-filter 0-row
    TYPED blocks — the case that actually occurs at 100 TB) are
    unaffected: their producing fn ran and returned a typed frame."""


def _parquet_num_rows(path: str) -> int:
    """Row count from parquet FOOTER metadata only — no data pages are
    read, and a multi-file directory early-exits at the first file with
    any rows."""
    import pyarrow.parquet as pq
    from pathlib import Path

    p = Path(path)
    files = sorted(p.glob("*.parquet")) if p.is_dir() else [p]
    total = 0
    for f in files:
        total += pq.ParquetFile(f).metadata.num_rows
        if total:
            break
    return total


def _require_rows(path: str, table: str) -> None:
    if _parquet_num_rows(path) == 0:
        raise EmptyTableError(
            f"required table {table!r} at {path} has zero rows — "
            "refusing to build a pipeline over an empty input table")


def load(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    path = os.path.join(sf_dir, f"{table}.parquet")
    _require_rows(path, table)
    return rd.read_parquet(path, columns=columns)


def memoized_parquet_corpus(dir_path: str, spans: list[tuple[int, int]],
                            make, sentinel: str) -> str:
    """Shared synth-corpus scaffold (audio/video media tables): write
    ``make(lo, hi)`` chunks once to ``dir_path/part-00000.parquet`` with a
    ``_DONE`` sentinel; chunk synthesis fans out as Ray tasks when a
    session exists (per-item codec work is CPU-bound), serial otherwise."""
    from pathlib import Path

    import pyarrow.parquet as pq

    d = Path(dir_path)
    done = d / "_DONE"
    if done.exists():
        return str(d)
    d.mkdir(parents=True, exist_ok=True)
    for old in d.glob("*"):
        old.unlink()
    if ray.is_initialized() and len(spans) > 1:
        gen = ray.remote(make)
        chunks = ray.get([gen.remote(lo, hi) for lo, hi in spans])
    else:
        chunks = [make(lo, hi) for lo, hi in spans]
    pq.write_table(pa.concat_tables(chunks), d / "part-00000.parquet")
    done.write_text(sentinel)
    return str(d)


def load_arrow(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side Arrow load for SMALL dimension tables only (broadcast
    side of a join). Never call on lineitem/orders/documents at scale.
    Same zero-row guard as :func:`load` — an empty dimension table is a
    configuration error, not a joinable input."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    _require_rows(path, table)
    return pq.read_table(path, columns=columns)


def _pin_key_dtypes(out: pd.DataFrame, src: pd.DataFrame,
                    keys: list[str]) -> pd.DataFrame:
    """Pin string-typed group-key columns to the pandas "string" dtype in a
    partial's OUTPUT.  A block whose keys are ALL null would otherwise leave
    pandas as an object column of NaN, which Arrow infers as double — one
    such block poisons the schema merge of the whole grouped stage.  The
    cast is value-independent (never let a block's VALUES pick its dtype):
    real strings produce the identical Arrow string type either way."""
    for k in keys:
        d = src[k].dtype
        if d == object or str(d) == "string":
            out[k] = out[k].astype("string")
    return out


def partial_groupby(ds: rd.Dataset, keys: list[str], aggs: dict[str, tuple[str, str]],
                    batch_size: int = 65536, prep=None,
                    many_groups: bool = False, num_buckets: int = 16) -> rd.Dataset:
    """Two-phase grouped aggregation: per-batch partials inside map_batches
    (combiner), then a tiny global groupby over one row per key per batch —
    the shuffle moves partials, not rows (ray_guide 'Aggregation at scale').

    aggs: out_col -> (in_col, fn) with fn in {sum, count, min, max}.
    count partials become sums in the reduce phase.  ``prep(batch)`` runs
    inside the same map task before grouping (fusing derived-column maps
    into the combiner — every separate Ray operator costs fixed scheduling
    time that dwarfs small-query compute).

    The reduce phase is ALWAYS the hash-bucketed task exchange with a
    vectorized pandas groupby inside each bucket — one ``num_buckets``-way
    shuffle of partial rows regardless of key cardinality.  (It replaced
    Ray Data's ``groupby().aggregate()`` reduce outright: that path cost
    ~8 ms PER GROUP on this Ray version — measured 12.5 s for 1,500
    groups — and its sort-based boundary sampler cannot order NULL string
    keys at all, while SQL GROUP BY keeps NULL as a group.  Measured at
    sf0.1 on a 6-group rollup the two were within noise, so the exchange
    wins on every axis.)  ``many_groups`` is retained as a no-op tuning
    hint for call-site documentation.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if prep is not None:
            batch = prep(batch)
        # dropna=False: SQL GROUP BY (the DuckDB-oracle contract) keeps
        # NULL as a group — pandas' default silently drops it
        g = batch.groupby(keys, sort=False, observed=True, dropna=False)
        out = {}
        for out_col, (in_col, fn) in aggs.items():
            if fn == "count":
                out[out_col] = g.size()
            elif fn == "sum":
                # min_count=1: SQL SUM over an all-NULL group is NULL,
                # pandas' default skipna sum would say 0
                out[out_col] = g[in_col].sum(min_count=1)
            elif fn == "min":
                out[out_col] = g[in_col].min()
            elif fn == "max":
                out[out_col] = g[in_col].max()
            else:
                raise ValueError(fn)
        return _pin_key_dtypes(pd.DataFrame(out).reset_index(), batch, keys)

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not set(keys) <= set(g.columns):
            # a FULLY-empty input reaches the reduce as Ray's COLUMN-LESS
            # empty-block artifact (map_batches never ran on any block).
            # Reindex to the output contract: every bucket takes this same
            # branch in that case, so block schemas stay consistent.
            g = g.reindex(columns=[*keys, *aggs])
        gg = g.groupby(keys, sort=False, observed=True, dropna=False)
        out = {}
        for out_col, (_in, fn) in aggs.items():
            if fn == "sum":  # NULL partials stay NULL through the reduce
                out[out_col] = gg[out_col].sum(min_count=1)
            elif fn == "count":  # count partials are never NULL: plain sum
                out[out_col] = gg[out_col].sum()
            else:
                out[out_col] = getattr(gg[out_col], fn)()
        return _pin_key_dtypes(pd.DataFrame(out).reset_index(), g, keys)

    def part_of(df: pd.DataFrame) -> np.ndarray:
        # string-canonical multi-key bucketing (NOT hash_pandas_object):
        # blocks of one logical int key can drift int64<->float64 after
        # an outer join, and a dtype-sensitive hash would fragment that
        # key's partials across buckets — the group would emit twice
        return bucket_of_keys(df, keys, num_buckets)

    return task_hash_exchange(partials, part_of, reduce_bucket, num_buckets,
                              key_cols=keys)


# per-worker-process cache for broadcast objects: worker processes persist
# across tasks, so the first task per worker pays the ray.get (zero-copy from
# the local object store) and the rest hit the dict.  Stateless tasks + this
# cache beat an actor pool when the "state" is just a broadcast ref — actor
# pools cost ~0.5-1 s of spin-up per pool on this sandbox, which dominates
# small queries (actor pools remain the right tool for expensive state:
# FetchStage's corpus index, decode stages).
_BROADCAST_CACHE: dict = {}
_BROADCAST_CACHE_MAX = 16  # bound: each entry can be a whole dimension
                           # table / query matrix — a long-lived worker
                           # serving many queries must not accumulate one
                           # copy per invocation forever


def _cached_get(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        if len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.clear()
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def broadcast_join(ds: rd.Dataset, small: pa.Table, on: str | list[str],
                   how: str = "inner", small_cols: list[str] | None = None) -> rd.Dataset:
    """Join a big Dataset against a small table without a shuffle: the small
    side is ray.put once and merged per batch (reference analog: the chord
    key->owner lookup J1; here the 'dimension' travels to the data).

    NULL join keys follow SQL semantics (the DuckDB-oracle contract): a
    NULL key matches nothing — the small side sheds null-key rows once at
    broadcast time, and a null-key batch row survives only as an unmatched
    row under ``how="left"`` (pandas merge alone would match NaN to NaN)."""
    if small_cols:
        small = small.select(small_cols)
    keys = [on] if isinstance(on, str) else list(on)
    sdf = small.to_pandas()
    ref = ray.put(sdf[~sdf[keys].isna().any(axis=1)])

    if how not in ("inner", "left"):
        # null-key batch rows re-enter only under "left"; a "right"/"outer"
        # here would silently DROP the small side's unmatched/null rows —
        # wrong results, not an error.  Those shapes belong to hash_join,
        # whose join_bucket re-enters both outer sides.
        raise ValueError(
            f"broadcast_join supports how='inner'/'left' only, got {how!r} "
            "— use hash_join for right/outer joins")

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        null = batch[keys].isna().any(axis=1).to_numpy()
        if not null.any():
            return batch.merge(_cached_get(ref), on=on, how=how)
        j = batch[~null].merge(_cached_get(ref), on=on, how=how)
        if how == "left":
            j = pd.concat([j, batch[null].reindex(columns=j.columns)],
                          ignore_index=True)
        return j

    return ds.map_batches(join_batch, batch_format="pandas")


def bucket_of(key: pd.Series, num_buckets: int) -> np.ndarray:
    """Stable hash bucket of a key column: hash the STRING form of every
    key, whatever the batch dtype.

    The bucket must be a function of the KEY VALUE alone — never of the
    batch it arrives in or the dtype a concat coerced it to.  The
    previous whole-batch ``pd.to_numeric`` fallback violated that: a
    batch holding only digit-parsable string keys (e.g. a 1-block side
    whose tokens are years or IDs) hashed as INTEGERS while the same
    keys in a mixed batch hashed as STRINGS, so equal keys landed in
    different buckets and the co-shuffle silently dropped their joins.
    String-canonical hashing is batch-independent and also keeps an
    int64 column co-bucketed with an object-coerced copy of itself
    (str(42) either way).  INTEGRAL floats canonicalize to their integer
    string: Arrow int64-with-nulls lands in pandas as float64 (and an
    outer-join bucket with unmatched rows types a missing int side
    float64), so blocks of the SAME logical int column legitimately
    drift int64<->float64 — str() alone would hash "2" vs "2.0" into
    different buckets and silently drop those rows from a join or
    fragment their group.  The canonicalization is value-wise (2.0 ->
    "2" wherever it appears, 2.5 -> "2.5"), so it stays batch-
    independent.  NULLs get one canonical token before hashing:
    astype(str) would spell them "nan"/"None"/"<NA>" depending on the
    block's dtype, and a dtype-drifted block would then fragment the
    null group across buckets — breaking keyed_map_groups' complete-
    group promise for the NULL group SQL semantics keep."""
    return (_canon_hash(key) % num_buckets).astype(np.int64)


def _canon_hash(key: pd.Series) -> np.ndarray:
    """uint64 hash of the string-canonical form of each key value (the
    :func:`bucket_of` contract, shared with :func:`bucket_of_keys`)."""
    isna = key.isna().to_numpy()
    if pd.api.types.is_float_dtype(key.dtype):
        v = key.to_numpy(np.float64, na_value=np.nan)
        with np.errstate(invalid="ignore"):
            # int64-representable integral values only: beyond 2**63 the
            # int cast would overflow; such values keep their float form
            # (consistently on every block — still value-canonical)
            integral = np.isfinite(v) & (v == np.floor(v)) & (np.abs(v) < 2.0**63)
        strs = v.astype(str).astype(object)
        strs[integral] = v[integral].astype(np.int64).astype(str)
    else:
        strs = key.astype(str).to_numpy()
    if isna.any():
        strs = np.where(isna, "\0__null__", strs)
    return pd.util.hash_array(strs)


def bucket_of_keys(df: pd.DataFrame, keys: list[str],
                   num_buckets: int) -> np.ndarray:
    """Multi-column :func:`bucket_of`: combine the per-column canonical
    hashes so MULTI-key exchanges (partial_groupby's reduce) inherit the
    same dtype-drift immunity — ``pd.util.hash_pandas_object`` hashes raw
    dtype bytes, so int64 2 and float64 2.0 partials for the same group
    would land in different buckets and the group would emit twice."""
    acc = np.zeros(len(df), dtype=np.uint64)
    mult = np.uint64(1000003)
    for k in keys:
        acc = acc * mult + _canon_hash(df[k])
    return (acc % num_buckets).astype(np.int64)


def keyed_map_groups(ds: rd.Dataset, key: str, fn, num_buckets: int = 16) -> rd.Dataset:
    """Hash-partition by ``key`` so each bucket holds COMPLETE key groups,
    then apply a vectorized pandas ``fn`` once per bucket.

    This is the scale pattern for keyed window/sort operators (sessions,
    rolling aggregates, as-of joins, per-group top-k): ONE shuffle keyed by
    hash(key) % num_buckets (not a per-key map_groups — millions of tiny
    groups each paying a pandas call), and all per-key work vectorized
    inside the bucket.  num_buckets scales with cluster width; a skewed key
    is bounded by that single key's data volume, never the whole table.

    The shuffle is the task-based hash exchange, not a Ray Data
    sort-shuffle: the sort machinery's fixed costs (range sampling,
    aggregator pools, extra executor startups) were measured at seconds
    per operator on this sandbox for identical data movement.  ``fn``
    must tolerate an EMPTY typed frame (hash holes happen whenever the
    key cardinality is small vs num_buckets — pandas vectorized code is
    empty-safe by default)."""
    return task_hash_exchange(
        ds, lambda df: bucket_of(df[key], num_buckets), fn, num_buckets,
        key_cols=[key])


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str,
              lcols: list[str], rcols: list[str], num_buckets: int = 16,
              how: str = "inner", post=None) -> rd.Dataset:
    """Explicit partitioned hash join for two LARGE sides: tag each side,
    bucket by hash(key) % B, co-shuffle the union through the task-based
    hash exchange, and pandas-merge within each bucket (the portable
    pattern from the Ray guide; Dataset.join exists in this Ray version —
    this implementation is kept explicit so the shuffle and its key are
    visible and salt-able, and the exchange skips the sort-shuffle's
    fixed sampling/pool costs for identical data movement).

    ``lcols``/``rcols`` are each side's columns.  ``post(joined_df)``
    runs inside each bucket — push grouped aggregates here so the
    shuffle's output is partial rows, not joined rows; it must tolerate
    an empty typed frame (hash holes).

    Each side flows through the exchange with its OWN schema (the
    two-sided :func:`task_hash_exchange2`): no tagged union, no
    null-filled columns object-coercing blocks, no cross-side schema
    drift warnings from the streaming executor, and the shuffle moves
    each side's real columns only.  ``bucket_of`` is string-canonical,
    so an int64 key on one side co-buckets with an object-typed copy on
    the other."""

    def project(own: list[str]):
        return lambda batch: batch[own]

    lt = left.map_batches(project(lcols), batch_format="pandas")
    rt = right.map_batches(project(rcols), batch_format="pandas")

    def join_bucket(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # a zero-block side arrives column-less; reindex keeps the
        # join's column contract (missing columns become typed-NaN)
        l = l.reindex(columns=lcols).copy()
        r = r.reindex(columns=rcols).copy()
        # SQL NULL-key semantics (the DuckDB-oracle contract): a NULL key
        # matches NOTHING — pandas merge would happily match NaN with NaN
        # (and None with None).  Null-key rows split out BEFORE the dtype
        # alignment below: casting a NaN-bearing float64 key (how Arrow
        # int64-with-nulls lands in pandas) to int64 raises
        # IntCastingNaNError, and casting None-bearing object keys to a
        # numeric dtype raises TypeError — nulls must never reach the
        # astype.  They re-enter only as unmatched rows on their own
        # outer side.
        lnull = l[on].isna().to_numpy()
        rnull = r[on].isna().to_numpy()
        ln, rn = l[~lnull], r[~rnull]
        # align the join key so merge equality is dtype-exact even when
        # the two INPUT datasets carry different key dtypes.  An EMPTY
        # side must never drive the target: reindex materializes a
        # column-less side as all-float64, and casting the real side's
        # object keys to that would corrupt digit strings to floats
        # (or raise on non-digit keys) in left/outer joins
        if ln[on].dtype != rn[on].dtype:
            if not len(ln):
                target = rn[on].dtype
            elif not len(rn):
                target = ln[on].dtype
            else:
                target = rn[on].dtype if ln[on].dtype == object else ln[on].dtype
            ln = ln.assign(**{on: ln[on].astype(target)})
            rn = rn.assign(**{on: rn[on].astype(target)})
        j = ln.merge(rn, on=on, how=how)
        if how in ("left", "outer") and lnull.any():
            j = pd.concat([j, l[lnull].reindex(columns=j.columns)],
                          ignore_index=True)
        if how in ("right", "outer") and rnull.any():
            j = pd.concat([j, r[rnull].reindex(columns=j.columns)],
                          ignore_index=True)
        j = j.infer_objects()
        return post(j) if post is not None else j

    key_part = lambda df: bucket_of(df[on], num_buckets)  # noqa: E731
    return task_hash_exchange2(lt, rt, key_part, key_part, join_bucket,
                               num_buckets, key_cols_l=[on], key_cols_r=[on])


def _arrow_fields(sch) -> list[tuple[str, pa.DataType]]:
    """(name, Arrow type) pairs from a Ray ``Dataset.schema()`` wrapper,
    Arrow OR pandas block schemas.  Reads ``base_schema`` directly instead
    of the wrapper's ``.types`` property: that property converts each
    pandas dtype itself and LOGS AN ERROR (returning None) for pandas
    extension dtypes like "string" — which partial_groupby's key-dtype
    pin legitimately produces.  Degradation rules: object/extension
    dtypes map to Arrow string, everything else via from_numpy_dtype."""
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return [(f.name, f.type) for f in base]
    fields: list[tuple[str, pa.DataType]] = []
    for name, typ in zip(base.names, base.types):
        if isinstance(typ, pa.DataType):
            fields.append((name, typ))
        elif typ is object or typ == np.dtype(object):
            fields.append((name, pa.string()))
        else:
            try:
                fields.append((name, pa.from_numpy_dtype(typ)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append((name, pa.string()))
    return fields


def _empty_like(ds: rd.Dataset, extra_int_col: str) -> pa.Table:
    """Typed empty Arrow table with ``ds``'s columns plus one int64 column
    — preserves the output schema contract of the scan primitives when
    every post-sort block is empty (Arrow OR pandas block schemas; object
    dtypes degrade to string, the pandas reverse mapping)."""
    cols = {n: pa.array([], t) for n, t in _arrow_fields(ds.schema())}
    cols[extra_int_col] = pa.array([], pa.int64())
    return pa.table(cols)


def global_row_number(ds: rd.Dataset, keys: list[str],
                      descending: bool | list[bool] = False,
                      rank_col: str = "rank") -> tuple[rd.Dataset, int]:
    """0-based global row numbers in total sort order, distributed.

    ``ds.sort`` already totally orders the blocks; turning block-local
    positions into global ones needs only the per-block ROW COUNTS on the
    driver (one int per block — never rows), after which a zero-cpu task per
    block stamps ``offset + arange(len(block))``.  Same metadata-only
    exchange pattern as the crawl barrier's host-count ride-along
    (crawl.py).  Returns (stamped Dataset, total row count).

    This is the primitive behind rank/NTILE-style global window functions —
    the reference has no analog (its only global order is the queue's
    insertion-order scan, src/queue/main.go:51-59, which is a sequential
    bottleneck by construction)."""

    mat = ds.sort(keys, descending=descending).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    # drop zero-row blocks: an empty post-sort block can be SCHEMA-LESS
    # (no columns) and would poison from_arrow_refs with a mixed schema
    refs = [r for r, n in zip(refs, counts) if n]
    counts = [n for n in counts if n]
    if not refs:
        # keep the OUTPUT contract on empty input: schema + rank_col
        return rd.from_arrow(_empty_like(ds, rank_col)), 0
    offsets = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        offsets[1:] = np.cumsum(counts[:-1])

    @ray.remote(num_cpus=0)
    def _stamp(t: pa.Table, off: int) -> pa.Table:
        return t.append_column(
            rank_col, pa.array(off + np.arange(t.num_rows, dtype=np.int64)))

    out = [_stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out), int(sum(counts))


def _global_scan(ds: rd.Dataset, keys: list[str], val_col: str,
                 out_col: str, op: str,
                 descending: bool | list[bool] = False) -> rd.Dataset:
    """Shared EXCLUSIVE-prefix-scan skeleton over a distributed sort —
    parameterized by the monoid ``op``: "sum" ((+, 0)) or "max"
    ((max, int64 min)).  After ``ds.sort`` only one scalar per block (the
    block's aggregate) reaches the driver, which folds the exclusive
    running combination across blocks; a zero-cpu task per block then
    stamps ``combine(block_offset, local exclusive scan)``.  At 100 TB
    the driver traffic stays one int per block."""
    identity = 0 if op == "sum" else int(np.iinfo(np.int64).min)
    ufunc = np.add if op == "sum" else np.maximum

    mat = ds.sort(keys, descending=descending).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def _blockagg(t: pa.Table) -> tuple[int, int]:
        if t.num_rows == 0:
            return 0, 0
        import pyarrow.compute as pc

        fn = pc.sum if op == "sum" else pc.max
        return t.num_rows, int(fn(t.column(val_col)).as_py() or 0)

    metas = ray.get([_blockagg.remote(r) for r in refs])
    # drop zero-row blocks: an empty post-sort block can be SCHEMA-LESS
    # (no columns), which would crash the stamp and corrupt from_arrow_refs
    refs = [r for r, (n, _) in zip(refs, metas) if n]
    aggs = np.asarray([s for n, s in metas if n], dtype=np.int64)
    if not refs:
        # keep the OUTPUT contract on empty input: schema + out_col
        return rd.from_arrow(_empty_like(ds, out_col))
    offsets = np.full(len(aggs), identity, dtype=np.int64)
    if len(aggs) > 1:
        offsets[1:] = ufunc.accumulate(aggs[:-1])

    @ray.remote(num_cpus=0)
    def _stamp(t: pa.Table, off: int) -> pa.Table:
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pre = np.empty(len(v), dtype=np.int64)
        if len(v):
            pre[0] = off
            ufunc.accumulate(v[:-1], out=pre[1:])
            ufunc(pre[1:], off, out=pre[1:])
        return t.append_column(out_col, pa.array(pre))

    out = [_stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out)


def global_prefix_sum(ds: rd.Dataset, keys: list[str], val_col: str,
                      out_col: str = "cum_before",
                      descending: bool | list[bool] = False) -> rd.Dataset:
    """EXCLUSIVE global prefix sum of an int column in total sort order —
    each row gets the sum of ``val_col`` over all STRICTLY PRIOR rows.

    Same metadata-only exchange as :func:`global_row_number` (the shared
    :func:`_global_scan` skeleton with the (+, 0) monoid).  This is the
    scan primitive behind sequence packing / token-budget binning
    (assigning documents to fixed-token training chunks)."""
    return _global_scan(ds, keys, val_col, out_col, "sum", descending)


def global_prefix_max(ds: rd.Dataset, keys: list[str], val_col: str,
                      out_col: str = "max_before") -> rd.Dataset:
    """EXCLUSIVE global prefix MAX of an int64 column in total sort order —
    each row gets the max of ``val_col`` over all STRICTLY PRIOR rows
    (``numpy.iinfo(int64).min`` on the first row, where no prior exists).

    :func:`_global_scan` with the (max, -inf) monoid.  This is the
    WATERMARK primitive of streaming engines — the running high-water
    mark of event time in arrival order that decides which events are
    late (late_event_windows)."""
    return _global_scan(ds, keys, val_col, out_col, "max")


@ray.remote(num_cpus=0)
def _tx_split(t: pa.Table, k: int, part_of, key_cols=None):
    """Split one block into k sub-tables by the per-row partition id —
    ARROW-NATIVE: one stable sort + ``Table.take`` + zero-copy slices, so
    the exchanged payload never round-trips through pandas (partition
    fns are written against pandas, so one transient pandas view feeds
    ``part_of``; the data itself moves as Arrow).  ``key_cols`` names
    the columns the partition fn actually reads: when given (and present
    — a column-less empty-block artifact falls back) only THOSE columns
    convert to pandas, so a wide block costs one key-column copy at the
    exchange boundary instead of a transient full-block frame.  Rows
    whose partition id falls outside [0, k) are dropped, matching the
    old boolean-mask semantics."""
    if t.num_rows == 0:
        return [t] * k
    if key_cols is not None and all(c in t.column_names for c in key_cols):
        view = t.select(key_cols).to_pandas()
    else:
        view = t.to_pandas()
    part = np.asarray(part_of(view))
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(k + 1))
    sorted_t = t.take(pa.array(order))
    return [sorted_t.slice(bounds[p], bounds[p + 1] - bounds[p])
            for p in range(k)]


@ray.remote(num_cpus=0)
def unwrap_single_return(lst):
    """Peel the one element of a single-part split: with
    ``num_returns=1`` Ray hands back ONE ref to the WHOLE returned list,
    so a ``k == 1`` exchange would otherwise feed downstream tasks a
    1-element list where every ``k > 1`` path feeds the payload itself
    (ValueError/unpack bugs the moment any exchange runs single-part)."""
    return lst[0]


def _tx_concat(chunks, schema: pa.Schema | None = None) -> pd.DataFrame:
    """Merge one partition's chunk slices in ARROW (schema-unifying
    promote: an all-empty source block contributes null-typed columns)
    and convert to pandas ONCE at the apply boundary — the old per-chunk
    ``to_pandas`` + ``pd.concat`` double-copied every block and emitted
    a FutureWarning on empty/all-NA parts.

    ``schema``: the exchange input's Arrow schema, when the caller could
    capture one.  A FULLY-empty input arrives as Ray's COLUMN-LESS
    empty-block artifact (upstream map_batches never ran); the schema
    turns that into the TYPED empty frame apply_fn's contract promises."""
    chunks = [c for c in chunks if c.num_columns]
    if not chunks:
        return (schema.empty_table().to_pandas() if schema is not None
                else pd.DataFrame())
    return pa.concat_tables(
        chunks, promote_options="permissive").to_pandas()


def _schema_of(ds: rd.Dataset) -> pa.Schema | None:
    """Best-effort Arrow schema of a Dataset (None when the metadata is
    itself column-less — nothing to reindex against).  pandas-block
    dtypes map through the same degradation rules as _empty_like."""
    try:
        sch = ds.schema()
    except Exception:
        return None
    if sch is None or not sch.names:
        return None
    return pa.schema(_arrow_fields(sch))


@ray.remote(num_cpus=0)
def _tx_apply(apply_fn, schema, *chunks: pa.Table) -> pa.Table:
    return pa.Table.from_pandas(apply_fn(_tx_concat(chunks, schema)),
                                preserve_index=False)


@ray.remote(num_cpus=0)
def _tx_apply2(apply_fn, n_left: int, *chunks: pa.Table) -> pa.Table:
    """Two-sided variant: the first ``n_left`` chunks are the left
    side's slices, the rest the right's; each side concats in Arrow
    SEPARATELY (sides never share a schema) and ``apply_fn(l_df, r_df)``
    runs once per partition."""
    return pa.Table.from_pandas(
        apply_fn(_tx_concat(chunks[:n_left]), _tx_concat(chunks[n_left:])),
        preserve_index=False)


def task_hash_exchange(ds: rd.Dataset, part_of, apply_fn,
                       num_parts: int,
                       schema: pa.Schema | None = None,
                       key_cols: list[str] | None = None) -> rd.Dataset:
    """Task-based hash exchange: the drop-in replacement for
    ``groupby(bucket).map_groups(fn)`` when the shuffle's payload is small
    relative to Ray Data's sort-shuffle FIXED costs (range sampling,
    aggregator-pool spin-up, extra streaming-executor startups — measured
    seconds per operator on this sandbox; the same finding that rebuilt
    the crawl barrier and connected components as task exchanges).

    ``part_of(batch_df) -> int array in [0, num_parts)`` assigns rows to
    partitions; ``apply_fn(part_df) -> df`` runs once per partition on the
    concatenation of its slices.  Everything moves as object-store refs
    between num_cpus=0 tasks — the driver sees only refs, so the exchange
    is exactly as distributed as the groupby it replaces; at cluster scale
    ``num_parts`` is the exchange's parallelism, same as the bucket count
    it replaces.

    Payload constraint: columns must survive a plain Arrow<->pandas
    round-trip (numerics, strings, bytes, lists).  Python-set columns and
    Ray tensor-extension columns do NOT — those stages stay on Ray Data's
    groupby, whose block serialization carries them faithfully (see
    ngram_jaccard_pairs_ds / embedding_near_dup_pairs_ds).  ``apply_fn``
    must tolerate an EMPTY typed frame: unlike map_groups, every part is
    instantiated, so hash holes reach it.  The exchange captures the
    input's schema AFTER materializing (metadata-only — calling
    ``ds.schema()`` on the LAZY dataset would execute the upstream chain
    a second time; measured 3x on keyed_map_groups queries) and uses it
    to type the frame even when the WHOLE input is Ray's column-less
    empty-block artifact.  ``schema`` (optional) overrides; when the
    materialized input is itself schema-less (a fully-empty LAZY chain —
    Ray never ran the fns that would have defined it), apply_fn still
    sees a column-less frame and must guard (partial_groupby does)."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return rd.from_items([])
    if schema is None:
        schema = _schema_of(mat)
    splits = [_tx_split.options(num_returns=num_parts).remote(
        r, num_parts, part_of, key_cols) for r in refs]
    if num_parts == 1:  # num_returns=1 yields ONE ref to the whole list
        splits = [[unwrap_single_return.remote(s)] for s in splits]
    outs = [_tx_apply.remote(apply_fn, schema, *[splits[i][p]
                                                 for i in range(len(refs))])
            for p in range(num_parts)]
    return rd.from_arrow_refs(outs)


def task_hash_exchange2(left: rd.Dataset, right: rd.Dataset,
                        part_of_l, part_of_r, apply_fn,
                        num_parts: int,
                        key_cols_l: list[str] | None = None,
                        key_cols_r: list[str] | None = None) -> rd.Dataset:
    """TWO-SIDED task exchange: co-shuffle two datasets on compatible
    partition functions and run ``apply_fn(left_df, right_df)`` once per
    partition.  This is the join-shaped exchange: unlike unioning tagged
    null-filled sides into one stream, each side keeps its OWN schema
    end-to-end (no object-coerced null columns, no cross-side block
    schema drift in the streaming executor), and the shuffle payload is
    each side's real columns only.  ``part_of_l``/``part_of_r`` must
    hash equal keys to equal partitions (use the string-canonical
    :func:`bucket_of`).  A side with zero input blocks reaches
    ``apply_fn`` as an empty COLUMN-LESS frame — defend with
    ``reindex(columns=...)`` when the schema matters."""
    refs_l = left.materialize().to_arrow_refs()
    refs_r = right.materialize().to_arrow_refs()
    if not refs_l and not refs_r:
        return rd.from_items([])

    def split_side(refs, part_of, key_cols):
        splits = [_tx_split.options(num_returns=num_parts).remote(
            r, num_parts, part_of, key_cols) for r in refs]
        if num_parts == 1:
            splits = [[unwrap_single_return.remote(s)] for s in splits]
        return splits

    sl = split_side(refs_l, part_of_l, key_cols_l)
    sr = split_side(refs_r, part_of_r, key_cols_r)
    outs = [_tx_apply2.remote(apply_fn, len(refs_l),
                              *[sl[i][p] for i in range(len(refs_l))],
                              *[sr[i][p] for i in range(len(refs_r))])
            for p in range(num_parts)]
    return rd.from_arrow_refs(outs)


def md5_hex(values) -> list[str]:
    """md5 hexdigest per string — THE hash-rank idiom (the engine spelling
    of SQL's ``md5(col)``), shared so samplers, caps and pair generators
    can never desynchronize from their oracles."""
    import hashlib

    return [hashlib.md5(s.encode()).hexdigest() for s in values]


def sql_round(x, digits: int):
    """Round half AWAY FROM ZERO, matching SQL/DuckDB ``round()``.  numpy's
    ``.round()`` is banker's (half to even): 4.28125 rounds to 4.2812 in
    numpy but 4.2813 in DuckDB — any oracle-checked ratio of small integers
    can land exactly on that half.

    Where ``|x|·10^digits ≥ 2^52`` the double grid is at least
    0.5-coarse, so the scaled value is already integral and the ``+0.5``
    trick would round UP a neighbor instead (float spacing ≥ 0.5 makes
    ``y + 0.5`` land on ``y+1``): return the scaled value unchanged
    there, exactly as DuckDB's ``std::round`` does on an
    integral-by-construction double."""
    arr = np.asarray(x, dtype=np.float64)
    s = 10.0 ** digits
    y = np.abs(arr) * s
    r = np.where(y >= 2.0 ** 52, y, np.floor(y + 0.5))
    return np.sign(arr) * r / s


def to_table(obj) -> pa.Table:
    """Normalize a Dataset / DataFrame / Table to pyarrow for tests.

    Materialize FIRST: ``to_arrow_refs()`` on a lazy Dataset runs the plan
    twice (a schema-probe execution plus the real one — measured 24 s vs
    12 s on a 1500-group aggregate); on a MaterializedDataset it just hands
    back the existing blocks."""
    if isinstance(obj, rd.Dataset):
        tables = [t for t in ray.get(obj.materialize().to_arrow_refs())]
        tables = [t for t in tables if t.num_rows] or tables[:1]
        # permissive: blocks of one outer-join output can legitimately
        # disagree int64-vs-double (a bucket with unmatched rows types
        # the missing side float64, a fully-matched bucket keeps int64)
        # — promote exactly as a single-process pd.concat would; when
        # every block agrees the schema is untouched
        return pa.concat_tables(tables, promote_options="permissive")
    if isinstance(obj, pd.DataFrame):
        return pa.Table.from_pandas(obj, preserve_index=False)
    return obj
