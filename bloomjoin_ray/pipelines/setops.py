"""SQL set operations over Datasets: DISTINCT, UNION, INTERSECT, EXCEPT.

ANSI bag-to-set semantics (each operator dedupes its output; nulls
compare EQUAL, as in SQL set operations and ``IS NOT DISTINCT FROM``).
Scale shape: DISTINCT is a per-block dedupe followed by one packed
bucketed exchange (one reduce row set per bucket, never a sort-shuffle);
INTERSECT / EXCEPT reuse the engine's semi / anti ``hash_join`` with
``na_matches="na"``, so the right side streams through the same
broadcast-or-co-partition planner every join takes.

No counterpart in the reference (gojiplus/bloomjoin exposes joins only);
these round out the relational surface its users expect next.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa


def _cols(ds, cols):
    if cols is None:
        return list(ds.schema().names)
    return [cols] if isinstance(cols, str) else list(cols)


def distinct_rows(ds, cols: str | Sequence[str] | None = None, *,
                  num_buckets: int = 64):
    """SELECT DISTINCT over ``cols`` (default: all columns). Exact,
    null-correct (null == null, pyarrow 16.1's null-key over-grouping
    sidestepped via ``group_agg``). Per-block dedupe first, so only
    block-distinct rows enter the exchange."""
    from .buckets import group_agg, packed_bucket_map_groups

    cols = _cols(ds, cols)

    def dedupe(batch: pa.Table) -> pa.Table:
        return group_agg(batch.select(cols), cols, [])

    def reduce_group(group: pa.Table) -> pa.Table:
        return group_agg(group.drop_columns(["__gbucket"]), cols, [])

    deduped = ds.map_batches(dedupe, batch_format="pyarrow")
    return packed_bucket_map_groups(deduped, cols, reduce_group,
                                    num_buckets=num_buckets)


def union_distinct(ds_a, ds_b, cols: str | Sequence[str] | None = None, *,
                   num_buckets: int = 64):
    """SQL ``A UNION B`` (distinct): concatenates the inputs and
    dedupes in one exchange. Column sets must align on ``cols``
    (default: A's full schema)."""
    cols = _cols(ds_a, cols)
    both = ds_a.select_columns(cols).union(ds_b.select_columns(cols))
    return distinct_rows(both, cols, num_buckets=num_buckets)


def intersect_distinct(ds_a, ds_b, cols: str | Sequence[str] | None = None,
                       *, num_buckets: int = 64):
    """SQL ``A INTERSECT B``: distinct rows of A that also appear in B
    (nulls equal). DISTINCT on A first, then a semi hash_join against
    B — B is never deduped (semi joins emit each left row at most
    once) and streams through the join planner."""
    from .join import hash_join

    cols = _cols(ds_a, cols)
    left = distinct_rows(ds_a, cols, num_buckets=num_buckets)
    return hash_join(left, ds_b.select_columns(cols), on=cols, how="semi",
                     na_matches="na", num_buckets=num_buckets)


def except_distinct(ds_a, ds_b, cols: str | Sequence[str] | None = None,
                    *, num_buckets: int = 64):
    """SQL ``A EXCEPT B``: distinct rows of A with no match in B
    (nulls equal). DISTINCT on A, then an anti hash_join against B."""
    from .join import hash_join

    cols = _cols(ds_a, cols)
    left = distinct_rows(ds_a, cols, num_buckets=num_buckets)
    return hash_join(left, ds_b.select_columns(cols), on=cols, how="anti",
                     na_matches="na", num_buckets=num_buckets)
