"""Pack-exchange plumbing shared by the partitioned join and the grouped
sketch reduce.

The map stage of a packed exchange emits, per input block, a tiny table
of ``{bucket_col: int32, pack: large_binary}`` rows (one Arrow-IPC blob
per key-hash bucket). Reducers must each receive the packs of their
bucket set only. A naive formulation hands every reducer every map
block and filters inside the task — zero-copy in single-node shared
memory, but on a cluster each map block would be fetched by every
reducer node (G× the network volume of a true shuffle).

``split_refs_by_group`` restores shuffle-volume semantics: one cheap
task per map block (scheduled next to the block by locality) slices the
packed table into one object **per reducer group** via
``num_returns=G``; reducer ``g`` then references only slice ``g`` of
each block — the same per-link volume a hash shuffle would move, with
none of Ray local's sort-shuffle operator launch cost (~2-3 s measured,
independent of row count).

Group of a bucket is ``bucket % num_groups`` — round-robin, so that the
skew-salting scheme's consecutive sub-bucket ids (see ``join.py``
``SaltSpec``) land on *different* reducers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def stream_arrow_refs(ds) -> list:
    """Collect a Dataset's block refs as the streaming executor emits
    them — same refs ``to_arrow_refs()`` returns, without the trailing
    ``materialize()`` snapshot it pays (~0.3 s of executor drain per
    execution, measured — a level-independent cost that directly eats
    scaling efficiency). Only valid for pipelines whose blocks are
    already Arrow (every packed-exchange map stage emits pa.Table)."""
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(ref for ref, _ in bundle.blocks)
    return refs


def _split_block_by_group(bucket_col: str, num_groups: int, blk):
    """Slice one packed map block into per-reducer-group sub-tables
    (group of a bucket = ``bucket % num_groups``)."""
    if not isinstance(blk, pa.Table):
        blk = pa.Table.from_pandas(blk)
    if blk.num_rows == 0:
        parts = [blk] * num_groups
    else:
        gb = np.asarray(blk.column(bucket_col)) % num_groups
        parts = [blk.filter(pa.array(gb == g)) for g in range(num_groups)]
    return parts[0] if num_groups == 1 else tuple(parts)


def should_split(default_env: str = "BLOOMJOIN_EXCHANGE_SPLIT") -> bool:
    """Split per reducer only when it buys anything: on a multi-node
    cluster it cuts each reducer's fetch volume to a true shuffle's; on
    a single node every read is zero-copy shared memory and the split
    wave only adds ~blocks × groups tiny plasma objects (measured ~2 s
    of store overhead at 128×32 — pure loss locally). Env override:
    ``BLOOMJOIN_EXCHANGE_SPLIT=always|never``."""
    import os

    mode = os.environ.get(default_env, "auto")
    if mode == "always":
        return True
    if mode == "never":
        return False
    try:
        import ray

        return sum(1 for n in ray.nodes() if n.get("Alive", False)) > 1
    except Exception:
        return True


def split_refs_by_group(refs, bucket_col: str, num_groups: int) -> list[list]:
    """refs of packed map blocks → ``parts[g]`` = per-block refs holding
    ONLY buckets with ``bucket % num_groups == g``.

    Each split task reads its map block zero-copy and emits
    ``num_groups`` objects, so a reducer's task arguments reference
    nothing outside its bucket set. Callers gate on ``should_split()``:
    on a single node reducers instead read every map block zero-copy
    and filter their modulo class themselves.
    """
    import ray

    if not should_split():
        return [list(refs) for _ in range(num_groups)]
    task = ray.remote(_split_block_by_group)
    parts: list[list] = [[] for _ in range(num_groups)]
    for r in refs:
        if num_groups == 1:
            parts[0].append(task.remote(bucket_col, 1, r))
        else:
            out = task.options(num_returns=num_groups).remote(
                bucket_col, num_groups, r)
            for g in range(num_groups):
                parts[g].append(out[g])
    return parts
