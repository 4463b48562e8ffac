"""Hash partitioning + hot-key salting.

The reference's unit of distribution is one file per Cloud Functions
invocation (``/root/reference/examples/quickstart/deploy.sh:57-63``); there is
no keyed routing.  Here routing is explicit: every change row gets a stable
``part_key = siphash(conv_id) % P`` so all changes for a conversation meet in
one merge partition, and the lake layout ``part=K`` is a pure function of the
key — which is what makes partition rewrites idempotent.

Hash: pandas' vectorized SipHash-1-3 (``pandas.util.hash_array`` with its
fixed default key) — deterministic across processes/machines and C-speed over
object arrays; NOT Python's seeded ``hash()``.

Salting: a hot conversation (millions of turns) would bottleneck one merge
partition.  Because the upsert key is ``(conv_id, turn_idx)``, salting by
``turn_idx % S`` keeps identical keys co-located while spreading a hot
conversation over S sub-partitions; a salted partial merge dedups per
sub-partition before the final unsalted merge (SURVEY.md §2.6, §7.1.6).
"""

from __future__ import annotations

import numpy as np
import pandas.util
import pyarrow as pa
import pyarrow.compute as pc

PART_KEY = "part_key"
SALT_KEY = "salt_key"


def hash_strings(arr: pa.ChunkedArray | pa.Array | np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of a string column (vectorized SipHash)."""
    if isinstance(arr, (pa.ChunkedArray, pa.Array)):
        arr = arr.to_numpy(zero_copy_only=False)
    return pandas.util.hash_array(np.asarray(arr, dtype=object), categorize=False)


def add_part_key(
    batch: pa.Table,
    key_col: str = "conv_id",
    num_partitions: int = 32,
    col_name: str = PART_KEY,
) -> pa.Table:
    """map_batches body: append ``part_key = hash(key_col) % P`` (int32)."""
    pk = (hash_strings(batch[key_col]) % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column(col_name, pa.array(pk))


def add_salt_key(
    batch: pa.Table,
    salt_col: str = "turn_idx",
    num_salts: int = 8,
    part_col: str = PART_KEY,
    col_name: str = SALT_KEY,
) -> pa.Table:
    """Append ``salt_key = part_key * S + (salt_col % S)`` for the salted
    pre-merge round.  Same upsert key ⇒ same salt ⇒ LWW-safe."""
    salt_vals = batch[salt_col].cast(pa.int64()).to_numpy() % num_salts
    part_vals = batch[part_col].to_numpy().astype(np.int64)
    sk = (part_vals * num_salts + salt_vals).astype(np.int32)
    return batch.append_column(col_name, pa.array(sk))
