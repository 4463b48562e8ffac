"""Round-4 ADVICE fixes: sketch null semantics, lookup key_cols from
persisted meta, prune_segments batched existence, scratch-path scoping."""

import numpy as np
import pyarrow as pa

from raycdc.sketch import (
    bloom_bits,
    bloom_contains,
    hll_estimate,
    hll_registers,
    kmv_overlap,
    kmv_sketch,
)


# ---------------------------------------------------------------------------
# sketch null semantics (SQL COUNT(DISTINCT) / join-key contract)


def test_hll_ignores_nulls():
    vals = pa.array(["a", "b", None, "a", None], pa.string())
    regs = hll_registers(vals)
    regs_nonull = hll_registers(pa.array(["a", "b", "a"], pa.string()))
    assert np.array_equal(regs, regs_nonull)
    assert round(hll_estimate(regs)) == 2


def test_hll_all_null_estimates_zero():
    vals = pa.array([None, None, None], pa.string())
    assert hll_estimate(hll_registers(vals)) == 0.0
    ints = pa.array([None, None], pa.int64())
    assert hll_estimate(hll_registers(ints)) == 0.0


def test_kmv_overlap_null_on_both_sides_does_not_intersect():
    a = kmv_sketch(pa.array(["x", "y", None], pa.string()))
    b = kmv_sketch(pa.array(["p", "q", None], pa.string()))
    est = kmv_overlap(a, b, k=1024)
    assert est["jaccard"] == 0.0
    assert est["intersection"] == 0.0


def test_bloom_null_build_keys_set_no_bits():
    words = bloom_bits(pa.array([None, None], pa.string()), num_bits=1024)
    assert not words.any()


def test_lookup_turn_filter_uses_persisted_key_cols(tmp_path):
    """lookup()'s turn_idx filter must come from the lake's persisted
    key_cols, not the caller's (possibly default) spec — a lake keyed on
    (conv_id, seq) has no turn_idx column at all."""
    import ray.data

    from raycdc.engine import lookup, replay
    from raycdc.schema import TableSpec

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("seq", pa.int32()),
            ("text", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    spec = TableSpec(
        schema=schema,
        key_cols=("conv_id", "seq"),
        sort_cols=("conv_id", "seq"),
        num_partitions=4,
    )
    n = 6
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i % 2}" for i in range(n)]),
            "seq": pa.array([i // 2 for i in range(n)], pa.int32()),
            "text": pa.array([f"t{i}" for i in range(n)]),
            "ts": pa.array([i for i in range(n)], pa.timestamp("us")),
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(range(n), pa.int64()),
            "seg_id": pa.array([0] * n, pa.int32()),
        }
    )
    lake = str(tmp_path / "lake")
    replay(ray.data.from_arrow(t), lake, spec)
    # default caller spec (key_cols ends in turn_idx, absent here): the
    # persisted meta must win
    got = lookup(lake, "c1", turn_idx=1)
    assert got.num_rows == 1 and got["text"][0].as_py() == "t3"


def test_bloom_null_probe_is_definitely_absent():
    words = bloom_bits(pa.array(["k1", "k2"], pa.string()), num_bits=1024)
    hit = bloom_contains(words, pa.array(["k1", None, "zz"], pa.string()))
    assert hit[0]  # real member
    assert not hit[1]  # NULL never joins
    # chunked input path
    ch = pa.chunked_array([pa.array(["k2"]), pa.array([None], pa.string())])
    hit2 = bloom_contains(words, ch)
    assert hit2[0] and not hit2[1]
