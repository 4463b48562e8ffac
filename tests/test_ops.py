"""Unit tests for the projector operator library (pure Arrow, no Ray).

Mirrors the reference's table-driven scalar tests (SURVEY.md §5):
CleanNumber cases /root/reference/contrib/handlers/handlers_test.go:77-103,
wareki era cases smbc_test.go:12-51, row-skip handler_test.go:11-82.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raycdc import ops


# --- clean_number (FIXTURES.md §3.4 matrix) --------------------------------

CLEAN_CASES = [
    ("12,345", "12345"),
    ("306.4800USD", "306.4800"),
    ("257,345円", "257345"),
    ("-12,345", "-12345"),
    ("¥12345-", "12345"),
    ("-", ""),
    ("", ""),
    ("abc", ""),
    ("1,091", "1091"),
    # reference keeps '-' ONLY at index 0 (handlers.go:41-43): a sign after
    # a currency mark is dropped, and a digit-free residue like '.' passes
    # through verbatim (only the exact residue '-' maps to '')
    ("¥-123", "123"),
    ("a-12", "12"),
    ("-a12", "-12"),
    (".", "."),
    ("-.", "-."),
]


def test_clean_number_matrix():
    src = pa.array([c for c, _ in CLEAN_CASES])
    got = ops.clean_number(src).to_pylist()
    assert got == [e for _, e in CLEAN_CASES]


def test_clean_number_nulls_pass_through():
    got = ops.clean_number(pa.array(["1", None])).to_pylist()
    assert got == ["1", None]


# --- date parsing ----------------------------------------------------------


def test_parse_date_multi_formats():
    src = pa.array(["2006/01/02", "2006/1/2", "20060102", "2006年01月02日", "junk"])
    got = ops.parse_date_multi(
        src, formats=("%Y/%m/%d", "%Y%m%d", "%Y年%m月%d日")
    ).to_pylist()
    assert got == ["2006-01-02"] * 4 + [None]


def test_parse_date_multi_error_policy():
    src = pa.array(["2006/01/02", "junk"])
    with pytest.raises(ValueError, match="junk"):
        ops.parse_date_multi(src, error_ok=False)


def test_wareki_era_cases():
    # smbc_test.go:12-51: plain fallback, H/R conversion, invalid eras
    src = pa.array(
        ["2019/12/04", "R01.12.04", "H31.04.30", "S64.01.07", "R1.5.2", "R01.02.30"]
    )
    got = ops.parse_wareki_date(src).to_pylist()
    assert got == [
        "2019-12-04",
        "2019-12-04",  # Reiwa 1 = 2019
        "2019-04-30",  # Heisei 31 = 2019
        None,  # Showa unsupported
        None,  # era-year must be two digits
        None,  # impossible calendar date
    ]


# --- filter / append / project --------------------------------------------


def _t(**cols):
    return pa.table(cols)


def test_filter_nonempty_drops_empty_and_null():
    t = _t(a=pa.array(["x", "", None, "y"]), b=pa.array([1, 2, 3, 4]))
    out = ops.filter_nonempty(t, "a")
    assert out["b"].to_pylist() == [1, 4]


def test_append_constant_broadcasts():
    t = _t(a=pa.array([1, 2]))
    out = ops.append_constant(t, "payment_month", "2020-09-01")
    assert out["payment_month"].to_pylist() == ["2020-09-01"] * 2


def test_project_reorder_rename_computed():
    # sbi_securities.go:16-40-style reprojection: reorder + computed col
    t = _t(c0=pa.array(["a"]), c1=pa.array(["b"]), c2=pa.array(["1,0"]))
    out = ops.project(
        t,
        {
            "second": "c1",
            "first": "c0",
            "amount": lambda tb: ops.clean_number(tb["c2"]),
        },
    )
    assert out.column_names == ["second", "first", "amount"]
    assert out["amount"].to_pylist() == ["10"]


# --- error policy ----------------------------------------------------------


def test_checked_fail_with_provenance():
    t = _t(seg_id=pa.array([3, 3]), lsn=pa.array([10, 11]), x=pa.array([1, 2]))

    def boom(_):
        raise ValueError("bad cell")

    with pytest.raises(RuntimeError, match="seg_id"):
        ops.checked(boom)(t)


def test_checked_dead_letter_drops_batch():
    captured = []

    def boom(_):
        raise ValueError("bad cell")

    out = ops.checked(boom, dead_letter=lambda b, e: captured.append((len(b), str(e))))(
        _t(x=pa.array([1, 2]))
    )
    assert len(out) == 0
    assert captured == [(2, "bad cell")]


# --- schema evolution guardrails ------------------------------------------


def test_widen_type_rejects_narrowing_and_incompatible():
    import pyarrow as pa
    import pytest as _pytest

    from raycdc.schema import merge_schemas, widen_type

    # int widening is directional: result is always the wider type
    assert widen_type(pa.int32(), pa.int64()) == pa.int64()
    assert widen_type(pa.int64(), pa.int32()) == pa.int64()
    assert widen_type(pa.int32(), pa.float32()) == pa.float64()
    assert widen_type(pa.timestamp("us"), pa.timestamp("ms")) == pa.timestamp("us")
    # incompatible evolution fails loudly, never silently coerces
    with _pytest.raises(TypeError, match="incompatible"):
        widen_type(pa.string(), pa.int64())
    with _pytest.raises(TypeError):
        merge_schemas(
            pa.schema([pa.field("x", pa.string())]),
            pa.schema([pa.field("x", pa.int32())]),
        )


# --- deterministic sampling / splitting -----------------------------------


def test_hash_sample_deterministic_and_proportional():
    import pyarrow as pa

    t = pa.table({"event_id": pa.array(range(100_000), pa.int64())})
    a = ops.hash_sample(t, "event_id", 0.10)
    b = ops.hash_sample(t, "event_id", 0.10)
    assert a.equals(b)
    assert abs(len(a) / len(t) - 0.10) < 0.01
    # nesting property: the 5% sample is a subset of the 10% sample
    c = ops.hash_sample(t, "event_id", 0.05)
    assert set(c["event_id"].to_pylist()) <= set(a["event_id"].to_pylist())


def test_train_split_entity_stable_and_complete():
    import pyarrow as pa

    t = pa.table(
        {
            "user_id": pa.array([i % 500 for i in range(5000)], pa.int64()),
            "x": pa.array(range(5000)),
        }
    )
    out = ops.train_split(t, "user_id")
    assert set(out["split"].to_pylist()) == {"train", "val", "test"}
    # every key maps to exactly one split (leakage-safe)
    seen = {}
    for u, s in zip(out["user_id"].to_pylist(), out["split"].to_pylist()):
        assert seen.setdefault(u, s) == s
    frac_train = out["split"].to_pylist().count("train") / len(out)
    assert 0.7 < frac_train < 0.9


def test_stratified_sample_per_stratum_fractions():
    """Per-stratum cutoffs: 100% keeps every row of the stratum, 0% none,
    and a middle fraction lands near its target; membership is
    deterministic and consistent with hash_sample's cutoff."""
    import numpy as np

    import pyarrow.compute as pc

    from raycdc.ops import hash_sample, stratified_sample

    n = 30_000
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "event_type": pa.array(
                np.tile(np.array(["purchase", "view", "error"]), n // 3)
            ),
        }
    )
    out = stratified_sample(
        t,
        key_col="event_id",
        strata_col="event_type",
        fractions={"purchase": 1.0, "view": 0.1},
        default_fraction=0.0,
    )
    kinds = out["event_type"].to_pylist()
    assert kinds.count("purchase") == n // 3
    assert kinds.count("error") == 0
    frac_view = kinds.count("view") / (n // 3)
    assert 0.07 < frac_view < 0.13
    # the view stratum equals hash_sample at the same fraction
    views = t.filter(pc.equal(t["event_type"], "view"))
    expect = hash_sample(views, "event_id", 0.1)
    got = out.filter(pc.equal(out["event_type"], "view"))
    assert got["event_id"].to_pylist() == expect["event_id"].to_pylist()
    # deterministic
    again = stratified_sample(
        t, "event_id", "event_type", {"purchase": 1.0, "view": 0.1}, 0.0
    )
    assert again.equals(out)


def test_extract_json_field_scalar_kinds():
    from raycdc.ops import extract_json_field

    t = pa.table(
        {
            "p": pa.array(
                [
                    '{"k": 87, "z": 1}',
                    '{"k": "ab c"}',
                    '{"x": 1}',
                    None,
                    '{"k": -3.5}',
                    '{"z": 2, "k": 0}',
                ]
            )
        }
    )
    out = extract_json_field(t, "p", "k", "v")
    assert out["v"].to_pylist() == ["87", "ab c", None, None, "-3.5", "0"]
    ints = extract_json_field(
        t.filter(pc.match_substring(pc.coalesce(t["p"], ""), '"k": 8')),
        "p",
        "k",
        "v",
        as_int=True,
    )
    assert ints["v"].to_pylist() == [87]
    assert ints["v"].type == pa.int64()
