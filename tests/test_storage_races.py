"""Concurrent-writer races against an fsspec memory:// lake (PUT-semantics
object store, no rename) — the consistency contract documented in
raycdc/storage.py: disjoint-partition writers never interfere; duplicate
(same-batch) writers converge to byte-identical state; checkpoints are
never ambiguous (the version a checkpoint names always resolves to a
complete data file consistent with it)."""

import threading
import uuid

import pyarrow.compute as pc
import pytest

from raycdc.changelog import synthetic_changelog
from raycdc.engine import _make_apply_fn
from raycdc.partition import PART_KEY, add_part_key
from raycdc.schema import TableSpec
from raycdc.sink import (
    content_hash,
    read_checkpoint,
    read_partition,
)
from raycdc.storage import get_storage


def _mem_lake() -> str:
    return f"memory://race-{uuid.uuid4().hex}"


def _run_threads(fns):
    errors = []

    def wrap(fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errors.append(e)

    ts = [threading.Thread(target=wrap, args=(f,)) for f in fns]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return errors


NPARTS = 4


@pytest.fixture()
def groups():
    log = synthetic_changelog(n_events=800, seed=90, p_delete=0.1)
    tagged = add_part_key(log, key_col="conv_id", num_partitions=NPARTS)
    return [
        tagged.filter(pc.equal(tagged[PART_KEY], p)) for p in range(NPARTS)
    ]


def test_disjoint_partition_writers_never_interfere(groups):
    """N threads, one partition each, one lake: every checkpoint lands and
    names a data file whose content matches it — the engine's actual
    concurrency shape (groupby gives each partition to one task)."""
    lake = _mem_lake()
    spec = TableSpec(num_partitions=NPARTS)
    apply_fn = _make_apply_fn(lake, spec)
    errors = _run_threads([lambda g=g: apply_fn(g) for g in groups if len(g)])
    assert errors == []
    for p in range(NPARTS):
        if not len(groups[p]):
            continue
        ck = read_checkpoint(lake, p)
        assert ck is not None and ck["version"] == 0
        t = read_partition(lake, p)
        assert t is not None
        assert len(t) == ck["row_count"]
        assert content_hash(t) == ck["content_hash"]


def test_duplicate_delivery_race_converges(groups):
    """Two writers racing the SAME batch into the SAME partition (the
    crash-retry / duplicate-delivery shape): both derive byte-identical
    files and identical checkpoints, so ANY interleaving converges —
    checkpoint, row count, and content hash all match a clean one-shot
    apply."""
    g = max(groups, key=len)
    part = int(g[PART_KEY][0].as_py())
    spec = TableSpec(num_partitions=NPARTS)

    # clean single-writer reference
    ref_lake = _mem_lake()
    _make_apply_fn(ref_lake, spec)(g)
    ref_ck = read_checkpoint(ref_lake, part)
    ref_t = read_partition(ref_lake, part)

    for _ in range(3):  # several interleavings
        lake = _mem_lake()
        apply_fn = _make_apply_fn(lake, spec)
        errors = _run_threads([lambda: apply_fn(g), lambda: apply_fn(g)])
        assert errors == []
        ck = read_checkpoint(lake, part)
        t = read_partition(lake, part)
        assert ck["version"] in (0, 1)  # 1 = both applied (noop-aware rewrite)
        assert ck["row_count"] == ref_ck["row_count"]
        assert ck["content_hash"] == ref_ck["content_hash"]
        assert t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).equals(
            ref_t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        )


def test_checkpoint_never_names_missing_version(groups):
    """Interleaved duplicate appliers: at every observation point, the
    version the checkpoint names must resolve to a COMPLETE data file
    (atomic publish means no torn or missing object behind a live
    checkpoint)."""
    g = max(groups, key=len)
    part = int(g[PART_KEY][0].as_py())
    spec = TableSpec(num_partitions=NPARTS)
    lake = _mem_lake()
    apply_fn = _make_apply_fn(lake, spec)
    stop = threading.Event()
    observations: list[tuple[int, bool]] = []

    def observer():
        st = get_storage(lake)
        while not stop.is_set():
            ck = read_checkpoint(lake, part)
            if ck is not None:
                t = read_partition(lake, part)
                observations.append((ck["version"], t is not None and len(t) > 0))

    obs = threading.Thread(target=observer)
    obs.start()
    errors = _run_threads([lambda: apply_fn(g), lambda: apply_fn(g)])
    stop.set()
    obs.join()
    assert errors == []
    assert observations, "observer saw no checkpoints"
    bad = [v for v, ok in observations if not ok]
    assert bad == [], f"checkpoint named versions without readable data: {bad}"


def test_concurrent_appends_documented_single_appender(tmp_path):
    """POSIX append_bytes IS safe for concurrent appenders (O_APPEND);
    the object-store emulation is read-modify-write and documented as
    single-appender — this pins the POSIX half of that contract."""
    p = str(tmp_path / "journal.jsonl")
    st = get_storage(p)
    errors = _run_threads(
        [lambda i=i: st.append_bytes(p, f"line-{i}\n".encode()) for i in range(8)]
    )
    assert errors == []
    lines = open(p).read().splitlines()
    assert sorted(lines) == [f"line-{i}" for i in range(8)]


# ---------------------------------------------------------------------------
# round-5 (VERDICT r4 #7): PARTIAL-FAILURE injection — an S3-semantics
# fake whose PUT can fail mid-publish.  Proves checkpoint-never-ambiguous
# under crashes, not just interleavings: a failed PUT is invisible (old
# complete state), a crash BETWEEN data and checkpoint publish leaves the
# checkpoint naming the old complete version, and the retry converges.

import fsspec
from fsspec.implementations.memory import MemoryFileSystem

from raycdc.changelog import synthetic_changelog as _synth


class FlakyMemFS(MemoryFileSystem):
    """memory:// with injectable single-PUT failures: any path containing
    an armed substring raises OSError (budgeted per substring) BEFORE any
    byte lands — S3 PUT semantics (a failed upload is invisible)."""

    protocol = "flakymem"
    cachable = False
    faults: dict[str, int] = {}

    def pipe_file(self, path, value, **kwargs):
        for sub, left in list(self.faults.items()):
            if left > 0 and sub in path:
                type(self).faults[sub] = left - 1
                raise OSError(f"injected PUT failure: {path}")
        return super().pipe_file(path, value, **kwargs)


fsspec.register_implementation("flakymem", FlakyMemFS, clobber=True)


def _flaky_lake() -> str:
    FlakyMemFS.faults = {}
    return f"flakymem://flake-{uuid.uuid4().hex}"


def _state(t):
    return {
        (c, ti): tx
        for c, ti, tx in zip(
            t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist(),
            t["text"].to_pylist(),
        )
    }


def _two_batches():
    log = _synth(n_events=600, seed=95, p_delete=0.1)
    tagged = add_part_key(log, key_col="conv_id", num_partitions=NPARTS)
    g = max(
        (tagged.filter(pc.equal(tagged[PART_KEY], p)) for p in range(NPARTS)),
        key=len,
    )
    lsns = g["lsn"].to_pylist()
    mid = sorted(lsns)[len(lsns) // 2]
    return (
        g.filter(pc.less(g["lsn"], mid)),
        g.filter(pc.greater_equal(g["lsn"], mid)),
        int(g[PART_KEY][0].as_py()),
    )


def test_failed_data_put_is_invisible_and_retry_converges():
    """PUT of data-v1 fails (upload error): the checkpoint still names the
    complete v0 state; the retry of the SAME batch completes and matches a
    clean two-batch apply."""
    b1, b2, part = _two_batches()
    spec = TableSpec(num_partitions=NPARTS)

    ref_lake = _flaky_lake()
    ref_apply = _make_apply_fn(ref_lake, spec)
    ref_apply(b1)
    ref_apply(b2)
    ref_ck = read_checkpoint(ref_lake, part)
    ref_t = read_partition(ref_lake, part)

    lake = _flaky_lake()
    apply_fn = _make_apply_fn(lake, spec)
    apply_fn(b1)
    ck0 = read_checkpoint(lake, part)
    FlakyMemFS.faults = {"data-v000001.parquet": 1}
    with pytest.raises(OSError, match="injected PUT failure"):
        apply_fn(b2)
    # failure is INVISIBLE: checkpoint unchanged, v0 still complete
    ck = read_checkpoint(lake, part)
    assert ck == ck0
    t = read_partition(lake, part)
    assert content_hash(t) == ck["content_hash"]
    # retry (fault budget exhausted) converges to the clean reference
    apply_fn(b2)
    ck = read_checkpoint(lake, part)
    assert ck["row_count"] == ref_ck["row_count"]
    assert ck["content_hash"] == ref_ck["content_hash"]
    assert _state(read_partition(lake, part)) == _state(ref_t)


def test_crash_between_data_and_checkpoint_publish_retry_converges():
    """Data-v1 lands but the CHECKPOINT PUT fails (crash in the publish
    window): readers resolve via the checkpoint, so they still see the
    complete v0 state; the crash-retry re-derives a byte-identical v-next
    and completes — exactly-once without compare-and-swap."""
    b1, b2, part = _two_batches()
    spec = TableSpec(num_partitions=NPARTS)

    ref_lake = _flaky_lake()
    ref_apply = _make_apply_fn(ref_lake, spec)
    ref_apply(b1)
    ref_apply(b2)
    ref_ck = read_checkpoint(ref_lake, part)
    ref_t = read_partition(ref_lake, part)

    lake = _flaky_lake()
    apply_fn = _make_apply_fn(lake, spec)
    apply_fn(b1)
    ck0 = read_checkpoint(lake, part)
    FlakyMemFS.faults = {f"_ckpt/part-{part:05d}.json": 1}
    with pytest.raises(OSError, match="injected PUT failure"):
        apply_fn(b2)
    # the orphaned data file must not be observable: the checkpoint still
    # names v0 and the resolved partition matches it
    ck = read_checkpoint(lake, part)
    assert ck == ck0
    t = read_partition(lake, part)
    assert content_hash(t) == ck["content_hash"]
    assert ck["version"] == 0
    # retry completes; final state matches the clean reference
    apply_fn(b2)
    ck = read_checkpoint(lake, part)
    assert ck["row_count"] == ref_ck["row_count"]
    assert ck["content_hash"] == ref_ck["content_hash"]
    assert _state(read_partition(lake, part)) == _state(ref_t)


def test_checkpoint_floor_prunes_redelivery_after_crash_retry():
    """After a crash-retry completed, a FULL redelivery of both batches is
    checkpoint-pruned to a noop (no new version)."""
    b1, b2, part = _two_batches()
    spec = TableSpec(num_partitions=NPARTS)
    lake = _flaky_lake()
    apply_fn = _make_apply_fn(lake, spec)
    apply_fn(b1)
    FlakyMemFS.faults = {f"_ckpt/part-{part:05d}.json": 1}
    with pytest.raises(OSError):
        apply_fn(b2)
    apply_fn(b2)  # crash-retry
    ck = read_checkpoint(lake, part)
    import pyarrow as pa

    both = pa.concat_tables([b1, b2])
    apply_fn(both)  # full redelivery
    ck2 = read_checkpoint(lake, part)
    assert ck2["content_hash"] == ck["content_hash"]
    assert ck2["row_count"] == ck["row_count"]
