"""Named query pipelines + DuckDB oracle SQL.

Each entry pairs a Ray-Data pipeline (streaming, ``map_batches`` over
zero-copy Arrow) with an independently-written ANSI-SQL oracle the driver
runs side-by-side in DuckDB over the same parquet tables.  Column names are
aligned pair-for-pair (the driver hashes values under sorted column names).

The projector family generalizes the reference's contrib handlers
(SURVEY.md §2.3): numeric cleaning, multi-format date normalization,
era-date fallback, row filtering, metadata-broadcast appends, reprojection.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from raycdc import ops

def _scratch_path(sf_dir: str, name: str) -> str:
    """Per-fixture scratch dir scoped by the sf_dir basename so gate runs
    against different fixture dirs (sf0.01 vs sf0.001) never collide — two
    interleaved runs would otherwise rmtree each other's live lakes."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(tempfile.gettempdir(), f"raycdc_{name}_{tag}")


# ---------------------------------------------------------------------------
# DuckDB-side reimplementation of clean_number (independent of the Arrow one)


def _sql_clean(expr: str) -> str:
    # reference semantics (handlers.go:36-51): '-' kept only at index 0;
    # the exact residue '-' maps to '', other digit-free residues pass
    body = f"regexp_replace({expr}, '[^0-9.]', '', 'g')"
    signed = f"(CASE WHEN {expr} LIKE '-%' THEN '-' ELSE '' END || {body})"
    return f"CASE WHEN {signed} = '-' THEN '' ELSE {signed} END"


# ---------------------------------------------------------------------------
# projector queries


def q_proj_clean_number(sf_dir: str):
    """T2 CleanNumber over synthetic dirty strings built from lineitem
    (/root/reference/contrib/handlers/handlers.go:36-51)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_suppkey", "l_partkey", "l_discount"],
    )

    def fn(t: pa.Table) -> pa.Table:
        okey = pc.cast(t["l_orderkey"], pa.string())
        s1 = pc.binary_join_element_wise("¥", okey, "-", "")
        s2 = pc.binary_join_element_wise(
            pc.cast(t["l_linenumber"], pa.string()),
            ".",
            pc.cast(t["l_suppkey"], pa.string()),
            "USD",
            "",
        )
        s3 = pc.if_else(
            pc.less(t["l_discount"], 0.05),
            pa.scalar("-"),
            pc.binary_join_element_wise(
                "-", pc.cast(t["l_partkey"], pa.string()), "円", ""
            ),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "c1": ops.clean_number(s1),
                "c2": ops.clean_number(s2),
                "c3": ops.clean_number(s3),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_PROJ_CLEAN_NUMBER = f"""
WITH d AS (
    SELECT l_orderkey, l_linenumber,
        '¥' || CAST(l_orderkey AS VARCHAR) || '-' AS s1,
        CAST(l_linenumber AS VARCHAR) || '.' || CAST(l_suppkey AS VARCHAR) || 'USD' AS s2,
        CASE WHEN l_discount < 0.05 THEN '-'
             ELSE '-' || CAST(l_partkey AS VARCHAR) || '円' END AS s3
    FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       {_sql_clean('s1')} AS c1,
       {_sql_clean('s2')} AS c2,
       {_sql_clean('s3')} AS c3
FROM d
"""


def q_proj_dates(sf_dir: str):
    """T1/T4/T5 multi-format date normalization over events timestamps
    (quickstart bqload.go:37-49, sony_bank.go:16, rakuten_bank.go:17)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )
    fmts = ("%Y/%m/%d", "%Y%m%d", "%Y年%m月%d日")

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "d_slash": ops.parse_date_multi(
                    pc.strftime(t["ts"], format="%Y/%m/%d"), fmts
                ),
                "d_compact": ops.parse_date_multi(
                    pc.strftime(t["ts"], format="%Y%m%d"), fmts
                ),
                "d_jp": ops.parse_date_multi(
                    pc.strftime(t["ts"], format="%Y年%m月%d日"), fmts
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_PROJ_DATES = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS d_slash,
       strftime(ts, '%Y-%m-%d') AS d_compact,
       strftime(ts, '%Y-%m-%d') AS d_jp
FROM events
"""


def q_proj_wareki(sf_dir: str):
    """T6 Japanese-era date parse with plain-format fallback
    (/root/reference/contrib/handlers/smbc.go:15-41): orders dates rendered
    as Heisei-era strings (1995-2001 → H07-H13), parsed back."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def fn(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"]
        yy = pc.subtract(pc.year(d), 1988)
        era = pc.binary_join_element_wise(
            "H",
            pc.utf8_lpad(pc.cast(yy, pa.string()), 2, "0"),
            ".",
            pc.strftime(d, format="%m"),
            ".",
            pc.strftime(d, format="%d"),
            "",
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "wareki": era,
                "d": ops.parse_wareki_date(era),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_PROJ_WAREKI = """
SELECT o_orderkey,
       'H' || lpad(CAST(year(o_orderdate) - 1988 AS VARCHAR), 2, '0')
           || '.' || strftime(o_orderdate, '%m')
           || '.' || strftime(o_orderdate, '%d') AS wareki,
       strftime(o_orderdate, '%Y-%m-%d') AS d
FROM orders
"""


def q_proj_statement(sf_dir: str):
    """Composite bank-statement pipeline — the quickstart handler end-to-end
    (/root/reference/examples/quickstart/bqload.go:19-53): date normalize +
    numeric clean + row filter + preprocessor-style constant append."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )

    def fn(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "event_id": t["event_id"],
                "date": ops.parse_date_multi(
                    pc.strftime(t["ts"], format="%Y/%m/%d"), ("%Y/%m/%d",)
                ),
                "description": pc.if_else(
                    pc.equal(t["event_type"], "click"),
                    pa.scalar(""),
                    t["event_type"],
                ),
                "amount": ops.clean_number(
                    pc.binary_join_element_wise(
                        pc.cast(t["event_id"], pa.string()), "円", ""
                    )
                ),
            }
        )
        out = ops.filter_nonempty(out, "description")
        return ops.append_constant(out, "payment_month", "2024-01")

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_PROJ_STATEMENT = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS date,
       event_type AS description,
       CAST(event_id AS VARCHAR) AS amount,
       '2024-01' AS payment_month
FROM events
WHERE event_type <> 'click'
"""


def _write_statement_csv(sf_dir: str) -> str:
    """Render the events table as one SMBC-card-style Shift-JIS statement
    export under /tmp (idempotent per events file): per-card preamble and
    footer lines the preset's line filter must drop, 7 positional columns,
    and the ``/(YYYYMM).csv`` object name the payment month derives from."""
    import os

    import pyarrow.parquet as pq

    src_path = f"{sf_dir}/events.parquet"
    st = os.stat(src_path)
    fingerprint = f"{st.st_size}-{st.st_mtime_ns}"
    out_dir = _scratch_path(sf_dir, "stmt_csv")
    marker = os.path.join(out_dir, "_done")
    path = os.path.join(out_dir, "202401.csv")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == fingerprint:
                return path
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    events = pq.read_table(src_path, columns=["event_id", "ts", "event_type"])
    lines = pc.binary_join_element_wise(
        pc.strftime(events["ts"], format="%Y/%m/%d"),
        events["event_type"],
        pc.cast(events["event_id"], pa.string()),
        "", "", "", "",
        ",",
    )
    body = "\n".join(
        ["住友　太郎　様,XXXX-XXXX,ＴＥＳＴカード"]  # dropped by the line filter
        + lines.to_pylist()
        + ["合計,,,,,,999999"]  # footer, dropped too
    )
    with open(path, "w", encoding="cp932", newline="") as f:
        f.write(body)
    with open(marker, "w") as f:
        f.write(fingerprint)
    return path


def q_preset_statement(sf_dir: str):
    """The contrib preset library end-to-end
    (/root/reference/contrib/handlers/smbc_card.go:18-100 →
    raycdc/presets.py): a Shift-JIS card statement with per-card preamble
    blocks → line filter → CSV decode → vectorized projector (date
    normalize + payment month from the object name).  Oracle recomputes the
    same projection straight from events."""
    from raycdc.presets import PRESETS

    path = _write_statement_csv(sf_dir)
    ds = PRESETS["smbc_card_statement"]().records([path])

    def strip_meta(t: pa.Table) -> pa.Table:
        return t.select([f"f{i}" for i in range(8)])

    return ds.map_batches(strip_meta, batch_format="pyarrow")


SQL_PRESET_STATEMENT = """
SELECT strftime(ts, '%Y-%m-%d') AS f0,
       event_type AS f1,
       CAST(event_id AS VARCHAR) AS f2,
       '' AS f3, '' AS f4, '' AS f5, '' AS f6,
       '2024-01-01' AS f7
FROM events
"""


# ---------------------------------------------------------------------------
# end-to-end CSV-segment ingestion — the whole reference pipeline in one
# query: ragged CSV WAL segments → decode stack → projector → exactly-once
# lake → read back (handler.go:100-131 generalized)


_CSV_COLS = (
    "conv_id",
    "turn_idx",
    "role",
    "text",
    "tool",
    "ts",
    "op",
    "lsn",
    "seg_id",
)


def _write_csv_segments(sf_dir: str) -> str:
    """Deterministically render the events-derived changelog as 8 CSV WAL
    segment files (preamble line + header + string rows) under /tmp.
    Idempotent per sf_dir."""
    import io
    import os

    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    from raycdc.changelog import SEGMENTS, derive_changelog_batch

    src_path = f"{sf_dir}/events.parquet"
    st = os.stat(src_path)
    fingerprint = f"{st.st_size}-{st.st_mtime_ns}"
    seg_dir = _scratch_path(sf_dir, "csv_segments")
    marker = os.path.join(seg_dir, "_done")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == fingerprint:  # cache valid for THIS events file
                return seg_dir
        shutil.rmtree(seg_dir, ignore_errors=True)
    os.makedirs(seg_dir, exist_ok=True)
    events = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    log = derive_changelog_batch(events)
    as_str = pa.table(
        {
            "conv_id": log["conv_id"],
            "turn_idx": pc.cast(log["turn_idx"], pa.string()),
            "role": log["role"],
            "text": log["text"],
            "tool": log["tool"],
            # epoch-microsecond integers: lossless string round-trip (Arrow
            # strftime has no %f directive; %S already embeds the fraction)
            "ts": pc.cast(pc.cast(log["ts"], pa.int64()), pa.string()),
            "op": log["op"],
            "lsn": pc.cast(log["lsn"], pa.string()),
            "seg_id": pc.cast(log["seg_id"], pa.string()),
        }
    )
    for seg in range(SEGMENTS):
        part = as_str.filter(pc.equal(log["seg_id"], seg))
        buf = io.BytesIO()
        pacsv.write_csv(part, buf)
        with open(os.path.join(seg_dir, f"seg-{seg:03d}.csv"), "wb") as f:
            f.write(b"# raycdc WAL segment export\n")  # preamble to skip
            f.write(buf.getvalue())
    with open(marker, "w") as f:
        f.write(fingerprint)
    return seg_dir


def _csv_wal_projector(t: pa.Table) -> pa.Table:
    """String→typed reprojection of a CSV-decoded WAL segment (the
    reference's date-normalize/cast analog) — shared by the direct CSV
    ingest and the Router's statement handlers."""
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "role": t["role"],
            "text": t["text"],
            "tool": pc.fill_null(t["tool"], ""),  # empty CSV cell → ""
            "ts": pc.cast(t["ts"], pa.int64()).cast(pa.timestamp("us")),
            "op": t["op"],
            "lsn": pc.cast(t["lsn"], pa.int64()),
            "seg_id": pc.cast(t["seg_id"], pa.int32()),
        }
    )


_CSV_WAL_DECODE = dict(
    skip_head_lines=1,  # preamble
    skip_leading_rows=1,  # header row
    column_names=_CSV_COLS,
    strings_can_be_null=True,  # NULL round-trips (tool '' is refilled)
)


def q_cdc_csv_ingest(sf_dir: str):
    """Full front-to-back path: CSV segments with preamble + header →
    per-file decode (skip lines, typed re-parse) → projector (string→typed
    casts, the reference's date-normalize analog) → hash-partitioned
    exactly-once LWW replay → lake read.  Oracle: the same LWW final state
    computed by DuckDB straight from events."""
    import glob

    from raycdc.engine import read_lake, replay
    from raycdc.parsers import SEG_PATH, DecodeSpec, parse_segments, read_segments
    from raycdc.schema import TableSpec

    seg_dir = _write_csv_segments(sf_dir)
    paths = sorted(glob.glob(f"{seg_dir}/seg-*.csv"))
    spec_decode = DecodeSpec(**_CSV_WAL_DECODE)
    records = parse_segments(read_segments(paths), spec_decode)
    projector = _csv_wal_projector

    lake = _scratch_path(sf_dir, "csv_ingest_lake")
    shutil.rmtree(lake, ignore_errors=True)
    spec = TableSpec(num_partitions=16)
    replay(records, lake, spec, projector=projector)
    return read_lake(lake, spec).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def _write_parquet_segments(sf_dir: str, n_files: int = 4) -> str:
    """Parquet WAL segment fixture for the tail/route path: the changelog
    rows with ``seg_id`` in 0–3, sliced into ``n_files`` files by
    CONTIGUOUS lsn range (a real WAL's delivery order — checkpoint
    pruning assumes later files carry later lsns, so a mod-interleaved
    split would be wrongly pruned on the second tail round).  Cached per
    events-file fingerprint (same pattern as :func:`_write_csv_segments`)."""
    import pyarrow.parquet as pq

    from raycdc.changelog import derive_changelog_batch

    src_path = f"{sf_dir}/events.parquet"
    st = os.stat(src_path)
    # "lsnsliced" marks the fixture FORMAT — bump it when the slicing
    # changes so stale caches from older formats never validate
    fingerprint = f"{st.st_size}-{st.st_mtime_ns}-lsnsliced-{n_files}"
    seg_dir = _scratch_path(sf_dir, "wal_segments")
    marker = os.path.join(seg_dir, "_done")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == fingerprint:
                return seg_dir
        shutil.rmtree(seg_dir, ignore_errors=True)
    os.makedirs(seg_dir, exist_ok=True)
    events = pq.read_table(
        src_path, columns=["event_id", "ts", "user_id", "event_type", "props"]
    )
    log = derive_changelog_batch(events)
    log = log.filter(pc.less_equal(log["seg_id"], 3))
    log = log.take(pc.sort_indices(log["lsn"]))
    per = -(-log.num_rows // n_files)  # ceil
    for k in range(n_files):
        pq.write_table(
            log.slice(k * per, per),
            os.path.join(seg_dir, f"seg-{k:03d}.parquet"),
        )
    with open(marker, "w") as f:
        f.write(fingerprint)
    return seg_dir


def q_cdc_tail_route(sf_dir: str):
    """The reference's PRODUCTION path under the oracle gate
    (/root/reference/bqloader.go:105-137 → handler.go:100-131): WAL
    segments appearing in a watch directory are picked up INCREMENTALLY by
    ``tail_once`` (append-only segment journal + per-partition checkpoints
    = exactly-once across rounds), while CSV statement segments fan out
    through the ``Router``'s regex dispatch (every matching handler fires
    concurrently, bqloader.go:119-134) into per-table lakes through the
    CSV decode stack + projector.

    Three routes, three lakes:

    * ``tail`` — parquet segments 0–3 via three ``tail_once`` rounds
      (partial pickup → rest → an idle round that must find nothing new);
    * ``route45`` / ``route67`` — CSV segments 4–5 / 6–7 via two Router
      handlers with disjoint regexes, run TWICE (the redelivery must be a
      checkpoint noop).

    Oracle: per-route LWW over the seg-filtered changelog, UNION ALL.
    """
    import glob

    from raycdc.engine import read_lake, tail_once
    from raycdc.parsers import DecodeSpec
    from raycdc.registry import PipelineHandler, Router
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=8)

    # --- tail path: incremental parquet pickup -----------------------------
    wal_dir = _write_parquet_segments(sf_dir, n_files=4)
    lake_tail = _scratch_path(sf_dir, "tailroute_tail")
    shutil.rmtree(lake_tail, ignore_errors=True)
    new1, _ = tail_once(wal_dir, lake_tail, spec, pattern="seg-00[01].parquet")
    new2, _ = tail_once(wal_dir, lake_tail, spec, pattern="seg-00[0-3].parquet")
    new3, lin3 = tail_once(wal_dir, lake_tail, spec, pattern="seg-00[0-3].parquet")
    if len(new1) != 2 or len(new2) != 2 or new3 or lin3 is not None:
        raise AssertionError(
            f"tail_once pickup contract violated: {new1} {new2} {new3}"
        )

    # --- Router fan-out: regex-routed CSV statement handlers ---------------
    csv_dir = _write_csv_segments(sf_dir)
    lake_45 = _scratch_path(sf_dir, "tailroute_45")
    lake_67 = _scratch_path(sf_dir, "tailroute_67")
    for lk in (lake_45, lake_67):
        shutil.rmtree(lk, ignore_errors=True)
    router = Router()
    for name, pat, lk in (
        ("route45", r"seg-00[45]\.csv$", lake_45),
        ("route67", r"seg-00[67]\.csv$", lake_67),
    ):
        router.add_handler(
            PipelineHandler(
                name=name,
                pattern=pat,
                lake_dir=lk,
                spec=spec,
                decode=DecodeSpec(**_CSV_WAL_DECODE),
                projector=_csv_wal_projector,
            )
        )
    paths = sorted(glob.glob(f"{csv_dir}/seg-*.csv"))
    results = router.run(paths)
    if sorted(len(r.paths) for r in results) != [2, 2]:
        raise AssertionError(f"router dispatch wrong: {results}")
    redelivery = router.run(paths)  # same segments again: checkpoint noop
    for r in redelivery:
        applied = r.lineage.filter(
            pc.not_equal(r.lineage["status"], "noop")
        ).num_rows
        if applied:
            raise AssertionError(f"redelivery applied rows via {r.handler}")

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    def tag(route: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.select(cols).add_column(
                0, "route", pa.array([route] * len(t), pa.string())
            )

        return fn

    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    out = (
        read_lake(lake_tail, spec).map_batches(tag("tail"), **kw)
        .union(read_lake(lake_45, spec).map_batches(tag("route45"), **kw))
        .union(read_lake(lake_67, spec).map_batches(tag("route67"), **kw))
    )
    return out


def _sql_cdc_tail_route() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    # per-route LWW over the seg-filtered changelog — must equal the
    # union of the tail lake + the two Router-handler lakes
    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY route, conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM (
        SELECT *, CASE
            WHEN seg_id BETWEEN 0 AND 3 THEN 'tail'
            WHEN seg_id IN (4, 5) THEN 'route45'
            ELSE 'route67'
        END AS route
        FROM changelog
    )
)
SELECT route, conv_id, turn_idx, role, text, tool, ts
FROM ranked
WHERE rn = 1 AND op <> 'delete'
"""


def q_text_embed_near_dup(sf_dir: str):
    """END-TO-END semantic near-dup: raw text → deterministic
    hashing-trick embeddings (:class:`raycdc.similarity.HashingEmbedder`,
    an actor-pool stage — no pre-made embeddings table) → LSH-bucketed
    cosine pair generation.  Rows-only (feature hashing is not
    SQL-expressible); the planted-twin recall contract is pinned in
    tests/test_embed_text.py."""
    from raycdc.similarity import embed_text, embedding_near_dup_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    vecs = embed_text(docs, dim=256, id_col="doc_id", concurrency=(1, 4))
    pairs = embedding_near_dup_pairs(
        vecs,
        threshold=0.8,
        nbits=6,
        nprobe=3,
        id_col="doc_id",
        num_partitions=8,
    )
    return pairs.sort(["a", "b"])


# ---------------------------------------------------------------------------
# text analysis (documents table)


def q_text_stats(sf_dir: str):
    """Token counting / quality raw counters (integer, oracle-exact)."""
    from raycdc.text import token_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(token_stats, batch_format="pyarrow", zero_copy_batch=True)


SQL_TEXT_STATS = """
WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       length(text) AS n_chars,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_uniq_tokens,
       len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stopwords,
       len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens
FROM w
"""


def q_text_quality(sf_dir: str):
    """Composite quality score (length band + diversity + stopword signal)."""
    from raycdc.text import quality_score

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(quality_score, batch_format="pyarrow", zero_copy_batch=True)


SQL_TEXT_QUALITY = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (
    SELECT doc_id,
           CAST(len(toks) AS DOUBLE) AS n_tok,
           CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
           CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) AS n_stop
    FROM w
)
SELECT doc_id,
       floor((
           0.4 * least(greatest((n_tok - 5) / 45.0, 0.0), 1.0)
         + 0.4 * (CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END)
         + 0.2 * least(
               (CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) * 10, 1.0
           )) * 1000000
       ) / 1000000 AS quality
FROM c
"""


def q_quality_gate(sf_dir: str):
    """Per-language quality-percentile ADMISSION GATE: keep only documents
    at or above their own language's median quality — the data-derived
    (not hand-tuned) threshold form of the C4/Gopher quality filter,
    where each language cohort sets its own bar.  Composition:
    :func:`raycdc.text.quality_score` partials →
    :func:`raycdc.relational.group_quantiles` (one bounded-key exchange;
    languages are bounded-cardinality, so the medians table is a few
    rows) → broadcast threshold lookup inside a per-batch filter.  The
    score map re-runs for the gate pass instead of materializing the
    scored corpus — the right trade at lake scale (recompute a cheap map,
    never persist a corpus-sized intermediate).  Exact float parity:
    quality is floor-quantized at the source (both engines), and the
    median interpolation is the same IEEE arithmetic ⊕quantiles_value
    already proves."""
    from raycdc.relational import group_quantiles
    from raycdc.text import quality_score

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def score(t: pa.Table) -> pa.Table:
        # drop null text BEFORE scoring: quality_score yields NaN there
        # (non-null!), which group_quantiles would fold into the median
        # while SQL's quantile_cont ignores the NULL quality row — the
        # one float-parity hole in this composition
        t = t.filter(pc.is_valid(t["text"]))
        return quality_score(t).append_column("lang", t["lang"])

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    med = group_quantiles(
        scored, group_col="lang", value_col="quality",
        qs=(0.5,), aliases=("med",), num_partitions=8,
    )
    # empty quantile buckets surface as zero-column blocks — drop them
    parts = [t for t in ray.get(med.to_arrow_refs()) if t.num_rows]
    med_t = (
        pa.concat_tables(parts)
        if parts
        else pa.schema(
            [pa.field("lang", pa.string()), pa.field("med", pa.float64())]
        ).empty_table()
    )
    langs_arr = med_t["lang"].combine_chunks()
    meds_arr = med_t["med"].combine_chunks()

    def gate(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["lang"], value_set=langs_arr)
        thr = pc.take(meds_arr, idx)
        # null lang → null threshold → dropped, = SQL inner JOIN USING(lang)
        keep = pc.fill_null(pc.greater_equal(t["quality"], thr), False)
        return t.filter(keep).select(["doc_id", "lang", "quality"])

    return scored.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


SQL_QUALITY_GATE = """
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
c AS (
    SELECT doc_id, lang,
           CAST(len(toks) AS DOUBLE) AS n_tok,
           CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
           CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) AS n_stop
    FROM w
),
q AS (
    SELECT doc_id, lang,
           floor((
               0.4 * least(greatest((n_tok - 5) / 45.0, 0.0), 1.0)
             + 0.4 * (CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END)
             + 0.2 * least(
                   (CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) * 10,
                   1.0
               )) * 1000000
           ) / 1000000 AS quality
    FROM c
),
m AS (SELECT lang, quantile_cont(quality, 0.5) AS med FROM q GROUP BY lang)
SELECT q.doc_id, q.lang, q.quality
FROM q JOIN m USING (lang)
WHERE q.quality >= m.med
"""


def q_text_langid(sf_dir: str):
    """Letter-frequency language ID (heuristic; rows-only check)."""
    from raycdc.text import lang_id

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(lang_id, batch_format="pyarrow", zero_copy_batch=True)


def q_text_fingerprints(sf_dir: str):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03).
    ORACLE-EXACT since round 4: token FNV-1a as a recursive HUGEINT fold,
    the 3-token shingle polynomial, sliding-window MIN via a bounded
    self-join (short docs get one window — the kernel's clamp semantics),
    DISTINCT mins per doc, and sign-masked (mod 2^63) min/max extremes."""
    from raycdc.text import fingerprints

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(fingerprints, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# dedup (documents table + constructed duplicates)

_DUP_OFFSET = 1_000_000


def _corpus_with_exact_copies(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def dup(t: pa.Table) -> pa.Table:
        copy = pa.table(
            {
                "doc_id": pc.add(t["doc_id"], _DUP_OFFSET),
                "text": t["text"],
            }
        )
        return pa.concat_tables([t.select(["doc_id", "text"]), copy])

    return ds.map_batches(dup, batch_format="pyarrow", zero_copy_batch=True)


def _corpus_with_near_copies(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def dup(t: pa.Table) -> pa.Table:
        near = pa.table(
            {
                "doc_id": pc.add(t["doc_id"], _DUP_OFFSET),
                "text": pc.binary_join_element_wise(t["text"], " extradup", ""),
            }
        )
        return pa.concat_tables([t.select(["doc_id", "text"]), near])

    return ds.map_batches(dup, batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_additive_rollup(sf_dir: str):
    """Incrementally maintained rollup lake (merge_policy='additive'):
    events become per-(user, event-class) cent deltas, 'error' events are
    resets (deletes), and the lake holds running sums with exactly-once
    semantics — the materialized-view-maintenance capability.  Replayed
    into a fresh lake per run; the oracle recomputes the same rollup with
    window SQL over the raw events."""
    import numpy as np

    from raycdc.engine import read_lake, replay
    from raycdc.schema import TableSpec

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    classes = ["click", "view", "purchase", "signup", "error"]

    def to_deltas(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        is_err = pc.equal(et, "error")
        cls = pc.index_in(et, value_set=pa.array(classes)).cast(pa.int32())
        # deletes must land on REAL insert-bearing keys (classes 0-3) or the
        # reset path is never exercised — route each error to event_id % 4
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        del_cls = pa.array((eid % 4).astype(np.int32))
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "conv_id": pc.binary_join_element_wise(
                    "u", pc.cast(t["user_id"], pa.string()), ""
                ),
                "turn_idx": pc.if_else(is_err, del_cls, cls),
                "ts": t["ts"],
                "op": pc.if_else(is_err, pa.scalar("delete"), pa.scalar("insert")),
                "lsn": t["event_id"].cast(pa.int64()),
                "cents": pa.array(np.floor(v * 100).astype(np.int64)),
            }
        )

    lake = _scratch_path(sf_dir, "additive_lake")
    shutil.rmtree(lake, ignore_errors=True)
    spec = TableSpec(
        num_partitions=16, merge_policy="additive", value_cols=("cents",)
    )
    replay(
        ds.map_batches(to_deltas, batch_format="pyarrow", zero_copy_batch=True),
        lake,
        spec,
    )
    out = read_lake(lake, spec)

    def project(t: pa.Table) -> pa.Table:
        return t.select(["conv_id", "turn_idx", "cents"]).set_column(
            1, "turn_idx", t["turn_idx"].cast(pa.int64())
        )

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


SQL_CDC_ADDITIVE_ROLLUP = """
WITH src AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CASE WHEN event_type = 'error' THEN event_id % 4
              ELSE CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
                   WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 END
         END AS turn_idx,
         ts, event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS op,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
), del AS (
  SELECT conv_id, turn_idx, ts, lsn,
         ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                            ORDER BY ts DESC, lsn DESC) AS rn
  FROM src WHERE op = 'delete'
), ld AS (
  SELECT conv_id, turn_idx, ts AS dts, lsn AS dlsn FROM del WHERE rn = 1
)
SELECT s.conv_id, s.turn_idx, CAST(SUM(s.cents) AS BIGINT) AS cents
FROM src s LEFT JOIN ld USING (conv_id, turn_idx)
WHERE s.op = 'insert' AND (ld.dts IS NULL OR (s.ts, s.lsn) > (ld.dts, ld.dlsn))
GROUP BY s.conv_id, s.turn_idx
"""


def q_cdc_bootstrap(sf_dir: str):
    """Snapshot bootstrap — dump-then-tail CDC onboarding
    (:func:`raycdc.engine.bootstrap`): the LWW state of the WAL head
    (``lsn <= L0``, tombstones KEPT via ``merged_state(keep_envelope=True,
    drop_deletes=False)``) initializes an empty lake checkpointed at
    position L0; the FULL changelog is then replayed — a total redelivery
    overlap — and the checkpoints prune the head exactly-once, applying
    only the tail.  Final live state must equal one-shot LWW over the
    whole log (the ``cdc_replay`` oracle).  The tombstone-carrying
    snapshot makes this exact even though event time is NOT monotone with
    lsn in the fixture (a pre-L0 delete must keep beating an older-``ts``
    post-L0 event)."""
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import bootstrap, merged_state, read_lake, replay
    from raycdc.schema import TableSpec

    # lsn = event_id: the dump position is the midpoint of the id space
    cut = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    spec = TableSpec(num_partitions=16)

    head = changelog_from_events(sf_dir).map_batches(
        lambda t: t.filter(pc.less_equal(t["lsn"], cut)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    snapshot = merged_state(head, spec, keep_envelope=True, drop_deletes=False)

    lake = _scratch_path(sf_dir, "bootstrap_lake")
    shutil.rmtree(lake, ignore_errors=True)
    bootstrap(snapshot, lake, spec, snapshot_lsn=cut)
    # replay the WHOLE log, not just the tail: the head must prune to noops
    replay(changelog_from_events(sf_dir), lake, spec)
    return read_lake(lake, spec).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def q_cdc_compact(sf_dir: str):
    """Tombstone GC + version vacuum under the oracle: replay the full
    changelog, :func:`raycdc.engine.compact` with a watermark above all
    event time (every applied delete drops), then :func:`raycdc.sink.
    vacuum` the superseded partition-file versions — the lake's steady-
    state maintenance pair, hash-pinned: the live state after both must
    equal one-shot LWW over the log (the ``cdc_replay`` oracle), and
    the query asserts in-line that compact actually removed tombstones
    and vacuum actually removed files (a no-op pair would silently pass
    the state compare)."""
    import datetime as dt

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import compact, read_lake, replay
    from raycdc.schema import TableSpec
    from raycdc.sink import vacuum

    import pyarrow.parquet as _pq

    spec = TableSpec(num_partitions=16)
    lake = _scratch_path(sf_dir, "compact_lake")
    shutil.rmtree(lake, ignore_errors=True)
    log = changelog_from_events(sf_dir)
    # two applies: every touched partition accumulates superseded file
    # versions, so the vacuum below has real garbage to collect
    cut = _pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    replay(
        log.map_batches(lambda t: t.filter(pc.less_equal(t["lsn"], cut)), **kw),
        lake,
        spec,
    )
    replay(
        log.map_batches(lambda t: t.filter(pc.greater(t["lsn"], cut)), **kw),
        lake,
        spec,
    )
    lin = compact(lake, spec, watermark=dt.datetime(2100, 1, 1))
    dropped = int(pc.sum(lin["tombstones"]).as_py() or 0)
    if dropped <= 0:
        raise AssertionError("compact dropped no tombstones — dead drill")
    removed = vacuum(lake)
    if removed <= 0:
        raise AssertionError("vacuum removed no files — dead drill")
    return read_lake(lake, spec).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def q_cdc_migrate(sf_dir: str):
    """Lake re-layout under the oracle (:func:`raycdc.engine.
    migrate_lake`): replay into a 16-partition lake, migrate it into a
    FRESH 8-partition layout (the escape hatch for the layout-purity
    contract — changing the count in place would orphan rows), then
    keep ingesting INTO THE MIGRATED lake: the post-migration tail must
    apply exactly-once against the carried-over checkpoint floors.
    Final live state must hash-match one-shot LWW over the whole log."""
    import pyarrow.parquet as _pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import migrate_lake, read_lake, replay
    from raycdc.schema import TableSpec

    spec16 = TableSpec(num_partitions=16)
    spec8 = TableSpec(num_partitions=8)
    root = _scratch_path(sf_dir, "migrate")
    shutil.rmtree(root, ignore_errors=True)
    src, dst = os.path.join(root, "src16"), os.path.join(root, "dst8")
    log = changelog_from_events(sf_dir)
    cut = _pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    replay(
        log.map_batches(lambda t: t.filter(pc.less_equal(t["lsn"], cut)), **kw),
        src,
        spec16,
    )
    migrate_lake(src, dst, spec8)
    # the migrated lake is a first-class continuation target: the tail
    # (plus a redelivered overlap of the head) applies exactly-once
    replay(log, dst, spec8)
    return read_lake(dst, spec8).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def q_cdc_restore(sf_dir: str):
    """Disaster-recovery drill under the oracle
    (:func:`raycdc.engine.restore_lake`): replay the WAL head, snapshot,
    replay a CORRUPTED tail (the bad-deploy), restore the lake to the
    snapshot, then replay the TRUE tail.  The final live state must equal
    one-shot LWW over the whole log — which proves the rewind restored
    both the data files and the checkpoint floors exactly (a floor left
    too high would prune the true tail's events; stale data would leak
    corrupted text into the final hash)."""
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import read_lake, replay, restore_lake
    from raycdc.schema import TableSpec
    from raycdc.sink import list_snapshots

    cut = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    spec = TableSpec(num_partitions=16)
    log = changelog_from_events(sf_dir)

    def head(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["lsn"], cut))

    def tail_true(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["lsn"], cut))

    def tail_corrupt(t: pa.Table) -> pa.Table:
        t = tail_true(t)
        return t.set_column(
            t.schema.get_field_index("text"),
            "text",
            pc.binary_join_element_wise(t["text"], "CORRUPTED", "|"),
        )

    lake = _scratch_path(sf_dir, "restore_lake")
    shutil.rmtree(lake, ignore_errors=True)
    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    replay(log.map_batches(head, **kw), lake, spec)
    snap = list_snapshots(lake)[-1]
    replay(log.map_batches(tail_corrupt, **kw), lake, spec)
    restore_lake(lake, snap)
    replay(log.map_batches(tail_true, **kw), lake, spec)
    return read_lake(lake, spec).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def q_cdc_distinct_view(sf_dir: str):
    """Incrementally maintained APPROXIMATE-DISTINCT view
    (:func:`raycdc.engine.maintain_distinct`): per-role HyperLogLog
    registers of distinct conversations, kept fresh from the lake's own
    change feed across two refreshes — exactly-once via the shared
    pending-claim plus register max-merge idempotence.  Rows-only (an HLL
    estimate is not SQL-expressible); the register-level invariants are
    pinned in tests/test_distinct_view.py."""
    import tempfile as _tf

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import maintain_distinct, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    root = _scratch_path(sf_dir, "distinct_view")
    shutil.rmtree(root, ignore_errors=True)
    src, view = os.path.join(root, "src"), os.path.join(root, "view")
    log = changelog_from_events(sf_dir)
    import pyarrow.parquet as _pq

    cut = _pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    replay(
        log.map_batches(lambda t: t.filter(pc.less_equal(t["lsn"], cut)), **kw),
        src,
        spec,
    )
    maintain_distinct(src, view, group_col="role", value_col="conv_id", spec=spec)
    replay(
        log.map_batches(lambda t: t.filter(pc.greater(t["lsn"], cut)), **kw),
        src,
        spec,
    )
    est = maintain_distinct(
        src, view, group_col="role", value_col="conv_id", spec=spec
    )
    return est.sort_by([("role", "ascending")])


def q_cdc_export(sf_dir: str):
    """The trainer hand-off round-trip, oracle-pinned end to end:
    replay → :func:`raycdc.engine.export_lake` (atomic jsonl shards,
    marker-based resume — the SECOND export in-query must skip every
    shard) → read the shards back.  The returned rows are the exported
    files' contents, so the hash compare pins the whole publication
    path, not just the lake."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import export_lake, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    root = _scratch_path(sf_dir, "export")
    shutil.rmtree(root, ignore_errors=True)
    lake, out = os.path.join(root, "lake"), os.path.join(root, "shards")
    replay(changelog_from_events(sf_dir), lake, spec)
    export_lake(lake, out, spec, format="jsonl",
                columns=["conv_id", "turn_idx", "role", "text"])
    # resume contract exercised in-query: the second run must not
    # rewrite a single up-to-date shard
    lin2 = export_lake(lake, out, spec, format="jsonl",
                       columns=["conv_id", "turn_idx", "role", "text"])
    statuses = set(lin2["status"].to_pylist())
    if not statuses <= {"skipped", "empty"}:
        raise AssertionError(f"resume re-exported shards: {statuses}")
    ds = ray.data.read_json(
        [os.path.join(out, f) for f in sorted(os.listdir(out))
         if f.startswith("part-")]
    )

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"].cast(pa.string()),
                "turn_idx": t["turn_idx"].cast(pa.int64()),
                "role": t["role"].cast(pa.string()),
                "text": t["text"].cast(pa.string()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def _sql_cdc_export() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def q_cdc_digest_view(sf_dir: str):
    """Incrementally maintained APPROXIMATE-QUANTILE view
    (:func:`raycdc.engine.maintain_digest`): per-role t-digest of the
    turn index distribution, kept fresh across two refreshes.  The
    non-idempotent-fold sibling of ⊕cdc_distinct_view — crash-retry
    safety rests on the per-group claim check + view checkpoints
    (pinned in tests/test_digest_view.py).  Rows-only (a t-digest
    estimate is not SQL-expressible); exact n_values per group IS
    asserted against SQL via the rows/schema compare."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import maintain_digest, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    root = _scratch_path(sf_dir, "digest_view")
    shutil.rmtree(root, ignore_errors=True)
    src, view = os.path.join(root, "src"), os.path.join(root, "view")
    log = changelog_from_events(sf_dir)
    import pyarrow.parquet as _pq

    cut = _pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    replay(
        log.map_batches(lambda t: t.filter(pc.less_equal(t["lsn"], cut)), **kw),
        src,
        spec,
    )
    maintain_digest(src, view, group_col="role", value_col="turn_idx", spec=spec)
    replay(
        log.map_batches(lambda t: t.filter(pc.greater(t["lsn"], cut)), **kw),
        src,
        spec,
    )
    est = maintain_digest(
        src, view, group_col="role", value_col="turn_idx", spec=spec
    )
    return est.sort_by([("role", "ascending")])


def q_cdc_enriched_replay(sf_dir: str):
    """Dimension enrichment INSIDE the exactly-once replay path: the
    replay's projector broadcast-joins every changelog batch against the
    customer dimension — `ray.put` ONCE on the driver, per-batch
    vectorized `index_in` lookup inside `map_batches` (never a shuffle,
    never re-shipped per batch) — so the lake stores the enriched schema.
    The generalized form of the reference's per-handler projector
    (/root/reference/handler.go:100-131) doing a lookup against reference
    data."""
    import pyarrow.parquet as pq

    import ray

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import read_lake, replay
    from raycdc.schema import TableSpec

    dim = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).combine_chunks()
    dim_ref = ray.put(dim)  # broadcast: one object-store copy, all tasks read it

    def enrich(t: pa.Table) -> pa.Table:
        b = ray.get(dim_ref)
        # conv_id = 'c' || user_id; the dimension key is user_id + 1
        uid = pc.cast(pc.utf8_slice_codeunits(t["conv_id"], 1, 1 << 30), pa.int64())
        idx = pc.index_in(pc.add(uid, 1), value_set=b["c_custkey"])
        seg = b["c_mktsegment"]
        seg = seg.combine_chunks() if isinstance(seg, pa.ChunkedArray) else seg
        return t.append_column("segment", pc.take(seg, idx))

    lake = _scratch_path(sf_dir, "enriched_lake")
    shutil.rmtree(lake, ignore_errors=True)
    spec = TableSpec(num_partitions=16)
    replay(changelog_from_events(sf_dir), lake, spec, projector=enrich)
    return read_lake(lake, spec).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts", "segment"]
    )


def _sql_cdc_enriched_replay() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
)
SELECT r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts,
       c.c_mktsegment AS segment
FROM ranked r
LEFT JOIN customer c
  ON c.c_custkey = CAST(substr(r.conv_id, 2) AS BIGINT) + 1
WHERE r.rn = 1 AND r.op <> 'delete'
"""


def _sql_cdc_bootstrap() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    # bootstrap + tail replay must land on the one-shot LWW final state
    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked
WHERE rn = 1 AND op <> 'delete'
"""


def q_cdc_colocated_join(sf_dir: str):
    """Zero-shuffle join of two CDC-maintained lakes that share the FNV-1a
    hash layout (:func:`raycdc.engine.colocated_join`): the transcript lake
    and a per-conversation dimension lake, both partitioned on ``conv_id``
    with the same ``num_partitions``, are co-located by construction, so
    the join runs one local Arrow hash-join task per partition pair — no
    all-to-all exchange, no broadcast.  This is the downstream-warehouse
    join the reference defers to BigQuery
    (/root/reference/handler.go:20-48) pulled into the engine itself."""
    import numpy as np

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import colocated_join, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    left = _scratch_path(sf_dir, "coloc_left")
    shutil.rmtree(left, ignore_errors=True)
    replay(changelog_from_events(sf_dir), left, spec)

    dim_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("segment", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    dim_spec = TableSpec(name="conv_dim", schema=dim_schema, num_partitions=16)

    def to_dim_changelog(t: pa.Table) -> pa.Table:
        # conv_id = 'c' || user_id; the dimension key is c_custkey = user_id+1
        n = len(t)
        ck = pc.cast(t["c_custkey"], pa.int64())
        conv_id = pc.binary_join_element_wise(
            "c", pc.cast(pc.subtract(ck, 1), pa.string()), ""
        )
        return pa.table(
            {
                "conv_id": conv_id,
                "turn_idx": pa.array(np.zeros(n, np.int32)),
                "segment": t["c_mktsegment"],
                "ts": pa.array(
                    np.full(n, 1_700_000_000_000_000, np.int64), pa.timestamp("us")
                ),
                "op": pa.array(np.full(n, "insert")),
                "lsn": ck,
                "seg_id": pa.array(np.zeros(n, np.int32)),
            }
        )

    right = _scratch_path(sf_dir, "coloc_right")
    shutil.rmtree(right, ignore_errors=True)
    dim = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(to_dim_changelog, batch_format="pyarrow")
    replay(dim, right, dim_spec)

    return colocated_join(
        left,
        right,
        on=("conv_id",),
        spec_left=spec,
        spec_right=dim_spec,
        left_columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        right_columns=["segment"],
    )


def q_cdc_join_view(sf_dir: str):
    """Incrementally MAINTAINED materialized join view
    (:func:`raycdc.engine.refresh_join_view`): build the transcript lake
    from the first half of the WAL, materialize the view, replay the
    second half, refresh — only partitions the tail replay touched are
    recomputed (version-pair no-op for the rest).  The final view must
    equal a from-scratch join of the full log, so it shares
    ``cdc_colocated_join``'s DuckDB oracle."""
    import numpy as np
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import read_lake, refresh_join_view, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    left = _scratch_path(sf_dir, "view_left")
    shutil.rmtree(left, ignore_errors=True)
    cut = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    log = changelog_from_events(sf_dir)
    replay(
        log.map_batches(
            lambda t: t.filter(pc.less_equal(t["lsn"], cut)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        left,
        spec,
    )

    dim_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("segment", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    dim_spec = TableSpec(name="conv_dim", schema=dim_schema, num_partitions=16)

    def to_dim_changelog(t: pa.Table) -> pa.Table:
        n = len(t)
        ck = pc.cast(t["c_custkey"], pa.int64())
        conv_id = pc.binary_join_element_wise(
            "c", pc.cast(pc.subtract(ck, 1), pa.string()), ""
        )
        return pa.table(
            {
                "conv_id": conv_id,
                "turn_idx": pa.array(np.zeros(n, np.int32)),
                "segment": t["c_mktsegment"],
                "ts": pa.array(
                    np.full(n, 1_700_000_000_000_000, np.int64), pa.timestamp("us")
                ),
                "op": pa.array(np.full(n, "insert")),
                "lsn": ck,
                "seg_id": pa.array(np.zeros(n, np.int32)),
            }
        )

    right = _scratch_path(sf_dir, "view_right")
    shutil.rmtree(right, ignore_errors=True)
    replay(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        ).map_batches(to_dim_changelog, batch_format="pyarrow"),
        right,
        dim_spec,
    )

    view = _scratch_path(sf_dir, "join_view")
    shutil.rmtree(view, ignore_errors=True)
    kw = dict(
        on=("conv_id",),
        spec_left=spec,
        spec_right=dim_spec,
        left_columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        right_columns=["segment"],
    )
    refresh_join_view(left, right, view, **kw)
    # tail replay, then incremental refresh (only touched partitions)
    replay(log, left, spec)
    refresh_join_view(left, right, view, **kw)
    return read_lake(view, with_tombstones=True)


def q_cdc_change_feed(sf_dir: str):
    """CDC OUT of the lake (:func:`raycdc.engine.change_feed`): replay the
    first half of the WAL, snapshot, replay the rest, snapshot — then emit
    the insert/update/delete feed between the two snapshots as one local
    diff task per partition (co-located version pairs, zero shuffle).  The
    ORACLE recomputes the feed as a FULL OUTER JOIN of the two LWW states
    with IS DISTINCT FROM semantics."""
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import change_feed, replay
    from raycdc.schema import TableSpec
    from raycdc.sink import write_snapshot

    spec = TableSpec(num_partitions=16)
    lake = _scratch_path(sf_dir, "feed_lake")
    shutil.rmtree(lake, ignore_errors=True)
    cut = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    log = changelog_from_events(sf_dir)
    replay(
        log.map_batches(
            lambda t: t.filter(pc.less_equal(t["lsn"], cut)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        lake,
        spec,
    )
    s0 = write_snapshot(lake)
    replay(log, lake, spec)
    s1 = write_snapshot(lake)
    return change_feed(lake, s0, s1, spec)


def q_cdc_sync_replica(sf_dir: str):
    """Incremental lake replication (:func:`raycdc.engine.sync_lake`):
    replay half the WAL into the primary, sync the replica, replay the
    rest, sync again (only touched partitions copy) — the replica's live
    state must equal the full-log LWW oracle."""
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import read_lake, replay, sync_lake
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    src = _scratch_path(sf_dir, "sync_src")
    dst = _scratch_path(sf_dir, "sync_dst")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    cut = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    log = changelog_from_events(sf_dir)
    replay(
        log.map_batches(
            lambda t: t.filter(pc.less_equal(t["lsn"], cut)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        src,
        spec,
    )
    sync_lake(src, dst, spec)
    replay(log, src, spec)
    sync_lake(src, dst, spec)
    return read_lake(dst, spec).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def q_cdc_rollup_view(sf_dir: str):
    """Incremental aggregate-view maintenance
    (:func:`raycdc.engine.maintain_rollup`): a per-conversation
    (turn count, total text length) rollup lake is built from the
    half-log state, then refreshed after the tail replay — each refresh
    consumes only the change feed since the last snapshot and applies
    signed before/after deltas through the additive exactly-once lake.
    The ORACLE recomputes the aggregate from scratch over the full LWW
    state."""
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import maintain_rollup, read_lake, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    src = _scratch_path(sf_dir, "rollup_src")
    roll = _scratch_path(sf_dir, "rollup_view")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(roll, ignore_errors=True)
    cut = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    log = changelog_from_events(sf_dir)

    def derive(t: pa.Table) -> pa.Table:
        import numpy as np

        n = len(t)
        return pa.table(
            {
                "n_turns": pa.array(np.ones(n, np.int64)),
                "text_len": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    kw = dict(
        group_cols=("conv_id",),
        value_cols=("n_turns", "text_len"),
        spec=spec,
        num_partitions=8,
        derive=derive,
    )
    replay(
        log.map_batches(
            lambda t: t.filter(pc.less_equal(t["lsn"], cut)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        src,
        spec,
    )
    maintain_rollup(src, roll, **kw)
    replay(log, src, spec)
    maintain_rollup(src, roll, **kw)

    def live_groups(t: pa.Table) -> pa.Table:
        # a group whose every turn was deleted keeps an explicit zero row
        # in the additive lake; SQL GROUP BY has no such row
        return t.filter(pc.not_equal(t["n_turns"], 0))

    return (
        read_lake(roll, with_tombstones=True)
        .map_batches(live_groups, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["conv_id", "n_turns", "text_len"])
    )


def _sql_cdc_rollup_view() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(length(text)) AS BIGINT) AS text_len
FROM ranked
WHERE rn = 1 AND op <> 'delete'
GROUP BY conv_id
"""


def q_cdc_extrema_view(sf_dir: str):
    """Incremental MIN/MAX/COUNT-per-conversation view
    (:func:`raycdc.engine.maintain_extrema`, on the shared maintain_view
    skeleton): built from the half-log state, refreshed after the tail
    replay — the NON-INVERTIBLE aggregate case (a delete can remove the
    current extremum, so touched conversations recompute from the pinned
    snapshot with partition pruning; no delta algebra exists).  ORACLE
    recomputes min/max/count from scratch over the full LWW state."""
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import maintain_extrema, read_lake, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    src = _scratch_path(sf_dir, "extrema_src")
    view = _scratch_path(sf_dir, "extrema_view")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(view, ignore_errors=True)
    cut = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    log = changelog_from_events(sf_dir)
    kw = dict(group_col="conv_id", value_col="turn_idx", spec=spec)
    replay(
        log.map_batches(
            lambda t: t.filter(pc.less_equal(t["lsn"], cut)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        src,
        spec,
    )
    maintain_extrema(src, view, **kw)
    replay(log, src, spec)
    maintain_extrema(src, view, **kw)
    return read_lake(view, TableSpec(num_partitions=8)).select_columns(
        ["conv_id", "vmin", "vmax", "n_rows"]
    )


def _sql_cdc_extrema_view() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
)
SELECT conv_id,
       MIN(turn_idx) AS vmin,
       MAX(turn_idx) AS vmax,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM ranked
WHERE rn = 1 AND op <> 'delete' AND turn_idx IS NOT NULL
GROUP BY conv_id
"""


def q_cdc_ttl_expire(sf_dir: str):
    """Row-level retention (:func:`raycdc.engine.expire_rows`): replay the
    full changelog into a lake, expire every live row whose ts is below
    the data's midpoint instant (a compact-style atomic partition rewrite
    — checkpointed, lineage'd, WAL positions untouched), run expire a SECOND
    time (must no-op: no live rows remain below the cutoff), and return
    the surviving state.  ORACLE: the one-shot LWW live state filtered to
    ts >= the same midpoint, computed in epoch-microsecond integer
    arithmetic on both sides."""
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import expire_rows, read_lake, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    lake = _scratch_path(sf_dir, "ttl_lake")
    shutil.rmtree(lake, ignore_errors=True)
    replay(changelog_from_events(sf_dir), lake, spec)
    ts = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])["ts"]
    lo = pc.min(ts).cast(pa.int64()).as_py()
    hi = pc.max(ts).cast(pa.int64()).as_py()
    import datetime as dt

    cutoff = dt.datetime(1970, 1, 1) + dt.timedelta(
        microseconds=(lo + hi) // 2
    )
    expire_rows(lake, cutoff, spec)
    expire_rows(lake, cutoff, spec)  # idempotence: second sweep no-ops
    return read_lake(lake, spec).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def _sql_cdc_ttl_expire() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
),
cut AS (
    SELECT make_timestamp(
        (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2
    ) AS cutoff FROM events
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked, cut
WHERE rn = 1 AND op <> 'delete' AND ts >= cutoff
"""


_TOPK_VIEW_K = 3


def q_cdc_topk_view(sf_dir: str):
    """Incremental TOP-K-per-conversation view
    (:func:`raycdc.engine.maintain_topk`, on the shared maintain_view
    skeleton): the ORDERED non-invertible case — a delete can evict a
    top-k member and promote a value the view never stored, so touched
    conversations recompute from the pinned snapshot with partition
    pruning.  Built from the half-log state, refreshed after the tail
    replay; ORACLE recomputes row_number() <= k from scratch over the
    full LWW state."""
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import maintain_topk, read_lake, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    src = _scratch_path(sf_dir, "topk_src")
    view = _scratch_path(sf_dir, "topk_view")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(view, ignore_errors=True)
    cut = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    log = changelog_from_events(sf_dir)
    kw = dict(
        group_col="conv_id", order_col="turn_idx", k=_TOPK_VIEW_K, spec=spec
    )
    replay(
        log.map_batches(
            lambda t: t.filter(pc.less_equal(t["lsn"], cut)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        src,
        spec,
    )
    maintain_topk(src, view, **kw)
    replay(log, src, spec)
    maintain_topk(src, view, **kw)
    return read_lake(view, TableSpec(num_partitions=8)).select_columns(
        ["conv_id", "rank", "turn_idx"]
    )


def _sql_cdc_topk_view() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
),
live AS (
    SELECT conv_id, turn_idx FROM ranked
    WHERE rn = 1 AND op <> 'delete' AND turn_idx IS NOT NULL
)
SELECT conv_id,
       CAST(row_number() OVER (
           PARTITION BY conv_id ORDER BY turn_idx DESC
       ) AS BIGINT) AS rank,
       turn_idx
FROM live
QUALIFY rank <= {_TOPK_VIEW_K}
"""


def q_cdc_transcript_view(sf_dir: str):
    """Incrementally maintained TRANSCRIPT view
    (:func:`raycdc.engine.maintain_transcripts`): a per-conversation
    assembled-document lake is built from the half-log state, then
    refreshed after the tail replay — each refresh re-assembles ONLY the
    conversations the change feed touched (partition-pruned snapshot
    read), exactly-once under the shared pending-claim protocol.  The
    ORACLE assembles every transcript from scratch over the full LWW
    state (same SQL as ⊕assemble_convs) — so the incremental view must
    equal the full recompute."""
    import pyarrow.parquet as pq

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import maintain_transcripts, read_lake, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=16)
    src = _scratch_path(sf_dir, "tview_src")
    view = _scratch_path(sf_dir, "tview")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(view, ignore_errors=True)
    cut = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows // 2
    log = changelog_from_events(sf_dir)
    replay(
        log.map_batches(
            lambda t: t.filter(pc.less_equal(t["lsn"], cut)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        src,
        spec,
    )
    maintain_transcripts(src, view, spec, num_partitions=8)
    replay(log, src, spec)
    maintain_transcripts(src, view, spec, num_partitions=8)
    return read_lake(view).select_columns(
        ["conv_id", "transcript", "n_turns", "n_chars", "n_user"]
    )


def _sql_cdc_change_feed() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
),
new_state AS (
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
),
ranked_old AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
    WHERE lsn <= (SELECT COUNT(*) FROM events) // 2
),
old_state AS (
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked_old WHERE rn = 1 AND op <> 'delete'
),
d AS (
    SELECT coalesce(n.conv_id, o.conv_id) AS conv_id,
           coalesce(n.turn_idx, o.turn_idx) AS turn_idx,
           CASE WHEN n.conv_id IS NULL THEN o.role ELSE n.role END AS role,
           CASE WHEN n.conv_id IS NULL THEN o.text ELSE n.text END AS text,
           CASE WHEN n.conv_id IS NULL THEN o.tool ELSE n.tool END AS tool,
           CASE WHEN n.conv_id IS NULL THEN o.ts ELSE n.ts END AS ts,
           CASE WHEN o.conv_id IS NULL THEN 'insert'
                WHEN n.conv_id IS NULL THEN 'delete'
                WHEN (n.role IS DISTINCT FROM o.role)
                  OR (n.text IS DISTINCT FROM o.text)
                  OR (n.tool IS DISTINCT FROM o.tool)
                  OR (n.ts IS DISTINCT FROM o.ts)
                THEN 'update' END AS op
    FROM old_state o
    FULL OUTER JOIN new_state n
      ON n.conv_id = o.conv_id AND n.turn_idx = o.turn_idx
)
SELECT conv_id, turn_idx, role, text, tool, ts, op
FROM d WHERE op IS NOT NULL
"""


def _sql_cdc_colocated_join() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
)
SELECT r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts,
       c.c_mktsegment AS segment
FROM ranked r
JOIN customer c
  ON c.c_custkey = CAST(substr(r.conv_id, 2) AS BIGINT) + 1
WHERE r.rn = 1 AND r.op <> 'delete'
"""


def q_text_redact(sf_dir: str):
    """PII-style scrub entirely in RE2 kernels
    (:func:`raycdc.text.redact_text`).  The fixture corpus carries no
    PII-shaped strings, so BOTH engines first append a deterministic
    augmentation derived from doc_id (an email, a phone, an IP on even
    ids) — the oracle then checks the full chain: pattern order, global
    replacement, and the per-row redaction count."""
    from raycdc.text import redact_text

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def augment(t: pa.Table) -> pa.Table:
        did = t["doc_id"].cast(pa.int64())
        import numpy as np

        d = did.to_numpy(zero_copy_only=False)
        ip = pc.if_else(
            pa.array(d % 2 == 0),
            pc.binary_join_element_wise(
                " ip 10.0.0.", pc.cast(pa.array(d % 256), pa.string()), ""
            ),
            pa.scalar(""),
        )
        text = pc.binary_join_element_wise(
            t["text"],
            " mail a",
            pc.cast(did, pa.string()),
            "@ex.com tel +1 555-000",
            pc.cast(pa.array(d % 10), pa.string()),
            ip,
            "",
        )
        return pa.table({"doc_id": did, "text": text})

    return ds.map_batches(
        augment, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(redact_text, batch_format="pyarrow", zero_copy_batch=True)


SQL_TEXT_REDACT = """
WITH aug AS (
  SELECT doc_id,
         text || ' mail a' || CAST(doc_id AS VARCHAR)
              || '@ex.com tel +1 555-000' || CAST(doc_id % 10 AS VARCHAR)
              || CASE WHEN doc_id % 2 = 0
                      THEN ' ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                      ELSE '' END AS text
  FROM documents
), s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')) AS c1,
         regexp_replace(text, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
  FROM aug
), s2 AS (
  SELECT doc_id, c1,
         len(regexp_extract_all(t, '\\+?\\d[\\d\\-\\s]{7,}\\d')) AS c2,
         regexp_replace(t, '\\+?\\d[\\d\\-\\s]{7,}\\d', '<PHONE>', 'g') AS t
  FROM s1
), s3 AS (
  SELECT doc_id, c1, c2,
         len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS c3,
         regexp_replace(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS t
  FROM s2
)
SELECT doc_id, t AS text, CAST(c1 + c2 + c3 AS BIGINT) AS n_redacted FROM s3
"""


def q_text_normalize(sf_dir: str):
    """Canonical text form (:func:`raycdc.text.normalize_text`): lowercase
    + whitespace collapse + edge trim, three Arrow kernel calls.  The
    fixture text is already canonical, so both engines first de-normalize
    deterministically (upper-case + padded edges + a tab) to make the
    normalization observable."""
    from raycdc.text import normalize_text

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def denorm(t: pa.Table) -> pa.Table:
        messy = pc.binary_join_element_wise(
            "  ", pc.utf8_upper(t["text"]), "\tEND  ", ""
        )
        return pa.table({"doc_id": t["doc_id"], "text": messy})

    return ds.map_batches(
        denorm, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(normalize_text, batch_format="pyarrow", zero_copy_batch=True)


SQL_TEXT_NORMALIZE = """
SELECT doc_id,
       trim(regexp_replace(lower('  ' || upper(text) || chr(9) || 'END  '),
                           '\\s+', ' ', 'g'), ' ') AS text
FROM documents
"""


def q_dedup_paragraphs(sf_dir: str):
    """INTRA-document paragraph dedup (:func:`raycdc.text.dedup_paragraphs`):
    repeats of a paragraph inside one document collapse to the first
    occurrence, original order kept — a pure per-batch map, zero
    exchanges.  The fixture has no paragraph structure, so both engines
    first plant one deterministically (text ‖ marker ‖ text ‖ marker):
    the expected survivor is exactly text ‖ marker."""
    from raycdc.text import dedup_paragraphs

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sep = "\n\n"

    def plant(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        marker = pc.binary_join_element_wise(
            "para-", pc.cast(t["doc_id"], pa.string()), ""
        )
        doubled = pc.binary_join_element_wise(
            t["text"], marker, t["text"], marker, sep
        )
        return pa.table({"doc_id": t["doc_id"], "text": doubled})

    return ds.map_batches(
        plant, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda t: dedup_paragraphs(t, sep=sep),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_DEDUP_PARAGRAPHS = """
WITH synth AS (
    SELECT doc_id,
           text || chr(10) || chr(10) || 'para-' || CAST(doc_id AS VARCHAR)
                || chr(10) || chr(10) || text
                || chr(10) || chr(10) || 'para-' || CAST(doc_id AS VARCHAR)
               AS t
    FROM documents WHERE text IS NOT NULL
),
exploded AS (
    SELECT doc_id,
           unnest(string_split(t, chr(10) || chr(10))) AS p,
           unnest(range(1, len(string_split(t, chr(10) || chr(10))) + 1)) AS ord
    FROM synth
),
firsts AS (
    SELECT doc_id, p, ord,
           row_number() OVER (PARTITION BY doc_id, p ORDER BY ord) AS rn
    FROM exploded
)
SELECT doc_id,
       string_agg(p, chr(10) || chr(10) ORDER BY ord) AS text
FROM firsts WHERE rn = 1
GROUP BY doc_id
"""


def q_text_strip_markup(sf_dir: str):
    """HTML boilerplate strip (:func:`raycdc.text.strip_markup`): tags →
    space, common entities decoded, whitespace collapsed — all Arrow RE2
    / literal-replace kernels.  Both engines wrap the fixture text in the
    same deterministic markup first, so the strip is observable and the
    oracle runs the identical RE2 chain in SQL."""
    from raycdc.text import strip_markup

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def wrap(t: pa.Table) -> pa.Table:
        html = pc.binary_join_element_wise(
            '<div id="',
            pc.cast(t["doc_id"], pa.string()),
            '"><p>',
            t["text"],
            " &amp; more</p><br/></div>",
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": html})

    return ds.map_batches(
        wrap, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(strip_markup, batch_format="pyarrow", zero_copy_batch=True)


SQL_TEXT_STRIP_MARKUP = """
SELECT doc_id,
       trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
               regexp_replace(
                   '<div id="' || CAST(doc_id AS VARCHAR) || '"><p>'
                       || text || ' &amp; more</p><br/></div>',
                   '<[^>]*>', ' ', 'g'),
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
           '\\s+', ' ', 'g'), ' ') AS text
FROM documents
"""


def q_conv_stats(sf_dir: str):
    """Per-conversation statistics over the replayed LWW state — the
    transcript-curation signals (turn count, role mix, tool-call count,
    text volume) a training pipeline thresholds on before assembly.
    Map-side partials (one row per conv per batch: indicator sums over
    vectorized Arrow kernels) collapse through ONE bucketed exchange
    (:func:`raycdc.relational.pre_aggregate`); the conv_id key is
    high-cardinality, so the exchange groups hash buckets, never keys."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.relational import pre_aggregate
    from raycdc.schema import TableSpec

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "role", "tool", "text"])

    def partial(t: pa.Table) -> pa.Table:
        def ind(mask) -> pa.Array:
            return pc.cast(mask, pa.int64())

        return pa.table(
            {
                "conv_id": t["conv_id"],
                "n_user": ind(pc.equal(t["role"], "user")),
                "n_assistant": ind(pc.equal(t["role"], "assistant")),
                "n_tool_calls": ind(pc.not_equal(t["tool"], "")),
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
                "n_tokens": pc.cast(
                    pc.list_value_length(pc.split_pattern(t["text"], " ")),
                    pa.int64(),
                ),
            }
        )

    rows = final.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return pre_aggregate(
        rows,
        key_cols=["conv_id"],
        sum_cols=["n_user", "n_assistant", "n_tool_calls", "n_chars", "n_tokens"],
        count_alias="n_turns",
        num_partitions=16,
    )


def _sql_conv_stats() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT conv_id, role, tool, text
    FROM ranked WHERE rn = 1 AND op <> 'delete'
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_user,
       CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_assistant,
       CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tool_calls,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM final
GROUP BY conv_id
"""


def q_conv_integrity(sf_dir: str):
    """Transcript-integrity QA over the replayed LWW state: per
    conversation, turn-index gaps (deletes punch holes), duplicate
    indices (none — the lake key is unique), and broken role alternation
    (adjacent same-role turns) — the validation gate a pipeline runs
    BEFORE assembling transcripts into training documents.  One
    group-bucketed exchange, all stats from one vectorized lexsort per
    bucket (:func:`raycdc.relational.sequence_integrity`)."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.relational import sequence_integrity
    from raycdc.schema import TableSpec

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "turn_idx", "role"])
    return sequence_integrity(
        final,
        group_col="conv_id",
        order_col="turn_idx",
        value_col="role",
        num_partitions=16,
    )


def _sql_conv_integrity() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT conv_id, turn_idx, role
    FROM ranked WHERE rn = 1 AND op <> 'delete'
), lagd AS (
    SELECT conv_id, turn_idx, role,
           lag(turn_idx) OVER w AS p_idx,
           lag(role) OVER w AS p_role
    FROM final WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(turn_idx) AS BIGINT) AS min_idx,
       CAST(max(turn_idx) AS BIGINT) AS max_idx,
       CAST(sum(CASE WHEN turn_idx = p_idx THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_idx,
       CAST(sum(CASE WHEN turn_idx - p_idx > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_gaps,
       CAST(sum(CASE WHEN role = p_role AND turn_idx <> p_idx
                THEN 1 ELSE 0 END) AS BIGINT) AS n_adjacent_repeats
FROM lagd GROUP BY conv_id
"""


def q_turn_dedup(sf_dir: str):
    """Cross-conversation assistant-turn dedup: identical assistant texts
    in the replayed LWW state (templated/boilerplate responses repeat
    across conversations) collapse to the earliest occurrence (min lsn) —
    :func:`raycdc.dedup.exact_dedup` applied to the transcript payload
    with the WAL position as the identity column."""
    from raycdc.changelog import changelog_from_events
    from raycdc.dedup import exact_dedup
    from raycdc.engine import merged_state
    from raycdc.schema import TableSpec

    final = merged_state(
        changelog_from_events(sf_dir),
        TableSpec(num_partitions=16),
        keep_envelope=True,
    )
    assistant = final.filter(
        expr="role == 'assistant'"
    ).select_columns(["lsn", "text"])
    return exact_dedup(
        assistant, text_col="text", id_col="lsn", num_partitions=16
    )


def _sql_turn_dedup() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT role, text, lsn
    FROM ranked WHERE rn = 1 AND op <> 'delete'
)
SELECT CAST(MIN(lsn) AS BIGINT) AS lsn, text
FROM final WHERE role = 'assistant'
GROUP BY text
"""


def q_merge_turns(sf_dir: str):
    """Merge runs of consecutive same-role turns in the replayed LWW
    state into single turns (multi-message bursts, retried sends, and
    streamed tool chunks become one turn each) —
    :func:`raycdc.relational.merge_adjacent_turns`, the transform
    companion of ⊕conv_integrity's run *counter*.  LWW winners make the
    role sequence irregular (the winning lsn varies per turn), so the
    state carries natural same-role runs; no corpus manipulation."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.relational import merge_adjacent_turns
    from raycdc.schema import TableSpec

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "turn_idx", "role", "text"])
    return merge_adjacent_turns(final, num_partitions=16)


def _sql_merge_turns() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT conv_id, turn_idx, role, text
    FROM ranked WHERE rn = 1 AND op <> 'delete'
), isl AS (
    SELECT *,
           row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
         - row_number() OVER (PARTITION BY conv_id, role ORDER BY turn_idx)
           AS island
    FROM final
)
SELECT conv_id, MIN(turn_idx) AS turn_idx, role,
       string_agg(text, chr(10) ORDER BY turn_idx) AS text,
       CAST(COUNT(*) AS BIGINT) AS n_merged
FROM isl GROUP BY conv_id, role, island
"""


def q_sft_pairs(sf_dir: str):
    """(context, response) SFT-pair extraction over the replayed LWW
    state: every assistant turn with ≥ 1 preceding turn becomes one
    training example, context = the up-to-4 immediately preceding turns
    rendered ``role: text`` and newline-joined
    (:func:`raycdc.relational.context_response_pairs`).  Oracle = DuckDB
    ``list() OVER (ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)``."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.relational import context_response_pairs
    from raycdc.schema import TableSpec

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "turn_idx", "role", "text"])
    return context_response_pairs(
        final,
        group_col="conv_id",
        order_col="turn_idx",
        role_col="role",
        text_col="text",
        response_role="assistant",
        window=4,
        sep="\n",
        num_partitions=16,
    )


def _sql_sft_pairs() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT conv_id, turn_idx, role, text
    FROM ranked WHERE rn = 1 AND op <> 'delete'
), w AS (
    SELECT conv_id, turn_idx, role, text,
           list(role || ': ' || text) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING
           ) AS ctx
    FROM final
)
SELECT conv_id,
       CAST(turn_idx AS BIGINT) AS turn_idx,
       array_to_string(ctx, chr(10)) AS context,
       text AS response,
       CAST(len(ctx) AS BIGINT) AS n_ctx_turns
FROM w
WHERE role = 'assistant' AND len(ctx) > 0
"""


def q_preference_pairs(sf_dir: str):
    """Reward-ranked (chosen, rejected) pair mining — the DPO data-prep
    op (:func:`raycdc.relational.preference_pairs`): per user, among the
    scored 'purchase' candidates, the highest-``value`` event is chosen
    and the lowest rejected (deterministic id tie-breaks), one training
    pair per user with ≥ 2 candidates.  Oracle = two ``row_number()``
    windows over the same candidate set.  Float convention: score/margin
    floor-quantized on BOTH sides."""
    import numpy as np

    from raycdc.relational import preference_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value", "props"],
    )

    def cand(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["event_type"], "purchase")).drop_columns(
            ["event_type"]
        )

    out = preference_pairs(
        ds.map_batches(cand, batch_format="pyarrow", zero_copy_batch=True),
        group_col="user_id",
        score_col="value",
        id_col="event_id",
        text_col="props",
        num_partitions=16,
    )

    def quantize(t: pa.Table) -> pa.Table:
        for c in ("chosen_score", "rejected_score", "margin"):
            v = t[c].to_numpy(zero_copy_only=False)
            t = t.set_column(
                t.schema.get_field_index(c), c, pa.array(np.floor(v * 1e6) / 1e6)
            )
        return t

    return out.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)


SQL_PREFERENCE_PAIRS = """
WITH cand AS (
    SELECT user_id, event_id, value, props FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
), ranked AS (
    SELECT user_id, event_id, value, props,
           row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id ASC
           ) AS rc,
           row_number() OVER (
               PARTITION BY user_id ORDER BY value ASC, event_id DESC
           ) AS rr,
           COUNT(*) OVER (PARTITION BY user_id) AS n
    FROM cand
), c AS (SELECT * FROM ranked WHERE rc = 1 AND n >= 2),
   r AS (SELECT * FROM ranked WHERE rr = 1)
SELECT c.user_id,
       c.event_id AS chosen_id,
       r.event_id AS rejected_id,
       floor(c.value * 1e6) / 1e6 AS chosen_score,
       floor(r.value * 1e6) / 1e6 AS rejected_score,
       floor((c.value - r.value) * 1e6) / 1e6 AS margin,
       CAST(c.n AS BIGINT) AS n_candidates,
       c.props AS chosen_text,
       r.props AS rejected_text
FROM c JOIN r ON c.user_id = r.user_id
"""


def q_pack_masks(sf_dir: str):
    """Loss-mask packing: the replayed LWW conversation state packed
    into fixed-128-token training sequences with each TURN's
    ``[span_start, span_end)`` interval and trained/masked flag —
    conversations stay contiguous inside a pack
    (:func:`raycdc.text.pack_groups`), non-assistant turns carry
    ``masked=1`` so the trainer's loss mask falls out directly.  Oracle
    = the pack_docs recursive-CTE next-fit over CONVERSATION totals +
    one window sum for the within-conversation offsets.  Group key is
    the numeric uid recovered from ``conv_id`` ('c<uid>') so the bucket
    hash stays on the integer golden-ratio path both sides mirror."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.schema import TableSpec
    from raycdc.text import pack_groups

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "turn_idx", "role", "text"])

    def prep(t: pa.Table) -> pa.Table:
        uid = pc.cast(pc.utf8_slice_codeunits(t["conv_id"], 1), pa.int64())
        n_tok = pc.cast(
            pc.list_value_length(pc.split_pattern(t["text"], " ")),
            pa.int64(),
        )
        masked = pc.cast(
            pc.not_equal(t["role"], "assistant"), pa.int64()
        )
        return pa.table(
            {
                "uid": uid,
                "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
                "n_tokens": n_tok,
                "masked": masked,
            }
        )

    return pack_groups(
        final.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        group_col="uid",
        order_col="turn_idx",
        len_col="n_tokens",
        budget=128,
        num_partitions=16,
        keep_cols=("masked",),
    )


def _sql_pack_masks() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH RECURSIVE {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), turns AS (
    SELECT CAST(substr(conv_id, 2) AS BIGINT) AS uid,
           CAST(turn_idx AS BIGINT) AS turn_idx,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(role <> 'assistant' AS BIGINT) AS masked
    FROM ranked WHERE rn = 1 AND op <> 'delete'
), tot AS (
    SELECT uid, CAST(SUM(n_tokens) AS BIGINT) AS total
    FROM turns GROUP BY uid
), bkt AS (
    SELECT uid, total,
        CAST((((CAST(uid AS HUGEINT) * 11400714819323198485)
             % 18446744073709551616)
             * 1099511628211) % 18446744073709551616 % 16 AS BIGINT) AS bucket
    FROM tot
), ord AS (
    SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY uid) AS rn
    FROM bkt
), rec AS (
    SELECT bucket, rn, uid, total,
           CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS pos,
           total AS fill
    FROM ord WHERE rn = 1
    UNION ALL
    SELECT o.bucket, o.rn, o.uid, o.total,
        CASE WHEN r.fill + o.total > 128 THEN r.bin + 1 ELSE r.bin END,
        CASE WHEN r.fill + o.total > 128 THEN CAST(0 AS BIGINT) ELSE r.fill END,
        CASE WHEN r.fill + o.total > 128 THEN o.total
             ELSE r.fill + o.total END
    FROM rec r JOIN ord o ON o.bucket = r.bucket AND o.rn = r.rn + 1
), spans AS (
    SELECT t.uid, t.turn_idx, t.n_tokens, t.masked,
           (r.bucket * 4294967296 + r.bin) AS pack_id,
           r.pos + COALESCE(SUM(t.n_tokens) OVER (
               PARTITION BY t.uid ORDER BY t.turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS span_start
    FROM turns t JOIN rec r ON r.uid = t.uid
)
SELECT uid, turn_idx, n_tokens, pack_id,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_start + n_tokens AS BIGINT) AS span_end,
       masked
FROM spans
"""


def q_assemble_convs(sf_dir: str):
    """Transcript reconstruction: LWW final state of the events-derived
    changelog → one training document per conversation (turn texts joined
    in turn order) with turn/char/user-turn counters
    (:func:`raycdc.relational.assemble_group_text` — the concat is ONE
    ``pc.binary_join`` over segment offsets per bucket).  Oracle =
    ``string_agg(text, chr(10) ORDER BY turn_idx)`` over the same final
    state."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.relational import assemble_group_text
    from raycdc.schema import TableSpec

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "turn_idx", "role", "text"])
    return assemble_group_text(
        final,
        group_col="conv_id",
        order_col="turn_idx",
        text_col="text",
        sep="\n",
        role_col="role",
        role_value="user",
        num_partitions=16,
    )


def _sql_assemble_convs() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT conv_id, turn_idx, role, text
    FROM ranked WHERE rn = 1 AND op <> 'delete'
)
SELECT conv_id,
       string_agg(text, chr(10) ORDER BY turn_idx) AS transcript,
       COUNT(*) AS n_turns,
       CAST(length(string_agg(text, chr(10) ORDER BY turn_idx)) AS BIGINT)
           AS n_chars,
       CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_user
FROM final GROUP BY conv_id
"""


def q_sketch_top_events(sf_dir: str):
    """Count-min frequency estimates for the known event classes from ONE
    shuffle-free pass (:func:`raycdc.sketch.approx_top_counts` — each
    batch collapses to a fixed (4, 2048) register row; partials fold by
    sum).  Rows-only: CMS is overestimate-bounded, not exact — the
    accuracy envelope is pytest-asserted (tests/test_trainops.py)."""
    from raycdc.sketch import approx_top_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type"]
    )
    return approx_top_counts(
        ds, "event_type", ["click", "view", "purchase", "signup", "error"]
    )


def q_pack_docs(sf_dir: str):
    """Sequence packing for training: documents → token counts → fixed
    256-token next-fit packs (:func:`raycdc.text.pack_sequences`).
    Deterministic (pack assignment is a pure function of the data), one
    bucketed exchange.  ORACLE-EXACT since round 4: the bucket hash is
    pure integer arithmetic (golden-ratio multiply mod 2^64, HUGEINT in
    DuckDB) and next-fit's sequential reset is a recursive CTE over
    id-ordered rows per bucket — SQL_PACK_DOCS mirrors the kernel cell
    for cell; invariants additionally pytest-pinned
    (tests/test_trainops.py::test_pack_sequences_invariants)."""
    from raycdc.text import pack_sequences, token_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    counts = ds.map_batches(
        token_stats, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "n_tokens"])
    return pack_sequences(counts, budget=256, num_partitions=16)


def q_bigram_nll(sf_dir: str):
    """Per-document bigram-LM NLL (:func:`raycdc.text.bigram_nll`):
    conditional-probability fluency scoring, one exchange bucketed by
    the CONDITIONING token so the pair count and the first-token
    continuation count colocate.  Oracle = toks[i]/toks[i+1] lateral
    pairs + two group-bys + the same MLE formula; nll floor-quantized
    both sides."""
    from raycdc.text import bigram_nll

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bigram_nll(ds, num_partitions=16)


SQL_BIGRAM_NLL = """
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n
    FROM documents
), s AS (
    SELECT doc_id, toks, n, unnest(generate_series(1, n - 1)) AS i
    FROM tok
), pairs AS (
    SELECT doc_id,
           toks[CAST(i AS BIGINT)] AS w1,
           toks[CAST(i + 1 AS BIGINT)] AS w2
    FROM s
), tfp AS (
    SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
    FROM pairs GROUP BY doc_id, w1, w2
), cp AS (
    SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS cnt_pair
    FROM tfp GROUP BY w1, w2
), cf AS (
    SELECT w1, CAST(SUM(cnt_pair) AS BIGINT) AS cnt_first
    FROM cp GROUP BY w1
)
SELECT t.doc_id,
       CAST(SUM(t.tf) AS BIGINT) AS n_pairs,
       floor(-SUM(t.tf * ln(c.cnt_pair / f.cnt_first)) / SUM(t.tf) * 1e6)
           / 1e6 AS nll
FROM tfp t
JOIN cp c ON t.w1 = c.w1 AND t.w2 = c.w2
JOIN cf f ON t.w1 = f.w1
GROUP BY t.doc_id
"""


def q_bigram_nll_ref(sf_dir: str):
    """Reference-corpus bigram scoring (:func:`raycdc.text.
    bigram_nll_ref`, the CCNet-style quality filter): every document
    scored under the Lidstone-smoothed bigram model of the ENGLISH
    subset — model and data separated, both corpora's pairs in ONE
    conditioning-token exchange.  Oracle = ref counts (cp/cf with the
    per-w1 continuation count) LEFT JOINed onto candidate pairs with
    the same smoothing CASE."""
    from raycdc.text import bigram_nll_ref

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ref = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")).drop_columns(["lang"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return bigram_nll_ref(ds, ref, alpha=1.0, num_partitions=16)


SQL_BIGRAM_NLL_REF = """
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n, lang
    FROM documents
), s AS (
    SELECT doc_id, toks, n, lang, unnest(generate_series(1, n - 1)) AS i
    FROM tok
), pairs AS (
    SELECT doc_id, lang,
           toks[CAST(i AS BIGINT)] AS w1,
           toks[CAST(i + 1 AS BIGINT)] AS w2
    FROM s
), cp AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt_pair
    FROM pairs WHERE lang = 'en' GROUP BY w1, w2
), cf AS (
    SELECT w1, CAST(SUM(cnt_pair) AS BIGINT) AS cnt_first,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM cp GROUP BY w1
), tfp AS (
    SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
    FROM pairs GROUP BY doc_id, w1, w2
), scored AS (
    SELECT t.doc_id, t.tf,
           CASE WHEN f.w1 IS NULL THEN 1.0 / 2.0
                ELSE (coalesce(c.cnt_pair, 0) + 1.0)
                     / (f.cnt_first + 1.0 * (f.k + 1))
           END AS p
    FROM tfp t
    LEFT JOIN cp c ON t.w1 = c.w1 AND t.w2 = c.w2
    LEFT JOIN cf f ON t.w1 = f.w1
)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_pairs,
       floor(-SUM(tf * ln(p)) / SUM(tf) * 1e6) / 1e6 AS nll
FROM scored GROUP BY doc_id
"""


def q_chunk_docs(sf_dir: str):
    """Sliding token-window chunking for embedding/retrieval prep
    (:func:`raycdc.text.chunk_tokens`): every document becomes
    overlapping 64-token chunks at stride 48, tail chunk shorter, never
    dropped.  Per-row — NO exchange, chunks stay in their producer's
    block.  Oracle = ``generate_series`` starts + ``array_slice`` +
    ``array_to_string`` over the same whitespace split."""
    from raycdc.text import chunk_tokens

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        lambda t: chunk_tokens(t, window=64, stride=48),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_CHUNK_DOCS = """
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n
    FROM documents
), s AS (
    SELECT doc_id, toks, n,
           unnest(generate_series(0, n - 1, 48)) AS start
    FROM tok
)
SELECT doc_id,
       CAST(start / 48 AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS tok_start,
       CAST(least(start + 64, n) AS BIGINT) AS tok_end,
       CAST(least(start + 64, n) - start AS BIGINT) AS n_tokens,
       array_to_string(
           array_slice(toks, CAST(start + 1 AS BIGINT), least(start + 64, n)),
           ' '
       ) AS chunk
FROM s
"""


# next-fit packing mirrored in SQL: bucket = ((doc_id * golden) mod 2^64
# * fnv_prime) mod 2^64 mod 16 (raycdc.partition.bucket_keys' numeric
# path, HUGEINT arithmetic), then the per-bucket sequential reset as a
# recursive CTE in doc_id order — pack_id = bucket << 32 | local_bin.
SQL_PACK_DOCS = """
WITH RECURSIVE
tok AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
bkt AS (
    SELECT doc_id, n_tokens,
        CAST((((CAST(doc_id AS HUGEINT) * 11400714819323198485)
             % 18446744073709551616)
             * 1099511628211) % 18446744073709551616 % 16 AS BIGINT) AS bucket
    FROM tok
),
ord AS (
    SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
    FROM bkt
),
rec AS (
    SELECT bucket, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS pos,
           n_tokens AS fill
    FROM ord WHERE rn = 1
    UNION ALL
    SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
        CASE WHEN r.fill + o.n_tokens > 256 THEN r.bin + 1 ELSE r.bin END,
        CASE WHEN r.fill + o.n_tokens > 256 THEN CAST(0 AS BIGINT) ELSE r.fill END,
        CASE WHEN r.fill + o.n_tokens > 256 THEN o.n_tokens
             ELSE r.fill + o.n_tokens END
    FROM rec r JOIN ord o ON o.bucket = r.bucket AND o.rn = r.rn + 1
)
SELECT doc_id, n_tokens, (bucket * 4294967296 + bin) AS pack_id, pos AS seq_pos
FROM rec
"""


def _derived_changelog(sf_dir: str, payload: str = "cents"):
    """Deterministic events→changelog derivation shared by the SCD2,
    temporal-lookup, and no-op-suppression queries, mirrored cell for cell
    by :func:`_sql_src_cte`: 'error' events become deletes routed onto
    real insert-bearing keys (``event_id % 4``); everything else upserts a
    class-keyed turn with an integer-cent payload (``payload='v50'``
    coarse-quantizes to ``cents % 50`` so no-op runs occur)."""
    import numpy as np

    classes = ["click", "view", "purchase", "signup", "error"]

    def to_changelog(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        is_err = pc.equal(et, "error")
        cls = pc.index_in(et, value_set=pa.array(classes)).cast(pa.int32())
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        del_cls = pa.array((eid % 4).astype(np.int32))
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        cols = {
            "conv_id": pc.binary_join_element_wise(
                "u", pc.cast(t["user_id"], pa.string()), ""
            ),
            "turn_idx": pc.if_else(is_err, del_cls, cls).cast(pa.int64()),
            "ts": t["ts"],
            "op": pc.if_else(is_err, pa.scalar("delete"), pa.scalar("insert")),
            "lsn": t["event_id"].cast(pa.int64()),
        }
        if payload == "v50":
            cols["v"] = pa.array(cents % 50)
        else:
            cols["cents"] = pa.array(cents)
        return pa.table(cols)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    return ds.map_batches(
        to_changelog, batch_format="pyarrow", zero_copy_batch=True
    )


def _sql_src_cte(payload: str = "cents") -> str:
    """The DuckDB mirror of :func:`_derived_changelog` as a ``src`` CTE."""
    pay = (
        "CAST(floor(value * 100) AS BIGINT) % 50 AS v"
        if payload == "v50"
        else "CAST(floor(value * 100) AS BIGINT) AS cents"
    )
    return f"""src AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(CASE WHEN event_type = 'error' THEN event_id % 4
              ELSE CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
                   WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 END
         END AS BIGINT) AS turn_idx,
         ts, event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS op,
         {pay}
  FROM events
)"""


def _corpus_with_messy_copies(sf_dir: str) -> "ray.data.Dataset":
    """documents + one REFORMATTED copy per doc (upper-cased, padded, a tab
    injected) — collapses back onto the original only through
    ``normalize_text``."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def with_messy_copy(t: pa.Table) -> pa.Table:
        messy = pa.table(
            {
                "doc_id": pc.add(t["doc_id"], _DUP_OFFSET),
                "text": pc.binary_join_element_wise(
                    "  ", pc.utf8_upper(t["text"]), "\t ", ""
                ),
            }
        )
        return pa.concat_tables([t.select(["doc_id", "text"]), messy])

    return ds.map_batches(
        with_messy_copy, batch_format="pyarrow", zero_copy_batch=True
    )


def q_dedup_normalized(sf_dir: str):
    """Normalization-keyed exact dedup — the composition the canonical
    form exists for: every document gets a REFORMATTED copy (upper-cased,
    padded, a tab injected) that only collapses back onto its original
    through ``normalize_text``; exact dedup on the normalized text then
    keeps the original's smaller doc_id.  Without the normalization stage
    the corpus would have 2N distinct texts — the oracle proves the
    collapse, not just the plumbing."""
    from raycdc.dedup import exact_dedup
    from raycdc.text import normalize_text

    normalized = _corpus_with_messy_copies(sf_dir).map_batches(
        normalize_text, batch_format="pyarrow", zero_copy_batch=True
    )
    return exact_dedup(
        normalized, text_col="text", id_col="doc_id", num_partitions=16
    )


SQL_DEDUP_NORMALIZED = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET},
         '  ' || upper(text) || chr(9) || ' ' AS text
  FROM documents
), n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS text
  FROM corpus
)
SELECT MIN(doc_id) AS doc_id, text FROM n GROUP BY text
"""


def q_corpus_curation(sf_dir: str):
    """END-TO-END curation — the composition a real training-data run
    executes as one streaming pipeline: normalize (messy reformatted
    copies collapse onto originals) → exact dedup on the canonical form
    (min-id winner) → quality scoring → threshold filter (≥ 0.65) →
    token-count stats for the survivors.  Every stage is oracled alone
    (⊕text_normalize, ⊕dedup_normalized, ⊕text_quality, ⊕text_stats);
    this query pins their COMPOSITION — a schema or semantics drift
    between any two stages breaks the hash even when each stage still
    passes its own gate.  No extra exchange beyond dedup's single one:
    scoring, filtering, and stats are per-batch map stages over the
    winner stream."""
    from raycdc.dedup import exact_dedup
    from raycdc.text import normalize_text, quality_score, token_stats

    normalized = _corpus_with_messy_copies(sf_dir).map_batches(
        normalize_text, batch_format="pyarrow", zero_copy_batch=True
    )
    winners = exact_dedup(
        normalized, text_col="text", id_col="doc_id", num_partitions=16
    )

    def score_filter_stats(t: pa.Table) -> pa.Table:
        q = quality_score(t)["quality"]
        keep = pc.greater_equal(q, 0.65)
        kept = t.filter(keep)
        stats = token_stats(kept)
        return pa.table(
            {
                "doc_id": stats["doc_id"],
                "n_tokens": stats["n_tokens"],
                "n_uniq_tokens": stats["n_uniq_tokens"],
                "n_bpe_tokens": stats["n_bpe_tokens"],
                "quality": q.filter(keep),
            }
        )

    return winners.map_batches(
        score_filter_stats, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_CORPUS_CURATION = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET},
         '  ' || upper(text) || chr(9) || ' ' AS text
  FROM documents
), n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS text
  FROM corpus
), winners AS (
  SELECT MIN(doc_id) AS doc_id, text FROM n GROUP BY text
), w AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM winners
), c AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
         CAST(len(regexp_extract_all(
             text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT
         ) AS n_bpe_tokens,
         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
             AS n_stop
  FROM w
), q AS (
  SELECT doc_id, n_tokens, n_uniq_tokens, n_bpe_tokens,
         floor((
             0.4 * least(greatest((n_tokens - 5) / 45.0, 0.0), 1.0)
           + 0.4 * (CASE WHEN n_tokens > 0
                    THEN CAST(n_uniq_tokens AS DOUBLE) / n_tokens
                    ELSE 0.0 END)
           + 0.2 * least(
                 (CASE WHEN n_tokens > 0 THEN n_stop / n_tokens
                  ELSE 0.0 END) * 10, 1.0
             )) * 1000000
         ) / 1000000 AS quality
  FROM c
)
SELECT doc_id, n_tokens, n_uniq_tokens, n_bpe_tokens, quality
FROM q WHERE quality >= 0.65
"""


def q_media_wav(sf_dir: str):
    """REAL audio decode end to end: deterministic PCM16 WAV clips are
    synthesized from event parameters, then parsed back by the stdlib
    ``wave`` codec in an actor-pool stage (:class:`raycdc.multimodal.
    WavDecoder`) — no fake decode anywhere.  The oracle recomputes the
    decoded metadata (rate, channels, sample count, duration) from the
    same derivation arithmetically, so a decode bug cannot hash-match."""
    import numpy as np

    from raycdc.multimodal import WavDecoder, synth_wav_batch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def to_clips(t: pa.Table) -> pa.Table:
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = eid % 5 == 0
        eid = eid[sel]
        return pa.table(
            {
                "media_id": pa.array(eid),
                "freq_hz": pa.array(200 + (eid % 800)),
                "dur_ms": pa.array(50 + (eid % 50)),
                "rate_hz": pa.array(np.where(eid % 2 == 0, 8000, 16000)),
            }
        )

    clips = ds.map_batches(to_clips, batch_format="pyarrow", zero_copy_batch=True)
    wavs = clips.map_batches(
        synth_wav_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256,  # ~20 KB/clip: bound payload bytes per batch
    )
    return wavs.map_batches(
        WavDecoder, batch_format="pyarrow", concurrency=(1, 4), batch_size=256
    ).select_columns(
        ["media_id", "sample_rate", "n_channels", "n_samples", "duration_ms"]
    )


def q_media_spectrogram(sf_dir: str):
    """REAL audio feature extraction end to end: bin-aligned sine clips
    are synthesized from event parameters, then framed + windowed +
    rFFT'd by :class:`raycdc.multimodal.SpectrogramExtractor` (actor
    pool, one vectorized FFT per batch).  Frequencies are multiples of
    125 Hz = 2 bins at n_fft=256/rate=16000, so the peak bin of a correct
    spectrogram is EXACTLY ``freq*n_fft/rate`` and the frame count is
    pure integer arithmetic — the oracle recomputes both, an FFT /
    windowing / framing bug cannot hash-match."""
    import numpy as np

    from raycdc.multimodal import SpectrogramExtractor, synth_wav_batch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def to_clips(t: pa.Table) -> pa.Table:
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = eid[eid % 9 == 0]
        return pa.table(
            {
                "media_id": pa.array(eid),
                # 250..3875 Hz, every one an exact rFFT bin (2m at 62.5 Hz)
                "freq_hz": pa.array(125 * (2 + eid % 30)),
                "dur_ms": pa.array(40 + (eid % 40)),
                "rate_hz": pa.array(np.full(len(eid), 16_000, np.int64)),
            }
        )

    clips = ds.map_batches(to_clips, batch_format="pyarrow", zero_copy_batch=True)
    wavs = clips.map_batches(
        synth_wav_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256,  # ~40 KB/clip: bound payload bytes per batch
    )
    return wavs.map_batches(
        SpectrogramExtractor, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=256,
    )


SQL_MEDIA_SPECTROGRAM = """
WITH clips AS (
    SELECT event_id AS media_id,
           125 * (2 + event_id % 30) AS f,
           16 * (40 + (event_id % 40)) AS n      -- samples at 16 kHz
    FROM events WHERE event_id % 9 = 0
)
SELECT media_id,
       1 + (n - 256) // 128 AS n_frames,
       (f * 256) // 16000 AS peak_bin
FROM clips
"""


_IMG_TWIN_OFFSET = 10_000_000


def q_audio_near_dup(sf_dir: str):
    """AUDIO near-dup via acoustic fingerprinting
    (:class:`raycdc.multimodal.AudioFingerprinter`): melody clips (a
    bin-aligned sine note per analysis window) are fingerprinted by
    their per-frame rFFT peak-bin sequence folded through a
    position-salted splitmix xor — a
    gain-INVARIANT hash, so each planted re-mastered twin (same melody,
    1/4 the amplitude) fingerprints identically and pairs at hamming 0
    through the shared banded-hamming exchange.  Integer-exact end to
    end: the oracle is simply the planted twin list (distinct 16-note
    melodies collide with probability ~2^-64)."""
    import numpy as np

    from raycdc.dedup import simhash_candidate_pairs
    from raycdc.multimodal import AudioFingerprinter, synth_melody_wav_batch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def to_clips(t: pa.Table) -> pa.Table:
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = eid[eid % 8 == 0]
        n = len(eid)
        return pa.table(
            {
                "media_id": pa.array(
                    np.concatenate([eid, eid + _IMG_TWIN_OFFSET])
                ),
                "seed": pa.array(np.tile(eid, 2)),
                "n_notes": pa.array(np.tile(12 + (eid % 8), 2)),
                # twin = re-mastered at quarter gain: peak bins invariant
                "amp_milli": pa.array(
                    np.concatenate(
                        [np.full(n, 500, np.int64), np.full(n, 125, np.int64)]
                    )
                ),
            }
        )

    clips = ds.map_batches(to_clips, batch_format="pyarrow", zero_copy_batch=True)
    wavs = clips.map_batches(
        synth_melody_wav_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256,  # ~10 KB/clip: bound payload bytes per batch
    )
    sigs = wavs.map_batches(
        AudioFingerprinter, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=256,
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": t["media_id"], "simhash": t["fingerprint"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return simhash_candidate_pairs(sigs, max_hamming=0, num_partitions=32)


SQL_AUDIO_NEAR_DUP = f"""
SELECT event_id AS a,
       event_id + {_IMG_TWIN_OFFSET} AS b,
       CAST(0 AS BIGINT) AS hamming
FROM events WHERE event_id % 8 = 0
"""


def q_image_near_dup(sf_dir: str):
    """IMAGE near-dup without embeddings: perceptual difference-hash
    (:class:`raycdc.multimodal.DHashExtractor`) over textured BMPs, then
    the existing banded-hamming pair machinery
    (:func:`raycdc.dedup.simhash_candidate_pairs`) — the whole pipeline is
    integer arithmetic, so it is oracle-EXACT: every planted exposure
    twin (same texture, +shift brightness, no clipping) hashes
    bit-identically (hamming 0) and must pair, while distinct textures
    give ~uniform 64-bit hashes whose probability of a ≤2-bit collision
    is ~1e-16 — the oracle is simply the planted twin list."""
    import numpy as np

    from raycdc.dedup import simhash_candidate_pairs
    from raycdc.multimodal import DHashExtractor, synth_pattern_bmp_batch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def to_imgs(t: pa.Table) -> pa.Table:
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = eid[eid % 6 == 0]
        n = len(eid)
        return pa.table(
            {
                "media_id": pa.array(np.concatenate([eid, eid + _IMG_TWIN_OFFSET])),
                "seed": pa.array(np.tile(eid, 2)),
                "width": pa.array(np.tile(32 + (eid % 32), 2)),
                "height": pa.array(np.tile(24 + (eid % 24), 2)),
                # twin = exposure variant: +20..55 luma, never clipped
                "shift": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int64), 20 + (eid % 36)]
                    )
                ),
            }
        )

    imgs = ds.map_batches(to_imgs, batch_format="pyarrow", zero_copy_batch=True)
    bmps = imgs.map_batches(
        synth_pattern_bmp_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256,  # ~3 KB/image: bound payload bytes per batch
    )
    sigs = bmps.map_batches(
        DHashExtractor, batch_format="pyarrow", concurrency=(1, 4), batch_size=256
    ).map_batches(
        lambda t: t.rename_columns(["doc_id", "simhash"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return simhash_candidate_pairs(sigs, max_hamming=2, num_partitions=32)


SQL_IMAGE_NEAR_DUP = f"""
SELECT event_id AS a,
       event_id + {_IMG_TWIN_OFFSET} AS b,
       CAST(0 AS BIGINT) AS hamming
FROM events WHERE event_id % 6 = 0
"""


def q_media_bmp(sf_dir: str):
    """REAL image decode end to end: solid-color 24-bit BMPs synthesized
    from event parameters, parsed back by the pure-numpy
    :class:`raycdc.multimodal.BmpDecoder` actor stage.  Solid color makes
    the channel means exactly the synthesis parameters, so the oracle
    recomputes EVERYTHING (dims, pixel count, means) arithmetically —
    a decode bug cannot hash-match."""
    from raycdc.multimodal import BmpDecoder, synth_bmp_batch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def to_imgs(t: pa.Table) -> pa.Table:
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = eid % 7 == 0
        eid = eid[sel]
        return pa.table(
            {
                "media_id": pa.array(eid),
                "width": pa.array(8 + (eid % 25)),
                "height": pa.array(8 + (eid % 17)),
                "r": pa.array(eid % 256),
                "g": pa.array((eid * 3) % 256),
                "b": pa.array((eid * 7) % 256),
            }
        )

    imgs = ds.map_batches(to_imgs, batch_format="pyarrow", zero_copy_batch=True)
    bmps = imgs.map_batches(
        synth_bmp_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=512,
    )
    return bmps.map_batches(
        BmpDecoder, batch_format="pyarrow", concurrency=(1, 4), batch_size=512
    )


def q_media_resize(sf_dir: str):
    """REAL three-stage image pipeline: synth BMP → nearest-neighbor
    resize to 12×10 (:class:`raycdc.multimodal.BmpResizer`, re-encoded
    BMP) → decode.  Solid colors survive resampling exactly, so the
    oracle recomputes the resized dims and the ORIGINAL channel means
    arithmetically — both codec directions and the resampler are all
    under the hash."""
    import numpy as np

    from raycdc.multimodal import BmpDecoder, BmpResizer, synth_bmp_batch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def to_imgs(t: pa.Table) -> pa.Table:
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = eid % 11 == 0
        eid = eid[sel]
        return pa.table(
            {
                "media_id": pa.array(eid),
                "width": pa.array(16 + (eid % 33)),
                "height": pa.array(12 + (eid % 21)),
                "r": pa.array(eid % 256),
                "g": pa.array((eid * 5) % 256),
                "b": pa.array((eid * 11) % 256),
            }
        )

    imgs = ds.map_batches(to_imgs, batch_format="pyarrow", zero_copy_batch=True)
    bmps = imgs.map_batches(
        synth_bmp_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=512,
    )
    small = bmps.map_batches(
        BmpResizer,
        fn_constructor_kwargs={"target_w": 12, "target_h": 10},
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=512,
    )
    return small.map_batches(
        BmpDecoder, batch_format="pyarrow", concurrency=(1, 4), batch_size=512
    )


def q_media_frames(sf_dir: str):
    """REAL video frame sampling end to end: deterministic uncompressed
    YUV4MPEG2 clips synthesized from event parameters (solid C420 frames,
    ``Y = (base + 7k) % 256``), then every 2nd frame sampled by the
    seeking container parser (:class:`raycdc.multimodal.Y4mFrameSampler`).
    The oracle regenerates (frame_idx, dims, luma mean) arithmetically
    with a LATERAL frame-index range — a parser bug cannot hash-match."""
    from raycdc.multimodal import Y4mFrameSampler, synth_y4m_batch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def to_clips(t: pa.Table) -> pa.Table:
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = eid[eid % 13 == 0]
        return pa.table(
            {
                "media_id": pa.array(eid),
                "width": pa.array(8 + (eid % 5) * 2),  # even, 8..16
                "height": pa.array(6 + (eid % 4) * 2),  # even, 6..12
                "n_frames": pa.array(3 + (eid % 5)),  # 3..7
                "y_base": pa.array(eid % 200),
            }
        )

    clips = ds.map_batches(to_clips, batch_format="pyarrow", zero_copy_batch=True)
    vids = clips.map_batches(
        synth_y4m_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256,  # ~1 KB/frame × ≤7 frames: payload-bounded batches
    )
    return vids.map_batches(
        Y4mFrameSampler,
        fn_constructor_kwargs={"step": 2},
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=256,
    )


SQL_MEDIA_FRAMES = """
WITH clips AS (
    SELECT event_id AS media_id,
           8 + (event_id % 5) * 2 AS width,
           6 + (event_id % 4) * 2 AS height,
           3 + (event_id % 5) AS n_frames,
           event_id % 200 AS y_base
    FROM events WHERE event_id % 13 = 0
)
SELECT c.media_id,
       CAST(f.k AS BIGINT) AS frame_idx,
       CAST(c.width AS BIGINT) AS width,
       CAST(c.height AS BIGINT) AS height,
       floor(CAST((c.y_base + 7 * f.k) % 256 AS DOUBLE) * 1e6) / 1e6 AS mean_y
FROM clips c, LATERAL (
    SELECT unnest(range(0, c.n_frames, 2)) AS k
) f
"""


SQL_MEDIA_RESIZE = """
SELECT event_id AS media_id,
       CAST(12 AS BIGINT) AS width,
       CAST(10 AS BIGINT) AS height,
       CAST(120 AS BIGINT) AS n_pixels,
       floor(CAST(event_id % 256 AS DOUBLE) * 1e6) / 1e6 AS mean_r,
       floor(CAST((event_id * 5) % 256 AS DOUBLE) * 1e6) / 1e6 AS mean_g,
       floor(CAST((event_id * 11) % 256 AS DOUBLE) * 1e6) / 1e6 AS mean_b
FROM events WHERE event_id % 11 = 0
"""


SQL_MEDIA_BMP = """
SELECT event_id AS media_id,
       CAST(8 + event_id % 25 AS BIGINT) AS width,
       CAST(8 + event_id % 17 AS BIGINT) AS height,
       CAST((8 + event_id % 25) * (8 + event_id % 17) AS BIGINT) AS n_pixels,
       floor(CAST(event_id % 256 AS DOUBLE) * 1e6) / 1e6 AS mean_r,
       floor(CAST((event_id * 3) % 256 AS DOUBLE) * 1e6) / 1e6 AS mean_g,
       floor(CAST((event_id * 7) % 256 AS DOUBLE) * 1e6) / 1e6 AS mean_b
FROM events WHERE event_id % 7 = 0
"""


SQL_MEDIA_WAV = """
SELECT event_id AS media_id,
       CASE WHEN event_id % 2 = 0 THEN 8000 ELSE 16000 END AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST((CASE WHEN event_id % 2 = 0 THEN 8000 ELSE 16000 END)
            * (50 + event_id % 50) / 1000 AS BIGINT) AS n_samples,
       CAST(50 + event_id % 50 AS BIGINT) AS duration_ms
FROM events WHERE event_id % 5 = 0
"""


def q_cdc_scd2_history(sf_dir: str):
    """SCD Type-2 history table from a CDC changelog: every version a key
    ever held with its ``[valid_from, valid_to)`` validity interval and an
    ``is_current`` flag; deletes close intervals without emitting rows.
    ONE hash-bucketed exchange + a single lexsort pass per bucket
    (:func:`raycdc.scd.scd2_history`).  Oracle = window ``LEAD(ts)`` per
    key over the shared :func:`_sql_src_cte` derivation."""
    from raycdc.scd import scd2_history

    return scd2_history(
        _derived_changelog(sf_dir),
        key_cols=("conv_id", "turn_idx"),
        num_partitions=16,
    )


def q_zscore_events(sf_dir: str):
    """Per-user z-score standardization of event cents
    (:func:`raycdc.relational.standardize`): one bucketed exchange
    computes group sufficient statistics AND the per-row scores.  Integer
    cents make the sums exact on both engines, so the identical double
    expression evaluates bit-for-bit; floor-quantization is belt and
    braces."""
    import numpy as np

    from raycdc.relational import standardize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        v = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "vc": pa.array(v.astype(np.int64)),
            }
        )

    out = standardize(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        group_col="user_id",
        value_col="vc",
        z_alias="z",
        num_partitions=16,
    )

    def quantize(t: pa.Table) -> pa.Table:
        z = t["z"].to_numpy(zero_copy_only=False)
        return t.set_column(
            t.schema.get_field_index("z"),
            "z",
            pa.array(np.floor(z * 1e6) / 1e6, mask=np.isnan(z)),
        )

    return out.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)


SQL_ZSCORE_EVENTS = """
WITH c AS (
  SELECT event_id, user_id, CAST(floor(value * 100) AS BIGINT) AS vc
  FROM events
), s AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(SUM(vc) AS DOUBLE) AS s1,
         CAST(SUM(vc * vc) AS DOUBLE) AS s2
  FROM c GROUP BY user_id
)
SELECT c.event_id, c.user_id, c.vc,
       floor(
         (CAST(c.vc AS DOUBLE) - s.s1 / s.n)
         / NULLIF(sqrt(GREATEST(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 0)), 0)
         * 1e6
       ) / 1e6 AS z
FROM c JOIN s USING (user_id)
"""


def q_pctrank_events(sf_dir: str):
    """``PERCENT_RANK()`` per user over event cents
    (:func:`raycdc.relational.percent_rank`): ties share the first row's
    rank; the score is one double division of two integers, so the oracle
    hash-matches bit-for-bit."""
    import numpy as np

    from raycdc.relational import percent_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        v = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "vc": pa.array(v.astype(np.int64)),
            }
        )

    return percent_rank(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        group_col="user_id",
        value_col="vc",
        alias="pct_rank",
        num_partitions=16,
    )


SQL_PCTRANK_EVENTS = """
WITH c AS (
  SELECT event_id, user_id, CAST(floor(value * 100) AS BIGINT) AS vc
  FROM events
)
SELECT event_id, user_id, vc,
       PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY vc) AS pct_rank
FROM c
"""


def q_ntile_events(sf_dir: str):
    """``NTILE(4)`` quartile buckets per user over event cents with the
    unique event_id as tiebreak (a total order, so both engines agree on
    tile membership); integer output hashes exactly."""
    import numpy as np

    from raycdc.relational import ntile

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        v = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "vc": pa.array(v.astype(np.int64)),
            }
        )

    return ntile(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        group_col="user_id",
        order_cols=("vc", "event_id"),
        k=4,
        alias="tile",
        num_partitions=16,
    )


SQL_NTILE_EVENTS = """
WITH c AS (
  SELECT event_id, user_id, CAST(floor(value * 100) AS BIGINT) AS vc
  FROM events
)
SELECT event_id, user_id, vc,
       CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY vc, event_id)
            AS BIGINT) AS tile
FROM c
"""


def q_rollup_levels(sf_dir: str):
    """``GROUP BY ROLLUP`` over lineitem: (returnflag, linestatus) sums at
    every prefix level plus the grand total, collapsed keys null
    (:func:`raycdc.relational.grouping_rollup` — one map-side-combined
    exchange per level, no driver-side collect)."""
    import numpy as np

    from raycdc.relational import grouping_rollup

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def to_qty(t: pa.Table) -> pa.Table:
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pa.array(q.astype(np.int64)),
            }
        )

    return grouping_rollup(
        ds.map_batches(to_qty, batch_format="pyarrow", zero_copy_batch=True),
        key_cols=("l_returnflag", "l_linestatus"),
        sum_cols=("qty",),
        count_alias="n_rows",
        num_partitions=8,
        schema=pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("qty", pa.int64()),
            ]
        ),
    )


SQL_ROLLUP_LEVELS = """
WITH c AS (
  SELECT l_returnflag, l_linestatus,
         CAST(floor(l_quantity) AS BIGINT) AS qty
  FROM lineitem
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS BIGINT) AS qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM c GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_rolling_value(sf_dir: str):
    """Bounded ROWS window: per-user sum of the last 5 events' cents in
    (ts, event_id) order — one entity-bucketed exchange, window sums via
    two prefix-sum gathers (:func:`raycdc.relational.rolling_aggregate`).
    Integer cents keep both engines exact."""
    import numpy as np

    from raycdc.relational import rolling_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        v = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "vc": pa.array(v.astype(np.int64)),
            }
        )

    return rolling_aggregate(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        entity_col="user_id",
        ts_col="ts",
        order_cols=("event_id",),
        value_col="vc",
        window_rows=5,
        alias="roll_cents",
        num_partitions=16,
    )


SQL_ROLLING_VALUE = """
SELECT event_id, user_id, ts,
       CAST(floor(value * 100) AS BIGINT) AS vc,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS roll_cents
FROM events
"""


def q_quantiles_value(sf_dir: str):
    """Exact per-user cent-value quartiles
    (:func:`raycdc.relational.group_quantiles`): one bucketed exchange,
    one sort per bucket, every quantile a pair of vectorized gathers.
    Quartiles over integer cents interpolate bit-exactly on both engines
    (fracs are dyadic, order statistics are integers)."""
    import numpy as np

    from raycdc.relational import group_quantiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        v = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.table(
            {"user_id": t["user_id"], "vc": pa.array(v.astype(np.int64))}
        )

    out = group_quantiles(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        group_col="user_id",
        value_col="vc",
        qs=(0.25, 0.5, 0.75),
        aliases=("p25", "p50", "p75"),
        num_partitions=16,
    )

    def quantize(t: pa.Table) -> pa.Table:
        # belt-and-braces per the repo float convention: quartiles over
        # cents ARE bit-exact today, but quantizing both sides keeps the
        # gate stable across engine interpolation-formula changes
        for c in ("p25", "p50", "p75"):
            v = t[c].to_numpy(zero_copy_only=False)
            t = t.set_column(
                t.schema.get_field_index(c), c, pa.array(np.floor(v * 1e6) / 1e6)
            )
        return t

    return out.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)


SQL_QUANTILES_VALUE = """
WITH c AS (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS vc FROM events
)
SELECT user_id,
       floor(quantile_cont(vc, 0.25) * 1e6) / 1e6 AS p25,
       floor(quantile_cont(vc, 0.50) * 1e6) / 1e6 AS p50,
       floor(quantile_cont(vc, 0.75) * 1e6) / 1e6 AS p75
FROM c GROUP BY user_id
"""


def q_cdc_point_in_time(sf_dir: str):
    """Temporal point lookup over the SCD2 history: every event probes the
    version of key ``('u'||user_id, event_id % 4)`` that was valid at the
    event's own instant — null during deleted gaps and before birth.
    Composition of :func:`raycdc.scd.scd2_history` and
    :func:`raycdc.scd.point_in_time`; oracle = interval LEFT JOIN against
    the ``LEAD(ts)``-windowed history."""
    import numpy as np

    from raycdc.scd import point_in_time, scd2_history

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
    )

    def to_probes(t: pa.Table) -> pa.Table:
        eid = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "conv_id": pc.binary_join_element_wise(
                    "u", pc.cast(t["user_id"], pa.string()), ""
                ),
                "turn_idx": pa.array(eid % 4),
                "ts": t["ts"],
                "pid": t["event_id"].cast(pa.int64()),
            }
        )

    hist = scd2_history(
        _derived_changelog(sf_dir),
        key_cols=("conv_id", "turn_idx"),
        num_partitions=16,
    )
    probes = ds.map_batches(
        to_probes, batch_format="pyarrow", zero_copy_batch=True
    )
    ts_t = pa.timestamp("us")
    return point_in_time(
        hist,
        probes,
        key_cols=("conv_id", "turn_idx"),
        as_of_col="ts",
        payload_cols=("cents",),
        num_partitions=16,
        h_schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int64()),
                ("lsn", pa.int64()),
                ("cents", pa.int64()),
                ("valid_from", ts_t),
                ("valid_to", ts_t),
                ("is_current", pa.int64()),
            ]
        ),
        p_schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int64()),
                ("ts", ts_t),
                ("pid", pa.int64()),
            ]
        ),
    )


SQL_CDC_POINT_IN_TIME = f"""
WITH {_sql_src_cte()}, o AS (
  SELECT conv_id, turn_idx, cents, op, ts,
         LEAD(ts) OVER (PARTITION BY conv_id, turn_idx
                        ORDER BY ts, lsn) AS nts
  FROM src
), hist AS (
  SELECT conv_id, turn_idx, cents, ts AS vf, nts AS vt
  FROM o WHERE op = 'insert'
), probes AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 4 AS BIGINT) AS turn_idx,
         ts, event_id AS pid
  FROM events
)
SELECT p.conv_id, p.turn_idx, p.ts, p.pid,
       h.cents, h.vf AS valid_from
FROM probes p LEFT JOIN hist h
  ON p.conv_id = h.conv_id AND p.turn_idx = h.turn_idx
 AND h.vf <= p.ts AND (h.vt IS NULL OR p.ts < h.vt)
"""


def q_cdc_history_lake(sf_dir: str):
    """The continuously-maintained SCD2 history LAKE: replay the derived
    changelog with ``merge_policy='history'`` — the whole exactly-once
    engine (checkpoints, atomic installs, redelivery no-ops, lineage)
    maintaining version history instead of latest-state — then read the
    stored table back.  Replayed twice to prove idempotence; SAME oracle
    as ⊕cdc_scd2_history (the lake must equal the pure transform)."""
    from raycdc.engine import read_lake, replay
    from raycdc.schema import TableSpec

    log = _derived_changelog(sf_dir)
    lake = _scratch_path(sf_dir, "q_history_lake")
    shutil.rmtree(lake, ignore_errors=True)
    spec = TableSpec(num_partitions=16, merge_policy="history")
    replay(log, lake, spec)
    replay(_derived_changelog(sf_dir), lake, spec)  # redelivery: no-op
    return read_lake(lake, spec, with_tombstones=True).select_columns(
        ["conv_id", "turn_idx", "lsn", "cents",
         "valid_from", "valid_to", "is_current"]
    )


def q_cdc_suppress_noops(sf_dir: str):
    """Changelog compression: drop upserts whose payload equals the key's
    immediately preceding upsert (connectors emitting full row images per
    commit produce long no-op runs).  Payload is coarse-quantized
    (``cents % 50``) on BOTH engines so genuine no-op runs occur in the
    fixture data.  One hash-bucketed exchange; vectorized shifted-column
    equality per bucket (:func:`raycdc.changelog.suppress_noop_updates`).
    Oracle = ``LAG`` window with ``IS NOT DISTINCT FROM``."""
    from raycdc.changelog import suppress_noop_updates

    return suppress_noop_updates(
        _derived_changelog(sf_dir, payload="v50"),
        key_cols=("conv_id", "turn_idx"),
        payload_cols=("v",),
        num_partitions=16,
    )


SQL_CDC_SUPPRESS_NOOPS = f"""
WITH {_sql_src_cte("v50")}, o AS (
  SELECT conv_id, turn_idx, ts, op, lsn, v,
         LAG(op) OVER w AS pop, LAG(v) OVER w AS pv
  FROM src
  WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY ts, lsn)
)
SELECT conv_id, turn_idx, ts, op, lsn, v
FROM o
WHERE NOT (op = 'insert' AND COALESCE(pop, '') = 'insert'
           AND pv IS NOT DISTINCT FROM v)
"""


SQL_CDC_SCD2_HISTORY = f"""
WITH {_sql_src_cte()}, o AS (
  SELECT conv_id, turn_idx, lsn, cents, op, ts,
         LEAD(ts) OVER (PARTITION BY conv_id, turn_idx
                        ORDER BY ts, lsn) AS nts
  FROM src
)
SELECT conv_id, turn_idx, lsn, cents,
       ts AS valid_from, nts AS valid_to,
       CAST(nts IS NULL AS BIGINT) AS is_current
FROM o WHERE op = 'insert'
"""


def q_text_repetition(sf_dir: str):
    """Duplicate-bigram repetition signal per document (the Gopher-style
    repeated-n-gram quality filter), fully vectorized via the segmented
    shingle kernel."""
    from raycdc.text import repetition_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(repetition_stats, batch_format="pyarrow", zero_copy_batch=True)


SQL_TEXT_REPETITION = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b AS (
  SELECT doc_id,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
           AS bigrams
  FROM t
)
SELECT doc_id,
       len(bigrams) AS n_bigrams,
       len(list_distinct(bigrams)) AS n_uniq_bigrams,
       coalesce(
         floor((1 - len(list_distinct(bigrams))::DOUBLE / NULLIF(len(bigrams), 0))
               * 1e6) / 1e6,
         0.0
       ) AS dup_bigram_ratio
FROM b
"""


def q_token_vocab(sf_dir: str):
    """Corpus vocabulary with term frequencies: flat_map explode (one row
    per whitespace token, vectorized — no Python row loop) feeding the
    two-phase pre_aggregate, so the exchange carries per-batch partial
    counts, never raw tokens."""
    from raycdc.relational import pre_aggregate
    from raycdc.text import explode_tokens

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    toks = ds.map_batches(
        lambda b: explode_tokens(b).drop_columns(["doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return pre_aggregate(
        toks, key_cols=["token"], sum_cols=[], count_alias="n", num_partitions=16
    )


SQL_TOKEN_VOCAB = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL)
WHERE token <> ''
GROUP BY token
"""


def q_json_props_rollup(sf_dir: str):
    """Per-event-type rollup of a field extracted from the embedded JSON
    props column: one vectorized regex pass (no JSON row parsing), then
    map-side combine before a tiny bucketed exchange."""
    from raycdc.ops import extract_json_field
    from raycdc.relational import pre_aggregate

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    ds = ev.map_batches(
        lambda b: extract_json_field(
            b, "props", "k", "sum_k", as_int=True
        ).drop_columns(["props"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return pre_aggregate(
        ds,
        key_cols=["event_type"],
        sum_cols=["sum_k"],
        count_alias="n_events",
        num_partitions=4,
    )


SQL_JSON_PROPS_ROLLUP = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
"""


def q_tfidf_docs(sf_dir: str):
    """Per-(doc, token) TF-IDF: term frequency, document frequency, and
    the score all inside ONE token-bucketed exchange (df needs every
    occurrence of a token co-located — the bucket provides exactly that,
    so no second shuffle, no broadcast vocabulary)."""
    import pyarrow.parquet as _pq

    from raycdc.text import tfidf

    # corpus size N from parquet metadata — a pure metadata read, no scan
    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tfidf(ds, n_docs=n_docs, num_partitions=16)


SQL_TFIDF_DOCS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL
), t AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY doc_id, token
), d AS (
  SELECT token, COUNT(*) AS df FROM t GROUP BY token
), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
SELECT t.doc_id, t.token, t.tf,
       floor(t.tf * ln((SELECT n_docs FROM n) / d.df) * 1e6) / 1e6 AS tfidf
FROM t JOIN d USING (token)
"""


def q_unigram_nll(sf_dir: str):
    """Unigram-LM negative log-likelihood per token (CCNet-style
    perplexity proxy): documents ranked by how unlike the corpus's own
    token distribution they read.  Token counts, per-doc contributions,
    and the global-count join all happen inside ONE token-bucketed
    exchange (the tfidf shape); N is a shuffle-free streaming aggregate."""
    from raycdc.text import unigram_nll

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def tok_count(t: pa.Table) -> pa.Table:
        # non-empty tokens only — the same boundary-whitespace filter
        # explode_tokens applies, or N drifts from the summed counts
        flat = pc.list_flatten(pc.utf8_split_whitespace(t["text"]))
        n = pc.sum(pc.cast(pc.not_equal(flat, ""), pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64())})

    n_total = ds.map_batches(
        tok_count, batch_format="pyarrow", zero_copy_batch=True
    ).sum("n")
    return unigram_nll(ds, n_total_tokens=n_total, num_partitions=16)


SQL_UNIGRAM_NLL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL
), t AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY doc_id, token
), c AS (
  SELECT token, CAST(SUM(tf) AS BIGINT) AS cnt FROM t GROUP BY token
), n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c),
s AS (
  SELECT t.doc_id,
         SUM(t.tf * ln(c.cnt / (SELECT total FROM n))) AS sl,
         CAST(SUM(t.tf) AS BIGINT) AS n_tokens
  FROM t JOIN c USING (token)
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       floor(-sl / n_tokens * 1000000) / 1000000 AS nll
FROM s
"""


def q_embed_centroids(sf_dir: str):
    """Per-label embedding centroid, long form (label, idx, c): batches
    reduce to per-(group, dim) sum/count partials before one tiny
    exchange — vectors never shuffle."""
    from raycdc.similarity import group_centroids

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return group_centroids(ds, group_col="label", vec_col="embedding")


SQL_EMBED_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS idx,
       floor(avg(CAST(v AS DOUBLE)) * 1e6) / 1e6 AS c
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings)
GROUP BY 1, 2
"""


def q_cdc_snapshot_diff(sf_dir: str):
    """Snapshot differencing — the inverse of replay: two deterministic
    'versions' of the orders table (old drops keys %7==0; new drops keys
    %5==0 and bumps o_totalprice for keys %11==0) are diffed into
    insert/update/delete change events via one tagged union + one bucketed
    co-partitioned exchange.  The ORACLE recomputes the diff as a FULL
    OUTER JOIN with IS DISTINCT FROM semantics."""
    import numpy as np

    from raycdc.changelog import diff_snapshots

    def load():
        return ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )

    def old_snap(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(k % 7 != 0))

    def new_snap(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(k % 5 != 0))
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return t.set_column(
            t.schema.get_field_index("o_totalprice"),
            "o_totalprice",
            pa.array(np.where(k % 11 == 0, p + 10.0, p)),
        )

    out = diff_snapshots(
        load().map_batches(old_snap, batch_format="pyarrow", zero_copy_batch=True),
        load().map_batches(new_snap, batch_format="pyarrow", zero_copy_batch=True),
        key_cols=("o_orderkey",),
        value_cols=("o_custkey", "o_totalprice"),
        num_partitions=16,
    )

    def quantize(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return t.set_column(
            t.schema.get_field_index("o_totalprice"),
            "o_totalprice",
            pa.array(np.floor(p * 1e6) / 1e6),
        )

    return out.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)


SQL_CDC_SNAPSHOT_DIFF = """
WITH old_snap AS (
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey % 7 <> 0
),
new_snap AS (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 10.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 5 <> 0
),
d AS (
    SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN n.o_custkey
                WHEN n.o_orderkey IS NULL THEN o.o_custkey
                ELSE n.o_custkey END AS o_custkey,
           CASE WHEN o.o_orderkey IS NULL THEN n.o_totalprice
                WHEN n.o_orderkey IS NULL THEN o.o_totalprice
                ELSE n.o_totalprice END AS o_totalprice,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN (n.o_custkey IS DISTINCT FROM o.o_custkey)
                  OR (n.o_totalprice IS DISTINCT FROM o.o_totalprice)
                THEN 'update' END AS op
    FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
)
SELECT o_orderkey, o_custkey, floor(o_totalprice * 1e6) / 1e6 AS o_totalprice, op
FROM d WHERE op IS NOT NULL
"""


def q_drift_report(sf_dir: str):
    """Distribution-DRIFT report between two dataset versions — the
    monitoring pass a training pipeline runs before swapping corpus
    snapshots: per event class, exact q50/q90 of the value distribution
    in each version plus the deltas (two deterministic versions derived
    from events: the new one drops keys %7 and shifts %3 keys' cents by
    +25).  Two :func:`raycdc.relational.group_quantiles` passes (exact,
    one bucketed exchange each) + a driver-side join of the TINY
    per-class results — the only materialized table is bounded by the
    class count.  Oracle = two quantile_cont group-bys joined."""
    import numpy as np

    from raycdc.relational import group_quantiles

    base = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def old_snap(t: pa.Table) -> pa.Table:
        vc = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100)
        return pa.table(
            {
                "event_type": t["event_type"],
                "vc": pa.array(vc.astype(np.int64)),
            }
        )

    def new_snap(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        keep = eid % 7 != 0
        t = t.filter(pa.array(keep))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        vc = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100)
        vc = vc + np.where(eid % 3 == 0, 25, 0)
        return pa.table(
            {
                "event_type": t["event_type"],
                "vc": pa.array(vc.astype(np.int64)),
            }
        )

    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    qkw = dict(
        group_col="event_type",
        value_col="vc",
        qs=(0.5, 0.9),
        num_partitions=8,
    )
    qa = group_quantiles(
        base.map_batches(old_snap, **kw), aliases=("q50_old", "q90_old"), **qkw
    )
    qb = group_quantiles(
        base.map_batches(new_snap, **kw), aliases=("q50_new", "q90_new"), **qkw
    )
    import ray as _ray

    ta = pa.concat_tables(
        [t for t in _ray.get(qa.to_arrow_refs()) if t.num_rows]
    ).combine_chunks()
    tb = pa.concat_tables(
        [t for t in _ray.get(qb.to_arrow_refs()) if t.num_rows]
    ).combine_chunks()
    j = ta.join(tb, keys="event_type", join_type="inner")
    cols = {"event_type": j["event_type"]}
    vals = {
        c: j[c].to_numpy(zero_copy_only=False)
        for c in ("q50_old", "q90_old", "q50_new", "q90_new")
    }
    for c, v in vals.items():
        cols[c] = pa.array(np.floor(v * 1e6) / 1e6)
    cols["d50"] = pa.array(
        np.floor((vals["q50_new"] - vals["q50_old"]) * 1e6) / 1e6
    )
    cols["d90"] = pa.array(
        np.floor((vals["q90_new"] - vals["q90_old"]) * 1e6) / 1e6
    )
    return pa.table(cols)


SQL_DRIFT_REPORT = """
WITH old_snap AS (
    SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vc FROM events
), new_snap AS (
    SELECT event_type,
           CAST(floor(value * 100) AS BIGINT)
               + CASE WHEN event_id % 3 = 0 THEN 25 ELSE 0 END AS vc
    FROM events WHERE event_id % 7 <> 0
), a AS (
    SELECT event_type,
           quantile_cont(vc, 0.5) AS q50_old,
           quantile_cont(vc, 0.9) AS q90_old
    FROM old_snap GROUP BY event_type
), b AS (
    SELECT event_type,
           quantile_cont(vc, 0.5) AS q50_new,
           quantile_cont(vc, 0.9) AS q90_new
    FROM new_snap GROUP BY event_type
)
SELECT a.event_type,
       floor(q50_old * 1e6) / 1e6 AS q50_old,
       floor(q90_old * 1e6) / 1e6 AS q90_old,
       floor(q50_new * 1e6) / 1e6 AS q50_new,
       floor(q90_new * 1e6) / 1e6 AS q90_new,
       floor((q50_new - q50_old) * 1e6) / 1e6 AS d50,
       floor((q90_new - q90_old) * 1e6) / 1e6 AS d90
FROM a JOIN b ON a.event_type = b.event_type
"""


def q_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition on text hash, min doc_id per distinct
    text, over a corpus where every doc has one exact copy."""
    from raycdc.dedup import exact_dedup

    return exact_dedup(_corpus_with_exact_copies(sf_dir), num_partitions=32)


def q_dedup_exact_hash(sf_dir: str):
    """Exact dedup via 128-bit content identity — the 100 TB path: the
    exchange carries (h1, h2, id) only, losers broadcast once, corpus
    filtered streaming.  SAME oracle as dedup_exact (results identical
    short of a 2^-128 collision)."""
    from raycdc.dedup import exact_dedup

    return exact_dedup(
        _corpus_with_exact_copies(sf_dir), num_partitions=32, identity="hash128"
    )


SQL_DEDUP_EXACT = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET}, text FROM documents
)
SELECT min(doc_id) AS doc_id, text FROM corpus GROUP BY text
"""


def q_dedup_incremental(sf_dir: str):
    """First-seen-wins dedup ACROSS ingest batches: the duplicated corpus
    arrives in two batches (originals, then the re-crawl copies at
    id+offset); each batch is filtered against the persisted content-hash
    index lake (anti_join_lake, co-partitioned), deduped in-batch, and
    extends the index exactly-once.  Oracle: the winner per text is the
    min doc_id of the EARLIEST batch containing it (first-seen, then min
    id) — which a later batch carrying a smaller id must NOT displace."""
    from raycdc.dedup import incremental_dedup

    corpus = _corpus_with_exact_copies(sf_dir)
    idx = _scratch_path(sf_dir, "q_dedup_index")
    shutil.rmtree(idx, ignore_errors=True)

    def _batch(lo: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.less(t["doc_id"], _DUP_OFFSET)
            return t.filter(m if lo else pc.invert(m))

        return corpus.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    w1 = incremental_dedup(_batch(True), idx, batch_lsn=1, num_partitions=8)
    w2 = incremental_dedup(_batch(False), idx, batch_lsn=2, num_partitions=8)
    return w1.union(w2).select_columns(["doc_id", "text"])


SQL_DEDUP_INCREMENTAL = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET}, text FROM documents
),
ranked AS (
    SELECT doc_id, text, row_number() OVER (
        PARTITION BY text
        ORDER BY (CASE WHEN doc_id < {_DUP_OFFSET} THEN 0 ELSE 1 END), doc_id
    ) AS rn
    FROM corpus
)
SELECT doc_id, text FROM ranked WHERE rn = 1
"""


def q_dedup_minhash(sf_dir: str):
    """MinHash(128) + LSH(32×4) candidates, exact-Jaccard verified ≥ 0.8,
    over a corpus where every doc has a near copy (one appended token).
    The ORACLE computes ground-truth all-pairs Jaccard — so this checks
    LSH recall at the threshold, not just the plumbing.  The verify stage is
    fully distributed: the corpus is re-streamed as a shingle-index Dataset
    and joined per bucket — nothing is materialized on the driver."""
    from raycdc.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard_pairs,
    )

    ds = _corpus_with_near_copies(sf_dir)
    sigs = ds.map_batches(
        minhash_signatures, batch_format="pyarrow", zero_copy_batch=True
    )
    # distinct=False: the verify's first join pass buckets by hash(a) and
    # dedups in-group (globally correct there), saving one all-to-all
    pairs = lsh_candidate_pairs(sigs, bands=32, num_partitions=32, distinct=False)
    return verify_jaccard_pairs(
        pairs, _corpus_with_near_copies(sf_dir), threshold=0.8
    )


_SQL_SHINGLES = f"""
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET}, text || ' extradup' FROM documents
),
sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                   i -> string_split(text, ' ')[i] || '|' ||
                        string_split(text, ' ')[i+1] || '|' ||
                        string_split(text, ' ')[i+2]
               )
           ) AS s
    FROM corpus
    WHERE len(string_split(text, ' ')) >= 3
)
"""

SQL_DEDUP_MINHASH = f"""
WITH {_SQL_SHINGLES.strip()},
pairs AS (
    SELECT x.doc_id AS a, y.doc_id AS b,
           floor(
               CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE)
               * 1000000
           ) / 1000000 AS jaccard
    FROM sh x JOIN sh y ON x.doc_id < y.doc_id
)
SELECT a, b, jaccard FROM pairs WHERE jaccard >= 0.8
"""


def q_dedup_jaccard(sf_dir: str):
    """Exact n-gram Jaccard on a deterministic pair list (consecutive
    doc_ids) — the verification kernel, oracle-checked in isolation.

    Candidate pairs (id, id+1) are generated distributed (one map_batches
    over the corpus); the verify join's inner-join semantics drop any pair
    whose side has no 3-shingles, mirroring the oracle's join over its
    shingle CTE — no driver-side corpus read anywhere."""
    import numpy as np

    from raycdc.dedup import verify_jaccard_pairs

    corpus = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def consecutive_pairs(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern(t["text"], " ")).to_numpy(
            zero_copy_only=False
        )
        ids = t["doc_id"].to_numpy().astype(np.int64)
        a = ids[n_tok >= 3]
        return pa.table({"a": pa.array(a), "b": pa.array(a + 1)})

    pairs = corpus.map_batches(
        consecutive_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    return verify_jaccard_pairs(pairs, corpus, threshold=0.0)


SQL_DEDUP_JACCARD = """
WITH sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                   i -> string_split(text, ' ')[i] || '|' ||
                        string_split(text, ' ')[i+1] || '|' ||
                        string_split(text, ' ')[i+2]
               )
           ) AS s
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
)
SELECT x.doc_id AS a, y.doc_id AS b,
       floor(
           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE)
           * 1000000
       ) / 1000000 AS jaccard
FROM sh x JOIN sh y ON y.doc_id = x.doc_id + 1
"""


def _corpus_with_chain_copies(sf_dir: str) -> "ray.data.Dataset":
    """documents + TWO near copies per doc (one resp. two appended tokens)
    — the three variants of a doc form a near-dup CHAIN, so clustering must
    close transitively, not just pair up."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def dup(t: pa.Table) -> pa.Table:
        v1 = pa.table(
            {
                "doc_id": pc.add(t["doc_id"], _DUP_OFFSET),
                "text": pc.binary_join_element_wise(t["text"], " extradup", ""),
            }
        )
        v2 = pa.table(
            {
                "doc_id": pc.add(t["doc_id"], 2 * _DUP_OFFSET),
                "text": pc.binary_join_element_wise(
                    t["text"], " extradup extradup2", ""
                ),
            }
        )
        return pa.concat_tables([t.select(["doc_id", "text"]), v1, v2])

    return ds.map_batches(dup, batch_format="pyarrow", zero_copy_batch=True)


def _chain_components(sf_dir: str):
    """Shared head of the near-dedup queries: MinHash → LSH candidates →
    exact-Jaccard verify (≥ 0.8) → connected components over the planted
    3-variant chain corpus.  ONE definition so the oracled components query
    and the end-to-end survivors query can never silently diverge."""
    from raycdc.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard_pairs,
    )

    corpus = _corpus_with_chain_copies(sf_dir)
    sigs = corpus.map_batches(
        minhash_signatures, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = lsh_candidate_pairs(sigs, bands=32, num_partitions=32, distinct=False)
    edges = verify_jaccard_pairs(
        pairs, _corpus_with_chain_copies(sf_dir), threshold=0.8
    )
    return connected_components(edges, num_partitions=32)


def q_dedup_components(sf_dir: str):
    """Near-dup CLUSTERS: MinHash+LSH candidates → exact-Jaccard verify
    (≥ 0.8) → distributed connected components (min-label propagation,
    :func:`raycdc.dedup.connected_components`) — the transitive-closure step
    real dedup pipelines run after pair generation, so A~B and B~C collapse
    A,B,C into ONE group even when A~C alone misses the threshold.  The
    corpus plants a 3-variant near-dup chain per document; the ORACLE
    recomputes the ground-truth pair graph via all-pairs SQL Jaccard and
    closes it with a recursive CTE — checking LSH recall, the verify kernel,
    and the component labeling end-to-end."""
    return _chain_components(sf_dir)


_SQL_CHAIN_SHINGLES = f"""
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET}, text || ' extradup' FROM documents
    UNION ALL
    SELECT doc_id + {2 * _DUP_OFFSET}, text || ' extradup extradup2'
    FROM documents
),
sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                   i -> string_split(text, ' ')[i] || '|' ||
                        string_split(text, ' ')[i+1] || '|' ||
                        string_split(text, ' ')[i+2]
               )
           ) AS s
    FROM corpus
    WHERE len(string_split(text, ' ')) >= 3
)
"""

# ground-truth pair graph + transitive closure, shared by both near-dedup
# oracles (a fix to the graph definition must hit both or neither)
_SQL_CHAIN_COMPONENT_CTES = f"""
{_SQL_CHAIN_SHINGLES.strip()},
jp AS (
    SELECT x.doc_id AS a, y.doc_id AS b
    FROM sh x JOIN sh y ON x.doc_id < y.doc_id
    WHERE floor(
              CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE)
              * 1000000
          ) / 1000000 >= 0.8
),
und AS (SELECT a, b FROM jp UNION SELECT b AS a, a AS b FROM jp),
reach AS (
    SELECT a AS node, b AS dst FROM und
    UNION
    SELECT r.node, u.b AS dst FROM reach r JOIN und u ON u.a = r.dst
),
comp AS (
    SELECT node, least(node, min(dst)) AS component
    FROM reach GROUP BY node
)
"""

SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {_SQL_CHAIN_COMPONENT_CTES.strip()}
SELECT node, component FROM comp
"""


def q_dedup_near_full(sf_dir: str):
    """The COMPLETE near-dedup pipeline, corpus in → surviving doc ids out:
    MinHash → LSH candidates → exact-Jaccard verify → connected components
    → :func:`raycdc.dedup.dedup_by_components` (one representative per
    cluster, non-duplicated docs pass through, corpus never shuffles).
    Oracle: recursive-CTE components over the ground-truth pair graph,
    survivors = docs that are not a non-minimum member of any component."""
    from raycdc.dedup import dedup_by_components

    comps = _chain_components(sf_dir)
    survivors = dedup_by_components(
        _corpus_with_chain_copies(sf_dir), comps, id_col="doc_id"
    )
    return survivors.select_columns(["doc_id"])


SQL_DEDUP_NEAR_FULL = f"""
WITH RECURSIVE {_SQL_CHAIN_COMPONENT_CTES.strip()}
SELECT c.doc_id FROM corpus c
WHERE c.doc_id NOT IN (SELECT node FROM comp WHERE component <> node)
"""


def q_dedup_incr_near(sf_dir: str):
    """Two-batch INCREMENTAL near-dedup
    (:func:`raycdc.dedup.incremental_near_dedup`) under one oracle: batch 1
    is the base corpus (in-batch chain dedups the planted natural
    near-dups, survivors index their signatures + LSH band rows); batch 2
    is a one-token-suffix variant of every base doc, which must dedup
    against the INDEX — candidates via the co-partitioned band-lake probe,
    matches via signature-estimated Jaccard.  Returns the union of both
    batches' winner ids.

    Threshold 0.6 puts every decided pair ≥7σ from the estimator's noise
    (the corpus's pair-similarity distribution is bimodal: <0.1 or ≥0.89),
    so the signature-estimate decisions coincide deterministically with
    the ORACLE's exact Jaccard — a two-phase recursive CTE in which phase
    2's min-labeling encodes first-seen-wins for free (indexed ids sort
    below variant ids, so any component touching the index has a
    sub-offset label and no variant node can be its own component)."""
    import os
    import tempfile

    from raycdc.dedup import incremental_near_dedup
    from raycdc.storage import get_storage

    idx = _scratch_path(sf_dir, "incr_near_idx")
    get_storage(idx).remove_tree(idx)

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    w1 = incremental_near_dedup(
        docs, idx, batch_lsn=1, threshold=0.6, num_partitions=16
    )

    def to_variants(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(t["doc_id"], _DUP_OFFSET),
                "text": pc.binary_join_element_wise(t["text"], " extradup", ""),
            }
        )

    batch2 = docs.map_batches(
        to_variants, batch_format="pyarrow", zero_copy_batch=True
    )
    w2 = incremental_near_dedup(
        batch2, idx, batch_lsn=2, threshold=0.6, num_partitions=16
    )
    return w1.select_columns(["doc_id"]).union(w2.select_columns(["doc_id"]))


def _incr_shingles(src: str) -> str:
    return f"""
    SELECT doc_id,
           list_distinct(
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                   i -> string_split(text, ' ')[i] || '|' ||
                        string_split(text, ' ')[i+1] || '|' ||
                        string_split(text, ' ')[i+2]
               )
           ) AS s
    FROM {src}
    WHERE len(string_split(text, ' ')) >= 3
"""


_SQL_INCR_JAC = """floor(
              CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE)
              * 1000000
          ) / 1000000 >= 0.6"""

SQL_DEDUP_INCR_NEAR = f"""
WITH RECURSIVE
sh1 AS ({_incr_shingles("documents").strip()}),
jp1 AS (
    SELECT x.doc_id AS a, y.doc_id AS b
    FROM sh1 x JOIN sh1 y ON x.doc_id < y.doc_id
    WHERE {_SQL_INCR_JAC}
),
und1 AS (SELECT a, b FROM jp1 UNION SELECT b AS a, a AS b FROM jp1),
reach1 AS (
    SELECT a AS node, b AS dst FROM und1
    UNION
    SELECT r.node, u.b AS dst FROM reach1 r JOIN und1 u ON u.a = r.dst
),
comp1 AS (
    SELECT node, least(node, min(dst)) AS component
    FROM reach1 GROUP BY node
),
s1 AS (
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT node FROM comp1 WHERE component <> node)
),
var AS (
    SELECT doc_id + {_DUP_OFFSET} AS doc_id, text || ' extradup' AS text
    FROM documents
),
sh2v AS ({_incr_shingles("var").strip()}),
sh2 AS (
    SELECT * FROM sh2v
    UNION ALL
    SELECT sh1.* FROM sh1 JOIN s1 USING (doc_id)
),
jp2 AS (
    SELECT x.doc_id AS a, y.doc_id AS b
    FROM sh2 x JOIN sh2 y ON x.doc_id < y.doc_id
    WHERE y.doc_id >= {_DUP_OFFSET} AND {_SQL_INCR_JAC}
),
und2 AS (SELECT a, b FROM jp2 UNION SELECT b AS a, a AS b FROM jp2),
reach2 AS (
    SELECT a AS node, b AS dst FROM und2
    UNION
    SELECT r.node, u.b AS dst FROM reach2 r JOIN und2 u ON u.a = r.dst
),
comp2 AS (
    SELECT node, least(node, min(dst)) AS component
    FROM reach2 GROUP BY node
)
SELECT doc_id FROM s1
UNION ALL
SELECT doc_id FROM var
WHERE doc_id NOT IN (SELECT node FROM comp2 WHERE component <> node)
"""


def _conv_corpus_with_chain_copies(sf_dir: str) -> "ray.data.Dataset":
    """Transcript corpus for conversation-level near-dedup: LWW final
    state → assembled transcripts → ``(doc_id = int(conv_id[1:]),
    text = transcript)`` plus the planted 3-variant near-dup chain
    (same offsets/suffixes as :func:`_corpus_with_chain_copies`).

    The corpus is STAGED to parquet once and read back: the dedup chain
    consumes it three times (signatures, verify, survivor filter) and a
    lazy Dataset would re-run replay+assembly per consumption (measured
    18 s → staged ~12 s at sf0.1).  This mirrors the 10^10-event shape,
    where the corpus is read from the incrementally maintained
    transcript-view lake (:func:`raycdc.engine.maintain_transcripts`)."""
    import os
    import tempfile

    import ray

    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.relational import assemble_group_text
    from raycdc.schema import TableSpec
    from raycdc.storage import get_storage

    stage = _scratch_path(sf_dir, "conv_corpus")

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "turn_idx", "text"])
    convs = assemble_group_text(
        final,
        group_col="conv_id",
        order_col="turn_idx",
        text_col="text",
        sep="\n",
        role_col=None,
        num_partitions=16,
    )

    def to_docs(t: pa.Table) -> pa.Table:
        ids = pc.cast(
            pc.utf8_slice_codeunits(t["conv_id"], 1, 2**30), pa.int64()
        )
        base = pa.table({"doc_id": ids, "text": t["transcript"]})
        v1 = pa.table(
            {
                "doc_id": pc.add(ids, _DUP_OFFSET),
                "text": pc.binary_join_element_wise(
                    t["transcript"], " extradup", ""
                ),
            }
        )
        v2 = pa.table(
            {
                "doc_id": pc.add(ids, 2 * _DUP_OFFSET),
                "text": pc.binary_join_element_wise(
                    t["transcript"], " extradup extradup2", ""
                ),
            }
        )
        return pa.concat_tables([base, v1, v2])

    docs = convs.map_batches(to_docs, batch_format="pyarrow", zero_copy_batch=True)
    # stage dir is owned by this builder: replace any prior content so a
    # re-run (or a different tree at the same sf name) never double-reads
    get_storage(stage).remove_tree(stage)
    docs.write_parquet(stage)
    return ray.data.read_parquet(stage)


def q_conv_near_dedup(sf_dir: str):
    """Conversation-level near-dedup, transcripts in → surviving conv ids
    out: the full MinHash → LSH → exact-Jaccard verify (≥ 0.8) →
    connected-components → representative chain of ⊕dedup_near_full run
    over ASSEMBLED TRANSCRIPTS (templated bot dialogs and mirrored
    conversations collapse to one representative).  The ORACLE rebuilds
    the transcripts from the LWW state with string_agg, recomputes the
    ground-truth pair graph via all-pairs SQL Jaccard, and closes it with
    a recursive CTE.

    Scale note: the corpus Dataset is consumed three times (signatures,
    verify, survivor filter) and lazily re-executes the replay+assembly
    each time — fine at gate scale, but at 10^10 events the corpus should
    be READ from the incrementally maintained transcript-view lake
    (:func:`raycdc.engine.maintain_transcripts`), which amortizes the
    assembly across refreshes; the dedup chain itself is unchanged."""
    from raycdc.dedup import (
        connected_components,
        dedup_by_components,
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard_pairs,
    )

    corpus = _conv_corpus_with_chain_copies(sf_dir)
    sigs = corpus.map_batches(
        minhash_signatures, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = lsh_candidate_pairs(sigs, bands=32, num_partitions=32, distinct=False)
    # reuse the staged corpus: a parquet read-back re-reads cheaply per
    # consumption (a second builder call would re-stage over live files)
    edges = verify_jaccard_pairs(pairs, corpus, threshold=0.8)
    comps = connected_components(edges, num_partitions=32)
    survivors = dedup_by_components(corpus, comps, id_col="doc_id")
    return survivors.select_columns(["doc_id"])


def _sql_conv_near_dedup() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH RECURSIVE {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT conv_id, turn_idx, text
    FROM ranked WHERE rn = 1 AND op <> 'delete'
), tr AS (
    SELECT CAST(substr(conv_id, 2) AS BIGINT) AS doc_id,
           string_agg(text, chr(10) ORDER BY turn_idx) AS text
    FROM final GROUP BY conv_id
),
corpus AS (
    SELECT doc_id, text FROM tr
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET}, text || ' extradup' FROM tr
    UNION ALL
    SELECT doc_id + {2 * _DUP_OFFSET}, text || ' extradup extradup2' FROM tr
),
sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                   i -> string_split(text, ' ')[i] || '|' ||
                        string_split(text, ' ')[i+1] || '|' ||
                        string_split(text, ' ')[i+2]
               )
           ) AS s
    FROM corpus
    WHERE len(string_split(text, ' ')) >= 3
),
jp AS (
    SELECT x.doc_id AS a, y.doc_id AS b
    FROM sh x JOIN sh y ON x.doc_id < y.doc_id
    WHERE floor(
              CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE)
              * 1000000
          ) / 1000000 >= 0.8
),
und AS (SELECT a, b FROM jp UNION SELECT b AS a, a AS b FROM jp),
reach AS (
    SELECT a AS node, b AS dst FROM und
    UNION
    SELECT r.node, u.b AS dst FROM reach r JOIN und u ON u.a = r.dst
),
comp AS (
    SELECT node, least(node, min(dst)) AS component
    FROM reach GROUP BY node
)
SELECT c.doc_id FROM corpus c
WHERE c.doc_id NOT IN (SELECT node FROM comp WHERE component <> node)
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: every document sharing a distinct 3-token
    shingle with the benchmark split (docs with ``doc_id % 50 == 0`` stand
    in for an eval set) is flagged with its distinct-overlap count.  The
    benchmark collapses to a broadcast sorted hash array (one ``ray.put``);
    the corpus streams through one shuffle-free ``map_batches`` membership
    pass.  The ORACLE recomputes the overlap as an exact SQL shingle join."""
    from raycdc.dedup import contamination_overlap

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    def bench_split(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 50 == 0))

    bench = docs.map_batches(
        bench_split, batch_format="pyarrow", zero_copy_batch=True
    )
    return contamination_overlap(docs, bench)


SQL_DECONTAMINATE = """
WITH sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                   i -> string_split(text, ' ')[i] || '|' ||
                        string_split(text, ' ')[i+1] || '|' ||
                        string_split(text, ' ')[i+2]
               )
           ) AS s
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
),
cs AS (SELECT doc_id, unnest(s) AS g FROM sh),
bench AS (SELECT DISTINCT g FROM cs WHERE doc_id % 50 = 0)
SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
FROM cs c JOIN bench b ON c.g = b.g
GROUP BY c.doc_id
"""


def q_crossdoc_repetition(sf_dir: str):
    """Cross-document repetition score: per doc, the fraction of its
    distinct 3-token shingles that occur in at least one OTHER document —
    the corpus-global boilerplate/template signal (the within-doc
    complement is ⊕text_repetition).  One shingle-bucketed exchange with
    in-bucket run-length counting, then a per-doc partial-sum exchange;
    the ORACLE recomputes it as an exact SQL shingle join."""
    from raycdc.dedup import cross_doc_dup_fraction

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return cross_doc_dup_fraction(docs, num_partitions=32)


SQL_CROSSDOC_REPETITION = """
WITH sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                   i -> string_split(text, ' ')[i] || '|' ||
                        string_split(text, ' ')[i+1] || '|' ||
                        string_split(text, ' ')[i+2]
               )
           ) AS s
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
),
cs AS (SELECT doc_id, unnest(s) AS g FROM sh),
cnt AS (SELECT g, count(DISTINCT doc_id) AS ndocs FROM cs GROUP BY g)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN t.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       floor(
           CAST(sum(CASE WHEN t.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) * 1000000
       ) / 1000000 AS dup_frac
FROM cs c JOIN cnt t ON c.g = t.g
GROUP BY c.doc_id
"""


def q_dup_spans(sf_dir: str):
    """Duplicated-substring-span stats: per doc, the token coverage and
    longest merged run of 3-gram shingles that occur in ≥ 2 documents —
    the positional exact-substring-dedup signal (vs ⊕crossdoc_repetition's
    count-based fraction).  Two bucketed exchanges of fixed-width instance
    rows (text never shuffles); the ORACLE recomputes coverage with SQL
    window-function island detection."""
    from raycdc.dedup import dup_span_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dup_span_stats(docs, num_partitions=32)


SQL_DUP_SPANS = """
WITH inst AS (
    SELECT doc_id, r['pos'] AS pos, r['g'] AS g
    FROM (
        SELECT doc_id,
               unnest(
                   list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                       i -> struct_pack(
                           pos := i,
                           g := string_split(text, ' ')[i] || '|' ||
                                string_split(text, ' ')[i+1] || '|' ||
                                string_split(text, ' ')[i+2]
                       )
                   )
               ) AS r
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    )
),
dupg AS (SELECT g FROM inst GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
d AS (SELECT i.doc_id, i.pos FROM inst i JOIN dupg USING (g)),
seq AS (
    SELECT doc_id, pos,
           pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS gap
    FROM d
),
runs AS (
    SELECT doc_id, pos,
           sum(CASE WHEN gap IS NULL OR gap > 3 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
    FROM seq
),
runagg AS (
    SELECT doc_id, run_id, max(pos) - min(pos) + 3 AS run_len
    FROM runs GROUP BY doc_id, run_id
),
perdoc AS (
    SELECT doc_id,
           CAST(sum(run_len) AS BIGINT) AS dup_tokens,
           CAST(max(run_len) AS BIGINT) AS max_dup_span
    FROM runagg GROUP BY doc_id
)
SELECT n.doc_id,
       CAST(len(string_split(n.text, ' ')) AS BIGINT) AS n_tokens,
       COALESCE(p.dup_tokens, 0) AS dup_tokens,
       floor(
           CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
           / len(string_split(n.text, ' ')) * 1000000
       ) / 1000000 AS dup_frac,
       COALESCE(p.max_dup_span, 0) AS max_dup_span
FROM documents n LEFT JOIN perdoc p USING (doc_id)
"""


def q_cut_dup_spans(sf_dir: str):
    """Exact-substring-dedup TRANSFORM: delete every token covered by a
    3-gram occurring in ≥ 2 documents and re-join the survivors
    (:func:`raycdc.dedup.cut_dup_spans` — runs delivered to the corpus
    via object-store chunk probes, text never shuffles).  Oracle
    recomputes the coverage as a positional anti-join + ordered
    string_agg."""
    from raycdc.dedup import cut_dup_spans

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return cut_dup_spans(docs, num_partitions=32)


SQL_CUT_DUP_SPANS = """
WITH inst AS (
    SELECT doc_id, r['pos'] AS pos, r['g'] AS g
    FROM (
        SELECT doc_id,
               unnest(
                   list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                       i -> struct_pack(
                           pos := i,
                           g := string_split(text, ' ')[i] || '|' ||
                                string_split(text, ' ')[i+1] || '|' ||
                                string_split(text, ' ')[i+2]
                       )
                   )
               ) AS r
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    )
),
dupg AS (SELECT g FROM inst GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
d AS (SELECT i.doc_id, i.pos FROM inst i JOIN dupg USING (g)),
cov AS (SELECT DISTINCT doc_id, pos + o AS t FROM d, unnest([0, 1, 2]) AS u(o)),
toks AS (
    SELECT doc_id, r['ti'] AS ti, r['tok'] AS tok
    FROM (
        SELECT doc_id,
               unnest(
                   list_transform(
                       range(1, len(string_split(text, ' ')) + 1),
                       i -> struct_pack(ti := i, tok := string_split(text, ' ')[i])
                   )
               ) AS r
        FROM documents
    )
),
kept AS (
    SELECT k.doc_id, k.ti, k.tok
    FROM toks k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.t = k.ti
    WHERE c.t IS NULL
),
agg AS (
    SELECT doc_id,
           string_agg(tok, ' ' ORDER BY ti) AS text,
           count(*) AS n_kept
    FROM kept GROUP BY doc_id
)
SELECT n.doc_id,
       COALESCE(a.text, '') AS text,
       CAST(len(string_split(n.text, ' ')) - COALESCE(a.n_kept, 0) AS BIGINT)
           AS n_removed
FROM documents n LEFT JOIN agg a USING (doc_id)
"""


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup candidate pairs, Hamming ≤ 3.  ORACLE-EXACT since
    round 4: every stage is integer arithmetic DuckDB can replay — FNV-1a
    token hashes as a recursive HUGEINT fold over (ASCII) characters, the
    2-token shingle polynomial, per-doc distinct shingles, the 64-bit
    sign-vote signature via an exact powers-of-two table (NEVER ``**`` —
    DuckDB's power returns DOUBLE), the 4×16-bit chunk banding pigeonhole,
    and bit_count(xor) for the final Hamming filter."""
    from raycdc.dedup import simhash_candidate_pairs, simhash_signatures

    ds = _corpus_with_exact_copies(sf_dir)
    sigs = ds.map_batches(
        simhash_signatures, batch_format="pyarrow", zero_copy_batch=True
    )
    return simhash_candidate_pairs(sigs, max_hamming=3, num_partitions=32)


SQL_DEDUP_SIMHASH = f"""
WITH RECURSIVE
pw AS (
    SELECT 0 AS b, CAST(1 AS HUGEINT) AS p
    UNION ALL
    SELECT b + 1, p * 2 FROM pw WHERE b < 63
),
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {{dup_offset}} AS doc_id, text FROM documents
),
toks AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS idx
    FROM corpus
),
fnv AS (
    SELECT doc_id, idx, tok, 1 AS pos,
           CAST(14695981039346656037 AS HUGEINT) AS h
    FROM toks
    UNION ALL
    SELECT doc_id, idx, tok, pos + 1,
           ((xor(h, CAST(ord(substr(tok, pos, 1)) AS HUGEINT)) * 1099511628211)
            % 18446744073709551616)
    FROM fnv WHERE pos <= length(tok)
),
tok_h AS (SELECT doc_id, idx, h FROM fnv WHERE pos = length(tok) + 1),
shingles AS (
    SELECT DISTINCT a.doc_id,
           ((a.h * 1099511628211) % 18446744073709551616 + b.h)
             % 18446744073709551616 AS sh
    FROM tok_h a JOIN tok_h b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
),
votes AS (
    SELECT doc_id, pw.b,
           SUM(CASE WHEN (sh // pw.p) % 2 = 1 THEN 1 ELSE -1 END) AS v
    FROM shingles CROSS JOIN pw
    GROUP BY doc_id, pw.b
),
sigs AS (
    SELECT v.doc_id,
           CAST(SUM(CASE WHEN v.v > 0 THEN pw.p ELSE 0 END) AS HUGEINT) AS sig
    FROM votes v JOIN pw ON pw.b = v.b
    GROUP BY v.doc_id
),
pairs AS (
    SELECT a.doc_id AS a, b.doc_id AS b,
           bit_count(xor(
               CAST(CASE WHEN a.sig >= 9223372036854775808
                    THEN a.sig - 18446744073709551616 ELSE a.sig END AS BIGINT),
               CAST(CASE WHEN b.sig >= 9223372036854775808
                    THEN b.sig - 18446744073709551616 ELSE b.sig END AS BIGINT)
           )) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE ((a.sig % 65536 = b.sig % 65536)
        OR ((a.sig // 65536) % 65536 = (b.sig // 65536) % 65536)
        OR ((a.sig // 4294967296) % 65536 = (b.sig // 4294967296) % 65536)
        OR ((a.sig // 281474976710656) % 65536
            = (b.sig // 281474976710656) % 65536))
)
SELECT a, b, CAST(hamming AS BIGINT) AS hamming FROM pairs WHERE hamming <= 3
""".replace("{dup_offset}", str(_DUP_OFFSET))


# ---------------------------------------------------------------------------
# similarity search (embeddings table)

_N_QUERIES = 5
_TOP_K = 5


def _query_matrix(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], _N_QUERIES))
    t = t.sort_by("vec_id")
    from raycdc.similarity import _to_matrix

    return _to_matrix(t["embedding"]), t["vec_id"].to_numpy()


def q_sim_knn(sf_dir: str):
    """Brute-force cosine top-k (k=5) for the first 5 vectors as queries.
    Scores are excluded from the output (rank is deterministic; float
    formatting differs between engines)."""
    from raycdc.similarity import knn_brute_force

    q, qids = _query_matrix(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = knn_brute_force(ds, q, qids, k=_TOP_K)
    return out.select_columns(["q_id", "vec_id", "rank"])


SQL_SIM_KNN = f"""
WITH q AS (
    SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}
),
s AS (
    SELECT q.q_id, e.vec_id,
           list_cosine_similarity(q.qe, e.embedding) AS sc
    FROM q CROSS JOIN embeddings e
),
r AS (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, vec_id ASC) AS rank
    FROM s
)
SELECT q_id, vec_id, rank FROM r WHERE rank <= {_TOP_K}
"""


def q_sim_knn_lsh(sf_dir: str):
    """Random-hyperplane LSH approximate top-k (rows-only; recall vs the
    brute-force baseline is asserted in pytest)."""
    from raycdc.similarity import knn_lsh

    q, qids = _query_matrix(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = knn_lsh(ds, q, qids, k=_TOP_K, nbits=4, num_partitions=16)
    return out.select_columns(["q_id", "vec_id", "rank"])


def q_sim_knn_ivf(sf_dir: str):
    """IVF approximate top-k (coarse k-means quantizer, nprobe lists;
    rows-only — recall vs brute force measured in pytest)."""
    from raycdc.similarity import knn_ivf

    q, qids = _query_matrix(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = knn_ivf(ds, q, qids, k=_TOP_K, n_lists=8, nprobe=3, num_partitions=16)
    return out.select_columns(["q_id", "vec_id", "rank"])


def q_sim_knn_ivfpq(sf_dir: str):
    """IVF-PQ approximate top-k (product-quantized codes in the exchange +
    exact distributed re-rank; rows-only — recall >= IVF at equal probe
    cost pinned in tests/test_ivfpq.py)."""
    from raycdc.similarity import knn_ivfpq

    q, qids = _query_matrix(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = knn_ivfpq(
        ds, q, qids, k=_TOP_K, n_lists=8, nprobe=3, m_sub=4, num_partitions=16
    )
    return out.select_columns(["q_id", "vec_id", "rank"])


def q_sim_knn_index(sf_dir: str):
    """CDC × ANN composite: a vector LAKE built by exactly-once replay of
    an embeddings changelog (head inserts, then a tail whose first rows
    are LWW re-upserts), an IVF-PQ index lake incrementally maintained as
    a VIEW of it (:func:`raycdc.similarity.maintain_vector_index` — the
    second refresh feeds only the change), and top-k served from the
    index (:func:`raycdc.similarity.knn_over_index`).  With nprobe =
    n_lists and rerank ≥ corpus the search is EXACT, so the brute-force
    cosine SQL oracle pins the whole composite hash-exactly."""
    import pyarrow.parquet as pq

    from raycdc.engine import replay
    from raycdc.schema import TableSpec
    from raycdc.similarity import knn_over_index, maintain_vector_index

    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    n = emb.num_rows

    def seg(tbl: pa.Table, lsn0: int) -> pa.Table:
        rows = tbl.num_rows
        import numpy as np

        return pa.table(
            {
                "vec_id": tbl["vec_id"],
                "embedding": tbl["embedding"],
                "ts": pa.array(
                    np.full(rows, 1_600_000_000_000_000, np.int64)
                    + np.arange(lsn0, lsn0 + rows, dtype=np.int64),
                    pa.timestamp("us"),
                ),
                "op": pa.array(["insert"] * rows),
                "lsn": pa.array(np.arange(lsn0, lsn0 + rows, dtype=np.int64)),
            }
        )

    spec = TableSpec(
        name="vectors",
        schema=pa.schema(
            [
                pa.field("vec_id", pa.int64()),
                pa.field("embedding", emb.schema.field("embedding").type),
                pa.field("ts", pa.timestamp("us")),
            ]
        ),
        key_cols=("vec_id",),
        version_cols=("ts", "lsn"),
        partition_key="vec_id",
        num_partitions=8,
        sort_cols=("vec_id",),
    )
    src = _scratch_path(sf_dir, "vec_lake")
    idx = _scratch_path(sf_dir, "ann_index")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(idx, ignore_errors=True)
    head, tail = emb.slice(0, n // 2), emb.slice(n // 2)
    replay(ray.data.from_arrow(seg(head, 0)), src, spec)
    maintain_vector_index(
        src, idx, n_lists=8, m_sub=4, spec=spec, num_partitions=8
    )
    # tail segment re-upserts the first 50 head vectors (same value, newer
    # version — the LWW update path) before the remaining inserts
    upd = pa.concat_tables([head.slice(0, 50), tail])
    replay(ray.data.from_arrow(seg(upd, n)), src, spec)
    maintain_vector_index(
        src, idx, n_lists=8, m_sub=4, spec=spec, num_partitions=8
    )
    q, qids = _query_matrix(sf_dir)
    out = knn_over_index(
        idx, src, q, qids, k=_TOP_K, nprobe=8, rerank=n + 64, spec=spec
    )
    return out.select_columns(["q_id", "vec_id", "rank"])


def q_sim_knn_graph(sf_dir: str):
    """NSW graph ANN (blocked per-list adjacency build + lock-step beam
    search; rows-only — recall-per-scanned-vector vs knn_ivf is pinned in
    tests/test_knn_graph.py)."""
    from raycdc.similarity import knn_graph

    q, qids = _query_matrix(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = knn_graph(
        ds, q, qids, k=_TOP_K, n_lists=8, nprobe=3, degree=8, beam=16,
        num_partitions=16,
    )
    return out.select_columns(["q_id", "vec_id", "rank"])


def _embeddings_with_copies(sf_dir: str) -> "ray.data.Dataset":
    """embeddings + one slightly-perturbed near-copy per vector (the base
    vectors are near-orthogonal, so every near-dup is constructed)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def with_copies(t: pa.Table) -> pa.Table:
        import numpy as np

        from raycdc.similarity import _to_matrix

        m = _to_matrix(t["embedding"])
        perturbed = m * 1.01 + 0.001  # cosine ≈ 0.9999 to the original
        copy = pa.table(
            {
                "vec_id": pc.add(t["vec_id"], _DUP_OFFSET),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(perturbed.reshape(-1).astype(np.float32)), m.shape[1]
                ),
            }
        )
        base = pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1).astype(np.float32)), m.shape[1]
                ),
            }
        )
        return pa.concat_tables([base, copy])

    return ds.map_batches(with_copies, batch_format="pyarrow", zero_copy_batch=True)


def q_embed_near_dup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs within LSH buckets (rows-only;
    the base embeddings are near-orthogonal random vectors, so near-dups are
    constructed: each vector gets one slightly-perturbed copy)."""
    from raycdc.similarity import embedding_near_dup_pairs

    corpus = _embeddings_with_copies(sf_dir)
    return embedding_near_dup_pairs(corpus, threshold=0.99, nbits=4, num_partitions=16)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup over embeddings with one perturbed
    near-copy planted per vector: learned k-means clusters confine the
    pairwise cosine compare, transitive groups collapse to their min-id
    representative via connected components + the shared anti-join.
    Rows-only (k-means isn't SQL-expressible); the chain/pass-through
    semantics are pinned by pytest."""
    from raycdc.similarity import semantic_dedup

    corpus = _embeddings_with_copies(sf_dir)
    out = semantic_dedup(
        corpus, threshold=0.99, n_clusters=16, num_partitions=16
    )
    return out.select_columns(["vec_id"])


# ---------------------------------------------------------------------------
# deterministic sampling / splitting


def q_sample_events(sf_dir: str):
    """Deterministic 10% hash sample of events — a pure streaming filter
    whose membership any engine can recompute (Knuth multiplicative hash on
    the integer key)."""
    from raycdc.ops import hash_sample

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    return ds.map_batches(
        lambda t: hash_sample(t, "event_id", 0.10),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_SAMPLE_EVENTS = """
SELECT event_id, user_id, event_type
FROM events
WHERE ((event_id * 2654435761) % 4294967296) * 10000 // 4294967296 < 1000
"""


def q_split_events(sf_dir: str):
    """Leakage-safe 80/10/10 split keyed on user_id: a user's events all
    land in one split, deterministically, forever."""
    from raycdc.ops import train_split

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    return ds.map_batches(
        lambda t: train_split(t, "user_id"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_SPLIT_EVENTS = """
WITH b AS (
    SELECT event_id, user_id,
           ((user_id * 2654435761) % 4294967296) * 10000 // 4294967296 AS bucket
    FROM events
)
SELECT event_id, user_id,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


# ---------------------------------------------------------------------------
# schema evolution under the oracle gate


def q_cdc_evolve(sf_dir: str):
    """Declarative schema evolution end-to-end: odd-lsn changelog rows carry
    an additive ``model`` column; the merged state must expose it for every
    key whose LWW winner was an evolved row and null otherwise, with
    ``turn_idx`` widened int32→int64 across the heterogeneous segments."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.schema import TableSpec

    ds = changelog_from_events(sf_dir)

    def evolve_half(t: pa.Table) -> pa.Table:
        import numpy as np

        lsn = t["lsn"].to_numpy(zero_copy_only=False)
        odd = (lsn % 2).astype(bool)
        model = pc.if_else(
            pa.array(odd), pa.scalar("m1"), pa.scalar(None, pa.string())
        )
        t = t.append_column("model", model)
        return t.set_column(
            t.schema.get_field_index("turn_idx"),
            "turn_idx",
            pc.cast(t["turn_idx"], pa.int64()),
        )

    out = merged_state(
        ds.map_batches(evolve_half, batch_format="pyarrow", zero_copy_batch=True),
        TableSpec(num_partitions=16),
    )
    return out.select_columns(["conv_id", "turn_idx", "text", "model"])


def _sql_cdc_evolve() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
)
SELECT conv_id,
       CAST(turn_idx AS BIGINT) AS turn_idx,
       text,
       CASE WHEN lsn % 2 = 1 THEN 'm1' ELSE NULL END AS model
FROM ranked
WHERE rn = 1 AND op <> 'delete'
"""


# ---------------------------------------------------------------------------
# relational: broadcast join, sessionization, pre-aggregated rollup


def q_join_orders_customer(sf_dir: str):
    """Broadcast hash join: orders (probe, streamed) × customer (build,
    ray.put once) — the small-side-broadcast-instead-of-shuffle pattern."""
    import pyarrow.parquet as pq

    from raycdc.relational import broadcast_join

    build = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def rename_key(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["o_orderkey", "c_custkey", "o_totalprice"]
        )

    ds = ds.map_batches(rename_key, batch_format="pyarrow", zero_copy_batch=True)
    return broadcast_join(ds, build, "c_custkey", ["c_name", "c_nationkey"])


SQL_JOIN_ORDERS_CUSTOMER = """
SELECT o.o_orderkey,
       o.o_custkey AS c_custkey,
       o.o_totalprice,
       c.c_name,
       c.c_nationkey
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


def q_join_shuffle(sf_dir: str):
    """Co-partitioned (shuffle) join of orders × customer — the both-sides-
    large path; must produce the identical result to the broadcast plan
    (same oracle)."""
    from raycdc.relational import copartition_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey", "o_totalprice"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    out = copartition_join(orders, customer, on=["c_custkey"], num_partitions=16)
    return out.select_columns(
        ["o_orderkey", "c_custkey", "o_totalprice", "c_name", "c_nationkey"]
    )


def q_join_full_outer(sf_dir: str):
    """FULL OUTER co-partitioned join: even-keyed customers × a per-customer
    order rollup (pre_aggregate, cents-integer sums).  Both exclusive sides
    are non-empty (odd-custkey orders have no customer row here; customers
    without orders have no rollup row); absent-side columns are coalesced
    to ''/0 so the oracle compare is dtype-stable."""
    import numpy as np

    from raycdc.relational import copartition_join, pre_aggregate

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def even_only(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(k % 2 == 0))

    cust = cust.map_batches(even_only, batch_format="pyarrow", zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "cents": pa.array(np.floor(p * 100).astype(np.int64)),
            }
        )

    rollup = pre_aggregate(
        orders.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        key_cols=["c_custkey"],
        sum_cols=["cents"],
        count_alias="n_orders",
        num_partitions=16,
    )
    out = copartition_join(
        cust, rollup, on=["c_custkey"], join_type="full_outer", num_partitions=16
    )

    def coalesce(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"].cast(pa.int64()),
                "c_name": pc.fill_null(t["c_name"], ""),
                "cents": pc.fill_null(t["cents"], 0).cast(pa.int64()),
                "n_orders": pc.fill_null(t["n_orders"], 0).cast(pa.int64()),
            }
        )

    return out.map_batches(coalesce, batch_format="pyarrow", zero_copy_batch=True)


SQL_JOIN_FULL_OUTER = """
WITH c AS (
    SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
),
o AS (
    SELECT o_custkey,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT coalesce(c.c_custkey, o.o_custkey) AS c_custkey,
       coalesce(c.c_name, '') AS c_name,
       coalesce(o.cents, 0) AS cents,
       coalesce(o.n_orders, 0) AS n_orders
FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
"""


def q_pivot_user_events(sf_dir: str):
    """Pivot-to-wide: per user one row with cents summed per event type
    (click/purchase/view) + total event count — a projection feeding the
    two-phase pre_aggregate (map-side combine, ONE bucketed exchange;
    integer cents so distributed float addition order cannot drift)."""
    import numpy as np

    from raycdc.relational import pivot_wide

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "cents": pa.array(np.floor(v * 100).astype(np.int64)),
            }
        )

    return pivot_wide(
        ev.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        group_col="user_id",
        pivot_col="event_type",
        value_col="cents",
        values=["click", "purchase", "view"],
        count_alias="n_events",
        num_partitions=16,
    )


SQL_PIVOT_USER_EVENTS = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'
                THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS cents_click,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS cents_purchase,
       CAST(SUM(CASE WHEN event_type = 'view'
                THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS cents_view,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
"""


def q_distinct_props_per_user(sf_dir: str):
    """Exact per-user distinct-props count: map-side (user, props) dedup
    shrinks the exchange, one bucketed groupby counts — the oracle-exact
    complement of the HLL sketch."""
    from raycdc.relational import count_distinct_per_group

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "props"]
    )
    return count_distinct_per_group(
        ev, group_col="user_id", value_col="props", num_partitions=16
    )


SQL_DISTINCT_PROPS_PER_USER = """
SELECT user_id, CAST(COUNT(DISTINCT props) AS BIGINT) AS n_distinct
FROM events WHERE props IS NOT NULL
GROUP BY user_id
"""


def q_sessionize_events(sf_dir: str):
    """Gap-based sessionization of the events stream per user (30-minute
    gap): one groupby shuffle + vectorized per-group split."""
    from raycdc.relational import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    out = sessionize(ds, entity_col="user_id", ts_col="ts", gap_seconds=1800)
    return out.select_columns(["event_id", "user_id", "session_idx"])


SQL_SESSIONIZE_EVENTS = """
WITH g AS (
    SELECT event_id, user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
       ) - 1 AS BIGINT) AS session_idx
FROM g
"""


def q_rollup_lineitem(sf_dir: str):
    """TPC-H-Q1-shaped rollup with explicit map-side partial aggregation
    before the groupby (the combiner pattern as an operator)."""
    from raycdc.relational import pre_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def to_cents(t: pa.Table) -> pa.Table:
        # per-row exact integer conversion BEFORE summing: float sums are
        # order-dependent across engines, int64 sums are not
        import numpy as np

        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pa.array(qty),
                "sum_base_price_cents": pa.array(cents),
            }
        )

    out = pre_aggregate(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        key_cols=["l_returnflag", "l_linestatus"],
        sum_cols=["sum_qty", "sum_base_price_cents"],
        count_alias="count_order",
        num_partitions=8,
    )
    return out


SQL_ROLLUP_LINEITEM = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_base_price_cents,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_window_hourly(sf_dir: str):
    """Tumbling-window aggregate: events per (user, hour window) — window
    assignment is a pure projection, then the two-phase rollup."""
    from raycdc.relational import pre_aggregate, tumbling_window

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    windowed = tumbling_window(ds, ts_col="ts", window_seconds=3600)

    def to_cents(t: pa.Table) -> pa.Table:
        import numpy as np

        # floor, not round: numpy rounds half-even, SQL half-away
        # (CLAUDE.md oracle-float rule) — floor is identical in both
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start": t["window_start"],
                "value_cents": pa.array(cents),
            }
        )

    return pre_aggregate(
        windowed.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        key_cols=["user_id", "window_start"],
        sum_cols=["value_cents"],
        count_alias="n_events",
        num_partitions=16,
    )


SQL_WINDOW_HOURLY = """
SELECT user_id,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id, (epoch_us(ts) // 3600000000)
"""


def q_asof_prev_event(sf_dir: str):
    """As-of self-join: each event annotated with the user's previous
    event id and type (null for the first) — sort+shift within one
    entity groupby, the scalable as-of shape."""
    from raycdc.relational import asof_previous

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    out = asof_previous(
        ds,
        entity_col="user_id",
        ts_col="ts",
        order_cols=["event_id"],
        value_cols=["event_id", "event_type"],
        num_partitions=16,
    )
    return out.select_columns(
        ["event_id", "user_id", "prev_event_id", "prev_event_type"]
    )


SQL_ASOF_PREV_EVENT = """
SELECT event_id, user_id,
       lag(event_id) OVER w AS prev_event_id,
       lag(event_type) OVER w AS prev_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_sketch_quantiles(sf_dir: str):
    """t-digest quantile profile of the event value column — shuffle-free
    (per-batch centroid compression, driver fold).  Rows-only: approximate
    by design; accuracy envelope asserted vs exact quantiles in pytest."""
    import numpy as np

    from raycdc.sketch import approx_quantiles

    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    est = approx_quantiles(ds, "value", qs)
    return pa.table(
        {
            "q": pa.array(qs),
            "value": pa.array(np.floor(est * 1e4) / 1e4),
        }
    )


def q_stratified_sample(sf_dir: str):
    """Class-balanced downsampling: keep ALL purchases, 10% of views,
    nothing else — per-stratum deterministic Knuth-hash cutoffs, a pure
    per-batch filter (no shuffle, no state), auditable in SQL."""
    from raycdc.ops import stratified_sample

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    return ds.map_batches(
        lambda t: stratified_sample(
            t,
            key_col="event_id",
            strata_col="event_type",
            fractions={"purchase": 1.0, "view": 0.1},
            default_fraction=0.0,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_STRATIFIED_SAMPLE = """
SELECT event_id, user_id, event_type FROM events
WHERE ((event_id * 2654435761) % 4294967296) * 10000 // 4294967296 <
  CASE event_type WHEN 'purchase' THEN 10000 WHEN 'view' THEN 1000 ELSE 0 END
"""


def q_sample_quota(sf_dir: str):
    """Quota downsampling with DATA-DERIVED rates: cap every event_type at
    ≈500 rows — the per-stratum rate comes from the corpus's own counts
    (phase 1: bounded count partials), then the same deterministic
    Knuth-hash filter; thresholds are all-integer (``10000·quota // c``)
    so the oracle reproduces membership bit-for-bit.  At sf0.001 the
    strata sit UNDER quota (every row kept); at sf0.01 they're ~4× over
    (real ~25% sampling) — both regimes gate-checked."""
    from raycdc.relational import sample_to_quota

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    return sample_to_quota(ds, strata_col="event_type", key_col="event_id", quota=500)


SQL_SAMPLE_QUOTA = """
WITH cnt AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY event_type
),
th AS (SELECT event_type, least(10000, (10000 * 500) // c) AS t FROM cnt)
SELECT e.event_id, e.user_id, e.event_type
FROM events e JOIN th USING (event_type)
WHERE ((e.event_id * 2654435761) % 4294967296) * 10000 // 4294967296 < th.t
"""


def q_anti_join_customers(sf_dir: str):
    """Broadcast ANTI join (NOT EXISTS): customers with no order above
    300k total price.  The build side is the distinct qualifying custkeys
    (one ray.put); the customer stream is filtered per batch with a
    vectorized index_in — no shuffle.  (The synthetic data covers every
    customer with at least one order, so the unfiltered variant would be
    vacuously empty.)"""
    import pyarrow.parquet as pq

    from raycdc.relational import broadcast_join

    ordered = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    big = ordered.filter(pc.greater(ordered["o_totalprice"], 300000.0))
    build = pa.table({"c_custkey": pc.unique(big["o_custkey"])})
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return broadcast_join(ds, build, "c_custkey", [], how="anti")


SQL_ANTI_JOIN_CUSTOMERS = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""


def q_semi_join_customers(sf_dir: str):
    """Broadcast SEMI join (EXISTS): customers with at least one order —
    same broadcast, probe rows kept without appending build columns."""
    import pyarrow.parquet as pq

    from raycdc.relational import broadcast_join

    ordered = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    build = pa.table({"c_custkey": pc.unique(ordered["o_custkey"])})
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return broadcast_join(ds, build, "c_custkey", [], how="semi")


SQL_SEMI_JOIN_CUSTOMERS = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_top_orders_per_cust(sf_dir: str):
    """Per-customer top-3 orders by total price (heavy-hitters shape):
    one groupby(custkey) shuffle, segmented rank inside the group,
    orderkey tie-break so the ranking is total and engine-independent."""
    from raycdc.relational import top_k_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    out = top_k_per_group(
        ds,
        group_col="o_custkey",
        order_col="o_totalprice",
        k=3,
        descending=True,
        tie_cols=["o_orderkey"],
        num_partitions=16,
    )
    return out.select_columns(["o_custkey", "o_orderkey", "o_totalprice", "rank"])


SQL_TOP_ORDERS_PER_CUST = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rank
  FROM orders
) WHERE rank <= 3
"""


def q_running_value(sf_dir: str):
    """Per-user running total + row number in event-time order — the
    cumulative window (SUM OVER PARTITION BY ... ORDER BY ...) as one
    entity groupby + segmented numpy cumsum.  Integer cents keep the sum
    exact so the oracle hash-matches."""
    import numpy as np

    from raycdc.relational import running_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["value"]).append_column(
            "cents", pa.array(np.floor(v * 100).astype(np.int64))
        )

    out = running_aggregate(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        entity_col="user_id",
        ts_col="ts",
        order_cols=["event_id"],
        sum_cols=["cents"],
        num_partitions=16,
    )
    return out.select_columns(["event_id", "user_id", "run_cents", "row_num"])


SQL_RUNNING_VALUE = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(cents) OVER w AS BIGINT) AS run_cents,
       ROW_NUMBER() OVER w AS row_num
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_sketch_users(sf_dir: str):
    """HyperLogLog distinct-user estimate over events — shuffle-free
    profile sketch (each batch collapses to one 4 KiB register row; merge
    is elementwise max).  Rows-only: approximate by design; the accuracy
    envelope is asserted against exact counts in pytest."""
    from raycdc.sketch import approx_ndistinct

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est, rse = approx_ndistinct(ds, "user_id", p=12)
    return pa.table(
        {
            "column": pa.array(["user_id"]),
            "approx_ndistinct": pa.array([est], pa.int64()),
            "rse": pa.array([round(rse, 4)]),
        }
    )


def q_window_hopping(sf_dir: str):
    """Sliding 2h-window / 1h-hop per-user rollup: each event lands in two
    windows (one replicate-and-take map), then the combiner-first
    two-phase aggregate — a shuffle whose volume is already collapsed to
    (user, window) partials."""
    import numpy as np

    from raycdc.relational import hopping_window, pre_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    windowed = hopping_window(ds, ts_col="ts", window_seconds=7200, hop_seconds=3600)

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        t = t.append_column(
            "value_cents", pa.array(np.floor(v * 100).astype(np.int64))
        )
        return t.drop_columns(["value", "ts"])

    return pre_aggregate(
        windowed.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        key_cols=["user_id", "window_start"],
        sum_cols=["value_cents"],
        count_alias="n_events",
        num_partitions=16,
    )


SQL_WINDOW_HOPPING = """
WITH e AS (
  SELECT user_id,
         epoch_us(ts) // 3600000000 AS last_slot,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT user_id, cents,
         unnest(generate_series(last_slot - 1, last_slot, 1)) AS slot
  FROM e
)
SELECT user_id,
       make_timestamp(slot * 3600000000) AS window_start,
       CAST(SUM(cents) AS BIGINT) AS value_cents,
       COUNT(*) AS n_events
FROM w
GROUP BY user_id, slot
"""


def q_asof_click_purchase(sf_dir: str):
    """Cross-TABLE as-of join: every click event annotated with the same
    user's latest earlier-or-equal purchase (matched purchase ts + value).
    Both sides stream through one tagged union + ONE co-partitioned
    groupby(user) — the distributed ASOF JOIN shape.  Same-(user, ts)
    purchase duplicates are resolved to max value INSIDE that exchange via
    ``right_tiebreak`` (deterministic on both engines) — no separate
    pre-dedup shuffle, and explicit schemas skip the driver-side
    ``Dataset.schema()`` plan execution."""
    from raycdc.relational import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    clicks = ev.filter(
        expr="event_type == 'click'"
    ).select_columns(["event_id", "user_id", "ts"])
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["user_id", "ts", "value"]
    )
    ts_t = pa.timestamp("us")
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        ts_col="ts",
        right_cols=("ts", "value"),
        how="inner",
        num_partitions=16,
        right_tiebreak="value",
        l_schema=pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()), ("ts", ts_t)]
        ),
        r_schema=pa.schema(
            [("user_id", pa.int64()), ("ts", ts_t), ("value", pa.float64())]
        ),
    )

    def quantize(t: pa.Table) -> pa.Table:
        import numpy as np

        v = t["r_value"].to_numpy(zero_copy_only=False)
        return t.set_column(
            t.schema.get_field_index("r_value"),
            "r_value",
            pa.array(np.floor(v * 1e6) / 1e6),
        )

    return out.map_batches(
        quantize, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["event_id", "user_id", "r_ts", "r_value"])


SQL_ASOF_CLICK_PURCHASE = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), r AS (
  SELECT user_id, ts, max(value) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id,
       r.ts AS r_ts,
       floor(r.value * 1e6) / 1e6 AS r_value
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_join_clicks(sf_dir: str):
    """Range (interval) join, aggregated: every purchase annotated with the
    count and cent-sum of the same user's clicks in the preceding hour
    ``[ts - 1h, ts)``.  One tagged union + ONE co-partitioned bucketed
    exchange; the group body is a single lexsort with positional
    prefix-count cancellation (no per-key loop, no row fan-out — each left
    row ships through exactly once, which is the scale-sane form of a
    non-equi join).  Click values go through ``floor(value*100)`` to int64
    cents on BOTH engines so the windowed sum is exact."""
    from raycdc.relational import range_join_agg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "user_id", "ts"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        import numpy as np

        v = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "vc": pa.array(v.astype(np.int64)),
            }
        )

    clicks = ev.filter(expr="event_type == 'click'").map_batches(
        to_cents, batch_format="pyarrow", zero_copy_batch=True
    )
    ts_t = pa.timestamp("us")
    return range_join_agg(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower=-3600.0,
        upper=0.0,
        value_col="vc",
        count_alias="n_clicks",
        sum_alias="sum_click_cents",
        num_partitions=16,
        l_schema=pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()), ("ts", ts_t)]
        ),
        r_schema=pa.schema(
            [("user_id", pa.int64()), ("ts", ts_t), ("vc", pa.int64())]
        ),
    )


SQL_RANGE_JOIN_CLICKS = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts, CAST(floor(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type = 'click'
)
SELECT l.event_id, l.user_id, l.ts,
       COUNT(r.user_id) AS n_clicks,
       CAST(COALESCE(SUM(r.vc), 0) AS BIGINT) AS sum_click_cents
FROM l LEFT JOIN r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 1 HOUR
 AND r.ts < l.ts
GROUP BY l.event_id, l.user_id, l.ts
"""


# ---------------------------------------------------------------------------
# multimodal (binary payload plumbing; codecs stubbed)


def q_media_meta(sf_dir: str):
    """Binary-payload schema + metadata extraction (oracle on byte length)."""
    from raycdc.multimodal import payload_from_text

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(t: pa.Table) -> pa.Table:
        m = payload_from_text(t)
        return pa.table(
            {
                "media_id": m["media_id"],
                "mime": m["mime"],
                "n_bytes": pc.struct_field(m["meta"], "n_bytes"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_MEDIA_META = """
SELECT doc_id AS media_id,
       'application/octet-stream' AS mime,
       octet_length(encode(text)) AS n_bytes
FROM documents
"""


def q_media_features(sf_dir: str):
    """Actor-pool feature extraction over binary payloads (stub codec):
    small batches + bounded concurrency, the wide-row pattern.
    ORACLE-EXACT since round 4: the stub histogram is byte arithmetic —
    per-bucket counts divided by total bytes (one IEEE division each side,
    floor-quantized per the repo convention), payloads are the documents'
    ASCII text bytes so DuckDB recomputes the same histogram by character
    unnest (SQL_MEDIA_FEATURES)."""
    from raycdc.multimodal import MediaFeatureExtractor, payload_from_text

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    media = ds.map_batches(
        payload_from_text, batch_format="pyarrow", zero_copy_batch=True
    )
    feats = media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        concurrency=2,
        batch_size=256,
    ).select_columns(["media_id", "features", "n_bytes"])

    def flat(t: pa.Table) -> pa.Table:
        import numpy as np

        if len(t) == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                    "f0": pa.array([], pa.float64()),
                    "f_max": pa.array([], pa.float64()),
                }
            )
        f = t["features"].combine_chunks()
        mat = np.asarray(f.flatten()).reshape(len(t), -1)
        return pa.table(
            {
                "media_id": t["media_id"],
                "n_bytes": t["n_bytes"],
                "f0": pa.array(np.floor(mat[:, 0] * 1e6) / 1e6),
                "f_max": pa.array(np.floor(mat.max(axis=1) * 1e6) / 1e6),
            }
        )

    return feats.map_batches(flat, batch_format="pyarrow")


SQL_MEDIA_FEATURES = """
WITH chars AS (
    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
buckets AS (
    SELECT doc_id, ord(ch) // 16 AS bucket, COUNT(*) AS c
    FROM chars GROUP BY doc_id, bucket
),
tot AS (
    SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS n, CAST(SUM(c) AS BIGINT) AS n_bytes
    FROM buckets GROUP BY doc_id
)
SELECT b.doc_id AS media_id,
       t.n_bytes,
       floor(COALESCE(
           MAX(CASE WHEN b.bucket = 0 THEN CAST(b.c AS DOUBLE) / t.n END), 0.0
       ) * 1000000) / 1000000 AS f0,
       floor(MAX(CAST(b.c AS DOUBLE) / t.n) * 1000000) / 1000000 AS f_max
FROM buckets b JOIN tot t USING (doc_id)
GROUP BY b.doc_id, t.n_bytes
"""


SQL_TEXT_FINGERPRINTS = """
WITH RECURSIVE
toks AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS idx
    FROM documents
),
fnv AS (
    SELECT doc_id, idx, tok, 1 AS pos,
           CAST(14695981039346656037 AS HUGEINT) AS h
    FROM toks
    UNION ALL
    SELECT doc_id, idx, tok, pos + 1,
           ((xor(h, CAST(ord(substr(tok, pos, 1)) AS HUGEINT)) * 1099511628211)
            % 18446744073709551616)
    FROM fnv WHERE pos <= length(tok)
),
tok_h AS (SELECT doc_id, idx, h FROM fnv WHERE pos = length(tok) + 1),
sh AS (
    SELECT a.doc_id, a.idx,
           (((((a.h * 1099511628211) % 18446744073709551616 + b.h)
              % 18446744073709551616) * 1099511628211
              % 18446744073709551616 + c.h) % 18446744073709551616) AS s
    FROM tok_h a
    JOIN tok_h b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
    JOIN tok_h c ON c.doc_id = a.doc_id AND c.idx = a.idx + 2
),
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
wins AS (
    SELECT w.doc_id, w.idx, MIN(s2.s) AS wmin
    FROM sh w JOIN cnt USING (doc_id)
    JOIN sh s2 ON s2.doc_id = w.doc_id AND s2.idx BETWEEN w.idx AND w.idx + 3
    WHERE w.idx <= greatest(cnt.n_sh - 3, 1)
    GROUP BY w.doc_id, w.idx
),
prints AS (SELECT DISTINCT doc_id, wmin FROM wins),
agg AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(MIN(wmin % 9223372036854775808) AS BIGINT) AS fp_min,
           CAST(MAX(wmin % 9223372036854775808) AS BIGINT) AS fp_max
    FROM prints GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_fingerprints, 0) AS n_fingerprints,
       COALESCE(a.fp_min, 0) AS fp_min,
       COALESCE(a.fp_max, 0) AS fp_max
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ---------------------------------------------------------------------------
# trajectory: transition matrices, context trimming, sliding windows
# (raycdc.trajectory — ordered per-conversation sequence analytics)


def q_role_transitions(sf_dir: str):
    """First-order role-transition matrix over the replayed LWW state —
    the trajectory statistic (user→assistant→tool chains vs broken
    alternation) agent-log curation thresholds on.  One conv-bucketed
    exchange + a near-empty combine over the bounded (from, to) key space
    (:func:`raycdc.trajectory.transition_counts`)."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.schema import TableSpec
    from raycdc.trajectory import transition_counts

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "turn_idx", "role"])
    return transition_counts(final, num_partitions=16)


def _sql_role_transitions() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT conv_id, turn_idx, role
    FROM ranked WHERE rn = 1 AND op <> 'delete'
), lagged AS (
    SELECT lag(role) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
           ) AS from_role,
           role AS to_role
    FROM final
)
SELECT from_role, to_role, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM lagged WHERE from_role IS NOT NULL
GROUP BY from_role, to_role
"""


def q_trim_context(sf_dir: str):
    """Token-budget context truncation: each replayed conversation keeps
    the maximal SUFFIX of turns whose cumulative whitespace-token count
    fits a 64-token budget — the "last turns that fit" windowing an SFT
    packer applies before assembly.  One conv-bucketed exchange; suffix
    sums for all of a bucket's conversations come from one global
    prefix-sum (:func:`raycdc.trajectory.trim_to_token_budget`)."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.schema import TableSpec
    from raycdc.trajectory import trim_to_token_budget

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    return trim_to_token_budget(final, budget=64, num_partitions=16)


def _sql_trim_context() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT conv_id, turn_idx, role, text, tool, ts,
           len(string_split(coalesce(text, ''), ' ')) AS n_tok
    FROM ranked WHERE rn = 1 AND op <> 'delete'
), suffixed AS (
    SELECT *, SUM(n_tok) OVER (
        PARTITION BY conv_id ORDER BY turn_idx DESC
    ) AS rsum
    FROM final
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM suffixed WHERE rsum <= 64
"""


def q_conv_windows(sf_dir: str):
    """Sliding turn windows (window=4, stride=2) over the replayed LWW
    state, each joined into one training document — the chunking
    alternative to whole-transcript assembly for long conversations.
    Window starts are dense within-conversation POSITIONS (delete-punched
    turn-index gaps don't misalign windows); only full windows emit.  One
    conv-bucketed exchange; all of a bucket's windows come from one
    gather + one ``binary_join``
    (:func:`raycdc.trajectory.sliding_windows`)."""
    from raycdc.changelog import changelog_from_events
    from raycdc.engine import merged_state
    from raycdc.schema import TableSpec
    from raycdc.trajectory import sliding_windows

    final = merged_state(
        changelog_from_events(sf_dir), TableSpec(num_partitions=16)
    ).select_columns(["conv_id", "turn_idx", "text"])
    return sliding_windows(final, window=4, stride=2, num_partitions=16)


def _sql_conv_windows() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, lsn DESC
    ) AS rn
    FROM changelog
), final AS (
    SELECT conv_id, turn_idx, text
    FROM ranked WHERE rn = 1 AND op <> 'delete'
), positioned AS (
    SELECT conv_id, text,
           CAST(row_number() OVER (
               PARTITION BY conv_id ORDER BY turn_idx
           ) - 1 AS BIGINT) AS pos
    FROM final
)
SELECT a.conv_id,
       a.pos AS win_start,
       string_agg(coalesce(b.text, ''), chr(10) ORDER BY b.pos) AS window_text,
       CAST(COUNT(*) AS BIGINT) AS n_turns
FROM positioned a
JOIN positioned b
  ON b.conv_id = a.conv_id AND b.pos >= a.pos AND b.pos < a.pos + 4
WHERE a.pos % 2 = 0
GROUP BY a.conv_id, a.pos
HAVING COUNT(*) = 4
"""


# ---------------------------------------------------------------------------
# audit: changelog observability (raycdc.audit)


def q_key_churn(sf_dir: str):
    """Per-key churn profile of the raw changelog — insert/update/delete
    counts plus first/last WAL position per (conv_id, turn_idx).  Pure
    map-side indicator projection + mergeable partial aggregates through
    ONE bucketed exchange (:func:`raycdc.audit.key_churn` over the
    extended :func:`raycdc.relational.pre_aggregate`)."""
    from raycdc.audit import key_churn
    from raycdc.changelog import changelog_from_events

    return key_churn(changelog_from_events(sf_dir), num_partitions=16)


def _sql_key_churn() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()}
SELECT conv_id, turn_idx,
       CAST(SUM(CASE WHEN op = 'insert' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_inserts,
       CAST(SUM(CASE WHEN op = 'update' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_updates,
       CAST(SUM(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_deletes,
       MIN(lsn) AS first_lsn,
       MAX(lsn) AS last_lsn,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM changelog
GROUP BY conv_id, turn_idx
"""


def q_event_order(sf_dir: str):
    """Delivery-order audit of the raw changelog: per conversation, how
    many events arrived with an event time EARLIER than the previous event
    of the same key in WAL order — the late-event risk signal for
    ``history``-policy lakes.  One conv-bucketed exchange; groups finalize
    inside their bucket (:func:`raycdc.audit.event_order_stats`)."""
    from raycdc.audit import event_order_stats
    from raycdc.changelog import changelog_from_events

    return event_order_stats(changelog_from_events(sf_dir), num_partitions=16)


def _sql_event_order() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
lagged AS (
    SELECT conv_id, ts,
           lag(ts) OVER (
               PARTITION BY conv_id, turn_idx ORDER BY lsn
           ) AS prev_ts
    FROM changelog
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_ts_inversions
FROM lagged
GROUP BY conv_id
"""


def q_sketch_overlap(sf_dir: str):
    """Cross-corpus overlap profile via KMV (bottom-k) sketches
    (:func:`raycdc.sketch.approx_overlap`) — the dedup/decontamination
    PLANNING signal: estimate |A∩B| / Jaccard between two corpora in one
    cheap pass per side, before paying for the exact pipeline.  The
    fixture keeps both corpora under ``k``, where a KMV sketch holds
    every distinct hash and the estimates are EXACT — so the oracle
    recomputes them with plain set arithmetic (the at-scale behavior
    above ``k`` is pinned by accuracy-envelope pytests instead)."""
    import numpy as np
    import pyarrow.parquet as _pq

    from raycdc.sketch import approx_overlap

    half = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows // 2
    ids = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    shifted = ids.map_batches(
        lambda t: pa.table({"doc_id": pc.add(t["doc_id"], half)}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    o = approx_overlap(ids, "doc_id", shifted, "doc_id", k=16384)
    return pa.table(
        {
            "distinct_a": pa.array([int(o["distinct_a"])], pa.int64()),
            "distinct_b": pa.array([int(o["distinct_b"])], pa.int64()),
            "union_est": pa.array([int(o["union"])], pa.int64()),
            "intersection_est": pa.array(
                [int(o["intersection"])], pa.int64()
            ),
            # floor-quantize: float hashing convention (CLAUDE.md)
            "jaccard": pa.array(
                [float(np.floor(o["jaccard"] * 1e6) / 1e6)], pa.float64()
            ),
        }
    )


SQL_SKETCH_OVERLAP = """
WITH half AS (SELECT COUNT(*) // 2 AS h FROM documents),
a AS (SELECT DISTINCT doc_id AS v FROM documents),
b AS (SELECT DISTINCT doc_id + (SELECT h FROM half) AS v FROM documents),
i AS (SELECT COUNT(*) AS x FROM a JOIN b USING (v)),
u AS (SELECT COUNT(*) AS x FROM (SELECT v FROM a UNION SELECT v FROM b))
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS distinct_a,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS distinct_b,
       CAST((SELECT x FROM u) AS BIGINT) AS union_est,
       CAST((SELECT x FROM i) AS BIGINT) AS intersection_est,
       floor(CAST((SELECT x FROM i) AS DOUBLE)
             / CAST((SELECT x FROM u) AS DOUBLE) * 1000000) / 1000000
           AS jaccard
"""


def q_sketch_membership(sf_dir: str):
    """Bloom-filter anti-join: build one mergeable filter over the English
    docs' ids (shuffle-free register fold), broadcast it ONCE via ray.put,
    and keep the corpus rows that are DEFINITELY outside the set — the
    one-sided guarantee that makes a 100 TB pre-filter in front of an
    exact dedup/decontamination pass safe (no survivor is wrongly
    dropped).  Rows-only: false positives drop a hash-dependent handful
    from the anti side; the exact envelopes live in pytest."""
    from raycdc.relational import pre_aggregate
    from raycdc.sketch import bloom_build, bloom_semi_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    en_ids = docs.filter(expr="lang == 'en'")
    words = bloom_build(en_ids, "doc_id", num_bits=1 << 18)
    survivors = bloom_semi_join(docs, "doc_id", words, negate=True)
    out = pre_aggregate(
        survivors,
        key_cols=["lang"],
        sum_cols=[],
        count_alias="n_docs",
        num_partitions=4,
    )
    return out


def q_edit_pairs(sf_dir: str):
    """(before, after) edit-pair mining from the raw changelog: every
    ``update`` event paired with the text of the version it overwrote in
    LWW order — the WAL is the only place superseded turn text survives
    (replay destroys it), so this is the CDC-native source of
    edit/preference training examples.  One conv-bucketed exchange
    (:func:`raycdc.trajectory.edit_pairs`)."""
    from raycdc.changelog import changelog_from_events
    from raycdc.trajectory import edit_pairs

    return edit_pairs(changelog_from_events(sf_dir), num_partitions=16)


def _sql_edit_pairs() -> str:
    from raycdc.changelog import CHANGELOG_SQL

    return f"""
WITH {CHANGELOG_SQL.strip()},
lagged AS (
    SELECT conv_id, turn_idx, text, op, lsn,
           lag(text) OVER w AS before_text,
           lag(op) OVER w AS prev_op
    FROM changelog
    WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY ts, lsn)
)
SELECT conv_id, turn_idx,
       COALESCE(before_text, '') AS before_text,
       COALESCE(text, '') AS after_text,
       lsn
FROM lagged
WHERE op = 'update' AND prev_op IS NOT NULL AND prev_op <> 'delete'
"""


# ---------------------------------------------------------------------------
# registry


QUERIES: dict[str, Callable[[str], Any]] = {
    "proj_clean_number": q_proj_clean_number,
    "proj_dates": q_proj_dates,
    "proj_wareki": q_proj_wareki,
    "proj_statement": q_proj_statement,
    "preset_statement": q_preset_statement,
    "cdc_csv_ingest": q_cdc_csv_ingest,
    "cdc_tail_route": q_cdc_tail_route,
    "text_embed_near_dup": q_text_embed_near_dup,
    "cdc_extrema_view": q_cdc_extrema_view,
    "cdc_topk_view": q_cdc_topk_view,
    "cdc_ttl_expire": q_cdc_ttl_expire,
    "cdc_evolve": q_cdc_evolve,
    "cdc_additive_rollup": q_cdc_additive_rollup,
    "cdc_bootstrap": q_cdc_bootstrap,
    "cdc_compact": q_cdc_compact,
    "cdc_migrate": q_cdc_migrate,
    "cdc_restore": q_cdc_restore,
    "cdc_distinct_view": q_cdc_distinct_view,
    "cdc_digest_view": q_cdc_digest_view,
    "cdc_export": q_cdc_export,
    "cdc_enriched_replay": q_cdc_enriched_replay,
    "cdc_scd2_history": q_cdc_scd2_history,
    "cdc_history_lake": q_cdc_history_lake,
    "cdc_suppress_noops": q_cdc_suppress_noops,
    "cdc_point_in_time": q_cdc_point_in_time,
    "cdc_colocated_join": q_cdc_colocated_join,
    "cdc_join_view": q_cdc_join_view,
    "cdc_change_feed": q_cdc_change_feed,
    "cdc_sync_replica": q_cdc_sync_replica,
    "cdc_rollup_view": q_cdc_rollup_view,
    "sample_events": q_sample_events,
    "split_events": q_split_events,
    "join_orders_customer": q_join_orders_customer,
    "join_shuffle": q_join_shuffle,
    "sessionize_events": q_sessionize_events,
    "rollup_lineitem": q_rollup_lineitem,
    "rollup_levels": q_rollup_levels,
    "zscore_events": q_zscore_events,
    "pctrank_events": q_pctrank_events,
    "ntile_events": q_ntile_events,
    "window_hourly": q_window_hourly,
    "window_hopping": q_window_hopping,
    "asof_prev_event": q_asof_prev_event,
    "asof_click_purchase": q_asof_click_purchase,
    "range_join_clicks": q_range_join_clicks,
    "running_value": q_running_value,
    "rolling_value": q_rolling_value,
    "quantiles_value": q_quantiles_value,
    "drift_report": q_drift_report,
    "sketch_users": q_sketch_users,
    "sketch_quantiles": q_sketch_quantiles,
    "stratified_sample": q_stratified_sample,
    "sample_quota": q_sample_quota,
    "anti_join_customers": q_anti_join_customers,
    "semi_join_customers": q_semi_join_customers,
    "top_orders_per_cust": q_top_orders_per_cust,
    "text_stats": q_text_stats,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprints": q_text_fingerprints,
    "text_repetition": q_text_repetition,
    "text_redact": q_text_redact,
    "text_normalize": q_text_normalize,
    "dedup_paragraphs": q_dedup_paragraphs,
    "text_strip_markup": q_text_strip_markup,
    "quality_gate": q_quality_gate,
    "pack_docs": q_pack_docs,
    "pack_masks": q_pack_masks,
    "chunk_docs": q_chunk_docs,
    "bigram_nll": q_bigram_nll,
    "bigram_nll_ref": q_bigram_nll_ref,
    "assemble_convs": q_assemble_convs,
    "conv_stats": q_conv_stats,
    "conv_integrity": q_conv_integrity,
    "turn_dedup": q_turn_dedup,
    "merge_turns": q_merge_turns,
    "sft_pairs": q_sft_pairs,
    "preference_pairs": q_preference_pairs,
    "sketch_top_events": q_sketch_top_events,
    "token_vocab": q_token_vocab,
    "json_props_rollup": q_json_props_rollup,
    "tfidf_docs": q_tfidf_docs,
    "unigram_nll": q_unigram_nll,
    "embed_centroids": q_embed_centroids,
    "cdc_snapshot_diff": q_cdc_snapshot_diff,
    "cdc_transcript_view": q_cdc_transcript_view,
    "join_full_outer": q_join_full_outer,
    "pivot_user_events": q_pivot_user_events,
    "distinct_props_per_user": q_distinct_props_per_user,
    "dedup_exact": q_dedup_exact,
    "dedup_exact_hash": q_dedup_exact_hash,
    "dedup_incremental": q_dedup_incremental,
    "dedup_normalized": q_dedup_normalized,
    "corpus_curation": q_corpus_curation,
    "dedup_minhash": q_dedup_minhash,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_components": q_dedup_components,
    "dedup_near_full": q_dedup_near_full,
    "dedup_incr_near": q_dedup_incr_near,
    "conv_near_dedup": q_conv_near_dedup,
    "dedup_simhash": q_dedup_simhash,
    "decontaminate": q_decontaminate,
    "crossdoc_repetition": q_crossdoc_repetition,
    "dup_spans": q_dup_spans,
    "cut_dup_spans": q_cut_dup_spans,
    "sim_knn": q_sim_knn,
    "sim_knn_lsh": q_sim_knn_lsh,
    "sim_knn_ivf": q_sim_knn_ivf,
    "sim_knn_ivfpq": q_sim_knn_ivfpq,
    "sim_knn_graph": q_sim_knn_graph,
    "sim_knn_index": q_sim_knn_index,
    "embed_near_dup": q_embed_near_dup,
    "semantic_dedup": q_semantic_dedup,
    "media_meta": q_media_meta,
    "media_wav": q_media_wav,
    "media_bmp": q_media_bmp,
    "media_resize": q_media_resize,
    "media_frames": q_media_frames,
    "media_spectrogram": q_media_spectrogram,
    "image_near_dup": q_image_near_dup,
    "audio_near_dup": q_audio_near_dup,
    "media_features": q_media_features,
    "role_transitions": q_role_transitions,
    "trim_context": q_trim_context,
    "conv_windows": q_conv_windows,
    "key_churn": q_key_churn,
    "event_order": q_event_order,
    "edit_pairs": q_edit_pairs,
    "sketch_membership": q_sketch_membership,
    "sketch_overlap": q_sketch_overlap,
}

# queries without an entry here get the driver's weaker rows-only check
# (non-SQL-expressible: heuristic language ID, rolling-hash fingerprints,
# sub-1.0-recall LSH variants)
ORACLES: dict[str, str] = {
    "proj_clean_number": SQL_PROJ_CLEAN_NUMBER,
    "proj_dates": SQL_PROJ_DATES,
    "proj_wareki": SQL_PROJ_WAREKI,
    "proj_statement": SQL_PROJ_STATEMENT,
    "preset_statement": SQL_PRESET_STATEMENT,
    "join_orders_customer": SQL_JOIN_ORDERS_CUSTOMER,
    "join_shuffle": SQL_JOIN_ORDERS_CUSTOMER,
    "cdc_evolve": _sql_cdc_evolve(),
    "cdc_additive_rollup": SQL_CDC_ADDITIVE_ROLLUP,
    "cdc_bootstrap": _sql_cdc_bootstrap(),
    # restore drill lands on the same one-shot LWW final state: the
    # corrupted interlude must leave zero trace after the rewind
    "cdc_restore": _sql_cdc_bootstrap(),
    "cdc_enriched_replay": _sql_cdc_enriched_replay(),
    "cdc_scd2_history": SQL_CDC_SCD2_HISTORY,
    "cdc_history_lake": SQL_CDC_SCD2_HISTORY,
    "cdc_suppress_noops": SQL_CDC_SUPPRESS_NOOPS,
    "pack_docs": SQL_PACK_DOCS,
    "pack_masks": _sql_pack_masks(),
    "chunk_docs": SQL_CHUNK_DOCS,
    "bigram_nll": SQL_BIGRAM_NLL,
    "bigram_nll_ref": SQL_BIGRAM_NLL_REF,
    "media_features": SQL_MEDIA_FEATURES,
    "cdc_extrema_view": _sql_cdc_extrema_view(),
    "cdc_export": _sql_cdc_export(),
    "cdc_topk_view": _sql_cdc_topk_view(),
    "cdc_ttl_expire": _sql_cdc_ttl_expire(),
    "sim_knn_index": SQL_SIM_KNN,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "text_fingerprints": SQL_TEXT_FINGERPRINTS,
    "cdc_tail_route": _sql_cdc_tail_route(),
    "cdc_point_in_time": SQL_CDC_POINT_IN_TIME,
    "cdc_colocated_join": _sql_cdc_colocated_join(),
    "cdc_join_view": _sql_cdc_colocated_join(),
    "cdc_change_feed": _sql_cdc_change_feed(),
    "cdc_rollup_view": _sql_cdc_rollup_view(),
    "sample_events": SQL_SAMPLE_EVENTS,
    "split_events": SQL_SPLIT_EVENTS,
    "sessionize_events": SQL_SESSIONIZE_EVENTS,
    "rollup_lineitem": SQL_ROLLUP_LINEITEM,
    "rollup_levels": SQL_ROLLUP_LEVELS,
    "zscore_events": SQL_ZSCORE_EVENTS,
    "pctrank_events": SQL_PCTRANK_EVENTS,
    "ntile_events": SQL_NTILE_EVENTS,
    "window_hourly": SQL_WINDOW_HOURLY,
    "window_hopping": SQL_WINDOW_HOPPING,
    "asof_prev_event": SQL_ASOF_PREV_EVENT,
    "asof_click_purchase": SQL_ASOF_CLICK_PURCHASE,
    "range_join_clicks": SQL_RANGE_JOIN_CLICKS,
    "running_value": SQL_RUNNING_VALUE,
    "rolling_value": SQL_ROLLING_VALUE,
    "quantiles_value": SQL_QUANTILES_VALUE,
    "drift_report": SQL_DRIFT_REPORT,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "sample_quota": SQL_SAMPLE_QUOTA,
    "anti_join_customers": SQL_ANTI_JOIN_CUSTOMERS,
    "semi_join_customers": SQL_SEMI_JOIN_CUSTOMERS,
    "top_orders_per_cust": SQL_TOP_ORDERS_PER_CUST,
    "text_stats": SQL_TEXT_STATS,
    "text_quality": SQL_TEXT_QUALITY,
    "text_repetition": SQL_TEXT_REPETITION,
    "text_redact": SQL_TEXT_REDACT,
    "text_normalize": SQL_TEXT_NORMALIZE,
    "dedup_paragraphs": SQL_DEDUP_PARAGRAPHS,
    "text_strip_markup": SQL_TEXT_STRIP_MARKUP,
    "quality_gate": SQL_QUALITY_GATE,
    "assemble_convs": _sql_assemble_convs(),
    "conv_stats": _sql_conv_stats(),
    "conv_integrity": _sql_conv_integrity(),
    "turn_dedup": _sql_turn_dedup(),
    "merge_turns": _sql_merge_turns(),
    "sft_pairs": _sql_sft_pairs(),
    "preference_pairs": SQL_PREFERENCE_PAIRS,
    "token_vocab": SQL_TOKEN_VOCAB,
    "json_props_rollup": SQL_JSON_PROPS_ROLLUP,
    "tfidf_docs": SQL_TFIDF_DOCS,
    "unigram_nll": SQL_UNIGRAM_NLL,
    "embed_centroids": SQL_EMBED_CENTROIDS,
    "cdc_snapshot_diff": SQL_CDC_SNAPSHOT_DIFF,
    "cdc_transcript_view": _sql_assemble_convs(),
    "join_full_outer": SQL_JOIN_FULL_OUTER,
    "pivot_user_events": SQL_PIVOT_USER_EVENTS,
    "distinct_props_per_user": SQL_DISTINCT_PROPS_PER_USER,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_exact_hash": SQL_DEDUP_EXACT,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "dedup_normalized": SQL_DEDUP_NORMALIZED,
    "corpus_curation": SQL_CORPUS_CURATION,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "dedup_components": SQL_DEDUP_COMPONENTS,
    "dedup_near_full": SQL_DEDUP_NEAR_FULL,
    "dedup_incr_near": SQL_DEDUP_INCR_NEAR,
    "conv_near_dedup": _sql_conv_near_dedup(),
    "decontaminate": SQL_DECONTAMINATE,
    "crossdoc_repetition": SQL_CROSSDOC_REPETITION,
    "dup_spans": SQL_DUP_SPANS,
    "cut_dup_spans": SQL_CUT_DUP_SPANS,
    "sim_knn": SQL_SIM_KNN,
    "media_meta": SQL_MEDIA_META,
    "media_wav": SQL_MEDIA_WAV,
    "media_bmp": SQL_MEDIA_BMP,
    "media_resize": SQL_MEDIA_RESIZE,
    "media_frames": SQL_MEDIA_FRAMES,
    "media_spectrogram": SQL_MEDIA_SPECTROGRAM,
    "image_near_dup": SQL_IMAGE_NEAR_DUP,
    "audio_near_dup": SQL_AUDIO_NEAR_DUP,
    "role_transitions": _sql_role_transitions(),
    "trim_context": _sql_trim_context(),
    "conv_windows": _sql_conv_windows(),
    "key_churn": _sql_key_churn(),
    "event_order": _sql_event_order(),
    "edit_pairs": _sql_edit_pairs(),
}


def bench_extras() -> dict[str, Callable[[str], Any]]:
    """Heavier pipelines bench.py times (each consumed via count())."""
    return {
        "proj_statement": lambda sf: q_proj_statement(sf).count(),
        "text_stats": lambda sf: q_text_stats(sf).count(),
        "dedup_exact": lambda sf: q_dedup_exact(sf).count(),
        "dedup_minhash": lambda sf: q_dedup_minhash(sf).count(),
        "sim_knn": lambda sf: q_sim_knn(sf).count(),
        "rollup_lineitem": lambda sf: q_rollup_lineitem(sf).count(),
        "sessionize_events": lambda sf: q_sessionize_events(sf).count(),
        "join_orders_customer": lambda sf: q_join_orders_customer(sf).count(),
        "asof_click_purchase": lambda sf: q_asof_click_purchase(sf).count(),
        "window_hopping": lambda sf: q_window_hopping(sf).count(),
        "top_orders_per_cust": lambda sf: q_top_orders_per_cust(sf).count(),
        "cdc_snapshot_diff": lambda sf: q_cdc_snapshot_diff(sf).count(),
        "pivot_user_events": lambda sf: q_pivot_user_events(sf).count(),
        "distinct_props_per_user": lambda sf: q_distinct_props_per_user(sf).count(),
        "decontaminate": lambda sf: q_decontaminate(sf).count(),
        "crossdoc_repetition": lambda sf: q_crossdoc_repetition(sf).count(),
        "dup_spans": lambda sf: q_dup_spans(sf).count(),
        "cut_dup_spans": lambda sf: q_cut_dup_spans(sf).count(),
        "sft_pairs": lambda sf: q_sft_pairs(sf).count(),
        "corpus_curation": lambda sf: q_corpus_curation(sf).count(),
        "range_join_clicks": lambda sf: q_range_join_clicks(sf).count(),
        "cdc_scd2_history": lambda sf: q_cdc_scd2_history(sf).count(),
        "cdc_point_in_time": lambda sf: q_cdc_point_in_time(sf).count(),
        "assemble_convs": lambda sf: q_assemble_convs(sf).count(),
        "cdc_history_lake": lambda sf: q_cdc_history_lake(sf).count(),
        "cdc_colocated_join": lambda sf: q_cdc_colocated_join(sf).count(),
        "cdc_change_feed": lambda sf: q_cdc_change_feed(sf).count(),
        "cdc_sync_replica": lambda sf: q_cdc_sync_replica(sf).count(),
        "cdc_rollup_view": lambda sf: q_cdc_rollup_view(sf).count(),
        "cdc_transcript_view": lambda sf: q_cdc_transcript_view(sf).count(),
        # media + token families (VERDICT r2 #9: track their cost per round)
        "media_wav": lambda sf: q_media_wav(sf).count(),
        "media_bmp": lambda sf: q_media_bmp(sf).count(),
        "media_resize": lambda sf: q_media_resize(sf).count(),
        "media_frames": lambda sf: q_media_frames(sf).count(),
        "token_vocab": lambda sf: q_token_vocab(sf).count(),
        "tfidf_docs": lambda sf: q_tfidf_docs(sf).count(),
        "preset_statement": lambda sf: q_preset_statement(sf).count(),
        # full near-dedup (LSH → verify → components → representative filter)
        "dedup_near_full": lambda sf: q_dedup_near_full(sf).count(),
        # transcript-level near-dedup (CDC state → assembly → full chain)
        "conv_near_dedup": lambda sf: q_conv_near_dedup(sf).count(),
        "merge_turns": lambda sf: q_merge_turns(sf).count(),
        # WAL mining + sketch membership (round-3 additions)
        "edit_pairs": lambda sf: q_edit_pairs(sf).count(),
        "sketch_membership": lambda sf: q_sketch_membership(sf).count(),
        # disaster-recovery drill + curation gates (round-3 continuation)
        "cdc_restore": lambda sf: q_cdc_restore(sf).count(),
        "quality_gate": lambda sf: q_quality_gate(sf).count(),
        "dedup_paragraphs": lambda sf: q_dedup_paragraphs(sf).count(),
        # media feature family (FFT + perceptual/acoustic near-dup)
        "media_spectrogram": lambda sf: q_media_spectrogram(sf).count(),
        "image_near_dup": lambda sf: q_image_near_dup(sf).count(),
        "audio_near_dup": lambda sf: q_audio_near_dup(sf).count(),
        # round-4 additions: production tail+route loop, end-to-end
        # embedding generation, compressed-index ANN
        "cdc_tail_route": lambda sf: q_cdc_tail_route(sf).count(),
        "text_embed_near_dup": lambda sf: q_text_embed_near_dup(sf).count(),
        "sim_knn_ivfpq": lambda sf: q_sim_knn_ivfpq(sf).count(),
        "cdc_extrema_view": lambda sf: q_cdc_extrema_view(sf).count(),
        "cdc_topk_view": lambda sf: q_cdc_topk_view(sf).count(),
        "cdc_ttl_expire": lambda sf: q_cdc_ttl_expire(sf).count(),
        # round-5 addition: graph ANN (NSW beam search)
        "sim_knn_graph": lambda sf: q_sim_knn_graph(sf).count(),
        "sim_knn_index": lambda sf: q_sim_knn_index(sf).count(),
        # round-5 continuation: DPO pair mining, loss-mask packing,
        # retrieval chunking, bigram fluency, t-digest quantile view
        "preference_pairs": lambda sf: q_preference_pairs(sf).count(),
        "pack_masks": lambda sf: q_pack_masks(sf).count(),
        "chunk_docs": lambda sf: q_chunk_docs(sf).count(),
        "bigram_nll": lambda sf: q_bigram_nll(sf).count(),
        "cdc_digest_view": lambda sf: len(q_cdc_digest_view(sf)),
        "cdc_export": lambda sf: q_cdc_export(sf).count(),
    }
