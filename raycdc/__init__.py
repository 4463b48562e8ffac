"""raycdc — a from-scratch Ray-Data-native CDC / incremental-ingest engine.

Generalizes the reference pipeline of nownabe/go-bqloader
(`/root/reference/handler.go:100-131`: event -> extract -> decode -> parse ->
project -> load) into a continuous change-event engine over conversation
transcripts: a WAL/binlog-style changelog of insert/update/delete events is
consumed as `ray.data.Dataset` Arrow batches, hash-partitioned by `conv_id`,
and applied with exactly-once, idempotent last-writer-wins upserts keyed on
`(conv_id, turn_idx)` into a partitioned Parquet lake.

Modules
-------
schema      TableSpec + declarative Arrow schema evolution (additive / widening)
changelog   deterministic changelog derivation + seeded synthetic generators
ops         projector transforms, error policy, deterministic sampling/splits
parsers     per-file decode stack (encodings, line surgery, CSV/JSONL, binary)
registry    handler registry, regex routing, fan-out dispatch, notifiers
partition   hash partitioning + hot-key salting
merge       vectorized LWW dedup / merge kernels (combiner + final)
engine      replay / bootstrap / tail / compact / lookup / read_lake;
            lake ecosystem: colocated_join, refresh_join_view, change_feed,
            sync_lake, maintain_rollup
sink        versioned atomic writes, checkpoints, snapshots, lineage, schema registry
relational  broadcast + shuffle joins, sessionization, two-phase aggregation
trajectory  ordered per-conversation analytics (transition matrices,
            token-budget context trimming, sliding turn windows)
audit       changelog observability (per-key churn, delivery-order stats)
text        text analysis (langid, quality, tokens, fingerprints)
dedup       exact / MinHash-LSH / SimHash / n-gram / embedding dedup
similarity  cosine top-k ANN (brute-force, multi-probe LSH, IVF, IVF-PQ,
            NSW graph), embedding near-dup, CDC×ANN: incrementally
            maintained IVF-PQ index lake + search over it
multimodal  real WAV/BMP/Y4M codecs, spectrogram + dHash + acoustic
            fingerprint features, image/audio near-dup (lib-less formats
            stay stubbed behind NotImplementedError)
storage     pluggable lake storage (POSIX temp+rename / fsspec atomic PUT)
metrics     process-local observability counters (candidate-cap truncation)
"""

# schema symbols are cheap (pyarrow only) and imported eagerly; the engine
# surface pulls in ray.data, so it is exported lazily (PEP 562) — `import
# raycdc` stays fast and ray-free until an engine function is touched
from raycdc.schema import CHANGELOG_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

_ENGINE_EXPORTS = (
    "replay",
    "merged_state",
    "read_lake",
    "read_lineage",
    "lookup",
    "tail",
    "tail_once",
    "prune_segments",
    "expire_rows",
    "compact",
    "export_lake",
    "restore_lake",
    "migrate_lake",
    "bootstrap",
    "colocated_join",
    "refresh_join_view",
    "change_feed",
    "sync_lake",
    "maintain_rollup",
    "maintain_distinct",
    "maintain_digest",
    "maintain_transcripts",
    "maintain_extrema",
    "maintain_topk",
    "maintain_view",
    "ViewContext",
    "detect_hot_keys",
    "MergeApplier",
)

__all__ = ["TableSpec", "TRANSCRIPT_SCHEMA", "CHANGELOG_SCHEMA", *_ENGINE_EXPORTS]


def __getattr__(name: str):
    if name in _ENGINE_EXPORTS:
        from raycdc import engine

        return getattr(engine, name)
    raise AttributeError(f"module 'raycdc' has no attribute {name!r}")
