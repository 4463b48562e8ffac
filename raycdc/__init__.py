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
ops         projector-style vectorized batch transforms (reference §2.3 analogs)
partition   hash partitioning + hot-key salting
merge       vectorized LWW dedup / merge kernels (combiner + final)
engine      pipeline assembly: merged_state, replay, resume
sink        atomic partitioned Parquet writes, checkpoints, lineage
text        text analysis (langid, quality, tokens, fingerprints)
dedup       exact / MinHash-LSH / SimHash / n-gram / embedding dedup
similarity  cosine top-k ANN (brute-force + LSH-bucketed)
multimodal  binary-column plumbing (decode stages stubbed)
"""

from raycdc.schema import TableSpec, TRANSCRIPT_SCHEMA, CHANGELOG_SCHEMA

__all__ = ["TableSpec", "TRANSCRIPT_SCHEMA", "CHANGELOG_SCHEMA"]
