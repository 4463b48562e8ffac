"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages (codec setup once per actor in ``__init__``).

Codec reality in this environment: AUDIO decode is REAL (stdlib ``wave``
PCM16, :class:`WavDecoder`), IMAGE decode and resize are REAL (pure-numpy
24-bit BMP, :class:`BmpDecoder`/:class:`BmpResizer`), VIDEO frame sampling
is REAL for uncompressed YUV4MPEG2 (:class:`Y4mFrameSampler`, seeking over
skipped frames) — each with a deterministic synthesizer fixture and an
arithmetic DuckDB oracle.  Only formats needing external libs (PIL/JPEG,
ffmpeg-compressed video) remain stubbed behind ``codec=None``
(deterministic fake) / ``NotImplementedError`` (real codec names); for
those the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is still real and tested.

Batch-size guidance (SURVEY.md §7.3 "wide rows"): binary payloads dominate
block size; callers should pass ``batch_size`` small enough that
``batch_size × payload × concurrency`` fits worker heaps, and rely on
streaming backpressure for the rest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("content", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("meta", pa.struct([("n_bytes", pa.int64()), ("kind", pa.string())])),
    ]
)


def payload_from_text(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Deterministic fake media payloads: the document text's UTF-8 bytes
    posing as an opaque blob (keeps everything reproducible with no media
    libs or external data)."""
    content = pc.cast(batch[text_col], pa.binary())
    n_bytes = pc.cast(pc.binary_length(content), pa.int64())
    if isinstance(n_bytes, pa.ChunkedArray):
        n_bytes = n_bytes.combine_chunks()
    n = len(batch)
    meta = pa.StructArray.from_arrays(
        [n_bytes, pa.array(["text/fake"] * n)],
        names=["n_bytes", "kind"],
    )
    return pa.table(
        {
            "media_id": pc.cast(batch[id_col], pa.int64()),
            "content": content,
            "mime": pa.array(["application/octet-stream"] * n),
            "meta": meta,
        }
    )


class MediaFeatureExtractor:
    """Actor-pool feature stage: ``map_batches(MediaFeatureExtractor,
    fn_constructor_kwargs={...}, concurrency=N, batch_size=B)``.

    ``codec=None`` → deterministic byte-histogram "features" (16 buckets,
    L1-normalized).  Naming a real codec raises ``NotImplementedError`` at
    actor construction — fail fast, once per actor, not per batch.
    """

    def __init__(self, codec: str | None = None, n_buckets: int = 16):
        if codec is not None:
            raise NotImplementedError(
                f"codec {codec!r} unavailable in this environment; "
                "use codec=None for the deterministic stub"
            )
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raycdc.text import _utf8_bytes_and_offsets

        col = batch["content"]  # _utf8_bytes_and_offsets normalizes chunks
        # width-aware offsets: binary AND large_binary columns both valid
        data, off = _utf8_bytes_and_offsets(col)
        row_idx = np.repeat(np.arange(len(col)), np.diff(off))
        bucket = (data.astype(np.int64) * self.n_buckets) // 256
        hist = np.zeros((len(col), self.n_buckets))
        np.add.at(hist, (row_idx, bucket), 1.0)
        sums = hist.sum(axis=1, keepdims=True)
        hist = hist / np.where(sums == 0, 1, sums)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(hist.reshape(-1)), self.n_buckets
                ),
                "n_bytes": pa.array(np.diff(off).astype(np.int64)),
            }
        )


def _binary_from_flat(flat: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Zero-loop construction of a binary array from a flat uint8 buffer +
    int64 row offsets (large_binary buffers, cast down)."""
    arr = pa.Array.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int64)), pa.py_buffer(flat.tobytes())],
    )
    return arr.cast(pa.binary())


def _flat_payloads(col) -> tuple[np.ndarray, np.ndarray]:
    from raycdc.text import _utf8_bytes_and_offsets

    la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return _utf8_bytes_and_offsets(la)


class ResizeStub:
    """Actor-pool resize stage stub: deterministic byte-subsampling of each
    payload to a fixed ``target_bytes`` "thumbnail" (the image-resize access
    pattern — read full payload, emit fixed-small payload — minus the
    codec).  Real codec names fail fast at construction.

    Fully vectorized: one flat-buffer strided gather over the whole batch
    (same offsets pattern as the text kernels) — no per-row loop, which is
    the pattern a real codec stage should copy for its pre/post framing."""

    def __init__(self, target_bytes: int = 64, codec: str | None = None):
        if codec is not None:
            raise NotImplementedError(f"codec {codec!r} unavailable; stub only")
        self.target_bytes = target_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, off = _flat_payloads(batch["content"])
        lens = np.diff(off)
        tb = self.target_bytes
        out_lens = np.minimum(lens, tb)
        out_off = np.concatenate([[0], np.cumsum(out_lens)])
        total = int(out_off[-1])
        row = np.repeat(np.arange(len(lens), dtype=np.int64), out_lens)
        pos = np.arange(total, dtype=np.int64) - np.repeat(out_off[:-1], out_lens)
        n_i = lens[row]
        # short rows pass through; long rows take tb evenly-spaced bytes
        src_rel = np.where(
            n_i > tb, (pos * np.maximum(n_i - 1, 0)) // max(tb - 1, 1), pos
        )
        flat = data[np.repeat(off[:-1], out_lens) + src_rel] if total else np.empty(0, np.uint8)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "content": _binary_from_flat(flat, out_off),
                "mime": batch["mime"],
                "meta": batch["meta"],
            }
        )


class FrameSampler:
    """Actor-pool frame/segment sampler stub: slices each payload into
    ``n_frames`` evenly-spaced byte windows (the video-frame-sampling
    access pattern, minus the codec).  Output: one row per (media, frame).

    Fully vectorized: frame starts/lengths computed for the whole batch,
    one segmented gather over the flat payload buffer — no per-row loop."""

    def __init__(self, n_frames: int = 4, frame_bytes: int = 16, codec: str | None = None):
        if codec is not None:
            raise NotImplementedError(f"codec {codec!r} unavailable; stub only")
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, off = _flat_payloads(batch["content"])
        lens = np.diff(off)
        n, nf = len(lens), self.n_frames
        row = np.repeat(np.arange(n, dtype=np.int64), nf)
        f = np.tile(np.arange(nf, dtype=np.int64), n)
        start = (lens[row] * f) // nf
        flen = np.minimum(self.frame_bytes, lens[row] - start)
        out_off = np.concatenate([[0], np.cumsum(flen)])
        total = int(out_off[-1])
        pos = np.arange(total, dtype=np.int64) - np.repeat(out_off[:-1], flen)
        src = np.repeat(off[:-1][row] + start, flen) + pos
        flat = data[src] if total else np.empty(0, np.uint8)
        ids = batch["media_id"].combine_chunks().take(pa.array(row))
        return pa.table(
            {
                "media_id": ids.cast(pa.int64()),
                "frame_idx": pa.array(f),
                "frame": _binary_from_flat(flat, out_off),
            }
        )


# ---------------------------------------------------------------------------
# REAL audio codec — stdlib `wave` (PCM16 WAV), no external libs


def _wav_parse(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse one PCM16 WAV container → ``(rate, channels, int16 samples)``
    — the ONE parser shared by :class:`WavDecoder` and
    :class:`SpectrogramExtractor`, so container validation cannot drift
    between the metadata path and the feature path."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"16-bit PCM WAV only, got {8 * w.getsampwidth()}-bit"
            )
        return (
            w.getframerate(),
            w.getnchannels(),
            np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16),
        )


class SpectrogramExtractor:
    """REAL audio feature extraction: framed magnitude spectrogram via
    numpy rFFT over PCM16 mono WAV clips — the stage a model-input
    (mel/MFCC) pipeline starts from, run as an actor-pool ``map_batches``
    stage.  The window plan is built once per actor (``__init__``); per
    batch the WAV container parse is per FILE (opaque format), then ONE
    fancy-gather builds every frame of every clip and ONE vectorized
    ``rfft`` transforms them all — no per-frame Python loop.

    Output per clip: ``media_id``, ``n_frames`` (full windows at the
    configured hop), ``peak_bin`` (argmax of the mean magnitude spectrum;
    for a pure sine at a bin-aligned frequency this is exactly
    ``freq * n_fft / rate``, which is what the oracle recomputes
    arithmetically — an FFT/windowing bug cannot hash-match).  Clips
    shorter than one window emit ``n_frames=0, peak_bin=-1``.
    """

    def __init__(
        self,
        n_fft: int = 256,
        hop: int = 128,
        payload_col: str = "payload",
        id_col: str = "media_id",
    ):
        if n_fft <= 0 or hop <= 0:
            raise ValueError("n_fft and hop must be positive")
        self._n_fft, self._hop = int(n_fft), int(hop)
        self._win = np.hanning(self._n_fft)  # plan once per actor
        self._payload = payload_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_fft, hop = self._n_fft, self._hop
        sigs: list[np.ndarray] = []
        la = batch[self._payload].combine_chunks()
        for i in range(len(la)):  # per-FILE container parse
            _, channels, samples = _wav_parse(la[i].as_py())
            if channels != 1:
                raise ValueError(
                    "SpectrogramExtractor supports mono PCM only "
                    f"(got {channels} channels)"
                )
            sigs.append(samples)
        n_clips = len(sigs)
        lens = np.array([len(s) for s in sigs], dtype=np.int64)
        k = np.where(lens >= n_fft, 1 + (lens - n_fft) // hop, 0)
        flat = (
            np.concatenate(sigs).astype(np.float64)
            if sigs
            else np.array([], np.float64)
        )
        clip_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        # global frame-start index: clip i contributes k[i] starts at
        # clip_starts[i] + hop*arange(k[i]) — built without a Python loop
        total_frames = int(k.sum())
        peak = np.full(n_clips, -1, dtype=np.int64)
        if total_frames:
            owner = np.repeat(np.arange(n_clips), k)
            local = np.arange(total_frames) - np.repeat(
                np.concatenate([[0], np.cumsum(k)[:-1]]), k
            )
            starts_all = clip_starts[owner] + hop * local
            frames = flat[starts_all[:, None] + np.arange(n_fft)[None, :]]
            mag = np.abs(np.fft.rfft(frames * self._win, axis=1))
            # summed spectrum per clip (argmax-equivalent to the mean):
            # one reduceat over the contiguous frame blocks
            offs = np.concatenate([[0], np.cumsum(k)[:-1]])[k > 0]
            spec = np.add.reduceat(mag, offs, axis=0)
            peak[k > 0] = np.argmax(spec, axis=1)
        return pa.table(
            {
                "media_id": batch[self._id].cast(pa.int64()),
                "n_frames": pa.array(k),
                "peak_bin": pa.array(peak),
            }
        )


class AudioFingerprinter:
    """Acoustic fingerprint as an actor-pool ``map_batches`` stage: split
    each PCM16 mono clip into NON-overlapping ``n_fft`` windows, take the
    per-frame rFFT peak bin (the dominant tone), and fold the peak-bin
    sequence into one 64-bit fingerprint via a POSITION-SALTED splitmix
    xor (order-sensitive yet fully vectorized — no sequential hash
    chain) — the melody-shaped core of a Shazam/Chromaprint-style audio
    near-dup.
    The fingerprint is GAIN-INVARIANT by construction (argmax is
    unchanged under amplitude scaling), so re-mastered / re-normalized
    copies of a clip fingerprint identically and pair at hamming 0
    through :func:`raycdc.dedup.simhash_candidate_pairs`.

    Output: ``media_id``, ``fingerprint`` (int64), ``n_frames``.  Clips
    shorter than one window emit ``n_frames=0`` and the init constant as
    the fingerprint.
    """

    def __init__(
        self,
        n_fft: int = 256,
        payload_col: str = "payload",
        id_col: str = "media_id",
    ):
        if n_fft <= 0:
            raise ValueError("n_fft must be positive")
        self._n_fft = int(n_fft)
        self._win = np.hanning(self._n_fft)  # plan once per actor
        self._payload = payload_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_fft = self._n_fft
        la = batch[self._payload].combine_chunks()
        sigs: list[np.ndarray] = []
        for i in range(len(la)):  # per-FILE container parse
            _, channels, samples = _wav_parse(la[i].as_py())
            if channels != 1:
                raise ValueError(
                    "AudioFingerprinter supports mono PCM only "
                    f"(got {channels} channels)"
                )
            sigs.append(samples)
        lens = np.array([len(s) for s in sigs], dtype=np.int64)
        k = lens // n_fft  # non-overlapping full windows
        fps = np.full(len(sigs), np.uint64(0xCBF29CE484222325))  # init constant
        total = int(k.sum())
        if total:
            frames = np.concatenate(
                [s[: k_i * n_fft] for s, k_i in zip(sigs, k) if k_i]
            ).astype(np.float64).reshape(total, n_fft)
            peaks = np.argmax(
                np.abs(np.fft.rfft(frames * self._win, axis=1)), axis=1
            ).astype(np.uint64)
            # order-sensitive fold WITHOUT a sequential hash chain: salt
            # each peak with its frame position through a splitmix
            # avalanche, then ONE xor-reduceat per clip — a 1-hour clip
            # (230k frames) folds in pure numpy, no per-frame Python loop
            offs = np.concatenate([[0], np.cumsum(k)[:-1]])
            pos = (np.arange(total, dtype=np.uint64)
                   - np.repeat(offs, k).astype(np.uint64))
            h = (
                peaks * np.uint64(0x9E3779B97F4A7C15)
                + pos * np.uint64(0xBF58476D1CE4E5B9)
            )
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(29)
            nz = k > 0
            fps[nz] ^= np.bitwise_xor.reduceat(h, offs[nz])
        return pa.table(
            {
                "media_id": batch[self._id].cast(pa.int64()),
                "fingerprint": pa.array(fps.view(np.int64)),
                "n_frames": pa.array(k),
            }
        )


def synth_melody_wav_batch(
    batch: pa.Table,
    id_col: str = "media_id",
    seed_col: str = "seed",
    notes_col: str = "n_notes",
    amp_col: str = "amp_milli",
    rate: int = 16_000,
    note_samples: int = 256,
) -> pa.Table:
    """Deterministic 'melody' clip synthesis: a sequence of pure sine
    notes, one per ``note_samples`` window, each note's frequency a
    bin-aligned multiple of 125 Hz drawn by a splitmix hash of
    ``(seed, note_idx)`` — the fixture generator for
    :class:`AudioFingerprinter` (frames align with notes, so the peak-bin
    sequence IS the melody).  ``amp_milli`` scales amplitude (‰ of full
    scale): two clips with the same seed and different amplitudes are the
    gain twins the fingerprint must treat as identical."""
    import io
    import wave

    ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    seeds = batch[seed_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    notes = batch[notes_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    amps = batch[amp_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    if (amps <= 0).any() or (amps > 1000).any():
        raise ValueError("amp_milli must be in (0, 1000]")
    payloads = []
    t_local = np.arange(note_samples, dtype=np.float64)
    for i in range(len(ids)):  # per-FILE framing
        n = int(notes[i])
        idx = np.arange(n, dtype=np.uint64)
        h = idx * np.uint64(0xBF58476D1CE4E5B9) + np.uint64(
            (int(seeds[i]) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        )
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        freqs = 125.0 * (2.0 + (h % np.uint64(30)).astype(np.float64))
        # each note spans exactly one analysis window
        pcm = (
            (amps[i] / 1000.0 * 32767.0)
            * np.sin(
                2.0
                * np.pi
                * freqs[:, None]
                * t_local[None, :]
                / float(rate)
            )
        ).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.reshape(-1).tobytes())
        payloads.append(buf.getvalue())
    return pa.table(
        {
            id_col: batch[id_col].cast(pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def synth_wav_batch(
    batch: pa.Table,
    id_col: str = "media_id",
    freq_col: str = "freq_hz",
    ms_col: str = "dur_ms",
    rate_col: str = "rate_hz",
    amp: float = 0.5,
) -> pa.Table:
    """Deterministic PCM16 mono WAV synthesis (sine per clip) — the
    fixture generator for the REAL decode path below.  The sample math is
    one vectorized numpy pass over all clips (flat concatenated sine
    buffer, per-clip offsets); only the WAV container framing is per clip
    (an opaque file format, the same legitimate per-FILE loop as the
    parsers' segment decoders)."""
    import io
    import wave

    ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    freq = batch[freq_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    ms = batch[ms_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    rate = batch[rate_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_samp = rate * ms // 1000
    ends = np.cumsum(n_samp)
    starts = ends - n_samp
    total = int(ends[-1]) if len(ends) else 0
    # global sample index → per-clip local index and parameters
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, n_samp)
    f_row = np.repeat(freq, n_samp).astype(np.float64)
    r_row = np.repeat(rate, n_samp).astype(np.float64)
    pcm = (
        (amp * 32767.0)
        * np.sin(2.0 * np.pi * f_row * local.astype(np.float64) / r_row)
    ).astype(np.int16)
    payloads = []
    for i in range(len(ids)):  # per-FILE container framing only
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(int(rate[i]))
            w.writeframes(pcm[starts[i] : ends[i]].tobytes())
        payloads.append(buf.getvalue())
    return pa.table(
        {id_col: batch[id_col].cast(pa.int64()), "payload": pa.array(payloads, pa.binary())}
    )


class WavDecoder:
    """REAL audio decode as an actor-pool ``map_batches`` stage: parses
    PCM WAV containers with the stdlib ``wave`` module (no external
    codec), emitting per-clip metadata + signal energy.  Construction is
    once per actor (the stateful-stage contract); per batch the container
    parse is per FILE and the energy math is one numpy pass over the
    concatenated samples.

    Output: ``media_id, sample_rate, n_channels, n_samples, duration_ms,
    rms`` (rms floor-quantized to 1e-6 for oracle-stable hashing).
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self._payload = payload_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, chans, counts, frames = [], [], [], []
        la = batch[self._payload].combine_chunks()
        for i in range(len(la)):  # per-FILE container parse
            rate, channels, samples = _wav_parse(la[i].as_py())
            rates.append(rate)
            chans.append(channels)
            counts.append(len(samples) // max(channels, 1))
            frames.append(samples)
        counts_np = np.array(counts, dtype=np.int64)
        rates_np = np.array(rates, dtype=np.int64)
        chans_np = np.array(chans, dtype=np.int64)
        flat = (
            np.concatenate(frames).astype(np.float64)
            if frames
            else np.array([], np.float64)
        )
        n_samples_total = counts_np * chans_np  # frames x channels
        ends = np.cumsum(n_samples_total)
        csum = np.concatenate([[0.0], np.cumsum(flat * flat)])
        sumsq = csum[ends] - csum[np.concatenate([[0], ends[:-1]])]
        with np.errstate(divide="ignore", invalid="ignore"):
            # divide by the SAMPLE count (frames x channels), not frames —
            # multi-channel rms would otherwise inflate by sqrt(channels)
            rms = np.sqrt(sumsq / np.maximum(n_samples_total, 1)) / 32767.0
        return pa.table(
            {
                "media_id": batch[self._id].cast(pa.int64()),
                "sample_rate": pa.array(rates_np),
                "n_channels": pa.array(chans_np),
                "n_samples": pa.array(counts_np),
                "duration_ms": pa.array(counts_np * 1000 // rates_np),
                "rms": pa.array(np.floor(rms * 1e6) / 1e6),
            }
        )


# ---------------------------------------------------------------------------
# REAL image codec — uncompressed 24-bit BMP (pure numpy, no external libs)


class DHashExtractor:
    """Perceptual image fingerprint (difference hash) as an actor-pool
    ``map_batches`` stage: decode BMP → integer luma → nearest-neighbor
    downsample to ``(hash_h, hash_w+1)`` → horizontal gradient sign →
    packed 64-bit hash.  The classic dHash property holds EXACTLY here:
    a global brightness shift (no clipping) preserves every gradient
    sign, so re-exposed copies hash IDENTICALLY, and near-identical
    images land within a few bits — feed the hashes to
    :func:`raycdc.dedup.simhash_candidate_pairs` for banded hamming
    pairing (image near-dup without embeddings).

    Output: ``media_id``, ``dhash`` (int64 bit-pattern of the uint64
    hash).  Integer arithmetic end to end — no float in the hash path.
    """

    def __init__(
        self,
        hash_w: int = 8,
        hash_h: int = 8,
        payload_col: str = "payload",
        id_col: str = "media_id",
    ):
        if hash_w * hash_h != 64:
            raise ValueError("hash_w x hash_h must be 64 (one uint64)")
        self._hw, self._hh = int(hash_w), int(hash_h)
        self._payload = payload_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        la = batch[self._payload].combine_chunks()
        hashes = np.zeros(len(la), dtype=np.uint64)
        for i in range(len(la)):  # per-FILE container parse
            w, h, px = _bmp_parse(np.frombuffer(la[i].as_py(), dtype=np.uint8))
            p = px.astype(np.int64)
            # integer luma; BMP rows are BGR
            gray = (299 * p[:, :, 2] + 587 * p[:, :, 1] + 114 * p[:, :, 0]) // 1000
            rows = (np.arange(self._hh, dtype=np.int64) * h) // self._hh
            cols = (np.arange(self._hw + 1, dtype=np.int64) * w) // (
                self._hw + 1
            )
            small = gray[rows][:, cols]
            bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
            hashes[i] = np.packbits(bits).view(">u8")[0]
        return pa.table(
            {
                "media_id": batch[self._id].cast(pa.int64()),
                "dhash": pa.array(hashes.view(np.int64)),
            }
        )


def synth_pattern_bmp_batch(
    batch: pa.Table,
    id_col: str = "media_id",
    seed_col: str = "seed",
    w_col: str = "width",
    h_col: str = "height",
    shift_col: str = "shift",
) -> pa.Table:
    """Deterministic TEXTURED BMP synthesis (multiplicative-hash pixel
    pattern, all three channels equal so luma == the pattern value) — the
    fixture generator for the dHash path.  ``shift`` adds a global
    brightness offset WITHOUT clipping (pattern values stay ≤ 199, shift
    ≤ 55), so two images with the same seed and different shifts are
    exposure variants whose dHash is bit-identical."""
    ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    seeds = batch[seed_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    ws = batch[w_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    hs = batch[h_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    shifts = batch[shift_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    if (shifts < 0).any() or (shifts > 55).any():
        raise ValueError("shift must be in [0, 55] (no luma clipping)")
    payloads = []
    for i in range(len(ids)):  # per-FILE encode
        x = np.arange(int(ws[i]), dtype=np.uint64)
        y = np.arange(int(hs[i]), dtype=np.uint64)
        # splitmix-style avalanche: a LINEAR pattern would make gradient
        # signs nearly seed-independent (the x-step adds the same constant
        # for every seed) and cross-seed dHashes would collide en masse
        # seed term mixed in python ints (mod 2^64): a numpy SCALAR uint64
        # multiply warns on overflow (array ops wrap silently)
        seed_mix = np.uint64(
            (int(seeds[i]) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        )
        h = (
            y[:, None] * np.uint64(0x9E3779B97F4A7C15)
            + x[None, :] * np.uint64(0xBF58476D1CE4E5B9)
            + seed_mix
        )
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        v = h % np.uint64(200) + np.uint64(int(shifts[i]))
        px = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
        payloads.append(_bmp_encode(px))
    return pa.table(
        {
            id_col: batch[id_col].cast(pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _bmp_encode(px: "np.ndarray") -> bytes:
    """Encode an (h, w, 3) uint8 BGR pixel array as an uncompressed
    24-bit BMP (the ONE encoder shared by the synthesizer and the
    resizer, so header/stride conventions cannot drift)."""
    import struct

    h, w = px.shape[0], px.shape[1]
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = px.reshape(h, 3 * w)
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def _bmp_parse(raw: "np.ndarray") -> tuple[int, int, "np.ndarray"]:
    """Parse an uncompressed 24-bit BMP byte buffer → (w, h, (h, w, 3)
    BGR uint8 pixels) — the ONE parser shared by the decoder and the
    resizer, with uniform validation (magic, bit depth, non-zero area)."""
    if raw[:2].tobytes() != b"BM":
        raise ValueError("not a BMP payload")
    off = int(raw[10:14].view(np.uint32)[0])
    w = int(raw[18:22].view(np.int32)[0])
    h = abs(int(raw[22:26].view(np.int32)[0]))
    bpp = int(raw[28:30].view(np.uint16)[0])
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    if w <= 0 or h <= 0:
        raise ValueError(f"zero-area BMP ({w}x{h})")
    stride = (3 * w + 3) // 4 * 4
    px = raw[off : off + stride * h].reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    return w, h, px


def synth_bmp_batch(
    batch: pa.Table,
    id_col: str = "media_id",
    w_col: str = "width",
    h_col: str = "height",
    rgb_cols: tuple[str, str, str] = ("r", "g", "b"),
) -> pa.Table:
    """Deterministic solid-color 24-bit BMP synthesis — the fixture
    generator for the REAL image decode below.  Container framing is per
    FILE (:func:`_bmp_encode`); the pixel fill is one numpy broadcast per
    clip."""
    ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    ws = batch[w_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    hs = batch[h_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    chans = [
        batch[c].cast(pa.int64()).to_numpy(zero_copy_only=False)
        for c in rgb_cols
    ]
    payloads = []
    for i in range(len(ids)):
        w, h = int(ws[i]), int(hs[i])
        px = np.empty((h, w, 3), dtype=np.uint8)
        px[:, :, 0] = chans[2][i]  # BMP stores BGR
        px[:, :, 1] = chans[1][i]
        px[:, :, 2] = chans[0][i]
        payloads.append(_bmp_encode(px))
    return pa.table(
        {
            id_col: batch[id_col].cast(pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class BmpDecoder:
    """REAL image decode as an actor-pool ``map_batches`` stage: parses
    uncompressed 24-bit BMP containers with numpy (:func:`_bmp_parse`;
    pixel means via one vectorized pass over the de-padded rows).
    Output: ``media_id, width, height, n_pixels, mean_r, mean_g, mean_b``
    (means floor-quantized to 1e-6)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self._payload = payload_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        la = batch[self._payload].combine_chunks()
        ws, hs, means = [], [], []
        for i in range(len(la)):  # per-FILE container parse
            w, h, px = _bmp_parse(np.frombuffer(la[i].as_py(), dtype=np.uint8))
            ws.append(w)
            hs.append(h)
            means.append(px.reshape(-1, 3).astype(np.float64).mean(axis=0))
        m = np.array(means) if means else np.zeros((0, 3))
        ws_np = np.array(ws, np.int64)
        hs_np = np.array(hs, np.int64)
        return pa.table(
            {
                "media_id": batch[self._id].cast(pa.int64()),
                "width": pa.array(ws_np),
                "height": pa.array(hs_np),
                "n_pixels": pa.array(ws_np * hs_np),
                "mean_r": pa.array(np.floor(m[:, 2] * 1e6) / 1e6),
                "mean_g": pa.array(np.floor(m[:, 1] * 1e6) / 1e6),
                "mean_b": pa.array(np.floor(m[:, 0] * 1e6) / 1e6),
            }
        )


# ---------------------------------------------------------------------------
# REAL video codec — uncompressed YUV4MPEG2 (.y4m), pure numpy


_Y4M_MAGIC = b"YUV4MPEG2"
_Y4M_PLANE_FACTOR = {
    # chroma subsampling → bytes per pixel of one frame (Y + U + V)
    "420": 1.5,  # C420, C420jpeg, C420mpeg2, C420paldv share the layout
    "422": 2.0,
    "444": 3.0,
    "mono": 1.0,
}


def _y4m_frame_bytes(w: int, h: int, cs: str) -> int:
    key = "mono" if cs.startswith("mono") else cs[:3]
    factor = _Y4M_PLANE_FACTOR.get(key)
    if factor is None:
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    n = w * h * factor
    if n != int(n):
        raise ValueError(f"odd dimensions {w}x{h} invalid for C{cs}")
    return int(n)


def synth_y4m_batch(
    batch: pa.Table,
    id_col: str = "media_id",
    w_col: str = "width",
    h_col: str = "height",
    frames_col: str = "n_frames",
    base_col: str = "y_base",
) -> pa.Table:
    """Deterministic uncompressed Y4M synthesis — the fixture generator for
    the REAL video frame sampler below.  Frame ``k`` of a clip is a solid
    C420 image with ``Y = (y_base + 7*k) % 256`` (U=128, V=64), so every
    sampled frame's luma mean is EXACTLY reconstructible arithmetically —
    a decode bug cannot hash-match the oracle.  Dimensions must be even
    (C420).  Container framing is per FILE; plane fills are numpy."""
    ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    ws = batch[w_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    hs = batch[h_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    nfs = batch[frames_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    bases = batch[base_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    payloads = []
    for i in range(len(ids)):  # per-FILE container framing
        w, h, nf, base = int(ws[i]), int(hs[i]), int(nfs[i]), int(bases[i])
        if w % 2 or h % 2:
            raise ValueError(f"C420 needs even dimensions, got {w}x{h}")
        chroma = np.empty((w * h) // 2, dtype=np.uint8)
        chroma[: (w * h) // 4] = 128  # U
        chroma[(w * h) // 4 :] = 64  # V
        parts = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h)]
        for k in range(nf):
            parts.append(b"FRAME\n")
            parts.append(
                np.full(w * h, (base + 7 * k) % 256, dtype=np.uint8).tobytes()
            )
            parts.append(chroma.tobytes())
        payloads.append(b"".join(parts))
    return pa.table(
        {
            id_col: batch[id_col].cast(pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class Y4mFrameSampler:
    """REAL video frame sampling as an actor-pool ``map_batches`` stage:
    parses the YUV4MPEG2 container (stream header grammar ``W H F I A C``,
    per-frame ``FRAME`` markers, planar YUV payload) and emits every
    ``step``-th frame's metadata + luma statistics — the frame-sampling
    access pattern of a video ingest pipeline with a real (uncompressed)
    codec, replacing the byte-window :class:`FrameSampler` stub for ``.y4m``
    input (the reference has no video path; this is a north_rule addition).

    Skipped frames are never materialized: the reader SEEKS over them
    (offset arithmetic on the flat buffer), so sampling 1-in-N frames
    reads headers only for the other N-1 — the property that matters when
    a clip is gigabytes.  Output: ``media_id, frame_idx, width, height,
    mean_y`` (floor-quantized to 1e-6).
    """

    def __init__(
        self, step: int = 2, payload_col: str = "payload", id_col: str = "media_id"
    ):
        if step < 1:
            raise ValueError("step must be >= 1")
        self._step = step
        self._payload = payload_col
        self._id = id_col

    def _parse_clip(self, raw: bytes) -> tuple[int, int, list[tuple[int, float]]]:
        if not raw.startswith(_Y4M_MAGIC):
            raise ValueError("not a YUV4MPEG2 payload")
        nl = raw.index(b"\n")
        w = h = None
        cs = "420"
        for tok in raw[len(_Y4M_MAGIC) : nl].split():
            tag, val = chr(tok[0]), tok[1:].decode("ascii")
            if tag == "W":
                w = int(val)
            elif tag == "H":
                h = int(val)
            elif tag == "C":
                cs = val
        if not w or not h:
            raise ValueError("Y4M header missing W/H")
        fsize = _y4m_frame_bytes(w, h, cs)
        buf = np.frombuffer(raw, dtype=np.uint8)
        pos = nl + 1
        out: list[tuple[int, float]] = []
        k = 0
        n = len(raw)
        while pos < n:
            if raw[pos : pos + 5] != b"FRAME":
                raise ValueError(f"bad FRAME marker at byte {pos}")
            fnl = raw.index(b"\n", pos)
            data_start = fnl + 1
            if data_start + fsize > n:
                # a silently-averaged partial plane would be a wrong answer
                raise ValueError(f"truncated frame {k} ({n - data_start}/{fsize} bytes)")
            if k % self._step == 0:
                y = buf[data_start : data_start + w * h]
                out.append((k, float(y.mean()) if len(y) else 0.0))
            pos = data_start + fsize  # seek: skipped frames are never read
            k += 1
        return w, h, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        la = batch[self._payload].combine_chunks()
        ids_in = batch[self._id].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids, fidx, ws, hs, means = [], [], [], [], []
        for i in range(len(la)):  # per-FILE container parse
            w, h, frames = self._parse_clip(la[i].as_py())
            for k, m in frames:
                ids.append(int(ids_in[i]))
                fidx.append(k)
                ws.append(w)
                hs.append(h)
                means.append(m)
        means_np = np.array(means, np.float64) if means else np.zeros(0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "mean_y": pa.array(np.floor(means_np * 1e6) / 1e6),
            }
        )


class BmpResizer:
    """REAL image resize as an actor-pool stage: decode 24-bit BMP
    (:func:`_bmp_parse` — same validation as the decoder) →
    nearest-neighbor resample (two numpy index gathers, no loops over
    pixels) → re-encode (:func:`_bmp_encode`).  Composes with
    :class:`BmpDecoder` downstream."""

    def __init__(
        self,
        target_w: int = 16,
        target_h: int = 16,
        payload_col: str = "payload",
        id_col: str = "media_id",
    ):
        if target_w < 1 or target_h < 1:
            raise ValueError("target dimensions must be >= 1")
        self._w = int(target_w)
        self._h = int(target_h)
        self._payload = payload_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        la = batch[self._payload].combine_chunks()
        tw, th = self._w, self._h
        out = []
        for i in range(len(la)):  # per-FILE container parse + re-frame
            w, h, px = _bmp_parse(np.frombuffer(la[i].as_py(), dtype=np.uint8))
            ys = (np.arange(th) * h // th).astype(np.int64)
            xs = (np.arange(tw) * w // tw).astype(np.int64)
            out.append(_bmp_encode(px[ys][:, xs]))
        return pa.table(
            {
                self._id: batch[self._id].cast(pa.int64()),
                "payload": pa.array(out, pa.binary()),
            }
        )
