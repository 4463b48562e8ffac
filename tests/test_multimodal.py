"""Multimodal plumbing tests: binary payload schema, actor-pool feature
extraction, frame sampling, codec-stub gating."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from raycdc.multimodal import (
    FrameSampler,
    MediaFeatureExtractor,
    payload_from_text,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def media_table():
    docs = pq.read_table(DOCS, columns=["doc_id", "text"]).slice(0, 40)
    return payload_from_text(docs)


def test_payload_schema_and_bytes(media_table):
    assert media_table.column_names == ["media_id", "content", "mime", "meta"]
    texts = pq.read_table(DOCS, columns=["text"]).slice(0, 40)["text"].to_pylist()
    got = media_table["content"].to_pylist()
    assert got[0] == texts[0].encode()
    meta = media_table["meta"].to_pylist()
    assert meta[0]["n_bytes"] == len(texts[0].encode())


def test_feature_extractor_actor_pool(ray_session, media_table):
    ds = ray.data.from_arrow(media_table)
    feats = ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        concurrency=2,
        batch_size=8,
    ).to_pandas()
    assert len(feats) == 40
    mat = np.stack(feats["features"].to_numpy())
    assert mat.shape == (40, 16)
    # L1-normalized histograms
    np.testing.assert_allclose(mat.sum(axis=1), 1.0, rtol=1e-9)


def test_feature_extractor_deterministic(media_table):
    ex = MediaFeatureExtractor()
    a, b = ex(media_table), ex(media_table)
    assert a.equals(b)


def test_real_codec_fails_fast():
    with pytest.raises(NotImplementedError, match="pillow"):
        MediaFeatureExtractor(codec="pillow")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        FrameSampler(codec="ffmpeg")


def test_frame_sampler_layout(media_table):
    fs = FrameSampler(n_frames=4, frame_bytes=8)
    out = fs(media_table.slice(0, 3))
    assert out.column_names == ["media_id", "frame_idx", "frame"]
    assert len(out) == 12  # 3 media × 4 frames
    content = media_table["content"][0].as_py()
    assert out["frame"][0].as_py() == content[:8]
    # frame 2 starts at size//2
    assert out["frame"][2].as_py() == content[len(content) // 2 :][:8]


def test_resize_and_framesample_match_per_row_reference():
    """The vectorized flat-buffer gathers must equal the naive per-row
    slicing semantics, including empty and shorter-than-target payloads."""
    import numpy as np

    from raycdc.multimodal import FrameSampler, ResizeStub

    payloads = [b"", b"short", bytes(range(200)), b"x" * 64, bytes(range(256)) * 3]
    batch = pa.table(
        {
            "media_id": pa.array(np.arange(len(payloads), dtype=np.int64)),
            "content": pa.array(payloads, pa.binary()),
            "mime": pa.array(["application/octet-stream"] * len(payloads)),
            "meta": pa.array([{"n_bytes": len(p), "kind": "t"} for p in payloads]),
        }
    )
    tb = 16
    out = ResizeStub(target_bytes=tb)(batch)
    for i, p in enumerate(payloads):
        got = out["content"][i].as_py()
        if len(p) <= tb:
            assert got == p
        else:
            idx = (np.arange(tb) * (len(p) - 1)) // (tb - 1)
            assert got == bytes(np.frombuffer(p, np.uint8)[idx])

    nf, fb = 4, 8
    frames = FrameSampler(n_frames=nf, frame_bytes=fb)(batch)
    assert len(frames) == len(payloads) * nf
    k = 0
    for i, p in enumerate(payloads):
        for f in range(nf):
            start = (len(p) * f) // nf
            assert frames["media_id"][k].as_py() == i
            assert frames["frame_idx"][k].as_py() == f
            assert frames["frame"][k].as_py() == p[start : start + fb]
            k += 1


def test_wav_synth_decode_roundtrip():
    """REAL codec: the stdlib-wave decoder recovers exact sample counts,
    rates, and durations from synthesized PCM16 clips, and the sine RMS
    lands at amp/sqrt(2) within quantization error."""
    import math

    import numpy as np

    from raycdc.multimodal import WavDecoder, synth_wav_batch

    t = pa.table(
        {
            "media_id": pa.array([7, 8, 9], pa.int64()),
            "freq_hz": pa.array([440, 1000, 250], pa.int64()),
            "dur_ms": pa.array([50, 80, 125], pa.int64()),
            "rate_hz": pa.array([8000, 16000, 8000], pa.int64()),
        }
    )
    out = WavDecoder()(synth_wav_batch(t))
    assert out["sample_rate"].to_pylist() == [8000, 16000, 8000]
    assert out["n_channels"].to_pylist() == [1, 1, 1]
    assert out["n_samples"].to_pylist() == [400, 1280, 1000]
    assert out["duration_ms"].to_pylist() == [50, 80, 125]
    want = 0.5 / math.sqrt(2)
    assert np.allclose(out["rms"].to_numpy(), want, atol=0.01)
    # empty batch round-trips with the right schema
    empty = WavDecoder()(synth_wav_batch(t.slice(0, 0)))
    assert len(empty) == 0 and "rms" in empty.column_names


def test_bmp_synth_decode_roundtrip():
    """REAL image codec: pure-numpy BMP decode recovers exact dims and
    solid-color channel means, including non-multiple-of-4 widths (row
    padding); corrupt payloads fail fast.  (Gradient means are pinned in
    test_bmp_gradient_mean_and_guards.)"""
    import numpy as np
    import pytest

    from raycdc.multimodal import BmpDecoder, synth_bmp_batch

    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "width": pa.array([10, 33, 8], pa.int64()),   # 33: stride padding
            "height": pa.array([4, 7, 8], pa.int64()),
            "r": pa.array([200, 5, 0], pa.int64()),
            "g": pa.array([100, 50, 128], pa.int64()),
            "b": pa.array([0, 255, 17], pa.int64()),
        }
    )
    out = BmpDecoder()(synth_bmp_batch(t))
    assert out["width"].to_pylist() == [10, 33, 8]
    assert out["n_pixels"].to_pylist() == [40, 231, 64]
    assert out["mean_r"].to_pylist() == [200.0, 5.0, 0.0]
    assert out["mean_g"].to_pylist() == [100.0, 50.0, 128.0]
    assert out["mean_b"].to_pylist() == [0.0, 255.0, 17.0]
    bad = pa.table(
        {"media_id": pa.array([9], pa.int64()),
         "payload": pa.array([b"NOTABMP" * 10], pa.binary())}
    )
    with pytest.raises(ValueError, match="not a BMP"):
        BmpDecoder()(bad)


def test_bmp_resize_chain():
    """Resize: exact target dims, solid color preserved, upscaling and
    downscaling both work, stride padding handled at both sizes."""
    from raycdc.multimodal import BmpDecoder, BmpResizer, synth_bmp_batch

    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "width": pa.array([33, 5], pa.int64()),
            "height": pa.array([21, 3], pa.int64()),
            "r": pa.array([9, 250], pa.int64()),
            "g": pa.array([90, 25], pa.int64()),
            "b": pa.array([190, 2], pa.int64()),
        }
    )
    out = BmpDecoder()(BmpResizer(11, 7)(synth_bmp_batch(t)))
    assert out["width"].to_pylist() == [11, 11]  # 5 -> 11 upscales too
    assert out["height"].to_pylist() == [7, 7]
    assert out["mean_r"].to_pylist() == [9.0, 250.0]
    assert out["mean_b"].to_pylist() == [190.0, 2.0]


def test_bmp_gradient_mean_and_guards():
    """Non-uniform pixels: a hand-encoded horizontal gradient decodes to
    the exact arithmetic mean (pins the de-pad reshape and BGR->RGB
    mapping under real variation); zero-area and non-16-bit-PCM inputs
    fail fast."""
    import io
    import wave

    import numpy as np
    import pytest

    from raycdc.multimodal import BmpDecoder, WavDecoder, _bmp_encode

    # gradient: r = column index, g = 7, b = 255 - column index (w=32, h=3)
    w, h = 32, 3
    col = np.arange(w, dtype=np.uint8)
    px = np.zeros((h, w, 3), dtype=np.uint8)  # BGR order
    px[:, :, 0] = 255 - col
    px[:, :, 1] = 7
    px[:, :, 2] = col
    t = pa.table(
        {"media_id": pa.array([1], pa.int64()),
         "payload": pa.array([_bmp_encode(px)], pa.binary())}
    )
    out = BmpDecoder()(t)
    assert out["mean_r"][0].as_py() == np.floor(col.mean() * 1e6) / 1e6
    assert out["mean_g"][0].as_py() == 7.0
    assert out["mean_b"][0].as_py() == np.floor((255 - col).mean() * 1e6) / 1e6

    # zero-area BMP fails fast instead of emitting NaN means
    with pytest.raises(ValueError, match="zero-area"):
        BmpDecoder()(
            pa.table(
                {"media_id": pa.array([2], pa.int64()),
                 "payload": pa.array(
                     [_bmp_encode(np.zeros((0, 0, 3), np.uint8))], pa.binary()
                 )}
            )
        )

    # 8-bit PCM WAV fails fast instead of mis-decoding
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(1)
        wv.setframerate(8000)
        wv.writeframes(bytes(1000))
    with pytest.raises(ValueError, match="16-bit"):
        WavDecoder()(
            pa.table(
                {"media_id": pa.array([3], pa.int64()),
                 "payload": pa.array([buf.getvalue()], pa.binary())}
            )
        )


def test_wav_multichannel_rms():
    """Stereo PCM: rms divides by samples (frames x channels), so a
    full-scale square wave on both channels reads the same as mono."""
    import io
    import wave

    import numpy as np

    from raycdc.multimodal import WavDecoder

    frames = np.tile(np.array([16000, -16000], np.int16), 500)  # L/R interleaved
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(frames.tobytes())
    out = WavDecoder()(
        pa.table(
            {"media_id": pa.array([1], pa.int64()),
             "payload": pa.array([buf.getvalue()], pa.binary())}
        )
    )
    assert out["n_channels"].to_pylist() == [2]
    assert out["n_samples"].to_pylist() == [500]
    assert abs(out["rms"][0].as_py() - 16000 / 32767) < 1e-4


# --- Y4M video frame sampling (real uncompressed codec) ---------------------


def _clips_table(ids, ws, hs, nfs, bases):
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "n_frames": pa.array(nfs, pa.int64()),
            "y_base": pa.array(bases, pa.int64()),
        }
    )


def test_y4m_synth_sample_roundtrip():
    from raycdc.multimodal import Y4mFrameSampler, synth_y4m_batch

    clips = _clips_table([1, 2], [8, 12], [6, 10], [5, 3], [100, 250])
    vids = synth_y4m_batch(clips)
    out = Y4mFrameSampler(step=2)(vids)
    rows = list(
        zip(
            out["media_id"].to_pylist(),
            out["frame_idx"].to_pylist(),
            out["width"].to_pylist(),
            out["height"].to_pylist(),
            out["mean_y"].to_pylist(),
        )
    )
    # clip 1: frames 0,2,4 of 5; clip 2: frames 0,2 of 3; Y=(base+7k)%256
    assert rows == [
        (1, 0, 8, 6, 100.0),
        (1, 2, 8, 6, 114.0),
        (1, 4, 8, 6, 128.0),
        (2, 0, 12, 10, 250.0),
        (2, 2, 12, 10, (250 + 14) % 256 * 1.0),
    ]


def test_y4m_step_one_samples_every_frame():
    from raycdc.multimodal import Y4mFrameSampler, synth_y4m_batch

    vids = synth_y4m_batch(_clips_table([7], [8], [6], [4], [10]))
    out = Y4mFrameSampler(step=1)(vids)
    assert out["frame_idx"].to_pylist() == [0, 1, 2, 3]


def test_y4m_seek_never_reads_skipped_frames():
    """Corrupt the luma plane of an ODD frame: a step-2 sampler that truly
    seeks must not notice; a step-1 sampler must see the corruption."""
    from raycdc.multimodal import Y4mFrameSampler, synth_y4m_batch

    vids = synth_y4m_batch(_clips_table([1], [8], [6], [4], [0]))
    raw = bytearray(vids["payload"][0].as_py())
    # frame layout: header + 4 x (b"FRAME\n" + 48 Y + 24 UV)
    hdr = raw.index(b"\n") + 1
    frame = 6 + 48 + 24
    # corrupt frame 1's luma
    start = hdr + frame + 6
    raw[start : start + 48] = b"\xff" * 48
    t = pa.table(
        {"media_id": pa.array([1], pa.int64()), "payload": pa.array([bytes(raw)], pa.binary())}
    )
    sampled = Y4mFrameSampler(step=2)(t)
    assert sampled["mean_y"].to_pylist() == [0.0, 14.0]  # untouched frames
    every = Y4mFrameSampler(step=1)(t)
    assert every["mean_y"].to_pylist()[1] == 255.0


def test_y4m_colorspaces_and_errors():
    from raycdc.multimodal import Y4mFrameSampler

    def clip(header: bytes, frames: list[bytes]) -> pa.Table:
        payload = header + b"".join(b"FRAME\n" + f for f in frames)
        return pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
            }
        )

    # C444: 3*w*h per frame; luma first
    t = clip(
        b"YUV4MPEG2 W4 H2 F25:1 C444\n",
        [bytes([50] * 8) + bytes([128] * 8) + bytes([64] * 8)],
    )
    out = Y4mFrameSampler(step=1)(t)
    assert out["mean_y"].to_pylist() == [50.0]
    assert out["width"].to_pylist() == [4]

    # Cmono: w*h per frame
    t = clip(b"YUV4MPEG2 W4 H2 F25:1 Cmono\n", [bytes([9] * 8), bytes([11] * 8)])
    out = Y4mFrameSampler(step=1)(t)
    assert out["mean_y"].to_pylist() == [9.0, 11.0]

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        Y4mFrameSampler()(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([b"RIFFjunk"], pa.binary()),
                }
            )
        )
    with pytest.raises(ValueError, match="unsupported Y4M colorspace"):
        Y4mFrameSampler()(clip(b"YUV4MPEG2 W4 H2 C999\n", [bytes(8)]))
    with pytest.raises(ValueError, match="truncated frame"):
        Y4mFrameSampler()(clip(b"YUV4MPEG2 W4 H2 C444\n", [bytes(8)]))  # short frame
    with pytest.raises(ValueError, match="bad FRAME marker"):
        # frame 0 complete, then garbage instead of the next FRAME marker
        Y4mFrameSampler()(
            clip(b"YUV4MPEG2 W4 H2 C444\n", [bytes(24) + b"JUNKJUNKJUNK" + bytes(24)])
        )


def test_y4m_synth_rejects_odd_dims():
    from raycdc.multimodal import synth_y4m_batch

    with pytest.raises(ValueError, match="even dimensions"):
        synth_y4m_batch(_clips_table([1], [7], [6], [2], [0]))


def test_spectrogram_peak_bin_exact_for_bin_aligned_sines():
    """A bin-aligned sine's peak bin must be EXACTLY freq*n_fft/rate —
    leakage from the hann window is symmetric and cannot move the argmax;
    clips shorter than one window emit n_frames=0, peak_bin=-1."""
    import pyarrow as pa

    from raycdc.multimodal import SpectrogramExtractor, synth_wav_batch

    rate, n_fft, hop = 16_000, 256, 128
    freqs = [500, 1000, 3000, 125 * 31]  # all multiples of 62.5 Hz
    clips = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "freq_hz": pa.array(freqs + [440], pa.int64()),
            "dur_ms": pa.array([80, 50, 100, 64, 10], pa.int64()),  # 10ms < 1 window
            "rate_hz": pa.array([rate] * 5, pa.int64()),
        }
    )
    wavs = synth_wav_batch(clips)
    out = SpectrogramExtractor(n_fft=n_fft, hop=hop)(wavs)
    got = {
        m: (n, p)
        for m, n, p in zip(
            out["media_id"].to_pylist(),
            out["n_frames"].to_pylist(),
            out["peak_bin"].to_pylist(),
        )
    }
    for mid, f, ms in ((1, 500, 80), (2, 1000, 50), (3, 3000, 100), (4, 3875, 64)):
        n = rate * ms // 1000
        assert got[mid] == (1 + (n - n_fft) // hop, f * n_fft // rate)
    assert got[5] == (0, -1)  # sub-window clip: no frames, sentinel bin


def test_dhash_exposure_invariant_and_seed_decorrelated():
    """The dHash contract: a global brightness shift (no clipping) flips
    ZERO bits; distinct textures give ~uniform hashes (hamming near 32,
    never near 0); shift validation rejects clipping territory."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from raycdc.multimodal import DHashExtractor, synth_pattern_bmp_batch

    seeds = [7, 7, 99, 100, 101]
    t = pa.table(
        {
            "media_id": pa.array(list(range(1, 6)), pa.int64()),
            "seed": pa.array(seeds, pa.int64()),
            "width": pa.array([40] * 5, pa.int64()),
            "height": pa.array([30] * 5, pa.int64()),
            "shift": pa.array([0, 55, 0, 0, 0], pa.int64()),
        }
    )
    out = DHashExtractor()(synth_pattern_bmp_batch(t))
    h = np.array(out["dhash"].to_pylist(), dtype=np.int64).view(np.uint64)
    assert h[0] == h[1]  # exposure twin: bit-identical
    for i, j in ((0, 2), (2, 3), (3, 4)):
        d = int(bin(int(h[i] ^ h[j])).count("1"))
        assert 10 <= d <= 54, (i, j, d)  # distinct seeds decorrelate
    with _pytest.raises(ValueError, match="no luma clipping"):
        synth_pattern_bmp_batch(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "seed": pa.array([1], pa.int64()),
                    "width": pa.array([8], pa.int64()),
                    "height": pa.array([8], pa.int64()),
                    "shift": pa.array([99], pa.int64()),
                }
            )
        )
    with _pytest.raises(ValueError, match="must be 64"):
        DHashExtractor(hash_w=5, hash_h=5)


def test_audio_fingerprint_gain_invariant_and_melody_sensitive():
    """Fingerprint contract: gain scaling flips ZERO bits (argmax per
    frame is amplitude-invariant); any note change gives a different
    fingerprint; sub-window clips emit n_frames=0 with the init-constant fingerprint;
    multichannel input is rejected."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from raycdc.multimodal import (
        AudioFingerprinter,
        synth_melody_wav_batch,
        synth_wav_batch,
    )

    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "seed": pa.array([9, 9, 9, 10], pa.int64()),
            "n_notes": pa.array([16, 16, 8, 16], pa.int64()),
            "amp_milli": pa.array([500, 50, 500, 500], pa.int64()),
        }
    )
    out = AudioFingerprinter()(synth_melody_wav_batch(t))
    f = dict(zip(out["media_id"].to_pylist(), out["fingerprint"].to_pylist()))
    n = dict(zip(out["media_id"].to_pylist(), out["n_frames"].to_pylist()))
    assert f[1] == f[2]  # 10x gain difference: identical fingerprint
    assert f[1] != f[3]  # prefix melody (8 notes) differs
    assert f[1] != f[4]  # different seed differs
    assert n[1] == 16 and n[3] == 8
    # sub-window clip: zero frames, init-constant fingerprint
    tiny = synth_wav_batch(
        pa.table(
            {
                "media_id": pa.array([7], pa.int64()),
                "freq_hz": pa.array([500], pa.int64()),
                "dur_ms": pa.array([10], pa.int64()),  # 160 samples < 256
                "rate_hz": pa.array([16_000], pa.int64()),
            }
        )
    )
    out2 = AudioFingerprinter()(tiny)
    assert out2["n_frames"].to_pylist() == [0]
    with _pytest.raises(ValueError, match="amp_milli"):
        synth_melody_wav_batch(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "seed": pa.array([1], pa.int64()),
                    "n_notes": pa.array([4], pa.int64()),
                    "amp_milli": pa.array([0], pa.int64()),
                }
            )
        )
