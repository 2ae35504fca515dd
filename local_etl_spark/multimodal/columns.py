"""Multimodal column handling (SURVEY.md §2.4-J, `llm_multimodal`).

Convention: media travels as an opaque ``binary`` payload column plus
typed metadata (modality, mime) — the layout every large-scale training
pipeline converges on (media bytes stay columnar next to their
features; no filesystem side-channel).

The payloads are REAL media bytes in three pure-Python-decodable
container formats, and the decode kernel parses them for real — no
faked headers, no NotImplementedError:

  image  binary PPM (P6): "P6\\n{w} {h}\\n255\\n" + w*h*3 RGB bytes
  audio  WAV (RIFF/PCM16 mono): canonical 44-byte header + samples
  video  YUV4MPEG2 (Y4M): stream header + FRAME-delimited 4:2:0 frames

These are the actual on-disk formats (netpbm, RIFF WAVE, mjpegtools
y4m) — a PPM produced here opens in any image viewer. Heavyweight
codecs (JPEG/FLAC/H.264) would need external libraries; the container
has none, and the *Spark-side* contract — BinaryType columns, Arrow
batch transfer, mapInPandas fan-out, schema discipline — is identical
whichever kernel sits inside the batch loop.

Scale notes: mapInPandas streams Arrow batches — one Python worker per
core per partition, no driver involvement, and payload bytes cross to
Python once. Real deployments additionally cap
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
10 MB videos doesn't materialize as one giant Arrow batch. Synthesis
here is also a mapInPandas kernel (bytes are built row-local in the
executors); a production pipeline reads the payload column straight
off parquet instead.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_units", T.IntegerType()),  # pixels/samples/frames
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_val", T.DoubleType()),
        T.StructField("payload_sha", T.StringType()),
    ]
)

WAV_RATE = 8000


def media_dims(doc_id: int) -> dict:
    """Deterministic per-doc media geometry (shared by generator, real
    decoder tests, and the frame-sample ground truth)."""
    modality = ("image", "audio", "video")[doc_id % 3]
    return {
        "modality": modality,
        # image
        "img_w": doc_id % 30 + 2,
        "img_h": doc_id % 20 + 2,
        # audio
        "n_samples": doc_id % 256 + 16,
        # video (4:2:0 needs even dims)
        "vid_w": 2 * (doc_id % 8 + 1),
        "vid_h": 2 * (doc_id % 6 + 1),
        "n_frames": doc_id % 24 + 2,
    }


def _gen_payload(doc_id: int, text: str) -> tuple[str, bytes]:
    """Build a REAL media file for one row, seeded by the text bytes."""
    d = media_dims(doc_id)
    seed = text.encode() or b"\x00"

    def fill(n: int) -> bytes:
        reps = n // len(seed) + 1
        return (seed * reps)[:n]

    if d["modality"] == "image":
        w, h = d["img_w"], d["img_h"]
        return "image", b"P6\n%d %d\n255\n" % (w, h) + fill(w * h * 3)
    if d["modality"] == "audio":
        n = d["n_samples"]
        pcm = fill(2 * n)
        hdr = (
            b"RIFF"
            + struct.pack("<I", 36 + len(pcm))
            + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
            + b"data"
            + struct.pack("<I", len(pcm))
        )
        return "audio", hdr + pcm
    w, h, nf = d["vid_w"], d["vid_h"], d["n_frames"]
    frame_len = w * h * 3 // 2  # YUV 4:2:0
    body = b"".join(b"FRAME\n" + fill(frame_len) for _ in range(nf))
    hdr = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h)
    return "video", hdr + body


_MODALITY_IDX = {"image": 0, "audio": 1, "video": 2}


def synthesize_media(
    docs: DataFrame, modality: str | None = None
) -> DataFrame:
    """Deterministic real-format media table from `documents`.

    ``modality`` pre-filters the doc side to one modality's rows.
    Modality is a pure function of doc_id (media_dims: doc_id % 3), so
    a modality-specific consumer — image hashing, audio
    fingerprinting, scene cuts — can skip synthesizing the other two
    thirds entirely instead of paying full payload construction (video
    frames are the most expensive to build) for rows its kernel drops
    on arrival. Spark cannot push this filter below the opaque
    mapInPandas itself (guide §2.3/§4.1 — project/filter before the
    Python boundary), so the filter is applied to the INPUT relation;
    the synthesized rows for the kept modality are byte-identical to
    the unfiltered run's."""

    def gen(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            mods, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                m, p = _gen_payload(int(doc_id), str(text))
                mods.append(m)
                payloads.append(p)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "modality": mods, "payload": payloads}
            )

    src = docs.select("doc_id", "text")
    if modality is not None:
        from pyspark.sql import functions as F

        src = src.filter(
            F.pmod(F.col("doc_id"), F.lit(3)) == _MODALITY_IDX[modality]
        )
    return src.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _ppm_header(raw: bytes) -> tuple[int, int, int]:
    """P6 header walk (ASCII tokens, '#' comments, single whitespace
    after maxval) → (width, height, pixel-plane offset)."""
    if raw[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end of line
            while raw[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return w, h, pos


def decode_ppm(raw: bytes) -> dict:
    """Parse a binary PPM (P6): netpbm header grammar + RGB plane."""
    w, h, pos = _ppm_header(raw)
    pixels = raw[pos : pos + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError("truncated pixel plane")
    return {
        "format": "ppm",
        "width": w,
        "height": h,
        "channels": 3,
        "n_units": w * h,
        "mean_val": sum(pixels) / len(pixels) if pixels else 0.0,
    }


def ppm_gray_grid(raw: bytes, gw: int, gh: int) -> list[list[int]]:
    """Grayscale gw×gh grid from a P6 PPM via nearest-neighbor
    sampling: grid cell (x, y) reads the source pixel at
    (x·w//gw, y·h//gh); gray = (r+g+b)//3 (integer — every step is
    exact, so the hashes are bit-reproducible anywhere)."""
    w, h, pos = _ppm_header(raw)
    grid = []
    for y in range(gh):
        sy = y * h // gh
        row = []
        for x in range(gw):
            sx = x * w // gw
            o = pos + (sy * w + sx) * 3
            row.append((raw[o] + raw[o + 1] + raw[o + 2]) // 3)
        grid.append(row)
    return grid


def ahash64(raw: bytes) -> int:
    """Average hash: 8×8 grayscale grid, bit i set iff cell i is
    STRICTLY above the integer mean of the 64 cells (row-major,
    MSB-first). Integer mean keeps the threshold exact."""
    g = ppm_gray_grid(raw, 8, 8)
    cells = [v for row in g for v in row]
    mean = sum(cells) // 64
    bits = 0
    for v in cells:
        bits = (bits << 1) | (1 if v > mean else 0)
    return bits


def dhash64(raw: bytes) -> int:
    """Difference hash: 9×8 grayscale grid, bit set iff the left cell
    is strictly brighter than its right neighbor (horizontal gradient
    signs — robust to global brightness shifts aHash is blind to)."""
    g = ppm_gray_grid(raw, 9, 8)
    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | (1 if g[y][x] > g[y][x + 1] else 0)
    return bits


def decode_wav(raw: bytes) -> dict:
    """Parse RIFF/WAVE: walk chunks, read fmt (PCM only), mean |sample|
    over the data chunk."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = raw[pos : pos + 4], struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only PCM16 supported")
    n = len(data) // (2 * n_ch)
    samples = struct.unpack("<%dh" % (n * n_ch), data[: 2 * n * n_ch])
    return {
        "format": "wav",
        "width": rate,  # sample rate in the width slot (audio has no dims)
        "height": bits,
        "channels": n_ch,
        "n_units": n,
        "mean_val": sum(abs(s) for s in samples) / len(samples) if samples else 0.0,
    }


def decode_y4m(raw: bytes) -> dict:
    """Parse YUV4MPEG2: stream-header params, then frame offsets walked
    by exact 4:2:0 frame size (offset math, not marker search)."""
    nl = raw.index(b"\n")
    head = raw[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError("not a Y4M stream")
    params = {p[:1]: p[1:] for p in head[1:] if p}
    w, h = int(params[b"W"]), int(params[b"H"])
    if params.get(b"C", b"420").startswith(b"420") is False:
        raise ValueError("only 4:2:0 supported")
    frame_len = w * h * 3 // 2
    pos, frames, ysum, ycount = nl + 1, 0, 0, 0
    while pos < len(raw):
        fnl = raw.index(b"\n", pos)  # FRAME + optional params
        if raw[pos : pos + 5] != b"FRAME":
            raise ValueError("bad frame marker")
        y = raw[fnl + 1 : fnl + 1 + w * h]  # luma plane only for stats
        ysum += sum(y)
        ycount += len(y)
        frames += 1
        pos = fnl + 1 + frame_len
    return {
        "format": "y4m",
        "width": w,
        "height": h,
        "channels": 3,
        "n_units": frames,
        "mean_val": ysum / ycount if ycount else 0.0,
    }


def decode_payload(raw: bytes) -> dict:
    """Sniff the container magic and dispatch to the real parser."""
    if raw[:2] == b"P6":
        return decode_ppm(raw)
    if raw[:4] == b"RIFF":
        return decode_wav(raw)
    if raw[:9] == b"YUV4MPEG2":
        return decode_y4m(raw)
    raise ValueError("unknown media container")


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary payload → typed metadata + stats.

    The kernel is a real container parse (magic sniff → PPM/WAV/Y4M
    grammar) per payload; sha1 content-addresses the full file bytes.
    """

    def decode_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in DECODED_SCHEMA.fields}
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                raw = bytes(payload)
                meta = decode_payload(raw)
                out["doc_id"].append(doc_id)
                out["modality"].append(modality)
                out["format"].append(meta["format"])
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["channels"].append(meta["channels"])
                out["n_units"].append(meta["n_units"])
                out["n_bytes"].append(len(raw))
                out["mean_val"].append(float(meta["mean_val"]))
                out["payload_sha"].append(hashlib.sha1(raw).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Real video frame sampling: walk the Y4M stream, emit one row per
    sampled frame with the sha1 of that frame's actual YUV bytes (the
    row-per-frame fan-out downstream batching consumes). Non-video
    payloads contribute their single 'frame' (the whole payload)."""

    def sample_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in FRAME_SCHEMA.fields}

            def emit(doc_id, modality, idx, blob):
                out["doc_id"].append(doc_id)
                out["modality"].append(modality)
                out["frame_idx"].append(idx)
                out["frame_sha"].append(hashlib.sha1(blob).hexdigest())

            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                raw = bytes(payload)
                if raw[:9] != b"YUV4MPEG2":
                    emit(doc_id, modality, 0, raw)
                    continue
                nl = raw.index(b"\n")
                params = {p[:1]: p[1:] for p in raw[:nl].split(b" ")[1:] if p}
                frame_len = int(params[b"W"]) * int(params[b"H"]) * 3 // 2
                pos, idx = nl + 1, 0
                while pos < len(raw):
                    fnl = raw.index(b"\n", pos)
                    frame = raw[fnl + 1 : fnl + 1 + frame_len]
                    if idx % every_n == 0:
                        emit(doc_id, modality, idx, frame)
                    idx += 1
                    pos = fnl + 1 + frame_len
            yield pd.DataFrame(out)

    return media.mapInPandas(sample_batches, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("resized_sha", T.StringType()),
    ]
)


def resize_ppm(raw: bytes, factor: int) -> bytes:
    """REAL nearest-neighbor downscale of a P6 PPM: sample every
    `factor`-th pixel row/column and re-emit a well-formed smaller PPM
    (opens in any image viewer, like the originals)."""
    meta = decode_ppm(raw)
    w, h = meta["width"], meta["height"]
    header_end = len(raw) - w * h * 3
    pixels = raw[header_end:]
    nw, nh = max(1, w // factor), max(1, h // factor)
    rows = []
    for y in range(nh):
        sy = y * factor
        row = bytearray()
        for x in range(nw):
            sx = x * factor
            off = (sy * w + sx) * 3
            row += pixels[off : off + 3]
        rows.append(bytes(row))
    return b"P6\n%d %d\n255\n" % (nw, nh) + b"".join(rows)


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Arrow-batched image resize over the media table (image rows
    only): the downsample step of a vision-pretraining pipeline. The
    kernel re-encodes a real PPM, so downstream stages can re-decode
    the output payload with the same parser."""

    def resize_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in RESIZED_SCHEMA.fields}
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "image":
                    continue
                raw = bytes(payload)
                src = decode_ppm(raw)
                small = resize_ppm(raw, factor)
                meta = decode_ppm(small)
                out["doc_id"].append(doc_id)
                out["src_width"].append(src["width"])
                out["src_height"].append(src["height"])
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["n_bytes"].append(len(small))
                out["resized_sha"].append(hashlib.sha1(small).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def wav_windows(raw: bytes, win: int) -> list[dict]:
    """Per-window RMS energy + peak amplitude over a WAV's PCM16
    stream — the frame-level feature extraction in front of any audio
    model. Pure-integer moments; one sqrt per window."""
    import math

    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, data = 12, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        if cid == b"data":
            data = raw[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("missing data chunk")
    n = len(data) // 2
    samples = struct.unpack("<%dh" % n, data[: 2 * n])
    out = []
    for i in range(0, n, win):
        chunk = samples[i : i + win]
        ss = sum(s * s for s in chunk)
        out.append(
            {
                "win_idx": i // win,
                "n_samples": len(chunk),
                "rms": math.sqrt(ss / len(chunk)),
                "peak": max(abs(s) for s in chunk),
            }
        )
    return out


def audio_features(media: DataFrame, win: int = 64) -> DataFrame:
    """Arrow-batched audio feature extraction (audio rows only): one
    row per fixed-size sample window with RMS energy and peak — the
    row-per-frame fan-out shape shared with frame_sample."""

    def feature_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURE_SCHEMA.fields}
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "audio":
                    continue
                for w in wav_windows(bytes(payload), win):
                    out["doc_id"].append(doc_id)
                    out["win_idx"].append(w["win_idx"])
                    out["n_samples"].append(w["n_samples"])
                    out["rms"].append(w["rms"])
                    out["peak"].append(w["peak"])
            yield pd.DataFrame(out)

    return media.mapInPandas(feature_batches, schema=AUDIO_FEATURE_SCHEMA)


SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("mad", T.DoubleType()),
        T.StructField("is_cut", T.IntegerType()),
    ]
)

SCENE_CUT_MAD = 48.0


def y4m_scene_diffs(raw: bytes) -> list[dict]:
    """Mean-absolute-difference between consecutive luma planes of a
    real Y4M stream — the shot-boundary signal of video preprocessing.
    One row per frame transition; a transition whose luma MAD exceeds
    SCENE_CUT_MAD is a cut candidate."""
    nl = raw.index(b"\n")
    params = {p[:1]: p[1:] for p in raw[:nl].split(b" ")[1:] if p}
    w, h = int(params[b"W"]), int(params[b"H"])
    frame_len = w * h * 3 // 2
    pos, prev, idx, out = nl + 1, None, 0, []
    while pos < len(raw):
        fnl = raw.index(b"\n", pos)
        if raw[pos : pos + 5] != b"FRAME":
            raise ValueError("bad frame marker")
        luma = raw[fnl + 1 : fnl + 1 + w * h]
        if prev is not None:
            mad = sum(abs(a - b) for a, b in zip(luma, prev)) / len(luma)
            out.append(
                {"frame_idx": idx, "mad": mad, "is_cut": int(mad > SCENE_CUT_MAD)}
            )
        prev = luma
        idx += 1
        pos = fnl + 1 + frame_len
    return out


def scene_cuts(media: DataFrame) -> DataFrame:
    """Arrow-batched scene-cut detection (video rows only): walks each
    Y4M stream once, emitting one row per frame transition."""

    def scene_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in SCENE_SCHEMA.fields}
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "video":
                    continue
                for d in y4m_scene_diffs(bytes(payload)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(d["frame_idx"])
                    out["mad"].append(d["mad"])
                    out["is_cut"].append(d["is_cut"])
            yield pd.DataFrame(out)

    return media.mapInPandas(scene_batches, schema=SCENE_SCHEMA)


IMAGE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("ahash_hex", T.StringType()),
        T.StructField("dhash_hex", T.StringType()),
    ]
)


def image_hashes(media: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing over the media table's image
    rows: aHash (8×8 mean threshold) + dHash (9×8 horizontal gradient)
    from the REAL P6 pixel plane — the content-defined image signature
    in front of any vision dedup (exact byte hashes miss re-encodes;
    these survive them). All-integer arithmetic, so the 64-bit values
    are bit-reproducible on any platform; the LongType columns carry
    the two's-complement form for JVM-side bit ops (xor/bit_count),
    the hex columns the unsigned spelling."""

    def hash_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        def signed(u: int) -> int:
            return u - (1 << 64) if u >= (1 << 63) else u

        for pdf in batches:
            out = {k.name: [] for k in IMAGE_HASH_SCHEMA.fields}
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "image":
                    continue
                raw = bytes(payload)
                w, h, _ = _ppm_header(raw)
                a, d = ahash64(raw), dhash64(raw)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(signed(a))
                out["dhash"].append(signed(d))
                out["ahash_hex"].append(f"{a:016x}")
                out["dhash_hex"].append(f"{d:016x}")
            yield pd.DataFrame(out)

    return media.mapInPandas(hash_batches, schema=IMAGE_HASH_SCHEMA)


# --- audio fingerprint (round 10: energy-envelope dHash) ---------------

AUDIO_FP_BANDS = 65  # 65 band energies -> 64 sign-of-delta bits


def _wav_pcm16(raw: bytes) -> tuple:
    """PCM16 sample tuple from a RIFF/WAVE byte string (the
    wav_windows chunk walk, factored for reuse)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, data = 12, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        if cid == b"data":
            data = raw[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("missing data chunk")
    n = len(data) // 2
    return struct.unpack("<%dh" % n, data[: 2 * n])


def audio_fp64(raw: bytes) -> int:
    """64-bit energy-envelope fingerprint of a WAV stream: split the
    PCM16 samples into AUDIO_FP_BANDS time bands (band i covers
    samples [i·n/B, (i+1)·n/B) — length-normalized, so the signature
    compares streams of different durations), take each band's energy
    (exact integer sum of squares), and emit the dHash of the
    envelope: bit i = 1 iff energy[i+1] > energy[i]. Sign-of-delta is
    the loudness CONTOUR — robust to uniform gain (scaling all
    samples preserves every comparison), which is exactly why
    industrial audio fingerprints (Haitsma–Kalker/Shazam family) hash
    energy differences rather than energies. All-integer, so the
    value is bit-reproducible on any platform."""
    samples = _wav_pcm16(raw)
    n = len(samples)
    b = AUDIO_FP_BANDS
    energies = []
    for i in range(b):
        lo, hi = i * n // b, (i + 1) * n // b
        energies.append(sum(s * s for s in samples[lo:hi]))
    fp = 0
    for i in range(b - 1):
        if energies[i + 1] > energies[i]:
            fp |= 1 << i
    return fp


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("fp", T.LongType()),
        T.StructField("fp_hex", T.StringType()),
    ]
)


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """Arrow-batched audio fingerprinting over the media table's audio
    rows: one 64-bit energy-envelope dHash per stream (audio_fp64).
    LongType carries the two's-complement form for JVM bit ops
    (xor/bit_count), fp_hex the unsigned spelling."""

    def fp_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        def signed(u: int) -> int:
            return u - (1 << 64) if u >= (1 << 63) else u

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FP_SCHEMA.fields}
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "audio":
                    continue
                raw = bytes(payload)
                u = audio_fp64(raw)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(_wav_pcm16(raw)))
                out["fp"].append(signed(u))
                out["fp_hex"].append(f"{u:016x}")
            yield pd.DataFrame(out)

    return media.mapInPandas(fp_batches, schema=AUDIO_FP_SCHEMA)
