"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real and tested: schema, deterministic synthetic
payload generation, Arrow-batched ``mapInPandas`` operators with correct
batch shapes and partitioning.

Codec status (what is REAL vs still FAKE):

  * ``audio/wav``  — REAL decode: stdlib ``wave`` + NumPy (PCM16), 8-dim
    acoustic feature vector (duration, channels, rate, rms, peak, zero-
    crossing rate, mean, std). ``synth_wav_bytes`` emits real RIFF/WAV.
  * ``image/bmp``  — REAL decode: uncompressed 24-bpp BMP parsed with
    struct + NumPy (header, BGR rows, 4-byte row padding, bottom-up
    orientation), 8-dim color feature vector. ``synth_bmp_bytes`` emits
    real BMP bytes.
  * ``image/png``  — REAL decode: stdlib ``zlib`` inflate + per-row
    unfilter (None/Sub/Up/Average/Paeth), 8-bit truecolor RGB/RGBA,
    same 8-dim color feature as BMP (identical pixels => identical
    feature vector, property-tested). ``synth_png_bytes`` emits real
    spec-compliant PNG covering every filter type.
  * ``image/gif``  — REAL decode: pure-Python LZW (variable code width
    with the spec's encoder/decoder off-by-one bump convention, KwKwK
    case, CLEAR resets, 12-bit cap) + global-color-table palette lookup,
    same shared 8-dim color feature. ``synth_gif_bytes`` emits real
    GIF87a with a genuinely LZW-compressed index stream (roundtrip
    property-tested across geometries that force 9->10->11-bit growth
    and table-reset streams).
  * ``image/jpeg`` / ``video/mp4`` — STILL FAKE: JPEG entropy decode and
    video frame extraction need Pillow / PyAV, absent in this container.
    Behind ``DQX_FAKE_DECODE=1`` (default in tests) a deterministic fake
    derives features from payload bytes; without it the operator raises
    NotImplementedError naming the missing dependency.

Swapping a real codec in changes only the inner per-mime function — the
Spark plan, schema and Arrow batching are identical across all three
states, which is exactly the seam the fake path proves.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, payload_sha1 string, n_bytes long, "
    "entropy double, feat array<float>"
)

_FAKE = os.environ.get("DQX_FAKE_DECODE", "1") == "1"


def synth_wav_bytes(
    freq_hz: float = 440.0, ms: int = 200, rate: int = 8000, amp: float = 0.5,
    channels: int = 1,
) -> bytes:
    """REAL PCM16 WAV bytes: a sine tone via the stdlib ``wave`` writer."""
    import io
    import wave

    n = int(rate * ms / 1000)
    t = np.arange(n, dtype=np.float64) / rate
    x = (amp * np.sin(2 * np.pi * freq_hz * t) * 32767.0).astype("<i2")
    if channels > 1:
        x = np.repeat(x, channels)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def synth_bmp_bytes(width: int = 16, height: int = 12, seed: int = 0) -> bytes:
    """REAL uncompressed 24-bpp BMP bytes (BITMAPINFOHEADER, bottom-up,
    4-byte-padded BGR rows) from a seeded pixel field."""
    import struct

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
    row_size = (width * 3 + 3) & ~3
    rows = np.zeros((height, row_size), dtype=np.uint8)
    rows[:, : width * 3] = rgb[::-1, :, ::-1].reshape(height, width * 3)  # bottom-up BGR
    pixel_data = rows.tobytes()
    data_off = 14 + 40
    file_size = data_off + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over a pixel row (int16 math so
    the |p - x| distances don't wrap)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def synth_png_bytes(
    width: int = 16, height: int = 12, seed: int = 0, rgba: bool = False
) -> bytes:
    """REAL spec-compliant PNG bytes (8-bit truecolor) from a seeded
    pixel field. Each scanline uses filter type ``row % 5``, so a corpus
    of synthetic PNGs exercises every unfilter path in the decoder."""
    import struct

    rng = np.random.default_rng(seed)
    channels = 4 if rgba else 3
    px = rng.integers(0, 256, (height, width, channels), dtype=np.uint8)
    bpp = channels
    raw = bytearray()
    prev = np.zeros(width * bpp, dtype=np.uint8)
    for y in range(height):
        row = px[y].reshape(-1)
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
        up_left = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        ftype = y % 5
        if ftype == 0:
            filt = row
        elif ftype == 1:  # Sub
            filt = row - left
        elif ftype == 2:  # Up
            filt = row - prev
        elif ftype == 3:  # Average
            filt = row - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(
                np.uint8
            )
        else:  # Paeth
            filt = row - _paeth(left, prev, up_left)
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6 if rgba else 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes) -> np.ndarray:
    """REAL PNG decode with the stdlib only: chunk walk, zlib inflate,
    per-scanline unfilter (None/Sub/Up/Average/Paeth per the PNG spec).
    Supports 8-bit truecolor (RGB, color type 2) and truecolor+alpha
    (RGBA, type 6), non-interlaced — the shapes a training-data pipeline
    actually stores. Returns (h, w, channels) uint8.
    Sub/Average/Paeth recurrences depend on the just-reconstructed left
    pixel, so those rows reconstruct pixel-group-sequentially; Up rows
    and the Paeth/Average predictors themselves are NumPy-vectorized."""
    import struct

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or ctype not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced truecolor PNG (RGB/RGBA) is decoded "
            "in-container"
        )
    bpp = 4 if ctype == 6 else 3
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        filt = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1)
        if ftype == 0:
            row = filt.copy()
        elif ftype == 2:  # Up
            row = filt + prev
        elif ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            row = filt.reshape(width, bpp).astype(np.uint16)
            np.cumsum(row, axis=0, out=row)
            row = (row & 0xFF).astype(np.uint8).reshape(-1)
        else:  # Average (3) / Paeth (4): left-dependent recurrence
            row = np.empty(stride, dtype=np.uint8)
            zero = np.zeros(bpp, dtype=np.uint8)
            for x in range(width):
                i = x * bpp
                left = row[i - bpp : i] if x else zero
                up = prev[i : i + bpp]
                up_left = prev[i - bpp : i] if x else zero
                if ftype == 3:
                    pred = (
                        (left.astype(np.uint16) + up.astype(np.uint16)) // 2
                    ).astype(np.uint8)
                elif ftype == 4:
                    pred = _paeth(left, up, up_left)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                row[i : i + bpp] = filt[i : i + bpp] + pred
        out[y] = row
        prev = row
    return out.reshape(height, width, bpp)


def _color_features(rgb: np.ndarray) -> np.ndarray:
    """Shared 8-dim color feature for decoded images: [w/4096, h/4096,
    mean_r, mean_g, mean_b, std_gray, min_gray, max_gray] — computed
    from the RGB planes only, so a PNG and a BMP of the SAME pixels
    yield the SAME vector (property-tested)."""
    h, w = rgb.shape[:2]
    rgbf = rgb[..., :3].astype(np.float32)
    gray = rgbf.mean(axis=2)
    return np.array(
        [
            w / 4096.0,
            h / 4096.0,
            rgbf[..., 0].mean() / 255.0,
            rgbf[..., 1].mean() / 255.0,
            rgbf[..., 2].mean() / 255.0,
            gray.std() / 255.0,
            gray.min() / 255.0,
            gray.max() / 255.0,
        ],
        dtype=np.float32,
    )


def _decode_png(payload: bytes) -> np.ndarray:
    return _color_features(decode_png_pixels(payload))


# ------------------------------------------------------------------ GIF

_GIF_MCS = 8  # 256-color global table -> LZW min code size 8
_GIF_CLEAR = 1 << _GIF_MCS
_GIF_END = _GIF_CLEAR + 1
_GIF_MAX_CODE = 4096


def _gif_palette(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed ^ 0x61F)
    return rng.integers(0, 256, (256, 3), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray) -> bytes:
    """Real GIF LZW over 8-bit indices: dict-building compressor with
    variable code width. The encoder is one table insert AHEAD of the
    decoder at each emit, so it bumps its width at next_code ==
    2^width + 1 where the decoder bumps at 2^width — the spec's classic
    off-by-one pairing (roundtrip property tests pin it)."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = _GIF_MCS + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(_GIF_CLEAR)}
    next_code = _GIF_END + 1
    emit(_GIF_CLEAR, width)
    buf = bytes([int(indices[0])])
    for px in indices[1:]:
        nxt = buf + bytes([int(px)])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf], width)
        # reset a little below the 4096 cap: spec-valid and sidesteps
        # the exactly-full-table corner both here and in foreign readers
        if next_code >= _GIF_MAX_CODE - 3:
            # the decoder inserts an entry for the data code just emitted
            # BEFORE it reads this CLEAR — mirror that (virtual) insert so
            # the CLEAR is written at the width the decoder reads it with
            if next_code + 1 == (1 << width) + 1 and width < 12:
                width += 1
            emit(_GIF_CLEAR, width)
            table = {bytes([i]): i for i in range(_GIF_CLEAR)}
            next_code = _GIF_END + 1
            width = _GIF_MCS + 1
        else:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        buf = bytes([int(px)])
    emit(table[buf], width)
    # same virtual-insert rule for END: the decoder's insert for the
    # final data code can bump its width, and END must be written at
    # that bumped width or a byte-aligned stream under-reads it
    if next_code + 1 == (1 << width) + 1 and width < 12:
        width += 1
    emit(_GIF_END, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def synth_gif_bytes(width: int = 16, height: int = 12, seed: int = 0) -> bytes:
    """REAL GIF87a bytes: logical screen descriptor, seeded 256-entry
    global color table, one non-interlaced image, LZW-compressed index
    stream in <=255-byte sub-blocks. Pixel content mixes random rows
    with constant runs so the LZW table genuinely grows."""
    import struct

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, (height, width), dtype=np.uint8)
    idx[::3, :] = rng.integers(0, 8)  # runs every third row: long matches
    palette = _gif_palette(seed)
    lsd = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    lzw = _lzw_encode(idx.reshape(-1))
    blocks = bytearray([_GIF_MCS])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return (
        b"GIF87a" + lsd + palette.tobytes() + img + bytes(blocks) + b"\x3b"
    )


def decode_gif_pixels(payload: bytes) -> np.ndarray:
    """REAL GIF decode with the stdlib only: header + logical screen
    descriptor, global color table, extension skip, full LZW (variable
    width, KwKwK, CLEAR reset, 12-bit cap) and palette lookup to an
    (h, w, 3) uint8 RGB array. Bounds, like the PNG codec's: one
    non-interlaced image, global table only."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    off = 13
    if not packed & 0x80:
        raise ValueError("only global-color-table GIFs are decoded")
    tbl_len = 2 << (packed & 0x07)
    palette = np.frombuffer(payload[off : off + 3 * tbl_len], np.uint8).reshape(-1, 3)
    off += 3 * tbl_len
    while payload[off] == 0x21:  # extensions: skip sub-block chains
        label = payload[off + 1]
        off += 2
        first_block = True
        while payload[off]:
            # a Graphic Control Extension with the transparency flag set
            # would make palette lookups silently WRONG for transparent
            # pixels — refuse loudly like every other unsupported shape
            if label == 0xF9 and first_block and payload[off + 1] & 0x01:
                raise ValueError("transparent GIFs are not decoded here")
            first_block = False
            off += payload[off] + 1
        off += 1
    if payload[off] != 0x2C:
        raise ValueError("expected image descriptor")
    _l, _t, w, h, ipacked = struct.unpack("<HHHHB", payload[off + 1 : off + 10])
    off += 10
    if ipacked & 0xC0:
        raise ValueError("local color tables / interlace not decoded here")
    mcs = payload[off]
    off += 1
    data = bytearray()
    while payload[off]:
        n = payload[off]
        data.extend(payload[off + 1 : off + 1 + n])
        off += n + 1
    clear, end = 1 << mcs, (1 << mcs) + 1
    acc = nbits = pos = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def fresh_table() -> list:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = fresh_table()
    width_bits = mcs + 1
    prev: int | None = None
    while True:
        code = read(width_bits)
        if code == clear:
            table = fresh_table()
            width_bits = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            out.extend(table[code])
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]  # KwKwK
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        if len(table) < _GIF_MAX_CODE:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << width_bits) and width_bits < 12:
                width_bits += 1
        prev = code
    idx = np.frombuffer(bytes(out), np.uint8)
    if len(idx) != w * h:
        raise ValueError("GIF pixel count mismatch")
    return palette[idx.reshape(h, w)]


def _decode_gif(payload: bytes) -> np.ndarray:
    return _color_features(decode_gif_pixels(payload))


def gen_media(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic synthetic media table. Audio payloads are REAL WAV
    bytes; image payloads cycle REAL BMP, PNG and GIF bytes (all
    decodable in-container — the PNGs cover every scanline filter type,
    the GIFs a genuinely LZW-compressed index stream); video payloads
    are seeded pseudo-bytes behind the fake-decode seam."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[rng.integers(0, 3, n)]
    widths = rng.integers(4, 32, n)
    heights = rng.integers(4, 32, n)
    durations = rng.integers(50, 400, n)
    payloads, mime_col = [], []
    for i, k in enumerate(kinds):
        if k == "audio":
            mime_col.append("audio/wav")
            payloads.append(
                synth_wav_bytes(
                    freq_hz=220.0 + (i % 8) * 110.0, ms=int(durations[i]), rate=8000
                )
            )
        elif k == "image":
            if i % 3 == 0:
                mime_col.append("image/bmp")
                payloads.append(
                    synth_bmp_bytes(int(widths[i]), int(heights[i]), seed=i)
                )
            elif i % 3 == 1:
                mime_col.append("image/png")
                payloads.append(
                    synth_png_bytes(
                        int(widths[i]), int(heights[i]), seed=i, rgba=i % 4 == 3
                    )
                )
            else:
                mime_col.append("image/gif")
                payloads.append(
                    synth_gif_bytes(int(widths[i]), int(heights[i]), seed=i)
                )
        else:
            mime_col.append("video/mp4")
            payloads.append(
                rng.integers(0, 256, int(rng.integers(256, 4096)))
                .astype(np.uint8)
                .tobytes()
            )
    return pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "conv_id": [f"conv_{i % 97:08d}" for i in range(n)],
            "kind": kinds,
            "mime": mime_col,
            "payload": payloads,
            "width": np.where(kinds == "image", widths, None),
            "height": np.where(kinds == "image", heights, None),
            "duration_ms": np.where(kinds != "image", durations, None),
        }
    )


def _decode_wav(payload: bytes) -> np.ndarray:
    """REAL audio decode: PCM16 WAV via stdlib ``wave`` + NumPy.

    8-dim feature: [duration_s, n_channels, rate/48k, rms, peak, zcr,
    mean, std] — the per-payload inference the real pipeline would run
    executor-side inside the same Arrow batch.
    """
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        n, ch, rate, width = (
            w.getnframes(),
            w.getnchannels(),
            w.getframerate(),
            w.getsampwidth(),
        )
        raw = w.readframes(n)
    if width != 2:
        raise NotImplementedError("only PCM16 WAV is decoded in-container")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    zcr = (
        float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
        if x.size > 1
        else 0.0
    )
    return np.array(
        [
            n / rate,
            float(ch),
            rate / 48000.0,
            float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0,
            float(np.abs(x).max(initial=0.0)),
            zcr,
            float(x.mean()) if x.size else 0.0,
            float(x.std()) if x.size else 0.0,
        ],
        dtype=np.float32,
    )


def _decode_bmp(payload: bytes) -> np.ndarray:
    """REAL image decode: uncompressed 24-bpp BMP via struct + NumPy
    (header parse, 4-byte row padding, bottom-up order, BGR->RGB).

    8-dim feature: [w/4096, h/4096, mean_r, mean_g, mean_b, std_gray,
    min_gray, max_gray] (channel stats normalized to [0, 1]).
    """
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            "only uncompressed 24-bpp BMP is decoded in-container"
        )
    h = abs(height)
    row_size = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_off
    ).reshape(h, row_size)
    rgb = rows[:, : width * 3].reshape(h, width, 3)[..., ::-1]
    if height > 0:  # positive height = bottom-up storage
        rgb = rgb[::-1]
    return _color_features(rgb)


def _decode_fake(payload: bytes) -> np.ndarray:
    """STUB for the still-fake mimes (image/jpeg, video/mp4): real
    implementations need Pillow / PyAV, absent in this container.

    The deterministic fake derives an 8-dim feature from payload bytes so
    tests exercise the full Arrow round-trip with stable values.
    """
    if not _FAKE:
        raise NotImplementedError(
            "jpeg/video decode requires Pillow/PyAV (not in container)"
        )
    h = hashlib.sha1(payload).digest()
    return np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0


def decode_payload(mime: str, payload: bytes) -> np.ndarray:
    """Route a payload to its codec: WAV, BMP, PNG and GIF decode for
    REAL; the rest (jpeg/mp4) go through the declared
    fake/NotImplementedError seam."""
    if mime == "audio/wav":
        return _decode_wav(payload)
    if mime == "image/bmp":
        return _decode_bmp(payload)
    if mime == "image/png":
        return _decode_png(payload)
    if mime == "image/gif":
        return _decode_gif(payload)
    return _decode_fake(payload)


def _entropy(payload: bytes) -> float:
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(payload)
    return float(-(p * np.log2(p)).sum())


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: batched, executor-local decode."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha1": payloads.map(lambda b: hashlib.sha1(b).hexdigest()),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "entropy": payloads.map(_entropy),
                    "feat": [
                        decode_payload(m, b).tolist()
                        for m, b in zip(pdf["mime"], payloads)
                    ],
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (explode on a
    JVM-side sequence — the decode itself would run in a later mapInPandas).
    """
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .select("media_id", "conv_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ms"))
    )


def payload_integrity(df: DataFrame) -> DataFrame:
    """JVM-side integrity stats: crc + size per kind (no Python)."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.countDistinct(F.crc32("payload")).alias("distinct_payloads"),
    )
