"""Multimodal (binary payload) columns — SURVEY.md §7 M5 / task brief.

Media assets are opaque ``binary`` columns with typed metadata. The
Spark-side plumbing is real and tested: Arrow-batched ``mapInPandas``
with an explicit output schema, payload-size–aware batching, and
deterministic feature extraction. :func:`decode_media` REALLY decodes
WAV audio — integer PCM (stdlib ``wave`` — 8/16/24/32-bit, any channel
count), IEEE float (format tag 3: float32/float64), and
WAVE_FORMAT_EXTENSIBLE wrapping either, via a direct chunk walk; see
``audio_frame_energy(decode=True)``. It also REALLY decodes baseline
PNG images (zlib inflate + the five scanline filters, pure stdlib —
:func:`_decode_png` — the full decode surface: palette via PLTE
lookup, 1/2/4-bit sub-byte unpacking, 16-bit at native uint16 range,
and Adam7 interlace; every legal IHDR combination decodes).
Compressed codecs (JPEG/MP4/Ogg/FLAC/MP3)
refuse loudly naming the library a real deployment plugs in — the
sandbox has none of them, and every downstream stage keeps working
either way.

Scale notes: payloads never pass through Python row-at-a-time — Arrow
moves whole batches; ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds batch memory when payloads are large (set it so batch ≈ tens of
MB). The feature extractor emits fixed-width vectors, so the output
parquet is columnar-friendly and join-able with the embeddings path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import spread_small_input

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, digest string, fake_width int, fake_height int, "
    "features array<double>"
)


#: container magic → human name, for the refusal message when the codec
#: library is genuinely absent in this environment. PNG is NOT here:
#: its baseline forms decode natively (zlib inflate + the five scanline
#: filters — see :func:`_decode_png`).
_KNOWN_MAGICS = (
    (b"\xff\xd8\xff", "JPEG image (needs PIL/pillow)"),
    (b"GIF8", "GIF image (needs PIL/pillow)"),
    (b"OggS", "Ogg audio (needs soundfile/libsndfile)"),
    (b"fLaC", "FLAC audio (needs soundfile/libsndfile)"),
    (b"ID3", "MP3 audio (needs ffmpeg/audioread)"),
)


#: WAVE_FORMAT_EXTENSIBLE SubFormat GUIDs whose payloads decode natively
#: (the first 2 GUID bytes are the classic format tag, little-endian)
_KSDATA_SUFFIX = bytes.fromhex("000000001000800000aa00389b71")
_SUBFORMAT_PCM = bytes((1, 0)) + _KSDATA_SUFFIX
_SUBFORMAT_FLOAT = bytes((3, 0)) + _KSDATA_SUFFIX


def _wav_chunks(buf: bytes) -> tuple[bytes | None, bytes | None]:
    """(fmt_body, data_body) from a RIFF/WAVE buffer; a chunk whose
    declared size overruns the buffer is corruption, and so is a
    duplicated fmt /data chunk — RIFF/WAVE defines exactly one of each,
    and keeping either copy would let classification (:func:`_wav_tags`
    reads the FIRST fmt) and decode disagree about the header."""
    import struct

    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(
                f"corrupt RIFF/WAVE container: chunk {cid!r} claims {size} "
                f"bytes but only {len(body)} remain"
            )
        if cid == b"fmt ":
            if fmt is not None:
                raise ValueError(
                    "corrupt RIFF/WAVE container: duplicate fmt chunk"
                )
            fmt = body
        elif cid == b"data":
            if data is not None:
                raise ValueError(
                    "corrupt RIFF/WAVE container: duplicate data chunk"
                )
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    return fmt, data


def _pcm_samples(raw: bytes, width: int):
    """Flat signed integer samples from little-endian PCM bytes, shared
    by the stdlib-``wave`` and direct-chunk-walk decode paths: 8-bit
    (stored unsigned) is centered on zero like every other width, 24-bit
    unpacks from its packed 3-byte layout, and a byte tail shorter than
    one sample is truncated rather than crashed on."""
    import numpy as np

    if width not in (1, 2, 3, 4):
        raise ValueError(f"unsupported WAV sample width: {width} bytes")
    raw = raw[: len(raw) - len(raw) % width]
    if width == 1:
        return np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    if width == 2:
        return np.frombuffer(raw, dtype="<i2").astype(np.int32)
    if width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        s = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        return np.where(s >= 1 << 23, s - (1 << 24), s)
    return np.frombuffer(raw, dtype="<i4").astype(np.int64)


def _decode_raw_wav(buf: bytes, effective_tag: int) -> dict:
    """Decode a RIFF/WAVE payload by walking the chunk list directly —
    for the fmt variants the stdlib ``wave`` module refuses but that
    need no codec: IEEE float (tag 3) and WAVE_FORMAT_EXTENSIBLE wrapping
    PCM or float (``effective_tag`` is the resolved SubFormat tag).

    Only called for containers whose tag is already known decodable, so
    every failure here is corruption, not a codec gap.
    """
    import struct

    import numpy as np

    fmt, data = _wav_chunks(buf)
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError(
            "corrupt RIFF/WAVE container: missing or truncated fmt /data chunk"
        )
    _tag, n_channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if n_channels < 1:
        raise ValueError("corrupt RIFF/WAVE container: fmt claims 0 channels")
    if effective_tag == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(data[: len(data) - len(data) % 4], dtype="<f4")
        elif bits == 64:
            samples = np.frombuffer(data[: len(data) - len(data) % 8], dtype="<f8")
        else:
            raise ValueError(
                f"corrupt RIFF/WAVE container: IEEE-float fmt with {bits} "
                f"bits per sample (only 32/64 are defined)"
            )
        samples = samples.astype(np.float64)
        sample_format = "float"
    else:  # integer PCM via the extensible header
        if bits % 8 or bits // 8 not in (1, 2, 3, 4):
            raise ValueError(
                f"corrupt RIFF/WAVE container: PCM fmt with {bits} bits "
                f"per sample"
            )
        samples = _pcm_samples(data, bits // 8)
        sample_format = "int"
    usable = (len(samples) // n_channels) * n_channels
    samples = samples[:usable].reshape(-1, n_channels)
    return {
        "kind": "audio",
        "sample_rate": rate,
        "n_channels": n_channels,
        "sample_width": bits // 8,
        "sample_format": sample_format,
        "n_frames": samples.shape[0],
        "samples": samples,
    }


def _wav_tags(buf: bytes) -> tuple[int | None, int | None]:
    """``(raw_tag, effective_tag)`` from the fmt chunk.
    WAVE_FORMAT_EXTENSIBLE (raw 0xFFFE) resolves its effective tag
    through the SubFormat GUID: 1 (PCM) or 3 (float) when the wrapped
    format decodes natively, 0xFFFE when it wraps something genuinely
    codec-bound. ``(None, None)`` if no well-formed fmt chunk exists."""
    import struct

    pos = 12
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        if cid == b"fmt " and size >= 2 and pos + 10 <= len(buf):
            tag = struct.unpack("<H", buf[pos + 8 : pos + 10])[0]
            if tag == 0xFFFE and size >= 40 and pos + 8 + 40 <= len(buf):
                sub = buf[pos + 8 + 24 : pos + 8 + 40]
                if sub == _SUBFORMAT_PCM:
                    return tag, 1
                if sub == _SUBFORMAT_FLOAT:
                    return tag, 3
            return tag, tag
        pos += 8 + size + (size & 1)
    return None, None


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: PNG color type → sample channel count (type 3 = palette decodes via
#: an index stream + PLTE lookup, handled separately)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: PNG color type → legal bit depths (spec §11.2.2) — sub-byte depths
#: exist only for greyscale and palette images
_PNG_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

#: Adam7 interlace pass grid (spec §8.2): (x0, y0, dx, dy) per pass —
#: pass p covers full-image pixels (y0 + i·dy, x0 + j·dx)
_PNG_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_chunks(buf: bytes):
    """Yield ``(type, body)`` for each PNG chunk, CRC-verified — a
    declared length overrunning the buffer, a truncated CRC field, or a
    CRC mismatch is corruption (the checksum is part of the format; a
    flipped bit must not decode to silently-wrong pixels)."""
    import struct
    import zlib

    pos = len(_PNG_MAGIC)
    while pos + 8 <= len(buf):
        length = struct.unpack(">I", buf[pos : pos + 4])[0]
        ctype = buf[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > len(buf):
            raise ValueError(
                f"corrupt PNG: chunk {ctype!r} claims {length} bytes but "
                f"the buffer ends first"
            )
        body = buf[pos + 8 : end]
        crc = struct.unpack(">I", buf[end : end + 4])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch on chunk {ctype!r}")
        yield ctype, body
        if ctype == b"IEND":
            return
        pos = end + 4
    raise ValueError("corrupt PNG: no IEND chunk (truncated stream)")


def _decode_png(buf: bytes) -> dict:
    """Decode a baseline PNG with pure stdlib: ``zlib`` inflate + the
    five scanline filters (None/Sub/Up/Average/Paeth, unfiltered per the
    PNG spec §9) — no codec library needed. Covers non-interlaced 8-bit
    greyscale / grey+alpha / RGB / RGBA (color types 0/4/2/6), palette
    (color type 3: the filtered stream is an index per pixel, looked up
    in the PLTE chunk — RGB out, RGBA when a tRNS chunk supplies
    per-entry alpha), AND the sub-byte depths (1/2/4-bit greyscale and
    palette: scanlines pack samples MSB-first into ``ceil(w·depth/8)``
    bytes, filters operate on the packed BYTES per spec §9.2, and the
    unpack is one vectorized ``np.unpackbits``; greyscale samples scale
    to 8-bit by exact left-bit replication — ×255/×85/×17), 16-bit
    depths (big-endian sample pairs per spec §7.1, kept at native
    dynamic range as uint16 pixels), AND Adam7 interlace (seven
    independently-filtered sub-images in the one IDAT stream, each
    unfiltered with the same machinery and scattered into the full grid
    by its pass geometry — spec §8.2). That is EVERY legal IHDR
    combination: the PNG decode surface is complete, pure stdlib+numpy.

    Returns ``{"kind": "image", "width", "height", "n_channels",
    "bit_depth", "color_type", "pixels": np.ndarray (h, w, c)}`` —
    pixels are uint8 (``bit_depth`` 8), except 16-bit sources which
    keep uint16 pixels and report ``bit_depth`` 16. Palette images
    report the POST-lookup channel count: 3, or 4 with tRNS.

    The unfilter is vectorized for None/Up (whole-row numpy) and Sub
    (per-channel prefix sum — mod 256 distributes over cumsum), scalar
    for Average/Paeth (their predictors mix the left neighbor with the
    row above, a genuine byte recurrence — correctness over cleverness;
    a production deployment plugs pillow's C decoder into the same
    ``decode_media`` seam and nothing downstream changes).
    """
    import struct
    import zlib

    import numpy as np

    chunks = _png_chunks(buf)
    ctype, ihdr = next(chunks, (None, None))
    if ctype != b"IHDR" or len(ihdr) != 13:
        raise ValueError("corrupt PNG: first chunk is not a 13-byte IHDR")
    w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"corrupt PNG: undefined compression/filter/interlace method "
            f"({comp}/{filt}/{interlace})"
        )
    if w == 0 or h == 0:
        raise ValueError("corrupt PNG: zero-sized image")
    if color_type not in _PNG_CHANNELS and color_type != 3:
        raise ValueError(f"corrupt PNG: undefined color type {color_type}")
    if bit_depth not in _PNG_LEGAL_DEPTHS[color_type]:
        if color_type == 3 and bit_depth == 16:
            raise ValueError(
                "corrupt PNG: 16-bit palette is not a legal depth/type pair"
            )
        raise ValueError(
            f"corrupt PNG: {bit_depth}-bit is not a legal depth for "
            f"color type {color_type}"
        )
    palette = trns = None
    idat_parts: list[bytes] = []
    for t, body in chunks:
        if t == b"IDAT":
            idat_parts.append(body)
        elif t == b"PLTE":
            if palette is not None:
                raise ValueError("corrupt PNG: more than one PLTE chunk")
            if idat_parts:
                raise ValueError("corrupt PNG: PLTE after the first IDAT")
            if len(body) % 3 or not 3 <= len(body) <= 768:
                raise ValueError(
                    f"corrupt PNG: PLTE length {len(body)} is not a "
                    f"multiple of 3 in 3..768"
                )
            palette = body
        elif t == b"tRNS" and color_type == 3:
            if idat_parts:
                raise ValueError("corrupt PNG: tRNS after the first IDAT")
            trns = body
    idat = b"".join(idat_parts)
    if not idat:
        raise ValueError("corrupt PNG: no IDAT chunk")
    if color_type == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image has no PLTE chunk")
        if trns is not None and len(trns) > len(palette) // 3:
            raise ValueError(
                f"corrupt PNG: tRNS has {len(trns)} entries but the "
                f"palette only {len(palette) // 3}"
            )
    # the FILTERED stream's byte layout: palette pixels are indexes (the
    # PLTE lookup happens after unfiltering), and sub-byte samples pack
    # MSB-first into ceil(w·depth/8) bytes per scanline
    channels = 1 if color_type == 3 else _PNG_CHANNELS[color_type]

    def _row_bytes(width: int) -> int:
        return (width * channels * bit_depth + 7) // 8

    if interlace:
        # Adam7: seven independently-filtered sub-images concatenated in
        # the one IDAT stream; empty passes contribute nothing (spec §8.2)
        passes = [
            (x0, y0, dx, dy, (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _PNG_ADAM7
        ]
        expected = sum(
            ph * (1 + _row_bytes(pw))
            for _, _, _, _, pw, ph in passes
            if pw and ph
        )
    else:
        expected = h * (1 + _row_bytes(w))
    # inflate with a hard output cap: untrusted corpora contain
    # decompression bombs (tiny IDAT, ~1000× ratio), and an uncapped
    # zlib.decompress would materialize the whole bomb in executor
    # memory before the size check ever ran. The declared geometry
    # bounds the only legal output, so cap there and classify ONE extra
    # byte as corrupt.
    inflater = zlib.decompressobj()
    try:
        raw = inflater.decompress(idat, expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG: IDAT inflate failed ({exc})") from exc
    if len(raw) > expected:
        raise ValueError(
            f"corrupt PNG: IDAT inflates past the {expected} bytes the "
            f"declared {w}x{h} geometry allows (decompression bomb?)"
        )
    if len(raw) != expected:
        raise ValueError(
            f"corrupt PNG: decompressed to {len(raw)} bytes, expected "
            f"{expected} for the declared {w}x{h} geometry"
        )
    # filter predictors step one whole BYTE at sub-byte depths (spec
    # §9.2: "bpp is rounded up to one")
    bpp = max(1, (channels * bit_depth) // 8)

    def _unfilter(offset: int, n_rows: int, stride: int) -> np.ndarray:
        out = np.empty((n_rows, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(n_rows):
            f = raw[offset + y * (1 + stride)]
            cur = np.frombuffer(
                raw, np.uint8, count=stride, offset=offset + y * (1 + stride) + 1
            ).copy()
            if f == 0:  # None
                pass
            elif f == 2:  # Up (uint8 addition wraps mod 256, per spec)
                cur += prev
            elif f == 1:  # Sub: per-channel prefix sum (mod 256 distributes
                # over the cumulative sum, so one vectorized cumsum replaces
                # the byte recurrence)
                cs = np.cumsum(cur.reshape(-1, bpp), axis=0, dtype=np.int64)
                cur = (cs & 0xFF).astype(np.uint8).reshape(-1)
            elif f == 3:  # Average
                for i in range(stride):
                    left = int(cur[i - bpp]) if i >= bpp else 0
                    cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for i in range(stride):
                    a = int(cur[i - bpp]) if i >= bpp else 0
                    b = int(prev[i])
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (int(cur[i]) + pred) & 0xFF
            else:
                raise ValueError(
                    f"corrupt PNG: undefined filter type {f} on row {y}"
                )
            out[y] = cur
            prev = cur
        return out

    def _samples(rows: np.ndarray, n_rows: int, width: int) -> np.ndarray:
        """Unfiltered scanline bytes → per-pixel samples
        ``(n_rows, width, channels)`` (palette/sub-byte: channels 1,
        values are indexes/levels)."""
        if bit_depth < 8:
            # sub-byte: unpack MSB-first, drop each scanline's pad bits,
            # regroup depth-sized bit runs into one value per pixel
            unpacked = np.unpackbits(rows, axis=1)[:, : width * bit_depth]
            weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint16)
            return (
                (
                    unpacked.reshape(n_rows, width, bit_depth).astype(np.uint16)
                    * weights
                )
                .sum(axis=2)
                .astype(np.uint8)[:, :, None]
            )
        if bit_depth == 16:
            # network byte order per spec §7.1: big-endian sample pairs
            pairs = rows.reshape(n_rows, width * channels, 2).astype(np.uint16)
            return ((pairs[..., 0] << 8) | pairs[..., 1]).reshape(
                n_rows, width, channels
            )
        return rows.reshape(n_rows, width, channels)

    if interlace:
        full = np.zeros(
            (h, w, channels), dtype=np.uint16 if bit_depth == 16 else np.uint8
        )
        offset = 0
        for x0, y0, dx, dy, pw, ph in passes:
            if not pw or not ph:
                continue
            stride_p = _row_bytes(pw)
            full[y0::dy, x0::dx] = _samples(
                _unfilter(offset, ph, stride_p), ph, pw
            )
            offset += ph * (1 + stride_p)
    else:
        full = _samples(_unfilter(0, h, _row_bytes(w)), h, w)
    grid = full[:, :, 0] if channels == 1 else None
    if color_type == 3:
        # PLTE lookup: index grid -> RGB (RGBA with tRNS alpha). An index
        # past the palette is corruption, not a silent black pixel.
        pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
        if int(grid.max(initial=0)) >= pal.shape[0]:
            raise ValueError(
                f"corrupt PNG: palette index {int(grid.max())} out of "
                f"range for a {pal.shape[0]}-entry PLTE"
            )
        if trns is not None:
            alpha = np.full(pal.shape[0], 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            pal = np.concatenate([pal, alpha[:, None]], axis=1)
        px = pal[grid]
        return {
            "kind": "image",
            "width": w,
            "height": h,
            "n_channels": px.shape[2],
            "bit_depth": 8,
            "color_type": 3,
            "pixels": px,
        }
    if bit_depth < 8:
        # sub-byte greyscale: scale to 8-bit by exact left-bit
        # replication (×255/×85/×17 for depths 1/2/4 — max maps to 255)
        factor = 255 // ((1 << bit_depth) - 1)
        px = (grid.astype(np.uint16) * factor).astype(np.uint8)
        return {
            "kind": "image",
            "width": w,
            "height": h,
            "n_channels": 1,
            "bit_depth": 8,
            "color_type": color_type,
            "pixels": px[:, :, None],
        }
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "n_channels": channels,
        # 16-bit sources keep their native dynamic range (uint16 pixels);
        # everything else lands as uint8
        "bit_depth": 16 if bit_depth == 16 else 8,
        "color_type": color_type,
        "pixels": full,
    }


def decode_media(payload: bytes) -> dict:
    """Decode a binary media payload into samples + typed metadata.

    REAL for WAV: RIFF/WAVE containers decode natively — integer PCM
    (format tag 1: 8/16/24/32-bit, any channel count, via the stdlib
    ``wave`` module), IEEE float (format tag 3: float32/float64), and
    WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) wrapping either of those
    SubFormats (both via a direct chunk walk — no codec needed) —
    returning::

        {"kind": "audio", "sample_rate": int, "n_channels": int,
         "sample_width": int, "sample_format": "int"|"float",
         "n_frames": int,
         "samples": np.ndarray[shape (n_frames, n_channels)]}

    Integer samples are SIGNED and centered on zero (8-bit WAV stores
    unsigned bytes; 128 is subtracted here so every width shares the
    same convention) and exactly representable as doubles, so downstream
    energy/feature math is bit-reproducible across engines. Float
    samples come back as float64 (nominally in [-1, 1]).

    REAL for PNG — the COMPLETE decode surface (every legal IHDR
    combination): 8-bit greyscale / grey+alpha / RGB / RGBA, palette via
    PLTE lookup with optional tRNS alpha, 1/2/4-bit greyscale + palette,
    16-bit (native uint16 range), non-interlaced AND Adam7-interlaced —
    all decode natively via :func:`_decode_png` (zlib inflate + the five
    scanline filters — pure stdlib), returning::

        {"kind": "image", "width": int, "height": int, "n_channels": int,
         "bit_depth": 8 | 16, "color_type": int,
         "pixels": np.ndarray[shape (height, width, n_channels)]}

    with uint8 pixels (``bit_depth`` 8) for everything except 16-bit
    sources, which keep uint16 pixels and report ``bit_depth`` 16.

    Still a stub for compressed codecs: payloads whose magic identifies
    JPEG/MP4/Ogg/FLAC/MP3
    raise :class:`NotImplementedError` naming the library a real
    deployment would plug in — the sandbox has none of them.
    Unrecognized payloads raise ``ValueError`` (corrupt or unknown
    container), distinct from "codec unavailable".
    """
    import io
    import wave

    buf = bytes(payload) if payload is not None else b""
    if buf.startswith(_PNG_MAGIC):
        return _decode_png(buf)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        raw_tag, eff_tag = _wav_tags(buf)
        if raw_tag == 3 or (raw_tag == 0xFFFE and eff_tag in (1, 3)):
            # IEEE float, and EXTENSIBLE wrapping PCM/float: legitimate
            # WAV variants that need no codec — decode via the direct
            # chunk walk (stdlib wave support for them varies by Python
            # minor version; the chunk walk does not)
            return _decode_raw_wav(buf, eff_tag)
        if raw_tag is None:
            raise ValueError(
                "corrupt RIFF/WAVE container: no well-formed fmt chunk"
            )
        if raw_tag != 1:
            # codec-vs-corrupt is decided from the TAG, not from stdlib
            # error wording (which changes across Python versions):
            # anything that is not integer PCM and was not claimed above
            # is a genuine codec gap (ADPCM, a-law, MPEG-in-WAV,
            # EXTENSIBLE wrapping a compressed SubFormat, ...)
            raise NotImplementedError(
                f"WAV with an unsupported format (tag {raw_tag:#x}); "
                f"needs soundfile/libsndfile — integer and IEEE-float "
                f"PCM decode natively"
            )
        try:
            with wave.open(io.BytesIO(buf)) as w:
                n_channels = w.getnchannels()
                width = w.getsampwidth()
                rate = w.getframerate()
                n_frames = w.getnframes()
                raw = w.readframes(n_frames)
        except wave.Error as exc:
            # only integer-PCM (tag 1) containers reach the stdlib
            # reader, so every wave.Error here — including its own
            # 'bad # of channels' for a crafted 0-channel fmt — is
            # corruption, never a codec gap
            raise ValueError(f"corrupt RIFF/WAVE container: {exc}") from exc
        except EOFError as exc:  # truncated chunk headers
            raise ValueError(f"corrupt RIFF/WAVE container: {exc}") from exc
        samples = _pcm_samples(raw, width)
        # truncate a ragged tail (a truncated final frame) rather than crash
        usable = (len(samples) // n_channels) * n_channels
        samples = samples[:usable].reshape(-1, n_channels)
        return {
            "kind": "audio",
            "sample_rate": rate,
            "n_channels": n_channels,
            "sample_width": width,
            "sample_format": "int",
            "n_frames": samples.shape[0],
            "samples": samples,
        }
    for magic, name in _KNOWN_MAGICS:
        if buf.startswith(magic):
            raise NotImplementedError(
                f"payload is a {name}; that codec library is not present "
                f"in this environment — WAV/PCM decodes natively"
            )
    if buf[4:8] == b"ftyp":  # ISO-BMFF magic sits at offset 4
        raise NotImplementedError(
            "payload is an ISO-BMFF/MP4 container (needs ffmpeg/pyav); "
            "that codec library is not present in this environment — "
            "WAV/PCM decodes natively"
        )
    if buf[:4] == b"RIFF":  # RIFF but not WAVE: WEBP/AVI ride RIFF too
        kind = buf[8:12].decode("ascii", "replace").strip()
        raise NotImplementedError(
            f"payload is a RIFF/{kind or '????'} container (needs the "
            f"matching codec library: WEBP → PIL/pillow, AVI → "
            f"ffmpeg/pyav) — only RIFF/WAVE decodes natively"
        )
    if len(buf) >= 2 and buf[0] == 0xFF and (buf[1] & 0xE0) == 0xE0:
        # a bare MPEG-audio frame sync (most raw .mp3 payloads carry no
        # ID3v2 header) — codec gap, not corruption. JPEG's \xff\xd8\xff
        # was already claimed by the magic table above.
        raise NotImplementedError(
            "payload is a raw MPEG-audio stream (frame sync, no ID3 tag; "
            "needs ffmpeg/audioread) — WAV/PCM decodes natively"
        )
    raise ValueError(
        f"unrecognized media container (first bytes {buf[:8]!r}); "
        f"decode_media handles RIFF/WAVE natively and refuses known "
        f"compressed codecs loudly"
    )


def _fake_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode: metadata + md5-derived 8-dim features.

    Every value is a pure function of the payload bytes, so the DuckDB
    oracle can replay it — the Arrow/mapInPandas plumbing under test is
    exactly what a real decoder would ride.
    """
    import hashlib

    for pdf in batches:
        # NULL payload == empty payload, the same convention
        # perceptual_hash documents — a bare len(None)/md5(None) would
        # abort the whole job from inside the Arrow worker
        payload = pdf["payload"].map(lambda b: b if b is not None else b"")
        n = payload.map(len)
        digest = payload.map(lambda b: hashlib.md5(b).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "digest": digest,
                "fake_width": (n % 640).astype("int32"),
                "fake_height": ((n * 7) % 480).astype("int32"),
                "features": digest.map(
                    lambda h: [int(h[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(8)]
                ),
            }
        )


def extract_media_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched feature extraction over opaque binary payloads."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return spread_small_input(src).mapInPandas(_fake_extract, schema=MEDIA_FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize plumbing: 1 row in → 1 row out with a new fixed-size payload.

    The fake "resample" tiles the source bytes to exactly width×height
    bytes (deterministic, pure function of input) — a real implementation
    decodes via :func:`decode_media`, resamples, re-encodes. Batch shape,
    schema, and memory profile (output size independent of input size)
    match the real thing.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height

        def tile(b: bytes) -> bytes:
            if b is None or len(b) == 0:  # NULL payload == empty
                return bytes(target)
            reps = target // len(b) + 1
            return (b * reps)[:target]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(tile),
                }
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return spread_small_input(src).mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    every_nth: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plumbing: 1 row in → N rows out (exploding fan-out
    inside mapInPandas, the shape a video decoder produces).

    The fake "container" treats the payload as consecutive
    ``frame_bytes``-byte frames and keeps every ``every_nth`` one. A real
    implementation seeks keyframes via the codec; partitioning, fan-out,
    and schema are identical.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL payload == empty
                    payload = b""
                n_frames = max(1, len(payload) // frame_bytes)
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return spread_small_input(src).mapInPandas(_frames, schema=FRAME_SCHEMA)


PHASH_SCHEMA = "doc_id long, phash long"


def perceptual_hash(
    df: DataFrame,
    grid: int = 32,
    block: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode: bool = False,
) -> DataFrame:
    """REAL (non-stub) numpy-only perceptual hash — mean-threshold aHash
    over the raw byte grid, no codec needed: the payload is tiled
    cyclically to ``grid²`` bytes (the same fake resample
    :func:`resize_media` uses, so the hash reflects CONTENT, not payload
    length) forming a ``grid×grid`` image, block-mean downsampled to
    ``(grid/block)²`` cells; cell bit = 1 iff the cell mean exceeds the
    global mean. All-integer compare
    (``cell_sum · (grid/block)² > total_sum``), so the hash is
    bit-reproducible across engines — this Pandas-UDF operator is
    hash-verified against a DuckDB oracle despite running in Python.

    The hash is emitted as one BIGINT (cell 0 = most-significant bit,
    two's-complement), not a 64-char bit string: at 100 TB the hash is
    the only thing shuffled and grouped on, and an 8-byte key beats a
    64+-byte string for every exchange and hash table downstream. Per
    batch, the grid fill walks rows in Python (unavoidable for ragged
    binary payloads; NULL and empty payloads hash to 0), but block-sum,
    threshold, and the ``np.packbits`` bit-pack are whole-batch
    vectorized numpy.

    ``decode=True`` is the real-image mode (the same two-mode pattern as
    :func:`audio_frame_energy`): each payload is REALLY decoded via
    :func:`decode_media` (PNG natively), channel-summed to an integer
    luminance proxy, nearest-neighbor resampled to the ``grid×grid``
    plane by pure index math (``(i·dim)//grid`` — every sample a SOURCE
    pixel), then hashed by the identical integer threshold machinery. A
    k×-upscaled copy of an image resamples onto the same source pixels,
    so scale-duplicate images collide by construction (pinned by test).
    Non-image payloads raise; empty/NULL payloads hash to 0 in both
    modes.
    """
    import numpy as np

    if grid % block:
        raise ValueError("grid must be divisible by block")
    cells = grid // block
    if cells * cells > 64:
        raise ValueError(
            "perceptual_hash packs (grid/block)² cells into one 64-bit "
            f"word; {cells * cells} cells do not fit — raise `block`"
        )

    def _phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            img = np.zeros((n, grid * grid), dtype=np.int64)
            for row, payload in enumerate(pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue  # NULL/empty payload: all-zero hash
                if decode:
                    m = decode_media(bytes(payload))
                    if m.get("kind") != "image":
                        raise ValueError(
                            f"perceptual_hash(decode=True) over a "
                            f"non-image payload (decoded kind "
                            f"{m.get('kind')!r}) — filter or quarantine "
                            f"mixed-modality corpora upstream"
                        )
                    px = m["pixels"].astype(np.int64).sum(axis=2)
                    h, w = px.shape
                    ri = (np.arange(grid) * h) // grid
                    ci = (np.arange(grid) * w) // grid
                    img[row] = px[np.ix_(ri, ci)].reshape(-1)
                    continue
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(b):
                    img[row] = np.resize(b, grid * grid)  # cyclic tile
            blocks = (
                img.reshape(n, cells, block, cells, block)
                .sum(axis=(2, 4))
                .reshape(n, cells * cells)
            )
            total = img.sum(axis=1, keepdims=True)
            bits = blocks * (cells * cells) > total
            if cells * cells < 64:  # low-order zero padding to one word
                bits = np.pad(bits, ((0, 0), (0, 64 - cells * cells)))
            # pack 64 bool cells → one signed 64-bit word (cell 0 = MSB);
            # '>i8' view of the MSB-first packed bytes IS the two's-
            # complement value, no overflow-prone arithmetic
            # astype: big-endian view → native-order int64 (value-preserving
            # byteswap; Arrow rejects non-native byte order)
            packed = np.packbits(bits, axis=1).view(">i8").ravel().astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": packed})

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    # Spread ONLY the decode path (r16): the PNG decode is heavyweight
    # pure-Python work where a single-partition fixture runs serially (the
    # r15 image_stats A/B: ~3× from spreading). The decode=False byte-tile
    # kernel is a few vectorized numpy ops per batch — there the spread's
    # payload exchange costs more than the parallelism buys (same-boot A/B
    # at sf0.1: 1.33 s spread vs 0.65 s unspread — the 0.47× regression the
    # r15 driver flagged), and skipping it keeps payloads in their scan
    # partitions, which is the operator's own 100 TB contract.
    if decode:
        src = spread_small_input(src)
    return src.mapInPandas(_phash, schema=PHASH_SCHEMA)


AUDIO_ENERGY_SCHEMA = "doc_id long, frame_idx int, n_samples int, rms double"


def audio_frame_energy(
    df: DataFrame,
    frame_samples: int = 64,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode: bool = False,
) -> DataFrame:
    """Audio-style frame energy, the silence-detection / VAD-precursor
    shape: samples are framed into ``frame_samples``-sample windows and
    each frame reports its RMS energy.

    Two sample sources:

    - ``decode=False`` (default): the payload is interpreted as raw
      unsigned 8-bit PCM around the 128 midpoint — headerless, so the
      DuckDB oracle can replay it byte-for-byte (this is the registered
      gate query's mode).
    - ``decode=True``: the payload is REALLY decoded via
      :func:`decode_media` (RIFF/WAVE, 8/16/24/32-bit PCM); frames run
      over the decoder's channel-interleaved signed samples, so a stereo
      window covers ``frame_samples/2`` audio frames per channel.
      Undecodable payloads propagate decode_media's error — at scale,
      quarantine them upstream with a magic-sniff filter rather than
      letting one bad object kill the job.

    Exactness note: samples are integers, so whenever the squared-sum
    stays under 2^53 the double accumulation is EXACT (no
    accumulation-order noise) and frame RMS is bit-identical across
    engines — true always for 8/16-bit samples at any practical frame
    size (16-bit: 2^30 per square, 2^23 frames before overflow) and for
    24-bit up to frame_samples ≤ 128; the registered gate query rides
    the 8-bit raw mode, which is why this Pandas-UDF operator can be
    hash-verified against the DuckDB oracle. 32-bit PCM squares exceed
    2^53, so decode=True over 32-bit WAVs carries ordinary float64
    rounding — fine for VAD-style thresholds, NOT for cross-engine hash
    gates (float WAVs likewise). Empty payloads yield one silent frame
    (rms 0, 0 samples).

    Tail framing differs by mode (pinned by test_multimodal ragged
    cases): ``decode=True`` emits EVERY sample — the final partial frame
    appears with its true ``n_samples`` (ceil division; real audio
    rarely ends on a window boundary and VAD must see the tail).
    ``decode=False`` keeps the registered gate query's original floor
    semantics — a multi-frame payload's sub-window byte tail is
    discarded (only payloads shorter than ONE frame get a partial
    frame), because the DuckDB oracle hash pins that shape.
    """
    import numpy as np

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, rms = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL payload == empty
                    payload = b""
                if decode:
                    if len(payload) == 0:  # NULL/empty: silent frame, no
                        a = np.empty(0)  # container to sniff
                    else:
                        a = decode_media(payload)["samples"].ravel().astype(
                            np.float64
                        )
                else:
                    a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                        np.float64
                    ) - 128.0
                if len(a) == 0:
                    ids.append(doc_id); idxs.append(0); ns.append(0); rms.append(0.0)
                    continue
                if decode:  # ceil: the decoded tail is real audio
                    n_frames = -(-len(a) // frame_samples)
                else:  # floor: the gate oracle pins this shape
                    n_frames = max(1, len(a) // frame_samples)
                for j in range(n_frames):
                    seg = a[j * frame_samples : (j + 1) * frame_samples]
                    ids.append(doc_id)
                    idxs.append(j)
                    ns.append(len(seg))
                    rms.append(float(np.sqrt((seg * seg).sum() / len(seg))))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_samples": ns, "rms": rms}
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return spread_small_input(src).mapInPandas(_energy, schema=AUDIO_ENERGY_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, "
    "px_sum long, px_min int, px_max int"
)


def encode_png(pixels, interlace: int = 0) -> bytes:
    """Encode a ``(height, width, channels)`` uint8 array as a baseline
    8-bit PNG (greyscale / grey+alpha / RGB / RGBA from the channel
    count), row ``y`` filtered with type ``y % 5`` — deliberately
    cycling all five scanline filters so a corpus encoded this way
    drives every :func:`_decode_png` unfilter path at scale. Pure
    stdlib (zlib + struct), the ENCODE inverse of the decoder;
    round-trip identity is pinned by deterministic and hypothesis
    tests and (for the grey form) by the image-stats oracle.

    ``interlace=1`` writes Adam7 output: the seven pass sub-images
    (spec §8.2) each filtered independently with the same ``y % 5``
    cycle — physically different bytes, logically identical pixels, so
    an interlaced corpus exercises the decoder's de-interleave scatter
    under the very same stats oracle as the baseline layout."""
    import struct
    import zlib

    import numpy as np

    pixels = np.asarray(pixels)
    if pixels.dtype != np.uint8:
        # a silent uint8 cast would corrupt 16-bit decode output (e.g.
        # image_resize over a 16-bit source); demand explicit quantization
        raise ValueError(
            f"encode_png writes 8-bit PNGs; got {pixels.dtype} pixels — "
            f"quantize explicitly (e.g. >> 8 for 16-bit sources) first"
        )
    if pixels.ndim != 3 or pixels.shape[2] not in (1, 2, 3, 4):
        raise ValueError(
            f"encode_png expects (height, width, channels∈1..4) uint8, "
            f"got shape {pixels.shape}"
        )
    height, width, channels = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    zero = np.zeros(channels, np.int32)

    def filtered(block: np.ndarray) -> bytes:
        hh, ww, _ = block.shape
        stride = ww * channels
        rows = block.reshape(hh, stride).astype(np.int32)
        lines = []
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(hh):
            f = y % 5
            cur = rows[y]
            left = np.concatenate([zero, cur[:-channels]])
            upleft = np.concatenate([zero, prev[:-channels]])
            if f == 0:
                enc = cur
            elif f == 1:
                enc = cur - left
            elif f == 2:
                enc = cur - prev
            elif f == 3:
                enc = cur - ((left + prev) >> 1)
            else:
                p = left + prev - upleft
                pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
                )
                enc = cur - pred
            lines.append(bytes([f]) + (enc % 256).astype(np.uint8).tobytes())
            prev = cur
        return b"".join(lines)

    if interlace:
        body = b"".join(
            filtered(sub)
            for x0, y0, dx, dy in _PNG_ADAM7
            for sub in (pixels[y0::dy, x0::dx],)
            if sub.shape[0] and sub.shape[1]
        )
    else:
        body = filtered(pixels)

    def chunk(ctype: bytes, body_: bytes) -> bytes:
        return (
            struct.pack(">I", len(body_))
            + ctype
            + body_
            + struct.pack(">I", zlib.crc32(ctype + body_) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


def encode_png_grey(
    data: bytes, width: int, height: int, interlace: int = 0
) -> bytes:
    """Byte-payload convenience over :func:`encode_png`: a GREYSCALE PNG
    whose pixel bytes are ``data`` truncated/zero-padded to
    ``width*height`` — the form whose DuckDB oracle can replay the
    pixels straight from the payload bytes (``interlace=1`` writes the
    Adam7 layout of the SAME pixels, so the oracle is unchanged)."""
    import numpy as np

    n = width * height
    px = np.frombuffer(bytes(data)[:n].ljust(n, b"\0"), dtype=np.uint8)
    return encode_png(px.reshape(height, width, 1), interlace=interlace)


IMAGES_FROM_BYTES_SCHEMA = "doc_id long, payload binary"


def images_from_bytes(
    df: DataFrame,
    width: int = 16,
    height: int = 16,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize an IMAGE column from a byte column: each payload
    becomes a real baseline greyscale PNG (:func:`encode_png_grey` —
    pixel bytes are the payload bytes truncated/zero-padded to
    ``width*height``, scanline filters cycling all five types). The
    corpus-synthesis stage of the image pipelines: downstream operators
    (:func:`image_resize`, :func:`perceptual_hash` decode mode,
    :func:`image_pixel_stats`) then run against REAL codec output, and
    because the pixels ARE the payload bytes a DuckDB oracle can replay
    the whole pipeline from the source column. mapInPandas, map-only —
    no shuffle; at 100 TB this stage disappears (payloads arrive as
    stored images) and downstream operators are unchanged.
    """

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_png_grey(
                            b"" if payload is None else bytes(payload),
                            width,
                            height,
                        )
                        for payload in pdf["payload"]
                    ],
                }
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return spread_small_input(src).mapInPandas(_encode, schema=IMAGES_FROM_BYTES_SCHEMA)


def image_pixel_stats(
    df: DataFrame,
    width: int = 16,
    height: int = 16,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    interlace: int = 0,
) -> DataFrame:
    """Image-modality plumbing, end to end and hash-verifiable: each
    payload's bytes become a REAL baseline greyscale PNG
    (:func:`encode_png_grey` — every scanline filter exercised), the PNG
    is decoded back through :func:`decode_media`/:func:`_decode_png`,
    and the DECODED pixel grid reports integer stats (sum/min/max —
    exact in int64, so the Pandas-UDF fan-out hash-matches a DuckDB
    oracle that computes the same stats straight from the payload
    bytes). The encode→decode identity is therefore verified on every
    row of the corpus, not just in unit tests. ``interlace=1`` writes
    and decodes the Adam7 layout of the same pixels — physically
    different bytes through the decoder's de-interleave scatter, same
    stats, same oracle.

    Scale shape: mapInPandas over Arrow batches, one PNG per row, no
    driver involvement; at 100 TB the encode side disappears (payloads
    arrive as stored images) and the same operator body runs with the
    decoder alone — swap :func:`decode_media`'s PNG path for pillow's C
    decoder and nothing else changes.
    """
    import numpy as np

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                png = encode_png_grey(
                    payload if payload is not None else b"",
                    width,
                    height,
                    interlace=interlace,
                )
                img = decode_media(png)
                arr = img["pixels"].ravel().astype(np.int64)
                out.append(
                    (
                        doc_id,
                        img["width"],
                        img["height"],
                        img["n_channels"],
                        int(arr.sum()),
                        int(arr.min()),
                        int(arr.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "px_sum", "px_min", "px_max",
                ],
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return spread_small_input(src).mapInPandas(_stats, schema=IMAGE_STATS_SCHEMA)


IMAGE_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, payload binary"
)


def image_resize(
    df: DataFrame,
    stride: int = 2,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL image resize over PNG payloads: decode
    (:func:`decode_media`), nearest-neighbor downsample by an integer
    ``stride`` (output pixel ``(r, c)`` = source pixel
    ``(r*stride, c*stride)`` — output dims ``ceil(dim/stride)``, so a
    1×1 image survives any stride), re-encode (:func:`encode_png`) and
    emit the resized PNG payload with its new dimensions — the
    thumbnail/downsample stage of an image-corpus pipeline, with the
    whole decode→transform→encode loop inside the Arrow batch.

    ``stride=1`` is a decode→re-encode identity pass (pixel-exact; the
    bytes may differ — filter choice is the encoder's). Deterministic
    nearest-neighbor keeps every output pixel a SOURCE pixel, so
    round-trips are exact-integer-checkable without resampling-kernel
    tolerance; a real deployment swaps in pillow's area/bilinear resize
    through the same seam when fidelity beats determinism.

    Scale shape: mapInPandas, one image per row, no shuffle — parallelism
    comes from the input splits, and only the (much smaller) resized
    payloads flow downstream.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_media(payload if payload is not None else b"")
                if img.get("kind") != "image":
                    raise ValueError(
                        f"image_resize over a non-image payload "
                        f"(decoded kind {img.get('kind')!r}) — filter or "
                        f"quarantine mixed-modality corpora upstream"
                    )
                small = img["pixels"][::stride, ::stride]
                out.append(
                    (
                        doc_id,
                        small.shape[1],
                        small.shape[0],
                        small.shape[2],
                        encode_png(small),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "n_channels", "payload"],
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return spread_small_input(src).mapInPandas(_resize, schema=IMAGE_RESIZE_SCHEMA)
