"""Real media container codecs: header builders + parsers, stdlib-only.

The reference treats payloads as opaque bytes (db_internal.go:59-60 —
no media surface); this module is the north-star multimodal piece: the
metadata a training-data pipeline needs (dimensions, frame counts,
sample rate, duration) parsed from the CONTAINER HEADERS of real
formats — PNG, JPEG, GIF, WAV, MP4 — with no external decode library.
Pixel/sample decoding (which genuinely needs PIL/ffmpeg) stays behind
the clearly-marked stubs in functions.multimodal; header metadata does
not need it.

Two halves, designed to invert each other:

- ``build_*``: emit a structurally-valid container (correct magic,
  chunk layout, real CRCs for PNG) around filler payload bytes.
- ``parse_media``: sniff the container from magic bytes and walk its
  real structure (PNG IHDR chunk, JPEG marker segments to SOF, GIF
  block walk counting image descriptors, RIFF chunk walk to fmt/data,
  MP4 box tree to mvhd/tkhd/stsz).

Fields a format doesn't carry are None (an image has no duration), and
any unparseable/truncated blob yields container=None with all-None
metadata — decode failures are data, not exceptions, at 100 TB.
"""

from __future__ import annotations

import struct
import zlib

# --------------------------------------------------------------- build

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def build_png(width: int, height: int, idat_len: int = 0) -> bytes:
    """Valid PNG framing: signature + IHDR (real CRC) + IDAT + IEND.

    Size is closed-form: 57 + idat_len bytes (8 sig + 25 IHDR +
    12+idat_len IDAT + 12 IEND) — so an SQL oracle can predict
    octet_length without parsing."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = bytes(i & 0xFF for i in range(idat_len))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def build_jpeg(width: int, height: int, scan_len: int = 0) -> bytes:
    """JFIF skeleton: SOI + APP0 + SOF0 (carrying the dimensions) +
    SOS + ``scan_len`` entropy filler + EOI. Size: 55 + scan_len."""
    app0 = struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
    sof0 = struct.pack(">HBHHB", 17, 8, height, width, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos = struct.pack(">HB", 12, 3) + bytes([1, 0, 2, 0x11, 3, 0x11, 0, 63, 0])
    # entropy filler must never contain 0xFF (it would read as a marker)
    scan = bytes((i * 7 + 1) & 0x7F for i in range(scan_len))
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + app0
        + b"\xff\xc0" + sof0
        + b"\xff\xda" + sos
        + scan
        + b"\xff\xd9"
    )


def build_gif(width: int, height: int, n_frames: int = 1) -> bytes:
    """GIF89a with ``n_frames`` image-descriptor blocks (an animated
    GIF's frame structure, minus real LZW pixel data). Size:
    14 + 17 * n_frames."""
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x00, 0, 0)  # no GCT
    for _ in range(max(1, n_frames)):
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0x00)
        out += bytes([2])            # LZW minimum code size
        out += bytes([4, 1, 2, 3, 4])  # one 4-byte data sub-block
        out += b"\x00"               # sub-block terminator
    out += b"\x3b"                   # trailer
    return bytes(out)


def build_wav(sample_rate: int, n_samples: int, channels: int = 1) -> bytes:
    """Canonical 16-bit PCM RIFF/WAVE: fmt + data chunks. Size:
    44 + 2 * channels * n_samples."""
    block_align = channels * 2
    data_len = n_samples * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    data = bytes((i * 3) & 0xFF for i in range(data_len))
    return (
        b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", data_len) + data
    )


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    width: int, height: int, duration_ms: int, n_frames: int, timescale: int = 1000
) -> bytes:
    """ISO-BMFF skeleton: ftyp + moov{mvhd, trak{tkhd, mdia{minf{stbl
    {stsz}}}}}. Duration lives in mvhd (duration/timescale), dimensions
    in tkhd (16.16 fixed point), frame count in stsz.sample_count —
    the same boxes a real probe reads. Size: fixed 284 bytes."""
    dur = int(duration_ms * timescale // 1000)
    mvhd = _box(
        b"mvhd",
        struct.pack(">BxxxIIIII", 0, 0, 0, timescale, dur, 0x00010000)
        + b"\x01\x00" + b"\x00" * 10 + _unit_matrix() + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">BxxxIIIxxxxI", 0, 0, 0, 1, dur)
        + b"\x00" * 8 + struct.pack(">hhhxx", 0, 0, 0) + _unit_matrix()
        + struct.pack(">II", width << 16, height << 16),
    )
    stsz = _box(b"stsz", struct.pack(">BxxxII", 0, 0, n_frames))
    stbl = _box(b"stbl", stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov


def _unit_matrix() -> bytes:
    return struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


# --------------------------------------------------------------- parse

_EMPTY = {
    "container": None, "width": None, "height": None,
    "n_frames": None, "sample_rate": None, "duration_s": None,
}

#: JPEG start-of-frame markers that carry dimensions (C0–CF minus the
#: huffman/arithmetic/reset markers C4, C8, CC)
_SOF_MARKERS = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_png(b: bytes) -> dict | None:
    if len(b) < 33 or not b.startswith(PNG_SIG) or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return dict(_EMPTY, container="png", width=w, height=h, n_frames=1)


def parse_jpeg(b: bytes) -> dict | None:
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None  # lost marker sync
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        if marker in _SOF_MARKERS:
            if pos + 9 > len(b):
                return None
            h, w = struct.unpack(">HH", b[pos + 5:pos + 9])
            return dict(_EMPTY, container="jpeg", width=w, height=h, n_frames=1)
        if marker == 0xDA:  # entropy data follows; SOF should have come first
            return None
        pos += 2 + seg_len
    return None


def parse_gif(b: bytes) -> dict | None:
    if len(b) < 14 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))

    def skip_subblocks(p: int) -> int:
        while p < len(b) and b[p] != 0:
            p += 1 + b[p]
        return p + 1

    frames = 0
    while pos < len(b):
        tag = b[pos]
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label byte then sub-blocks
            pos = skip_subblocks(pos + 2)
        elif tag == 0x2C:  # image descriptor
            frames += 1
            if pos + 10 > len(b):
                return None
            lflags = b[pos + 9]
            pos += 10
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos = skip_subblocks(pos + 1)  # LZW min code size, then data
        else:
            return None
    if frames == 0:
        return None
    return dict(_EMPTY, container="gif", width=w, height=h, n_frames=frames)


def parse_wav(b: bytes) -> dict | None:
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    sample_rate = block_align = data_len = None
    while pos + 8 <= len(b):
        ctype = b[pos:pos + 4]
        clen = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        if ctype == b"fmt " and clen >= 16:
            # a chunk header may CLAIM 16+ bytes a truncated blob
            # doesn't hold — corrupt input is data (NULL row), never
            # a struct.error escaping into the Spark task
            if pos + 24 > len(b):
                return None
            _, _, sample_rate, _, block_align, _ = struct.unpack(
                "<HHIIHH", b[pos + 8:pos + 24]
            )
        elif ctype == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    # `not sample_rate` also rejects a declared rate of 0 — corrupt
    # media is data (NULL row), never a ZeroDivisionError in the task
    if not sample_rate or data_len is None or not block_align:
        return None
    duration = data_len / float(sample_rate * block_align)
    return dict(
        _EMPTY, container="wav", sample_rate=sample_rate, duration_s=duration
    )


def parse_mp4(b: bytes) -> dict | None:
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    meta: dict = dict(_EMPTY, container="mp4")
    found_moov = False

    def walk(lo: int, hi: int) -> None:
        nonlocal found_moov
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack(">I", b[pos:pos + 4])[0]
            btype = b[pos + 4:pos + 8]
            if size < 8 or pos + size > hi:
                return
            body, end = pos + 8, pos + size
            if btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                if btype == b"moov":
                    found_moov = True
                walk(body, end)
            elif btype == b"mvhd" and end - body >= 20:
                timescale, dur = struct.unpack(">II", b[body + 12:body + 20])
                if timescale:
                    meta["duration_s"] = dur / float(timescale)
            elif btype == b"tkhd" and end - body >= 84:
                w_fp, h_fp = struct.unpack(">II", b[body + 76:body + 84])
                meta["width"], meta["height"] = w_fp >> 16, h_fp >> 16
            elif btype == b"stsz" and end - body >= 12:
                meta["n_frames"] = struct.unpack(">I", b[body + 8:body + 12])[0]
            pos = end

    walk(0, len(b))
    return meta if found_moov else None


def parse_media(blob: bytes) -> dict:
    """Sniff the container from magic bytes and parse its header.

    Returns {container, width, height, n_frames, sample_rate,
    duration_s}; all-None when no parser claims the blob (truncated,
    corrupt, or an unknown format)."""
    b = bytes(blob) if blob is not None else b""
    if b.startswith(PNG_SIG):
        out = parse_png(b)
    elif b[:2] == b"\xff\xd8":
        out = parse_jpeg(b)
    elif b[:6] in (b"GIF87a", b"GIF89a"):
        out = parse_gif(b)
    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        out = parse_wav(b)
    elif len(b) >= 12 and b[4:8] == b"ftyp":
        out = parse_mp4(b)
    else:
        out = None
    return out if out is not None else dict(_EMPTY)
