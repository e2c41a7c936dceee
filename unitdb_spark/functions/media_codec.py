"""Real media container codecs: header builders + parsers, stdlib-only.

The reference treats payloads as opaque bytes (db_internal.go:59-60 —
no media surface); this module is the north-star multimodal piece: the
metadata a training-data pipeline needs (dimensions, frame counts,
sample rate, duration) parsed from the CONTAINER HEADERS of real
formats — PNG, JPEG, GIF, WAV, MP4, BMP, TIFF (both byte orders),
MP3 (ID3v2 skip + CBR frame walk) — with no external decode library.
Pixel/sample decoding of COMPRESSED formats (which genuinely needs
PIL/ffmpeg) stays behind the clearly-marked stubs in
functions.multimodal. Uncompressed containers need only ``struct``:
this module also carries REAL pixel/sample codecs for them —
24-bit BMP pixel arrays (encode_bmp24/decode_bmp24, bottom-up rows,
4-byte row padding, BGR order) and 16-bit PCM WAV samples
(decode_wav_pcm16) — which back functions.multimodal's real resize
and audio-feature kernels.

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


# ------------------------------------------ BMP / TIFF / MP3 extension

#: MPEG-1 Layer III bitrate table (kbps), index 1..14
_MP3_BITRATES = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
#: MPEG-1 sample-rate table, index 0..2
_MP3_RATES = [44100, 48000, 32000]
#: samples per MPEG-1 Layer III frame
_MP3_SPF = 1152


def build_bmp(width: int, height: int, pix_len: int = 0) -> bytes:
    """BITMAPINFOHEADER BMP: 14-byte file header + 40-byte info header
    + filler pixel bytes. Closed-form size: 54 + pix_len."""
    total = 54 + pix_len
    fh = b"BM" + struct.pack("<IHHI", total, 0, 0, 54)
    ih = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                     pix_len, 2835, 2835, 0, 0)
    return fh + ih + bytes(i & 0xFF for i in range(pix_len))


def build_tiff(width: int, height: int, little_endian: bool = True) -> bytes:
    """Minimal single-IFD TIFF: header + 2 LONG entries (ImageWidth 256,
    ImageLength 257), next-IFD = 0. Both byte orders supported so the
    parser's endian handling is actually exercised."""
    e = "<" if little_endian else ">"
    head = (b"II" if little_endian else b"MM") + struct.pack(e + "HI", 42, 8)
    entries = struct.pack(e + "H", 2)
    for tag, val in ((256, width), (257, height)):
        entries += struct.pack(e + "HHII", tag, 4, 1, val)
    return head + entries + struct.pack(e + "I", 0)


def build_mp3(
    sample_rate: int, n_frames: int, bitrate_kbps: int = 128,
    id3_len: int = 0,
) -> bytes:
    """CBR MPEG-1 Layer III stream: optional ID3v2 tag + n_frames
    frames, each a real 4-byte header followed by filler to the
    header-implied frame length floor(144000·kbps/rate)."""
    if sample_rate not in _MP3_RATES:
        raise ValueError(f"build_mp3: unsupported sample rate {sample_rate}")
    if bitrate_kbps not in _MP3_BITRATES[1:]:
        raise ValueError(f"build_mp3: unsupported bitrate {bitrate_kbps}")
    out = b""
    if id3_len:
        # ID3v2 header: syncsafe 28-bit size of the tag body
        sz = id3_len
        ss = bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        )
        out += b"ID3" + b"\x04\x00" + b"\x00" + ss + bytes(id3_len)
    br_idx = _MP3_BITRATES.index(bitrate_kbps)
    sr_idx = _MP3_RATES.index(sample_rate)
    hdr = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00]
    )  # sync, MPEG1 L3 no-CRC, bitrate/samplerate, no padding
    frame_len = (144000 * bitrate_kbps) // sample_rate
    frame = hdr + bytes((frame_len - 4) * [0x55])
    return out + frame * n_frames


def build_flac(sample_rate: int, n_samples: int, frame_len: int = 0) -> bytes:
    """FLAC skeleton: "fLaC" magic + a last-block STREAMINFO (type 0,
    34 bytes) carrying sample rate (20 bits), channels, bps and the
    36-bit total-sample count, + filler frame bytes. Size: 42 +
    frame_len."""
    if not 0 < sample_rate < (1 << 20):
        raise ValueError(f"build_flac: sample rate {sample_rate} out of range")
    if not 0 <= n_samples < (1 << 36):
        raise ValueError("build_flac: total samples out of 36-bit range")
    header = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
    # min/max block size, min/max frame size
    info = (4096).to_bytes(2, "big") * 2 + (0).to_bytes(3, "big") * 2
    # 64-bit field: rate(20) | channels-1(3) | bps-1(5) | total(36)
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | n_samples
    info += packed.to_bytes(8, "big")
    info += bytes(16)  # MD5 of the unencoded audio (zeroed)
    return header + info + bytes(frame_len)


def parse_flac(b: bytes) -> dict | None:
    if len(b) < 8 or b[:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(b):
        btype = b[pos] & 0x7F
        last = bool(b[pos] & 0x80)
        blen = int.from_bytes(b[pos + 1:pos + 4], "big")
        body = pos + 4
        if btype == 0:  # STREAMINFO
            if blen < 34 or body + 34 > len(b):
                return None
            packed = int.from_bytes(b[body + 10:body + 18], "big")
            rate = packed >> 44
            total = packed & ((1 << 36) - 1)
            if not rate:
                return None  # a declared rate of 0 is corrupt: NULL row
            return dict(
                _EMPTY, container="flac", sample_rate=rate,
                duration_s=total / float(rate),
            )
        if last:
            break
        pos = body + blen
    return None  # no STREAMINFO: spec-invalid


def parse_bmp(b: bytes) -> dict | None:
    if len(b) < 26 or b[:2] != b"BM":
        return None
    info_len = struct.unpack("<I", b[14:18])[0]
    if info_len < 40 or len(b) < 54:
        return None  # BITMAPCOREHEADER and truncated variants: NULL row
    w, h = struct.unpack("<ii", b[18:26])
    # height may be negative (top-down rows) — the dimension is |h|;
    # width may NOT (no spec meaning), so a negative width is a corrupt
    # file and yields the module's NULL row, like parse_wav's rate=0
    if w <= 0:
        return None
    return dict(_EMPTY, container="bmp", width=w, height=abs(h), n_frames=1)


def parse_tiff(b: bytes) -> dict | None:
    if len(b) < 8:
        return None
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        return None
    (ifd_off,) = struct.unpack(e + "I", b[4:8])
    if ifd_off + 2 > len(b):
        return None
    (n_entries,) = struct.unpack(e + "H", b[ifd_off:ifd_off + 2])
    w = h = None
    for i in range(n_entries):
        lo = ifd_off + 2 + 12 * i
        if lo + 12 > len(b):
            return None
        tag, ftype, count = struct.unpack(e + "HHI", b[lo:lo + 8])
        if count != 1 or ftype not in (3, 4):
            continue
        if ftype == 3:  # SHORT sits in the first two value bytes
            (val,) = struct.unpack(e + "H", b[lo + 8:lo + 10])
        else:  # LONG uses all four
            (val,) = struct.unpack(e + "I", b[lo + 8:lo + 12])
        if tag == 256:
            w = val
        elif tag == 257:
            h = val
    if w is None or h is None:
        return None
    return dict(_EMPTY, container="tiff", width=w, height=h, n_frames=1)


def parse_mp3(b: bytes) -> dict | None:
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        sz = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        pos = 10 + sz
    n_frames = 0
    sample_rate = None
    while pos + 4 <= len(b):
        h = b[pos:pos + 4]
        # MPEG-1 Layer III sync: 11 set bits, version 11, layer 01
        if h[0] != 0xFF or (h[1] & 0xFE) != 0xFA:
            break
        br_idx = (h[2] >> 4) & 0xF
        sr_idx = (h[2] >> 2) & 0x3
        padding = (h[2] >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            break  # free-format/bad: stop at the last valid frame
        rate = _MP3_RATES[sr_idx]
        if sample_rate is None:
            sample_rate = rate
        frame_len = (144000 * _MP3_BITRATES[br_idx]) // rate + padding
        if pos + frame_len > len(b):
            break  # truncated final frame doesn't count
        n_frames += 1
        pos += frame_len
    if not n_frames or not sample_rate:
        return None
    duration = n_frames * _MP3_SPF / float(sample_rate)
    return dict(
        _EMPTY, container="mp3", n_frames=n_frames,
        sample_rate=sample_rate, duration_s=duration,
    )


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
    elif b[:4] == b"fLaC":
        out = parse_flac(b)
    elif b[:2] == b"BM":
        out = parse_bmp(b)
    elif b[:4] in (b"II*\x00", b"MM\x00*"):
        out = parse_tiff(b)
    elif b[:3] == b"ID3" or (len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xFE) == 0xFA):
        out = parse_mp3(b)
    else:
        out = None
    return out if out is not None else dict(_EMPTY)


# ------------------------------------------- real pixel/sample codecs
#
# Uncompressed containers decode with struct/numpy alone — these are
# REAL kernels, not stubs: encode_bmp24/decode_bmp24 invert each other
# over the actual BMP pixel layout (bottom-up rows, 4-byte row
# padding, BGR channel order), decode_wav_pcm16 yields the actual
# int16 samples the RIFF data chunk carries.


def encode_bmp24(arr) -> bytes:
    """numpy (h, w, 3) uint8, BGR channel order, top-down rows -> a
    valid 24-bit BITMAPINFOHEADER BMP (bottom-up storage, rows padded
    to 4 bytes)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    pad = (-(w * 3)) % 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage order
        rows += a[y].tobytes() + b"\x00" * pad
    pix = bytes(rows)
    total = 54 + len(pix)
    fh = b"BM" + struct.pack("<IHHI", total, 0, 0, 54)
    ih = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return fh + ih + pix


def decode_bmp24(b: bytes):
    """24-bit uncompressed BMP -> numpy (h, w, 3) uint8 BGR top-down,
    or None for anything this real-but-narrow decoder doesn't cover
    (other bit depths, compressed BMPs, truncated pixel arrays) —
    decode failures are data, never exceptions.

    Handles both bottom-up (height > 0) and top-down (height < 0)
    storage and the 4-byte row padding."""
    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        return None
    offset = struct.unpack("<I", b[10:14])[0]
    info_len = struct.unpack("<I", b[14:18])[0]
    if info_len < 40:
        return None
    w, h_signed = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    compression = struct.unpack("<I", b[30:34])[0]
    if w <= 0 or h_signed == 0 or bpp != 24 or compression != 0:
        return None
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    if offset + stride * h > len(b):
        return None
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up file -> top-down array
        rows = rows[::-1]
    return rows.copy()


def resize_bmp24_nearest(b: bytes, width: int, height: int) -> bytes | None:
    """REAL nearest-neighbor resample of a 24-bit BMP, re-encoded as a
    24-bit BMP. Source pixel for output (X, Y) is
    (floor(X·sw/width), floor(Y·sh/height)) — pure integer index math,
    so an SQL oracle can predict every output pixel. None for blobs
    decode_bmp24 doesn't claim."""
    import numpy as np

    src = decode_bmp24(b)
    if src is None:
        return None
    sh, sw, _ = src.shape
    xs = (np.arange(width) * sw) // width
    ys = (np.arange(height) * sh) // height
    return encode_bmp24(src[np.ix_(ys, xs)])


def decode_wav_pcm16(b: bytes):
    """Mono 16-bit PCM RIFF/WAVE -> (sample_rate, numpy int16 samples),
    or None for anything else (other encodings/bit depths/channel
    counts, truncated data) — same honest-failure contract as the
    header parsers."""
    import numpy as np

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        ctype = b[pos : pos + 4]
        clen = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if ctype == b"fmt " and clen >= 16 and pos + 24 <= len(b):
            fmt = struct.unpack("<HHIIHH", b[pos + 8 : pos + 24])
        elif ctype == b"data":
            if pos + 8 + clen > len(b):
                return None  # truncated data chunk
            data = b[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        return None
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16 or sample_rate == 0:
        return None
    samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    return sample_rate, samples


# PNG is the one COMPRESSED container that decodes stdlib-only: IDAT is
# zlib deflate over filtered scanlines, and the five per-row filters
# (None/Sub/Up/Average/Paeth, PNG spec §9) are byte arithmetic. These
# are REAL kernels over real pixels — encode_png_rgb/decode_png_rgb
# invert each other for 8-bit truecolor (color type 2, no interlace),
# including every filter type; anything narrower-than-spec (palette,
# alpha, 16-bit, Adam7) returns None per the honest-failure contract.


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties won by left, then up."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_row(ftype: int, row: bytes, prev: bytes) -> bytes:
    """Forward-filter one scanline (bpp = 3); `prev` is the RAW prior
    scanline (zeros for the first row)."""
    out = bytearray(len(row))
    for i in range(len(row)):
        left = row[i - 3] if i >= 3 else 0
        up = prev[i]
        ul = prev[i - 3] if i >= 3 else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            pred = _paeth(left, up, ul)
        out[i] = (row[i] - pred) & 0xFF
    return bytes(out)


def _png_unfilter_row(ftype: int, row: bytearray, prev: bytes) -> None:
    """Reconstruct one filtered scanline IN PLACE (bpp = 3); `prev` is
    the already-reconstructed prior scanline (zeros for the first)."""
    for i in range(len(row)):
        left = row[i - 3] if i >= 3 else 0
        up = prev[i]
        ul = prev[i - 3] if i >= 3 else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            pred = _paeth(left, up, ul)
        row[i] = (row[i] + pred) & 0xFF


def encode_png_rgb(arr, row_filters=None) -> bytes:
    """numpy (h, w, 3) uint8, RGB channel order, top-down rows -> a
    valid 8-bit truecolor PNG (one IDAT, real CRCs). ``row_filters``
    optionally gives the filter type (0-4) per scanline — the fixture
    uses it to exercise ALL five unfilter paths; default is type 0."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    raw = bytearray()
    prev = bytes(w * 3)
    for y in range(h):
        row = a[y].tobytes()
        ftype = int(row_filters[y]) if row_filters is not None else 0
        raw.append(ftype)
        raw += _png_filter_row(ftype, row, prev)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_rgb(b: bytes):
    """8-bit truecolor PNG -> numpy (h, w, 3) uint8 RGB top-down, or
    None for anything this real-but-narrow decoder doesn't cover
    (palette/alpha/16-bit/interlaced, truncated or corrupt streams).
    Walks the chunk list (IDAT may be split), inflates, and runs the
    per-row unfilter for all five filter types."""
    import numpy as np

    if len(b) < 8 or b[:8] != PNG_SIG:
        return None
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        payload = b[pos + 8 : pos + 8 + clen]
        if len(payload) < clen:
            return None
        if ctype == b"IHDR":
            ihdr = payload
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, depth, ctype_, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if depth != 8 or ctype_ != 2 or comp != 0 or filt != 0 or interlace != 0:
        return None
    if w == 0 or h == 0:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * 3
    if len(raw) != h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytes(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        if ftype > 4:
            return None
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        _png_unfilter_row(ftype, row, prev)
        prev = bytes(row)
        out[y] = np.frombuffer(prev, dtype=np.uint8)
    return out.reshape(h, w, 3)


def resize_png_nearest(b: bytes, width: int, height: int) -> bytes | None:
    """REAL nearest-neighbor resample of an 8-bit truecolor PNG,
    re-encoded as a PNG (filter type 0 rows — the content, not the
    filter choice, is the contract). Source pixel for output (X, Y) is
    (floor(X·sw/width), floor(Y·sh/height)) — the same integer index
    math as the BMP kernel, so an SQL oracle predicts every pixel.
    None for blobs decode_png_rgb doesn't claim."""
    import numpy as np

    src = decode_png_rgb(b)
    if src is None:
        return None
    sh, sw, _ = src.shape
    xs = (np.arange(width) * sw) // width
    ys = (np.arange(height) * sh) // height
    return encode_png_rgb(src[np.ix_(ys, xs)])


# ------------------------------------------------- GIF LZW pixel kernel
#
# Real LZW codec for GIF image data — the second genuinely COMPRESSED
# container with a full pixel path (PNG/zlib being the first). The
# encoder exists to build valid fixtures; the decoder is the kernel
# under test. Both use the same width-growth rule (bump after the
# table add that fills the current code space, 12-bit cap, CLEAR on
# table full), which the roundtrip property tests pin across the
# 9->10->11->12-bit transitions and the 4096-entry reset.


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR emitted first and
    on table overflow, EOI last."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    prev = -1
    for byte in data:
        if prev < 0:
            prev = byte
            continue
        if (prev, byte) in table:
            prev = table[(prev, byte)]
            continue
        emit(prev, width)
        if next_code < 4096:
            table[(prev, byte)] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table.clear()
            width = min_code_size + 1
            next_code = eoi + 1
        prev = byte
    if prev >= 0:
        emit(prev, width)
        # the decoder grows its table on EVERY data code after the
        # first — including this flush, which the encoder never pairs
        # with an add. Simulate that add so the EOI is emitted at the
        # width the decoder will read it with (the tail twin of the
        # decoder's 2^w - 1 bump).
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes | None:
    """Inverse of `_lzw_encode`; None on any malformed stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return -1
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    out = bytearray()
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev = -1
    while True:
        code = read(width)
        if code < 0:
            return None
        if code == clear:
            table = table[: eoi + 1]
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            return bytes(out)
        if prev < 0:
            if code >= len(table):
                return None
            out += table[code]
            prev = code
            continue
        if code < len(table):
            s = table[code]
        elif code == len(table):
            s = table[prev] + table[prev][:1]
        else:
            return None
        out += s
        if len(table) < 4096:
            table.append(table[prev] + s[:1])
            # one EARLY relative to the encoder's bump: when the
            # encoder emits a code it has already added the entry the
            # decoder can only reconstruct after this read, so the
            # decoder's table lags by one — it must widen at 2^w - 1
            # (the classic GIF decoder off-by-one)
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = code
    return None


def encode_gif_indexed(idx, palette) -> bytes:
    """numpy (h, w) uint8 palette indices + 256-entry RGB palette ->
    a valid single-image GIF87a (global color table, REAL LZW-packed
    image data in 255-byte sub-blocks)."""
    import numpy as np

    a = np.asarray(idx, dtype=np.uint8)
    h, w = a.shape
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    assert len(pal) == 768, "palette must have 256 RGB entries"
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    out += pal
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(a.tobytes(), 8)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif_indexed(b: bytes):
    """Single-image GIF with a 256-entry GCT -> (numpy (h, w) uint8
    indices, numpy (256, 3) uint8 RGB palette), or None for anything
    this real-but-narrow decoder doesn't cover (no GCT, local color
    tables, interlace, multi-frame/extensions beyond skippable
    blocks, malformed LZW)."""
    import numpy as np

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w0, h0, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    if not packed & 0x80:
        return None
    gct_n = 2 << (packed & 0x07)
    pos = 13
    if pos + 3 * gct_n > len(b):
        return None
    pal_raw = b[pos : pos + 3 * gct_n]
    pos += 3 * gct_n
    if gct_n != 256:
        return None
    while pos < len(b):
        marker = b[pos]
        if marker == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(b) and b[pos]:
                pos += 1 + b[pos]
            pos += 1
        elif marker == 0x2C:
            if pos + 10 > len(b):
                return None
            _l, _t, iw, ih, ipacked = struct.unpack(
                "<HHHHB", b[pos + 1 : pos + 10]
            )
            if ipacked & 0xC0:  # LCT or interlace
                return None
            pos += 10
            if pos >= len(b):
                return None
            mcs = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos]:
                n = b[pos]
                data += b[pos + 1 : pos + 1 + n]
                pos += 1 + n
            raw = _lzw_decode(bytes(data), mcs)
            if raw is None or len(raw) != iw * ih or iw == 0 or ih == 0:
                return None
            idx = np.frombuffer(raw, dtype=np.uint8).reshape(ih, iw)
            pal = np.frombuffer(pal_raw, dtype=np.uint8).reshape(256, 3)
            return idx, pal
        elif marker == 0x3B:
            return None  # trailer before any image
        else:
            return None
    return None


def decode_gif_rgb(b: bytes):
    """GIF -> numpy (h, w, 3) uint8 RGB top-down via the global
    palette, or None (see `decode_gif_indexed` coverage)."""
    got = decode_gif_indexed(b)
    if got is None:
        return None
    idx, pal = got
    return pal[idx]


def resize_gif_nearest(b: bytes, width: int, height: int) -> bytes | None:
    """REAL nearest-neighbor resample of a GIF in INDEX space (the
    palette carries over untouched), re-encoded through the real LZW
    encoder. Source pixel for output (X, Y) is (X·sw//width,
    Y·sh//height) — the same integer index math as the PNG/BMP
    kernels, so an SQL oracle predicts every output pixel."""
    import numpy as np

    got = decode_gif_indexed(b)
    if got is None or width <= 0 or height <= 0:
        return None
    idx, pal = got
    sh, sw = idx.shape
    xs = (np.arange(width) * sw) // width
    ys = (np.arange(height) * sh) // height
    out = idx[np.ix_(ys, xs)]
    return encode_gif_indexed(out, [tuple(p) for p in pal])
