"""Pure-Python media HEADER codecs — the real decode seam for the
multimodal pipeline (no image/audio libraries in this container, so
dimensions/sample metadata come from the container headers directly;
pixel/sample decode would plug into the same mapInPandas kernels).

Formats: PNG (IHDR), JPEG (SOF0/1/2 scan), GIF (logical screen), BMP
(BITMAPINFOHEADER), WAV (RIFF/fmt/data). Synthesis helpers build
minimal valid headers for tests and gate corpora — deterministic and
closed-form in size, so a SQL oracle can re-derive every decoded field
from the construction parameters.
"""

from __future__ import annotations

import struct

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def decode_image(b: bytes):
    """(format, width, height) from the container header, or None if
    the bytes are not a recognized image."""
    b = bytes(b)
    if b[:8] == PNG_SIG and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", int(w), int(h)
    if b[:2] == b"\xff\xd8":  # JPEG SOI; scan markers for a SOF frame
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2
                continue
            if i + 4 > len(b):
                break
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 > len(b):
                    break
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", int(w), int(h)
            i += 2 + seg_len
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", int(w), int(h)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return "bmp", int(w), abs(int(h))
    return None


def decode_wav(b: bytes):
    """(sample_rate, channels, bits, n_samples) from a RIFF/WAVE
    header, or None."""
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    rate = channels = bits = block = None
    n_samples = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
            block, bits = struct.unpack("<HH", b[i + 20 : i + 24])
        elif cid == b"data":
            if block:
                n_samples = size // block
        i += 8 + size + (size & 1)
    if rate is None:
        return None
    return int(rate), int(channels), int(bits), int(n_samples or 0)


# ---- synthesis (tests + gate corpora; sizes are closed-form) ----------------


def png_bytes(width: int, height: int, tail: bytes = b"") -> bytes:
    """Minimal PNG header (signature + IHDR, 33 bytes) + tail. The CRC
    is real, so external tools agree on the header."""
    import zlib

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        PNG_SIG
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        + tail
    )


def jpeg_bytes(width: int, height: int, tail: bytes = b"") -> bytes:
    """Minimal JPEG: SOI + SOF0 (3 components), 21 bytes + tail."""
    sof = struct.pack(">HBHHB", 17, 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return b"\xff\xd8\xff\xc0" + sof + tail


def wav_bytes(sample_rate: int, data: bytes, channels: int = 1, bits: int = 16) -> bytes:
    """Canonical 44-byte WAV header + data."""
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---- MP4 (ISO BMFF) header codec --------------------------------------------
#
# Minimal box walk: ftyp + moov(mvhd + trak(tkhd)) + mdat. Enough for
# the metadata a demuxer's probe step yields (duration/timescale and
# the track's presentation dimensions) without any media library.

_MP4_TIMESCALE = 24  # ticks == frames at the synthesis' fixed 24 fps


def mp4_bytes(width: int, height: int, n_frames: int, tail: bytes = b"") -> bytes:
    """Minimal valid ISO BMFF file: ftyp, moov(mvhd v0 with
    timescale=24 and duration=n_frames, trak(tkhd v0 with 16.16-fixed
    width/height)), mdat(tail). Fixed header size: 244 bytes + tail
    (closed-form for SQL oracles)."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", _MP4_TIMESCALE, int(n_frames))  # timescale, duration
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4  # reserved
        + struct.pack(">I", int(n_frames))  # duration
        + b"\x00" * 8  # reserved
        + struct.pack(">hh", 0, 0)  # layer, alternate_group
        + struct.pack(">h", 0)  # volume (video track)
        + b"\x00" * 2  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", int(width) << 16, int(height) << 16),  # 16.16 fixed
    )
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    mdat = box(b"mdat", bytes(tail))
    return ftyp + moov + mdat


def decode_mp4(b: bytes):
    """(timescale, duration, width, height) from the moov header, or
    None if the bytes are not ISO BMFF. Walks top-level boxes, then
    moov children, then trak children — a demuxer's probe step."""
    b = bytes(b)

    def walk(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", b[i : i + 4])[0]
            if size < 8 or i + size > hi:
                return
            yield b[i + 4 : i + 8], i + 8, i + size
            i += size

    if len(b) < 16 or b[4:8] != b"ftyp":
        return None
    timescale = duration = width = height = None
    for typ, lo, hi in walk(0, len(b)):
        if typ != b"moov":
            continue
        for t2, lo2, hi2 in walk(lo, hi):
            if t2 == b"mvhd" and hi2 - lo2 >= 20:
                # version byte decides the layout: v0 packs 32-bit
                # times (timescale@12, duration@16), v1 packs 64-bit
                # creation/modification (timescale@20, duration@24 as
                # uint64) — ISO/IEC 14496-12 §8.2.2
                if b[lo2] == 1 and hi2 - lo2 >= 32:
                    timescale = struct.unpack(">I", b[lo2 + 20 : lo2 + 24])[0]
                    duration = struct.unpack(">Q", b[lo2 + 24 : lo2 + 32])[0]
                else:
                    timescale, duration = struct.unpack(">II", b[lo2 + 12 : lo2 + 20])
            elif t2 == b"trak":
                for t3, lo3, hi3 in walk(lo2, hi2):
                    if t3 == b"tkhd" and hi3 - lo3 >= 84:
                        w_fx, h_fx = struct.unpack(">II", b[hi3 - 8 : hi3])
                        width, height = w_fx >> 16, h_fx >> 16
    if timescale is None:
        return None
    return int(timescale), int(duration), int(width or 0), int(height or 0)
