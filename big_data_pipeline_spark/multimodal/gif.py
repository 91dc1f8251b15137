"""Stdlib-only GIF87a/89a codec: real variable-width LZW, multi-frame.

Third real compressed image format behind the multimodal surface
(netpbm → PNG (r5, zlib/filters) → JPEG (r6, DCT/Huffman) → GIF):
GIF is the container a web-scraped multimodal corpus meets for
animations, and its LZW entropy coding is implemented here from the
public GIF89a specification — variable code width (9→12 bits,
LSB-first bit packing), clear/EOI codes, dictionary growth and reset,
deferred-clear tolerance, sub-block framing, and the interlace row
schedule. No codec library.

- :func:`encode_gif` — one or more (H, W) uint8 frames with a shared
  256-entry grayscale palette (pixel value == palette index), emitted
  as an animated GIF89a (Graphic Control Extension per frame) or a
  bare GIF87a-style single-image stream.
- :func:`decode_gif` — header/LSD/palette parse, extension walk,
  per-frame LZW decode, optional de-interlacing, frame stack out.

Losslessness makes the oracle contract identical to PNG's: the decoded
rasters are exactly the bytes the builder put in, so a second engine
recomputes any statistic from the source text without a codec, while
this decoder must execute the real LZW machinery to reproduce them
(``multimodal_gif_frame_stats`` in workloads/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MIN_CODE_SIZE = 8  # 256-color palette
_CLEAR = 1 << _MIN_CODE_SIZE
_EOI = _CLEAR + 1
_MAX_CODE = 4096

# interlace pass schedule: (row offset, row step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _LsbBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= (code & ((1 << width) - 1)) << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _lzw_encode(indices: np.ndarray) -> bytes:
    """GIF-flavor LZW over 8-bit palette indices."""
    wtr = _LsbBitWriter()
    width = _MIN_CODE_SIZE + 1
    table: dict[tuple[int, int], int] = {}
    next_code = _EOI + 1
    wtr.write(_CLEAR, width)
    data = indices.tolist()
    if not data:
        wtr.write(_EOI, width)
        return wtr.done()
    cur = data[0]
    for nxt in data[1:]:
        key = (cur, nxt)
        if key in table:
            cur = table[key]
            continue
        wtr.write(cur, width)
        table[key] = next_code
        next_code += 1
        # grow the code width AFTER the table passes the current
        # ceiling; reset with a clear code at the 4096 cap
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= _MAX_CODE:
            wtr.write(_CLEAR, width)
            table.clear()
            next_code = _EOI + 1
            width = _MIN_CODE_SIZE + 1
        cur = nxt
    wtr.write(cur, width)
    wtr.write(_EOI, width)
    return wtr.done()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    delay_cs: int = 4,
    interlace: bool = False,
) -> bytes:
    """Encode one (H, W) uint8 frame or a list of same-shape frames as
    a grayscale-palette GIF (animated when multi-frame)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames or any(f.ndim != 2 for f in frames):
        raise ValueError("frames must be one or more 2-D uint8 arrays")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one shape")

    out = bytearray()
    animated = len(frames) > 1
    out += b"GIF89a" if animated else b"GIF87a"
    # logical screen descriptor: global color table, 8 bits, 256 colors
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # grayscale palette: index == intensity
        out += bytes((i, i, i))
    if animated:
        # Netscape looping extension + per-frame GCE
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if animated:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        flags = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
        raster = f
        if interlace:
            order = [
                r
                for off, step in _INTERLACE_PASSES
                for r in range(off, h, step)
            ]
            raster = f[order]
        out += bytes([_MIN_CODE_SIZE])
        out += _sub_blocks(_lzw_encode(raster.reshape(-1)))
    out += b"\x3b"  # trailer
    return bytes(out)


def _lzw_decode(data: bytes, n_expected: int) -> np.ndarray:
    width = _MIN_CODE_SIZE + 1
    table: list[bytes] = [bytes([i]) for i in range(_CLEAR)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == _CLEAR:
            table = [bytes([i]) for i in range(_CLEAR)] + [b"", b""]
            width = _MIN_CODE_SIZE + 1
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"invalid first LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        prev = entry
        # width grows when the NEXT code would not fit; 12-bit cap with
        # deferred-clear tolerance (table simply stops growing)
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            # some encoders omit EOI; stop once the raster is complete
            break
    if len(out) < n_expected:
        raise ValueError(
            f"LZW raster short: {len(out)} of {n_expected} pixels"
        )
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


def decode_gif(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode every frame. Returns ``(width, height, frames)`` with
    each frame an (H, W) uint8 array of palette indices (for the
    grayscale palettes this engine emits, index == intensity).

    Frames composite onto a persistent logical-screen canvas honoring
    the Graphic Control Extension's disposal method (1 = leave, 2 =
    restore region to background, 3 = restore to previous) and
    transparency index, so foreign animated GIFs with partial frames or
    do-not-dispose semantics decode to the raster a viewer would show —
    not a partial frame pasted onto zeros (ADVICE r6). Self-encoded
    GIFs are full-frame with disposal 0, for which compositing is the
    identity. Raises ValueError on malformed streams.
    """
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError(f"not a GIF payload: head={payload[:6]!r}")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    else:
        bg = 0  # bg index is meaningless without a global table
    frames: list[np.ndarray] = []
    canvas = np.full((h, w), bg, dtype=np.uint8)
    # GCE state applies to exactly one following rendering block
    disposal, transp = 0, None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = payload[pos + 1] if pos + 1 < len(payload) else 0
            pos += 2
            sub0 = b""
            while pos < len(payload) and payload[pos] != 0:
                n = payload[pos]
                if not sub0:
                    sub0 = payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            if label == 0xF9 and len(sub0) >= 4:  # Graphic Control Ext
                packed = sub0[0]
                disposal = (packed >> 2) & 0x07
                transp = sub0[3] if packed & 0x01 else None
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            if ix + iw > w or iy + ih > h:
                # Must be explicit: the transparent-composite path would
                # otherwise hit a numpy boolean-mask shape mismatch
                # (IndexError), breaking the ValueError-on-malformed
                # contract the opaque path gets from broadcasting.
                raise ValueError(
                    f"image descriptor {iw}x{ih}@({ix},{iy}) exceeds "
                    f"logical screen {w}x{h}"
                )
            if iflags & 0x80:  # local color table
                pos += 3 * (2 << (iflags & 0x07))
            min_code = payload[pos]
            pos += 1
            if min_code != _MIN_CODE_SIZE:
                raise ValueError(
                    f"unsupported LZW minimum code size {min_code}"
                )
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                n = payload[pos]
                data += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            raster = _lzw_decode(bytes(data), iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: undo the pass schedule
                order = [
                    r
                    for off, step in _INTERLACE_PASSES
                    for r in range(off, ih, step)
                ]
                deinter = np.empty_like(raster)
                deinter[order] = raster
                raster = deinter
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[iy : iy + ih, ix : ix + iw]
            if transp is None:
                region[:] = raster
            else:  # transparent pixels keep the underlying canvas
                mask = raster != transp
                region[mask] = raster[mask]
            frames.append(canvas.copy())
            if disposal == 2:  # restore region to background
                canvas[iy : iy + ih, ix : ix + iw] = bg
            elif disposal == 3:  # restore to previous canvas
                canvas = prev
            disposal, transp = 0, None
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x} at byte {pos}")
    if not frames:
        raise ValueError("GIF stream holds no image data")
    return w, h, frames
