"""Real GIF (LZW) and BMP pixel decodes (multimodal/media.py).

The GIF test encoder uses the classic 'uncompressed GIF' trick —
emit a CLEAR code before every pixel code so the LZW dictionary
never grows — which is a valid (if inefficient) LZW stream any
conformant decoder must accept. The decoders are then driven both
directly and through the Spark decode_images path.
"""

import struct

import numpy as np

from pipeline_dataengineer_spark.multimodal.media import (
    _decode_bmp,
    _decode_gif,
    _gif_lzw_decode,
    attach_media_metadata,
    decode_images,
)


def make_gif(width, height, palette, pixel_fn, interlaced=False):
    """Minimal GIF89a encoder: global palette, one image block,
    clear-before-every-code LZW."""
    npal = max(2, len(palette))
    bits = max(1, (npal - 1).bit_length())
    npal = 1 << bits
    pal = list(palette) + [(0, 0, 0)] * (npal - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    for r, g, b in pal:
        out += bytes((r, g, b))
    iflags = 0x40 if interlaced else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, iflags)
    min_code = max(2, bits)
    clear, end = 1 << min_code, (1 << min_code) + 1
    width_bits = min_code + 1
    # row order: interlaced files store passes 0,4 / 2 / 1 (mod 8|4|2)
    rows = list(range(height))
    if interlaced:
        rows = (
            list(range(0, height, 8))
            + list(range(4, height, 8))
            + list(range(2, height, 4))
            + list(range(1, height, 2))
        )
    codes = []
    for y in rows:
        for x in range(width):
            codes.append(clear)
            codes.append(pixel_fn(x, y))
    codes.append(end)
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width_bits
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out.append(min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def make_bmp(width, height, pixel_fn, bpp=24, top_down=False):
    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    rows = range(height) if top_down else range(height - 1, -1, -1)
    body = bytearray()
    for y in rows:
        line = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            line += bytes((b, g, r)) + (b"\x00" if nch == 4 else b"")
        line += b"\x00" * (stride - len(line))
        body += line
    h_field = -height if top_down else height
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, h_field, 1, bpp, 0,
                      len(body), 2835, 2835, 0, 0)
    return bytes(hdr + dib + body)


PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]


def _checker(x, y):
    return (x + y) % 4


def test_gif_lzw_real_compression_decodes():
    """A properly-compressed stream (dictionary actually grows) —
    hand-built: min_code=2, codes CLEAR,0,1,(first dict entry=6:'01'),END."""
    # width tracking: after clear, width 3; entries 6,7 added as we go
    # clear=4, end=5; decoding 0 then 1 adds entry 6 = b'\x00\x01',
    # so the code sequence below must emit pixels 0,1,0,1
    codes = [4, 0, 1, 6, 5]
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out = _gif_lzw_decode(2, bytes(data))
    assert out == [0, 1, 0, 1]


def test_gif_roundtrip_pixels():
    gif = make_gif(10, 6, PAL, _checker)
    w, h, ch, px = _decode_gif(gif)
    assert (w, h, ch) == (10, 6, 3)
    a = np.frombuffer(px, dtype=np.uint8).reshape(6, 10, 3)
    for y in range(6):
        for x in range(10):
            assert tuple(a[y, x]) == PAL[_checker(x, y)]


def test_gif_interlaced_roundtrip():
    gif = make_gif(8, 16, PAL, _checker, interlaced=True)
    w, h, ch, px = _decode_gif(gif)
    a = np.frombuffer(px, dtype=np.uint8).reshape(16, 8, 3)
    for y in range(16):
        for x in range(8):
            assert tuple(a[y, x]) == PAL[_checker(x, y)]


def test_bmp_roundtrip_pixels():
    def grad(x, y):
        return (x * 20 % 256, y * 30 % 256, 7)

    for bpp in (24, 32):
        for td in (False, True):
            bmp = make_bmp(7, 5, grad, bpp=bpp, top_down=td)
            w, h, ch, px = _decode_bmp(bmp)
            assert (w, h, ch) == (7, 5, 3)
            a = np.frombuffer(px, dtype=np.uint8).reshape(5, 7, 3)
            for y in range(5):
                for x in range(7):
                    assert tuple(a[y, x]) == grad(x, y)


def test_gif_bmp_through_spark_decode(spark):
    gif = make_gif(12, 8, PAL, _checker)
    bmp = make_bmp(9, 4, lambda x, y: (200, 100, 50))
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(bmp))], "id long, payload binary"
    )
    mime = {r["id"]: r["sniffed_mime"] for r in attach_media_metadata(df).collect()}
    assert mime == {1: "image/gif", 2: "image/bmp"}
    got = {r["id"]: (r["width"], r["height"]) for r in decode_images(df).collect()}
    assert got == {1: (12, 8), 2: (9, 4)}
