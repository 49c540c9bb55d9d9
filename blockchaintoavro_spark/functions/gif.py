"""Pure-Python GIF codec (GIF87a/89a) for the multimodal (X5) pipeline —
NO Spark imports (the same pure-twin worker contract as imaging.py).

GIF is LZW + palettes — fully losslessly decodable with stdlib-only code,
and the one common container that is natively MULTI-FRAME, which is what
makes the frame-sampling operator (operators/multimodal.py) real instead
of a byte-splitting stub.

Scope (documented subset):
- **Decoder**: global + local color tables, interlaced and sequential
  frames, sub-rect frames composited onto the logical screen, GCE
  transparency (transparent pixels keep the previous canvas), disposal
  methods 0/1 (keep) and 2 (restore to background); full LZW with code
  width growth to 12 bits, CLEAR/EOI handling, deferred-clear streams.
- **Encoder**: GIF89a, one global color table, full-frame images,
  sequential (non-interlaced) rows, real LZW compression. Grayscale
  palette by default so ``pixels`` are palette indices == channel value
  (what the x_gif_decode oracle's id arithmetic relies on — GIF is
  lossless, so encode→decode is the identity on indices).

``decode_gif`` returns the FIRST composited frame in the imaging.py
feature contract ``{format, width, height, channels, pixels}`` (channels
is always 3 — palette entries are RGB) plus ``n_frames``;
``decode_gif_frames`` yields every composited frame for the
frame-sampling operator. Written to the public GIF89a specification.
"""

from __future__ import annotations

import struct


def _read_color_table(data: bytes, pos: int, size_flag: int) -> tuple[list, int]:
    n = 2 << size_flag
    table = [
        (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
        for i in range(n)
    ]
    return table, pos + 3 * n


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-flavor LZW: little-endian bit packing, growing code width,
    CLEAR resets the dictionary, stops at EOI or when ``expected``
    pixels are produced (tolerates missing EOI, a common wild quirk)."""
    # spec: LZW minimum code size is 1..8 (palette bit depth; code widths
    # cap at 12). A corrupt byte here (fuzz finding: 30) would otherwise
    # make reset() allocate a 2^30-entry dictionary — an allocation bomb
    # from one flipped byte.
    if not 1 <= min_code_size <= 8:
        raise ValueError(f"GIF: bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary as (prefix_code, last_byte); roots are single bytes
    prefix: list[int] = []
    last: list[int] = []

    def reset():
        nonlocal prefix, last, width, next_code
        prefix = [-1] * clear + [-1, -1]
        last = list(range(clear)) + [0, 0]
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset()
    acc = nbits = 0
    prev = -1

    def first_byte(code: int) -> int:
        while prefix[code] != -1:
            code = prefix[code]
        return last[code]

    def emit(code: int) -> None:
        chain = []
        c = code
        while c != -1:
            chain.append(last[c])
            c = prefix[c]
        out.extend(reversed(chain))

    for b in data:
        acc |= b << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = -1
                continue
            if code == eoi:
                return out
            if prev == -1:
                if code >= next_code:
                    raise ValueError("GIF: first LZW code out of range")
                emit(code)
                prev = code
                continue
            if code < next_code:
                emit(code)
                if next_code < 4096:
                    prefix.append(prev)
                    last.append(first_byte(code))
                    next_code += 1
            elif code == next_code:
                # KwKwK case: emit prev + first byte of prev
                fb = first_byte(prev)
                emit(prev)
                out.append(fb)
                if next_code < 4096:
                    prefix.append(prev)
                    last.append(fb)
                    next_code += 1
            else:
                raise ValueError("GIF: LZW code out of range")
            prev = code
            if next_code == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return out
    return out


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif_frames(data: bytes) -> dict:
    """Full decode → ``{width, height, frames: [bytes RGB, ...]}`` with
    each frame composited onto the logical screen (sub-rects, disposal,
    transparency applied)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h = struct.unpack("<HH", data[6:10])
    from blockchaintoavro_spark.functions.imaging import check_dims

    check_dims(w, h, "GIF")  # corrupt headers → pixel bombs (fuzz finding)
    flags = data[10]
    bg_index = data[11]
    pos = 13
    global_table = None
    if flags & 0x80:
        global_table, pos = _read_color_table(data, pos, flags & 7)
    canvas = bytearray(w * h * 3)
    if global_table is not None:
        r, g, b = global_table[bg_index] if bg_index < len(global_table) else (0, 0, 0)
        for i in range(0, len(canvas), 3):
            canvas[i], canvas[i + 1], canvas[i + 2] = r, g, b
    bg_pixel = bytes(canvas[:3])
    frames: list[bytes] = []
    transparent = -1
    disposal = 0
    n = len(data)
    while pos < n:
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control extension
                sz = data[pos]
                gce = data[pos + 1 : pos + 1 + sz]
                disposal = (gce[0] >> 2) & 7
                transparent = gce[3] if gce[0] & 1 else -1
                pos += 1 + sz
                if data[pos] != 0:
                    raise ValueError("GIF: GCE missing terminator")
                pos += 1
            else:  # skip sub-blocks of any other extension
                while True:
                    sz = data[pos]
                    pos += 1 + sz
                    if sz == 0:
                        break
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block {block:#x}")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        from blockchaintoavro_spark.functions.imaging import check_dims

        check_dims(fw, fh, "GIF frame")  # sub-rects are bombable too
        iflags = data[pos + 8]
        pos += 9
        table = global_table
        if iflags & 0x80:
            table, pos = _read_color_table(data, pos, iflags & 7)
        if table is None:
            raise ValueError("GIF: no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            sz = data[pos]
            pos += 1
            if sz == 0:
                break
            lzw += data[pos : pos + sz]
            pos += sz
        indices = _lzw_decode(min_code, bytes(lzw), fw * fh)
        if len(indices) < fw * fh:
            raise ValueError("GIF: truncated LZW pixel data")
        before = bytes(canvas) if disposal == 3 else None
        # row order: interlaced four-pass or sequential
        if iflags & 0x40:
            row_order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, fh, step)
            ]
        else:
            row_order = list(range(fh))
        for src_y, dst_y in enumerate(row_order):
            cy = top + dst_y
            if cy >= h:
                continue
            for x in range(min(fw, w - left)):
                idx = indices[src_y * fw + x]
                if idx == transparent:
                    continue
                if idx >= len(table):
                    raise ValueError("GIF: palette index out of range")
                o = (cy * w + left + x) * 3
                canvas[o], canvas[o + 1], canvas[o + 2] = table[idx]
        frames.append(bytes(canvas))
        if disposal == 2:  # restore to background
            for dy in range(fh):
                cy = top + dy
                if cy >= h:
                    continue
                for x in range(min(fw, w - left)):
                    o = (cy * w + left + x) * 3
                    canvas[o : o + 3] = bg_pixel
        elif disposal == 3 and before is not None:  # restore to previous
            canvas = bytearray(before)
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return {"width": w, "height": h, "frames": frames}


def decode_gif(data: bytes) -> dict:
    """First frame in the imaging.py feature contract (+ ``n_frames``)."""
    d = decode_gif_frames(data)
    return {
        "format": "gif",
        "width": d["width"],
        "height": d["height"],
        "channels": 3,
        "pixels": d["frames"][0],
        "n_frames": len(d["frames"]),
    }


# ---------------------------------------------------------------------------
# encoder


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: emit CLEAR and restart (bounded memory)
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([byte])
    if run:
        put(table[run], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """GIF89a writer: full-frame images over one global color table.
    ``frames`` are palette-index planes (one byte per pixel). Default
    palette is the 256-gray ramp ``(i, i, i)`` so decoded RGB channel
    values equal the index — the lossless identity the oracle exploits."""
    if palette is None:
        palette = [(i, i, i) for i in range(256)]
    n_colors = len(palette)
    size_flag = max(1, (n_colors - 1).bit_length()) - 1
    table_n = 2 << size_flag
    if n_colors > 256:
        raise ValueError("GIF palette exceeds 256 colors")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame length != width*height")
        if max(f, default=0) >= n_colors:
            raise ValueError("palette index out of range")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | size_flag, 0, 0])  # GCT present, bg=0, no aspect
    for i in range(table_n):
        r, g, b = palette[i] if i < n_colors else (0, 0, 0)
        out += bytes([r, g, b])
    if len(frames) > 1:  # NETSCAPE loop extension for animation
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, size_flag + 1)
    for f in frames:
        if len(frames) > 1:  # per-frame GCE with a 4/100 s delay
            out += b"\x21\xf9\x04\x04\x04\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, f)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
