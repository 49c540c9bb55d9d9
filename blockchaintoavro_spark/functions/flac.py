"""Pure-Python FLAC codec — NO Spark imports (workers import this
module directly; the pure-twin contract of imaging.py / jpeg.py /
gif.py / audio.py / mp4.py).

Closes the VERDICT r15 #3 gap in the audio family: functions/audio.py
stops at WAV PCM / IEEE-float / G.711, but speech corpora ship FLAC.
This is a bit-exact implementation of the PUBLISHED FLAC format
(RFC 9639 / xiph.org format spec), decoder-complete for the subset a
crawl pipeline meets and encoder-sufficient to build deterministic
fixtures that exercise every decode path:

- STREAMINFO metadata (mandatory first block), other metadata blocks
  skipped by length;
- frame headers: sync + blocking strategy, all block-size / sample-rate
  codes (literal tables, 8/16-bit follows forms), UTF-8-style coded
  frame/sample numbers, CRC-8 (poly 0x07) VERIFIED;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the published
  polynomial predictors), LPC any order (quantized coefficients +
  arithmetic shift — Python's ``>>`` floors, exactly the spec's
  arithmetic right shift), wasted-bits (flag + unary, samples shifted
  back on output);
- residuals: both Rice methods (4- and 5-bit parameters), any
  partition order, the verbatim ESCAPE (parameter 15/31 + 5-bit raw
  width), zigzag mapping;
- stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel one bit deeper, per spec);
- frame CRC-16 (poly 0x8005) VERIFIED; STREAMINFO MD5 over the
  unencoded little-endian samples VERIFIED when present — one mangled
  bit anywhere in the codec fails the checksum, so a lossless
  round-trip through this file is a whole-codec proof.

Decoded samples are returned interleaved as ints normalized to the
[-32768, 32767] convention of decode_wav (8-bit widened ``<<8``,
20/24/32-bit shifted down), so AFP fingerprints and every downstream
audio feature accept FLAC transparently via the magic dispatch in
``audio.try_decode_audio``.

Corruption (bad sync, CRC mismatch, table overrun, reserved codes)
raises ``ValueError`` — loud, not wrong; binary unpack errors are
normalized to ``ValueError`` like the MP4/Avro readers.
"""

from __future__ import annotations

import hashlib

FLAC_MAGIC = b"fLaC"

# ---------------------------------------------------------------------------
# CRCs (FLAC frame-header CRC-8 poly 0x07, frame CRC-16 poly 0x8005,
# both init 0, MSB-first — published check values crc8("123456789") =
# 0xF4, crc16("123456789") = 0xFEE8 are pinned in tests)


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


# ---------------------------------------------------------------------------
# MSB-first bit I/O


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        """q zero bits followed by a one bit (the FLAC unary form)."""
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        if self.nbits:
            raise ValueError("bit writer not byte-aligned")
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        while bits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            take = min(bits, 8 - self.bit)
            chunk = self.data[self.pos]
            chunk = (chunk >> (8 - self.bit - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            bits -= take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated in unary code")
            if self.read(1):
                return q
            q += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


# ---------------------------------------------------------------------------
# UTF-8-style coded frame/sample numbers (RFC 9639 §9.1.5 — the UTF-8
# length/continuation scheme extended to 36-bit values, 7 bytes max)


def _encode_coded_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for nbytes, cap in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << cap):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            shift = 6 * (nbytes - 1)
            out = [lead | (n >> shift)]
            for i in range(nbytes - 1):
                shift -= 6
                out.append(0x80 | ((n >> shift) & 0x3F))
            return bytes(out)
    raise ValueError(f"coded number {n} exceeds 36 bits")


def _decode_coded_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    for i in range(7):
        if not (first >> (7 - i)) & 1:
            break
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError(f"invalid coded-number lead byte {first:#x}")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError(f"invalid coded-number continuation {cont:#x}")
        n = (n << 6) | (cont & 0x3F)
    return n


# ---------------------------------------------------------------------------
# tables

_BITS_TO_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SS_CODE_TO_BITS = {v: k for k, v in _BITS_TO_SS_CODE.items()}
_SR_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
# normalize stored depth → the int16 convention of decode_wav
_DEPTH_SHIFT = {8: 8, 12: 4, 16: 0, 20: -4, 24: -8, 32: -16}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag(s: int) -> int:
    return (s << 1) if s >= 0 else (-(s << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _signed_width(s: int) -> int:
    """Bits needed to store s in two's complement (≥1)."""
    return (s if s >= 0 else ~s).bit_length() + 1


# ---------------------------------------------------------------------------
# encoder


def _fixed_residual(sig: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [
        sig[i] - sum(c * sig[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(sig))
    ]


def _write_residual(w: _BitWriter, resid: list[int]) -> None:
    """Rice method 0, partition order 0 — parameter chosen by exact
    cost, with the 5-bit-width ESCAPE when raw beats every Rice
    parameter (so both decoder paths are exercised by fixtures)."""
    n = len(resid)
    zz = [_zigzag(s) for s in resid]
    best_p, best_cost = 0, None
    for p in range(15):
        cost = n * (p + 1) + sum(u >> p for u in zz)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    raw = max((_signed_width(s) for s in resid), default=1)
    w.write(0, 2)  # coding method 0: 4-bit Rice parameters
    w.write(0, 4)  # partition order 0
    if raw <= 31 and 5 + n * raw < best_cost:
        w.write(15, 4)  # escape
        w.write(raw, 5)
        for s in resid:
            w.write_signed(s, raw)
    else:
        w.write(best_p, 4)
        for u in zz:
            w.write_unary(u >> best_p)
            if best_p:
                w.write(u & ((1 << best_p) - 1), best_p)


def _lpc_coefficients(sig: list[int], order: int, precision: int = 12):
    """Quantized LPC coefficients via autocorrelation + Levinson-Durbin.
    Coefficient QUALITY only affects compression — the residual is
    computed with the same integer arithmetic the decoder inverts, so
    the round-trip is exact regardless."""
    n = len(sig)
    auto = [
        float(sum(sig[j] * sig[j + lag] for j in range(n - lag)))
        for lag in range(order + 1)
    ]
    if auto[0] == 0.0:
        lpc = [0.0] * order
    else:
        err = auto[0]
        lpc = [0.0] * order
        for i in range(order):
            acc = auto[i + 1]
            for j in range(i):
                acc -= lpc[j] * auto[i - j]
            k = acc / err if err else 0.0
            new = lpc[:i]
            lpc[i] = k
            for j in range(i):
                lpc[j] = new[j] - k * new[i - 1 - j]
            err *= 1 - k * k
            if err <= 0:
                err = 1e-9
    cmax = max((abs(c) for c in lpc), default=0.0)
    shift = precision - 1
    if cmax > 0:
        while (cmax * (1 << shift)) >= (1 << (precision - 1)) and shift > 0:
            shift -= 1
    qcoefs = []
    lim = 1 << (precision - 1)
    for c in lpc:
        q = int(round(c * (1 << shift)))
        qcoefs.append(max(-lim, min(lim - 1, q)))
    return qcoefs, shift


def _lpc_residual(sig: list[int], qcoefs: list[int], shift: int) -> list[int]:
    order = len(qcoefs)
    return [
        sig[i]
        - (sum(qcoefs[j] * sig[i - 1 - j] for j in range(order)) >> shift)
        for i in range(order, len(sig))
    ]


def _write_subframe(
    w: _BitWriter, sig: list[int], bps: int, lpc_order: int,
    verbatim: bool,
) -> None:
    # wasted bits: common trailing zeros (spec: flag 1 + unary k-1)
    wasted = 0
    nonzero = [s for s in sig if s]
    if nonzero:
        wasted = min(
            (s & -s).bit_length() - 1 for s in nonzero
        )
        wasted = min(wasted, bps - 1)
    if wasted:
        sig = [s >> wasted for s in sig]
    eff = bps - wasted

    def header(type_bits: int) -> None:
        w.write(0, 1)
        w.write(type_bits, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if all(s == sig[0] for s in sig):
        header(0b000000)  # CONSTANT
        w.write_signed(sig[0], eff)
        return
    if verbatim:
        header(0b000001)
        for s in sig:
            w.write_signed(s, eff)
        return
    if lpc_order and len(sig) > lpc_order:
        qcoefs, shift = _lpc_coefficients(sig, lpc_order)
        precision = 12
        header(0b100000 | (lpc_order - 1))
        for s in sig[:lpc_order]:
            w.write_signed(s, eff)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for q in qcoefs:
            w.write_signed(q, precision)
        _write_residual(w, _lpc_residual(sig, qcoefs, shift))
        return
    best_order, best_cost, best_resid = 0, None, sig
    for order in range(min(4, len(sig) - 1) + 1):
        resid = _fixed_residual(sig, order)
        cost = sum(abs(s) for s in resid)
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_resid = order, cost, resid
    header(0b001000 | best_order)  # FIXED
    for s in sig[:best_order]:
        w.write_signed(s, eff)
    _write_residual(w, best_resid)


def encode_flac(
    sample_rate: int,
    channels: int,
    samples: list[int],
    bits: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    lpc_order: int = 0,
    verbatim: bool = False,
) -> bytes:
    """Interleaved int16-range samples → a standard FLAC file.

    ``bits`` is the STORED depth (8/16/24/32; 16-range input is widened
    ``<<8``/``<<16`` for the deeper depths so encode→decode is exact
    identity, narrowed ``>>8`` for 8 — the encode_wav convention).
    ``stereo_mode`` picks the inter-channel decorrelation for 2-channel
    input (``independent``/``left_side``/``right_side``/``mid_side`` —
    all exactly invertible, so every mode is lossless). ``lpc_order``
    > 0 encodes LPC subframes (Levinson-Durbin quantized coefficients);
    0 uses CONSTANT/FIXED. ``verbatim`` forces VERBATIM subframes.
    STREAMINFO carries the real MD5 of the unencoded samples, so the
    decoder's checksum verification proves the whole codec on every
    round-trip."""
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported FLAC bit depth {bits}")
    if not 1 <= block_size <= 65535:
        raise ValueError(
            f"block_size {block_size} outside the 16-bit frame-header "
            "range 1..65535"
        )
    if channels <= 0 or channels > 8:
        raise ValueError("channels must be in 1..8")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    if not samples:
        raise ValueError("FLAC needs at least one sample")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("stereo decorrelation requires exactly 2 channels")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError("sample rate must fit STREAMINFO's 20 bits")

    shift = {8: -8, 16: 0, 24: 8, 32: 16}[bits]
    if shift >= 0:
        stored = [int(s) << shift for s in samples]
    else:
        stored = [int(s) >> -shift for s in samples]
    for s in stored:
        if not -(1 << (bits - 1)) <= s < (1 << (bits - 1)):
            raise ValueError(f"sample {s} out of range for {bits}-bit FLAC")
    n_frames = len(stored) // channels
    chans = [stored[c::channels] for c in range(channels)]

    md5 = hashlib.md5()
    width = bits // 8
    md5.update(
        b"".join(
            stored[i].to_bytes(width, "little", signed=True)
            for i in range(len(stored))
        )
    )

    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n_frames, 36)
    streaminfo = si.getvalue() + md5.digest()
    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    assignment = channels - 1
    if stereo_mode == "left_side":
        assignment = 8
    elif stereo_mode == "right_side":
        assignment = 9
    elif stereo_mode == "mid_side":
        assignment = 10
    elif stereo_mode != "independent":
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")

    for frame_idx, start in enumerate(range(0, n_frames, block_size)):
        bs = min(block_size, n_frames - start)
        subs: list[tuple[list[int], int]] = []
        if assignment <= 7:
            for c in range(channels):
                subs.append((chans[c][start : start + bs], bits))
        else:
            left = chans[0][start : start + bs]
            right = chans[1][start : start + bs]
            side = [left[i] - right[i] for i in range(bs)]
            if assignment == 8:  # left/side
                subs = [(left, bits), (side, bits + 1)]
            elif assignment == 9:  # side/right
                subs = [(side, bits + 1), (right, bits)]
            else:  # mid/side
                mid = [(left[i] + right[i]) >> 1 for i in range(bs)]
                subs = [(mid, bits), (side, bits + 1)]

        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize strategy: frame number follows
        w.write(0b0111, 4)  # block size: 16-bit (bs-1) follows
        w.write(0b0000, 4)  # sample rate: from STREAMINFO
        w.write(assignment, 4)
        w.write(_BITS_TO_SS_CODE[bits], 3)
        w.write(0, 1)  # reserved
        for b in _encode_coded_number(frame_idx):
            w.write(b, 8)
        w.write(bs - 1, 16)
        hdr = w.getvalue()
        w.write(crc8(hdr), 8)
        for sig, bps in subs:
            _write_subframe(w, sig, bps, lpc_order, verbatim)
        w.align()
        body = w.getvalue()
        out += body + crc16(body).to_bytes(2, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def _read_residual(
    r: _BitReader, bs: int, order: int
) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    if bs % (1 << po):
        raise ValueError("FLAC block size not divisible by partitions")
    resid: list[int] = []
    per_part = bs >> po
    if per_part <= order and po == 0:
        raise ValueError("FLAC partition smaller than predictor order")
    for part in range(1 << po):
        count = per_part - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("FLAC first partition smaller than order")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            if raw == 0:
                resid.extend([0] * count)
            else:
                resid.extend(r.read_signed(raw) for _ in range(count))
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                resid.append(_unzigzag(u))
    return resid


def _read_subframe(r: _BitReader, bs: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample depth")
    if stype == 0b000000:  # CONSTANT
        sig = [r.read_signed(eff)] * bs
    elif stype == 0b000001:  # VERBATIM
        sig = [r.read_signed(eff) for _ in range(bs)]
    elif 0b001000 <= stype <= 0b001100:  # FIXED
        order = stype & 0x07
        sig = [r.read_signed(eff) for _ in range(order)]
        resid = _read_residual(r, bs, order)
        coefs = _FIXED_COEFS[order]
        for res in resid:
            sig.append(
                res + sum(c * sig[-1 - j] for j, c in enumerate(coefs))
            )
    elif stype & 0b100000:  # LPC
        order = (stype & 0x1F) + 1
        sig = [r.read_signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision code 15")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        qcoefs = [r.read_signed(precision) for _ in range(order)]
        resid = _read_residual(r, bs, order)
        for res in resid:
            pred = sum(
                qcoefs[j] * sig[-1 - j] for j in range(order)
            ) >> shift
            sig.append(res + pred)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype:#08b}")
    if len(sig) != bs:
        raise ValueError("FLAC subframe sample count mismatch")
    if wasted:
        sig = [s << wasted for s in sig]
    return sig


# Decompression-amplification bound (review r16): a crafted stream of
# large CONSTANT frames expands ~3000:1 (a 20-byte frame body declares
# 65,536 samples), so a ~300 KB untrusted crawl payload would
# accumulate billions of Python ints before the total/MD5 checks could
# fire — the same attack class as the MP4 stsz bomb. Legitimate long
# silence compresses at the same ratio, so this is a CAP, not a
# heuristic: callers decoding trusted full-length recordings can raise
# it. 1<<26 samples ≈ 64M ints — minutes of audio, far beyond any
# clip-feature use, and bounded memory on an executor.
MAX_DECODED_SAMPLES = 1 << 26


def decode_flac(data: bytes, max_samples: int = MAX_DECODED_SAMPLES) -> dict:
    """FLAC bytes → ``{format, sample_rate, channels, bits, n_frames,
    samples}`` with ``samples`` interleaved ints normalized to
    [-32768, 32767] (the decode_wav convention, so every downstream
    audio feature is container-agnostic). Frame CRC-8/CRC-16 and the
    STREAMINFO MD5 (when present) are verified — a corrupt or
    mis-decoded stream raises ``ValueError``, never returns wrong
    audio. Decoding more than ``max_samples`` per-channel samples
    raises (decompression-amplification bound; see
    :data:`MAX_DECODED_SAMPLES`)."""
    try:
        return _decode_flac(data, max_samples)
    except (IndexError, OverflowError) as e:
        raise ValueError(
            f"corrupt FLAC stream: {type(e).__name__}: {e}"
        ) from e


def _decode_flac(data: bytes, max_samples: int = MAX_DECODED_SAMPLES) -> dict:
    if len(data) < 42 or data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream (no fLaC magic)")
    pos = 4
    streaminfo = None
    last = False
    first = True
    while not last:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata header")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        ln = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if pos + 4 + ln > len(data):
            raise ValueError("truncated FLAC metadata block")
        if first and btype != 0:
            raise ValueError("first FLAC metadata block is not STREAMINFO")
        if btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        if btype == 0:
            body = data[pos + 4 : pos + 4 + ln]
            if ln != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {ln}")
            r = _BitReader(body)
            r.read(16)  # min block size
            r.read(16)  # max block size
            r.read(24)  # min frame size
            r.read(24)  # max frame size
            rate = r.read(20)
            channels = r.read(3) + 1
            bits = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            streaminfo = (rate, channels, bits, total, md5)
        first = False
        pos += 4 + ln
    if streaminfo is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    rate, channels, bits, total, md5 = streaminfo
    if bits not in _DEPTH_SHIFT:
        raise ValueError(f"unsupported FLAC bit depth {bits}")

    if total > max_samples:
        raise ValueError(
            f"FLAC declares {total} samples — beyond the decode cap "
            f"{max_samples} (raise max_samples for trusted full-length "
            "recordings)"
        )
    per_channel: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(data):
        if total and len(per_channel[0]) >= total:
            break
        if len(per_channel[0]) > max_samples:
            raise ValueError(
                f"FLAC stream expanded beyond the decode cap "
                f"{max_samples} samples (declared total "
                f"{total or 'unknown'}; decompression-bomb guard)"
            )
        pos = _decode_frame(data, pos, rate, channels, bits, per_channel)
    n_frames = len(per_channel[0])
    if total and n_frames != total:
        raise ValueError(
            f"FLAC stream ended with {n_frames} samples of {total}"
        )

    interleaved = [0] * (n_frames * channels)
    for c in range(channels):
        interleaved[c::channels] = per_channel[c]
    if md5 != b"\x00" * 16:
        width = bits // 8 if bits % 8 == 0 else None
        if width is not None:
            got = hashlib.md5(
                b"".join(
                    s.to_bytes(width, "little", signed=True)
                    for s in interleaved
                )
            ).digest()
            if got != md5:
                raise ValueError(
                    "FLAC MD5 mismatch: decoded audio does not match "
                    "STREAMINFO checksum"
                )
    shift = _DEPTH_SHIFT[bits]
    if shift > 0:
        samples = [s << shift for s in interleaved]
    elif shift < 0:
        samples = [s >> -shift for s in interleaved]
    else:
        samples = interleaved
    return {
        "format": "flac",
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "samples": samples,
    }


def _decode_frame(
    data: bytes,
    start: int,
    si_rate: int,
    si_channels: int,
    si_bits: int,
    per_channel: list[list[int]],
) -> int:
    r = _BitReader(data, start)
    if r.read(14) != 0b11111111111110:
        raise ValueError(f"lost FLAC frame sync at byte {start}")
    if r.read(1):
        raise ValueError("reserved bit set in FLAC frame header")
    r.read(1)  # blocking strategy (coded number disambiguates)
    bs_code = r.read(4)
    sr_code = r.read(4)
    assignment = r.read(4)
    ss_code = r.read(3)
    if r.read(1):
        raise ValueError("reserved bit set in FLAC frame header")
    _decode_coded_number(r)
    if bs_code == 0:
        raise ValueError("reserved FLAC block size code 0")
    elif bs_code == 1:
        bs = 192
    elif bs_code <= 5:
        bs = 576 << (bs_code - 2)
    elif bs_code == 6:
        bs = r.read(8) + 1
    elif bs_code == 7:
        bs = r.read(16) + 1
    else:
        bs = 256 << (bs_code - 8)
    if sr_code == 0:
        pass  # from STREAMINFO
    elif sr_code in _SR_TABLE:
        pass
    elif sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    else:
        raise ValueError("invalid FLAC sample rate code 15")
    header_end = r.pos
    if r.bit:
        raise ValueError("FLAC frame header not byte-aligned")
    stored_crc8 = r.read(8)
    if crc8(data[start:header_end]) != stored_crc8:
        raise ValueError("FLAC frame header CRC-8 mismatch")

    bps = _SS_CODE_TO_BITS.get(ss_code, si_bits) if ss_code else si_bits
    if ss_code == 3:
        raise ValueError("reserved FLAC sample size code 3")
    if assignment <= 7:
        n_ch = assignment + 1
        if n_ch != si_channels:
            raise ValueError(
                f"frame channel count {n_ch} != STREAMINFO {si_channels}"
            )
        decoded = [_read_subframe(r, bs, bps) for _ in range(n_ch)]
    elif assignment <= 10:
        if si_channels != 2:
            raise ValueError("stereo decorrelation in a non-stereo stream")
        extra0 = 1 if assignment == 9 else 0
        extra1 = 1 if assignment in (8, 10) else 0
        ch0 = _read_subframe(r, bs, bps + extra0)
        ch1 = _read_subframe(r, bs, bps + extra1)
        if assignment == 8:  # left/side
            left = ch0
            right = [ch0[i] - ch1[i] for i in range(bs)]
        elif assignment == 9:  # side/right
            right = ch1
            left = [ch1[i] + ch0[i] for i in range(bs)]
        else:  # mid/side
            left, right = [], []
            for i in range(bs):
                m = (ch0[i] << 1) | (ch1[i] & 1)
                left.append((m + ch1[i]) >> 1)
                right.append((m - ch1[i]) >> 1)
        decoded = [left, right]
    else:
        raise ValueError(f"reserved FLAC channel assignment {assignment}")
    r.align()
    body_end = r.pos
    if body_end + 2 > len(data):
        raise ValueError("FLAC frame truncated before CRC-16")
    stored_crc16 = int.from_bytes(data[body_end : body_end + 2], "big")
    if crc16(data[start:body_end]) != stored_crc16:
        raise ValueError("FLAC frame CRC-16 mismatch")
    for c, sig in enumerate(decoded):
        per_channel[c].extend(sig)
    return body_end + 2
