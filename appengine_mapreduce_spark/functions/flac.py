"""Dependency-free FLAC decode + fixture encode.

FLAC (the lossless audio codec, public format spec) is fully
ALGORITHMIC — Rice-coded residuals over fixed/LPC predictors with CRC
framing — so unlike the perceptual codecs (MP3/AAC, which need the ISO
filterbank/codebook tables) it can be implemented honestly from the
specification alone:

- STREAMINFO metadata block (sample rate / channels / bits / totals).
- Frame header: 14-bit sync, block-size and sample-rate codes, channel
  assignment (independent, left/side, right/side, mid/side), UTF-8-coded
  frame number, CRC-8 (poly 0x07).
- Subframes: CONSTANT, VERBATIM, FIXED predictors order 0-4 (the
  standard difference recurrences), and generic LPC (quantized
  coefficients + shift read from the stream).
- Residuals: partitioned Rice coding (4-bit and 5-bit parameter
  variants, escape partitions as raw n-bit values), zigzag folding.
- Frame footer CRC-16 (poly 0x8005) over the whole frame.

The fixture encoder emits CONSTANT / VERBATIM / FIXED subframes with
real Rice residuals (and can emit an LPC subframe with explicit
coefficients to exercise that decode path); decode(encode(x)) == x
exactly — losslessness IS the test.

Scope: 16-bit samples, fixed blocking. Decode rejects corrupted CRCs.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


class FlacFormatError(ValueError):
    pass


# --- CRCs (polynomials from the FLAC spec) -----------------------------------

def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


# --- bit I/O -----------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise FlacFormatError("bitstream truncated")
            out = (out << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.nbits:
            self.write(0, 1)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# --- fixed predictors (FLAC spec §fixed) -------------------------------------

def _fixed_predict(order: int, prev: list) -> int:
    if order == 0:
        return 0
    if order == 1:
        return prev[-1]
    if order == 2:
        return 2 * prev[-1] - prev[-2]
    if order == 3:
        return 3 * prev[-1] - 3 * prev[-2] + prev[-3]
    return 4 * prev[-1] - 6 * prev[-2] + 4 * prev[-3] - prev[-4]


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


# --- UTF-8-style coded numbers (frame header) --------------------------------

def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes((n,))
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(r: "_BitReader") -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise FlacFormatError("bad UTF-8 coded number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise FlacFormatError("bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# --- stream-level structures -------------------------------------------------

@dataclass(frozen=True)
class FlacStreamInfo:
    min_block_size: int
    max_block_size: int
    sample_rate: int
    n_channels: int
    bits_per_sample: int
    total_samples: int


_BLOCK_SIZE_CODES = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
                     4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
                     2048: 0b1011, 4096: 0b1100, 8192: 0b1101,
                     16384: 0b1110, 32768: 0b1111}

CH_INDEPENDENT = "independent"
CH_LEFT_SIDE = "left_side"
CH_RIGHT_SIDE = "right_side"
CH_MID_SIDE = "mid_side"


def parse_streaminfo(blob: bytes) -> FlacStreamInfo:
    """'fLaC' marker + first metadata block (must be STREAMINFO)."""
    if blob[:4] != b"fLaC":
        raise FlacFormatError("bad fLaC marker")
    if len(blob) < 4 + 4 + 34:
        raise FlacFormatError("truncated STREAMINFO")
    header = blob[4]
    if header & 0x7F != 0:
        raise FlacFormatError("first metadata block is not STREAMINFO")
    body = blob[8:42]
    min_bs, max_bs = struct.unpack(">HH", body[0:4])
    packed = int.from_bytes(body[10:18], "big")
    sample_rate = packed >> 44
    n_channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    return FlacStreamInfo(min_bs, max_bs, sample_rate, n_channels,
                          bits, total)


def _first_frame_offset(blob: bytes) -> int:
    pos = 4
    while True:
        if pos + 4 > len(blob):
            raise FlacFormatError("no audio frames")
        header = blob[pos]
        (size,) = struct.unpack(">I", b"\x00" + blob[pos + 1 : pos + 4])
        pos += 4 + size
        if header & 0x80:  # last-metadata-block flag
            return pos


# --- frame decode ------------------------------------------------------------

def _decode_residual(r: "_BitReader", block_size: int, order: int) -> list:
    method = r.read(2)
    if method > 1:
        raise FlacFormatError("reserved residual coding method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise FlacFormatError("partition order does not divide block size")
    out: list = []
    for p in range(n_parts):
        n = block_size // n_parts - (order if p == 0 else 0)
        if n < 0:
            raise FlacFormatError("predictor order exceeds first partition")
        param = r.read(param_bits)
        if param == escape:
            raw = r.read(5)
            out.extend(r.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out.append(_unzigzag(u))
    return out


def _decode_subframe(r: "_BitReader", block_size: int, bps: int) -> list:
    if r.read(1):
        raise FlacFormatError("subframe padding bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits flag
        wasted = 1 + r.read_unary()
        bps -= wasted
    if sf_type == 0:  # CONSTANT
        v = r.read_signed(bps)
        samples = [v] * block_size
    elif sf_type == 1:  # VERBATIM
        samples = [r.read_signed(bps) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        samples = [r.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        for e in resid:
            samples.append(_fixed_predict(order, samples) + e)
    elif sf_type >= 32:  # LPC, order 1-32
        order = sf_type - 31
        samples = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise FlacFormatError("invalid qlp precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacFormatError("negative qlp shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        for e in resid:
            pred = sum(c * s for c, s in zip(coefs, samples[-order:][::-1]))
            samples.append((pred >> shift) + e)
    else:
        raise FlacFormatError(f"reserved subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(blob: bytes) -> "tuple[FlacStreamInfo, list[list[int]]]":
    """Decode every frame; returns (streaminfo, channels) where channels
    is a list of per-channel sample lists. CRC-8 (header) and CRC-16
    (frame) are verified — corruption raises, it does not mis-decode."""
    info = parse_streaminfo(blob)
    pos = _first_frame_offset(blob)
    channels: list[list[int]] = [[] for _ in range(info.n_channels)]
    total = 0
    while pos + 2 <= len(blob) and total < info.total_samples:
        r = _BitReader(blob, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise FlacFormatError(f"lost frame sync at {pos}")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy (fixed)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _frame_no = _utf8_decode(r)
        if bs_code == 0:
            raise FlacFormatError("reserved block size code")
        if bs_code == 0b0110:
            block_size = r.read(8) + 1
        elif bs_code == 0b0111:
            block_size = r.read(16) + 1
        elif bs_code in (0b0001,):
            block_size = 192
        elif 0b0010 <= bs_code <= 0b0101:
            block_size = 576 << (bs_code - 2)
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise FlacFormatError("invalid sample rate code")
        if ss_code == 0b100:
            bps = 16
        elif ss_code == 0b000:
            bps = info.bits_per_sample
        else:
            raise FlacFormatError(f"sample size code {ss_code} unsupported")
        header_len = r.byte - pos + (1 if r.bit else 0)
        r.align()
        stored_crc8 = r.read(8)
        if crc8(blob[pos : pos + header_len]) != stored_crc8:
            raise FlacFormatError("frame header CRC-8 mismatch")

        if ch_code <= 0b0111:
            n_ch = ch_code + 1
            assignment = CH_INDEPENDENT
        elif ch_code == 0b1000:
            n_ch, assignment = 2, CH_LEFT_SIDE
        elif ch_code == 0b1001:
            n_ch, assignment = 2, CH_RIGHT_SIDE
        elif ch_code == 0b1010:
            n_ch, assignment = 2, CH_MID_SIDE
        else:
            raise FlacFormatError("reserved channel assignment")
        if n_ch != info.n_channels:
            raise FlacFormatError("frame/streaminfo channel mismatch")

        subframes = []
        for ch in range(n_ch):
            ch_bps = bps
            # the SIDE channel carries one extra bit (spec)
            if (assignment == CH_LEFT_SIDE and ch == 1) or \
               (assignment == CH_RIGHT_SIDE and ch == 0) or \
               (assignment == CH_MID_SIDE and ch == 1):
                ch_bps += 1
            subframes.append(_decode_subframe(r, block_size, ch_bps))
        r.align()
        frame_len = r.byte - pos
        stored_crc16 = r.read(16)
        if crc16(blob[pos : pos + frame_len]) != stored_crc16:
            raise FlacFormatError("frame CRC-16 mismatch")
        pos = r.byte

        if assignment == CH_INDEPENDENT:
            decoded = subframes
        elif assignment == CH_LEFT_SIDE:
            left, side = subframes
            decoded = [left, [l - s for l, s in zip(left, side)]]
        elif assignment == CH_RIGHT_SIDE:
            side, right = subframes
            decoded = [[rr + s for rr, s in zip(right, side)], right]
        else:  # mid/side
            mid, side = subframes
            left = []
            right = []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            decoded = [left, right]
        for ch in range(n_ch):
            channels[ch].extend(decoded[ch])
        total += block_size
    if total < info.total_samples:
        raise FlacFormatError("stream ends before total_samples")
    return info, [c[: info.total_samples] for c in channels]


# --- fixture encoder ---------------------------------------------------------

def _best_rice_param(resid: list) -> int:
    if not resid:
        return 0
    total = sum(_zigzag(e) for e in resid)
    mean = total / len(resid)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def _encode_residual(w: "_BitWriter", resid: list) -> None:
    w.write(0, 2)       # rice, 4-bit params
    w.write(0, 4)       # partition order 0
    param = _best_rice_param(resid)
    w.write(param, 4)
    for e in resid:
        u = _zigzag(e)
        w.write_unary(u >> param)
        w.write(u & ((1 << param) - 1), param)


def _encode_subframe(
    w: "_BitWriter", samples: list, bps: int,
    subframe_type: str, lpc: "tuple[list[int], int] | None" = None,
) -> None:
    w.write(0, 1)  # padding
    if subframe_type == "constant":
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(samples[0], bps)
        return
    if subframe_type == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write_signed(s, bps)
        return
    if subframe_type == "lpc":
        assert lpc is not None
        coefs, shift = lpc
        order = len(coefs)
        w.write(31 + order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write_signed(s, bps)
        precision = 15
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, precision)
        resid = []
        for i in range(order, len(samples)):
            pred = sum(c * s for c, s in
                       zip(coefs, samples[i - order : i][::-1]))
            resid.append(samples[i] - (pred >> shift))
        _encode_residual(w, resid)
        return
    # fixed predictor: pick the order 0-4 minimizing |residual|
    best = None
    for order in range(5):
        if order > len(samples):
            break
        resid = []
        ok = True
        for i in range(order, len(samples)):
            pred = _fixed_predict(order, samples[max(0, i - 4) : i])
            e = samples[i] - pred
            if abs(e) > (1 << 30):
                ok = False
                break
            resid.append(e)
        if not ok:
            continue
        cost = sum(_zigzag(e).bit_length() for e in resid)
        if best is None or cost < best[2]:
            best = (order, resid, cost)
    assert best is not None
    order, resid, _ = best
    w.write(8 + order, 6)
    w.write(0, 1)
    for s in samples[:order]:
        w.write_signed(s, bps)
    _encode_residual(w, resid)


def encode_flac(
    channels: "list[list[int]]",
    sample_rate: int = 16000,
    block_size: int = 4096,
    subframe_type: str = "fixed",
    stereo_mode: str = CH_INDEPENDENT,
    lpc: "tuple[list[int], int] | None" = None,
) -> bytes:
    """Fixture encoder: real FLAC stream (16-bit) from per-channel
    sample lists. ``subframe_type``: 'fixed' (order auto-picked),
    'constant' (requires constant input), 'verbatim', or 'lpc' (with
    explicit (coefficients, shift) to exercise the generic-LPC decode).
    ``stereo_mode`` picks the channel decorrelation for 2-channel input."""
    n_ch = len(channels)
    total = len(channels[0])
    if any(len(c) != total for c in channels):
        raise FlacFormatError("channel length mismatch")
    if stereo_mode != CH_INDEPENDENT and n_ch != 2:
        raise FlacFormatError("stereo mode needs 2 channels")

    out = bytearray(b"fLaC")
    packed = (sample_rate << 44) | ((n_ch - 1) << 41) | (15 << 36) | total
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00" * 6
        + packed.to_bytes(8, "big")
        + b"\x00" * 16
    )
    out += bytes((0x80,)) + len(streaminfo).to_bytes(3, "big") + streaminfo

    frame_no = 0
    for off in range(0, total, block_size):
        bs = min(block_size, total - off)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        bs_code = _BLOCK_SIZE_CODES.get(bs)
        explicit16 = bs_code is None
        w.write(0b0111 if explicit16 else bs_code, 4)
        w.write(0, 4)  # sample rate: from STREAMINFO
        if stereo_mode == CH_INDEPENDENT:
            w.write(n_ch - 1, 4)
        elif stereo_mode == CH_LEFT_SIDE:
            w.write(0b1000, 4)
        elif stereo_mode == CH_RIGHT_SIDE:
            w.write(0b1001, 4)
        else:
            w.write(0b1010, 4)
        w.write(0b100, 3)  # 16-bit
        w.write(0, 1)
        for b in _utf8_encode(frame_no):
            w.write(b, 8)
        if explicit16:
            w.write(bs - 1, 16)
        header = w
        header.align()
        hdr_bytes = header.bytes()
        w2 = _BitWriter()
        for b in hdr_bytes:
            w2.write(b, 8)
        w2.write(crc8(hdr_bytes), 8)

        blocks = [c[off : off + bs] for c in channels]
        if stereo_mode == CH_LEFT_SIDE:
            subs = [(blocks[0], 16),
                    ([l - r for l, r in zip(*blocks)], 17)]
        elif stereo_mode == CH_RIGHT_SIDE:
            subs = [([l - r for l, r in zip(*blocks)], 17),
                    (blocks[1], 16)]
        elif stereo_mode == CH_MID_SIDE:
            subs = [([(l + r) >> 1 for l, r in zip(*blocks)], 16),
                    ([l - r for l, r in zip(*blocks)], 17)]
        else:
            subs = [(b, 16) for b in blocks]
        for samples, bps in subs:
            _encode_subframe(w2, samples, bps, subframe_type, lpc)
        w2.align()
        frame = w2.bytes()
        w3 = _BitWriter()
        for b in frame:
            w3.write(b, 8)
        w3.write(crc16(frame), 16)
        out += w3.bytes()
        frame_no += 1
    return bytes(out)
