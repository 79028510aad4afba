"""Pure-Python FLAC decoder — the lossless audio codec speech corpora
actually ship (LibriSpeech, MLS, many Common Voice mirrors are FLAC).
Implements the full fixed-blocksize decode path of the public format
spec (RFC 9639 / the xiph.org FLAC format document): STREAMINFO
metadata walk, frame headers with the extended-UTF-8 frame number and
CRC-8 check, all four subframe types (CONSTANT, VERBATIM, FIXED
orders 0-4, LPC orders 1-32 with quantized coefficients and shift),
partitioned Rice residuals (both 4- and 5-bit parameter methods, the
escape-to-raw path), wasted bits, inter-channel decorrelation
(left/side, right/side, mid/side), and the frame CRC-16. Losslessness
makes validation exact: tests/test_multimodal.py round-trips every
subframe/stereo/rice variant through an in-test encoder —
decode(encode(x)) must equal x bit-for-bit.

Why here: the multimodal pipeline treats codecs as plug-in payload
decoders behind ``decode_audio``; FLAC closes the lossless-audio half
of the remaining codec surface (MP3/AAC-class LOSSY audio stays the
documented NotImplementedError plug-in point)."""

from __future__ import annotations


class Bits:
    """MSB-first bit reader."""

    __slots__ = ("d", "pos")

    def __init__(self, d: bytes):
        self.d = d
        self.pos = 0

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.d) * 8:
            raise ValueError("truncated FLAC stream")
        v = 0
        p = self.pos
        while p < end:
            v = (v << 1) | ((self.d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = end
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while True:
            if self.pos >= len(self.d) * 8:
                raise ValueError("truncated FLAC stream")
            b = (self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
            self.pos += 1
            if b:
                return n
            n += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_like(br: Bits) -> int:
    """FLAC's extended-UTF-8 coded frame/sample number."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("bad FLAC frame number coding")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC frame number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _rice_residual(br: Bits, n: int, pred_order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    esc = 0xF if method == 0 else 0x1F
    porder = br.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("bad FLAC rice partition order")
    out: list[int] = []
    for p in range(nparts):
        cnt = n // nparts - (pred_order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("bad FLAC partition sample count")
        param = br.read(pbits)
        if param == esc:
            raw = br.read(5)
            for _ in range(cnt):
                out.append(br.sread(raw) if raw else 0)
        else:
            for _ in range(cnt):
                q = br.unary()
                r = br.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))
    return out


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _subframe(br: Bits, n: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("bad FLAC subframe sync bit")
    sft = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if sft == 0:  # CONSTANT
        v = br.sread(eff)
        out = [v] * n
    elif sft == 1:  # VERBATIM
        out = [br.sread(eff) for _ in range(n)]
    elif 8 <= sft <= 12:  # FIXED order 0..4
        order = sft - 8
        out = [br.sread(eff) for _ in range(order)]
        res = _rice_residual(br, n, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + pred)
    elif sft >= 32:  # LPC order 1..32
        order = sft - 31
        out = [br.sread(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 0xF:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = br.sread(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.sread(prec) for _ in range(order)]
        res = _rice_residual(br, n, order)
        for r in res:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {sft}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes):
    """FLAC stream → float32 PCM in [-1, 1): shape (n,) mono, (n, ch)
    otherwise — the decode_audio contract. Malformed/truncated
    streams and CRC mismatches raise ValueError (the drop path)."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            if size < 34:
                raise ValueError("short FLAC STREAMINFO")
            br = Bits(body)
            br.read(16)  # min block
            br.read(16)  # max block
            br.read(24)
            br.read(24)
            sr = br.read(20)
            n_ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (sr, n_ch, bps, total)
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    sr0, n_ch0, bps0, total = info

    chans: list[list[int]] = [[] for _ in range(n_ch0)]
    got = 0
    br = Bits(payload[pos:])
    nbits = len(payload[pos:]) * 8
    while (total == 0 or got < total) and br.pos + 32 <= nbits:
        frame_start = br.pos >> 3
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _utf8_like(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code in _BLOCK_SIZES:
            n = _BLOCK_SIZES[bs_code]
        elif 8 <= bs_code <= 15:
            n = 256 << (bs_code - 8)
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        # bps code 0 defers to STREAMINFO; 3 is reserved; any other
        # code names a fixed depth that must agree with STREAMINFO
        # (this decoder trusts bps0 for every subframe, so a frame
        # declaring a different depth would silently misdecode).
        if bps_code == 3:
            raise ValueError("reserved FLAC bits-per-sample code")
        if bps_code != 0:
            declared = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[bps_code]
            if declared != bps0:
                raise ValueError(
                    "FLAC frame bits-per-sample %d != STREAMINFO %d"
                    % (declared, bps0)
                )
        if br.pos % 8 != 0:  # header fields must be byte-aligned here
            raise ValueError("FLAC frame header not byte-aligned")
        want8 = _crc8(br.d[frame_start : br.pos >> 3])
        if br.read(8) != want8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != n_ch0:
                raise ValueError("FLAC frame channel mismatch")
            subs = [_subframe(br, n, bps0) for _ in range(n_ch)]
        elif ch_code == 8:  # left/side
            left = _subframe(br, n, bps0)
            side = _subframe(br, n, bps0 + 1)
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side
            side = _subframe(br, n, bps0 + 1)
            right = _subframe(br, n, bps0)
            subs = [[r + s for r, s in zip(right, side)], right]
        elif ch_code == 10:  # mid/side
            mid = _subframe(br, n, bps0)
            side = _subframe(br, n, bps0 + 1)
            lefts, rights = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                lefts.append((m2 + s) >> 1)
                rights.append((m2 - s) >> 1)
            subs = [lefts, rights]
        else:
            raise ValueError("reserved FLAC channel assignment")
        br.align()
        want16 = _crc16(br.d[frame_start : br.pos >> 3])
        if br.read(16) != want16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        take = n if total == 0 else min(n, total - got)
        for c in range(n_ch0):
            chans[c].extend(subs[c][:take])
        got += take
    if total and got < total:
        raise ValueError("FLAC stream short of STREAMINFO total")
    x = np.array(chans, dtype=np.float64) / float(1 << (bps0 - 1))
    x = x.astype(np.float32)
    return x[0] if n_ch0 == 1 else x.T.copy()
