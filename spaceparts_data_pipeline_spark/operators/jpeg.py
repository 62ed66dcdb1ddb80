"""Codec-free baseline JPEG decoder (ITU-T T.81 / ISO 10918-1,
baseline sequential DCT, 8-bit) — pure stdlib byte walking + numpy
math, no external codec, mirroring the PNG story in
``operators.multimodal``: the reference pipeline treats image payloads
as opaque binary columns (SURVEY.md multimodal extension); this makes
the dominant compressed interchange format decode for real inside the
honest ``real_decode`` boundary.

Supported subset (the overwhelming majority of real-world JPEGs):
baseline sequential DCT (SOF0) and extended sequential (SOF1), 8-bit
precision, grayscale or YCbCr (1 or 3 components), any sampling
factors (4:4:4 / 4:2:2 / 4:2:0 / ...), restart intervals. Returns an
(h, w, 3) uint8 RGB array. Progressive (SOF2), arithmetic coding,
hierarchical, and 12-bit variants raise NotImplementedError — they
need a real codec library (or the injected-decoder seam). Corrupt /
truncated / non-JPEG payloads return None (same policy as
``decode_png``: a bad file must not poison a 100 TB batch).

Performance note: huffman entropy decode is an inherently serial
bitstream walk, done here in Python — fine for the thumbnail/metadata
scale this engine handles in-cluster (and it runs inside Arrow-batched
``mapInPandas``, so it parallelizes per-core across assets); bulk
image decode belongs behind a native codec injected at the
``real_decode`` seam. The block math (dequant, IDCT, upsample, color
convert) is fully vectorized numpy.
"""

from __future__ import annotations

import struct

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_SOF_UNSUPPORTED = {
    0xC2: "progressive DCT", 0xC3: "lossless sequential",
    0xC5: "differential sequential", 0xC6: "differential progressive",
    0xC7: "differential lossless", 0xC9: "arithmetic sequential",
    0xCA: "arithmetic progressive", 0xCB: "arithmetic lossless",
    0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


def _idct_matrix():
    import numpy as np

    # orthonormal 8-point DCT-II basis: A[x, u] = 0.5 C(u) cos((2x+1)uπ/16)
    x = np.arange(8).reshape(8, 1)
    u = np.arange(8).reshape(1, 8)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[:, 0] *= 1 / np.sqrt(2)
    return a


class _HuffTable:
    """Canonical JPEG huffman table prepared for fast-ish decoding:
    per code length, the (first code value, first symbol index) pair —
    the standard T.81 DECODE procedure."""

    __slots__ = ("mincode", "maxcode", "valptr", "symbols")

    def __init__(self, counts, symbols):
        self.symbols = symbols
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if counts[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops (raises EOFError) at any real marker."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        b = d[self.pos] if self.pos < len(d) else None
        if b is None:
            raise EOFError
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2          # stuffed 0xFF data byte
            else:
                raise EOFError         # real marker: entropy data ends
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, tbl: _HuffTable) -> int:
        code = self.bits(1)
        for ln in range(1, 17):
            if tbl.maxcode[ln] >= code >= tbl.mincode[ln]:
                return tbl.symbols[tbl.valptr[ln] + code - tbl.mincode[ln]]
            code = (code << 1) | self.bits(1)
        raise ValueError("invalid huffman code")

    def align_to_marker(self):
        """Byte-align and step past an RSTn marker (restart interval)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise EOFError


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a `size`-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes):
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB numpy array.
    See the module docstring for the supported subset; returns None for
    non-JPEG/corrupt payloads, raises NotImplementedError for valid
    JPEGs outside the subset."""
    import numpy as np

    if payload is None or len(payload) < 4:
        return None
    payload = bytes(payload)
    if payload[:2] != b"\xff\xd8":
        return None

    qtables: dict[int, object] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None          # (h, w, comps) where comps = [(cid, hf, vf, tq)]
    restart_interval = 0
    pos = 2
    n = len(payload)
    try:
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            # T.81 B.1.1.2: any number of 0xFF fill bytes may pad
            # before the marker code — skip them all
            while pos + 4 <= n and payload[pos + 1] == 0xFF:
                pos += 1
            if pos + 4 > n:
                return None
            marker = payload[pos + 1]
            if marker == 0xD9:                      # EOI before SOS
                return None
            seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
            seg = payload[pos + 4:pos + 2 + seg_len]
            if len(seg) != seg_len - 2:
                return None                         # truncated segment
            body_start = pos + 2 + seg_len
            if marker == 0xDB:                      # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0xF
                    i += 1
                    if pq == 0:
                        vals = list(seg[i:i + 64]); i += 64
                    else:
                        vals = list(struct.unpack(f">{64}H", seg[i:i + 128])); i += 128
                    if len(vals) < 64:
                        return None
                    q = np.zeros(64, dtype=np.float64)
                    q[_ZIGZAG] = vals
                    qtables[tq] = q.reshape(8, 8)
            elif marker == 0xC4:                    # DHT
                i = 0
                while i + 17 <= len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0xF
                    counts = list(seg[i + 1:i + 17])
                    total = sum(counts)
                    symbols = list(seg[i + 17:i + 17 + total])
                    if len(symbols) < total:
                        return None
                    (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(counts, symbols)
                    i += 17 + total
            elif marker in (0xC0, 0xC1):            # SOF0/SOF1
                precision = seg[0]
                if precision != 8:
                    raise NotImplementedError(f"JPEG {precision}-bit precision")
                h, w = struct.unpack(">HH", seg[1:5])
                nc = seg[5]
                if nc not in (1, 3):
                    raise NotImplementedError(f"JPEG with {nc} components (CMYK?)")
                comps = []
                for c in range(nc):
                    cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 0xF, tq))
                frame = (h, w, comps)
            elif marker in _SOF_UNSUPPORTED:
                raise NotImplementedError(f"JPEG {_SOF_UNSUPPORTED[marker]}")
            elif marker == 0xDD:                    # DRI
                restart_interval = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:                    # SOS
                if frame is None:
                    return None
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c:3 + 2 * c]
                    scan.append((cs, tt >> 4, tt & 0xF))
                return _decode_scan(payload, body_start, frame, scan, qtables,
                                    huff_dc, huff_ac, restart_interval)
            pos = body_start
        return None                                 # no SOS reached
    except NotImplementedError:
        raise
    except (IndexError, struct.error, ValueError, EOFError):
        return None


def _decode_scan(payload, pos, frame, scan, qtables, huff_dc, huff_ac,
                 restart_interval):
    import numpy as np

    h, w, comps = frame
    if h == 0 or w == 0:
        return None
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — one
        # 8x8 block per MCU over ceil(w/8) x ceil(h/8) blocks, the
        # SOF's declared sampling factors ignored. Normalizing to 1x1
        # makes the interleaved loop below compute exactly that.
        cid, _hf, _vf, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    if hmax < 1 or max(c[2] for c in comps) < 1:
        return None                 # zero sampling factor: corrupt header
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = []                      # per scan comp: (comp, dc_tbl, ac_tbl)
    for cs, td, ta in scan:
        if cs not in by_id or td not in huff_dc or ta not in huff_ac:
            return None
        order.append((by_id[cs], huff_dc[td], huff_ac[ta]))
    if len(order) != len(comps):
        # a VALID (rare) layout outside the subset, not corruption:
        # some encoders write one scan per component
        raise NotImplementedError("JPEG non-interleaved scans")
    for c in comps:
        if c[1] < 1 or c[2] < 1 or hmax % c[1] or vmax % c[2]:
            raise NotImplementedError(
                f"JPEG sampling factors {c[1]}x{c[2]} vs max {hmax}x{vmax}")
    for c in comps:
        if c[3] not in qtables:
            return None

    # coefficient planes per component, in 8x8 block units
    coeffs = {c[0]: np.zeros((mcuy * c[2], mcux * c[1], 8, 8), dtype=np.float64)
              for c in comps}
    rdr = _BitReader(payload, pos)
    pred = {c[0]: 0 for c in comps}
    blk = np.zeros(64, dtype=np.float64)
    mcu_index = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    rdr.align_to_marker()
                    for k in pred:
                        pred[k] = 0
                for comp, tdc, tac in order:
                    cid, hf, vf, tq = comp
                    for v in range(vf):
                        for hh in range(hf):
                            blk[:] = 0.0
                            s = rdr.huff(tdc)
                            diff = _extend(rdr.bits(s), s) if s else 0
                            pred[cid] += diff
                            blk[0] = pred[cid]
                            k = 1
                            while k < 64:
                                rs = rdr.huff(tac)
                                r, sz = rs >> 4, rs & 0xF
                                if sz == 0:
                                    if r == 15:
                                        k += 16        # ZRL
                                        continue
                                    break              # EOB
                                k += r
                                if k > 63:
                                    return None
                                blk[_ZIGZAG[k]] = _extend(rdr.bits(sz), sz)
                                k += 1
                            coeffs[cid][my * vf + v, mx * hf + hh] = blk.reshape(8, 8)
                mcu_index += 1
    except (EOFError, ValueError, IndexError):
        return None

    # dequant + IDCT, all blocks of a component at once
    A = _idct_matrix()
    planes = {}
    for cid, hf, vf, tq in comps:
        c = coeffs[cid] * qtables[tq]                      # (by, bx, 8, 8)
        # separable IDCT over every block at once: f = A F Aᵀ with the
        # orthonormal DCT-II basis (einsum indexes: block-row i,
        # block-col j, frequency (u, v) → spatial (x, y))
        spatial = np.einsum("xu,ijuv,yv->ijxy", A, c, A) + 128.0
        by, bx = c.shape[:2]
        img = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        planes[cid] = img
    # upsample each plane to full MCU-grid resolution, then crop
    full_h, full_w = mcuy * 8 * vmax, mcux * 8 * hmax
    out_planes = []
    for cid, hf, vf, tq in comps:
        img = planes[cid]
        ry, rx = vmax // vf, hmax // hf
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        out_planes.append(img[:full_h, :full_w][:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
