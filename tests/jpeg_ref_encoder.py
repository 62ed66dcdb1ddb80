"""Minimal INDEPENDENT baseline-JPEG encoder for testing
``operators.jpeg.decode_jpeg`` — standard ITU-T T.81 Annex K huffman
tables and example quantization tables, forward DCT via the same
orthonormal-basis math any textbook gives (implemented separately from
the decoder's inverse), 4:4:4 or 4:2:0 sampling, optional restart
intervals. Encoding is lossy, so tests assert bounded per-pixel error
(or exact recovery for DC-only images), not byte equality.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 example quantization tables (zigzag order applied at write)
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.float64)

# Annex K.3 typical huffman tables: (counts[16], symbols)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _codes(counts, symbols):
    """Canonical huffman code assignment (T.81 Annex C): symbol -> (code, length)."""
    out = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_basis():
    x = np.arange(8).reshape(8, 1)
    u = np.arange(8).reshape(1, 8)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[:, 0] *= 1 / np.sqrt(2)
    return a


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)          # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def pad(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)    # pad with 1s per spec


def _magnitude(v):
    """(size, code) pair for a signed coefficient value."""
    if v == 0:
        return 0, 0
    a, size = abs(v), 0
    while a:
        a >>= 1
        size += 1
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _encode_blocks(writer, blocks, pred, dc_codes, ac_codes):
    """blocks: iterable of zigzag-ordered int coefficient arrays."""
    for zz in blocks:
        diff = int(zz[0]) - pred[0]
        pred[0] = int(zz[0])
        size, code = _magnitude(diff)
        c, ln = dc_codes[size]
        writer.write(c, ln)
        if size:
            writer.write(code, size)
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        run = 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                writer.write(c, ln)
                run -= 16
            size, code = _magnitude(v)
            c, ln = ac_codes[(run << 4) | size]
            writer.write(c, ln)
            writer.write(code, size)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]            # EOB
            writer.write(c, ln)


def _component_blocks(plane, q, scale=1.0):
    """Pad plane to 8-multiples (edge replicate), forward-DCT + quantize
    every 8x8 block, return (blocks_y, blocks_x, zigzag int array)."""
    A = _dct_basis()
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:, w:] = padded[:, w - 1:w]
    padded -= 128.0
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    # forward DCT: F = Aᵀ f A
    F = np.einsum("ux,ijxy,yv->ijuv", A.T, blocks, A)
    qd = np.round(F / (q * scale)).astype(np.int64)
    flat = qd.reshape(by, bx, 64)
    return by, bx, np.take(flat, ZIGZAG, axis=2)


def encode_jpeg(img: np.ndarray, subsampling: str = "444",
                restart_interval: int = 0, quality_scale: float = 1.0) -> bytes:
    """Encode (h, w, 3) RGB uint8 (or (h, w) grayscale) to baseline JPEG."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    # DQT (table 0 luma; table 1 chroma for color)
    def dqt(tq, table):
        zz = np.maximum(1, np.round(table * quality_scale)).astype(int).reshape(64)
        return bytes([tq]) + bytes(int(zz[z]) for z in ZIGZAG)

    seg(0xDB, dqt(0, QUANT_LUMA))
    if not gray:
        seg(0xDB, dqt(1, QUANT_CHROMA))
    # SOF0
    if gray:
        comps = bytes([1, 0x11, 0])
        ncomp = 1
    else:
        sub = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[subsampling]
        comps = bytes([1, (sub[0] << 4) | sub[1], 0,
                       2, 0x11, 1,
                       3, 0x11, 1])
        ncomp = 3
    seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp]) + comps)
    # DHT
    def dht(tc, th, spec):
        counts, symbols = spec
        return bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)

    seg(0xC4, dht(0, 0, DC_LUMA))
    seg(0xC4, dht(1, 0, AC_LUMA))
    if not gray:
        seg(0xC4, dht(0, 1, DC_CHROMA))
        seg(0xC4, dht(1, 1, AC_CHROMA))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    # SOS
    if gray:
        seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_l = _codes(*DC_LUMA)
    ac_l = _codes(*AC_LUMA)
    dc_c = _codes(*DC_CHROMA)
    ac_c = _codes(*AC_CHROMA)
    writer = _BitWriter()

    ql = np.maximum(1, np.round(QUANT_LUMA * quality_scale))
    qc = np.maximum(1, np.round(QUANT_CHROMA * quality_scale))
    if gray:
        by, bx, zz = _component_blocks(img.astype(np.float64), ql)
        pred = [0]
        blocks = (zz[y, x] for y in range(by) for x in range(bx))
        if restart_interval:
            _encode_interleaved_restarts(
                writer, [((1, 1), zz, pred, dc_l, ac_l)], by, bx, 1, 1,
                restart_interval)
        else:
            _encode_blocks(writer, blocks, pred, dc_l, ac_l)
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        hf, vf = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[subsampling]
        if hf > 1 or vf > 1:
            # pad to sampling multiple then box-average
            ph, pw = -(-h // vf) * vf, -(-w // hf) * hf
            def pad(p):
                q = np.empty((ph, pw))
                q[:h, :w] = p
                q[h:, :w] = p[-1:, :]
                q[:, w:] = q[:, w - 1:w]
                return q
            cb = pad(cb).reshape(ph // vf, vf, pw // hf, hf).mean(axis=(1, 3))
            cr = pad(cr).reshape(ph // vf, vf, pw // hf, hf).mean(axis=(1, 3))
        by_y, bx_y, zz_y = _component_blocks(y, ql)
        by_c, bx_c, zz_cb = _component_blocks(cb, qc)
        _, _, zz_cr = _component_blocks(cr, qc)
        mcux, mcuy = -(-w // (8 * hf)), -(-h // (8 * vf))
        # luma block grid must cover mcu grid
        def grow(zz, by, bx, need_y, need_x):
            if by >= need_y and bx >= need_x:
                return zz
            g = np.zeros((need_y, need_x, 64), dtype=zz.dtype)
            g[:by, :bx] = zz
            if need_y > by:
                g[by:, :bx] = zz[-1:, :]
            if need_x > bx:
                g[:, bx:] = g[:, bx - 1:bx]
            return g
        zz_y = grow(zz_y, by_y, bx_y, mcuy * vf, mcux * hf)
        zz_cb = grow(zz_cb, by_c, bx_c, mcuy, mcux)
        zz_cr = grow(zz_cr, by_c, bx_c, mcuy, mcux)
        pred_y, pred_cb, pred_cr = [0], [0], [0]
        mcu_index = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    writer.pad()
                    rst = 0xD0 + ((mcu_index // restart_interval - 1) % 8)
                    writer.out.extend(bytes([0xFF, rst]))
                    pred_y[0] = pred_cb[0] = pred_cr[0] = 0
                for v in range(vf):
                    for hh in range(hf):
                        _encode_blocks(writer, [zz_y[my * vf + v, mx * hf + hh]],
                                       pred_y, dc_l, ac_l)
                _encode_blocks(writer, [zz_cb[my, mx]], pred_cb, dc_c, ac_c)
                _encode_blocks(writer, [zz_cr[my, mx]], pred_cr, dc_c, ac_c)
                mcu_index += 1
    writer.pad()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _encode_interleaved_restarts(writer, comps, by, bx, vf, hf, restart_interval):
    """Grayscale-with-restarts path: one block per MCU."""
    mcu_index = 0
    (_, zz, pred, dc, ac), = comps
    for y in range(by):
        for x in range(bx):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.pad()
                rst = 0xD0 + ((mcu_index // restart_interval - 1) % 8)
                writer.out.extend(bytes([0xFF, rst]))
                pred[0] = 0
            _encode_blocks(writer, [zz[y, x]], pred, dc, ac)
            mcu_index += 1
