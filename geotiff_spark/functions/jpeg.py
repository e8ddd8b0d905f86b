"""Pure-numpy baseline JPEG codec (no Pillow/libjpeg).

Decoder: baseline sequential DCT (SOF0) — marker parse, arbitrary DQT/
DHT tables read from the stream, interleaved MCU entropy decode with DC
prediction and 0xFF00 byte unstuffing, dequantize → dezigzag → 8x8
IDCT (exact float DCT-III matrix), chroma upsampling for any (h, v)
sampling factors, JFIF YCbCr→RGB. Grayscale, 4:4:4 and 4:2:0 covered by
tests; progressive (SOF2), arithmetic coding and restart intervals are
rejected explicitly.

Encoder: the inverse pipeline for corpus generation and roundtrips —
level shift → DCT → quantize (deterministic quality-scaled tables,
written to DQT) → zigzag → Huffman. Tables are CUSTOM canonical codes
(flat 4-bit DC / 9-10-bit AC) rather than the Annex K defaults: JPEG
permits any DHT, the decoder reads whatever the stream declares (so it
also decodes foreign baseline files), and flat codes keep the encoder
honest without hardcoding 162-entry default tables.

The entropy layer (Huffman + DC prediction + stuffing) is LOSSLESS at
the coefficient level; pixel roundtrips are bounded by quantization
error only — at quality 100 the tables are all ones and the residual
is the <=0.5-per-coefficient rounding noise, i.e. +-1 pixel LSB
(tests/test_jpeg.py pins the bounds).

Format reference: ITU-T T.81 baseline process (public spec); no code
consulted.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)


class JpegError(ValueError):
    pass


def _dct_mat() -> np.ndarray:
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c * np.sqrt(2.0 / 8.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m  # (8, 8): X = M @ x @ M.T (DCT-II), x = M.T @ X @ M


_M = _dct_mat()


def _quant_table(quality: int, chroma: bool) -> np.ndarray:
    """Deterministic quality-scaled tables (natural order): base grows
    with zigzag frequency index; chroma coarser. quality 1..100."""
    idx = np.empty(64, dtype=np.float64)
    idx[ZIGZAG] = np.arange(64)
    base = 4.0 + idx * (1.0 if not chroma else 1.5)
    scale = (5000.0 / quality if quality < 50 else 200.0 - 2 * quality) / 100.0
    q = np.clip(np.round(base * scale), 1, 255)
    return q.reshape(8, 8)


# ---- canonical Huffman helpers ----------------------------------------------

def _flat_tables(n_symbols: int, width: int):
    """counts[1..16] + symbol list for a flat canonical code: n-1 codes
    at `width` bits, the last symbol one bit longer (keeps the all-ones
    code incomplete, as T.81 requires)."""
    counts = [0] * 17
    if n_symbols == 1:
        counts[1] = 1
        return counts, list(range(1))
    counts[width] = n_symbols - 1
    counts[width + 1] = 1
    return counts, list(range(n_symbols))


def _canonical_codes(counts, symbols):
    """(code, length) per symbol from DHT-style counts + symbol list."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JpegError("entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise JpegError("marker inside entropy data")
                self.pos += 1  # skip stuffed 0x00
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_symbol(r: _Reader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size class, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = int(a).bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


# ---- encoder ----------------------------------------------------------------

def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """(h, w) or (h, w, 1) grayscale, (h, w, 3) RGB → baseline JPEG.
    subsampling: '444' or '420' (color only)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if arr.dtype != np.uint8 or nc not in (1, 3):
        raise JpegError("encoder needs uint8 gray or RGB")
    gray = nc == 1
    if gray:
        planes = [arr[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        if subsampling == "420":
            cb = _box2(cb)
            cr = _box2(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise JpegError(f"unsupported subsampling {subsampling}")
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qts = [_quant_table(quality, False), _quant_table(quality, True)]
    comp_q = [0] if gray else [0, 1, 1]

    # pad planes to whole MCUs (edge replication) and block-split
    blocks = []
    for ci, p in enumerate(planes):
        sh, sv = samp[ci]
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        b = pad.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ij,abjk,lk->abil", _M, b, _M)
        q = np.round(coef / qts[comp_q[ci]]).astype(np.int64)
        blocks.append(q)

    dc_counts, dc_syms = _flat_tables(12, 4)
    ac_counts, ac_syms = _flat_tables(256, 9)
    dc_code = _canonical_codes(dc_counts, dc_syms)
    ac_code = _canonical_codes(ac_counts, ac_syms)

    wtr = _Writer()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(planes)):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = blocks[ci][my * sv + by, mx * sh + bx]
                        zz = blk.reshape(-1)[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t, bitsv = _magnitude(diff)
                        c, ln = dc_code[t]
                        wtr.put(c, ln)
                        if t:
                            wtr.put(bitsv, t)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = ac_code[0xF0]
                                wtr.put(c, ln)
                                run -= 16
                            t, bitsv = _magnitude(v)
                            c, ln = ac_code[(run << 4) | t]
                            wtr.put(c, ln)
                            wtr.put(bitsv, t)
                            run = 0
                        if run:
                            c, ln = ac_code[0x00]  # EOB
                            wtr.put(c, ln)
    wtr.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    for ti, qt in enumerate(qts[: 1 if gray else 2]):
        zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([ti]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], comp_q[ci]])
    out += seg(0xC0, sof)
    for cls, tid, (counts, syms) in (
        (0, 0, (dc_counts, dc_syms)), (1, 0, (ac_counts, ac_syms)),
    ):
        out += seg(
            0xC4,
            bytes([(cls << 4) | tid]) + bytes(counts[1:17]) + bytes(syms),
        )
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _box2(p: np.ndarray) -> np.ndarray:
    """2x2 box-filter downsample with edge replication to even dims."""
    h, w = p.shape
    q = np.pad(p, ((0, h & 1), (0, w & 1)), mode="edge")
    return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) / 4.0


# ---- decoder ----------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 1) gray or (h, w, 3) RGB uint8."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, struct.error) as exc:
        raise JpegError(f"truncated or corrupt stream: {exc}") from exc


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    scan = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        # ITU-T T.81 B.1.1.2: any number of 0xFF fill bytes may precede
        # a marker id (ADVICE r04)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # stand-alone markers (TEM, RSTn, SOI) carry no length field
            pos += 2
            continue
        if pos + 4 > len(data):
            raise JpegError(f"truncated marker segment at {pos}")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4: pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, off + 1).astype(np.float64)
                nat = np.empty(64)
                nat[ZIGZAG] = zz
                qts[tq] = nat.reshape(8, 8)
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                counts = [0] + list(body[off + 1: off + 17])
                n = sum(counts)
                syms = list(body[off + 17: off + 17 + n])
                codes = _canonical_codes(counts, syms)
                huff[(cls, tid)] = {
                    (c, ln): s for s, (c, ln) in codes.items()
                }
                off += 17 + n
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise JpegError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, sf, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"non-baseline frame marker 0xFF{marker:02X} unsupported"
            )
        elif marker == 0xDD:
            raise JpegError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0xF})
            break  # entropy data follows at `pos`
    if frame is None or scan is None:
        raise JpegError("missing SOF0/SOS")

    # entropy segment runs until the EOI marker (stuffed FF00 excluded)
    end = pos
    while end + 1 < len(data):
        if data[end] == 0xFF and data[end + 1] not in (0x00,):
            break
        end += 1
    r = _Reader(data[pos:end])

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {s["id"]: s for s in scan}
    coefs = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.float64)
        for c in comps
    ]
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                st = by_id[c["id"]]
                dct = huff[(0, st["dc"])]
                act = huff[(1, st["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = _decode_symbol(r, dct)
                        diff = _extend(r.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, act)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise JpegError("AC run past block end")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        blk = np.empty(64)
                        blk[ZIGZAG] = zz
                        coefs[ci][my * c["v"] + by, mx * c["h"] + bx] = (
                            blk.reshape(8, 8)
                        )

    planes = []
    for ci, c in enumerate(comps):
        qt = qts[c["tq"]]
        deq = coefs[ci] * qt
        px = np.einsum("ji,abjk,kl->abil", _M, deq, _M) + 128.0
        nb_y, nb_x = deq.shape[:2]
        plane = px.transpose(0, 2, 1, 3).reshape(nb_y * 8, nb_x * 8)
        # component's true size, then upsample to full image res
        ch = -(-h * c["v"] // vmax)
        cw = -(-w * c["h"] // hmax)
        plane = plane[:ch, :cw]
        if c["v"] != vmax or c["h"] != hmax:
            plane = plane.repeat(vmax // c["v"], 0).repeat(hmax // c["h"], 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
