"""Pure-numpy JPEG codec (no Pillow/libjpeg): baseline AND progressive.

Decoder: sequential DCT (SOF0) and progressive DCT (SOF2) — marker
parse, arbitrary DQT/DHT tables (redefinable between scans), 0xFF00
byte unstuffing, and per scan shape: interleaved MCU entropy decode
with DC prediction (baseline / progressive DC first), DC successive-
approximation refinement bits, non-interleaved AC spectral-selection
bands with EOBn band-skip runs (T.81 G.1.2.2), and AC refinement with
correction bits and ZRL-in-refinement (G.1.2.3); then dequantize →
dezigzag → 8x8 IDCT (exact float DCT-III matrix), chroma upsampling
for any (h, v) sampling factors, JFIF YCbCr→RGB. Grayscale, 4:4:4 and
4:2:0 covered by tests; arithmetic coding, restart intervals,
hierarchical and lossless frames are rejected explicitly.

Encoders: the inverse pipelines for corpus generation and roundtrips —
level shift → DCT → quantize (deterministic quality-scaled tables,
written to DQT) → zigzag → Huffman; encode_jpeg_progressive emits a
fixed scan script covering every progressive scan shape (spectral
bands, successive approximation Al 2→1→0, DC refinement). Both share
the quantization front half, so baseline and progressive encodings of
one image carry IDENTICAL coefficients and must decode bit-equal —
tests/test_jpeg.py pins that cross-check. Tables are CUSTOM canonical
codes (flat 4-bit DC / 9-10-bit AC) rather than the Annex K defaults:
JPEG permits any DHT, the decoder reads whatever the stream declares
(so it also decodes foreign files), and flat codes keep the encoder
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

def _prepare_blocks(arr, quality, subsampling):
    """Shared front half of both encoders: color transform, subsample,
    MCU padding, DCT, quantize. Returns (h, w, samp, comp_q, qts,
    blocks, mcux, mcuy) with blocks[ci] = (by, bx, 8, 8) int64."""
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
    return h, w, samp, comp_q, qts, blocks, mcux, mcuy


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _header_segments(h, w, samp, comp_q, qts, sof_marker):
    """SOI + DQT + SOFn + flat DHTs shared by both encoders."""
    gray = len(samp) == 1
    out = bytearray(b"\xff\xd8")
    for ti, qt in enumerate(qts[: 1 if gray else 2]):
        zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += _seg(0xDB, bytes([ti]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(samp))
    for ci in range(len(samp)):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], comp_q[ci]])
    out += _seg(sof_marker, sof)
    dc_counts, dc_syms = _flat_tables(12, 4)
    ac_counts, ac_syms = _flat_tables(256, 9)
    for cls, tid, (counts, syms) in (
        (0, 0, (dc_counts, dc_syms)), (1, 0, (ac_counts, ac_syms)),
    ):
        out += _seg(
            0xC4,
            bytes([(cls << 4) | tid]) + bytes(counts[1:17]) + bytes(syms),
        )
    dc_code = _canonical_codes(dc_counts, dc_syms)
    ac_code = _canonical_codes(ac_counts, ac_syms)
    return out, dc_code, ac_code


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """(h, w) or (h, w, 1) grayscale, (h, w, 3) RGB → baseline JPEG.
    subsampling: '444' or '420' (color only)."""
    h, w, samp, comp_q, qts, blocks, mcux, mcuy = _prepare_blocks(
        arr, quality, subsampling
    )
    out, dc_code, ac_code = _header_segments(h, w, samp, comp_q, qts, 0xC0)

    wtr = _Writer()
    pred = [0] * len(samp)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(samp)):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = blocks[ci][my * sv + by, mx * sh + bx]
                        zz = blk.reshape(-1)[ZIGZAG]
                        _put_block(wtr, zz, pred, ci, dc_code, ac_code)
    wtr.flush()

    sos = bytes([len(samp)])
    for ci in range(len(samp)):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _put_block(wtr, zz, pred, ci, dc_code, ac_code):
    """Entropy-encode one zigzag block (sequential full-band)."""
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


def encode_jpeg_multiscan(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Baseline SOF0 with one NON-interleaved full-band scan per
    component (legal baseline; T.81 A.2.2 block order) — the corpus
    generator for the foreign per-component-scan shape that exercises
    the decoder's single-component own-grid walk (ADVICE r06). Same
    quantization front half as encode_jpeg, so decodes of the two
    layouts must be bit-identical."""
    h, w, samp, comp_q, qts, blocks, mcux, mcuy = _prepare_blocks(
        arr, quality, subsampling
    )
    out, dc_code, ac_code = _header_segments(h, w, samp, comp_q, qts, 0xC0)
    hmax = max(sh for sh, _ in samp)
    vmax = max(sv for _, sv in samp)
    for ci in range(len(samp)):
        sh, sv = samp[ci]
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        wtr = _Writer()
        pred = [0] * len(samp)  # DC prediction resets at each scan
        for by in range(bh):
            for bx in range(bw):
                zz = blocks[ci][by, bx].reshape(-1)[ZIGZAG]
                _put_block(wtr, zz, pred, ci, dc_code, ac_code)
        wtr.flush()
        out += _seg(0xDA, bytes([1, ci + 1, 0x00, 0, 63, 0]))
        out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Progressive (SOF2) encoder for corpus generation: a fixed scan
    script that exercises EVERY progressive scan shape — interleaved DC
    first with a point transform (Al=1), a DC refinement, per-component
    AC first scans over two spectral bands at Al=2, and two successive-
    approximation AC refinement levels (2→1→0) per band — so a decoder
    that survives this corpus has seen spectral selection, successive
    approximation, EOB runs, ZRL-in-refinement and correction bits.
    Coefficient-lossless like the baseline encoder: decode(encode(x))
    differs from x by quantization error only (T.81 annex G)."""
    h, w, samp, comp_q, qts, blocks, mcux, mcuy = _prepare_blocks(
        arr, quality, subsampling
    )
    out, dc_code, ac_code = _header_segments(h, w, samp, comp_q, qts, 0xC2)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # zigzag-order the coefficient blocks once
    zz_blocks = []
    for b in blocks:
        flat = b.reshape(b.shape[0], b.shape[1], 64)
        zz_blocks.append(flat[:, :, ZIGZAG])

    def sos_segment(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    def comp_grid(ci):
        """Non-interleaved (unpadded) block grid of component ci."""
        cw = -(-w * samp[ci][0] // hmax)
        ch = -(-h * samp[ci][1] // vmax)
        return -(-cw // 8), -(-ch // 8)

    def dc_first(al):
        wtr = _Writer()
        pred = [0] * len(samp)
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(len(samp)):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(zz_blocks[ci][my * sv + by,
                                                   mx * sh + bx, 0]) >> al
                            diff = dc - pred[ci]
                            pred[ci] = dc
                            t, bitsv = _magnitude(diff)
                            c, ln = dc_code[t]
                            wtr.put(c, ln)
                            if t:
                                wtr.put(bitsv, t)
        wtr.flush()
        return wtr.out

    def dc_refine(al):
        wtr = _Writer()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(len(samp)):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(zz_blocks[ci][my * sv + by,
                                                   mx * sh + bx, 0])
                            wtr.put((dc >> al) & 1, 1)
        wtr.flush()
        return wtr.out

    def flush_eob(wtr, eobrun, pending):
        if eobrun[0] == 0:
            return
        n = eobrun[0]
        rbits = n.bit_length() - 1
        c, ln = ac_code[rbits << 4]
        wtr.put(c, ln)
        if rbits:
            wtr.put(n - (1 << rbits), rbits)
        for b in pending:
            wtr.put(b, 1)
        pending.clear()
        eobrun[0] = 0

    def ac_first(ci, ss, se, al):
        wtr = _Writer()
        bw, bh = comp_grid(ci)
        eobrun = [0]
        for by in range(bh):
            for bx in range(bw):
                band = zz_blocks[ci][by, bx, ss:se + 1]
                t = np.sign(band) * (np.abs(band) >> al)
                nz = np.nonzero(t)[0]
                if len(nz) == 0:
                    eobrun[0] += 1
                    if eobrun[0] == 0x7FFF:
                        flush_eob(wtr, eobrun, [])
                    continue
                flush_eob(wtr, eobrun, [])
                run = 0
                last = nz[-1]
                for k in range(last + 1):
                    v = int(t[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_code[0xF0]
                        wtr.put(c, ln)
                        run -= 16
                    sz, bitsv = _magnitude(v)
                    c, ln = ac_code[(run << 4) | sz]
                    wtr.put(c, ln)
                    wtr.put(bitsv, sz)
                    run = 0
                if last < se - ss:
                    eobrun[0] += 1
        flush_eob(wtr, eobrun, [])
        wtr.flush()
        return wtr.out

    def ac_refine(ci, ss, se, al):
        """T.81 G.1.2.3 encoding model. Correction bits must stay
        INTERLEAVED with the zero-run structure: after a ZRL the decoder
        reads bits only for history coefficients located BEFORE the 16th
        zero it skips, so the encoder tracks an event list (zero-history
        slot vs correction bit, in position order) and splits it at each
        ZRL exactly where the decoder's walk will stop."""
        wtr = _Writer()
        bw, bh = comp_grid(ci)
        eobrun = [0]
        pending: list[int] = []  # correction bits buffered behind EOBs
        for by in range(bh):
            for bx in range(bw):
                band = zz_blocks[ci][by, bx, ss:se + 1]
                absb = np.abs(band) >> al
                newly = np.nonzero(absb == 1)[0]
                eob_pos = int(newly[-1]) + 1 if len(newly) else 0
                events: list[int] = []  # -1 = zero slot, 0/1 = corr bit
                nzeros = 0
                for k in range(eob_pos):
                    ab = int(absb[k])
                    if ab == 0:
                        events.append(-1)
                        nzeros += 1
                    elif ab > 1:
                        events.append(ab & 1)
                    else:  # newly significant
                        while nzeros > 15:
                            flush_eob(wtr, eobrun, pending)
                            c, ln = ac_code[0xF0]
                            wtr.put(c, ln)
                            zc = 0
                            while zc < 16:
                                e = events.pop(0)
                                if e == -1:
                                    zc += 1
                                else:
                                    wtr.put(e, 1)
                            nzeros -= 16
                        flush_eob(wtr, eobrun, pending)
                        c, ln = ac_code[(nzeros << 4) | 1]
                        wtr.put(c, ln)
                        wtr.put(1 if band[k] > 0 else 0, 1)
                        for e in events:
                            if e != -1:
                                wtr.put(e, 1)
                        events = []
                        nzeros = 0
                if eob_pos <= se - ss:
                    # block ends in EOB; its tail correction bits ride
                    # behind the (possibly accumulating) EOB run
                    eobrun[0] += 1
                    pending.extend(
                        int(absb[k]) & 1
                        for k in range(eob_pos, se - ss + 1)
                        if absb[k] > 1
                    )
                    if eobrun[0] == 0x7FFF:
                        flush_eob(wtr, eobrun, pending)
        flush_eob(wtr, eobrun, pending)
        wtr.flush()
        return wtr.out

    all_ids = [ci + 1 for ci in range(len(samp))]
    out += sos_segment(all_ids, 0, 0, 0, 1) + dc_first(1)
    bands = [(1, 5), (6, 63)]
    for ci in range(len(samp)):
        for ss, se in bands:
            out += sos_segment([ci + 1], ss, se, 0, 2) + ac_first(
                ci, ss, se, 2
            )
    # DC refinement deliberately sits between AC passes: scan order
    # across components/coefficient kinds is free in progressive mode
    out += sos_segment(all_ids, 0, 0, 1, 0) + dc_refine(0)
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(len(samp)):
            for ss, se in bands:
                out += sos_segment([ci + 1], ss, se, ah, al) + ac_refine(
                    ci, ss, se, al
                )
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _box2(p: np.ndarray) -> np.ndarray:
    """2x2 box-filter downsample with edge replication to even dims."""
    h, w = p.shape
    q = np.pad(p, ((0, h & 1), (0, w & 1)), mode="edge")
    return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) / 4.0


# ---- decoder ----------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline (SOF0) or progressive (SOF2) JPEG bytes → (h, w, 1)
    gray or (h, w, 3) RGB uint8."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, struct.error) as exc:
        raise JpegError(f"truncated or corrupt stream: {exc}") from exc


def _entropy_end(data: bytes, pos: int) -> int:
    """End of an entropy-coded segment: the next 0xFF not followed by a
    stuffed 0x00 (fill bytes before the next marker count as the end)."""
    end = pos
    while end + 1 < len(data):
        if data[end] == 0xFF and data[end + 1] != 0x00:
            break
        end += 1
    return end


def _decode_dc_scan(r, coefs_zz, scomps, frame, huff, ah, al, pred):
    """DC scan (Ss=Se=0): interleaved MCU walk over the scan's
    components. First pass (Ah=0) decodes diffs into bit-position Al
    and up; refinement (Ah>0) appends one raw bit at Al per block
    (two's-complement OR — exact for negatives because the first pass
    used an arithmetic shift)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    if len(scomps) == 1:
        c, ci, st = scomps[0]
        bw, bh = _comp_blocks(frame, c)
        dct = huff.get((0, st["dc"])) if ah == 0 else None
        for by in range(bh):
            for bx in range(bw):
                _dc_block(r, coefs_zz[ci], by, bx, dct, ah, al, pred, ci)
        return
    for my in range(mcuy):
        for mx in range(mcux):
            for c, ci, st in scomps:
                dct = huff.get((0, st["dc"])) if ah == 0 else None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        _dc_block(
                            r, coefs_zz[ci], my * c["v"] + by,
                            mx * c["h"] + bx, dct, ah, al, pred, ci,
                        )


def _dc_block(r, arr, by, bx, dct, ah, al, pred, ci):
    if ah == 0:
        t = _decode_symbol(r, dct)
        diff = _extend(r.bits(t), t) if t else 0
        pred[ci] += diff
        arr[by, bx, 0] = pred[ci] << al
    else:
        if r.bit():
            arr[by, bx, 0] = int(arr[by, bx, 0]) | (1 << al)


def _comp_blocks(frame, c):
    """Non-interleaved block grid of one component (T.81 A.2.2): based
    on the component's OWN sample dimensions, not the padded MCU grid."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _decode_ac_first(r, arr, bw, bh, act, ss, se, al, eobrun):
    """Progressive AC first pass (T.81 G.1.2.2): non-interleaved block
    raster, EOBn band-skip runs, values land at bit Al and up."""
    for by in range(bh):
        for bx in range(bw):
            if eobrun[0] > 0:
                eobrun[0] -= 1
                continue
            zz = arr[by, bx]
            k = ss
            while k <= se:
                rs = _decode_symbol(r, act)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run != 15:
                        eobrun[0] = (1 << run) + (r.bits(run) if run else 0)
                        eobrun[0] -= 1  # current block is part of the run
                        break
                    k += 16  # ZRL
                    continue
                k += run
                if k > se:
                    raise JpegError("AC run past band end")
                zz[k] = _extend(r.bits(size), size) << al
                k += 1


def _decode_ac_refine(r, arr, bw, bh, act, ss, se, al, eobrun):
    """Progressive AC refinement (T.81 G.1.2.3): correction bits for
    already-nonzero coefficients, new ±2^Al insertions with runs that
    count zero-history positions only."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(zz, k):
        if r.bit():
            cur = int(zz[k])
            if (abs(cur) & p1) == 0:
                zz[k] = cur + (p1 if cur >= 0 else m1)

    for by in range(bh):
        for bx in range(bw):
            zz = arr[by, bx]
            k = ss
            if eobrun[0] == 0:
                while k <= se:
                    rs = _decode_symbol(r, act)
                    run, size = rs >> 4, rs & 0xF
                    val = 0
                    if size == 0:
                        if run != 15:
                            eobrun[0] = (1 << run) + (
                                r.bits(run) if run else 0
                            )
                            break
                        # run == 15: ZRL — skip 16 zero-history slots
                    else:
                        if size != 1:
                            raise JpegError("refinement size must be 1")
                        val = p1 if r.bit() else m1
                    while k <= se:
                        if zz[k] != 0:
                            correct(zz, k)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if eobrun[0] > 0:
                while k <= se:
                    if zz[k] != 0:
                        correct(zz, k)
                    k += 1
                eobrun[0] -= 1


def _baseline_block(r, zz, dct, act, pred, ci):
    """Full-band sequential DC+AC decode of one 8x8 block."""
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


def _decode_baseline_scan(r, coefs_zz, scomps, frame, huff, pred):
    """Sequential scan: interleaved MCU walk for multi-component scans;
    a single-component scan is NON-interleaved over that component's
    own block grid (T.81 A.2.2) — the padded-MCU walk would misalign
    foreign per-component / multi-scan baseline files (ADVICE r06),
    exactly as on the progressive DC path."""
    comps = frame["comps"]
    if len(scomps) == 1:
        c, ci, st = scomps[0]
        bw, bh = _comp_blocks(frame, c)
        dct = huff[(0, st["dc"])]
        act = huff[(1, st["ac"])]
        for by in range(bh):
            for bx in range(bw):
                _baseline_block(r, coefs_zz[ci][by, bx], dct, act, pred, ci)
        return
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    for my in range(mcuy):
        for mx in range(mcux):
            for c, ci, st in scomps:
                dct = huff[(0, st["dc"])]
                act = huff[(1, st["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = coefs_zz[ci][my * c["v"] + by, mx * c["h"] + bx]
                        _baseline_block(r, zz, dct, act, pred, ci)


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    coefs_zz = None
    n_scans = 0
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
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise JpegError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, sf, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # integer ZIGZAG-order coefficient state: progressive scans
            # address spectral bands by zigzag index, and refinement
            # bit-ORs need exact two's-complement ints
            coefs_zz = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"non-baseline frame marker 0xFF{marker:02X} unsupported"
            )
        elif marker == 0xDD:
            raise JpegError("restart intervals unsupported")
        elif marker == 0xDA:
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scomps = []
            by_id = {c["id"]: (c, i) for i, c in enumerate(frame["comps"])}
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                c, ci = by_id[cid]
                scomps.append((c, ci, {"dc": tabs >> 4, "ac": tabs & 0xF}))
            ss, se, ahal = body[1 + 2 * ns: 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            end = _entropy_end(data, pos)
            r = _Reader(data[pos:end])
            pred = [0] * len(frame["comps"])
            if not progressive:
                _decode_baseline_scan(r, coefs_zz, scomps, frame, huff, pred)
            elif ss == 0:
                if se != 0:
                    raise JpegError("progressive DC scan must have Se=0")
                _decode_dc_scan(
                    r, coefs_zz, scomps, frame, huff, ah, al, pred
                )
            else:
                if len(scomps) != 1:
                    raise JpegError("progressive AC scan must be 1-component")
                c, ci, st = scomps[0]
                bw, bh = _comp_blocks(frame, c)
                act = huff[(1, st["ac"])]
                eobrun = [0]
                if ah == 0:
                    _decode_ac_first(
                        r, coefs_zz[ci], bw, bh, act, ss, se, al, eobrun
                    )
                else:
                    _decode_ac_refine(
                        r, coefs_zz[ci], bw, bh, act, ss, se, al, eobrun
                    )
            n_scans += 1
            pos = end
    if frame is None or n_scans == 0:
        raise JpegError("missing SOF0/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]

    planes = []
    for ci, c in enumerate(comps):
        qt = qts[c["tq"]]
        nb_y, nb_x = coefs_zz[ci].shape[:2]
        nat = np.zeros((nb_y, nb_x, 64), dtype=np.float64)
        nat[..., ZIGZAG] = coefs_zz[ci]
        deq = nat.reshape(nb_y, nb_x, 8, 8) * qt
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
