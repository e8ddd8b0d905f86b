"""Pure-numpy lossless-WebP (VP8L) codec.

Decoder: RIFF/WEBP container (plain and VP8X-extended), the VP8L
bitstream — LSB-first bit reader, simple and full canonical prefix
codes (code-length code over the 19-symbol alphabet with repeat codes
16/17/18 and the trimmed max_symbol form), color cache, LZ77
back-references with both plane-code and direct distances, optional
meta-prefix (huffman image) group selection, and all four transforms
with spec inverse semantics: PREDICTOR (14 modes incl. Select and the
ClampAddSubtract pair with C-style truncating division), COLOR
(cross-color deltas on signed int8), SUBTRACT_GREEN, and COLOR_INDEXING
(delta-coded palette, sub-byte index packing for palettes of ≤16
colors). Lossy VP8 lives in functions/vp8.py (round 7 — key-frame
decoder, YUV420 output, libwebp-pinned).

Encoder: the inverse — forward transforms, greedy LZ77 over ARGB with
a 2-pixel hash chain, color-cache hits, per-stream Huffman codes built
with package-merge (length-limited, complete by construction) and
written via the full code-length-code machinery (or the simple 1/2-
symbol form when it applies) — used for corpus generation and
roundtrips. VP8L is lossless, so pixel-level roundtrips are exact
(tests/test_webp.py).

Format reference: RFC 9649 (WebP), §"Specification for WebP Lossless
Bitstream" — public specification; no code consulted.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    pass


# kCodeLengthCodeOrder — the order code-length-code lengths appear in
# the stream (RFC 9649 VP8L §5.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# Plane-code → (packed y<<4 | (8-x)) distance map for the 120 closest
# 2-D offsets (RFC 9649 VP8L §4.2.2)
_CODE_TO_PLANE = [
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70,
]

_GREEN_LITERALS = 256
_N_LENGTH_CODES = 24
_N_DIST_CODES = 40
_CACHE_MUL = 0x1E35A7BD


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


# ---- bit I/O ----------------------------------------------------------------

class _BitReader:
    """LSB-first bit reader over a byte string."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8)[:, None],
            axis=1, bitorder="little",
        ).ravel()
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self._bits):
            raise WebpError("bitstream truncated")
        v = 0
        b = self._bits
        p = self.pos
        for i in range(n):
            v |= int(b[p + i]) << i
        self.pos = p + n
        return v

    def read1(self) -> int:
        if self.pos >= len(self._bits):
            raise WebpError("bitstream truncated")
        v = int(self._bits[self.pos])
        self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self._bits.append((v >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes are written MSB-first (canonical prefix)."""
        for i in range(length - 1, -1, -1):
            self._bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        arr = np.array(self._bits, dtype=np.uint8)
        pad = (-len(arr)) % 8
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
        return np.packbits(arr.reshape(-1, 8), axis=1,
                           bitorder="little").tobytes()


# ---- canonical prefix codes -------------------------------------------------

def _canonical_code_map(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """code lengths → {symbol: (length, code)} per the deflate/VP8L
    canonical assignment (by length, then symbol order)."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (ln, next_code[ln])
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder-side canonical prefix code: bit-by-bit tree walk."""

    def __init__(self, lengths: list[int]):
        nonzero = [s for s, ln in enumerate(lengths) if ln]
        if not nonzero:
            raise WebpError("prefix code with no symbols")
        if len(nonzero) == 1:
            self.single: int | None = nonzero[0]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        self.table = {
            (ln, code): sym
            for sym, (ln, code) in _canonical_code_map(lengths).items()
        }

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single  # 0-bit code
        code = 0
        length = 0
        t = self.table
        for _ in range(16):
            code = (code << 1) | br.read1()
            length += 1
            sym = t.get((length, code))
            if sym is not None:
                return sym
        raise WebpError("invalid prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """<prefix code> ::= simple | full (RFC 9649 VP8L §5.2.1/5.2.2)."""
    if br.read1():  # simple code
        num_symbols = br.read1() + 1
        first_8bit = br.read1()
        sym0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise WebpError("simple-code symbol out of range")
        if num_symbols == 1:
            lengths[sym0] = 1  # placeholder; _PrefixCode treats as 0-bit
            return _PrefixCode(lengths)
        sym1 = br.read(8)
        if sym1 >= alphabet_size or sym1 == sym0:
            raise WebpError("simple-code symbol invalid")
        lengths[sym0] = lengths[sym1] = 1
        return _PrefixCode(lengths)

    # full code: code-length code first
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)

    if br.read1():  # trimmed: explicit max symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size

    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _PrefixCode(lengths)


# ---- encoder-side Huffman (package-merge, length-limited, complete) --------

def _package_merge_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited prefix code lengths (Kraft sum exactly 1
    for ≥2 symbols) via package-merge."""
    syms = sorted(freqs)
    n = len(syms)
    if n == 0:
        return {}
    if n == 1:
        return {syms[0]: 1}
    if (1 << limit) < n:
        raise WebpError("alphabet too large for length limit")
    # items: (weight, {sym: count}); p_1 = originals,
    # p_i = sort(originals + package(p_{i-1})); solution = the 2n-2
    # cheapest items of p_limit, counting original occurrences
    originals = sorted(((freqs[s], s) for s in syms))
    solution: dict[int, int] = {s: 0 for s in syms}
    packages: list[tuple[int, dict[int, int]]] = []
    merged: list[tuple[int, dict[int, int]]] = []
    for _level in range(limit):
        merged = [(w, {s: 1}) for w, s in originals]
        merged.extend(packages)
        merged.sort(key=lambda t: t[0])
        packages = []
        for i in range(0, len(merged) - 1, 2):
            w = merged[i][0] + merged[i + 1][0]
            counts: dict[int, int] = dict(merged[i][1])
            for s, c in merged[i + 1][1].items():
                counts[s] = counts.get(s, 0) + c
            packages.append((w, counts))
    for w, counts in merged[: 2 * n - 2]:
        for s, c in counts.items():
            solution[s] += c
    return solution


def _build_code(freqs: dict[int, int], limit: int = 15):
    """freqs → (lengths list padded later by caller, {sym: (len, code)})."""
    lens = _package_merge_lengths(freqs, limit)
    return lens


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Write a prefix code in simple or full form."""
    used = [s for s, ln in enumerate(lengths) if ln]
    if 1 <= len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return

    bw.write(0, 1)  # full code
    # serialize the lengths with repeat codes for zero runs
    cl_syms: list[tuple[int, int, int]] = []  # (cl_symbol, extra, extra_bits)
    i = 0
    n = len(lengths)
    last_nonzero = max(s for s, ln in enumerate(lengths) if ln)
    while i <= last_nonzero:
        ln = lengths[i]
        if ln == 0:
            run = 0
            while i + run <= last_nonzero and lengths[i + run] == 0:
                run += 1
            while run >= 11:
                r = min(run, 11 + 127)
                cl_syms.append((18, r - 11, 7))
                run -= r
                i += r
            while run >= 3:
                r = min(run, 3 + 7)
                cl_syms.append((17, r - 3, 3))
                run -= r
                i += r
            for _ in range(run):
                cl_syms.append((0, 0, 0))
                i += 1
        else:
            cl_syms.append((ln, 0, 0))
            i += 1

    cl_freqs: dict[int, int] = {}
    for s, _e, _b in cl_syms:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    cl_lens_map = _package_merge_lengths(cl_freqs, 7)
    if len(cl_lens_map) == 1:
        # a single code-length symbol cannot be a 0-bit code in the CL
        # code (the reader walks bits); make it complete with a partner
        only = next(iter(cl_lens_map))
        partner = 0 if only != 0 else 1
        cl_lens_map = {only: 1, partner: 1}
    cl_lengths = [cl_lens_map.get(s, 0) for s in range(19)]
    # num_code_lengths: how many of _CL_ORDER entries we must emit
    need = max(i for i, s in enumerate(_CL_ORDER) if cl_lengths[s]) + 1
    num_cl = max(4, need)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    # trimmed form: max_symbol = the NUMBER of code-length tokens the
    # reader consumes (one loop iteration each), so the trailing zeros
    # up to alphabet_size need no explicit run codes
    n_tokens = len(cl_syms)
    if n_tokens < 2:
        raise WebpError("internal: <2 code-length tokens")
    nbits_sel = 0
    while (n_tokens - 2) >> (2 + 2 * nbits_sel):
        nbits_sel += 1
    bw.write(1, 1)
    bw.write(nbits_sel, 3)
    bw.write(n_tokens - 2, 2 + 2 * nbits_sel)
    cl_codes = _canonical_code_map(cl_lengths)
    for s, extra, ebits in cl_syms:
        ln, code = cl_codes[s]
        bw.write_code(code, ln)
        if ebits:
            bw.write(extra, ebits)


# ---- prefix (length/distance) value coding ---------------------------------

def _prefix_decode(code: int, br: _BitReader) -> int:
    """LZ77 prefix code → value (lengths and distances share this)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value → (prefix_code, extra_value, extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + 2 + ((v >> extra) & 1), v - offset, extra


def _plane_to_distance(plane_code: int, width: int) -> int:
    if plane_code > len(_CODE_TO_PLANE):
        return plane_code - len(_CODE_TO_PLANE)
    packed = _CODE_TO_PLANE[plane_code - 1]
    y = packed >> 4
    x = 8 - (packed & 0xF)
    return max(y * width + x, 1)


def _distance_to_plane(dist: int, width: int) -> int:
    """Inverse map for the encoder (plane code when one exists)."""
    for pc in range(1, len(_CODE_TO_PLANE) + 1):
        if _plane_to_distance(pc, width) == dist:
            return pc
    return dist + len(_CODE_TO_PLANE)


# ---- color cache ------------------------------------------------------------

def _cache_index(argb: int, bits: int) -> int:
    return ((_CACHE_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


# ---- entropy-coded image decode --------------------------------------------

def _read_code_groups(br: _BitReader, n_groups: int, cache_size: int):
    groups = []
    green_alpha = _GREEN_LITERALS + _N_LENGTH_CODES + cache_size
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, _N_DIST_CODES),
        ))
    return groups


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """Decode one entropy-coded ARGB image → uint32 (h*w,) array."""
    cache_bits = 0
    if br.read1():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise WebpError(f"bad color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta_codes: np.ndarray | None = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read1():
        meta_bits = br.read(3) + 2
        mw = _div_round_up(w, 1 << meta_bits)
        mh = _div_round_up(h, 1 << meta_bits)
        meta_img = _decode_entropy_image(br, mw, mh, allow_meta=False)
        # meta code index = (red << 8) | green
        meta_codes = (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8) & 0xFF)
        n_groups = int(meta_codes.max()) + 1
        meta_codes = meta_codes.reshape(mh, mw)

    groups = _read_code_groups(br, n_groups, cache_size)

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        x, y = pos % w, pos // w
        if meta_codes is not None:
            g = groups[int(meta_codes[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        green_c, red_c, blue_c, alpha_c, dist_c = g
        s = green_c.read(br)
        if s < _GREEN_LITERALS:
            red = red_c.read(br)
            blue = blue_c.read(br)
            alpha = alpha_c.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_bits:
                cache[_cache_index(px, cache_bits)] = px
            pos += 1
        elif s < _GREEN_LITERALS + _N_LENGTH_CODES:
            length = _prefix_decode(s - _GREEN_LITERALS, br)
            dist_sym = dist_c.read(br)
            dist = _plane_to_distance(_prefix_decode(dist_sym, br), w)
            if dist > pos:
                raise WebpError("LZ77 distance before image start")
            for _ in range(length):
                if pos >= total:
                    raise WebpError("LZ77 copy past image end")
                px = int(out[pos - dist])
                out[pos] = px
                if cache_bits:
                    cache[_cache_index(px, cache_bits)] = px
                pos += 1
        else:
            idx = s - (_GREEN_LITERALS + _N_LENGTH_CODES)
            if idx >= cache_size:
                raise WebpError("color-cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out


# ---- transforms (decode-side inverses) -------------------------------------

def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """One predicted ARGB pixel as int32[4] from int32[4] neighbors."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = L + T - TL
        pa = int(np.abs(p - T).sum())
        pb = int(np.abs(p - L).sum())
        return T if pa <= pb else L
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:  # ClampAddSubtractHalf (C truncating division)
        av = _avg2(L, T)
        d = av - TL
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(av + half, 0, 255)
    raise WebpError(f"bad predictor mode {mode}")


def _inverse_predictor(px: np.ndarray, w: int, h: int,
                       modes: np.ndarray, size_bits: int) -> None:
    """In-place inverse of the predictor transform on (h*w, 4) uint8
    [a, r, g, b] pixel rows."""
    p = px.astype(np.int32).reshape(h, w, 4)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = _predict(0, None, None, None, None)
            elif y == 0:
                pred = p[0, x - 1]
            elif x == 0:
                pred = p[y - 1, 0]
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = p[y, x - 1]
                T = p[y - 1, x]
                TL = p[y - 1, x - 1]
                # rightmost column: TR wraps to the first pixel of the
                # current row (contiguous-array addressing, spec §4.2.1)
                TR = p[y - 1 + (x + 1) // w, (x + 1) % w]
                pred = _predict(mode, L, T, TL, TR)
            p[y, x] = (p[y, x] + pred) & 0xFF
    px[:] = p.reshape(h * w, 4).astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8 t * int8 c) >> 5 (arithmetic)."""
    return (t.astype(np.int8).astype(np.int32)
            * c.astype(np.int8).astype(np.int32)) >> 5


def _inverse_color_transform(px: np.ndarray, w: int, h: int,
                             cte: np.ndarray, size_bits: int) -> None:
    """In-place inverse cross-color transform on (h*w, 4) uint8."""
    ys, xs = np.divmod(np.arange(h * w), w)
    by, bx = ys >> size_bits, xs >> size_bits
    block = cte[by, bx]  # (h*w,) uint32 transform pixels
    g2r = (block & 0xFF).astype(np.uint8)
    g2b = ((block >> 8) & 0xFF).astype(np.uint8)
    r2b = ((block >> 16) & 0xFF).astype(np.uint8)
    green = px[:, 2]
    red = (px[:, 1].astype(np.int32) + _ct_delta(g2r, green)) & 0xFF
    blue = (px[:, 3].astype(np.int32) + _ct_delta(g2b, green)
            + _ct_delta(r2b, red.astype(np.uint8))) & 0xFF
    px[:, 1] = red.astype(np.uint8)
    px[:, 3] = blue.astype(np.uint8)


# ---- VP8L top-level decode --------------------------------------------------

def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload → (h, w, 4) uint8 RGBA."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise WebpError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read1()  # alpha-used hint
    if br.read(3) != 0:
        raise WebpError("unsupported VP8L version")

    transforms: list[tuple] = []
    seen: set[int] = set()
    xsize = w  # width shrinks under color-indexing packing
    while br.read1():
        ttype = br.read(2)
        if ttype in seen:
            raise WebpError(f"transform {ttype} repeated")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            size_bits = br.read(3) + 2
            bw_ = _div_round_up(xsize, 1 << size_bits)
            bh_ = _div_round_up(h, 1 << size_bits)
            sub = _decode_entropy_image(br, bw_, bh_, allow_meta=False)
            modes = ((sub >> 8) & 0xFF).reshape(bh_, bw_)
            transforms.append(("predictor", size_bits, modes))
        elif ttype == 1:  # COLOR
            size_bits = br.read(3) + 2
            bw_ = _div_round_up(xsize, 1 << size_bits)
            bh_ = _div_round_up(h, 1 << size_bits)
            sub = _decode_entropy_image(br, bw_, bh_, allow_meta=False)
            transforms.append(("color", size_bits, sub.reshape(bh_, bw_)))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1, allow_meta=False)
            # palette entries are delta-coded component-wise
            pal = np.zeros((n_colors, 4), dtype=np.uint8)
            prev = np.zeros(4, dtype=np.int32)
            for i in range(n_colors):
                v = int(pal_img[i])
                cur = (prev + np.array(
                    [(v >> 24) & 0xFF, (v >> 16) & 0xFF,
                     (v >> 8) & 0xFF, v & 0xFF], dtype=np.int32)) & 0xFF
                pal[i] = cur
                prev = cur
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append(("palette", pal, width_bits, xsize))
            xsize = _div_round_up(xsize, 1 << width_bits)

    argb = _decode_entropy_image(br, xsize, h, allow_meta=True)
    # (n, 4) uint8 [a, r, g, b]
    px = np.empty((xsize * h, 4), dtype=np.uint8)
    px[:, 0] = (argb >> 24) & 0xFF
    px[:, 1] = (argb >> 16) & 0xFF
    px[:, 2] = (argb >> 8) & 0xFF
    px[:, 3] = argb & 0xFF
    cur_w = xsize

    for t in reversed(transforms):
        if t[0] == "predictor":
            _inverse_predictor(px, cur_w, h, t[2], t[1])
        elif t[0] == "color":
            _inverse_color_transform(px, cur_w, h, t[2], t[1])
        elif t[0] == "subtract_green":
            px[:, 1] = (px[:, 1].astype(np.int32)
                        + px[:, 2].astype(np.int32)).astype(np.uint8)
            px[:, 3] = (px[:, 3].astype(np.int32)
                        + px[:, 2].astype(np.int32)).astype(np.uint8)
        else:  # palette
            _, pal, width_bits, full_w = t
            idx = px[:, 2].reshape(h, cur_w)  # green channel
            if width_bits:
                per = 1 << width_bits
                bits = 8 >> width_bits
                mask = (1 << bits) - 1
                shifts = (np.arange(per) * bits).astype(np.uint8)
                wide = ((idx[:, :, None].astype(np.uint32)
                         >> shifts[None, None, :]) & mask)
                wide = wide.reshape(h, cur_w * per)[:, :full_w]
            else:
                wide = idx.astype(np.uint32)
            if int(wide.max(initial=0)) >= len(pal):
                raise WebpError("palette index out of range")
            px = pal[wide.reshape(-1)]
            cur_w = full_w

    out = np.empty((h, cur_w, 4), dtype=np.uint8)
    flat = px.reshape(h, cur_w, 4)
    out[:, :, 0] = flat[:, :, 1]  # R
    out[:, :, 1] = flat[:, :, 2]  # G
    out[:, :, 2] = flat[:, :, 3]  # B
    out[:, :, 3] = flat[:, :, 0]  # A
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """WebP container → (h, w, 4) uint8 RGBA. Lossless (VP8L) only;
    lossy VP8 raises NotImplementedError (a DCT codec out of scope for
    this sandbox — see operators/multimodal.decode_image)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP (RIFF/WEBP) container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8: pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 decodes to YUV420, not RGBA — use "
                "functions/vp8.decode_webp_lossy_yuv (round 7) and the "
                "webp_lossy_features operator; this RGBA path stays "
                "VP8L-only because matching libwebp's RGB output would "
                "additionally require its fancy-upsampler semantics"
            )
        pos += 8 + size + (size & 1)  # chunks pad to even
    raise WebpError("no VP8L chunk in container")


def decode_webp_rgb(data: bytes) -> np.ndarray:
    """(h, w, 3) RGB view for feature kernels (alpha plane dropped)."""
    return decode_webp(data)[:, :, :3]


# ---- encoder ---------------------------------------------------------------

def _forward_predictor(px: np.ndarray, w: int, h: int,
                       modes: np.ndarray, size_bits: int) -> np.ndarray:
    """(h*w, 4) uint8 → residuals; neighbors are the ORIGINAL values
    (reconstruction is exact, so decode-side neighbors match)."""
    p = px.astype(np.int32).reshape(h, w, 4)
    out = np.empty_like(p)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = _predict(0, None, None, None, None)
            elif y == 0:
                pred = p[0, x - 1]
            elif x == 0:
                pred = p[y - 1, 0]
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                pred = _predict(
                    mode, p[y, x - 1], p[y - 1, x], p[y - 1, x - 1],
                    p[y - 1 + (x + 1) // w, (x + 1) % w],
                )
            out[y, x] = (p[y, x] - pred) & 0xFF
    return out.reshape(h * w, 4).astype(np.uint8)


def _forward_color_transform(px: np.ndarray, w: int, h: int,
                             cte: np.ndarray, size_bits: int) -> None:
    ys, xs = np.divmod(np.arange(h * w), w)
    block = cte[ys >> size_bits, xs >> size_bits]
    g2r = (block & 0xFF).astype(np.uint8)
    g2b = ((block >> 8) & 0xFF).astype(np.uint8)
    r2b = ((block >> 16) & 0xFF).astype(np.uint8)
    green = px[:, 2]
    red0 = px[:, 1].copy()
    px[:, 1] = ((px[:, 1].astype(np.int32) - _ct_delta(g2r, green))
                & 0xFF).astype(np.uint8)
    px[:, 3] = ((px[:, 3].astype(np.int32) - _ct_delta(g2b, green)
                 - _ct_delta(r2b, red0)) & 0xFF).astype(np.uint8)


def _lz77_tokens(argb: np.ndarray, w: int, cache_bits: int,
                 use_lz77: bool, use_plane_codes: bool):
    """Greedy tokenizer → list of ('lit', argb) | ('copy', len, dist_code,
    extra…) | ('cache', idx). Mirrors the decoder's cache insertion
    order exactly."""
    n = len(argb)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    tokens = []
    table: dict[tuple[int, int], int] = {}
    pos = 0
    max_len = (1 << 12) - 1  # prefix code ceiling is comfortably above
    while pos < n:
        match_len = 0
        match_dist = 0
        if use_lz77 and pos + 1 < n:
            key = (int(argb[pos]), int(argb[pos + 1]))
            cand = table.get(key)
            if cand is not None:
                dist = pos - cand
                length = 0
                while (pos + length < n and length < max_len
                       and argb[cand + length] == argb[pos + length]):
                    length += 1
                if length >= 3:
                    match_len, match_dist = length, dist
            table[key] = pos
        if match_len:
            tokens.append(("copy", match_len, match_dist))
            for i in range(match_len):
                px = int(argb[pos + i])
                if cache_size:
                    cache[_cache_index(px, cache_bits)] = px
                if use_lz77 and pos + i + 1 < n:
                    table[(int(argb[pos + i]), int(argb[pos + i + 1]))] = \
                        pos + i
            pos += match_len
        else:
            px = int(argb[pos])
            if cache_size:
                ci = _cache_index(px, cache_bits)
                if cache[ci] == px:
                    tokens.append(("cache", ci))
                else:
                    tokens.append(("lit", px))
                cache[ci] = px
            else:
                tokens.append(("lit", px))
            pos += 1
    return tokens


def _write_entropy_image(bw: _BitWriter, argb: np.ndarray, w: int, h: int,
                         cache_bits: int = 0, use_lz77: bool = False,
                         use_plane_codes: bool = False,
                         meta_bits: int = 0,
                         top_level: bool = False) -> None:
    """Encode one ARGB (uint32 flat) image: cache info, optional
    meta-prefix groups (top-level/spatial image only — subimage readers
    do not read a meta bit), prefix codes, token stream."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = _GREEN_LITERALS + _N_LENGTH_CODES + cache_size

    tokens = _lz77_tokens(argb, w, cache_bits, use_lz77, use_plane_codes)

    # group id per PIXEL position (meta-prefix selects on the position
    # where each symbol STARTS)
    n_groups = 1
    group_of_pos = None
    if meta_bits and not top_level:
        raise WebpError("meta-prefix groups only on the spatial image")
    if top_level:
        if meta_bits:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = _div_round_up(w, 1 << meta_bits)
            mh = _div_round_up(h, 1 << meta_bits)
            gy, gx = np.divmod(np.arange(mw * mh), mw)
            meta_groups = ((gx + gy) % 2).astype(np.uint32)
            n_groups = int(meta_groups.max()) + 1
            meta_img = (meta_groups & 0xFF) << 8  # green channel, red = 0
            _write_entropy_image(bw, meta_img | 0xFF000000, mw, mh)
            ys, xs = np.divmod(np.arange(w * h), w)
            group_of_pos = meta_groups.reshape(mh, mw)[
                ys >> meta_bits, xs >> meta_bits]
        else:
            bw.write(0, 1)

    # histogram per group
    def tok_group(pos):
        return 0 if group_of_pos is None else int(group_of_pos[pos])

    freqs = [
        [dict() for _ in range(5)] for _ in range(n_groups)
    ]

    def bump(g, which, sym):
        d = freqs[g][which]
        d[sym] = d.get(sym, 0) + 1

    pos = 0
    for t in tokens:
        g = tok_group(pos)
        if t[0] == "lit":
            px = t[1]
            bump(g, 0, (px >> 8) & 0xFF)
            bump(g, 1, (px >> 16) & 0xFF)
            bump(g, 2, px & 0xFF)
            bump(g, 3, (px >> 24) & 0xFF)
            pos += 1
        elif t[0] == "cache":
            bump(g, 0, _GREEN_LITERALS + _N_LENGTH_CODES + t[1])
            pos += 1
        else:
            _, length, dist = t
            lp, _le, _lb = _prefix_encode(length)
            bump(g, 0, _GREEN_LITERALS + lp)
            dcode = (_distance_to_plane(dist, w) if use_plane_codes
                     else dist + len(_CODE_TO_PLANE))
            dp, _de, _db = _prefix_encode(dcode)
            bump(g, 4, dp)
            pos += length

    # build + write codes
    alphabet = [green_alpha, 256, 256, 256, _N_DIST_CODES]
    group_codes = []
    for g in range(n_groups):
        codes5 = []
        for which in range(5):
            f = freqs[g][which]
            if not f:
                f = {0: 1}  # unused code: emit a trivial 1-symbol code
            lens_map = _build_code(f, limit=15)
            if len(lens_map) == 1:
                sym = next(iter(lens_map))
                if sym <= 255:
                    lengths = [0] * alphabet[which]
                    lengths[sym] = 1
                else:
                    lengths = [0] * alphabet[which]
                    lengths[sym] = 1
                    lengths[0] = 1  # completeness partner
            else:
                lengths = [0] * alphabet[which]
                for s, ln in lens_map.items():
                    lengths[s] = ln
            _write_prefix_code(bw, lengths)
            codes5.append(_canonical_code_map(lengths))
        group_codes.append(codes5)

    # write token stream
    def emit(codes, sym):
        ln, code = codes[sym]
        bw.write_code(code, ln)

    def emit_maybe(codes, sym):
        # single-symbol codes are 0-bit only in SIMPLE form; our writer
        # emitted length-1 codes, which read as 1 bit unless the code
        # was written simple with one symbol (0-bit). _PrefixCode treats
        # a single-entry table as 0-bit, so mirror that here.
        if len(codes) == 1:
            return
        emit(codes, sym)

    pos = 0
    for t in tokens:
        g = group_codes[tok_group(pos)]
        if t[0] == "lit":
            px = t[1]
            emit_maybe(g[0], (px >> 8) & 0xFF)
            emit_maybe(g[1], (px >> 16) & 0xFF)
            emit_maybe(g[2], px & 0xFF)
            emit_maybe(g[3], (px >> 24) & 0xFF)
            pos += 1
        elif t[0] == "cache":
            emit_maybe(g[0], _GREEN_LITERALS + _N_LENGTH_CODES + t[1])
            pos += 1
        else:
            _, length, dist = t
            lp, le, lb = _prefix_encode(length)
            emit_maybe(g[0], _GREEN_LITERALS + lp)
            bw.write(le, lb)
            dcode = (_distance_to_plane(dist, w) if use_plane_codes
                     else dist + len(_CODE_TO_PLANE))
            dp, de, db = _prefix_encode(dcode)
            emit_maybe(g[4], dp)
            bw.write(de, db)
            pos += length


def encode_webp_lossless(
    rgba: np.ndarray,
    transforms: tuple[str, ...] = (),
    cache_bits: int = 0,
    use_lz77: bool = True,
    use_plane_codes: bool = False,
    meta_bits: int = 0,
    size_bits: int = 2,
) -> bytes:
    """(h, w, 3|4) uint8 → lossless WebP bytes.

    `transforms` is the stream-order tuple drawn from {"subtract_green",
    "predictor", "color", "palette"} ("palette" is exclusive of the
    others here). Predictor blocks cycle through all 14 modes and color
    blocks through deterministic cross-color elements so a corpus
    spanning variants exercises every decoder branch."""
    if rgba.ndim == 2:
        rgba = rgba[:, :, None]
    if rgba.shape[2] == 1:
        rgba = np.repeat(rgba, 3, axis=2)
    if rgba.shape[2] == 3:
        rgba = np.concatenate(
            [rgba, np.full(rgba.shape[:2] + (1,), 255, np.uint8)], axis=2)
    h, w = rgba.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise WebpError("dimensions out of VP8L range")
    if "palette" in transforms and len(transforms) > 1:
        raise WebpError("palette transform is exclusive in this encoder")

    # [a, r, g, b] pixel rows
    px = np.empty((h * w, 4), dtype=np.uint8)
    flat = rgba.reshape(h * w, 4)
    px[:, 0] = flat[:, 3]
    px[:, 1] = flat[:, 0]
    px[:, 2] = flat[:, 1]
    px[:, 3] = flat[:, 2]

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (px[:, 0] != 255).any() else 0, 1)
    bw.write(0, 3)  # version

    xsize = w
    pending_subimages = []  # headers already written in order
    for t in transforms:
        bw.write(1, 1)  # transform-present
        if t == "subtract_green":
            bw.write(2, 2)
            px[:, 1] = ((px[:, 1].astype(np.int32)
                         - px[:, 2].astype(np.int32)) & 0xFF).astype(np.uint8)
            px[:, 3] = ((px[:, 3].astype(np.int32)
                         - px[:, 2].astype(np.int32)) & 0xFF).astype(np.uint8)
        elif t == "predictor":
            bw.write(0, 2)
            bw.write(size_bits - 2, 3)
            bw_n = _div_round_up(xsize, 1 << size_bits)
            bh_n = _div_round_up(h, 1 << size_bits)
            modes = (np.arange(bw_n * bh_n) % 14).reshape(bh_n, bw_n)
            sub = (0xFF000000 | (modes.astype(np.uint32) << 8)).reshape(-1)
            _write_entropy_image(bw, sub, bw_n, bh_n)
            px[:] = _forward_predictor(px, xsize, h, modes, size_bits)
        elif t == "color":
            bw.write(1, 2)
            bw.write(size_bits - 2, 3)
            bw_n = _div_round_up(xsize, 1 << size_bits)
            bh_n = _div_round_up(h, 1 << size_bits)
            bi = np.arange(bw_n * bh_n, dtype=np.uint32)
            g2r = (bi * 17 + 3) & 0xFF
            g2b = (bi * 29 + 7) & 0xFF
            r2b = (bi * 41 + 11) & 0xFF
            cte = (0xFF000000 | (r2b << 16) | (g2b << 8) | g2r)
            cte2 = cte.reshape(bh_n, bw_n)
            _write_entropy_image(bw, cte, bw_n, bh_n)
            _forward_color_transform(px, xsize, h, cte2, size_bits)
        elif t == "palette":
            bw.write(3, 2)
            argb_full = ((px[:, 0].astype(np.uint32) << 24)
                         | (px[:, 1].astype(np.uint32) << 16)
                         | (px[:, 2].astype(np.uint32) << 8)
                         | px[:, 3].astype(np.uint32))
            pal_vals, inv = np.unique(argb_full, return_inverse=True)
            n_colors = len(pal_vals)
            if n_colors > 256:
                raise WebpError("more than 256 colors for palette")
            bw.write(n_colors - 1, 8)
            deltas = np.empty(n_colors, dtype=np.uint32)
            prev = 0
            for i, v in enumerate(pal_vals):
                d = 0
                for shift in (24, 16, 8, 0):
                    dc = ((int(v) >> shift) - (prev >> shift)) & 0xFF
                    d |= dc << shift
                deltas[i] = d
                prev = int(v)
            _write_entropy_image(bw, deltas, n_colors, 1)
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            idx = inv.astype(np.uint32).reshape(h, w)
            if width_bits:
                per = 1 << width_bits
                bits = 8 >> width_bits
                packed_w = _div_round_up(w, per)
                padded = np.zeros((h, packed_w * per), dtype=np.uint32)
                padded[:, :w] = idx
                packed = np.zeros((h, packed_w), dtype=np.uint32)
                for i in range(per):
                    packed |= padded[:, i::per] << (bits * i)
                idx = packed
                xsize = packed_w
            new_px = np.zeros((h * xsize, 4), dtype=np.uint8)
            new_px[:, 0] = 0xFF
            new_px[:, 2] = idx.reshape(-1).astype(np.uint8)
            px = new_px
        else:
            raise WebpError(f"unknown transform {t!r}")
    bw.write(0, 1)  # no more transforms

    argb = ((px[:, 0].astype(np.uint32) << 24)
            | (px[:, 1].astype(np.uint32) << 16)
            | (px[:, 2].astype(np.uint32) << 8)
            | px[:, 3].astype(np.uint32))
    _write_entropy_image(bw, argb, xsize, h, cache_bits=cache_bits,
                         use_lz77=use_lz77, use_plane_codes=use_plane_codes,
                         meta_bits=meta_bits, top_level=True)

    payload = bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
