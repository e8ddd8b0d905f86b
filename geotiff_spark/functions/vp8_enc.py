"""Minimal VP8 intra encoder (RFC 6386): boolean arithmetic encoder +
key-frame header/mode writer. Purpose-built to craft targeted streams
the corpus generator and tests need — exact prediction-mode grids,
chosen quantizers, hand-placed coefficients, skip patterns, filter
settings — shapes a production encoder rarely emits but a compliant
decoder must handle. The from-scratch decoder (vp8.py) and libwebp
must agree bit-for-bit on every crafted stream (tests/test_webp.py),
which pins each prediction mode / filter path in isolation.
"""

from __future__ import annotations

import struct

from geotiff_spark.functions.vp8 import (
    B_PRED,
    BMODE_TREE,
    COEFF_BANDS,
    COEFF_TREE,
    CAT_BASE,
    CAT_PROBS,
    KF_UV_PROBS,
    KF_YMODE_PROBS,
    KF_YMODE_TREE,
    MB_TO_B,
    UV_MODE_TREE,
    ZIGZAG,
)
from geotiff_spark.functions.vp8_tables import (
    COEFF_UPDATE_PROBS,
    DEFAULT_COEFF_PROBS,
    KF_BMODE_PROBS,
)


class BoolEnc:
    """RFC 6386 section 7.1 boolean encoder (carry-propagating)."""

    def __init__(self):
        self.range = 255
        self.bottom = 0
        self.bit_count = 24
        self.out = bytearray()

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def _shift(self):
        if self.bottom & (1 << 31):
            self._carry()
        self.bottom = (self.bottom << 1) & 0xFFFFFFFF
        self.bit_count -= 1
        if self.bit_count == 0:
            self.out.append((self.bottom >> 24) & 0xFF)
            self.bottom &= 0xFFFFFF
            self.bit_count = 8

    def put(self, prob: int, bit: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self._shift()

    def literal(self, n: int, v: int):
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def flush(self) -> bytes:
        for _ in range(32):
            self._shift()
        return bytes(self.out)


def tree_paths(tree) -> dict:
    """leaf value -> [(prob_index, bit), ...] along the tree path."""
    paths: dict = {}

    def walk(i, path):
        for b in (0, 1):
            j = tree[i + b]
            p2 = path + [(i >> 1, b)]
            if j <= 0:
                paths[-j] = p2
            else:
                walk(j, p2)

    walk(0, [])
    return paths


_YMODE_PATHS = tree_paths(KF_YMODE_TREE)
_UV_PATHS = tree_paths(UV_MODE_TREE)
_BMODE_PATHS = tree_paths(BMODE_TREE)
_COEFF_PATHS = tree_paths(COEFF_TREE)


def _write_tree(be: BoolEnc, paths, probs, leaf):
    for pi, bit in paths[leaf]:
        be.put(int(probs[pi]), bit)


def _write_coeff_block(be: BoolEnc, probs, ptype: int, first: int,
                       ctx: int, levels):
    """Token-encode one block's coefficient LEVELS (pre-dequant ints in
    zigzag order, indices first..15). Returns whether any nonzero."""
    n = first
    nz = False
    skip_eob = False
    # trim trailing zeros: position of last nonzero
    last = -1
    for i in range(first, 16):
        if levels[i] != 0:
            last = i
    while n <= last:
        p = probs[ptype][COEFF_BANDS[n]][ctx]
        v = levels[n]
        a = abs(v)
        if a == 0:
            tok = 0
        elif a <= 4:
            tok = a
        else:
            tok = next(t for t in (5, 6, 7, 8, 9, 10)
                       if t == 10 or a < CAT_BASE[t + 1])
        path = _COEFF_PATHS[tok]
        if skip_eob:
            path = path[1:]  # EOB branch structurally absent after a zero
        for pi, bit in path:
            be.put(int(p[pi]), bit)
        if tok == 0:
            ctx = 0
            skip_eob = True
            n += 1
            continue
        skip_eob = False
        if tok > 4:
            extra = a - CAT_BASE[tok]
            cp = CAT_PROBS[tok]
            for i, pr in enumerate(cp):
                be.put(pr, (extra >> (len(cp) - 1 - i)) & 1)
        be.put(128, 1 if v < 0 else 0)
        ctx = 2 if a > 1 else 1
        nz = True
        n += 1
    if last < 15:
        p = probs[ptype][COEFF_BANDS[n]][ctx]
        path = _COEFF_PATHS[11]
        if skip_eob:
            raise AssertionError("EOB cannot follow a zero token")
        for pi, bit in path:
            be.put(int(p[pi]), bit)
    return nz


def encode_intra_frame(
    width: int,
    height: int,
    ymode_grid,
    bmode_grid=None,
    uvmode_grid=None,
    y_ac_qi: int = 4,
    filter_level: int = 0,
    filter_simple: int = 0,
    sharpness: int = 0,
    coeffs=None,
) -> bytes:
    """Craft one VP8 key frame.

    ymode_grid: (mb_h, mb_w) ints (0..4; 4 = B_PRED).
    bmode_grid: (mb_h, mb_w, 4, 4) sub-modes for B_PRED MBs.
    uvmode_grid: (mb_h, mb_w) ints 0..3 (default DC).
    coeffs: optional dict (my, mx) -> dict with keys 'y2' (16 levels),
      'y' (16x16 levels), 'u'/'v' (4x16 levels) in ZIGZAG level order;
      MBs absent from the dict are coded as skipped.
    Returns the raw VP8 frame (no RIFF container); wrap with
    wrap_webp() for a .webp file."""
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    coeffs = coeffs or {}

    be = BoolEnc()
    be.put(128, 0)  # color_space
    be.put(128, 0)  # clamping
    be.put(128, 0)  # segmentation_enabled
    be.put(128, filter_simple)
    be.literal(6, filter_level)
    be.literal(3, sharpness)
    be.put(128, 0)  # lf delta
    be.literal(2, 0)  # one token partition
    be.literal(7, y_ac_qi)
    for _ in range(5):
        be.put(128, 0)  # no quantizer deltas
    be.put(128, 1)  # refresh entropy
    upd = COEFF_UPDATE_PROBS
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    be.put(int(upd[t, b, c, p]), 0)
    be.put(128, 1)  # mb_no_coeff_skip
    be.literal(8, 128)  # prob_skip

    above_b = [[0] * 4 for _ in range(mb_w)]
    bmodes_out = [[None] * mb_w for _ in range(mb_h)]
    for my in range(mb_h):
        left_b = [0] * 4
        for mx in range(mb_w):
            skipped = (my, mx) not in coeffs
            be.put(128, 1 if skipped else 0)
            ym = int(ymode_grid[my][mx])
            _write_tree(be, _YMODE_PATHS, KF_YMODE_PROBS, ym)
            if ym == B_PRED:
                bm = [[int(bmode_grid[my][mx][r][c]) for c in range(4)]
                      for r in range(4)]
                for r in range(4):
                    for c in range(4):
                        a = above_b[mx][c] if r == 0 else bm[r - 1][c]
                        l = left_b[r] if c == 0 else bm[r][c - 1]
                        _write_tree(be, _BMODE_PATHS,
                                    KF_BMODE_PROBS[a][l], bm[r][c])
                above_b[mx] = bm[3][:]
                left_b = [bm[r][3] for r in range(4)]
            else:
                sub = MB_TO_B[ym]
                bm = [[sub] * 4 for _ in range(4)]
                above_b[mx] = [sub] * 4
                left_b = [sub] * 4
            bmodes_out[my][mx] = bm
            uvm = int(uvmode_grid[my][mx]) if uvmode_grid is not None else 0
            _write_tree(be, _UV_PATHS, KF_UV_PROBS, uvm)
    part0 = be.flush()

    # token partition
    te = BoolEnc()
    probs = DEFAULT_COEFF_PROBS
    a_y = [[0] * 4 for _ in range(mb_w)]
    a_u = [[0] * 2 for _ in range(mb_w)]
    a_v = [[0] * 2 for _ in range(mb_w)]
    a_y2 = [0] * mb_w
    for my in range(mb_h):
        l_y = [0] * 4
        l_u = [0] * 2
        l_v = [0] * 2
        l_y2 = 0
        for mx in range(mb_w):
            ym = int(ymode_grid[my][mx])
            has_y2 = ym != B_PRED
            if (my, mx) not in coeffs:
                l_y = [0] * 4
                a_y[mx] = [0] * 4
                l_u = [0] * 2
                a_u[mx] = [0] * 2
                l_v = [0] * 2
                a_v[mx] = [0] * 2
                if has_y2:
                    l_y2 = 0
                    a_y2[mx] = 0
                continue
            mbco = coeffs[(my, mx)]
            if has_y2:
                ctx = a_y2[mx] + l_y2
                nz = _write_coeff_block(
                    te, probs, 1, 0, ctx, mbco.get("y2", [0] * 16))
                a_y2[mx] = l_y2 = int(nz)
            first = 1 if has_y2 else 0
            ptype = 0 if has_y2 else 3
            yl = mbco.get("y", [[0] * 16] * 16)
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                ctx = a_y[mx][c] + l_y[r]
                nz = _write_coeff_block(te, probs, ptype, first, ctx, yl[sb])
                a_y[mx][c] = l_y[r] = int(nz)
            for key, a_nz, l_nz in (("u", a_u, l_u), ("v", a_v, l_v)):
                pl = mbco.get(key, [[0] * 16] * 4)
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    ctx = a_nz[mx][c] + l_nz[r]
                    nz = _write_coeff_block(te, probs, 2, 0, ctx, pl[sb])
                    a_nz[mx][c] = l_nz[r] = int(nz)
    part1 = te.flush()
    if not part1:
        part1 = b"\x00"

    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    hdr += b"\x9d\x01\x2a"
    hdr += struct.pack("<HH", width, height)
    return hdr + part0 + part1


def wrap_webp(frame: bytes) -> bytes:
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
