"""Pure-numpy JPEG codec (ITU-T T.81): baseline AND progressive, 8-bit.

Decoder: full baseline parse (multi-table DQT with 8/16-bit
precision, SOF0, multi-table DHT, DRI + RSTn restart handling, SOS),
canonical huffman entropy decode, batched dequantize + de-zigzag +
orthonormal IDCT (one einsum over all blocks), generic
sampling-factor chroma upsample (4:4:4 / 4:2:2 / 4:2:0), BT.601
full-range YCbCr->RGB. Progressive (SOF2) decodes every scan shape
T.81 G.2 defines — spectral selection (Ss..Se bands), successive
approximation (Ah/Al), interleaved/non-interleaved DC first + DC
refinement, single-component AC first + AC refinement with EOB-run
coding — accumulating coefficients across scans into per-component
block grids before the same batched IDCT finish. Arithmetic coding
and 12-bit precision raise the declared NotImplementedError.

Encoder: the matching baseline writer (encode_jpeg) — IJG-style
quality-scaled Annex K quantization tables, per-image
frequency-derived canonical huffman tables (length-limited to 16 bits
via the T.81 K.2 BITS adjustment with a reserved code point so the
all-ones pattern is never assigned) embedded via DHT, optional 4:2:0
chroma box-downsampling, interleaved MCU scan with byte stuffing —
plus a progressive writer (encode_jpeg_progressive) emitting the
classic IJG scan script with per-scan huffman tables; it reorders the
SAME coefficients, so progressive decode equals baseline decode
pixel-for-pixel on identical input/quality (pinned by test).

Entropy (de)coding walks symbols in Python — fine for the small
test/feature payloads this tier handles; the DCT, quantization and
color-convert stages are batched numpy over all blocks at once. The
reference repo has no multimodal surface at all (SURVEY §2.8): this
module closes the north-rule extension's last stubbed codec tier.
"""

from __future__ import annotations

import heapq

import numpy as np

# ---------------------------------------------------------------------------
# shared constants


def _zigzag() -> np.ndarray:
    """k-th zigzag coefficient's flat (row-major) index, generated
    rather than typed: anti-diagonal s=i+j, even diagonals walk
    up-right (row descending), odd ones down-left."""
    pos = sorted(
        ((i + j, i if (i + j) % 2 else -i, i, j)
         for i in range(8) for j in range(8))
    )
    return np.array([i * 8 + j for _, _, i, j in pos], dtype=np.int64)


_ZZ = _zigzag()
_UNZZ = np.argsort(_ZZ)  # natural flat index -> zigzag position


def _dct8() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: coef = C @ X @ C.T,
    X = C.T @ coef @ C. DC scale is sum/8 = 8*mean, the convention the
    Annex K quantization tables assume."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) * 0.5
    c[0] *= 1 / np.sqrt(2.0)
    return c


_C8 = _dct8()

# Annex K.1/K.2 base quantization tables (luminance / chrominance)
_QBASE_L = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QBASE_C = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _quality_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex K table, clipped to
    the 8-bit DQT range."""
    q = min(max(int(quality), 1), 100)
    s = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """MSB-first reader over destuffed entropy bytes, via one
    unpackbits (numpy) so per-bit access is an index bump."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("jpeg: entropy stream exhausted mid-block")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        if self.pos + k > len(self.bits):
            raise ValueError("jpeg: entropy stream exhausted mid-block")
        v = 0
        for b in self.bits[self.pos:self.pos + k]:
            v = (v << 1) | int(b)
        self.pos += k
        return v


# ---------------------------------------------------------------------------
# huffman tables


def _build_huffman(freqs: np.ndarray) -> tuple[list[int], list[int], dict]:
    """Frequency-derived canonical JPEG huffman table.

    Returns (bits[1..16] histogram, huffval symbol list, sym->(len,
    code) dict). A reserved pseudo-symbol (freq 1) participates in the
    tree and is dropped from the LONGEST length afterwards, so the
    numerically largest (all-ones) code at max depth is never assigned
    to a real symbol — the T.81 K.2 discipline. Lengths beyond 16 are
    folded down with the standard BITS adjustment."""
    syms = [s for s in range(256) if freqs[s] > 0]
    heap: list[tuple[int, int, list[int]]] = [
        (int(freqs[s]), s, [s]) for s in syms
    ]
    heap.append((1, 256, [256]))  # reserved code point
    heapq.heapify(heap)
    depth = {s: 0 for _, s, _ in heap}
    while len(heap) > 1:
        f1, s1, l1 = heapq.heappop(heap)
        f2, s2, l2 = heapq.heappop(heap)
        for s in l1 + l2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(s1, s2), l1 + l2))
    maxlen = max(depth.values()) if depth else 1
    bits = [0] * (max(maxlen, 16) + 2)
    for s in depth:
        bits[max(depth[s], 1)] += 1
    i = len(bits) - 1
    while i > 16:  # T.81 K.2 Adjust_BITS
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    bits = bits[:17]
    k = 16
    while bits[k] == 0:
        k -= 1
    bits[k] -= 1  # drop the reserved (all-ones) slot

    order = sorted(syms, key=lambda s: (depth[s], -int(freqs[s]), s))
    huffval: list[int] = []
    codes: dict[int, tuple[int, int]] = {}
    it = iter(order)
    code = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            s = next(it)
            huffval.append(s)
            codes[s] = (length, code)
            code += 1
        code <<= 1
    return bits[1:17], huffval, codes


def _decode_table(bits: list[int], huffval: list[int]) -> dict:
    """(length, code) -> symbol map from a DHT segment's canonical
    (BITS, HUFFVAL) spec."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(reader: _BitReader, table: dict) -> int:
    length = 0
    code = 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code in entropy stream")


def _extend(bits_val: int, size: int) -> int:
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, size-bit pattern)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return (s, v) if v > 0 else (s, v + (1 << s) - 1)


# ---------------------------------------------------------------------------
# color + layout helpers


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _plane_to_blocks(plane: np.ndarray, mcus_y: int, mcus_x: int,
                     v: int, h: int) -> np.ndarray:
    """Padded plane -> [n_blocks, 8, 8] in interleaved MCU order
    (mcu_y, mcu_x, vb, hb)."""
    return (
        plane.reshape(mcus_y, v, 8, mcus_x, h, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1, 8, 8)
    )


def _blocks_to_plane(blocks: np.ndarray, mcus_y: int, mcus_x: int,
                     v: int, h: int) -> np.ndarray:
    return (
        blocks.reshape(mcus_y, mcus_x, v, h, 8, 8)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(mcus_y * v * 8, mcus_x * h * 8)
    )


def _pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    return np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                  mode="edge")


# ---------------------------------------------------------------------------
# encoder


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: str = "444") -> bytes:
    """Baseline JFIF encoder for uint8 (H,W,3) RGB or (H,W) grayscale.

    subsample: "444" (one block per component per MCU) or "420"
    (2x2-box-averaged chroma, 4 Y blocks per MCU)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    H, W = img.shape[:2]
    if H == 0 or W == 0:
        raise ValueError("encode_jpeg: empty image")
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsample {subsample!r}")
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(img)
        if subsample == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[:, :, 0]]
        if subsample == "420":
            ph = -(-H // 2) * 2
            pw = -(-W // 2) * 2
            for c in (1, 2):
                p = _pad_edge(ycc[:, :, c], ph, pw)
                planes.append(
                    (p[0::2, 0::2] + p[0::2, 1::2]
                     + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
                )
        else:
            planes += [ycc[:, :, 1], ycc[:, :, 2]]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))

    qt = [_quality_table(_QBASE_L, quality)]
    if not gray:
        qt.append(_quality_table(_QBASE_C, quality))

    # per component: pad plane to its MCU grid, DCT + quantize + zigzag
    comp_zz: list[np.ndarray] = []
    for ci, ((h, v), plane) in enumerate(zip(samp, planes)):
        ph = mcus_y * v * 8
        pw = mcus_x * h * 8
        plane = _pad_edge(plane, ph, pw) - 128.0
        blocks = _plane_to_blocks(plane, mcus_y, mcus_x, v, h)
        coef = np.einsum("ij,njk,kl->nil", _C8, blocks, _C8.T)
        q = qt[0 if ci == 0 else 1].reshape(8, 8)
        zz = np.round(coef / q).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        comp_zz.append(zz)

    # interleaved MCU symbol stream, two passes (freqs then bits)
    ncomp = len(planes)
    per_mcu = [h * v for h, v in samp]
    n_mcus = mcus_y * mcus_x

    def scan(emit_dc, emit_ac):
        pred = [0] * ncomp
        ptr = [0] * ncomp
        for _m in range(n_mcus):
            for ci in range(ncomp):
                for _b in range(per_mcu[ci]):
                    zz = comp_zz[ci][ptr[ci]]
                    ptr[ci] += 1
                    dc = int(zz[0])
                    s, mag = _magnitude(dc - pred[ci])
                    pred[ci] = dc
                    emit_dc(ci, s, mag)
                    run = 0
                    last = 63
                    while last > 0 and zz[last] == 0:
                        last -= 1
                    for k in range(1, last + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            emit_ac(ci, 0xF0, 0, 0)  # ZRL
                            run -= 16
                        s, mag = _magnitude(v)
                        emit_ac(ci, (run << 4) | s, s, mag)
                        run = 0
                    if last < 63:
                        emit_ac(ci, 0x00, 0, 0)  # EOB

    n_tab = 1 if gray else 2
    dc_freq = np.zeros((n_tab, 256), np.int64)
    ac_freq = np.zeros((n_tab, 256), np.int64)
    scan(lambda ci, s, mag: dc_freq.__setitem__(
             (min(ci, 1), s), dc_freq[min(ci, 1), s] + 1),
         lambda ci, sym, s, mag: ac_freq.__setitem__(
             (min(ci, 1), sym), ac_freq[min(ci, 1), sym] + 1))
    dc_tabs = [_build_huffman(dc_freq[t]) for t in range(n_tab)]
    ac_tabs = [_build_huffman(ac_freq[t]) for t in range(n_tab)]

    w = _BitWriter()

    def emit_dc(ci, s, mag):
        length, code = dc_tabs[min(ci, 1)][2][s]
        w.write(code, length)
        w.write(mag, s)

    def emit_ac(ci, sym, s, mag):
        length, code = ac_tabs[min(ci, 1)][2][sym]
        w.write(code, length)
        w.write(mag, s)

    scan(emit_dc, emit_ac)
    w.flush()

    # ---- container
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"  # minimal APP0
    for ti, q in enumerate(qt):
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([ti])
        out += bytes(int(x) for x in q[_ZZ])  # stored in zigzag order
    out += b"\xff\xc0" + (8 + 3 * ncomp).to_bytes(2, "big") + bytes([8])
    out += H.to_bytes(2, "big") + W.to_bytes(2, "big") + bytes([ncomp])
    for ci, (h, v) in enumerate(samp):
        out += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, (bits, huffval, _) in enumerate(tabs):
            out += b"\xff\xc4" + (19 + len(huffval)).to_bytes(2, "big")
            out += bytes([(tc << 4) | ti]) + bytes(bits) + bytes(huffval)
    out += b"\xff\xda" + (6 + 2 * ncomp).to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else min(ci, 1)
        out += bytes([ci + 1, (t << 4) | t])
    out += bytes([0, 63, 0])
    out += w.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsample: str = "444") -> bytes:
    """Progressive (SOF2) JFIF encoder for uint8 (H,W,3) RGB or (H,W)
    grayscale, using the classic IJG scan script (interleaved DC with
    one point-transform level, per-component spectral AC bands, then
    DC/AC successive-approximation refinement passes). Coefficients
    are identical to `encode_jpeg`'s — progressive only reorders the
    entropy stream — so decode_jpeg(progressive) must equal
    decode_jpeg(baseline) pixel-for-pixel on the same input/quality.
    Per-scan frequency-derived huffman tables ship in a DHT before
    each SOS; AC scans carry EOB-run coding, refinement scans carry
    correction bits (T.81 G.1.2 / the libjpeg control flow)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects uint8")
    gray = img.ndim == 2
    H, W = img.shape[:2]
    if H == 0 or W == 0:
        raise ValueError("encode_jpeg_progressive: empty image")
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsample {subsample!r}")
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(img)
        samp = [(2, 2), (1, 1), (1, 1)] if subsample == "420" \
            else [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[:, :, 0]]
        if subsample == "420":
            ph = -(-H // 2) * 2
            pw = -(-W // 2) * 2
            for c in (1, 2):
                p = _pad_edge(ycc[:, :, c], ph, pw)
                planes.append(
                    (p[0::2, 0::2] + p[0::2, 1::2]
                     + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
                )
        else:
            planes += [ycc[:, :, 1], ycc[:, :, 2]]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))

    qt = [_quality_table(_QBASE_L, quality)]
    if not gray:
        qt.append(_quality_table(_QBASE_C, quality))

    # per component: coefficient rows in BLOCK-RASTER order (by, bx)
    # over the full MCU-padded grid + the exact raster dims
    comp_zz: list[np.ndarray] = []
    dims: list[tuple[int, int, int, int]] = []
    for ci, ((h, v), plane) in enumerate(zip(samp, planes)):
        bh_full, bw_full = mcus_y * v, mcus_x * h
        plane = _pad_edge(plane, bh_full * 8, bw_full * 8) - 128.0
        blocks = (plane.reshape(bh_full, 8, bw_full, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        coef = np.einsum("ij,njk,kl->nil", _C8, blocks, _C8.T)
        q = qt[0 if ci == 0 else 1].reshape(8, 8)
        zz = np.round(coef / q).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        comp_zz.append(zz)
        ch = -(-H * v // vmax)
        cw = -(-W * h // hmax)
        dims.append((bh_full, bw_full, -(-ch // 8), -(-cw // 8)))

    ncomp = len(planes)
    if gray:
        scans = [([0], 0, 0, 0, 1),
                 ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                 ([0], 1, 63, 2, 1),
                 ([0], 0, 0, 1, 0),
                 ([0], 1, 63, 1, 0)]
    else:
        scans = [([0, 1, 2], 0, 0, 0, 1),
                 ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1),
                 ([1], 1, 63, 0, 1),
                 ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                 ([0, 1, 2], 0, 0, 1, 0),
                 ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0),
                 ([0], 1, 63, 1, 0)]

    def dc_block_order(comp_list):
        """(ci, flat raster index) sequence for a DC scan."""
        if len(comp_list) > 1:
            for m in range(mcus_y * mcus_x):
                my, mx = divmod(m, mcus_x)
                for ci in comp_list:
                    h, v = samp[ci]
                    bw_full = dims[ci][1]
                    for vb in range(v):
                        for hb in range(h):
                            yield ci, (my * v + vb) * bw_full \
                                + (mx * h + hb)
        else:
            ci = comp_list[0]
            bh_full, bw_full, bh, bw = dims[ci]
            for b in range(bh * bw):
                by, bx = divmod(b, bw)
                yield ci, by * bw_full + bx

    def run_scan(comp_list, ss, se, ah, al, emit_sym, emit_bits):
        """Emit one scan's symbol/bit stream through the callbacks
        (pass 1: frequency counting, pass 2: entropy writing)."""
        if ss == 0:  # DC scan
            if ah == 0:
                pred = {ci: 0 for ci in comp_list}
                for ci, bi in dc_block_order(comp_list):
                    val = int(comp_zz[ci][bi][0]) >> al
                    s, mag = _magnitude(val - pred[ci])
                    pred[ci] = val
                    emit_sym(0, min(ci, 1), s)
                    emit_bits(mag, s)
            else:  # DC refinement: raw bits, no huffman
                for ci, bi in dc_block_order(comp_list):
                    emit_bits((int(comp_zz[ci][bi][0]) >> al) & 1, 1)
            return
        # AC scan: single component
        ci = comp_list[0]
        t_no = min(ci, 1)
        bh_full, bw_full, bh, bw = dims[ci]
        state = {"eobrun": 0, "be": []}

        def flush_eobrun():
            e = state["eobrun"]
            if e > 0:
                nb = e.bit_length() - 1
                emit_sym(1, t_no, nb << 4)
                emit_bits(e - (1 << nb), nb)
                for bit in state["be"]:
                    emit_bits(bit, 1)
                state["eobrun"] = 0
                state["be"] = []

        for b in range(bh * bw):
            by, bx = divmod(b, bw)
            zz = comp_zz[ci][by * bw_full + bx]
            if ah == 0:  # AC first: sign-magnitude point transform
                r = 0
                any_left = False
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = (v >> al) if v >= 0 else -((-v) >> al)
                    if t == 0:
                        r += 1
                        continue
                    flush_eobrun()
                    while r > 15:
                        emit_sym(1, t_no, 0xF0)
                        r -= 16
                    s, mag = _magnitude(t)
                    emit_sym(1, t_no, (r << 4) | s)
                    emit_bits(mag, s)
                    r = 0
                    any_left = True
                if r > 0 or not any_left:
                    state["eobrun"] += 1
                    if state["eobrun"] == 0x7FFF:
                        flush_eobrun()
            else:  # AC refinement
                tvals = []
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    tvals.append((abs(v) >> al, v > 0))
                eobpos = -1
                for j, (t, _pos) in enumerate(tvals):
                    if t == 1:
                        eobpos = j
                r = 0
                br: list[int] = []
                for j, (t, pos) in enumerate(tvals):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and j <= eobpos:
                        flush_eobrun()
                        emit_sym(1, t_no, 0xF0)
                        r -= 16
                        for bit in br:
                            emit_bits(bit, 1)
                        br = []
                    if t > 1:  # already significant: correction bit
                        br.append(t & 1)
                        continue
                    flush_eobrun()
                    emit_sym(1, t_no, (r << 4) | 1)
                    emit_bits(1 if pos else 0, 1)
                    for bit in br:
                        emit_bits(bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    state["eobrun"] += 1
                    state["be"].extend(br)
                    if state["eobrun"] == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()

    # ---- container
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"
    for ti, q in enumerate(qt):
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([ti])
        out += bytes(int(x) for x in q[_ZZ])
    out += b"\xff\xc2" + (8 + 3 * ncomp).to_bytes(2, "big") + bytes([8])
    out += H.to_bytes(2, "big") + W.to_bytes(2, "big") + bytes([ncomp])
    for ci, (h, v) in enumerate(samp):
        out += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])

    for comp_list, ss, se, ah, al in scans:
        # pass 1: per-table-class symbol frequencies for this scan
        tabs_needed = (ss == 0 and ah == 0) or ss > 0
        freqs: dict[tuple[int, int], np.ndarray] = {}

        def count_sym(tc, t_no, sym, freqs=freqs):
            f = freqs.setdefault((tc, t_no), np.zeros(256, np.int64))
            f[sym] += 1

        run_scan(comp_list, ss, se, ah, al, count_sym,
                 lambda v, nb: None)
        tables: dict[tuple[int, int], tuple] = {}
        if tabs_needed:
            for key, f in freqs.items():
                tables[key] = _build_huffman(f)
            for (tc, t_no), (bits, huffval, _codes) in sorted(
                    tables.items()):
                out += b"\xff\xc4" + (19 + len(huffval)).to_bytes(2, "big")
                out += bytes([(tc << 4) | t_no]) + bytes(bits) \
                    + bytes(huffval)
        # SOS header
        ns = len(comp_list)
        out += b"\xff\xda" + (6 + 2 * ns).to_bytes(2, "big") + bytes([ns])
        for ci in comp_list:
            t_no = min(ci, 1)
            td = t_no if (ss == 0 and ah == 0) else 0
            ta = t_no if ss > 0 else 0
            out += bytes([ci + 1, (td << 4) | ta])
        out += bytes([ss, se, (ah << 4) | al])
        # pass 2: entropy-coded data
        w = _BitWriter()

        def write_sym(tc, t_no, sym, tables=tables, w=w):
            length, code = tables[(tc, t_no)][2][sym]
            w.write(code, length)

        run_scan(comp_list, ss, se, ah, al, write_sym,
                 lambda v, nb, w=w: w.write(v, nb))
        w.flush()
        out += w.buf
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def _destuff_split_pos(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy bytes from `start`: drop 0xFF00 stuffing, split at RSTn,
    stop at any other marker. Returns (segments, index of the 0xFF of
    the terminating marker) so a multi-scan (progressive) parse can
    resume the marker loop after the entropy data."""
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            m = data[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _destuff_split(data: bytes, start: int) -> list[bytes]:
    return _destuff_split_pos(data, start)[0]


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline OR progressive JPEG -> uint8 (H, W, C) array (C=1
    grayscale, 3 RGB). Baseline (SOF0/1) decodes in one scan pass;
    progressive (SOF2) accumulates coefficients across every scan
    (spectral selection Ss..Se, successive approximation Ah/Al, DC
    first/refine, AC first/refine with EOB-run coding) into
    per-component block grids, then runs the same batched
    dequantize + IDCT + upsample finish as baseline."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart = 0
    frame = None
    progressive = False
    prog = None  # per-component coefficient grids + dims
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        m = payload[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        body = payload[i + 4:i + 2 + seg_len]
        if m == 0xDB:  # DQT — possibly several tables
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                j += 1
                if pq == 0:
                    vals = np.frombuffer(body[j:j + 64], np.uint8) \
                        .astype(np.int64)
                    j += 64
                else:
                    vals = np.frombuffer(body[j:j + 128], ">u2") \
                        .astype(np.int64)
                    j += 128
                nat = np.empty(64, np.int64)
                nat[_ZZ] = vals  # stored zigzag -> natural order
                qtabs[tq] = nat
        elif m == 0xC4:  # DHT — possibly several tables
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1:j + 17])
                cnt = sum(bits)
                huffval = list(body[j + 17:j + 17 + cnt])
                htabs[(tc, th)] = _decode_table(bits, huffval)
                j += 17 + cnt
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            H = int.from_bytes(body[1:3], "big")
            W = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (H, W, comps)
            if m == 0xC2:
                progressive = True
                prog = _prog_state(H, W, comps)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: arithmetic/lossless/hierarchical modes are outside "
                "this codec — SOF0/SOF1/SOF2 decode in-container"
            )
        elif m == 0xDD:  # DRI
            restart = int.from_bytes(body[:2], "big")
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            sel = {}
            order = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c:3 + 2 * c]
                sel[cid] = (tt >> 4, tt & 15)
                order.append(cid)
            H, W, comps = frame
            if progressive:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                aa = body[3 + 2 * ns]
                ah, al = aa >> 4, aa & 15
                segments, end = _destuff_split_pos(
                    payload, i + 2 + seg_len)
                _decode_scan_prog(prog, comps, order, sel, htabs,
                                  restart, segments, ss, se, ah, al)
                i = end
                continue
            if ns != len(comps):
                raise NotImplementedError(
                    "jpeg: non-interleaved multi-scan baseline not supported"
                )
            segments = _destuff_split(payload, i + 2 + seg_len)
            return _decode_scan(H, W, comps, sel, qtabs, htabs,
                                restart, segments)
        i += 2 + seg_len
    if progressive and prog is not None and prog["n_scans"] > 0:
        return _finish_prog(prog, frame, qtabs)
    raise ValueError("jpeg: no SOS marker found")


def _prog_state(H: int, W: int, comps) -> dict:
    """Persistent progressive-decode state: one natural-width int32
    coefficient grid per component, in the component's FULL
    (MCU-padded) block raster, plus both the padded and the exact
    per-component block dims (non-interleaved scans walk the exact
    raster; interleaved DC scans walk the MCU grid)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    st = {
        "hmax": hmax, "vmax": vmax,
        "mcus_x": mcus_x, "mcus_y": mcus_y,
        "grids": {}, "dims": {}, "n_scans": 0,
    }
    for cid, h, v, _tq in comps:
        bw_full, bh_full = mcus_x * h, mcus_y * v
        cw = -(-W * h // hmax)
        ch = -(-H * v // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        st["grids"][cid] = np.zeros((bh_full * bw_full, 64), np.int32)
        st["dims"][cid] = (bh_full, bw_full, bh, bw)
    return st


def _decode_scan_prog(st, comps, order, sel, htabs, restart, segments,
                      ss, se, ah, al) -> None:
    """One progressive scan (T.81 G.2): DC first/refine (interleaved
    or single-component), AC first/refine (single-component only, per
    spec) with EOB-run coding. Coefficients accumulate into the
    component grids in zigzag position."""
    st["n_scans"] += 1
    byid = {c[0]: c for c in comps}
    seg_i = 0
    reader = _BitReader(segments[0])

    def next_segment():
        nonlocal seg_i, reader
        seg_i += 1
        if seg_i >= len(segments):
            raise ValueError("jpeg: missing restart segment")
        reader = _BitReader(segments[seg_i])

    if ss == 0:  # DC scan (se must be 0 per spec)
        if se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")
        ncomp = len(order)
        pred = {cid: 0 for cid in order}
        if ncomp > 1:
            # interleaved MCU walk over the full padded grid
            n_mcus = st["mcus_y"] * st["mcus_x"]
            for m in range(n_mcus):
                if restart and m and m % restart == 0:
                    next_segment()
                    pred = {cid: 0 for cid in order}
                my, mx = divmod(m, st["mcus_x"])
                for cid in order:
                    _, h, v, _tq = byid[cid]
                    bw_full = st["dims"][cid][1]
                    for vb in range(v):
                        for hb in range(h):
                            bi = (my * v + vb) * bw_full + (mx * h + hb)
                            _dc_unit(st["grids"][cid], bi, reader,
                                     htabs, sel[cid], pred, cid, ah, al)
        else:
            cid = order[0]
            bh_full, bw_full, bh, bw = st["dims"][cid]
            nb = bh * bw
            for b in range(nb):
                if restart and b and b % restart == 0:
                    next_segment()
                    pred = {cid: 0}
                by, bx = divmod(b, bw)
                bi = by * bw_full + bx
                _dc_unit(st["grids"][cid], bi, reader, htabs,
                         sel[cid], pred, cid, ah, al)
        return

    # AC scan: exactly one component (T.81 requires ns=1 when Ss>0)
    if len(order) != 1:
        raise ValueError("jpeg: progressive AC scan must have ns=1")
    cid = order[0]
    grid = st["grids"][cid]
    bh_full, bw_full, bh, bw = st["dims"][cid]
    ac = htabs[(1, sel[cid][1])]
    eobrun = 0
    nb = bh * bw
    for b in range(nb):
        if restart and b and b % restart == 0:
            next_segment()
            eobrun = 0
        by, bx = divmod(b, bw)
        zz = grid[by * bw_full + bx]
        if ah == 0:
            eobrun = _ac_first_unit(zz, reader, ac, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_unit(zz, reader, ac, ss, se, al, eobrun)


def _dc_unit(grid, bi, reader, htabs, tsel, pred, cid, ah, al) -> None:
    zz = grid[bi]
    if ah == 0:  # first DC scan: huffman diff of (coef >> Al)
        dc_tab = htabs[(0, tsel[0])]
        s = _read_symbol(reader, dc_tab)
        pred[cid] += _extend(reader.take(s), s)
        zz[0] = pred[cid] << al
    else:  # refinement: one raw bit
        if reader.bit():
            zz[0] = int(zz[0]) | (1 << al)


def _ac_first_unit(zz, reader, ac, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(reader, ac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.take(r)
            break
        k += r
        if k > se:
            raise ValueError("jpeg: AC run past band end")
        zz[k] = _extend(reader.take(s), s) << al
        k += 1
    return eobrun


def _ac_refine_unit(zz, reader, ac, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement (T.81 G.2 / the classic
    libjpeg control flow): newly-significant coefficients arrive as
    ±2^Al; every already-nonzero coefficient crossed on the way emits
    one correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(reader, ac)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.take(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: AC refine size != 1")
                val = p1 if reader.bit() else -p1
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if reader.bit() and (abs(c) & p1) == 0:
                        zz[k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        if val:
                            zz[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0:
                if reader.bit() and (abs(c) & p1) == 0:
                    zz[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _finish_prog(st, frame, qtabs) -> np.ndarray:
    """Dequantize + batched IDCT + upsample the accumulated grids —
    the same finish as the baseline path, but over the component
    block-raster layout (row-major (by, bx)) instead of MCU order."""
    H, W, comps = frame
    hmax, vmax = st["hmax"], st["vmax"]
    planes = []
    for cid, h, v, tq in comps:
        bh_full, bw_full, _bh, _bw = st["dims"][cid]
        q = qtabs[tq]
        nat = (st["grids"][cid].astype(np.float64)[:, _UNZZ]
               * q.reshape(-1)).reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", _C8.T, nat, _C8) + 128.0
        plane = (spatial.reshape(bh_full, bw_full, 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(bh_full * 8, bw_full * 8))
        ch = -(-H * v // vmax)
        cw = -(-W * h // hmax)
        plane = plane[:ch, :cw]
        if v != vmax or h != hmax:
            plane = np.repeat(np.repeat(plane, vmax // v, axis=0),
                              hmax // h, axis=1)
        planes.append(plane[:H, :W])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255) \
            .astype(np.uint8)[:, :, None]
    if len(planes) == 3:
        return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    raise NotImplementedError(
        f"jpeg: {len(planes)}-component images unsupported")


def _decode_scan(H, W, comps, sel, qtabs, htabs, restart, segments):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    n_mcus = mcus_y * mcus_x
    ncomp = len(comps)
    blocks = [
        np.zeros((n_mcus * h * v, 64), np.int32) for _, h, v, _ in comps
    ]
    dc_t = [htabs[(0, sel[cid][0])] for cid, *_ in comps]
    ac_t = [htabs[(1, sel[cid][1])] for cid, *_ in comps]

    seg_i = 0
    reader = _BitReader(segments[0])
    pred = [0] * ncomp
    ptr = [0] * ncomp
    for m in range(n_mcus):
        if restart and m and m % restart == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("jpeg: missing restart segment")
            reader = _BitReader(segments[seg_i])
            pred = [0] * ncomp
        for ci, (_, h, v, _) in enumerate(comps):
            for _b in range(h * v):
                zz = blocks[ci][ptr[ci]]
                s = _read_symbol(reader, dc_t[ci])
                pred[ci] += _extend(reader.take(s), s)
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _read_symbol(reader, ac_t[ci])
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("jpeg: AC run past block end")
                    zz[k] = _extend(reader.take(s), s)
                    k += 1
                ptr[ci] += 1

    planes = []
    for ci, (_, h, v, tq) in enumerate(comps):
        q = qtabs[tq]
        # de-zigzag FIRST (blocks hold zigzag-ordered coefficients),
        # then dequantize with the natural-order table
        nat = (blocks[ci].astype(np.float64)[:, _UNZZ] * q.reshape(-1)) \
            .reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", _C8.T, nat, _C8) + 128.0
        plane = _blocks_to_plane(spatial, mcus_y, mcus_x, v, h)
        ch = -(-H * v // vmax)
        cw = -(-W * h // hmax)
        plane = plane[:ch, :cw]
        if v != vmax or h != hmax:
            plane = np.repeat(np.repeat(plane, vmax // v, axis=0),
                              hmax // h, axis=1)
        planes.append(plane[:H, :W])
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255) \
            .astype(np.uint8)[:, :, None]
    if ncomp == 3:
        return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    raise NotImplementedError(f"jpeg: {ncomp}-component images unsupported")
