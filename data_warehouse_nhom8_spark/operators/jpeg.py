"""Baseline JPEG codec, pure Python/numpy (no PIL/opencv in this
environment).

Decoder: baseline sequential DCT (SOF0/SOF1) AND progressive (SOF2,
round 8: spectral selection + successive approximation, EOB runs,
correction bits, inter-scan DHT/DQT/DRI) — DQT/DHT/SOF/SOS/DRI
parsing, arbitrary Huffman tables, byte destuffing, restart markers,
any sampling factors whose h/v divide the maxima (4:4:4, 4:2:2,
4:2:0), grayscale or YCbCr, nearest-neighbor chroma upsampling,
float IDCT via the orthonormal DCT-II basis. Arithmetic coding and
hierarchical/lossless SOFs raise NotImplementedError.

Encoder: the roundtrip twin the tests need — baseline 4:4:4, 4:2:0,
4:2:2 or grayscale, optional restart markers, fixed quant step
(default 2: flat 8x8 blocks roundtrip EXACTLY, since their only
nonzero coefficient is the always-even DC), simple canonical Huffman
tables (DC: 12 symbols at 4 bits; AC: the 162 standard run/size
symbols at 8 bits — legal, suboptimal, tiny to declare); plus a
PROGRESSIVE encoder (`encode_jpeg_progressive`) whose streams must
decode bit-identically to the baseline encoder's (both quantize the
same way — the strongest cross-check the tests gate). The decoder
takes the tables from the DHT segment, so it reads real-world JPEGs
with the standard Annex-K tables just the same; every decoder path
(samplings, grayscale, restarts, scan shapes, rejects) is exercised
by encoder-generated fixtures in tests.

This is the engine-side codec for `operators.multimodal._decode_image`
(SURVEY.md §2k X4); the reference stack has no image path at all, so
there is no reference file to cite — the format is ITU T.81.
"""

from __future__ import annotations

import numpy as np

# zigzag scan order: ZIGZAG[i] = natural (row-major) index of the i-th
# coefficient in transmission order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: forward F = A @ B @ A.T, inverse B = A.T @ F @ A
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# the standard AC run/size symbol order (ITU T.81 Annex K) — reused as
# the symbol list for the encoder's simple 8-bit canonical table
_AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol for a DHT-style (bits, vals) spec."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length), inverse of `_canonical_codes`."""
    return {v: (c, ln) for (ln, c), v in _canonical_codes(bits, vals).items()}


class _BitReader:
    __slots__ = ("d", "i", "b")

    def __init__(self, d: bytes):
        self.d, self.i, self.b = d, 0, 0

    def bit(self) -> int:
        try:
            v = (self.d[self.i] >> (7 - self.b)) & 1
        except IndexError:
            # truncated/malformed entropy data must surface through the
            # codec's ValueError contract, not a bare IndexError
            raise ValueError("truncated entropy stream") from None
        self.b += 1
        if self.b == 8:
            self.b, self.i = 0, self.i + 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude-category value extension (T.81 F.2.2.1)."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos, qt, hufftabs, dri = 2, {}, {}, 0
    frame, scan = None, None
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = d[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        ln = int.from_bytes(d[pos : pos + 2], "big")
        seg = d[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (one or more tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT (one or more tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                hufftabs[(tc, th)] = _canonical_codes(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise NotImplementedError(f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            dri = int.from_bytes(seg, "big")
        elif marker == 0xDA:  # SOS
            if frame is not None and frame.get("progressive"):
                # multi-scan path: hand the whole tail (from this SOS
                # marker) to the progressive decoder
                return _decode_progressive(d, pos - 2, qt, hufftabs, dri, frame)
            ns = seg[0]
            sel = {}
            for ci in range(ns):
                cid, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                sel[cid] = (tabs >> 4, tabs & 15)
            scan = pos + ln
            break
        pos += ln
    if frame is None or scan is None:
        raise ValueError("malformed JPEG: missing SOF/SOS")

    # destuff the entropy stream; split at restart markers
    segs, i = [bytearray()], scan
    while i < len(d):
        b = d[i]
        if b == 0xFF:
            nxt = d[i + 1] if i + 1 < len(d) else 0xD9
            if nxt == 0x00:
                segs[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytearray())
                i += 2
                continue
            break  # EOI or next header
        segs[-1].append(b)
        i += 1

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    reader, seg_idx, mcu_n = _BitReader(bytes(segs[0])), 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_n and mcu_n % dri == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("truncated entropy stream")
                reader = _BitReader(bytes(segs[seg_idx]))
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_t, ac_t = sel[c["id"]]
                dct = hufftabs[(0, dc_t)]
                act = hufftabs[(1, ac_t)]
                q = qt[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        t = _huff_decode(reader, dct)
                        diff = _extend(reader.bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        coeffs = np.zeros(64, np.float64)
                        coeffs[ZIGZAG] = zz * q
                        block = _A.T @ coeffs.reshape(8, 8) @ _A + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_n += 1

    return _finish_rgb(frame, planes, hmax, vmax)


def _finish_rgb(frame: dict, planes: dict, hmax: int, vmax: int) -> np.ndarray:
    """Upsample to full resolution (nearest), crop, color-convert —
    shared by the baseline and progressive paths."""
    full = []
    for c in frame["comps"]:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[: frame["h"], : frame["w"]])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder

_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12          # 12 DC categories at 4 bits
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8          # 162 AC symbols at 8 bits
_ENC_AC_VALS = list(_AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _prep_planes(arr: np.ndarray, subsample):
    """RGB → (planes, sampling factors, h, w) for the requested mode —
    shared by the baseline and progressive encoders."""
    mode = {False: "444", True: "420"}.get(subsample, subsample)
    if mode not in ("444", "420", "422", "gray"):
        raise ValueError(f"subsample mode {subsample!r}")
    arr = np.asarray(arr, np.float64)
    h, w = arr.shape[:2]
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if mode == "420":
        hpad, wpad = (h + 1) & ~1, (w + 1) & ~1
        cb = np.pad(cb, ((0, hpad - h), (0, wpad - w)), mode="edge")
        cr = np.pad(cr, ((0, hpad - h), (0, wpad - w)), mode="edge")
        cb = cb.reshape(hpad // 2, 2, wpad // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(hpad // 2, 2, wpad // 2, 2).mean(axis=(1, 3))
        samp = [(2, 2), (1, 1), (1, 1)]
    elif mode == "422":
        wpad = (w + 1) & ~1
        cb = np.pad(cb, ((0, 0), (0, wpad - w)), mode="edge")
        cr = np.pad(cr, ((0, 0), (0, wpad - w)), mode="edge")
        cb = cb.reshape(h, wpad // 2, 2).mean(axis=2)
        cr = cr.reshape(h, wpad // 2, 2).mean(axis=2)
        samp = [(2, 1), (1, 1), (1, 1)]
    elif mode == "gray":
        samp = [(1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    planes = [y] if mode == "gray" else [y, cb, cr]
    return planes, samp, h, w


def encode_jpeg(
    arr: np.ndarray,
    qstep: int = 2,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as baseline JPEG. 4:4:4 by default;
    `subsample=True` or "420" emits 4:2:0 (2x2-mean chroma), "422"
    emits 4:2:2 (horizontal-only 1x2 mean — exercises the decoder's
    anisotropic upsampling). With the default qstep=2, flat
    8x8-aligned blocks roundtrip exactly (DC = 8*(v-128) is always
    even; every AC coefficient is zero). `restart_interval` > 0 emits
    a DRI segment and RSTn markers every N MCUs (byte-aligned, DC
    predictors reset) — the camera-JPEG resync structure, exercising
    the decoder's segmented entropy stream."""
    planes, samp, h, w = _prep_planes(arr, subsample)
    q = np.full(64, qstep, np.int32)
    dc_enc = _encode_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _encode_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        )

    wr = _BitWriter()
    pred = [0] * len(planes)

    def put_block(plane, y0, x0, ci):
        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        coeffs = _A @ block @ _A.T
        zz = np.round(coeffs.reshape(64)[ZIGZAG] / q).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = _category(diff)
        code, ln = dc_enc[t]
        wr.write(code, ln)
        if t:
            wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
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
                code, ln = ac_enc[0xF0]  # ZRL
                wr.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_enc[(run << 4) | s]
            wr.write(code, ln)
            wr.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_enc[0x00]  # EOB
            wr.write(code, ln)

    mcu_n, total_mcus = 0, mcuy * mcux
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (plane, (sh, sv)) in enumerate(zip(padded, samp)):
                for v in range(sv):
                    for hh in range(sh):
                        put_block(
                            plane, (my * sv + v) * 8, (mx * sh + hh) * 8, ci
                        )
            mcu_n += 1
            if (
                restart_interval
                and mcu_n % restart_interval == 0
                and mcu_n < total_mcus
            ):
                wr.flush()  # byte-align before the marker
                wr.out += bytes(
                    [0xFF, 0xD0 + (mcu_n // restart_interval - 1) % 8]
                )
                pred[:] = [0] * len(planes)
    wr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0]) + bytes(q.astype(np.uint8).tolist()))
    ncomp = len(planes)
    sof = seg(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([ncomp])
        + b"".join(
            bytes([cid, (sh << 4) | sv, 0])
            for cid, (sh, sv) in zip((1, 2, 3), samp)
        ),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
    )
    sos = seg(
        0xDA,
        bytes([ncomp])
        + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3)[:ncomp])
        + bytes([0, 63, 0]),
    )
    dri = (
        seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    )
    return (
        b"\xff\xd8" + dqt + sof + dri + dht + sos + bytes(wr.out) + b"\xff\xd9"
    )


# ------------------------------------------------------- progressive decode
#
# ITU T.81 Annex G: spectral selection + successive approximation.
# Coefficients accumulate across scans in zigzag (transmission) order;
# DC scans may be interleaved, AC scans are single-component. EOB runs
# span blocks; refinement scans carry correction bits for every
# already-nonzero coefficient they pass over (including inside EOB
# runs). Reconstruction is one vectorized dequant+IDCT at the end.


def _ac_first(reader, blk, act, Ss, Se, Al, state) -> None:
    if state["eob"] > 0:
        state["eob"] -= 1
        return
    k = Ss
    while k <= Se:
        rs = _huff_decode(reader, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            state["eob"] = (1 << r) - 1 + (reader.bits(r) if r else 0)
            return
        k += r
        if k > Se:
            raise ValueError("malformed JPEG: AC band overrun")
        blk[k] = _extend(reader.bits(s), s) << Al
        k += 1


def _ac_refine(reader, blk, act, Ss, Se, Al, state) -> None:
    def corr(k: int) -> None:
        # correction bit: history low bits are zero, so an OR of the
        # new magnitude bit is an add toward larger magnitude
        if reader.bit():
            if blk[k] > 0:
                blk[k] += 1 << Al
            else:
                blk[k] -= 1 << Al

    k = Ss
    if state["eob"] > 0:
        state["eob"] -= 1
        while k <= Se:
            if blk[k]:
                corr(k)
            k += 1
        return
    while k <= Se:
        rs = _huff_decode(reader, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:  # EOBn: refine the rest of the band, then run
                state["eob"] = (1 << r) - 1 + (reader.bits(r) if r else 0)
                while k <= Se:
                    if blk[k]:
                        corr(k)
                    k += 1
                return
            cnt = 16  # ZRL: pass 16 zero-HISTORY positions
            while k <= Se and cnt:
                if blk[k]:
                    corr(k)
                else:
                    cnt -= 1
                k += 1
        else:
            if s != 1:
                raise ValueError("malformed JPEG: refinement size > 1")
            newval = (1 << Al) if reader.bit() else -(1 << Al)
            cnt = r  # r zero-history positions precede the new coef
            while k <= Se:
                if blk[k]:
                    corr(k)
                else:
                    if cnt == 0:
                        break
                    cnt -= 1
                k += 1
            if k > Se:
                raise ValueError("malformed JPEG: AC band overrun")
            blk[k] = newval
            k += 1


def _decode_progressive(
    d: bytes, pos: int, qt: dict, huff: dict, dri: int, frame: dict
) -> np.ndarray:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    for c in comps:
        c["bw_pad"], c["bh_pad"] = mcux * c["h"], mcuy * c["v"]
        # non-interleaved scans cover ceil(comp_size/8), NOT MCU-padded
        c["bw"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["bh"] = -(-(-(-h * c["v"] // vmax)) // 8)
    coefs = {
        c["id"]: np.zeros((c["bh_pad"], c["bw_pad"], 64), np.int32) for c in comps
    }
    byid = {c["id"]: c for c in comps}

    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        ln = int.from_bytes(d[pos : pos + 2], "big")
        seg = d[pos + 2 : pos + ln]
        if marker == 0xC4:  # DHT between scans
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                huff[(tc, th)] = _canonical_codes(bits, list(seg[i + 17 : i + 17 + n]))
                i += 17 + n
        elif marker == 0xDB:  # DQT between scans
            i = 0
            while i < len(seg):
                if seg[i] >> 4 != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[seg[i] & 15] = np.frombuffer(seg, np.uint8, 64, i + 1).astype(
                    np.int32
                )
                i += 65
        elif marker == 0xDD:
            dri = int.from_bytes(seg, "big")
        elif marker == 0xDA:
            ns = seg[0]
            sel = []
            for ci in range(ns):
                sel.append((seg[1 + 2 * ci], seg[2 + 2 * ci] >> 4, seg[2 + 2 * ci] & 15))
            Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            Ah, Al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            # T.81 G.1: a DC scan has Se=0; AC scans are single-
            # component with Ss>0. Anything else (e.g. a baseline
            # stream mislabeled SOF2) fails loud, never mis-decodes.
            if (Ss == 0) != (Se == 0) or Se > 63 or Ss > Se:
                raise ValueError("malformed progressive scan header")
            pos += ln
            # destuff this scan's entropy bytes, split at restarts
            segs, i = [bytearray()], pos
            while i < len(d):
                b = d[i]
                if b == 0xFF:
                    nxt = d[i + 1] if i + 1 < len(d) else 0xD9
                    if nxt == 0x00:
                        segs[-1].append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segs.append(bytearray())
                        i += 2
                        continue
                    break
                segs[-1].append(b)
                i += 1
            pos = i
            _decode_prog_scan(
                segs, sel, Ss, Se, Ah, Al, byid, coefs, huff, dri, mcux, mcuy
            )
            continue
        pos += ln

    # dequantize + IDCT, vectorized over all blocks per component
    planes = {}
    for c in comps:
        q = qt[c["tq"]].astype(np.float64)
        blk = coefs[c["id"]].astype(np.float64) * q
        nat = np.zeros_like(blk)
        nat[:, :, ZIGZAG] = blk
        nat = nat.reshape(blk.shape[0], blk.shape[1], 8, 8)
        sp = np.einsum("ij,abjk,kl->abil", _A.T, nat, _A) + 128.0
        planes[c["id"]] = sp.transpose(0, 2, 1, 3).reshape(
            blk.shape[0] * 8, blk.shape[1] * 8
        )
    return _finish_rgb(frame, planes, hmax, vmax)


def _decode_prog_scan(
    segs, sel, Ss, Se, Ah, Al, byid, coefs, huff, dri, mcux, mcuy
) -> None:
    pred = {cid: 0 for cid, _dc, _ac in sel}
    state = {"eob": 0, "seg": 0}
    reader = _BitReader(bytes(segs[0]))

    def next_segment():
        nonlocal reader
        state["seg"] += 1
        if state["seg"] >= len(segs):
            raise ValueError("truncated entropy stream")
        reader = _BitReader(bytes(segs[state["seg"]]))
        state["eob"] = 0
        for k in pred:
            pred[k] = 0

    # unit list: MCUs (interleaved DC) or single blocks (one component)
    if len(sel) == 1:
        cid, dc_t, ac_t = sel[0]
        c = byid[cid]
        units = [
            [(cid, by, bx, dc_t, ac_t)]
            for by in range(c["bh"])
            for bx in range(c["bw"])
        ]
    else:
        if Ss != 0:
            raise ValueError("malformed JPEG: interleaved AC scan")
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for cid, dc_t, ac_t in sel:
                    c = byid[cid]
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            unit.append(
                                (cid, my * c["v"] + v, mx * c["h"] + hh, dc_t, ac_t)
                            )
                units.append(unit)

    for n, unit in enumerate(units):
        if dri and n and n % dri == 0:
            next_segment()
        for cid, by, bx, dc_t, ac_t in unit:
            blk = coefs[cid][by, bx]
            if Ss == 0:
                if Ah == 0:  # DC first
                    t = _huff_decode(reader, huff[(0, dc_t)])
                    diff = _extend(reader.bits(t), t) if t else 0
                    pred[cid] += diff
                    blk[0] = pred[cid] << Al
                elif reader.bit():  # DC refinement: one bit per block
                    blk[0] = int(blk[0]) | (1 << Al)
            elif Ah == 0:
                _ac_first(reader, blk, huff[(1, ac_t)], Ss, Se, Al, state)
            else:
                _ac_refine(reader, blk, huff[(1, ac_t)], Ss, Se, Al, state)


# ------------------------------------------------------ progressive encode
#
# Fixture twin for the progressive decoder: spectral selection (two AC
# bands) + one successive-approximation level on DC and AC. Since both
# encoders quantize identically, decode(progressive(img)) must equal
# decode(baseline(img)) EXACTLY — the roundtrip gate in tests.

# progressive AC table: every (run<<4)|size symbol incl. EOBn (s=0,
# r=0..14) — 176 symbols, all at 8 bits (legal canonical, tiny)
_ENC_ACP_BITS = [0] * 7 + [176] + [0] * 8
_ENC_ACP_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


def encode_jpeg_progressive(
    arr: np.ndarray,
    qstep: int = 2,
    subsample: bool | str = False,
    spectral_split: int = 5,
    dc_al: int = 1,
    ac_al: int = 1,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as PROGRESSIVE JPEG (SOF2): an
    interleaved DC-first scan at Al=dc_al + DC refinement(s) to 0,
    then per component two spectral AC bands (1..spectral_split,
    spectral_split+1..63), each first at Al=ac_al and refined to 0 —
    exercising EOB runs, ZRL-in-refinement, and correction bits."""
    planes, samp, h, w = _prep_planes(arr, subsample)
    q = np.full(64, qstep, np.int64)
    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    zz = []  # per comp: (BH_pad, BW_pad, 64) quantized, zigzag order
    dims = []  # per comp: (bh, bw) NON-padded block dims for AC scans
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        BH, BW = ph // 8, pw // 8
        blocks = pp.reshape(BH, 8, BW, 8).transpose(0, 2, 1, 3) - 128.0
        co = np.einsum("ij,abjk,kl->abil", _A, blocks, _A.T).reshape(BH, BW, 64)
        zz.append(np.round(co[:, :, ZIGZAG] / q).astype(np.int64))
        dims.append((-(-(-(-h * sv // vmax)) // 8), -(-(-(-w * sh // hmax)) // 8)))

    dc_enc = _encode_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _encode_codes(_ENC_ACP_BITS, _ENC_ACP_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def sos(comp_ids: list[int], Ss: int, Se: int, Ah: int, Al: int) -> bytes:
        return seg(
            0xDA,
            bytes([len(comp_ids)])
            + b"".join(bytes([cid, 0x00]) for cid in comp_ids)
            + bytes([Ss, Se, (Ah << 4) | Al]),
        )

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(q.astype(np.uint8).tolist()))
    out += seg(
        0xC2,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([ncomp])
        + b"".join(
            bytes([cid, (sh << 4) | sv, 0])
            for cid, (sh, sv) in zip((1, 2, 3), samp)
        ),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + bytes([0x10]) + bytes(_ENC_ACP_BITS) + bytes(_ENC_ACP_VALS),
    )

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samp):
                    for v in range(sv):
                        for hh in range(sh):
                            yield ci, my * sv + v, mx * sh + hh

    # --- DC first (interleaved, point transform = arithmetic shift)
    for al in range(dc_al, dc_al - 1, -1):  # single first scan at Al=dc_al
        wr = _BitWriter()
        pred = [0] * ncomp
        for ci, by, bx in mcu_blocks():
            dc = int(zz[ci][by, bx, 0]) >> al
            diff = dc - pred[ci]
            pred[ci] = dc
            t = _category(diff)
            code, ln = dc_enc[t]
            wr.write(code, ln)
            if t:
                wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        wr.flush()
        out += sos(list(range(1, ncomp + 1)), 0, 0, 0, al) + bytes(wr.out)

    # --- DC refinements down to 0
    for al in range(dc_al - 1, -1, -1):
        wr = _BitWriter()
        for ci, by, bx in mcu_blocks():
            wr.write((int(zz[ci][by, bx, 0]) >> al) & 1, 1)
        wr.flush()
        out += sos(list(range(1, ncomp + 1)), 0, 0, al + 1, al) + bytes(wr.out)

    bands = [(1, spectral_split), (spectral_split + 1, 63)]

    def ac_first_scan(ci: int, Ss: int, Se: int, al: int) -> bytes:
        wr = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_enc[r << 4]
                wr.write(code, ln)
                if r:
                    wr.write(eobrun - (1 << r), r)
                eobrun = 0

        bh, bw = dims[ci]
        for by in range(bh):
            for bx in range(bw):
                band = zz[ci][by, bx, Ss : Se + 1]
                pt = np.sign(band) * (np.abs(band) >> al)
                nz = np.flatnonzero(pt)
                if nz.size == 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for k in range(int(nz[-1]) + 1):
                    v = int(pt[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[0xF0]
                        wr.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_enc[(run << 4) | s]
                    wr.write(code, ln)
                    wr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if int(nz[-1]) < Se - Ss:  # trailing zeros → EOB
                    eobrun += 1
        flush_eob()
        wr.flush()
        return sos([ci + 1], Ss, Se, 0, al) + bytes(wr.out)

    def ac_refine_scan(ci: int, Ss: int, Se: int, ah: int, al: int) -> bytes:
        wr = _BitWriter()
        eobrun = 0
        pending: list[int] = []

        def flush_eob():
            nonlocal eobrun, pending
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_enc[r << 4]
                wr.write(code, ln)
                if r:
                    wr.write(eobrun - (1 << r), r)
                for b in pending:
                    wr.write(b, 1)
                pending = []
                eobrun = 0

        bh, bw = dims[ci]
        for by in range(bh):
            for bx in range(bw):
                band = zz[ci][by, bx, Ss : Se + 1]
                absv = np.abs(band)
                hist = (absv >> ah) != 0
                now = (absv >> al) != 0
                newpos = [int(i) for i in np.flatnonzero(now & ~hist)]
                corr = [(int(a) >> al) & 1 for a in absv]
                if not newpos:
                    eobrun += 1
                    pending += [corr[i] for i in range(len(band)) if hist[i]]
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                idx = 0
                for nxt in newpos:
                    zeros = [
                        i for i in range(idx, nxt) if not hist[i]
                    ]  # zero-HISTORY positions before the new coef
                    r = len(zeros)
                    while r > 15:
                        boundary = zeros[len(zeros) - r + 15] + 1
                        code, ln = ac_enc[0xF0]
                        wr.write(code, ln)
                        for i in range(idx, boundary):
                            if hist[i]:
                                wr.write(corr[i], 1)
                        idx = boundary
                        r -= 16
                    code, ln = ac_enc[(r << 4) | 1]
                    wr.write(code, ln)
                    wr.write(1 if band[nxt] > 0 else 0, 1)
                    for i in range(idx, nxt):
                        if hist[i]:
                            wr.write(corr[i], 1)
                    idx = nxt + 1
                tail_hist = [i for i in range(idx, len(band)) if hist[i]]
                if idx < len(band):  # anything after the last new coef → EOB
                    eobrun += 1
                    pending += [corr[i] for i in tail_hist]
        flush_eob()
        wr.flush()
        return sos([ci + 1], Ss, Se, ah, al) + bytes(wr.out)

    for ci in range(ncomp):
        for Ss, Se in bands:
            out += ac_first_scan(ci, Ss, Se, ac_al)
    for ci in range(ncomp):
        for Ss, Se in bands:
            for al in range(ac_al - 1, -1, -1):
                out += ac_refine_scan(ci, Ss, Se, al + 1, al)
    return bytes(out + b"\xff\xd9")
