"""FLAC read/write — native C++ codec with a pure-Python fallback decoder.

The reference reads FLAC through soundfile/libsndfile
(`espnet2/fileio/sound_scp.py:44-49`) and dumps corpora as FLAC blobs
inside extended kaldi arks (`pyscripts/audio/format_wav_scp.py:152-160`).
This image has no FLAC library, so the codec lives in
`agacs_tpu/native/flac.cpp` (RFC 9639), lazily compiled like the sclite
aligner. Every decode is self-validated against the MD5 checksum FLAC
embeds in STREAMINFO.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False


def _native_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    base = os.path.join(os.path.dirname(__file__), "..", "native")
    src = os.path.join(base, "flac.cpp")
    so = os.path.join(base, "_flac.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.flac_probe.restype = ctypes.c_int
        lib.flac_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_char_p,
        ]
        lib.flac_decode.restype = ctypes.c_longlong
        lib.flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.flac_encode16.restype = ctypes.c_longlong
        lib.flac_encode16.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_longlong, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_longlong,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


class FlacError(ValueError):
    pass


def flac_info(data: bytes) -> dict:
    """STREAMINFO fields: sample_rate, channels, bps, total_samples, md5."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    p = 4
    while p + 4 <= len(data):
        hdr = data[p]
        blen = int.from_bytes(data[p + 1 : p + 4], "big")
        p += 4
        if (hdr & 0x7F) == 0:
            b = data[p : p + 34]
            if len(b) < 34:
                raise FlacError("truncated STREAMINFO")
            return {
                "sample_rate": (b[10] << 12) | (b[11] << 4) | (b[12] >> 4),
                "channels": ((b[12] >> 1) & 0x7) + 1,
                "bps": (((b[12] & 1) << 4) | (b[13] >> 4)) + 1,
                "total_samples": ((b[13] & 0x0F) << 32)
                | int.from_bytes(b[14:18], "big"),
                "md5": b[18:34],
                "frames_start": None,
            }
        p += blen
        if hdr & 0x80:
            break
    raise FlacError("no STREAMINFO block")


def decode_flac(
    data: bytes, verify_md5: bool = True, return_consumed: bool = False
):
    """FLAC bytes -> (int32 array (n, channels), sample_rate).

    With return_consumed=True also returns the stream's byte length —
    trailing bytes (e.g. the next entry of a concatenated ark) are ignored.
    Raises FlacError on malformed/truncated input or MD5 mismatch.
    """
    info = flac_info(data)
    n, ch, bps = info["total_samples"], info["channels"], info["bps"]
    lib = _native_lib()
    consumed = ctypes.c_longlong(0)
    if lib is not None:
        out = np.empty((n * ch,), np.int32)
        rc = lib.flac_decode(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.byref(consumed),
        )
        if rc == -2:
            raise FlacError("truncated FLAC stream")
        if rc < 0:
            raise FlacError("malformed FLAC stream")
        pcm = out[: rc * ch].reshape(-1, ch)
        consumed = consumed.value
    else:
        pcm, consumed = _decode_py(data, info, return_consumed=True)
    if verify_md5 and info["md5"] != b"\x00" * 16 and len(pcm) == n:
        if bps == 16:
            raw = pcm.astype("<i2").tobytes()
        elif bps == 8:
            raw = pcm.astype(np.int8).tobytes()
        elif bps == 24:
            le = pcm.astype("<i4").tobytes()
            raw = b"".join(le[i : i + 3] for i in range(0, len(le), 4))
        else:
            raw = None
        if raw is not None and hashlib.md5(raw).digest() != info["md5"]:
            raise FlacError("FLAC PCM MD5 mismatch (decoder bug or corrupt file)")
    if return_consumed:
        return pcm, info["sample_rate"], consumed
    return pcm, info["sample_rate"]


def encode_flac(pcm: np.ndarray, sample_rate: int) -> bytes:
    """int16 PCM (n,) or (n, channels<=2) -> FLAC bytes (fixed predictors)."""
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.dtype != np.int16:
        raise ValueError(f"encode_flac wants int16, got {pcm.dtype}")
    n, ch = pcm.shape
    inter = np.ascontiguousarray(pcm).reshape(-1)
    md5 = hashlib.md5(inter.astype("<i2").tobytes()).digest()
    lib = _native_lib()
    if lib is None:
        raise RuntimeError("native FLAC encoder unavailable (g++ missing?)")
    cap = 8192 + n * ch * 3  # worst case ≈ verbatim + headers
    out = np.empty((cap,), np.uint8)
    rc = lib.flac_encode16(
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n, ch, sample_rate, md5,
        out.ctypes.data_as(ctypes.c_char_p), cap,
    )
    if rc < 0:
        raise RuntimeError("FLAC encode failed (buffer too small?)")
    return out[:rc].tobytes()


def read_flac(path: str) -> tuple[np.ndarray, int]:
    """File path -> (float32 mono waveform in [-1, 1], sample_rate)."""
    with open(path, "rb") as f:
        data = f.read()
    pcm, sr = decode_flac(data)
    return pcm_to_float(pcm, flac_info(data)["bps"]), sr


def write_flac(path: str, data: np.ndarray, sr: int = 16000) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pcm16 = float_to_pcm16(data)
    with open(path, "wb") as f:
        f.write(encode_flac(pcm16, sr))


def pcm_to_float(pcm: np.ndarray, bps: int) -> np.ndarray:
    """(n, ch) int PCM -> float32 mono in [-1, 1] (channel mean)."""
    x = pcm.astype(np.float32) / float(1 << (bps - 1))
    return x.mean(axis=1) if x.ndim == 2 else x


def float_to_pcm16(data: np.ndarray) -> np.ndarray:
    x = np.clip(np.asarray(data, np.float32), -1.0, 1.0)
    return (x * 32767.0).astype(np.int16)


# ------------------------------------------------------- python fallback

class _BitReader:
    __slots__ = ("data", "n", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data) * 8
        self.pos = 0

    def bits(self, k: int) -> int:
        p = self.pos
        if p + k > self.n:
            raise FlacError("truncated FLAC stream")
        self.pos = p + k
        # gather the covering bytes, then shift out the slack
        start, end = p >> 3, (p + k + 7) >> 3
        v = int.from_bytes(self.data[start:end], "big")
        slack = (end << 3) - (p + k)
        return (v >> slack) & ((1 << k) - 1)

    def sbits(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if k and (v >> (k - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _read_residual_py(br: _BitReader, buf: list, blocksize: int, order: int):
    method = br.bits(2)
    if method > 1:
        raise FlacError("bad residual method")
    pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    po = br.bits(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise FlacError("bad partition order")
    for part in range(nparts):
        count = (blocksize >> po) - (order if part == 0 else 0)
        param = br.bits(pbits)
        if param == escape:
            raw = br.bits(5)
            buf.extend(br.sbits(raw) if raw else 0 for _ in range(count))
        else:
            for _ in range(count):
                q = br.unary()
                v = (q << param) | br.bits(param)
                buf.append((v >> 1) ^ -(v & 1))


_FIXED = {
    0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1],
}


def _decode_subframe_py(br: _BitReader, blocksize: int, bps: int) -> list:
    if br.bits(1) != 0:
        raise FlacError("bad subframe pad bit")
    stype = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = br.unary() + 1
    bps -= wasted
    if stype == 0:
        v = br.sbits(bps)
        buf = [v] * blocksize
    elif stype == 1:
        buf = [br.sbits(bps) for _ in range(blocksize)]
    elif (stype & 0x38) == 0x08 and (stype & 0x07) <= 4:
        order = stype & 0x07
        buf = [br.sbits(bps) for _ in range(order)]
        _read_residual_py(br, buf, blocksize, order)
        coef = _FIXED[order]
        for i in range(order, blocksize):
            buf[i] += sum(c * buf[i - j - 1] for j, c in enumerate(coef))
    elif stype & 0x20:
        order = (stype & 0x1F) + 1
        buf = [br.sbits(bps) for _ in range(order)]
        precision = br.bits(4) + 1
        if precision == 16:
            raise FlacError("invalid qlp precision")
        shift = br.sbits(5)
        coef = [br.sbits(precision) for _ in range(order)]
        _read_residual_py(br, buf, blocksize, order)
        for i in range(order, blocksize):
            acc = sum(c * buf[i - j - 1] for j, c in enumerate(coef))
            buf[i] += acc >> shift
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        buf = [v << wasted for v in buf]
    return buf


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_SAMPLESIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_py(data: bytes, info: dict, return_consumed: bool = False):
    """Reference-grade pure-Python frame decoder (slow; used when the
    native codec can't be built, and as a cross-check in tests)."""
    # locate first frame
    p = 4
    while True:
        hdr = data[p]
        blen = int.from_bytes(data[p + 1 : p + 4], "big")
        p += 4 + blen
        if hdr & 0x80:
            break
    br = _BitReader(data)
    br.pos = p * 8
    n, nch = info["total_samples"], info["channels"]
    out = np.empty((n, nch), np.int64)
    done = 0
    while done < n:
        if br.bits(14) != 0x3FFE:
            raise FlacError("lost frame sync")
        br.bits(2)  # reserved + blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        ss_code = br.bits(3)
        br.bits(1)
        first = br.bits(8)
        follow = 0
        m = 0x80
        while first & m:
            follow += 1
            m >>= 1
        for _ in range(max(follow - 1, 0)):
            br.bits(8)
        if bs_code == 6:
            blocksize = br.bits(8) + 1
        elif bs_code == 7:
            blocksize = br.bits(16) + 1
        else:
            blocksize = _BLOCKSIZES[bs_code]
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        br.bits(8)  # crc8
        channels = ch_code + 1 if ch_code < 8 else 2
        bps = info["bps"] if ss_code == 0 else _SAMPLESIZES[ss_code]
        chans = []
        for c in range(channels):
            sbps = bps + (
                1 if (ch_code == 8 and c == 1) or (ch_code == 9 and c == 0)
                or (ch_code == 10 and c == 1) else 0
            )
            chans.append(_decode_subframe_py(br, blocksize, sbps))
        br.align()
        br.bits(16)  # crc16
        if ch_code == 8:
            chans[1] = [l - s for l, s in zip(chans[0], chans[1])]
        elif ch_code == 9:
            chans[0] = [s + r for s, r in zip(chans[0], chans[1])]
        elif ch_code == 10:
            new0, new1 = [], []
            for m_, s in zip(chans[0], chans[1]):
                mid = (m_ << 1) | (s & 1)
                new0.append((mid + s) >> 1)
                new1.append((mid - s) >> 1)
            chans[0], chans[1] = new0, new1
        take = min(blocksize, n - done)
        for c in range(channels):
            out[done : done + take, c] = chans[c][:take]
        done += take
    if return_consumed:
        return out.astype(np.int32), br.pos >> 3
    return out.astype(np.int32)
