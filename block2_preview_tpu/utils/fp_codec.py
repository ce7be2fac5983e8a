"""Floating-point compression codec for MPS / integral storage.

TPU-native counterpart of the reference's bit-plane FP codec (reference
src/core/fp_codec.hpp: FPCodec :158, BitsCodec :94, CompressedVector :377,
CompressedVectorMT :539), used there to shrink disk-resident MPS tensors and
integrals (CLI `fp_cps_cutoff` parser.py:28, compressed_sparse_tensor_storage
allocator.hpp:422-424).

Scheme (chunked, vectorized numpy — no bit-by-bit loops):
  * split the array into fixed chunks;
  * per chunk, scale by the chunk's max |x| and quantize to b bits, where
    b is the smallest width meeting the absolute tolerance for that chunk
    (so dead chunks cost ~nothing and spiky chunks keep precision);
  * pack the integer planes into a uint64 bitstream with vectorized shifts.
Lossless mode (tol=0) stores the raw IEEE bits unchanged.

Guarantee: |decode(encode(x)) - x|_inf <= tol.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

CHUNK = 1024
_MAX_BITS = 52


def _pack_bits(vals: np.ndarray, bits: int) -> np.ndarray:
    """Pack unsigned ints (< 2^bits) into a dense uint64 stream."""
    n = len(vals)
    total = n * bits
    out = np.zeros((total + 63) // 64, dtype=np.uint64)
    pos = np.arange(n, dtype=np.uint64) * np.uint64(bits)
    word = (pos // np.uint64(64)).astype(np.int64)
    off = pos % np.uint64(64)
    v = vals.astype(np.uint64)
    lo = v << off
    np.bitwise_or.at(out, word, lo)
    # spillover into the next word
    spill = off > np.uint64(64 - bits)
    if np.any(spill):
        hi = v[spill] >> (np.uint64(64) - off[spill])
        np.bitwise_or.at(out, word[spill] + 1, hi)
    return out


def _unpack_bits(stream: np.ndarray, n: int, bits: int) -> np.ndarray:
    pos = np.arange(n, dtype=np.uint64) * np.uint64(bits)
    word = (pos // np.uint64(64)).astype(np.int64)
    off = pos % np.uint64(64)
    ext = np.concatenate([stream, np.zeros(1, dtype=np.uint64)])
    lo = ext[word] >> off
    # avoid shift-by-64 (undefined): clamp, then mask out the off==0 rows
    sh = (np.uint64(64) - off) % np.uint64(64)
    hi = np.where(off > np.uint64(0), ext[word + 1] << sh, np.uint64(0))
    mask = (np.uint64(1) << np.uint64(bits)) - np.uint64(1)
    return (lo | hi) & mask


class FPCodec:
    """Chunked quantizing codec with absolute-error bound `tol`."""

    def __init__(self, tol: float = 1e-8, chunk: int = CHUNK):
        self.tol = float(tol)
        self.chunk = int(chunk)

    # ------------------------------------------------------------------
    def encode(self, x: np.ndarray) -> Dict[str, np.ndarray]:
        x = np.ascontiguousarray(x)
        if np.iscomplexobj(x):
            re = self.encode(x.real)
            im = self.encode(x.imag)
            return {"complex": np.array(1)} | \
                {f"re_{k}": v for k, v in re.items()} | \
                {f"im_{k}": v for k, v in im.items()}
        shape = np.array(x.shape, dtype=np.int64)
        flat = x.reshape(-1).astype(np.float64)
        n = len(flat)
        if self.tol <= 0.0:
            return {"shape": shape, "raw": flat}
        nc = (n + self.chunk - 1) // self.chunk
        pad = nc * self.chunk - n
        fp = np.concatenate([flat, np.zeros(pad)]).reshape(nc, self.chunk)
        amax = np.abs(fp).max(axis=1)
        # bits per chunk: quantization step = 2*amax/2^b <= 2*tol
        with np.errstate(divide="ignore"):
            need = np.ceil(np.log2(np.maximum(amax / self.tol, 1.0))) + 1
        bits = np.clip(need, 0, _MAX_BITS).astype(np.int64)
        bits[amax <= self.tol] = 0
        streams = []
        for b in np.unique(bits[bits > 0]):
            rows = np.nonzero(bits == b)[0]
            sc = (1 << (int(b) - 1)) - 1
            q = np.round(fp[rows] / amax[rows, None] * sc).astype(np.int64)
            streams.append(_pack_bits((q + sc).reshape(-1).astype(np.uint64),
                                      int(b)))
        stream = np.concatenate(streams) if streams else \
            np.zeros(0, dtype=np.uint64)
        return {"shape": shape, "amax": amax, "bits": bits,
                "stream": stream, "n": np.array(n)}

    # ------------------------------------------------------------------
    def decode(self, enc: Dict[str, np.ndarray]) -> np.ndarray:
        if "complex" in enc:
            re = self.decode({k[3:]: v for k, v in enc.items()
                              if k.startswith("re_")})
            im = self.decode({k[3:]: v for k, v in enc.items()
                              if k.startswith("im_")})
            return re + 1j * im
        shape = tuple(int(s) for s in enc["shape"])
        if "raw" in enc:
            return np.asarray(enc["raw"]).reshape(shape)
        n = int(enc["n"])
        amax = np.asarray(enc["amax"])
        bits = np.asarray(enc["bits"])
        stream = np.asarray(enc["stream"])
        nc = len(amax)
        out = np.zeros((nc, self.chunk))
        off = 0
        for b in np.unique(bits[bits > 0]):
            rows = np.nonzero(bits == b)[0]
            cnt = len(rows) * self.chunk
            words = (cnt * int(b) + 63) // 64
            q = _unpack_bits(stream[off:off + words], cnt, int(b))
            off += words
            sc = (1 << (int(b) - 1)) - 1
            vals = (q.astype(np.int64) - sc).astype(np.float64) / sc
            out[rows] = vals.reshape(len(rows), self.chunk) * amax[rows, None]
        return out.reshape(-1)[:n].reshape(shape)

    # ------------------------------------------------------------------
    def ratio(self, x: np.ndarray) -> float:
        """Compression ratio (original bytes / encoded bytes)."""
        enc = self.encode(x)
        nbytes = sum(np.asarray(v).nbytes for v in enc.values())
        return x.nbytes / max(nbytes, 1)


class CompressedVector:
    """Array-like holding compressed chunks, decompressed on access
    (reference fp_codec.hpp:377 CompressedVector)."""

    def __init__(self, data: np.ndarray, tol: float = 1e-8):
        self.codec = FPCodec(tol)
        self.shape = data.shape
        self.dtype = data.dtype
        self._enc = self.codec.encode(data)

    def to_array(self) -> np.ndarray:
        return self.codec.decode(self._enc).astype(self.dtype, copy=False)

    def __getitem__(self, key):
        return self.to_array()[key]

    @property
    def nbytes_compressed(self) -> int:
        return sum(np.asarray(v).nbytes for v in self._enc.values())
