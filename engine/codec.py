"""Posting-block codec: delta + varint (LEB128) compression with per-block
max-score metadata (SURVEY.md §2.B8; BASELINE.json:6 "delta-encoded
varint/PForDelta-compressed posting blocks with per-block max-score").

All codecs are numpy-vectorized (no per-element Python in the hot loop) and
pure — unit/property-tested for encode∘decode == identity on adversarial gap
distributions (SURVEY.md §5.2).

Three codecs, chosen per block by predicted size:
- ``varint``: LEB128 unsigned, byte-aligned — robust default.
- ``for``: frame-of-reference fixed-width bit-packing (no exceptions):
  each block stores a bit width w and packs values into ceil(n*w/8) bytes.
- ``pfor``: patched frame-of-reference (PForDelta, Zukowski et al. 2006):
  low bits packed at the 90th-percentile width, outliers patched via a
  varint exception tail — wins on outlier-heavy gap distributions where
  one large gap would otherwise force FOR's width up or varint's bytes.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [1 << (7 * i) for i in range(1, 10)]  # 2^7 .. 2^63


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    nbytes = np.ones(n, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= t
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    idx = np.cumsum(nbytes) - nbytes  # start offset of each value
    cur = v.copy()
    remaining = nbytes.copy()
    for _ in range(10):
        mask = remaining > 0
        if not mask.any():
            break
        byte = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = (remaining[mask] > 1).astype(np.uint8)
        out[idx[mask]] = byte | (more << 7)
        cur[mask] >>= np.uint64(7)
        idx[mask] += 1
        remaining[mask] -= 1
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array, vectorized via group scatter-add."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    grp = np.zeros(b.size, dtype=np.int64)
    grp[1:] = np.cumsum(is_last[:-1])
    n_vals = int(is_last.sum())
    starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[grp]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    vals = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(vals, grp, contrib)
    return vals


def for_encode(values: np.ndarray) -> bytes:
    """Frame-of-reference bit-packing: 1 header byte (width w), then values
    packed little-endian at w bits each. w=0 ⇒ all values are zero."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b"\x00"
    mx = int(v.max())
    w = max(0, mx.bit_length())
    header = np.array([w], dtype=np.uint8)
    if w == 0:
        return header.tobytes()
    # expand each value into w bits (little-endian bit order), then packbits
    shifts = np.arange(w, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    packed = np.packbits(bits.reshape(-1), bitorder="little")
    return header.tobytes() + packed.tobytes()


def for_decode(buf: bytes, n: int) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    w = int(b[0])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if w == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(b[1:], bitorder="little")[: n * w]
    bits = bits.reshape(n, w).astype(np.uint64)
    shifts = np.arange(w, dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


CODEC_VARINT = 0
CODEC_FOR = 1
CODEC_PFOR = 2


def pfor_encode(values: np.ndarray, w: int) -> bytes:
    """Patched frame-of-reference (PForDelta, Zukowski et al. 2006): pack
    every value's low ``w`` bits fixed-width, then patch the outliers.
    Layout: [w:1B][packed low bits: ceil(n·w/8)B][varint tail: n_exc,
    exception positions (delta, first absolute), exception high bits
    (v >> w, nonzero by construction)]. The fixed-size body comes first so
    the self-delimiting varint tail needs no length prefix."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    assert 0 <= w <= 63
    wu = np.uint64(w)
    if w == 0:
        low = np.zeros(n, dtype=np.uint64)
        high = v
        body = b""
    else:
        low = v & np.uint64((1 << w) - 1)
        high = v >> wu
        bits = ((low[:, None] >> np.arange(w, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.uint8)
        body = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    pos = np.flatnonzero(high > 0)
    posd = pos.astype(np.uint64).copy()
    if len(pos):
        posd[1:] = (pos[1:] - pos[:-1]).astype(np.uint64)
    tail = varint_encode(
        np.concatenate(
            (np.asarray([len(pos)], dtype=np.uint64), posd, high[pos])
        )
    )
    return bytes([w]) + body + tail


def pfor_decode(buf: bytes, n: int) -> np.ndarray:
    w = buf[0]
    body_len = (n * w + 7) // 8
    if w == 0:
        low = np.zeros(n, dtype=np.uint64)
    else:
        bits = np.unpackbits(
            np.frombuffer(buf[1 : 1 + body_len], dtype=np.uint8),
            bitorder="little",
        )[: n * w]
        shifts = np.arange(w, dtype=np.uint64)
        low = (bits.reshape(n, w).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
    tail = varint_decode(buf[1 + body_len :])
    n_exc = int(tail[0])
    if n_exc:
        pos = np.cumsum(tail[1 : 1 + n_exc].astype(np.int64))
        low[pos] |= tail[1 + n_exc : 1 + 2 * n_exc] << np.uint64(w)
    return low


def _pfor_width(values: np.ndarray) -> int:
    """Candidate patch width: the 90th-percentile bit length (standard
    PForDelta heuristic — ~10% exceptions max)."""
    bl = np.zeros(values.size, dtype=np.int64)
    nz = values > 0
    if nz.any():
        bl[nz] = (
            np.floor(np.log2(values[nz].astype(np.float64))).astype(np.int64)
            + 1
        )
        bl[nz] += (values[nz] >> bl[nz].astype(np.uint64)) > 0
    return int(min(63, np.percentile(bl, 90, method="lower")))


def encode_best(values: np.ndarray) -> tuple[int, bytes]:
    """Pick the smallest of varint / FOR / patched-FOR for this block
    (PForDelta-style adaptive choice per block)."""
    vi = varint_encode(values)
    fo = for_encode(values)
    best, buf = CODEC_VARINT, vi
    if len(fo) < len(buf):
        best, buf = CODEC_FOR, fo
    if values.size:
        pf = pfor_encode(values, _pfor_width(values))
        if len(pf) < len(buf):
            best, buf = CODEC_PFOR, pf
    return best, buf


def decode(codec: int, buf: bytes, n: int) -> np.ndarray:
    if codec == CODEC_FOR:
        return for_decode(buf, n)
    if codec == CODEC_PFOR:
        return pfor_decode(buf, n)
    return varint_decode(buf)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Gaps: first value kept absolute (caller stores first_doc_id too, but
    encoding the absolute first keeps blocks self-contained)."""
    v = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    out = v.copy()
    out[1:] = v[1:] - v[:-1]
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.uint64), dtype=np.uint64)


def bm25_tf_norm(
    tfs: np.ndarray, dls: np.ndarray, k1: float, b: float, avgdl: float
) -> np.ndarray:
    """Per-posting BM25 tf normalization (float64): tf(k1+1)/(tf + k1(1-b+b·dl/avgdl)).
    Multiplied by idf it gives the posting's score contribution; its block max
    is the stored block-max metadata (SURVEY.md §2.B8/B13)."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def idf(N: int, df: np.ndarray | int) -> np.ndarray | float:
    """Lucene BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)) (SURVEY.md §2.B13)."""
    dfa = np.asarray(df, dtype=np.float64)
    out = np.log(1.0 + (N - dfa + 0.5) / (dfa + 0.5))
    return float(out) if out.ndim == 0 else out


def decode_concat(codecs, bufs, ns) -> np.ndarray:
    """Decode many blocks in bulk → one concatenated uint64 array in block
    order. All varint blocks are decoded in a single vectorized pass over
    their concatenated bytes (LEB128 is self-delimiting); FOR blocks decode
    per block (they carry a width header). ~100x fewer numpy calls than
    block-at-a-time decoding on long posting lists."""
    total = int(sum(ns))
    out = np.empty(total, dtype=np.uint64)
    pos = np.concatenate(([0], np.cumsum(ns))).astype(np.int64)
    vi = [i for i, c in enumerate(codecs) if c == CODEC_VARINT and ns[i]]
    if vi:
        vals = varint_decode(b"".join(bufs[i] for i in vi))
        o = 0
        for i in vi:
            out[pos[i] : pos[i + 1]] = vals[o : o + ns[i]]
            o += ns[i]
    for i, c in enumerate(codecs):
        if ns[i] and c == CODEC_FOR:
            out[pos[i] : pos[i + 1]] = for_decode(bufs[i], ns[i])
        elif ns[i] and c == CODEC_PFOR:
            out[pos[i] : pos[i + 1]] = pfor_decode(bufs[i], ns[i])
    return out


def delta_decode_blocks(gaps_concat: np.ndarray, ns) -> np.ndarray:
    """Vectorized per-block delta reconstruction over concatenated gap
    arrays (each block's first value is absolute)."""
    ns = np.asarray(ns, dtype=np.int64)
    s = np.cumsum(gaps_concat, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(ns[:-1])))
    base = s[starts] - gaps_concat[starts]
    return s - np.repeat(base, ns)


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte counts (analytic, no encoding)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= t
    return nbytes


def varint_encode_rows(values: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Varint-encode a flat value stream split into rows at `starts` (index
    array, first element 0): ONE whole-stream encode pass, sliced at per-row
    byte offsets. Used for transit encoding of shuffle payloads (SPIMI
    partials) — ~4-6x fewer shuffle bytes than int64 arrays."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return []
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.append(starts[1:], v.size)
    csum = np.concatenate(([0], np.cumsum(varint_sizes(v))))
    full = varint_encode(v)
    return [full[csum[s]:csum[e]] for s, e in zip(starts, ends)]


def varint_decode_concat(bufs) -> np.ndarray:
    """Decode many varint buffers in one vectorized pass (LEB128 is
    self-delimiting) → one concatenated uint64 array in buffer order."""
    return varint_decode(b"".join(bufs))


def encode_blocks(values: np.ndarray, starts: np.ndarray) -> tuple[list[int], list[bytes]]:
    """Encode a group's value stream split into blocks at `starts` (index
    array, first element 0). Codec choice per block is analytic (predicted
    varint size vs FOR size — nothing encoded twice); varint blocks are
    produced by ONE whole-group encode pass sliced at block byte offsets.
    Returns (codecs, buffers) per block."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return [], []
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.append(starts[1:], n)
    sizes = varint_sizes(v)
    csum = np.concatenate(([0], np.cumsum(sizes)))
    vi_block = csum[ends] - csum[starts]  # varint bytes per block
    lens = ends - starts
    # per-value bit lengths (exact, float-log2 with power-of-two fixup)
    bl = np.zeros(n, dtype=np.int64)
    nzv = v > 0
    if nzv.any():
        bl[nzv] = np.floor(np.log2(v[nzv].astype(np.float64))).astype(np.int64) + 1
        bl[nzv] += (v[nzv] >> bl[nzv].astype(np.uint64)) > 0
    # FOR bytes per block: 1 header + ceil(len * bitwidth(max) / 8)
    width = np.maximum.reduceat(bl, starts)
    fo_block = 1 + (lens * width + 7) // 8
    # PFor candidate width per block: 90th-percentile bit length (standard
    # patched-FOR heuristic) via one lexsort over (block, bit length)
    blk_of = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
    bl_sorted = bl[np.lexsort((bl, blk_of))]
    w_blk = np.minimum(
        bl_sorted[starts + ((lens - 1) * 9) // 10], 63
    ).astype(np.int64)
    wv = w_blk[blk_of].astype(np.uint64)
    high = v >> wv
    exc = high > 0
    n_exc = np.add.reduceat(exc.astype(np.int64), starts)
    high_bytes = np.add.reduceat(
        np.where(exc, varint_sizes(high), 0), starts
    )
    # exact position-bytes: varint-size the exception-position delta stream
    # pfor_encode actually writes (block-local positions, first absolute,
    # then gaps) and sum per block — one more reduceat makes the whole
    # pf_block prediction EXACT, so the chosen codec is exactly the argmin
    # of the real encoded sizes (the old per-exception upper bound could
    # misprice blocks whose exceptions cluster early)
    pos_bytes = np.zeros(len(starts), dtype=np.int64)
    eidx = np.flatnonzero(exc)
    if len(eidx):
        eblk = blk_of[eidx]
        p = eidx - starts[eblk]
        pdl = p.copy()
        same = np.zeros(len(eidx), dtype=bool)
        same[1:] = eblk[1:] == eblk[:-1]
        si = np.flatnonzero(same)
        pdl[si] = p[si] - p[si - 1]
        estarts = np.flatnonzero(~same)
        pos_bytes[eblk[estarts]] = np.add.reduceat(
            varint_sizes(pdl.astype(np.uint64)), estarts
        )
    pf_block = (
        1 + (lens * w_blk + 7) // 8
        + varint_sizes(n_exc.astype(np.uint64))
        + pos_bytes + high_bytes
    )
    use_for = fo_block < vi_block
    use_pfor = pf_block < np.minimum(fo_block, vi_block)
    full = varint_encode(v)
    codecs: list[int] = []
    bufs: list[bytes] = []
    for i in range(len(starts)):
        if use_pfor[i]:
            codecs.append(CODEC_PFOR)
            bufs.append(pfor_encode(v[starts[i]:ends[i]], int(w_blk[i])))
        elif use_for[i]:
            codecs.append(CODEC_FOR)
            bufs.append(for_encode(v[starts[i]:ends[i]]))
        else:
            codecs.append(CODEC_VARINT)
            bufs.append(full[csum[starts[i]]:csum[ends[i]]])
    return codecs, bufs
