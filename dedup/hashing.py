"""Pure-NumPy hash kernels shared by the oracle AND the Spark pandas UDFs.

This module is the parity anchor (SURVEY.md §0.2): both `dedup/oracle.py`
(single-process reference) and `dedup/udfs.py` (distributed pipeline) call
these exact functions, so MinHash signatures, band keys, probe sequences,
SimHash values and winnowing fingerprints agree bit-for-bit by construction.

Math sources (public):
  - FNV-1a 64-bit: public-domain Fowler–Noll–Vo spec.
  - MinHash family h_i(x) = (a_i*x + b_i) mod (2^61 - 1): classic universal
    hashing over the Mersenne prime, per Broder's min-wise permutations.
  - Multi-probe sequence: Lv et al., "Multi-Probe LSH", VLDB 2007, §4.1
    (expand/shift heap over sorted perturbation scores). The reference repo
    (/root/reference/README.md:1) names exactly this algorithm.
  - SimHash: Charikar, STOC 2002.
  - Winnowing: Schleimer, Wilkerson, Aiken, SIGMOD 2003 (guarantee: any
    shared substring of length >= w + k - 1 shares a selected fingerprint).

Everything here is vectorized NumPy on uint64; Python-int scalars are kept
out of uint64 arithmetic (NumPy 1.26 silently promotes mixed ops to float64).
"""

from __future__ import annotations

import hashlib
import heapq
import re

import numpy as np

# ---------------------------------------------------------------------------
# constants (as np.uint64 to keep arithmetic in uint64)
# ---------------------------------------------------------------------------
FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)
MERSENNE61 = np.uint64((1 << 61) - 1)
_U1 = np.uint64(1)
_U31 = np.uint64(31)
_U30 = np.uint64(30)
_U61 = np.uint64(61)
_MASK31 = np.uint64(0x7FFFFFFF)
_MASK30 = np.uint64(0x3FFFFFFF)

_WS_RE = re.compile(r"\s+")


# ---------------------------------------------------------------------------
# normalization (applied to a COPY of text; never mutates the source column)
# ---------------------------------------------------------------------------
def normalize(text: str) -> bytes:
    """Unicode lowercase + collapse runs of whitespace to single spaces +
    strip, then UTF-8 encode. SURVEY.md §7.0 F1."""
    return _WS_RE.sub(" ", text.lower()).strip().encode("utf-8")


def sha256_hex(text: str) -> str:
    """sha256 of the RAW text bytes (byte-identity invariant, F9)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# FNV-1a 64
# ---------------------------------------------------------------------------
def fnv1a64(data: bytes) -> int:
    """Scalar FNV-1a 64 (tests / tiny inputs)."""
    h = 0xCBF29CE484222325
    for byte in data:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a64_windows(buf: np.ndarray, k: int) -> np.ndarray:
    """FNV-1a 64 of every k-byte sliding window of `buf` (uint8 array).

    Returns uint64 array of length len(buf) - k + 1 (empty if shorter).
    Vectorized over windows; loops only k times.
    """
    buf = np.asarray(buf, dtype=np.uint8)
    n = buf.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    for j in range(k):
        h = (h ^ buf[j : j + n].astype(np.uint64)) * FNV_PRIME
    return h


def fnv1a64_tokens(tokens: list[bytes]) -> np.ndarray:
    """FNV-1a 64 of each byte-string token (for SimHash features)."""
    return np.array([fnv1a64(t) for t in tokens], dtype=np.uint64)


def fnv1a64_tokens_batch(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """FNV-1a 64 of many variable-length segments of one uint8 buffer —
    bit-identical to calling fnv1a64 on each segment's bytes.

    Vectorizes across segments byte-position by byte-position: tokens are
    processed in length order so each step's active set is a shrinking
    suffix, making total vector work O(total bytes). The rare very-long
    tail segments (e.g. whitespace-free CJK documents are one giant
    "token") would degenerate to thousands of near-empty vector steps, so
    once fewer than 64 segments remain active the loop finishes them with
    the scalar byte loop, continuing from the already-absorbed prefix
    state (FNV is a plain left fold, so the handoff is exact).
    """
    t = starts.size
    if t == 0:
        return np.empty(0, dtype=np.uint64)
    order = np.argsort(lens, kind="stable")
    s = starts[order]
    length = lens[order]
    h = np.full(t, FNV_OFFSET, dtype=np.uint64)
    j = 0
    while True:
        lo = int(np.searchsorted(length, j, side="right"))
        if lo >= t:
            break
        if t - lo < 64:
            prime = 0x100000001B3
            mask = 0xFFFFFFFFFFFFFFFF
            for i in range(lo, t):
                hv = int(h[i])
                seg = buf[s[i] + j : s[i] + length[i]]
                for byte in seg.tolist():
                    hv = ((hv ^ byte) * prime) & mask
                h[i] = hv
            break
        h[lo:] = (h[lo:] ^ buf[s[lo:] + j].astype(np.uint64)) * FNV_PRIME
        j += 1
    out = np.empty(t, dtype=np.uint64)
    out[order] = h
    return out


# ---------------------------------------------------------------------------
# Mersenne-61 modular arithmetic (vectorized, overflow-safe)
# ---------------------------------------------------------------------------
def mod61(y: np.ndarray) -> np.ndarray:
    """y mod (2^61 - 1) for uint64 y (any value < 2^64)."""
    y = np.asarray(y, dtype=np.uint64)
    y = (y >> _U61) + (y & MERSENNE61)  # < 2^61 + 7
    return np.where(y >= MERSENNE61, y - MERSENNE61, y)


def _mod61_inplace(y: np.ndarray) -> np.ndarray:
    """In-place y mod (2^61 - 1); y is uint64 and is clobbered.
    Identical results to mod61 with ~1/3 the temporaries."""
    hi = y >> _U61
    y &= MERSENNE61
    y += hi
    np.subtract(y, MERSENNE61, out=y, where=y >= MERSENNE61)
    return y


def mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * b) mod (2^61 - 1) with a, b uint64 arrays of values < 2^61 - 1.

    Schoolbook split into 31-bit halves so every partial product fits in
    uint64; 2^62 ≡ 2 and 2^61 ≡ 1 (mod M61).
    """
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a1, a0 = a >> _U31, a & _MASK31  # a1 < 2^30, a0 < 2^31
    b1, b0 = b >> _U31, b & _MASK31
    # term1: a1*b1 * 2^62 ≡ a1*b1 * 2 ; a1*b1 < 2^60 so <<1 fits
    t1 = mod61((a1 * b1) << _U1)
    # term2: (a1*b0 + a0*b1) * 2^31 ; mid < 2^62 fits
    mid = mod61(a1 * b0 + a0 * b1)  # < 2^61
    m1, m0 = mid >> _U30, mid & _MASK30  # m1 < 2^31, m0 < 2^30
    t2 = mod61(m1 + (m0 << _U31))  # mid*2^31 = m1*2^61 + m0*2^31 ≡ m1 + m0*2^31
    # term3: a0*b0 < 2^62 fits
    t3 = mod61(a0 * b0)
    return mod61(t1 + t2 + t3)  # sum < 3*2^61 < 2^64, one fold suffices


def minhash_params(seed: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (A, B) coefficients for K universal hashes."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(MERSENNE61), size=k, dtype=np.uint64)
    b = rng.integers(0, int(MERSENNE61), size=k, dtype=np.uint64)
    return a, b


# ---------------------------------------------------------------------------
# shingling + MinHash (F2/F3/F4) with runner-up for multi-probe (§7.0)
# ---------------------------------------------------------------------------
def char_shingles(norm: bytes, k: int) -> np.ndarray:
    """Distinct FNV-1a 64 hashes of the k-char (byte) shingles of a
    normalized document. Sorted unique (set semantics)."""
    buf = np.frombuffer(norm, dtype=np.uint8)
    return np.unique(fnv1a64_windows(buf, k))


def word_shingles(norm: bytes, w: int) -> np.ndarray:
    """Distinct hashes of the w-word shingles of a normalized document
    (F2 word mode, SURVEY.md §7.0). Each token is FNV-1a hashed once,
    then each w-token window folds the token hashes through one more
    vectorized FNV pass — O(tokens) total. Documents shorter than one
    window hash the whole token sequence (never empty for nonempty text).
    Sorted unique (set semantics)."""
    tokens = norm.split(b" ")
    th = fnv1a64_tokens([t for t in tokens if t])
    if th.size == 0:
        return np.empty(0, dtype=np.uint64)
    win = min(w, th.size)
    n = th.size - win + 1
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    for j in range(win):
        h = _fnv_absorb_u64(h, th[j : j + n])
    return np.unique(h)


def _hash_matrix(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """H[i, j] = (a_j * x_i + b_j) mod M61 for x (n,), a/b (K,) -> (n, K).

    Fused, allocation-lean mulmod61+add+mod61: identical results to
    mod61(mulmod61(a, x) + b), measured ~3x faster on doc-sized batches.
    """
    x = np.ascontiguousarray(x, dtype=np.uint64)
    a1, a0 = a >> _U31, a & _MASK31          # (K,)
    x1, x0 = (x >> _U31)[:, None], (x & _MASK31)[:, None]  # (n, 1)
    # t1 = (a1*x1) << 1 mod M61 ; a1*x1 < 2^60
    t = a1 * x1
    t <<= _U1
    _mod61_inplace(t)
    # mid = (a1*x0 + a0*x1) mod M61, then mid*2^31 ≡ m1 + m0*2^31
    mid = a1 * x0
    mid += a0 * x1
    _mod61_inplace(mid)
    m1 = mid >> _U30
    mid &= _MASK30
    mid <<= _U31
    mid += m1
    _mod61_inplace(mid)
    t += mid
    # t3 = a0*x0 < 2^62
    mid = a0 * x0
    _mod61_inplace(mid)
    t += mid
    _mod61_inplace(t)  # sum of three residues < 3*2^61 -> one fold
    t += b
    _mod61_inplace(t)
    return t


def minhash_with_runnerup(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """MinHash signature + runner-up (second-minimum) per permutation.

    shingles: uint64 array (n,) of distinct shingle hashes, n >= 1.
    a, b:     uint64 arrays (K,).
    Returns (minh, runner), each uint64 (K,). With a single shingle the
    runner-up equals the minimum (gap 0 ⇒ the row is never perturbed).
    """
    x = mod61(shingles)  # (n,)
    h = _hash_matrix(x, a, b)
    if h.shape[0] == 1:
        minh = h[0]
        return minh, minh.copy()
    two = np.partition(h, 1, axis=0)[:2]
    return two[0], two[1]


def oph_minhash_with_runnerup(
    shingles: np.ndarray, k: int, a0: np.uint64, b0: np.uint64
) -> tuple[np.ndarray, np.ndarray]:
    """One-permutation MinHash signature + runner-up per bin.

    One universal hash h(x) = (a0*x + b0) mod (2^61 - 1) over all shingles
    (Li, Owen, Zhang, "One Permutation Hashing", NIPS 2012); the hash
    space is split into k bins by the top bits (k must be a power of two);
    slot j = min hash in bin j, runner-up = second min (gap 0 when the bin
    has < 2 values, so multi-probe never perturbs it — same convention as
    the K-hash scheme). Slot values are truncated to 31 bits (h >> 30,
    monotonic — see inline comment) so signature arrays fit a SIGNED
    32-bit integer: the verify stage casts them to array<int> before its
    joins, halving the pipeline's dominant shuffle payload. Empty bins are filled by rotation densification
    (Shrivastava & Li, ICML 2014): borrow the next non-empty bin to the
    right (circular) offset by distance*FNV_PRIME (wrapping uint64), so
    two docs agree on a densified slot iff they agree on the borrowed bin
    AND the distance — keeping the equal-slot estimator unbiased.

    O(n + n log n) per doc versus O(n*K) for the classic scheme — the
    round-1 stage-1 bottleneck (VERDICT r1, perf item; docs/SCALE.md).
    """
    x = mod61(np.asarray(shingles, dtype=np.uint64))
    h = mod61(mulmod61(np.full(x.shape, a0, dtype=np.uint64), x) + np.uint64(b0))
    log2k = k.bit_length() - 1
    if (1 << log2k) != k:
        raise ValueError("one-permutation hashing requires power-of-two k")
    bins = (h >> np.uint64(61 - log2k)).astype(np.int64)  # 0..k-1
    # Slot values are truncated to 31 bits (top bits below the bin field).
    # Truncation >>30 is monotonic, so per-bin min/runner-up semantics are
    # unchanged; equal-slot collisions between different hashes add only
    # ~K/2^31 bias to the Jaccard estimate (~6e-8 at K=128). The payoff
    # at scale: signature arrays are the pipeline's dominant shuffle
    # payload (stage-4 verify joins them to every candidate pair), and
    # 31-bit values let verify shuffle array<int> — half the bytes of
    # array<long> — while the stored signatures table keeps the
    # schema-stable long arrays (the classic kxu scheme needs 61 bits).
    h = h >> np.uint64(30)
    order = np.lexsort((h, bins))
    hb, bb = h[order], bins[order]
    first = np.ones(hb.size, dtype=bool)
    first[1:] = bb[1:] != bb[:-1]
    fi = np.nonzero(first)[0]
    occ_bins = bb[fi]                      # sorted ascending, unique
    minv = hb[fi]
    si = np.minimum(fi + 1, hb.size - 1)
    has2 = (fi + 1 < hb.size) & (bb[si] == occ_bins)
    runv = np.where(has2, hb[si], minv)
    minh = np.zeros(k, dtype=np.uint64)
    runner = np.zeros(k, dtype=np.uint64)
    filled = np.zeros(k, dtype=bool)
    minh[occ_bins] = minv
    runner[occ_bins] = runv
    filled[occ_bins] = True
    if not filled.all():
        empty = np.nonzero(~filled)[0]
        pos = np.searchsorted(occ_bins, empty)
        wrap = pos == occ_bins.size
        nxt = occ_bins[np.where(wrap, 0, np.minimum(pos, occ_bins.size - 1))]
        dist = np.where(wrap, nxt + k - empty, nxt - empty).astype(np.uint64)
        # offset by distance*FNV_PRIME32, wrapped into the same 31-bit
        # domain as the truncated slot values
        dval = (minh[nxt] + dist * np.uint64(0x01000193)) & np.uint64(0x7FFFFFFF)
        minh[empty] = dval
        runner[empty] = dval  # gap 0: densified slots are never perturbed
    return minh, runner


# ---------------------------------------------------------------------------
# band keys (F5): FNV-1a over band index + r signature slots (LE bytes)
# ---------------------------------------------------------------------------
def _fnv_absorb_u64(h: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Absorb each uint64 of `vals` (same shape as h) into FNV state h,
    little-endian byte order."""
    v = vals.astype(np.uint64, copy=True)
    mask = np.uint64(0xFF)
    eight = np.uint64(8)
    for _ in range(8):
        h = (h ^ (v & mask)) * FNV_PRIME
        v = v >> eight
    return h


def band_keys(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Bucket key per band for ONE signature (K,) → uint64 (bands,)."""
    return band_keys_batch(sig[None, :], bands, rows)[0]


def band_keys_batch(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Bucket keys for a batch: sigs uint64 (N, K) → uint64 (N, bands)."""
    sigs = np.asarray(sigs, dtype=np.uint64)
    n = sigs.shape[0]
    out = np.empty((n, bands), dtype=np.uint64)
    for band in range(bands):
        h = np.full(n, FNV_OFFSET, dtype=np.uint64)
        h = _fnv_absorb_u64(h, np.full(n, np.uint64(band)))
        for r in range(rows):
            h = _fnv_absorb_u64(h, sigs[:, band * rows + r])
        out[:, band] = h
    return out


# ---------------------------------------------------------------------------
# multi-probe perturbation sequence ([MPLSH §4.1] expand/shift heap)
# ---------------------------------------------------------------------------
def probe_sets(gaps, t_probes: int) -> list[tuple[int, ...]]:
    """First (t_probes - 1) perturbation sets in ascending-score order.

    gaps: per-row perturbation cost (runnerup - min for that permutation),
          numpy array or list of ints. Rows with gap == 0 are excluded
          (perturbing them reproduces the home key).
    Returns a list of tuples of ORIGINAL row indices (within the band),
    in exact probe order. Deterministic: ties broken by the sorted-index
    tuple itself.

    Algorithm per [MPLSH §4.1]: sort costs ascending (z_1..z_m); start the
    heap with {1}; pop the min-score set S, emit it, push shift(S) (replace
    max element j with j+1) and expand(S) (add j+1).

    Implementation is pure Python on purpose: numpy call overhead dominates
    16-element arrays. sorted((gap, idx)) matches the former
    np.lexsort((idx, gaps)) order; float() and np.float64 are the same
    IEEE double, so scores and heap order are bit-identical.
    """
    if isinstance(gaps, np.ndarray):
        gaps = gaps.tolist()
    if t_probes <= 1:
        return []
    order = sorted((g, i) for i, g in enumerate(gaps) if g > 0)
    if not order:
        return []
    z = [float(g) for g, _ in order]
    idx = [i for _, i in order]
    m = len(order)

    out: list[tuple[int, ...]] = []
    # heap entries: (score, sorted-positions tuple)
    heap: list[tuple[float, tuple[int, ...]]] = [(z[0], (0,))]
    seen = {(0,)}
    while heap and len(out) < t_probes - 1:
        score, s = heapq.heappop(heap)
        out.append(tuple(sorted(idx[p] for p in s)))
        j = s[-1]
        if j + 1 < m:
            shift = s[:-1] + (j + 1,)
            if shift not in seen:
                seen.add(shift)
                heapq.heappush(heap, (score - z[j] + z[j + 1], shift))
            expand = s + (j + 1,)
            if expand not in seen:
                seen.add(expand)
                heapq.heappush(heap, (score + z[j + 1], expand))
    return out


def probe_keys_batch(
    minh_mat: np.ndarray,
    run_mat: np.ndarray,
    bands: int,
    rows: int,
    t_probes: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All perturbed bucket keys for a BATCH of signatures.

    minh_mat/run_mat: uint64 (N, K). Returns (doc_idx, band, rank, key)
    arrays; rank starts at 1 (rank 0 = home bucket, from band_keys_batch).
    Probe-set generation is per (doc, band) — a tiny pure-Python heap —
    but all slice hashing happens in ONE vectorized FNV pass over an
    (M, rows) matrix, absorbing the per-row band id first, exactly like
    band_keys does for home buckets.
    """
    n = minh_mat.shape[0]
    slices: list[np.ndarray] = []
    meta_doc: list[int] = []
    meta_band: list[int] = []
    meta_rank: list[int] = []
    if t_probes > 1:
        gaps_mat = run_mat - minh_mat  # uint64, >= 0 by construction
        for i in range(n):
            gaps = gaps_mat[i].tolist()
            for band in range(bands):
                lo = band * rows
                sets = probe_sets(gaps[lo : lo + rows], t_probes)
                for rank, rows_to_flip in enumerate(sets, start=1):
                    s = minh_mat[i, lo : lo + rows].copy()
                    for rr in rows_to_flip:
                        s[rr] = run_mat[i, lo + rr]
                    slices.append(s)
                    meta_doc.append(i)
                    meta_band.append(band)
                    meta_rank.append(rank)
    if not slices:
        e_i = np.empty(0, dtype=np.int64)
        return e_i, e_i.copy(), e_i.copy(), np.empty(0, dtype=np.uint64)
    mat = np.vstack(slices)
    band_arr = np.array(meta_band, dtype=np.uint64)
    h = np.full(mat.shape[0], FNV_OFFSET, dtype=np.uint64)
    h = _fnv_absorb_u64(h, band_arr)
    for rr in range(rows):
        h = _fnv_absorb_u64(h, mat[:, rr])
    return (
        np.array(meta_doc, dtype=np.int64),
        band_arr.astype(np.int64),
        np.array(meta_rank, dtype=np.int64),
        h,
    )


def probe_keys_for_doc(
    minh: np.ndarray,
    runner: np.ndarray,
    bands: int,
    rows: int,
    t_probes: int,
) -> list[tuple[int, int, np.uint64]]:
    """All perturbed bucket keys for one signature (delegates to
    probe_keys_batch so oracle and Spark share one code path).

    Returns [(band, probe_rank, key), ...] with probe_rank starting at 1.
    """
    _d, band, rank, key = probe_keys_batch(
        minh[None, :], runner[None, :], bands, rows, t_probes
    )
    return [(int(b), int(r), np.uint64(k)) for b, r, k in zip(band, rank, key)]


# ---------------------------------------------------------------------------
# SimHash (F6) — 64-bit, token-unigram features with multiplicity
# ---------------------------------------------------------------------------
def simhash64(token_hashes: np.ndarray) -> int:
    """Charikar SimHash: sum ±1 per bit over token-feature hashes; bit set
    iff the sum is strictly positive. Returns a Python int in [0, 2^64)."""
    if token_hashes.size == 0:
        return 0
    bits = (token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U1
    score = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
    sim = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            sim |= _U1 << np.uint64(i)
    return int(sim)


def simhash_blocks(sim: int, widths: tuple[int, ...]) -> list[int]:
    """Split a simhash into blocks with the given bit widths (LSB-first)."""
    out = []
    shift = 0
    for w in widths:
        out.append((sim >> shift) & ((1 << w) - 1))
        shift += w
    return out


def simhash_combo_keys(
    sim: int, widths: tuple[int, ...], combo: int
) -> list[tuple[int, int]]:
    """Manku-style combination keys (P5 at scale): one packed key per
    `combo`-subset of blocks, as (combo_id, key). hamming(a,b) <=
    len(widths) - combo ⇒ at least one combo key identical.

    combo_id enumerates itertools.combinations order; the packed key
    concatenates the chosen block values (MSB = lowest block index), which
    fits a signed 64-bit long for any combo of <= 5 blocks of 64 bits.
    """
    import itertools

    blocks = simhash_blocks(sim, widths)
    out = []
    for cid, idxs in enumerate(itertools.combinations(range(len(widths)), combo)):
        key = 0
        for i in idxs:
            key = (key << widths[i]) | blocks[i]
        out.append((cid, key))
    return out


# ---------------------------------------------------------------------------
# winnowing fingerprints (substring tier, O2 redesigned — see SURVEY §7.0)
# ---------------------------------------------------------------------------
def has_common_substring(a: bytes, b: bytes, min_len: int) -> bool:
    """True iff the two byte strings share a contiguous substring of at
    least `min_len` bytes. O(|a|+|b|) expected: hash every min_len-gram of
    both sides, intersect, then confirm raw bytes (FNV collisions are
    verified away). Used to verify winnowing candidates (stage 4)."""
    if len(a) < min_len or len(b) < min_len:
        return False
    ha = fnv1a64_windows(np.frombuffer(a, dtype=np.uint8), min_len)
    hb = fnv1a64_windows(np.frombuffer(b, dtype=np.uint8), min_len)
    common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
    for pa, pb in zip(ia.tolist(), ib.tolist()):
        if a[pa : pa + min_len] == b[pb : pb + min_len]:
            return True
    if common.size == 0:
        return False
    # all first-occurrence pairs were collisions (astronomically rare):
    # exhaustive confirm on the colliding hash values
    bset = {bytes(b[i : i + min_len]) for i in np.nonzero(np.isin(hb, common))[0]}
    return any(bytes(a[i : i + min_len]) in bset for i in np.nonzero(np.isin(ha, common))[0])


def winnow_fingerprints(norm: bytes, gram_k: int, window: int) -> np.ndarray:
    """Distinct winnowing-selected gram hashes of a normalized document.

    Guarantee (Schleimer et al. 2003): two documents sharing a normalized
    substring of length >= window + gram_k - 1 share at least one selected
    fingerprint. Tie-break: rightmost minimal hash in each window (robust
    winnowing), which is position-aligned inside identical regions.
    """
    buf = np.frombuffer(norm, dtype=np.uint8)
    grams = fnv1a64_windows(buf, gram_k)
    return winnow_select(grams, window)


def winnow_select(grams: np.ndarray, window: int) -> np.ndarray:
    """Winnowing selection over a precomputed gram-hash sequence (the
    batched stage-1 kernel computes all documents' grams in one FNV pass
    and selects per document through this shared step)."""
    if grams.size == 0:
        return np.empty(0, dtype=np.uint64)
    if grams.size <= window:
        # shorter than one window: select the global (rightmost) min
        rev_idx = grams.size - 1 - int(np.argmin(grams[::-1]))
        return grams[rev_idx : rev_idx + 1].copy()
    win = np.lib.stride_tricks.sliding_window_view(grams, window)
    j = window - 1 - np.argmin(win[:, ::-1], axis=1)  # rightmost min per window
    pos = np.unique(np.arange(win.shape[0]) + j)
    return np.unique(grams[pos])
