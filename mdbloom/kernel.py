"""Bit-sliced slab kernel — the NumPy heart of every index strategy.

A *slab* is the transposed ("bit-sliced") layout of N packed filters:
``uint64[m, ceil(N/64)]`` where word ``(b, s)`` holds bit ``b`` of filters
``64s .. 64s+63``. This is the distributed re-expression of the reference's
FlatBloofi index (`FlatBloofi.java:55-60`: per 64-filter block a long[m];
search ANDs only the k query-bit rows, `FlatBloofi.java:188-205`) — except
vectorized across the whole partition instead of 64 filters at a time.

Containment-search cost is O(k * N/64) word-ANDs, identical to the
reference's documented cost, but executed as ~k fused NumPy array ops.
"""

from __future__ import annotations

import numpy as np

from mdbloom import bits as B

U64 = B.U64


def build_slab(filters: np.ndarray, m: int) -> np.ndarray:
    """(N, W) packed filters -> (m, S) slab, S = ceil(N/64).

    Bit transpose without the naive strided repack: per 4096-filter block
    (intermediates stay cache-resident — this machine showed parallel
    NumPy collapses when every worker streams MB-scale temporaries),
    unpack rows sequentially, pack along the FILTER axis (axis=0, byte
    i holds filters 8i..8i+7 — little bit order matches the slab word
    layout), then one small (m, C/8) byte transpose + a uint64 view. No
    per-filter Python (contrast the reference's per-insert `setBloomAt`,
    `FlatBloofi.java:108-112` — we build whole partitions at once)."""
    n = filters.shape[0]
    s = (n + 63) >> 6
    out = np.zeros((m, s * 8), dtype=np.uint8)
    chunk = 4096                                  # multiple of 64
    for lo in range(0, n, chunk):
        sub = filters[lo:lo + chunk]
        c = sub.shape[0]
        bit_matrix = B.unpack(sub, m)             # (C, m) uint8, sequential
        p8 = np.packbits(bit_matrix, axis=0, bitorder="little")  # (C/8, m)
        out[:, lo >> 3: (lo >> 3) + p8.shape[0]] = p8.T
    return out.reshape(m, s, 8).view(U64).reshape(m, s)


def slab_to_filters(slab: np.ndarray, n: int) -> np.ndarray:
    """Inverse of :func:`build_slab` — (m, S) slab + slot count -> (N, W)."""
    m = slab.shape[0]
    if n == 0:
        return B.zeros(m, 0)
    bit_matrix = B.unpack(slab, n)               # (m, N)
    return B.pack_bits_matrix(bit_matrix.T)      # (N, W)


def query_slab(slab: np.ndarray, query_bits: np.ndarray, n_slots: int) -> np.ndarray:
    """Containment search: slots whose filter has ALL query bits set.

    ANDs the k query-bit rows (`FlatBloofi.java:190-196`) and decodes the
    surviving slot bits. Empty query matches every slot (the container's
    empty-hasher semantics, `ContainerImpl.java:159-169`)."""
    if n_slots == 0:
        return np.empty(0, dtype=np.int64)
    query_bits = np.asarray(query_bits, dtype=np.int64)
    if query_bits.size == 0:
        return np.arange(n_slots, dtype=np.int64)
    # early-exit guard (reference O3: RangePacked.java:184-188)
    acc = np.bitwise_and.reduce(slab[query_bits], axis=0)
    if not acc.any():
        return np.empty(0, dtype=np.int64)
    hits = np.flatnonzero(B.unpack(acc, n_slots))
    return hits.astype(np.int64)


def query_slab_batch(slab: np.ndarray, bits_concat: np.ndarray,
                     offsets: np.ndarray,
                     n_slots: int) -> tuple[np.ndarray, np.ndarray]:
    """Q containment queries against ONE slab in one vectorized pass —
    the batched form of :func:`query_slab` (`FlatBloofi.java:188-205`
    amortized over a query batch).

    ``bits_concat`` is every query's bit positions concatenated;
    ``offsets[q]`` is where query q's segment starts (reduceat
    convention: segment q = ``bits_concat[offsets[q]:offsets[q+1]]``).
    Every segment must be non-empty — empty (match-all) queries are
    handled at the container level, not here. A row gather + a
    ``bitwise_and.reduceat`` + a 2-D unpack replaces the per-query
    Python loop: returns (query_idx, slot) pairs for every hit.

    Queries are processed in blocks sized so the gathered row matrix
    stays ~1 MB: one whole-batch gather materializes tens of MB of
    temporaries per task, and with every core running a worker that
    turns the scan memory-bandwidth-bound (measured on this host:
    whole-batch form had ZERO 8→32-core scaling; the cache-blocked
    form restores it). Cache-resident blocks keep the kernel
    compute-bound, which is what scales on a real cluster node too."""
    if n_slots == 0 or offsets.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    n_q = offsets.size
    total_k = bits_concat.size
    s_words = slab.shape[1]
    # rows-per-block so gather ≈ 1 MB; ≥1 query per block always
    rows_budget = max(1, (1 << 20) // max(1, s_words * 8))
    avg_k = max(1, total_k // n_q)
    block = max(1, rows_budget // avg_k)
    q_parts, s_parts = [], []
    for b0 in range(0, n_q, block):
        b1 = min(b0 + block, n_q)
        lo = offsets[b0]
        hi = offsets[b1] if b1 < n_q else total_k
        rows = slab[bits_concat[lo:hi]]            # (<=rows_budget, S)
        acc = np.bitwise_and.reduceat(rows, offsets[b0:b1] - lo, axis=0)
        live = acc.any(axis=1)                     # early-exit rows
        if not live.any():
            continue
        hitmat = B.unpack(acc[live], n_slots)      # (Q_live, n_slots)
        li, slots = np.nonzero(hitmat)
        q_parts.append(np.flatnonzero(live)[li] + b0)
        s_parts.append(slots)
    if not q_parts:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return (np.concatenate(q_parts).astype(np.int64),
            np.concatenate(s_parts).astype(np.int64))


def query_slab_exact(slab: np.ndarray, query: np.ndarray, m: int,
                     n_slots: int) -> np.ndarray:
    """Exact (bit-for-bit) match against a slab: all query bits set AND all
    non-query bits clear — the FlatBloofi exact-get semantics over ALL m
    bit-columns including zero bits (`FlatBloofi.java:114-150`)."""
    if n_slots == 0:
        return np.empty(0, dtype=np.int64)
    qbits = np.flatnonzero(B.unpack(query, m)).astype(np.int64)
    cand = query_slab(slab, qbits, n_slots)
    if cand.size == 0:
        return cand
    zero_rows = np.setdiff1d(np.arange(m, dtype=np.int64), qbits, assume_unique=True)
    if zero_rows.size == 0:
        return cand
    union_zero = np.bitwise_or.reduce(slab[zero_rows], axis=0)
    zero_hit = B.unpack(union_zero, n_slots)     # slots with ANY extra bit
    return cand[zero_hit[cand] == 0]


def linear_search(filters: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Row-layout containment scan (reference Linear index,
    `Linear.java:134-140`): O(N * W) vectorized AND+compare."""
    if filters.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    return np.flatnonzero(B.contains(filters, query)).astype(np.int64)


def summary_filter(filters: np.ndarray, m: int) -> np.ndarray:
    """OR of all filters — the Bloofi-tree inner-node summary used for
    hierarchical/partition pruning (reference Trie inner nodes store the
    union along paths implicitly; our distributed analogue is SURVEY §2.3
    I5). A query can only match inside a partition whose summary contains
    every query bit."""
    if filters.shape[0] == 0:
        return B.zeros(m)
    return np.bitwise_or.reduce(filters, axis=0)


def gate_counts(filters: np.ndarray, m: int) -> np.ndarray:
    """Counting-gate vector: per-bit count of filters having that bit set
    (re-expression of the container's CountingBloomFilter gate,
    `ContainerImpl.java:58-61,92-93`). Sum-mergeable across partitions;
    supports deletion by subtraction."""
    if filters.shape[0] == 0:
        return np.zeros(m, dtype=np.int64)
    return B.unpack(filters, m).astype(np.int64).sum(axis=0)


def gate_contains(counts: np.ndarray, query_bits: np.ndarray) -> bool:
    """Gate short-circuit: every query bit has count > 0
    (`ContainerImpl.java:115,138,171`)."""
    query_bits = np.asarray(query_bits, dtype=np.int64)
    if query_bits.size == 0:
        return True
    return bool(np.all(counts[query_bits] > 0))
