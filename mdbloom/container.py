"""Local (single-process) multidimensional Bloom container.

Re-expression of the reference's public API — `Container.java:36-221`:
``put`` / ``get`` (exact, bit-for-bit) / ``search`` (containment) /
``remove`` / ``getValueCount`` / ``getFilterCount`` — with the orchestration
semantics of `ContainerImpl.java:87-217`:

  * every operation is gated by a counting Bloom filter sized from the
    estimated population (default ``1/p``, `ContainerImpl.java:70-72`);
  * index keys are content-addressed from the filter bytes
    (`ContainerImplTest.java:138-162`), so duplicate filters share one
    index entry and values append (multimap storage,
    `Container.java:171-177`);
  * an empty query matches everything (`ContainerImpl.java:159-169`);
  * ``remove`` deletes a value only when the stored filter matches exactly
    AND the value compares equal; the index entry is dropped when its value
    list empties (`ContainerImpl.java:134-153`).

Index strategies mirror the reference's Index SPI (`Container.java:111-169`)
as NumPy structures; the Spark engine reuses the same kernel per partition.

This module is the *small* end of the engine: it exists for contract parity
tests and driver-side query planning. The distributed path is
``mdbloom.spark``.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

import numpy as np

from mdbloom import bits as B
from mdbloom import kernel as K
from mdbloom.hashing import TokenMaskCache, hash_unique_tokens, km_positions_matrix
from mdbloom.shape import Shape


# ---------------------------------------------------------------- hashers

class Hasher:
    """Shape-agnostic bit-position producer (role of the reference's
    ``Hasher``: the same hasher yields bits for the container shape and the
    differently-sized gate shape, `ContainerImpl.java:92-93,115`)."""

    def bit_positions(self, shape: Shape) -> np.ndarray:
        raise NotImplementedError

    def filter(self, shape: Shape) -> np.ndarray:
        return B.from_bits(self.bit_positions(shape), shape.m)

    @property
    def is_empty(self) -> bool:
        raise NotImplementedError


class TokenHasher(Hasher):
    """Dynamic hasher: one dimension per token (reference ``DynamicHasher``
    usage, `ContainerImplTest.java:77-85` — one ``with()`` per word)."""

    def __init__(self, tokens: Iterable[str]):
        self.tokens = [t for t in tokens]

    def bit_positions(self, shape: Shape) -> np.ndarray:
        if not self.tokens:
            return np.empty(0, dtype=np.int64)
        h1s, h2s = hash_unique_tokens(sorted(set(self.tokens)))
        pos = km_positions_matrix(h1s, h2s, shape)
        return np.unique(pos.ravel())

    @property
    def is_empty(self) -> bool:
        return len(self.tokens) == 0


class PinnedHasher(Hasher):
    """Test hasher pinning explicit bit positions — the role of the
    reference's ``CachingHasher`` fixtures whose (h1, h2=0) pairs pin exactly
    one bit each (`IndexTest.java:68,84-85,104-107`). Positions are taken
    mod the target shape's m (shape-agnostic, like the reference)."""

    def __init__(self, bits: Iterable[int]):
        self.bits = list(bits)

    def bit_positions(self, shape: Shape) -> np.ndarray:
        if not self.bits:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.asarray(self.bits, dtype=np.int64) % shape.m)

    @property
    def is_empty(self) -> bool:
        return len(self.bits) == 0


# ---------------------------------------------------------------- indexes

class BaseIndex:
    """Index SPI: structure over the set of DISTINCT filters
    (`Container.java:111-169`). Keys are content-addressed md5 hex of the
    canonical filter bytes (every reference ``Index.create`` delegates to
    the injected content-addressing function, e.g. `Linear.java:149-151`)."""

    def __init__(self, shape: Shape):
        self.shape = shape

    @staticmethod
    def create(filt: np.ndarray) -> str:
        return B.content_key(filt)

    def get(self, filt: np.ndarray) -> Optional[str]:
        raise NotImplementedError

    def put(self, key: str, filt: np.ndarray) -> None:
        raise NotImplementedError

    def remove(self, key: str) -> None:
        raise NotImplementedError

    def search(self, filt: np.ndarray) -> list[str]:
        raise NotImplementedError

    def get_all(self) -> list[str]:
        raise NotImplementedError

    @property
    def filter_count(self) -> int:
        raise NotImplementedError


class LinearIndex(BaseIndex):
    """Full-scan index (reference `Linear.java:44-163`): stores whole
    filters per entry, search is a vectorized containment scan
    (`Linear.java:134-140`), exact get a key lookup."""

    def __init__(self, shape: Shape):
        super().__init__(shape)
        self._filters: dict[str, np.ndarray] = {}

    def get(self, filt):
        """PHYSICAL exact get: word-compare scan over the stored filters
        (`Linear.java:116-122` compares whole filters, not keys) — one
        vectorized equality over the stacked population. Content keys
        play no part here; equality is on the bits themselves."""
        if not self._filters:
            return None
        keys = list(self._filters)
        stacked = np.stack([self._filters[k] for k in keys])
        eq = np.flatnonzero(np.all(stacked == filt, axis=1))
        return keys[int(eq[0])] if eq.size else None

    def put(self, key, filt):
        self._filters[key] = filt.copy()

    def remove(self, key):
        self._filters.pop(key, None)

    def search(self, filt):
        if not self._filters:
            return []
        keys = list(self._filters)
        stacked = np.stack([self._filters[k] for k in keys])
        hits = K.linear_search(stacked, filt)
        return [keys[i] for i in hits]

    def get_all(self):
        return list(self._filters)

    @property
    def filter_count(self):
        return len(self._filters)


class FlatSlabIndex(BaseIndex):
    """Bit-sliced (transposed) index — reference FlatBloofi
    (`FlatBloofi.java:48-227`), vectorized over the whole population instead
    of 64-filter blocks. Search ANDs the k query-bit rows
    (`FlatBloofi.java:188-205`); exact get scans ALL m bit-columns including
    zero bits (`FlatBloofi.java:114-150`); delete clears the slot's column
    bits and recycles the slot via a free list (`FlatBloofi.java:95-101,
    153-174`). getFilterCount counts LIVE slots — the reference counts
    deleted ones too (`FlatBloofi.java:207-210`), a quirk SURVEY §2.3 says
    not to replicate."""

    def __init__(self, shape: Shape, capacity: int = 64):
        super().__init__(shape)
        cap_words = max(1, (capacity + 63) >> 6)
        self._slab = np.zeros((shape.m, cap_words), dtype=B.U64)
        self._capacity = cap_words << 6
        self._n_slots = 0          # high-water mark
        self._free: list[int] = []
        self._slot_key: dict[int, str] = {}
        self._key_slot: dict[str, int] = {}

    def _grow(self):
        new = np.zeros((self.shape.m, self._slab.shape[1] * 2), dtype=B.U64)
        new[:, : self._slab.shape[1]] = self._slab
        self._slab = new
        self._capacity = new.shape[1] << 6

    def _set_slot(self, slot: int, bit_positions: np.ndarray):
        mask = np.uint64(1) << np.uint64(slot & 63)
        self._slab[bit_positions, slot >> 6] |= mask

    def _clear_slot(self, slot: int):
        mask = ~(np.uint64(1) << np.uint64(slot & 63))
        self._slab[:, slot >> 6] &= mask

    def get(self, filt):
        hits = K.query_slab_exact(self._slab, filt, self.shape.m, self._n_slots)
        live = [int(s) for s in hits if s in self._slot_key]
        if not live:
            return None
        if len(live) > 1:  # unreachable when put dedups, like the reference
            raise RuntimeError("multiple exact matches")
        return self._slot_key[live[0]]

    def put(self, key, filt):
        if key in self._key_slot:
            return  # dedup on put (FlatBloofi.java:153-154)
        slot = self._free.pop() if self._free else self._n_slots
        if slot >= self._capacity:
            self._grow()
        if slot == self._n_slots:
            self._n_slots += 1
        bits_pos = np.flatnonzero(B.unpack(filt, self.shape.m)).astype(np.int64)
        self._set_slot(slot, bits_pos)
        self._slot_key[slot] = key
        self._key_slot[key] = slot

    def remove(self, key):
        slot = self._key_slot.pop(key, None)
        if slot is None:
            return
        self._clear_slot(slot)
        del self._slot_key[slot]
        self._free.append(slot)

    def search(self, filt):
        qbits = np.flatnonzero(B.unpack(filt, self.shape.m)).astype(np.int64)
        hits = K.query_slab(self._slab, qbits, self._n_slots)
        return [self._slot_key[int(s)] for s in hits if int(s) in self._slot_key]

    def get_all(self):
        return list(self._key_slot)

    @property
    def filter_count(self):
        return len(self._key_slot)


class TriePrunedIndex(BaseIndex):
    """Hierarchically pruned index — the distributed analogue of the
    reference's Trie4/Trie8 tree-of-filters (`Trie.java:42-52`,
    `InnerNode.search` `InnerNode.java:118-133`): filters live in fixed-size
    blocks, each block keeps an OR-merged summary filter; a query descends
    only into blocks whose summary contains all query bits, then scans the
    block linearly. This is exactly the per-partition summary + pruning-tree
    scheme the Spark engine uses across partitions (SURVEY §2.3 I5)."""

    BLOCK = 256

    def __init__(self, shape: Shape, block: int | None = None):
        super().__init__(shape)
        self.block = block or self.BLOCK
        self._blocks: list[dict] = []  # {keys: [..], filters: (B,W), summary}
        self._key_block: dict[str, int] = {}

    def _new_block(self):
        self._blocks.append({
            "keys": [],
            "filters": [],
            "summary": B.zeros(self.shape.m),
        })

    def get(self, filt):
        key = self.create(filt)
        return key if key in self._key_block else None

    def put(self, key, filt):
        if key in self._key_block:
            return
        if not self._blocks or len(self._blocks[-1]["keys"]) >= self.block:
            self._new_block()
        blk = self._blocks[-1]
        blk["keys"].append(key)
        blk["filters"].append(filt.copy())
        blk["summary"] = B.merge_or(blk["summary"], filt)
        self._key_block[key] = len(self._blocks) - 1

    def remove(self, key):
        bi = self._key_block.pop(key, None)
        if bi is None:
            return
        blk = self._blocks[bi]
        i = blk["keys"].index(key)
        blk["keys"].pop(i)
        blk["filters"].pop(i)
        # recompute summary (summaries don't support subtraction)
        blk["summary"] = (np.bitwise_or.reduce(np.stack(blk["filters"]), axis=0)
                          if blk["filters"] else B.zeros(self.shape.m))

    def search(self, filt):
        out = []
        for blk in self._blocks:
            if not blk["keys"] or not B.contains(blk["summary"], filt):
                continue  # pruned — query bit missing from the whole block
            stacked = np.stack(blk["filters"])
            for i in K.linear_search(stacked, filt):
                out.append(blk["keys"][int(i)])
        return out

    def get_all(self):
        return list(self._key_block)

    @property
    def filter_count(self):
        return len(self._key_block)


class Trie4Index(BaseIndex):
    """Chunked trie with superset expansion — a from-scratch re-expression
    of the reference's Trie4 (`Trie.java:42-52`, `Trie4.java:53-57`,
    `InnerNode.java:118-133`), NOT the block-summary analogue
    (:class:`TriePrunedIndex`): the filter's m bits are split into
    ``chunk``-bit chunks; a filter IS its root->leaf path of chunk values
    (depth = ceil(m/chunk), `Trie.java:221-223`). Search expands each
    query chunk q to every chunk value v with ``(v & q) == q`` (the
    precomputed superset table, cf. the reference ``nibbleTable``
    generator `Trie8.java:63-71`) and explores all matching branches —
    the documented O(1.5^c * m/c) search (`Trie4.java:30-35`). Exact get
    follows the exact chunk path; delete cascades empty nodes upward
    (`LeafNode.java:74-76`, `InnerNode.java:146-160`).

    Reference quirks intentionally NOT replicated (SURVEY §2.3): we keep
    the estimated-population argument out entirely (Trie8 drops it,
    `Trie8.java:91-93`) and filter_count counts live keys only."""

    def __init__(self, shape: Shape, chunk: int = 4):
        super().__init__(shape)
        self.chunk = chunk
        self.depth = (shape.m + chunk - 1) // chunk
        self._root: dict = {}
        self._key_filter: dict[str, np.ndarray] = {}
        # superset-expansion table: for each query chunk value, every
        # chunk value containing all its bits
        self._sup = [
            [v for v in range(1 << chunk) if (v & q) == q]
            for q in range(1 << chunk)
        ]
        self._weights = (1 << np.arange(chunk, dtype=np.int64))

    def _chunks(self, filt: np.ndarray) -> np.ndarray:
        bits = B.unpack(filt, self.shape.m).astype(np.int64)
        padded = np.zeros(self.depth * self.chunk, dtype=np.int64)
        padded[: self.shape.m] = bits
        return padded.reshape(self.depth, self.chunk) @ self._weights

    def get(self, filt):
        node = self._root
        for ch in self._chunks(filt):
            node = node.get(int(ch))
            if node is None:
                return None
        return node  # leaf: the single key whose filter IS this path

    def put(self, key, filt):
        if key in self._key_filter:
            return  # content-addressed dedup, like every reference index
        chunks = [int(c) for c in self._chunks(filt)]
        node = self._root
        for ch in chunks[:-1]:
            node = node.setdefault(ch, {})
        node[chunks[-1]] = key
        self._key_filter[key] = filt.copy()

    def remove(self, key):
        filt = self._key_filter.pop(key, None)
        if filt is None:
            return
        chunks = [int(c) for c in self._chunks(filt)]
        spine = [self._root]
        for ch in chunks[:-1]:
            spine.append(spine[-1][ch])
        del spine[-1][chunks[-1]]
        # cascade empty nodes upward (InnerNode.java:146-160)
        for lvl in range(len(spine) - 1, 0, -1):
            if spine[lvl]:
                break
            del spine[lvl - 1][chunks[lvl - 1]]

    def search(self, filt):
        qchunks = self._chunks(filt)
        out: list[str] = []
        stack = [(self._root, 0)]
        while stack:
            node, d = stack.pop()
            expand = self._sup[int(qchunks[d])]
            if d == self.depth - 1:
                out.extend(node[v] for v in expand if v in node)
            else:
                stack.extend((node[v], d + 1) for v in expand if v in node)
        return out

    def get_all(self):
        return list(self._key_filter)

    @property
    def filter_count(self):
        return len(self._key_filter)


class BlockedSetIndex(BaseIndex):
    """Byte-granular posting index — re-expression of the reference's
    BlockedSetIndex (`BlockedSetIndex.java:51-314`): instead of per-BIT
    postings (RangePacked) it keeps one posting bitset per (byte
    position, nonzero byte VALUE) pair (`:39-49,95-99,129-136`). Insert
    decomposes the filter into bytes and sets the filter's slot in each
    nonzero byte's posting (`:146-197`). Search: for every nonzero query
    byte, OR the postings of all byte values that CONTAIN it (the
    precomputed ``byteTable`` superset expansion, `:74-90` — value v
    matches query q iff ``(v & q) == q``), then AND across byte
    positions, early-exiting on empty (`:243-292`). Exact get is the
    content-addressed map lookup (`:138-143`).

    Reference quirks intentionally NOT replicated (SURVEY §2.3): a query
    byte whose block has no postings yields the empty set instead of an
    NPE (`:261-262` unguarded), and an all-zero-byte query falls through
    to match-everything semantics at the container level rather than
    NPE-ing (`:290`). Slots are recycled through a free list like
    FlatBloofi."""

    _SUP: list[list[int]] | None = None  # byteTable, built once per process

    def __init__(self, shape: Shape):
        super().__init__(shape)
        if BlockedSetIndex._SUP is None:
            BlockedSetIndex._SUP = [
                [v for v in range(1, 256) if (v & q) == q]
                for q in range(256)]
        self.n_bytes = (shape.m + 7) // 8
        # one {byte_value: posting-bitset-of-slots} dict per byte position
        self._postings: list[dict[int, int]] = [
            {} for _ in range(self.n_bytes)]
        self._busy = 0                      # live-slot bitset
        self._free: list[int] = []
        self._n_slots = 0                   # high-water mark
        self._slot_key: dict[int, str] = {}
        self._key_slot: dict[str, int] = {}
        self._key_bytes: dict[str, bytes] = {}

    def _filter_bytes(self, filt: np.ndarray) -> bytes:
        return B.to_bytes(filt)[: self.n_bytes]

    def get(self, filt):
        # content-addressed lookup (BlockedSetIndex.java:138-143)
        key = self.create(filt)
        return key if key in self._key_slot else None

    def put(self, key, filt):
        if key in self._key_slot:
            return  # content-addressed dedup, like every reference index
        slot = self._free.pop() if self._free else self._n_slots
        if slot == self._n_slots:
            self._n_slots += 1
        fb = self._filter_bytes(filt)
        mask = 1 << slot
        for pos, v in enumerate(fb):
            if v:
                block = self._postings[pos]
                block[v] = block.get(v, 0) | mask
        self._busy |= mask
        self._slot_key[slot] = key
        self._key_slot[key] = slot
        self._key_bytes[key] = fb

    def remove(self, key):
        slot = self._key_slot.pop(key, None)
        if slot is None:
            return
        fb = self._key_bytes.pop(key)
        clear = ~(1 << slot)
        for pos, v in enumerate(fb):
            if v:
                block = self._postings[pos]
                left = block[v] & clear
                if left:
                    block[v] = left
                else:
                    del block[v]
        self._busy &= clear
        del self._slot_key[slot]
        self._free.append(slot)

    def search(self, filt):
        qb = self._filter_bytes(filt)
        answer = self._busy
        for pos, q in enumerate(qb):
            if not q:
                continue  # only nonzero query bytes constrain
            block = self._postings[pos]
            union = 0
            for v in BlockedSetIndex._SUP[q]:
                p = block.get(v)
                if p:
                    union |= p
            answer &= union
            if not answer:
                return []  # early exit (BlockedSetIndex.java:271-285)
        out = []
        while answer:
            low = answer & -answer
            out.append(self._slot_key[low.bit_length() - 1])
            answer ^= low
        return out

    def get_all(self):
        return list(self._key_slot)

    @property
    def filter_count(self):
        # live slots only (busy cardinality, the RangePacked.java:195-198
        # behavior — not FlatBloofi's deleted-slot quirk)
        return len(self._key_slot)


class _BloofiNode:
    """One Bloofi tree node: ``value`` is the bitwise OR of everything
    below it; leaves carry (key, filter) entries, inner nodes carry
    children. Parent pointers let remove() recompute ORs bottom-up."""

    __slots__ = ("value", "children", "keys", "filters", "parent", "leaf")

    def __init__(self, m: int, leaf: bool):
        self.value = B.zeros(m)
        self.leaf = leaf
        self.parent: Optional["_BloofiNode"] = None
        self.children: list["_BloofiNode"] = []
        self.keys: list[str] = []
        self.filters: list[np.ndarray] = []

    def size(self) -> int:
        return len(self.keys) if self.leaf else len(self.children)

    def recompute(self, m: int) -> None:
        parts = self.filters if self.leaf else [c.value for c in self.children]
        self.value = (np.bitwise_or.reduce(np.stack(parts), axis=0)
                      if parts else B.zeros(m))


class BloofiIndex(BaseIndex):
    """Hierarchical Bloofi — the original B+-tree-of-filters (Crainiceanu
    & Lemire, "Bloofi: Multidimensional Bloom filters", Information
    Systems 54, 2015) that the reference's FlatBloofi flattens into a
    bit-sliced array (`FlatBloofi.java:25-31` names the paper; the
    reference ships only the flattened variant). Every inner node stores
    the bitwise OR of its subtree, so a search descends only into
    children whose OR contains all query bits — O(b·log_b N) probes on
    selective queries vs Linear's O(N). Insert uses the paper's
    least-expansion heuristic (route to the child whose OR gains the
    fewest new bits — keeps similar filters clustered so pruning stays
    sharp) and splits any node that exceeds ``order`` children by
    max-Hamming seed pairing with a **minimum-fill bound**: members are
    assigned in descending preference strength and each half is capped
    at ``n - n//2`` so both halves leave with >= n//2 members (the
    paper's balanced split; an unbounded greedy assignment can emit a
    1-member half and degenerate the tree into a chain). Remove
    recomputes OR values bottom-up along the leaf's ancestor path (ORs
    are not subtractable), prunes emptied nodes, and **splices out any
    non-root inner node left with a single child** (child adopts the
    grandparent) so degree-1 chains cannot accumulate under churn —
    together these keep probe depth O(log_order N), regression-tested
    in `test_index_contract.py::test_bloofi_depth_bounded_under_churn`.
    The Spark engine's per-shard OR-summary manifest +
    `prune_shards` (`spark/query.py`) is the two-level distributed
    instance of exactly this structure."""

    ORDER = 16

    def __init__(self, shape: Shape, order: int | None = None):
        super().__init__(shape)
        self.order = order or self.ORDER
        self._root: Optional[_BloofiNode] = None
        self._key_leaf: dict[str, _BloofiNode] = {}

    def get(self, filt):
        key = self.create(filt)
        return key if key in self._key_leaf else None

    # -- insert ----------------------------------------------------------
    def put(self, key, filt):
        if key in self._key_leaf:
            return  # content-addressed dedup, like every reference index
        m = self.shape.m
        if self._root is None:
            self._root = _BloofiNode(m, leaf=True)
        node = self._root
        while not node.leaf:
            node.value = B.merge_or(node.value, filt)
            node = self._route(node, filt)
        node.keys.append(key)
        node.filters.append(filt.copy())
        node.value = B.merge_or(node.value, filt)
        self._key_leaf[key] = node
        if node.size() > self._capacity(node):
            self._split(node)

    def _capacity(self, node: _BloofiNode) -> int:
        """Inner nodes must split into halves of >= 2 children each (a
        1-child half is the seed of a degenerate chain, and B+-tree
        uniform height needs every split to yield two real nodes), so
        an inner node's capacity is never below 3 — it splits at 4+
        children into 2+2. Leaves honor ``order`` exactly (a 1-key leaf
        is legal). For order >= 4 this changes nothing."""
        return self.order if node.leaf else max(self.order, 3)

    @staticmethod
    def _route(node: _BloofiNode, filt: np.ndarray) -> _BloofiNode:
        """Least-expansion child choice (Bloofi paper §3.2): the child
        whose OR-value grows by the fewest bits when ``filt`` joins it."""
        best, best_cost = None, None
        for c in node.children:
            cost = int(B.or_cardinality(c.value, filt)
                       - B.cardinality(c.value))
            if best_cost is None or cost < best_cost:
                best, best_cost = c, cost
        return best

    def _split(self, node: _BloofiNode) -> None:
        m = self.shape.m
        items = (list(zip(node.keys, node.filters)) if node.leaf
                 else node.children)
        vals = [f for _, f in items] if node.leaf else \
               [c.value for c in items]
        # seed pair = the two members with max symmetric difference
        n = len(items)
        si, sj, best = 0, 1, -1
        for i in range(n):
            for j in range(i + 1, n):
                d = int(B.xor_cardinality(vals[i], vals[j]))
                if d > best:
                    si, sj, best = i, j, d
        left = _BloofiNode(m, leaf=node.leaf)
        right = _BloofiNode(m, leaf=node.leaf)
        # Minimum-fill assignment: strongest preferences first, each half
        # capped so the other receives at least n//2 members. Without the
        # cap one seed can absorb everything and leave a 1-member half;
        # repeated over churn that degenerates the tree into a chain.
        cap = n - n // 2
        prefs = []  # (strength desc, index, prefer_left)
        for i in range(n):
            if i in (si, sj):
                continue
            dl = int(B.or_cardinality(vals[si], vals[i])
                     - B.cardinality(vals[si]))
            dr = int(B.or_cardinality(vals[sj], vals[i])
                     - B.cardinality(vals[sj]))
            prefs.append((-abs(dl - dr), i, dl <= dr))
        prefs.sort()
        assign = {si: True, sj: False}
        n_left, n_right = 1, 1
        for _, i, prefer_left in prefs:
            go_left = prefer_left if (n_left < cap and n_right < cap) \
                else (n_left < cap)
            assign[i] = go_left
            n_left, n_right = n_left + go_left, n_right + (not go_left)
        for i, item in enumerate(items):
            tgt = left if assign[i] else right
            if node.leaf:
                k, f = item
                tgt.keys.append(k)
                tgt.filters.append(f)
                self._key_leaf[k] = tgt
            else:
                tgt.children.append(item)
                item.parent = tgt
        left.recompute(m)
        right.recompute(m)
        parent = node.parent
        if parent is None:
            parent = _BloofiNode(m, leaf=False)
            parent.value = node.value
            self._root = parent
        else:
            parent.children.remove(node)
        for half in (left, right):
            half.parent = parent
            parent.children.append(half)
        if parent.size() > self._capacity(parent):
            self._split(parent)

    # -- remove ----------------------------------------------------------
    def remove(self, key):
        leaf = self._key_leaf.pop(key, None)
        if leaf is None:
            return
        i = leaf.keys.index(key)
        leaf.keys.pop(i)
        leaf.filters.pop(i)
        m = self.shape.m
        node: Optional[_BloofiNode] = leaf
        while node is not None:
            parent = node.parent
            if node.size() == 0 and parent is not None:
                parent.children.remove(node)
            elif (not node.leaf and len(node.children) == 1
                  and parent is not None):
                # splice a degree-1 inner node: its only child adopts the
                # grandparent, so chains of single-child inner nodes can
                # never accumulate (Bloofi paper delete keeps nodes >= 2
                # children via merge/redistribute; splicing gives the
                # same depth bound with less machinery)
                child = node.children[0]
                child.parent = parent
                parent.children[parent.children.index(node)] = child
            else:
                node.recompute(m)
            node = parent
        if self._root is not None and self._root.size() == 0:
            self._root = None
        # collapse a single-child root chain so depth tracks population
        while (self._root is not None and not self._root.leaf
               and len(self._root.children) == 1):
            self._root = self._root.children[0]
            self._root.parent = None

    # -- search ----------------------------------------------------------
    def search(self, filt):
        out: list[str] = []
        if self._root is None:
            return out
        stack = [self._root]
        while stack:
            node = stack.pop()
            if not B.contains(node.value, filt):
                continue  # whole subtree pruned
            if node.leaf:
                if node.keys:
                    stacked = np.stack(node.filters)
                    for i in K.linear_search(stacked, filt):
                        out.append(node.keys[int(i)])
            else:
                stack.extend(node.children)
        return out

    def get_all(self):
        return list(self._key_leaf)

    @property
    def filter_count(self):
        return len(self._key_leaf)

    def depth(self) -> int:
        """Max inner levels over all root→leaf paths. Splicing during
        remove() can leave leaves at different depths, so the worst-case
        probe path (what the O(log) claim bounds) is the max, not the
        leftmost spine."""
        if self._root is None:
            return 0
        best, stack = 0, [(self._root, 0)]
        while stack:
            node, d = stack.pop()
            if node.leaf:
                best = max(best, d)
            else:
                stack.extend((c, d + 1) for c in node.children)
        return best


def _trie8(shape: Shape) -> Trie4Index:
    """8-bit-chunk trie — the reference's Trie8 geometry
    (`Trie8.java:57-73`: byteTable superset expansion over 2^8 chunk
    values, depth = ceil(m/8)); same node machinery as Trie4, wider
    chunks, shallower tree."""
    return Trie4Index(shape, chunk=8)


INDEX_STRATEGIES = {
    "linear": LinearIndex,
    "flat": FlatSlabIndex,
    "tree": TriePrunedIndex,
    "trie4": Trie4Index,
    "trie8": _trie8,
    "blocked": BlockedSetIndex,
    "bloofi": BloofiIndex,
}


# ---------------------------------------------------------------- container

class BloomContainer:
    """put / get / search / remove with counting-gate short-circuit and
    multimap storage (`ContainerImpl.java:87-217`)."""

    def __init__(self, shape: Shape, index: str | BaseIndex = "flat",
                 estimated_population: int | None = None):
        self.shape = shape
        self.index = (INDEX_STRATEGIES[index](shape)
                      if isinstance(index, str) else index)
        self.gate_shape = shape.gate_shape(estimated_population)
        self._gate = np.zeros(self.gate_shape.m, dtype=np.int64)
        self._storage: dict[str, list] = {}
        self._value_count = 0

    # -- gate helpers (CountingBloomFilter semantics, ContainerImpl.java:58-61)
    def _gate_bits(self, hasher: Hasher) -> np.ndarray:
        return hasher.bit_positions(self.gate_shape)

    def _gate_contains(self, hasher: Hasher) -> bool:
        return K.gate_contains(self._gate, self._gate_bits(hasher))

    # -- API
    def put(self, hasher: Hasher, value: Any) -> None:
        filt = hasher.filter(self.shape)
        key = self.index.create(filt)
        np.add.at(self._gate, self._gate_bits(hasher), 1)
        self.index.put(key, filt)
        self._storage.setdefault(key, []).append(value)
        self._value_count += 1

    def get(self, hasher: Hasher) -> list:
        """Exact (bit-for-bit) match (`ContainerImpl.java:111-122`)."""
        if not self._gate_contains(hasher):
            return []
        key = self.index.get(hasher.filter(self.shape))
        return list(self._storage.get(key, [])) if key else []

    def search(self, hasher: Hasher) -> list:
        """Containment match; empty hasher matches all
        (`ContainerImpl.java:155-182`)."""
        if hasher.is_empty:
            return [v for key in self.index.get_all()
                    for v in self._storage.get(key, [])]
        if not self._gate_contains(hasher):
            return []
        return [v for key in self.index.search(hasher.filter(self.shape))
                for v in self._storage.get(key, [])]

    def remove(self, hasher: Hasher, value: Any) -> None:
        """Delete only on exact filter match AND value equality
        (`ContainerImpl.java:134-153`)."""
        if not self._gate_contains(hasher):
            return
        filt = hasher.filter(self.shape)
        key = self.index.get(filt)
        if key is None or key not in self._storage:
            return
        values = self._storage[key]
        if value not in values:
            return
        values.remove(value)
        self._value_count -= 1
        np.subtract.at(self._gate, self._gate_bits(hasher), 1)
        if not values:
            del self._storage[key]
            self.index.remove(key)

    @property
    def value_count(self) -> int:
        """`Container.getValueCount` (`Container.java:38-43`)."""
        return self._value_count

    @property
    def filter_count(self) -> int:
        """`Container.getFilterCount` (`Container.java:45-50`)."""
        return self.index.filter_count
