"""Cuckoo filter core — batch-vectorized numpy re-expression.

Semantics follow the reference ``efficient/cuckoofilter``
(``src/cuckoofilter.h``, ``src/singletable.h``):

- 4-way set-associative buckets (``kTagsPerBucket=4``,
  ``src/singletable.h:17``), tag width ``f`` bits, tag value domain
  ``[1, 2^f-1]`` with 0 reserved for "empty slot"
  (``src/cuckoofilter.h:59-64``).
- two candidate buckets per key: ``i1`` from the upper 32 hash bits,
  ``i2 = i1 ^ (tag * 0x5bd1e995)`` — a self-inverse, so kickouts work
  from (bucket, tag) alone (``src/cuckoofilter.h:66-79``).
- insert: first empty slot in ``i1`` else ``i2``; else a kick chain of
  at most ``MAX_CUCKOO_KICKS=500`` random evictions
  (``src/cuckoofilter.h:23,139-162``, ``src/singletable.h:190-204``);
  on exhaustion the in-flight tag parks in a single-slot victim cache
  and the insert still reports Ok (``src/cuckoofilter.h:158-161``);
  further Adds refuse with NotEnoughSpace while the victim is occupied
  (``:129-131``).
- ``num_items`` counts only table-resident tags — never the victim
  (``src/cuckoofilter.h:150`` vs ``:158-161``); deleting the victim
  does not decrement (``:205`` is commented out in the reference).
- zero false negatives by construction; false positives at rate
  ~``2b/2^f``.

Differences from the reference, by design (documented, deliberate):

- storage is one uint16/uint32 lane per slot in a ``(buckets, 4)``
  numpy array — the bit-packed little-endian layout
  (``src/singletable.h:66-122``) exists only in the *reported*
  ``packed_size_bytes`` parity metric; numpy gathers replace SWAR
  probes (``src/bitsutil.h:8-19``).
- hash seeds and the kick-slot RNG are explicit/seeded (the reference
  uses ``std::random_device`` + unseeded ``rand()`` — not reproducible,
  ``src/hashutil.h:53-62``, ``src/singletable.h:199``). Deterministic
  seeds are what make distributed shard filters mergeable.
- ``merge`` is new (the reference is single-machine): re-insert every
  non-zero tag of B starting at its own bucket (the alt index is
  recoverable via the involution). Merge can overflow — it surfaces
  victim-parking / NotEnoughSpace identically to Add, never silently
  drops a tag.
- inserts are *batch* operations: one unique-bucket placement round per
  vector step instead of a per-item loop. The placement distribution
  differs from the reference's strictly-sequential order but every
  membership guarantee (no false negatives, load factor, victim
  semantics) is preserved.
"""

from __future__ import annotations

import enum
import struct
from dataclasses import dataclass

import numpy as np

from cuckoofilter_spark.core.hashing import (
    FAMILY_IDS,
    FAMILY_NAMES,
    HASH_FAMILIES,
    alt_index,
    index_hash,
    tag_hash,
    upperpower2,
)

ASSOC = 4                # kTagsPerBucket, src/singletable.h:17


def _occupied_pairs(table: np.ndarray):
    """(bucket_idx uint64, tag uint32) of every non-zero slot.

    Round 8: scan whole BUCKETS first (each 4-slot row viewed as one
    or two uint64 words), then extract slots only for the occupied
    buckets — a 2-D ``np.nonzero`` over the raw slots was ~2/3 of the
    whole k-way merge on low-load shard tables (shards sized for the
    GLOBAL key count run at a few % load, so almost every bucket is
    all-zero and the word scan skips it 8 slots at a time)."""
    words = table.view(np.uint64)          # (nb, 1) u16 or (nb, 2) u32
    if words.shape[1] == 1:
        occ = np.flatnonzero(words.reshape(-1))
    else:
        occ = np.flatnonzero(words.any(axis=1))
    sub = table[occ]
    s_idx, s_slot = np.nonzero(sub)
    return occ[s_idx].astype(np.uint64), sub[s_idx, s_slot].astype(np.uint32)
MAX_CUCKOO_KICKS = 500   # kMaxCuckooCount, src/cuckoofilter.h:23
_HARD_KICK_CAP = 5000    # never drop a tag silently: raise past this
_MAGIC = b"CKF1"


def suggest_capacity(
    n_keys: int, *, num_shards: int = 1, target_load: float = 0.85,
) -> int:
    """The ``max_num_keys`` to pass to a (shard) filter constructor so
    that ``n_keys`` total distinct keys — hash-split uniformly over
    ``num_shards`` filters that will later MERGE — insert without
    overflow and the merged table stays at ≤ ``target_load``.

    Encodes the merged-load rule in ONE place instead of caller-side
    ``n * 1.3`` math: a single filter inserts reliably to ~0.96 load
    (the reference pre-doubles there, src/cuckoofilter.h:92-95), but a
    MERGE re-inserts the smaller table's tags into whatever slots
    remain, so the post-merge load must leave kick-out room — 0.85 is
    the measured safe line (operators/build.py module notes). On top:
    per-shard binomial imbalance (a uniform hash split is Binomial(n,
    1/s); mean + 6σ covers it past the 1e-9 quantile) and a +64
    additive floor for tiny builds. The constructor's power-of-two
    rounding usually adds further slack; this bound is what makes
    ``check_add_statuses``'s loud overflow failure RARE, not merely
    loud."""
    import math

    if n_keys < 0:
        raise ValueError(f"n_keys must be >= 0, got {n_keys}")
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    if not 0.0 < target_load <= 0.96:
        raise ValueError(
            f"target_load must be in (0, 0.96], got {target_load}"
        )
    mean = n_keys / num_shards
    per_shard = mean + 6.0 * math.sqrt(mean) + 64.0
    return max(64, int(math.ceil(per_shard / target_load)))


class Status(enum.IntEnum):
    """Reference Status enum, same numeric values (src/cuckoofilter.h:15-20)."""

    Ok = 0
    NotFound = 1
    NotEnoughSpace = 2
    NotSupported = 3


@dataclass
class Victim:
    index: int = 0
    tag: int = 0
    used: bool = False


class CuckooFilter:
    """Single-table cuckoo filter over uint64 keys, batch-first API.

    API: ``add_many / contains_many / delete_many / merge / to_bytes /
    from_bytes`` plus scalar ``add / contain / delete`` convenience.
    """

    KIND = "cuckoo"

    def __init__(self, max_num_keys: int, bits_per_item: int = 12,
                 seed: int = 2014, hash_family: str = "multiply_shift"):
        if bits_per_item not in (2, 4, 8, 12, 16, 32):
            raise ValueError(f"unsupported fingerprint width f={bits_per_item}")
        if hash_family not in HASH_FAMILIES:
            raise ValueError(
                f"unknown hash_family {hash_family!r}; "
                f"choose from {sorted(HASH_FAMILIES)}"
            )
        self.f = int(bits_per_item)
        self.seed = int(seed)
        self.hash_family = hash_family
        # sizing formula, src/cuckoofilter.h:89-98
        num_buckets = upperpower2(max(1, max_num_keys // ASSOC))
        frac = max_num_keys / (num_buckets * ASSOC)
        if frac > 0.96:
            num_buckets <<= 1
        self.num_buckets = num_buckets
        dtype = np.uint32 if self.f > 16 else np.uint16
        self.table = np.zeros((num_buckets, ASSOC), dtype=dtype)
        self.num_items = 0
        self.victim = Victim()
        self.hasher = HASH_FAMILIES[hash_family](seed)
        self._rng = np.random.Generator(np.random.PCG64(seed ^ 0x9E3779B9))
        self.kicks = 0  # build-stat: total evictions performed (not serialized)

    # ----------------------------------------------------------------- sizing
    @property
    def size(self) -> int:
        """Items stored in the table (excludes the victim) — Size()."""
        return self.num_items

    @property
    def size_in_tags(self) -> int:
        return self.num_buckets * ASSOC

    @property
    def packed_size_bytes(self) -> int:
        """Reference SingleTable byte count for space-parity reporting:
        kBytesPerBucket * num_buckets (src/singletable.h:18-19,48-50)."""
        return ((self.f * ASSOC + 7) >> 3) * self.num_buckets

    @property
    def load_factor(self) -> float:
        return self.num_items / self.size_in_tags

    @property
    def bits_per_item(self) -> float:
        return 8.0 * self.packed_size_bytes / self.num_items if self.num_items else 0.0

    def info(self) -> str:
        """Human-readable stats, shape of reference Info() (src/cuckoofilter.h:223-236)."""
        return (
            f"CuckooFilter Status:\n"
            f"\t\tSingleHashtable with tag size: {self.f} bits\n"
            f"\t\tAssociativity: {ASSOC}\n"
            f"\t\tHashtable size: {self.packed_size_bytes >> 10} KB\n"
            f"\t\tKeys stored: {self.num_items}\n"
            f"\t\tLoad factor: {self.load_factor:.4f}\n"
            f"\t\tbit/key:   {self.bits_per_item:.2f} bits\n"
        )

    # ------------------------------------------------------------- hashing
    def _index_tag(self, keys: np.ndarray):
        hv = self.hasher.hash64(np.ascontiguousarray(keys, dtype=np.uint64))
        i1 = index_hash(hv, self.num_buckets)
        tag = tag_hash(hv, self.f)
        return i1, tag

    # -------------------------------------------------------------- insert
    _ADD_CHUNK = 1 << 18  # keys per internal insert round

    def add_many(self, keys: np.ndarray) -> np.ndarray:
        """Insert a batch; returns a Status int array aligned with keys.

        Internally chunked: one giant batch driven to ~95% load would
        hand the placement machinery an eviction queue larger than the
        remaining free space (the vectorized multi-chain kicker then
        refuses and every chain degrades to the sequential per-item
        path — measured 25x slower). Fixed-size chunks keep each
        round's spill small enough to stay on the vectorized path."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        n = len(keys)
        statuses = np.full(n, int(Status.Ok), dtype=np.int8)
        if n == 0:
            return statuses
        step = self._ADD_CHUNK
        for s in range(0, n, step):
            if self.victim.used:
                statuses[s:] = int(Status.NotEnoughSpace)
                break
            e = min(n, s + step)
            i1, tag = self._index_tag(keys[s:e])
            statuses[s:e] = self._insert_tags(i1, tag)
        return statuses

    def _insert_tags(
        self, idx: np.ndarray, tags: np.ndarray, must_place: bool = False
    ) -> np.ndarray:
        """Batched AddImpl (src/cuckoofilter.h:139-162).

        Vectorized fast path: per round, one item per distinct bucket
        is placed into an empty slot of its current bucket (phase 0 =
        at i1, phase 1 = at i2) — this covers the overwhelming
        majority of inserts. Items whose both buckets are full fall to
        a *sequential* kick-chain (mirroring the reference's one-Add-
        at-a-time eviction loop), so at most one chain is in flight
        and the single-slot victim semantics hold exactly: the first
        exhausted chain parks its in-flight tag, and subsequent items
        are refused with NotEnoughSpace before any mutation.

        ``must_place=True`` (merge path): tags are already logically
        resident, a refusal would silently drop them → raise instead.
        """
        n = len(idx)
        out = np.full(n, int(Status.Ok), dtype=np.int8)
        inserted = 0

        # Fused dual-bucket claim loop (round-6, replacing the two
        # sequential i1-then-i2 phases): per round, one item per
        # distinct bucket claims a free slot (claim-stamp scatter,
        # O(q) per round, no sort); a winner whose bucket is full
        # flips to its ALT bucket inside the same queue instead of
        # waiting for a whole second phase, so both candidate buckets
        # are handled by one shrinking vectorized loop and only
        # both-buckets-full items reach the kick machinery.
        placed, cur_idx, cur_tag, owner = self._bulk_place_dual(idx, tags)
        inserted += placed

        if len(cur_idx):
            # both buckets full → eviction chains
            free_slots = self.size_in_tags - (self.num_items + inserted)
            safe = (not self.victim.used) and free_slots >= 2 * len(cur_idx) + 64
            if safe:
                # vectorized multi-chain kicking: all chains advance one
                # kick per round (unique buckets per round → no write
                # conflicts). Occupancy-neutral per kick; each chain ends
                # in an empty-slot placement. In this headroom regime a
                # 500-kick exhaustion is ~impossible; any stragglers fall
                # back to the exact sequential path below. After this
                # call every original queue tag is table-resident except
                # the returned leftovers, which carry displaced *resident*
                # tags: they can be parked (victim) but NEVER dropped.
                leftovers = self._batched_kick(cur_idx, cur_tag)
                inserted += len(cur_idx) - len(leftovers)
                for bucket, tag in leftovers:
                    if self.victim.used:
                        raise RuntimeError(
                            "cuckoo filter overflow: victim occupied while a "
                            "displaced resident tag is in flight — refusing to "
                            "drop it (grow capacity or lower the load factor)"
                        )
                    if self._kick_chain(bucket, tag) == "placed":
                        inserted += 1
            else:
                # low-headroom regime: reference-faithful single-Add
                # eviction with exact single-slot victim semantics
                for j in range(len(cur_idx)):
                    if self.victim.used:
                        if must_place:
                            raise RuntimeError(
                                "cuckoo merge overflow: victim occupied — "
                                "refusing to silently drop a resident tag"
                            )
                        out[owner[j]] = int(Status.NotEnoughSpace)
                        continue
                    result = self._kick_chain(int(cur_idx[j]), int(cur_tag[j]))
                    if result == "placed":
                        inserted += 1
                    # "victim": occupancy-neutral (new tag in, displaced
                    # tag parked); owner still gets Ok
                    # (src/cuckoofilter.h:158-161)

        self.num_items += inserted
        return out

    def _claim_buf(self) -> np.ndarray:
        """Reusable bucket-claim scratch (int32 per bucket), allocated
        lazily on the ADD path only — probe-only filters never pay for
        it. Entries are always written before being read within a
        round, so no clearing between rounds/calls is needed."""
        buf = getattr(self, "_claim", None)
        if buf is None or len(buf) != self.num_buckets:
            buf = np.full(self.num_buckets, -1, dtype=np.int32)
            self._claim = buf
        return buf

    @staticmethod
    def _swar_first_empty(w: np.ndarray):
        """(has_empty_mask, lane_shift) for a batch of uint64 bucket
        words — the reference ``haszero16`` trick (src/bitsutil.h:8-19).
        Flag bits above the LOWEST zero lane can be spurious (borrow
        propagation), so only the lowest set flag is used — which is
        exactly the first-empty-slot semantic we need."""
        m = (w - CuckooFilter._SWAR_LOW) & ~w & CuckooFilter._SWAR_HIGH
        has = m != 0
        lb = m & (np.uint64(0) - m)             # lowest empty-lane flag
        # lb has one bit set at position 15/31/47/63 (or is 0); the
        # de Bruijn-style multiply places the lane number k in the top
        # 2 bits: (lb>>15) in {1,2^16,2^32,2^48}, and _SWAR_DB packs
        # (k<<4) at bit 62-16k — 3 array passes vs 6 for the previous
        # three-comparison sum. lb==0 rows yield shift 0, never used
        # (has is False there).
        shift = ((lb >> np.uint64(15)) * CuckooFilter._SWAR_DB) >> np.uint64(58)
        return has, shift

    def _stamp_buf(self, q: int) -> np.ndarray:
        """Reusable arange scratch for claim stamps (sliced per round
        instead of re-allocated)."""
        buf = getattr(self, "_stamp", None)
        if buf is None or len(buf) < q:
            buf = np.arange(max(q, self._ADD_CHUNK), dtype=np.int32)
            self._stamp = buf
        return buf[:q]

    def _bulk_place_dual(self, idx: np.ndarray, tags: np.ndarray):
        """Fused claim-round empty-slot fill over BOTH candidate
        buckets: per round, one item per distinct bucket wins
        (claim-stamp scatter, O(q)); losers retry next round; a winner
        whose bucket is FULL moves to its alt bucket within the same
        queue (phase bit) — a second full-bucket win spills it to the
        kick machinery. The expected round count is the max
        batch-internal bucket multiplicity — a small constant for
        chunked random keys — so the whole pass is ~O(n) (this
        replaced a two-phase structure that re-traversed every
        i1-spilled item from scratch, and before that an O(n log n)
        stable argsort).

        uint16 tables take the SWAR word path: one uint64 gather + ~6
        word ops per bucket instead of a (q,4) row gather + 3 lane
        reductions.

        Returns ``(n_placed, spill_idx, spill_tag, spill_owner)`` —
        the spilled items' ALT (i2) bucket as uint64, their tags, and
        their positions in the input batch (for status reporting).

        Dtype discipline (round-6): the whole queue lives in 32-bit
        lanes — bucket ``b`` as uint32 (num_buckets <= 2^32 always:
        index_hash masks 32 hash bits), tag as uint32, and
        owner+phase packed into one int32 (owner < _ADD_CHUNK = 2^18,
        phase in bit 30) — halving the scatter/gather/compaction
        traffic of every round vs the previous int64 lanes."""
        table = self.table
        n = len(idx)
        # owner|phase packing puts the phase flag at bit 30 — a batch
        # >= 2^30 would silently corrupt owner indices. All callers
        # chunk at _ADD_CHUNK; keep the invariant loud. ValueError,
        # not assert: python -O strips asserts and would revert to the
        # silent corruption this guard exists to prevent (r7 ADVICE).
        if n >= (1 << 30):
            raise ValueError(
                "batch too large for int32 owner|phase lanes "
                f"(n={n} >= 2^30); chunk at _ADD_CHUNK"
            )
        claim = self._claim_buf()
        words = table.dtype == np.uint16
        t64 = table.reshape(-1).view(np.uint64) if words else None
        b = idx.astype(np.uint32)
        tg = tags.astype(np.uint32, copy=False)
        st = np.arange(n, dtype=np.int32)   # owner | phase << 30
        _PH = np.int32(1 << 30)
        # uint32-wrapping alt-index constants — formula-identical to
        # hashing.alt_index (i ^ (tag * 0x5bd1e995), masked); any
        # divergence would place tags where the probe side never
        # looks and fail the zero-FN suites loudly
        _ALT_C = np.uint32(0x5BD1E995)
        _BMASK = np.uint32(self.num_buckets - 1)
        placed = 0
        sp_b: list[np.ndarray] = []
        sp_t: list[np.ndarray] = []
        sp_o: list[np.ndarray] = []
        while len(b):
            q = len(b)
            stamp = self._stamp_buf(q)
            claim[b] = stamp                    # last writer wins
            win = claim[b] == stamp
            wi = np.flatnonzero(win)
            wb = b[wi]
            if words:
                w = t64[wb]
                has, shift = self._swar_first_empty(w)
                hasi = np.flatnonzero(has)
                if len(hasi):
                    wbh = wb[hasi]
                    # the target lane is zero → OR suffices, no mask
                    t64[wbh] = w[hasi] | (
                        tg[wi[hasi]].astype(np.uint64) << shift[hasi]
                    )
                    placed += len(hasi)
            else:
                rows = table[wb]
                empty = rows == 0
                has = empty.any(axis=1)
                slot = empty.argmax(axis=1)
                hasi = np.flatnonzero(has)
                if len(hasi):
                    table[wb[hasi], slot[hasi]] = (
                        tg[wi[hasi]].astype(table.dtype)
                    )
                    placed += len(hasi)
            fw = wi[~has]                       # winners, bucket full
            if len(fw):
                at1 = (st[fw] & _PH) != 0
                fb1 = fw[at1]                   # full at i2 → spill
                if len(fb1):
                    sp_b.append(b[fb1].astype(np.uint64))
                    sp_t.append(tg[fb1])
                    sp_o.append((st[fb1] & ~_PH).astype(np.int64))
                fb0 = fw[~at1]                  # full at i1 → go to i2
                if len(fb0):
                    b[fb0] = (b[fb0] ^ (tg[fb0] * _ALT_C)) & _BMASK
                    st[fb0] |= _PH
            else:
                fb0 = fw
            # next queue = claim losers + winners that flipped to i2
            # (index concat — no q-sized keep mask / scatter pass)
            ki = np.flatnonzero(~win)
            if len(fb0):
                ki = np.concatenate((ki, fb0))
            if len(ki) < q:
                b, tg, st = b[ki], tg[ki], st[ki]
        if sp_b:
            return (
                placed,
                np.concatenate(sp_b),
                np.concatenate(sp_t),
                np.concatenate(sp_o),
            )
        return (
            placed,
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.uint32),
            np.empty(0, dtype=np.int64),
        )

    _KICK_TAIL = 48  # below this queue length, scalar chains win

    def _batched_kick(self, cur_idx: np.ndarray, cur_tag: np.ndarray) -> list:
        """Advance all eviction chains concurrently, one random kick per
        round per distinct bucket (claim-stamp uniqueness — two chains
        never write the same bucket in a round). Returns chains still
        unplaced after MAX_CUCKOO_KICKS as (bucket, tag) tuples; the
        returned tags are *in-flight displaced resident* tags (never
        droppable). Queues shorter than ``_KICK_TAIL`` finish on scalar
        chains — vector-round overhead dominates tiny queues."""
        table = self.table
        cur_idx = cur_idx.astype(np.uint64, copy=True)
        cur_tag = cur_tag.astype(np.uint32, copy=True)
        counts = np.zeros(len(cur_idx), dtype=np.int32)
        leftovers: list[tuple[int, int]] = []
        claim = self._claim_buf()

        words = table.dtype == np.uint16
        t64 = table.reshape(-1).view(np.uint64) if words else None
        while len(cur_idx) > self._KICK_TAIL:
            q = len(cur_idx)
            ar = np.arange(q, dtype=np.int32)
            b = cur_idx.astype(np.int64)
            claim[b] = ar
            winm = claim[b] == ar
            sel = np.flatnonzero(winm)
            bw = b[sel]
            if words:
                w = t64[bw]
                has, shift = self._swar_first_empty(w)
                if has.any():
                    t64[bw[has]] = w[has] | (
                        cur_tag[sel[has]].astype(np.uint64) << shift[has]
                    )
            else:
                rows = table[bw]
                empty = rows == 0
                has = empty.any(axis=1)
                slot = empty.argmax(axis=1)
                if has.any():
                    table[bw[has], slot[has]] = (
                        cur_tag[sel[has]].astype(table.dtype)
                    )
            kick = sel[~has]
            defer = np.flatnonzero(~winm)
            if len(kick):
                kb = b[kick]
                kslot = self._rng.integers(0, ASSOC, size=len(kick))
                self.kicks += len(kick)
                if words:
                    s16 = kslot.astype(np.uint64) << np.uint64(4)
                    wk = t64[kb]
                    old = ((wk >> s16) & np.uint64(0xFFFF)).astype(np.uint32)
                    t64[kb] = (wk & ~(np.uint64(0xFFFF) << s16)) | (
                        cur_tag[kick].astype(np.uint64) << s16
                    )
                else:
                    old = table[kb, kslot].astype(np.uint32)
                    table[kb, kslot] = cur_tag[kick].astype(table.dtype)
                ni = alt_index(cur_idx[kick], old, self.num_buckets)
                kc = counts[kick] + 1
                over = kc > MAX_CUCKOO_KICKS
                if over.any():
                    for j in np.flatnonzero(over):
                        leftovers.append((int(ni[j]), int(old[j])))
                    keep = ~over
                    old, ni, kc = old[keep], ni[keep], kc[keep]
                cur_idx = np.concatenate([cur_idx[defer], ni])
                cur_tag = np.concatenate([cur_tag[defer], old])
                counts = np.concatenate([counts[defer], kc])
            else:
                cur_idx = cur_idx[defer]
                cur_tag = cur_tag[defer]
                counts = counts[defer]

        for j in range(len(cur_idx)):
            left = self._kick_chain_int(
                int(cur_idx[j]), int(cur_tag[j]), int(counts[j])
            )
            if left is not None:
                leftovers.append(left)
        return leftovers

    def _kick_chain_int(self, bucket: int, tag: int, count0: int = 0):
        """Scalar kick chain on plain python ints (no per-step numpy
        temporaries). Returns None when placed, else the in-flight
        (bucket, tag) after MAX_CUCKOO_KICKS."""
        table = self.table
        mask = self.num_buckets - 1
        dt = table.dtype.type
        for _ in range(count0, MAX_CUCKOO_KICKS):
            row = table[bucket]
            for s in range(ASSOC):
                if not row[s]:
                    row[s] = dt(tag)
                    return None
            slot = int(self._rng.integers(0, ASSOC))
            self.kicks += 1
            old = int(row[slot])
            row[slot] = dt(tag)
            tag = old
            bucket = (bucket ^ ((tag * 0x5BD1E995) & 0xFFFFFFFF)) & mask
        return (bucket, tag)

    def _kick_chain(self, bucket: int, tag: int) -> str:
        """One sequential eviction chain, ≤ MAX_CUCKOO_KICKS random
        kicks (src/cuckoofilter.h:139-162, src/singletable.h:198-202)."""
        table = self.table
        cur_idx, cur_tag = bucket, tag
        for _count in range(MAX_CUCKOO_KICKS):
            row = table[cur_idx]
            empties = np.flatnonzero(row == 0)
            if len(empties):
                row[empties[0]] = table.dtype.type(cur_tag)
                return "placed"
            slot = int(self._rng.integers(0, ASSOC))
            self.kicks += 1
            old = int(row[slot])
            row[slot] = table.dtype.type(cur_tag)
            cur_tag = old
            cur_idx = int(
                alt_index(
                    np.array([cur_idx], dtype=np.uint64),
                    np.array([cur_tag], dtype=np.uint32),
                    self.num_buckets,
                )[0]
            )
        self.victim = Victim(index=cur_idx, tag=cur_tag, used=True)
        return "victim"

    # --------------------------------------------------------------- lookup
    _SWAR_LOW = np.uint64(0x0001000100010001)
    _SWAR_HIGH = np.uint64(0x8000800080008000)
    # (lane_shift << 4) packed for the _swar_first_empty de Bruijn
    # multiply: bits 42-47 = 16, 26-31 = 32, 10-15 = 48, top 6 = 0
    _SWAR_DB = np.uint64((16 << 42) | (32 << 26) | (48 << 10))
    _PROBE_CHUNK = 1 << 15  # cache-blocking: see contains_many

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized Contain (src/cuckoofilter.h:166-185): victim check
        then a two-bucket probe. Never a false negative.

        For ≤16-bit tags the whole 4-slot bucket is one uint64 word and
        the probe is the reference's SWAR ``hasvalue16``
        (src/bitsutil.h:8-19, src/singletable.h:124-149) vectorized
        over the batch — one gather + ~6 word ops per bucket instead
        of a (n,4) row gather + lane compare (~2x faster).

        Cache-blocked: the hash + SWAR pipeline is ~16 elementwise
        passes over 8-byte-per-key temporaries, so un-chunked batches
        run at DRAM speed; 32k-key chunks keep the working set in L2
        (table gathers hit LLC either way) — measured 1.5x on the
        1M-key conext-figure5 sweep (18.9 -> 29.6 M lookups/s)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        out = np.empty(n, dtype=bool)
        swar = self.table.dtype == np.uint16
        t64 = self.table.reshape(-1).view(np.uint64) if swar else None
        v_used = self.victim.used
        v_idx = np.uint64(self.victim.index) if v_used else None
        v_tag = np.uint32(self.victim.tag) if v_used else None
        for s in range(0, n, self._PROBE_CHUNK):
            e = min(n, s + self._PROBE_CHUNK)
            i1, tag = self._index_tag(keys[s:e])
            i2 = alt_index(i1, tag, self.num_buckets)
            if swar:
                pat = tag.astype(np.uint64) * self._SWAR_LOW
                v1 = t64[i1.astype(np.int64)] ^ pat
                v2 = t64[i2.astype(np.int64)] ^ pat
                hit = (
                    ((v1 - self._SWAR_LOW) & ~v1 & self._SWAR_HIGH) != 0
                ) | (
                    ((v2 - self._SWAR_LOW) & ~v2 & self._SWAR_HIGH) != 0
                )
            else:
                t = tag.astype(self.table.dtype)[:, None]
                hit = (self.table[i1.astype(np.int64)] == t).any(axis=1)
                hit |= (self.table[i2.astype(np.int64)] == t).any(axis=1)
            if v_used:
                hit |= (tag == v_tag) & ((i1 == v_idx) | (i2 == v_idx))
            out[s:e] = hit
        return out

    # --------------------------------------------------------------- delete
    def delete_many(self, keys: np.ndarray) -> np.ndarray:
        """Delete one tag copy per key (src/cuckoofilter.h:189-219).

        Caller must guarantee membership, else a fingerprint-colliding
        item may be removed (reference README.md:21). Returns Status
        array. Sequential per-item semantics (duplicates delete one
        copy each); row ops are numpy but the outer loop is per-item —
        delete is not the hot path.
        """
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        out = np.full(len(keys), int(Status.Ok), dtype=np.int8)
        if len(keys) == 0:
            return out
        i1s, tags = self._index_tag(keys)
        i2s = alt_index(i1s, tags, self.num_buckets)
        table = self.table
        for k in range(len(keys)):
            t = table.dtype.type(tags[k])
            done = False
            for b in (int(i1s[k]), int(i2s[k])):
                row = table[b]
                m = np.flatnonzero(row == t)
                if len(m):
                    row[m[0]] = 0
                    self.num_items -= 1
                    done = True
                    break
            if done:
                self._try_eliminate_victim()
                continue
            if (
                self.victim.used
                and tags[k] == self.victim.tag
                and (int(i1s[k]) == self.victim.index or int(i2s[k]) == self.victim.index)
            ):
                # victim delete does NOT decrement num_items
                # (commented-out decrement, src/cuckoofilter.h:205)
                self.victim.used = False
                continue
            out[k] = int(Status.NotFound)
        return out

    def _try_eliminate_victim(self) -> None:
        """Re-insert a parked victim into the just-freed space
        (src/cuckoofilter.h:211-218)."""
        if self.victim.used:
            self.victim.used = False
            idx = np.array([self.victim.index], dtype=np.uint64)
            tg = np.array([self.victim.tag], dtype=np.uint32)
            self._insert_tags(idx, tg)

    # ---------------------------------------------------------------- merge
    def merge(self, other: "CuckooFilter", dedup: bool = False) -> "CuckooFilter":
        """In-place union with a same-geometry, same-seed filter.

        Re-inserts every non-zero tag of ``other`` at its current
        bucket (phase>=1 so the chain may evict) — valid because the
        alt index is recoverable from (bucket, tag) alone. Raises on
        geometry/seed mismatch; surfaces overflow via victim parking or
        RuntimeError exactly like Add.

        ``dedup=True`` is **set-mode** merge (not in the reference —
        merge itself is new, §2.1 of SURVEY.md): a tag of ``other`` is
        skipped when the same fingerprint already sits in either of its
        two legal buckets of ``self``, and duplicate (bucket-pair, tag)
        entries across both inputs collapse to one copy. Membership
        answers are identical to multiset merge — any key mapping to
        that (bucket, tag) pair still hits — but hot keys inserted into
        many shards no longer pile up 8+ copies and overflow the
        4-slot buckets. This is what makes a distributed *set*
        membership build shuffle-free: per-partition distinct + dedup
        tree-merge. Counting deletes degrade (one stored copy per
        fingerprint), so multiset mode stays the default.
        """
        if (
            other.f != self.f
            or other.num_buckets != self.num_buckets
            or other.seed != self.seed
            or other.hash_family != self.hash_family
        ):
            raise ValueError(
                "merge requires identical geometry, seed and hash family"
            )
        if self.victim.used:
            raise RuntimeError("merge into a full filter (victim occupied)")
        idx, tags = _occupied_pairs(other.table)
        if len(idx):
            if dedup:
                idx, tags = self._dedup_pairs(idx, tags)
            if len(idx):
                # phase=1: these tags are already "resident somewhere
                # valid"; start at their current bucket, eviction allowed.
                self._merge_insert(idx, tags)
        if other.victim.used:
            v_idx = np.array([other.victim.index], dtype=np.uint64)
            v_tag = np.array([other.victim.tag], dtype=np.uint32)
            if dedup:
                v_idx, v_tag = self._dedup_pairs(v_idx, v_tag)
            if len(v_idx):
                self._merge_insert(v_idx, v_tag)
        return self

    @classmethod
    def merge_many(cls, filters: list, dedup: bool = True) -> "CuckooFilter":
        """Vectorized k-way merge — the tree-merge group kernel.

        Stacks all k tables into one (buckets, 4k) array, dedups equal
        tags within each bucket (set mode), bulk-writes every bucket
        that fits its ≤4 survivors, and routes only the overflow tags
        through the insert/kick machinery. Replaces k-1 pairwise
        merges of per-tag re-insertion — at typical shard loads almost
        every bucket fits and the merge is a handful of array passes.

        Set-mode scope note: dedup collapses equal tags in the SAME
        bucket; a fingerprint resident at i1 in one shard and i2 in
        another keeps both copies (harmless for membership, costs one
        slot). The pairwise ``merge(dedup=True)`` has identical
        observable semantics.
        """
        if not filters:
            raise ValueError("merge_many of zero filters")
        base = filters[0]
        if base.victim.used:
            raise RuntimeError("merge into a full filter (victim occupied)")
        idx_parts: list[np.ndarray] = []
        tag_parts: list[np.ndarray] = []
        for f in filters[1:]:
            if (f.f != base.f or f.num_buckets != base.num_buckets
                    or f.seed != base.seed
                    or f.hash_family != base.hash_family):
                raise ValueError(
                    "merge requires identical geometry, seed and hash family"
                )
            b_idx, tags = _occupied_pairs(f.table)
            idx_parts.append(b_idx)
            tag_parts.append(tags)
            if f.victim.used:
                idx_parts.append(np.array([f.victim.index], dtype=np.uint64))
                tag_parts.append(np.array([f.victim.tag], dtype=np.uint32))
        if idx_parts:
            idx = np.concatenate(idx_parts)
            tags = np.concatenate(tag_parts)
            if dedup:
                idx, tags = base._dedup_pairs(idx, tags)
            if len(idx):
                base._merge_insert(idx, tags)
        base.num_items = int((base.table != 0).sum())
        return base

    def _dedup_pairs(self, idx: np.ndarray, tags: np.ndarray):
        """Canonicalize (bucket, tag) pairs, drop duplicates within the
        batch and pairs already present in ``self``'s two legal buckets."""
        alt = alt_index(idx, tags, self.num_buckets)
        canon = np.minimum(idx, alt)
        packed = (canon << np.uint64(32)) | tags.astype(np.uint64)
        # round 8: unique over the packed VALUES (plain sort) instead
        # of return_index (argsort + three gathers) — idx/tags are
        # reconstructable from the packed form, and starting the
        # re-insert at the CANONICAL bucket is equally legal (it is
        # one of the tag's two buckets by construction). Observable
        # membership semantics unchanged; only which of the two legal
        # buckets a survivor starts in.
        packed = np.unique(packed)
        canon = packed >> np.uint64(32)
        tags = (packed & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        idx = canon
        other_b = alt_index(canon, tags, self.num_buckets).astype(np.int64)
        t = tags.astype(self.table.dtype)[:, None]
        present = (self.table[canon.astype(np.int64)] == t).any(axis=1)
        present |= (self.table[other_b] == t).any(axis=1)
        if self.victim.used:
            v_canon = min(
                self.victim.index,
                int(
                    alt_index(
                        np.array([self.victim.index], dtype=np.uint64),
                        np.array([self.victim.tag], dtype=np.uint32),
                        self.num_buckets,
                    )[0]
                ),
            )
            present |= (canon == np.uint64(v_canon)) & (
                tags == np.uint32(self.victim.tag)
            )
        keep = ~present
        return idx[keep], tags[keep]

    def _merge_insert(self, idx: np.ndarray, tags: np.ndarray) -> None:
        # try current bucket first (it IS one of the two legal buckets);
        # must_place: a merge may park ONE victim but never drops a tag.
        # Chunked at _ADD_CHUNK like add_many: _bulk_place_dual packs
        # owner|phase into int32 with the phase flag at bit 30, so one
        # batch must stay < 2^30 items or owner indices would corrupt
        # silently (round-7 ADVICE fix) — and small chunks also keep
        # the eviction queue on the vectorized path.
        step = self._ADD_CHUNK
        for s in range(0, len(idx), step):
            self._insert_tags(
                idx[s:s + step], tags[s:s + step], must_place=True
            )

    # ------------------------------------------------------------ serialize
    def to_bytes(self) -> bytes:
        """Versioned blob; the table section is zlib(level=1)-packed.

        Shard tables sized for the GLOBAL key count run at low local
        load — mostly zero bytes — so light compression shrinks the
        blobs that cross every shuffle/collect/broadcast by 5-20x for
        one cheap pass. kind byte: 0 = raw table, 2 = zlib table."""
        import zlib

        raw = self.table.tobytes()
        packed = zlib.compress(raw, 1)
        kind, body = (2, packed) if len(packed) < len(raw) else (0, raw)
        # family byte sits in a former pad position — older blobs read
        # back as 0 = multiply_shift, the only family they could use
        header = struct.pack(
            "<4sBBBxQQQQIBB2x",
            _MAGIC,
            1,                      # version
            self.f,
            1 if self.victim.used else 0,
            self.num_buckets,
            self.num_items,
            self.seed & 0xFFFFFFFFFFFFFFFF,
            self.victim.index,
            self.victim.tag,
            kind,
            FAMILY_IDS[self.hash_family],
        )
        return header + body

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        import zlib

        hdr_size = struct.calcsize("<4sBBBxQQQQIBB2x")
        (magic, ver, f, v_used, nb, items, seed, v_idx, v_tag, kind,
         family) = struct.unpack("<4sBBBxQQQQIBB2x", blob[:hdr_size])
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad cuckoo blob")
        obj = cls.__new__(cls)
        obj.f = f
        obj.seed = seed
        obj.num_buckets = nb
        obj.hash_family = FAMILY_NAMES[family]
        dtype = np.uint32 if f > 16 else np.uint16
        body = blob[hdr_size:]
        if kind == 2:
            body = zlib.decompress(body)
        obj.table = np.frombuffer(body, dtype=dtype).reshape(nb, ASSOC).copy()
        obj.num_items = items
        obj.victim = Victim(index=v_idx, tag=v_tag, used=bool(v_used))
        obj.hasher = HASH_FAMILIES[obj.hash_family](seed)
        obj._rng = np.random.Generator(np.random.PCG64(seed ^ 0x9E3779B9 ^ items))
        obj.kicks = 0
        return obj

    # ------------------------------------------------- table micro-ops
    # Reference SingleTable parity surface (src/singletable.h §2.2 of
    # SURVEY.md). The batch paths never call these — they exist so a
    # reference user finds the same per-bucket toolkit.
    def read_tag(self, i: int, j: int) -> int:
        """ReadTag(i,j) (src/singletable.h:66-88)."""
        return int(self.table[i, j])

    def write_tag(self, i: int, j: int, tag: int) -> None:
        """WriteTag(i,j,t) (src/singletable.h:91-122)."""
        self.table[i, j] = self.table.dtype.type(tag)

    def find_tag_in_bucket(self, i: int, tag: int) -> bool:
        """FindTagInBucket (src/singletable.h:151-177)."""
        return bool((self.table[i] == self.table.dtype.type(tag)).any())

    def find_tag_in_buckets(self, i1: int, i2: int, tag: int) -> bool:
        """FindTagInBuckets (src/singletable.h:124-149)."""
        return self.find_tag_in_bucket(i1, tag) or self.find_tag_in_bucket(
            i2, tag
        )

    def delete_tag_from_bucket(self, i: int, tag: int) -> bool:
        """DeleteTagFromBucket: zero the first matching slot
        (src/singletable.h:179-188)."""
        m = np.flatnonzero(self.table[i] == self.table.dtype.type(tag))
        if not len(m):
            return False
        self.table[i, m[0]] = 0
        return True

    def insert_tag_to_bucket(self, i: int, tag: int, kickout: bool):
        """InsertTagToBucket: first empty slot wins, else (kickout)
        evict a random slot and return its tag
        (src/singletable.h:190-204). Returns (ok, old_tag|None)."""
        row = self.table[i]
        empties = np.flatnonzero(row == 0)
        if len(empties):
            row[empties[0]] = self.table.dtype.type(tag)
            return True, None
        if kickout:
            slot = int(self._rng.integers(0, ASSOC))
            self.kicks += 1
            old = int(row[slot])
            row[slot] = self.table.dtype.type(tag)
            return False, old
        return False, None

    def num_tags_in_bucket(self, i: int) -> int:
        """NumTagsInBucket (src/singletable.h:206-214)."""
        return int((self.table[i] != 0).sum())

    # ----------------------------------------------------------- scalar API
    def add(self, key: int) -> Status:
        return Status(int(self.add_many(np.array([key], dtype=np.uint64))[0]))

    def contain(self, key: int) -> Status:
        return (
            Status.Ok
            if bool(self.contains_many(np.array([key], dtype=np.uint64))[0])
            else Status.NotFound
        )

    def delete(self, key: int) -> Status:
        return Status(int(self.delete_many(np.array([key], dtype=np.uint64))[0]))
