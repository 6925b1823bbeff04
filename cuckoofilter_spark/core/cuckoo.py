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
    MultiplyShift,
    alt_index,
    index_hash,
    tag_hash,
    upperpower2,
)

ASSOC = 4                # kTagsPerBucket, src/singletable.h:17
MAX_CUCKOO_KICKS = 500   # kMaxCuckooCount, src/cuckoofilter.h:23
_HARD_KICK_CAP = 5000    # never drop a tag silently: raise past this
_MAGIC = b"CKF1"


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

    def __init__(self, max_num_keys: int, bits_per_item: int = 12, seed: int = 2014):
        if bits_per_item not in (2, 4, 8, 12, 16, 32):
            raise ValueError(f"unsupported fingerprint width f={bits_per_item}")
        self.f = int(bits_per_item)
        self.seed = int(seed)
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
        self.hasher = MultiplyShift(seed)
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
    def add_many(self, keys: np.ndarray) -> np.ndarray:
        """Insert a batch; returns a Status int array aligned with keys."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        n = len(keys)
        statuses = np.full(n, int(Status.Ok), dtype=np.int8)
        if n == 0:
            return statuses
        if self.victim.used:
            statuses[:] = int(Status.NotEnoughSpace)
            return statuses
        i1, tag = self._index_tag(keys)
        st = self._insert_tags(i1, tag)
        statuses[:] = st
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
        table = self.table
        inserted = 0
        evict_q: list[tuple[int, int, int]] = []  # (bucket, tag, owner)

        cur_idx = idx.astype(np.uint64, copy=True)
        cur_tag = tags.astype(np.uint32, copy=True)
        owner = np.arange(n)
        # Two bulk phases (i1 then i2), ONE sort each: group items by
        # bucket, rank them within the group, and scatter the r-th
        # arrival of a bucket into that bucket's r-th empty slot. This
        # replaces the old one-placement-per-bucket-per-round loop
        # (O(rounds · n log n)) with O(n log n) total per phase.
        for phase in (0, 1):
            if not len(cur_idx):
                break
            placed, spill = self._bulk_place(cur_idx, cur_tag)
            inserted += placed
            cur_idx, cur_tag, owner = (
                cur_idx[spill], cur_tag[spill], owner[spill],
            )
            if phase == 0 and len(cur_idx):
                cur_idx = alt_index(cur_idx, cur_tag, self.num_buckets)
        for j in range(len(cur_idx)):
            # both buckets full → eviction chain
            evict_q.append((int(cur_idx[j]), int(cur_tag[j]), int(owner[j])))

        if evict_q:
            free_slots = self.size_in_tags - (self.num_items + inserted)
            safe = (not self.victim.used) and free_slots >= 2 * len(evict_q) + 64
            forced: list[tuple[int, int]] = []
            if safe:
                # vectorized multi-chain kicking: all chains advance one
                # kick per round (unique buckets per round → no write
                # conflicts). Occupancy-neutral per kick; each chain ends
                # in an empty-slot placement. In this headroom regime a
                # 500-kick exhaustion is ~impossible; any stragglers fall
                # back to the exact sequential path below. After this
                # call every original queue tag is table-resident.
                leftovers = self._batched_kick(evict_q)
                inserted += len(evict_q) - len(leftovers)
                evict_q = []
                # leftovers carry displaced *resident* tags: they can be
                # parked (victim) but NEVER refused/dropped.
                forced = leftovers
            # sequential kick chains — reference-faithful single-Add
            # eviction with exact single-slot victim semantics
            for bucket, tag in forced:
                if self.victim.used:
                    raise RuntimeError(
                        "cuckoo filter overflow: victim occupied while a "
                        "displaced resident tag is in flight — refusing to "
                        "drop it (grow capacity or lower the load factor)"
                    )
                if self._kick_chain(bucket, tag) == "placed":
                    inserted += 1
            for bucket, tag, own in evict_q:
                if self.victim.used:
                    if must_place:
                        raise RuntimeError(
                            "cuckoo merge overflow: victim occupied — refusing "
                            "to silently drop a resident tag"
                        )
                    out[own] = int(Status.NotEnoughSpace)
                    continue
                result = self._kick_chain(bucket, tag)
                if result == "placed":
                    inserted += 1
                # "victim": occupancy-neutral (new tag in, displaced tag
                # parked); owner still gets Ok (src/cuckoofilter.h:158-161)

        self.num_items += inserted
        return out

    # empty-slot dispatch LUTs indexed by the 4-bit empty mask:
    # _SLOT_LUT[m, r] = slot index of the r-th empty slot, _NEMPTY[m] =
    # number of empty slots. Replaces a per-bucket argsort.
    _SLOT_LUT = np.array(
        [[j for j in range(ASSOC) if m & (1 << j)]
         + [0] * (ASSOC - bin(m).count("1")) for m in range(16)],
        dtype=np.int8,
    )
    _NEMPTY = np.array([bin(m).count("1") for m in range(16)], dtype=np.int8)

    def _bulk_place(self, idx: np.ndarray, tags: np.ndarray):
        """Grouped empty-slot fill: each item lands in its bucket's
        next free slot, honoring arrival order within the batch.

        Returns (n_placed, spill_mask) where ``spill_mask`` marks items
        whose bucket ran out of free slots."""
        table = self.table
        n = len(idx)
        order = np.argsort(idx, kind="stable")
        sidx = idx[order].astype(np.int64)
        # run boundaries on the sorted buckets (cheaper than np.unique,
        # which would sort a second time)
        flag = np.empty(n, dtype=bool)
        flag[0] = True
        np.not_equal(sidx[1:], sidx[:-1], out=flag[1:])
        g_start = np.flatnonzero(flag)
        uniq = sidx[g_start]
        gid = np.cumsum(flag) - 1               # group id per sorted item
        rank = np.arange(n) - g_start[gid]
        rows = table[uniq]                      # (G, 4) gather
        empty = rows == 0
        emask = (
            empty[:, 0].astype(np.int8)
            | (empty[:, 1] << 1) | (empty[:, 2] << 2) | (empty[:, 3] << 3)
        ).astype(np.int64)
        n_empty = self._NEMPTY[emask]
        can = rank < n_empty[gid]
        if can.any():
            g = gid[can]
            slots = self._SLOT_LUT[emask[g], rank[can]]
            table[uniq[g], slots] = tags[order[can]].astype(table.dtype)
        spill = np.zeros(n, dtype=bool)
        spill[order[~can]] = True
        return int(can.sum()), spill

    def _batched_kick(self, evict_q: list) -> list:
        """Advance all eviction chains concurrently, one random kick per
        round per distinct bucket. Returns chains still unplaced after
        MAX_CUCKOO_KICKS as (bucket, tag) tuples; the returned tags are
        *in-flight displaced resident* tags (never droppable)."""
        table = self.table
        cur_idx = np.array([e[0] for e in evict_q], dtype=np.uint64)
        cur_tag = np.array([e[1] for e in evict_q], dtype=np.uint32)
        owners = np.array([e[2] for e in evict_q], dtype=np.int64)
        counts = np.zeros(len(evict_q), dtype=np.int32)
        leftovers: list[tuple[int, int]] = []

        while len(cur_idx):
            order = np.argsort(cur_idx, kind="stable")
            sidx = cur_idx[order]
            first = np.ones(len(sidx), dtype=bool)
            first[1:] = sidx[1:] != sidx[:-1]
            sel = order[first]
            defer = order[~first]

            b = cur_idx[sel].astype(np.int64)
            rows = table[b]
            empty = rows == 0
            has_empty = empty.any(axis=1)
            slot = empty.argmax(axis=1)
            if has_empty.any():
                p = has_empty
                table[b[p], slot[p]] = cur_tag[sel[p]].astype(table.dtype)

            kick = sel[~has_empty]
            new_idx, new_tag, new_cnt, new_own = [], [], [], []
            if len(kick):
                kb = cur_idx[kick].astype(np.int64)
                kslot = self._rng.integers(0, ASSOC, size=len(kick))
                self.kicks += len(kick)
                old = table[kb, kslot].astype(np.uint32)
                table[kb, kslot] = cur_tag[kick].astype(table.dtype)
                ni = alt_index(cur_idx[kick], old, self.num_buckets)
                kc = counts[kick] + 1
                over = kc > MAX_CUCKOO_KICKS
                if over.any():
                    for j in np.flatnonzero(over):
                        leftovers.append((int(ni[j]), int(old[j])))
                    keep = ~over
                    kick, old, ni, kc = kick[keep], old[keep], ni[keep], kc[keep]
                if len(kick):
                    new_idx.append(ni)
                    new_tag.append(old)
                    new_cnt.append(kc)
                    new_own.append(owners[kick])

            cur_idx = np.concatenate([cur_idx[defer]] + new_idx).astype(np.uint64)
            cur_tag = np.concatenate([cur_tag[defer]] + new_tag).astype(np.uint32)
            counts = np.concatenate([counts[defer]] + new_cnt).astype(np.int32)
            owners = np.concatenate([owners[defer]] + new_own)

        return leftovers

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

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized Contain (src/cuckoofilter.h:166-185): victim check
        then a two-bucket probe. Never a false negative.

        For ≤16-bit tags the whole 4-slot bucket is one uint64 word and
        the probe is the reference's SWAR ``hasvalue16``
        (src/bitsutil.h:8-19, src/singletable.h:124-149) vectorized
        over the batch — one gather + ~6 word ops per bucket instead
        of a (n,4) row gather + lane compare (~2x faster)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        i1, tag = self._index_tag(keys)
        i2 = alt_index(i1, tag, self.num_buckets)
        if self.table.dtype == np.uint16:
            t64 = self.table.reshape(-1).view(np.uint64)  # no copy
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
        if self.victim.used:
            v_hit = (tag == np.uint32(self.victim.tag)) & (
                (i1 == np.uint64(self.victim.index)) | (i2 == np.uint64(self.victim.index))
            )
            hit |= v_hit
        return hit

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
        ):
            raise ValueError("merge requires identical geometry and seed")
        if self.victim.used:
            raise RuntimeError("merge into a full filter (victim occupied)")
        b_idx, b_slot = np.nonzero(other.table)
        if len(b_idx):
            idx = b_idx.astype(np.uint64)
            tags = other.table[b_idx, b_slot].astype(np.uint32)
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
                    or f.seed != base.seed):
                raise ValueError("merge requires identical geometry and seed")
            b_idx, b_slot = np.nonzero(f.table)
            idx_parts.append(b_idx.astype(np.uint64))
            tag_parts.append(f.table[b_idx, b_slot].astype(np.uint32))
            if f.victim.used:
                idx_parts.append(np.array([f.victim.index], dtype=np.uint64))
                tag_parts.append(np.array([f.victim.tag], dtype=np.uint32))
        if idx_parts:
            idx = np.concatenate(idx_parts)
            tags = np.concatenate(tag_parts)
            if dedup:
                idx, tags = base._dedup_pairs(idx, tags)
            if len(idx):
                base._insert_tags(idx, tags, must_place=True)
        base.num_items = int((base.table != 0).sum())
        return base

    def _dedup_pairs(self, idx: np.ndarray, tags: np.ndarray):
        """Canonicalize (bucket, tag) pairs, drop duplicates within the
        batch and pairs already present in ``self``'s two legal buckets."""
        alt = alt_index(idx, tags, self.num_buckets)
        canon = np.minimum(idx, alt)
        packed = (canon << np.uint64(32)) | tags.astype(np.uint64)
        _, first = np.unique(packed, return_index=True)
        idx, tags, canon = idx[first], tags[first], canon[first]
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
        # must_place: a merge may park ONE victim but never drops a tag
        self._insert_tags(idx, tags, must_place=True)

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
        header = struct.pack(
            "<4sBBBxQQQQIB3x",
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
        )
        return header + body

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        import zlib

        hdr_size = struct.calcsize("<4sBBBxQQQQIB3x")
        (magic, ver, f, v_used, nb, items, seed, v_idx, v_tag, kind) = struct.unpack(
            "<4sBBBxQQQQIB3x", blob[:hdr_size]
        )
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad cuckoo blob")
        obj = cls.__new__(cls)
        obj.f = f
        obj.seed = seed
        obj.num_buckets = nb
        dtype = np.uint32 if f > 16 else np.uint16
        body = blob[hdr_size:]
        if kind == 2:
            body = zlib.decompress(body)
        obj.table = np.frombuffer(body, dtype=dtype).reshape(nb, ASSOC).copy()
        obj.num_items = items
        obj.victim = Victim(index=v_idx, tag=v_tag, used=bool(v_used))
        obj.hasher = MultiplyShift(seed)
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
