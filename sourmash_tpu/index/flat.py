"""FlatIndex: device-resident flat inverted index + device CounterGather.

The TPU-native replacement for SBT / LCA / RocksDB-RevIndex search
structures (SURVEY §7.4): the collection's sketches live on device as padded
row banks bucketed by length; counter queries, gather rounds and counter
decrements are each one fused device pass (`ops/index_ops.py`). Results are
numerically identical to the host CounterGather
(reference `src/sourmash/index/__init__.py:777-909`) for uniform-scaled
collections, including Counter.most_common tie-breaking (device argmax
breaks ties by lowest dataset id == insertion order).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import Index, IndexSearchResult, CounterGather, _check_select_parameters, select_signature
from ..search import calc_threshold_from_bp
from ..minhash import _get_max_hash_for_scaled
from ..ops.index_ops import build_banks, counts_for_banks


class FlatIndex(Index):
    """In-memory/device flat index over a list of scaled signatures.

    All signatures must share ksize/moltype/seed. Internally downsampled to
    the max scaled across the collection for the device tensors; original
    signature objects are returned in results.
    """

    is_database = True

    def __init__(self, siglist=None, location=None, locations=None):
        self._signatures = list(siglist) if siglist else []
        self._location = location
        # optional per-signature locations (device views over MultiIndex /
        # manifest collections record each signature's source file)
        self._locations = list(locations) if locations is not None else None
        if self._locations is not None:
            assert len(self._locations) == len(self._signatures)
        self._banks = None  # lazy device row banks
        self._banks_dir = None  # optional on-disk packed planes (revindex v3)
        self._ds_mins = None
        self._scaled = None
        self._cuts_cache = None  # (q_scaled, cuts, subj_sizes)
        self._counts_cache = {}  # md5(query mins) -> counts (pop on hit)
        self._all_scaled = None  # lazy: every signature has nonzero scaled
        self._min_subject_scaled = None  # lazy: coarsest-pair fast path
        self._row_lut = None  # lazy: dataset id -> (bank, chunk, row)

    @property
    def location(self):
        return self._location

    def _location_for(self, i):
        "Result location of dataset i (per-signature when recorded)."
        if self._locations is not None:
            return self._locations[i]
        return self._location

    def signatures(self):
        return iter(self._signatures)

    def signatures_with_location(self):
        for i, ss in enumerate(self._signatures):
            yield ss, self._location_for(i)

    def __bool__(self):
        return bool(self._signatures)

    def __len__(self):
        return len(self._signatures)

    def insert(self, ss):
        self._signatures.append(ss)
        if self._locations is not None:
            self._locations.append(None)
        self._banks = None
        self._banks_dir = None  # stale on-disk planes must not be reloaded
        self._row_lut = None
        self._ds_mins = None
        self._scaled = None
        self._cuts_cache = None
        self._counts_cache = {}
        self._all_scaled = None
        self._min_subject_scaled = None

    def save(self, path):
        "Persist as a disk revindex directory (the on-disk form of this index)."
        from .revindex import save_revindex

        return save_revindex(self, path)

    @classmethod
    def load(cls, location):
        "Load a disk revindex directory back as a device-backed index."
        from .revindex import load_revindex

        return load_revindex(location)

    def _as_flat_view(self):
        "A FlatIndex IS the device engine — no view indirection needed."
        return self

    def select(self, **kwargs):
        _check_select_parameters(**kwargs)
        # manifest semantics for containment (reference manifest.py:324)
        containment = kwargs.pop("containment", False)
        keep = [
            i
            for i, ss in enumerate(self._signatures)
            if select_signature(ss, **kwargs)
        ]
        if containment or kwargs.get("scaled"):
            keep = [i for i in keep if self._signatures[i].minhash.scaled]
        locs = (
            [self._locations[i] for i in keep]
            if self._locations is not None
            else None
        )
        return FlatIndex(
            [self._signatures[i] for i in keep], self._location, locations=locs
        )

    # -- device state ------------------------------------------------------

    def _build(self):
        """Materialize the device banks from the RAW (undownsampled) mins.

        Queries are downsampled before counting, and a downsampled query
        can only hit subject hashes below its own cutoff — so plain counts
        against raw banks equal counts against downsampled banks, while
        per-pair cutoff queries (find/search) still see every hash they
        may need when the collection's scaleds are heterogeneous."""
        if self._banks is not None:
            return
        if self._banks_dir is not None:
            # disk revindex v3: packed planes persisted at build time.
            # When the collection FITS the HBM budget, prefer rebuilding
            # from the raw mins (build_banks uploads raw limbs and packs
            # ON DEVICE — ~6x fewer bytes over the host->device link than
            # uploading the disk planes); the mmapped disk planes serve
            # the beyond-HBM case, where they stream per query with no
            # host re-pack.
            from ..ops.index_ops import (
                load_banks,
                planned_banks_resident,
            )

            if self._ds_mins is not None and planned_banks_resident(
                self._ds_mins
            ):
                self._banks = build_banks(self._ds_mins)
                return
            self._banks = load_banks(self._banks_dir)
            return
        if self._ds_mins is not None and self._scaled is not None:
            # preloaded mins (disk revindex): skip re-extracting from sigs
            self._banks = build_banks(self._ds_mins)
            return
        scaleds = {ss.minhash.scaled for ss in self._signatures}
        if 0 in scaleds:
            raise ValueError("FlatIndex requires scaled signatures")
        mins_list = [ss.minhash.mins_array() for ss in self._signatures]
        self._banks = build_banks(mins_list)
        self._ds_mins = mins_list
        self._scaled = max(scaleds)

    def counts_for(self, query_mins: np.ndarray) -> np.ndarray:
        "Overlap counts of the (already downsampled) query with each dataset."
        if self._counts_cache:
            import hashlib

            key = hashlib.md5(
                np.ascontiguousarray(query_mins).tobytes()
            ).digest()
            hit = self._counts_cache.pop(key, None)
            if hit is not None:
                return hit.copy()
        self._build()
        return counts_for_banks(
            self._banks, query_mins, n_datasets=len(self._signatures)
        )

    def _row_lookup(self):
        "Per-dataset (bank idx, chunk idx, row-in-chunk) int32 lookup arrays."
        if self._row_lut is None:
            self._build()
            n = len(self._signatures)
            b = np.full(n, -1, np.int32)
            c = np.full(n, -1, np.int32)
            r = np.full(n, -1, np.int32)
            for bi, bank in enumerate(self._banks):
                for ci, ids in enumerate(bank.ids):
                    ids = np.asarray(ids, dtype=np.int64)
                    b[ids] = bi
                    c[ids] = ci
                    r[ids] = np.arange(len(ids), dtype=np.int32)
            self._row_lut = (b, c, r)
        return self._row_lut

    def warm_gather_counts(self, query_mhs, block: int | None = None) -> None:
        """Precompute counter_gather overlap counts for MANY queries in
        batched device passes (the bank planes stream once per `block`
        queries). Each row lands in a pop-on-hit cache that the next
        `counter_gather(query)` for that query consumes — `multigather`
        warms all its queries up front (reference drives every query
        through per-db prefetch separately,
        `/root/reference/src/sourmash/commands.py:1124+`)."""
        import hashlib

        from ..ops.index_ops import counts_for_banks_batch

        self._build()
        qs = []
        for mh in query_mhs:
            if not mh.scaled:
                continue
            scaled = max(mh.scaled, self._scaled)
            cutoff = np.uint64(_get_max_hash_for_scaled(scaled))
            q = mh.mins_array()
            qs.append(q[q <= cutoff])
        if not qs:
            return
        if block is None:
            # bigger blocks help BOTH residency modes: streamed planes
            # stream once per block, resident planes re-read from HBM once
            # per block, and each dispatch costs a full RTT on a tunneled
            # chip — so the block is bounded only by query-plane memory
            block = 64
            B_max = max(b.B for b in self._banks)
            dq_est = max(
                8, 1 << int(np.ceil(np.log2(
                    max(max((len(q) for q in qs), default=1), 1) / B_max + 1
                )))
            )
            per_q = dq_est * B_max * 8  # hi+lo u32 planes
            block = int(max(1, min(block, (256 << 20) // max(per_q, 1))))
        rows = counts_for_banks_batch(
            self._banks, qs, len(self._signatures), block=block
        )
        for q, row in zip(qs, rows):
            key = hashlib.md5(np.ascontiguousarray(q).tobytes()).digest()
            self._counts_cache[key] = row

    # -- search protocol ---------------------------------------------------

    def find(self, search_fn, query, **kwargs):
        """Batched find against the cached device banks (built once per
        collection), with per-pair scaled cutoffs — the generic
        `_find_batched` path would re-pack every signature on every call."""
        if not self._signatures:
            return
        query_mh = query.minhash
        if self._all_scaled is None:  # cached: this scan cost 30+ ms/query
            self._all_scaled = all(
                ss.minhash.scaled for ss in self._signatures
            )
        if not query_mh.scaled or not self._all_scaled:
            sal = list(self.signatures_with_location())
            yield from self._find_batched(search_fn, query, sal)
            return

        search_fn.check_is_compatible(query)
        self._build()
        from ..ops.index_ops import cutoff_counts_for_banks

        q_scaled = query_mh.scaled
        q_mins = query_mh.mins_array()
        n = len(self._signatures)
        if self._cuts_cache is None or self._cuts_cache[0] != q_scaled:
            cuts = np.zeros(n, dtype=np.uint64)
            for i, ss in enumerate(self._signatures):
                cuts[i] = _get_max_hash_for_scaled(
                    max(q_scaled, ss.minhash.scaled)
                )
            # subject size under the pairwise cutoff: every subject hash
            # already sits below its own max_hash, so when the cutoff is
            # the subject's own (>= its last min) the size is just len —
            # only coarser-than-query subjects need the searchsorted
            subj_sizes = np.fromiter(
                (len(m) for m in self._ds_mins), dtype=np.int64, count=n
            )
            for i in np.nonzero(
                [len(m) > 0 and m[-1] > cuts[i] for i, m in enumerate(self._ds_mins)]
            )[0]:
                subj_sizes[i] = np.searchsorted(
                    self._ds_mins[i], cuts[i], side="right"
                )
            self._cuts_cache = (q_scaled, cuts, subj_sizes)
        _, cuts, subj_sizes = self._cuts_cache
        # (measured: the cutoff kernel outruns the plain-counts kernel on
        # this shape despite doing more logical work — XLA schedules the
        # fused eq&le reduce better — so find always uses it)
        shared = cutoff_counts_for_banks(self._banks, q_mins, cuts, n)
        q_sizes = np.searchsorted(q_mins, cuts, side="right")
        # a zero overlap can only score above a zero threshold; skip the
        # Python loop over the (vast) non-matching tail when it can't pass
        if search_fn.passes(0.0):
            idxs = range(n)
        else:
            idxs = np.nonzero(shared > 0)[0]
        for i in idxs:
            shared_size = int(shared[i])
            query_size = int(q_sizes[i])
            total_size = query_size + int(subj_sizes[i]) - shared_size
            score = search_fn.score_fn(
                query_size, shared_size, int(subj_sizes[i]), total_size
            )
            if search_fn.passes(score):
                if search_fn.collect(score, ss := self._signatures[i]):
                    yield IndexSearchResult(score, ss, self._location_for(i))

    def counter_gather(self, query, threshold_bp, **kwargs):
        "Build a device-backed CounterGather over matches to the query."
        if not hasattr(query, "update"):  # mutable signature
            query = query.to_frozen()
        with query.update() as prefetch_query:
            prefetch_query.minhash = prefetch_query.minhash.flatten()
        if not self:
            raise ValueError("no signatures to search")
        return FlatCounterGather(prefetch_query, self, threshold_bp)


class _MembershipGroup:
    """Per-bank gather state: M [k, dq, B/32] device u32 — BITPACKED
    membership of the query's bucketed slots in k matched datasets — plus
    host maps from hash values to plane slots (for consume masks) and
    back (for union_found)."""

    __slots__ = ("M", "ids", "qh", "qpos", "vals", "dq", "B")

    def __init__(self, M, ids, q_packed):
        from ..ops.bucketed import pack_bits_u32

        self.M = jax.jit(pack_bits_u32)(M)
        self.ids = ids
        hi, lo, cnt, dq, tail = q_packed
        vals = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        self.vals = vals.reshape(-1)  # flat plane position -> hash (PAD empty)
        pos = np.flatnonzero(self.vals != np.uint64(0xFFFFFFFFFFFFFFFF))
        qh = self.vals[pos]
        order = np.argsort(qh)
        self.qh = qh[order]  # sorted plane-resident query hashes
        self.qpos = pos[order]  # their flat plane positions
        self.dq = dq
        self.B = hi.shape[1]


@jax.jit
def _dec_counts(M, R):
    """[k, dq, B/32] bitpacked membership & [dq, B/32] removed-mask
    -> [k] decrements (AND + popcount)."""
    from ..ops.bucketed import popcount_u32

    return jnp.sum(
        popcount_u32(M & R[None]).astype(jnp.int32),
        axis=(1, 2),
        dtype=jnp.int32,
    )


@jax.jit
def _union_rows(M, sel):
    "[k, dq, B/32] bitpacked membership, [k] bool filter -> [dq, B/32] OR."
    return jax.lax.reduce_or(
        jnp.where(sel[:, None, None], M, jnp.uint32(0)), axes=(0,)
    )


import functools


@functools.partial(jax.jit, static_argnames="length")
def _schedule_scan(M, carry, thresh, length, keys=None):
    """`length` greedy rounds over a bitset membership matrix.

    M [k, W] u32: bit j of word w in row k = (query hash 32w+j) in dataset k.
    carry = (alive [W] u32 bitset, counts [k] i32). Each round: argmax ->
    remove the winner's live bits -> decrement every row by its overlap with
    the removed bits (AND + popcount). Emits (best row | -1, count)."""
    from ..ops.bucketed import popcount_u32

    def body(c, _):
        alive_p, cnt = c
        if keys is None:
            best = jnp.argmax(cnt).astype(jnp.int32)
        else:
            # explicit tie-break key: max count, then LOWEST key — makes
            # the scan independent of matrix row order (the on-device
            # membership path emits rows in bank-grouped order)
            score = (cnt.astype(jnp.int64) << jnp.int64(32)) - keys
            best = jnp.argmax(score).astype(jnp.int32)
        bc = cnt[best]
        active = bc >= thresh
        rm = jnp.where(active, M[best], jnp.uint32(0)) & alive_p
        dec = jnp.sum(
            popcount_u32(M & rm[None]).astype(jnp.int32), axis=1, dtype=jnp.int32
        )
        new_cnt = jnp.where(active, jnp.maximum(cnt - dec, 0), cnt)
        return (alive_p & ~rm, new_cnt), (
            jnp.where(active, best, -1),
            jnp.where(active, bc, 0),
        )

    return jax.lax.scan(body, carry, None, length=length)


class FlatCounterGather:
    """Device CounterGather on a query-centric membership matrix.

    At construction, one dense pass over the index produces per-dataset
    overlap counts; matched datasets' intersections with the query are then
    extracted ONCE as bitmask rows over the query's bucketed slots
    (`ops/bucketed.membership_matrix`). Every subsequent gather round is
    tiny: peek = host argmax, consume = one fused AND+popcount matvec over
    the bitmask matrix — the index tensors are never re-scanned, unlike the
    reference's per-round Counter updates over stored intersections
    (reference `src/sourmash/index/__init__.py:777-909`). Observable
    behavior (peek/consume/signatures/union_found, Counter.most_common
    tie-breaking by insertion order == lowest dataset id) is identical.
    """

    def __init__(self, query, index: FlatIndex, threshold_bp):
        query_mh = query.minhash
        if not query_mh.scaled:
            raise ValueError("gather requires scaled signatures")

        self.orig_query_mh = query_mh.copy().flatten()
        index._build()
        self.index = index
        self.scaled = max(query_mh.scaled, index._scaled)

        # query downsampled to common scaled for counting
        cutoff = np.uint64(_get_max_hash_for_scaled(self.scaled))
        q = self.orig_query_mh.mins_array()
        q = q[q <= cutoff]

        counts = index.counts_for(q)
        # apply the prefetch threshold: datasets below threshold_bp overlap
        # with the original query never enter the counter (reference
        # counter_gather uses prefetch(threshold_bp) before CounterGather.add)
        try:
            _, n_threshold_hashes = calc_threshold_from_bp(
                threshold_bp, self.scaled, len(q)
            )
        except ValueError:
            counts = np.zeros_like(counts)
            n_threshold_hashes = None
        if n_threshold_hashes is not None:
            counts = np.where(counts >= max(n_threshold_hashes, 1), counts, 0)
        # host-CounterGather parity for md5-duplicate candidates (reference
        # index/__init__.py:777-806 keys candidates by md5): duplicates
        # collapse to ONE candidate holding the FIRST occurrence's counter
        # position (dict insertion order) but the LAST occurrence's
        # signature object and location (later adds overwrite the dict
        # values). Later duplicates' counts are zeroed; result lookups
        # remap first -> last.
        self._remap = {}
        matched0 = np.nonzero(counts)[0]
        if len(matched0) > 1:
            first_by_md5 = {}
            for i in matched0:
                i = int(i)
                md5 = index._signatures[i].md5sum()
                first = first_by_md5.get(md5)
                if first is None:
                    first_by_md5[md5] = i
                else:
                    counts[i] = 0
                    self._remap[first] = i
        self.counts = counts.astype(np.int64)
        self.query_started = 0
        self._q_mins = q
        self._use_schedule = False
        self._coord = None  # DeviceGatherSchedule when scheduled
        self._coord_idx = 0

        # device membership groups (used by HOST-mode consume) extract
        # lazily: a scheduled gather never touches them, and the eager
        # per-query device extraction dominated multigather's counter
        # construction (~190 ms/query)
        self._groups = None
        self._max_ids = []  # datasets sharing the 2**64-1 hash with the query
        self._q_has_max = bool(len(q)) and q[-1] == np.uint64(0xFFFFFFFFFFFFFFFF)
        self._bitsets_cache = None  # (W, matched ids tuple, M)
        # per-candidate bitset rows: a row depends only on (query slots,
        # dataset id), both fixed for this counter's lifetime — iterative
        # capped rescheduling re-requests mostly-overlapping candidate
        # sets, so rows computed once are reused across reschedules
        self._bitset_rows = {}
        self._bitset_rows_W = None
        # device-membership path caches: per-bank-B packed query planes +
        # index->slot maps (device), and the spill/tail patch COO
        self._dev_qpacks = {}
        self._dev_patch = None

    def _get_groups(self):
        "Device membership groups for host-mode consume, built on demand."
        if self._groups is None:
            from ..ops.index_ops import membership_for_banks

            self._groups = []
            matched = np.nonzero(self.counts)[0]
            if len(matched):
                for bank, q_packed, ids, M in membership_for_banks(
                    self.index._banks, self._q_mins, matched
                ):
                    self._groups.append(_MembershipGroup(M, ids, q_packed))
                if self._q_has_max:
                    for i in matched:
                        m = self.index._ds_mins[int(i)]
                        if len(m) and m[-1] == np.uint64(0xFFFFFFFFFFFFFFFF):
                            self._max_ids.append(int(i))
        return self._groups

    def signatures(self):
        "Return all signatures with nonzero counters."
        for i, c in enumerate(self.counts):
            if c > 0:
                yield self.index._signatures[self._remap.get(i, i)]

    @property
    def union_found(self):
        """Union of all found hashes, intersected with the original query.

        Computed from the HOST membership bitsets (sorted joins over the
        already-resident mins) — no device round-trip; the prefetch sweep
        reads this once per database per query."""
        found_mh = self.orig_query_mh.copy_and_clear()
        q = self._q_mins
        if len(q) and self.counts.any():
            matched, M = self._membership_bitsets(-(-len(q) // 32))
            if len(matched):
                words = np.bitwise_or.reduce(M, axis=0)  # [W]
                bits = (
                    (words[:, None] >> np.arange(32, dtype=np.uint32)) & 1
                ).astype(bool).reshape(-1)[: len(q)]
                found_mh.add_many(q[bits])
        return found_mh

    def downsample(self, scaled):
        if scaled > self.scaled:
            raise ValueError(
                "FlatCounterGather cannot re-downsample after construction"
            )
        return self.scaled

    # -- scheduled device gather (the at-scale product path) --------------

    def enable_device_schedule(self):
        """Precompute the whole greedy round sequence on device instead of
        one peek/consume round-trip per match (single-counter form; the CLI
        uses `schedule_device_gather` to coordinate several databases)."""
        schedule_device_gather([self])

    def _membership_bitsets(self, W):
        """Matched datasets' intersections with the query as flat bitsets:
        (matched ids [k], M [k, W] u32 — bit j of word w in row r =
        (query hash 32w+j) ∈ matched dataset r), built by sorted join.
        Cached per (W, matched set): union_found and the schedule build
        both need it with the same counts."""
        matched = np.nonzero(self.counts > 0)[0]
        hit_cache = self._bitsets_cache
        if (
            hit_cache is not None
            and hit_cache[0] == W
            and np.array_equal(hit_cache[1], matched)
        ):
            return matched, hit_cache[2]
        M = self._bitsets_for(W, matched)
        self._bitsets_cache = (W, matched, M)
        return matched, M

    def _membership_for_ids(self, W, ids):
        "Bitsets for an explicit candidate-id subset (the schedule cap)."
        ids = np.asarray(ids, dtype=np.int64)
        hit_cache = self._bitsets_cache
        if (
            hit_cache is not None
            and hit_cache[0] == W
            and np.array_equal(hit_cache[1], ids)
        ):
            return hit_cache[2]
        return self._bitsets_for(W, ids)

    def _bitsets_for(self, W, matched):
        if len(matched) > 8192:
            # one-shot full-collection requests (host-mode union over every
            # match) would pin the whole matrix in the row cache — compute
            # them directly; the cache exists for the capped reschedule loop
            return self._bitsets_compute(W, matched)
        if self._bitset_rows_W != W:  # q is fixed per counter; guard anyway
            self._bitset_rows = {}
            self._bitset_rows_W = W
        rows = self._bitset_rows
        missing = [int(i) for i in matched if int(i) not in rows]
        if missing:
            part = self._bitsets_compute(W, np.asarray(missing))
            for i, row in zip(missing, part):
                rows[i] = row
        k = len(matched)
        M = np.empty((k, W), dtype=np.uint32)
        for r, i in enumerate(matched):
            M[r] = rows[int(i)]
        return M

    def _bitsets_compute(self, W, matched):
        q = self._q_mins
        k = len(matched)
        M = None
        try:
            from .. import native

            if native.available() and k:
                ds_list = [self.index._ds_mins[int(i)] for i in matched]
                lens = np.fromiter(
                    (len(m) for m in ds_list), dtype=np.int64, count=k
                )
                offs = np.zeros(k + 1, dtype=np.int64)
                np.cumsum(lens, out=offs[1:])
                vals = (
                    np.concatenate(ds_list) if k > 1 else
                    np.asarray(ds_list[0], dtype=np.uint64)
                )
                M = native.membership_bits(q, vals, offs, k, W)
        except Exception:
            M = None
        if M is None:
            # chunked numpy fallback: cap the bool intermediate — a
            # metagenome vs a reference database can match tens of
            # thousands of datasets, and [k, nq] bool at once is GBs
            M = np.zeros((k, W), dtype=np.uint32)
            CHUNK = 1024
            shifts = np.arange(32, dtype=np.uint32)
            for c0 in range(0, k, CHUNK):
                part = matched[c0 : c0 + CHUNK]
                bits = np.zeros((len(part), W * 32), dtype=bool)
                for row, i in enumerate(part):
                    ds = self.index._ds_mins[int(i)]
                    idx = np.searchsorted(q, ds)
                    idx_c = np.minimum(idx, len(q) - 1)
                    hit = q[idx_c] == ds
                    bits[row, idx_c[hit]] = True
                M[c0 : c0 + len(part)] = (
                    bits.reshape(len(part), W, 32).astype(np.uint32) << shifts
                ).sum(-1, dtype=np.uint32)
        return M

    def _device_membership_worthwhile(self, threshold_bp=0):
        """Device membership pays only past a size threshold: below it the
        host bitset build + one small upload beats ~15 extra device
        dispatches. Overridable: SOURMASH_TPU_DEV_MEMBERSHIP=1 forces,
        =0 disables."""
        import os

        force = os.environ.get("SOURMASH_TPU_DEV_MEMBERSHIP")
        if force is not None:
            return bool(int(force)) and self._device_membership_ok()
        if not self._device_membership_ok():
            return False
        k = int(np.count_nonzero(self.counts))
        cap = int(os.environ.get("SOURMASH_TPU_SCHEDULE_CAP", "4096"))
        if cap:
            k = min(k, cap)
        W = -(-len(self._q_mins) // 32)
        # 24 MB: below this the host build + one upload (and the host
        # path's cross-reschedule device row cache) wins on a ~30 MB/s
        # link; the GTDB-scale case (~54 MB per reschedule) stays device
        return k * W * 4 >= (24 << 20)

    def _device_membership_ok(self):
        """Eligible for the on-device membership path: banks built and
        every chunk's planes resident in HBM (streamed banks keep the
        host path)."""
        banks = self.index._banks
        if not banks:
            return False
        return all(
            hasattr(c.hi, "devices") for b in banks for c in b.chunks
        )

    def _qpack_for_B(self, B, W):
        "Cached (query planes, device slotmap) for one bank bucket count."
        hit = self._dev_qpacks.get((B, W))
        if hit is not None:
            return hit
        from ..ops.bucketed import pack_query_bucketed, query_slot_map

        q = self._q_mins
        core = q[:-1] if self._q_has_max else q
        qhi, qlo, qcnt, dq, _tail = pack_query_bucketed(core, B)
        slotmap = jnp.asarray(query_slot_map(core, B, dq, W * 32))
        pack = (qhi, qlo, qcnt, dq, slotmap)
        self._dev_qpacks[(B, W)] = pack
        return pack

    def _membership_patches(self, W):
        """COO patch for hashes the planes cannot represent: subject
        spill-list hashes present in the query, and the 2^64-1 tail for
        datasets in _max_ids. {dataset id: (word idx array, mask array)}."""
        if self._dev_patch is not None:
            return self._dev_patch
        q = self._q_mins
        patch = {}
        if not self._q_has_max and not any(
            c.n_spilled for b in self.index._banks for c in b.chunks
        ):
            self._dev_patch = {}
            return self._dev_patch

        def add_bit(ds, pos):
            w, b = divmod(int(pos), 32)
            words, masks = patch.setdefault(int(ds), ({}, None))
            words[w] = words.get(w, 0) | (1 << b)

        lut_b, lut_c, lut_r = self.index._row_lookup()
        banks = self.index._banks
        for ds in range(len(lut_b)):
            bi = lut_b[ds]
            if bi < 0:
                continue
            chunk = banks[bi].chunks[lut_c[ds]]
            if not chunk.n_spilled:
                continue
            sp = chunk.spills[lut_r[ds]]
            if not len(sp):
                continue
            idx = np.searchsorted(q, sp)
            idx_c = np.minimum(idx, max(len(q) - 1, 0))
            hit = q[idx_c] == sp
            for pos in idx_c[hit]:
                add_bit(ds, pos)
        if self._q_has_max:
            for ds in self._resolve_max_ids():
                add_bit(ds, len(q) - 1)
        self._dev_patch = {
            ds: (
                np.fromiter(words.keys(), dtype=np.int32, count=len(words)),
                np.fromiter(
                    words.values(), dtype=np.uint32, count=len(words)
                ),
            )
            for ds, (words, _) in patch.items()
        }
        return self._dev_patch

    def _resolve_max_ids(self):
        "Dataset ids whose sketch contains the 2^64-1 hash."
        out = []
        for i, m in enumerate(self.index._ds_mins or []):
            if len(m) and m[-1] == np.uint64(0xFFFFFFFFFFFFFFFF):
                out.append(i)
        return out

    def _membership_rows_device(self, ids, W, block: int | None = None):
        """Membership bitsets (sorted-query index space) for an explicit
        candidate-id list, computed ON DEVICE from the resident bank planes
        — no host bitset build, no matrix upload. Returns (M [K, W] u32 in
        bank-GROUPED row order with pow2 block padding, row_src [K] host
        int64 mapping matrix row -> index into `ids`, -1 for pad rows).
        Callers feed the key-based scan, which is row-order independent.
        Spilled hashes and the 2^64-1 tail are patched with a tiny exact
        scatter."""
        from ..ops.bucketed import _membership_bits_packed

        ids = np.asarray(ids, dtype=np.int64)
        k = len(ids)
        lut_b, lut_c, lut_r = self.index._row_lookup()
        banks = self.index._banks
        # group candidate positions by (bank, chunk). The matrix is emitted
        # in GROUPED order with each block padded to a power-of-two row
        # count — every take/kernel call then has one of a handful of
        # compiled shapes (ragged per-query shapes caused an XLA compile
        # per call). row_src maps matrix row -> position in `ids` (-1 for
        # padding); the key-based scan makes row order irrelevant.
        order = np.lexsort((lut_r[ids], lut_c[ids], lut_b[ids]))
        gb = lut_b[ids][order]
        gc = lut_c[ids][order]
        bounds = np.flatnonzero(np.diff(gb.astype(np.int64) << 32 | gc)) + 1
        pieces = []
        row_src_parts = []
        for a, e in zip(
            np.concatenate([[0], bounds]),
            np.concatenate([bounds, [k]]),
        ):
            pos = order[a:e]
            bank = banks[int(gb[a])]
            chunk = bank.chunks[int(gc[a])]
            qhi, qlo, qcnt, dq, slotmap = self._qpack_for_B(bank.B, W)
            if block is None:
                # bound the [block, dq, B] bool transient to ~128 MB,
                # power-of-two so shapes (and compiles) stay classed
                blk = int(min(2048, max(256, (128 << 20) // max(dq * bank.B, 1))))
                blk = 1 << (blk.bit_length() - 1)
            else:
                blk = block
            rows_sel = lut_r[ids[pos]]
            for s in range(0, len(pos), blk):
                sel = rows_sel[s : s + blk]
                n_real = len(sel)
                padded = 1 << max(8, (n_real - 1).bit_length())
                padded = min(padded, blk)
                if padded != n_real:
                    sel = np.concatenate(
                        [sel, np.zeros(padded - n_real, sel.dtype)]
                    )
                selj = jnp.asarray(sel)
                Mc = _membership_bits_packed(
                    qhi, qlo,
                    jnp.take(chunk.hi, selj, axis=0),
                    jnp.take(chunk.lo, selj, axis=0),
                    jnp.take(chunk.cnt, selj, axis=0),
                    slotmap,
                )
                pieces.append(Mc)
                src_part = np.full(padded, -1, dtype=np.int64)
                src_part[:n_real] = pos[s : s + blk]
                row_src_parts.append(src_part)
        M = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        row_src = (
            row_src_parts[0]
            if len(row_src_parts) == 1
            else np.concatenate(row_src_parts)
        )
        patches = self._membership_patches(W)
        if patches:
            rws, cws, msks = [], [], []
            for r, src in enumerate(row_src):
                if src < 0:
                    continue
                p = patches.get(int(ids[src]))
                if p is None:
                    continue
                words, masks = p
                rws.extend([r] * len(words))
                cws.extend(words.tolist())
                msks.extend(masks.tolist())
            if rws:
                # pad to a power-of-two length: ragged patch sizes would
                # compile a fresh gather+scatter per query (row 0/word 0
                # with mask 0 is an exact no-op)
                n_p = len(rws)
                padded = 1 << max(4, (n_p - 1).bit_length())
                rws += [0] * (padded - n_p)
                cws += [0] * (padded - n_p)
                msks += [0] * (padded - n_p)
                ri = jnp.asarray(np.asarray(rws, dtype=np.int32))
                wi = jnp.asarray(np.asarray(cws, dtype=np.int32))
                mk = jnp.asarray(np.asarray(msks, dtype=np.uint32))
                M = M.at[ri, wi].set(M[ri, wi] | mk)
        return M, row_src

    def _recount(self, cur_query_mh, threshold_bp=0):
        """Refresh counter state against the CURRENT query: counts[i] =
        |dataset_i ∩ current query| (the invariant the per-round decrements
        maintain), masked by the initial prefetch-threshold cut AND the
        live threshold — a candidate below the (fixed, uniform-scaled)
        round threshold can never win a future round, and dropping it
        keeps downstream candidate sets small."""
        scaled = max(self.scaled, cur_query_mh.scaled)
        mins = cur_query_mh.downsample(scaled=scaled).mins_array()
        fresh = self.index.counts_for(mins)
        counts = np.where(self.counts > 0, fresh, 0).astype(np.int64)
        if threshold_bp:
            try:
                _, n_th = calc_threshold_from_bp(
                    threshold_bp, scaled, max(len(mins), 1)
                )
            except ValueError:
                n_th = None
            if n_th is not None:
                counts = np.where(counts >= max(n_th, 1), counts, 0)
        self.counts = counts
        self._groups = None  # stale: rebuilt over the surviving actives
        self._bitsets_cache = None

    def _fallback_recount(self, cur_query_mh, threshold_bp=0):
        "Leave scheduled mode with exact counter state (host rounds next)."
        self._use_schedule = False
        self._coord = None
        self._recount(cur_query_mh, threshold_bp)

    def _peek_scheduled(self, cur_query_mh, threshold_bp):
        coord = self._coord
        if not coord.ready:
            coord.compute(threshold_bp)
        cur = coord.current()
        if cur is None:
            if coord.truncated:
                # candidate-capped schedule exhausted with excluded
                # candidates possibly above threshold. Recount + build a
                # fresh capped schedule (consumed clusters collapse out of
                # the ranking); if the last schedule made no progress or
                # we've iterated enough, exact host rounds take over.
                # Expected behavior at huge match counts, not a divergence.
                from ..search import GatherRoundRestart

                if coord._sched and coord.reschedules < 8:
                    coord.reschedule(cur_query_mh, threshold_bp)
                else:
                    coord.fallback(cur_query_mh, threshold_bp)
                raise GatherRoundRestart
            return []
        owner_idx, best, match_size = cur
        if owner_idx != self._coord_idx:
            return []  # another database owns this round

        scaled = max(self.scaled, cur_query_mh.scaled)
        cur_query_mh = cur_query_mh.downsample(scaled=scaled)
        if not cur_query_mh:
            return []
        if cur_query_mh.contained_by(self.orig_query_mh, downsample=True) < 1:
            raise ValueError("current query not a subset of original query")

        try:
            threshold, n_threshold_hashes = calc_threshold_from_bp(
                threshold_bp, scaled, len(cur_query_mh)
            )
        except ValueError:
            return []

        if match_size < n_threshold_hashes:
            return []

        match = self.index._signatures[self._remap.get(best, best)]
        match_mh = match.minhash.downsample(scaled=scaled).flatten()
        intersect_mh = cur_query_mh & match_mh
        if len(intersect_mh) != match_size:
            # the schedule disagrees with live counter state — never abort
            # a long gather over it (the reference's loop can't diverge and
            # never aborts, `/root/reference/src/sourmash/search.py:877-949`);
            # drop every counter back to exact host rounds and make the
            # driver restart the round, so counters peeked earlier in this
            # round (which answered [] as non-owners under the schedule)
            # are re-consulted in host mode
            from ..logging import notify
            from ..search import GatherRoundRestart

            notify(
                "WARNING: scheduled device gather diverged at round "
                f"{coord.pos} (planned overlap {match_size}, actual "
                f"{len(intersect_mh)}); falling back to host gather rounds."
            )
            coord.fallback(cur_query_mh, threshold_bp)
            raise GatherRoundRestart

        cont = cur_query_mh.contained_by(match.minhash, downsample=True)
        assert cont
        assert cont >= threshold

        return (
            IndexSearchResult(
                cont, match, self.index._location_for(self._remap.get(best, best))
            ),
            intersect_mh,
        )

    def peek(self, cur_query_mh, *, threshold_bp=0):
        "Get the next best match without mutating counters."
        self.query_started = 1

        if self._use_schedule:
            return self._peek_scheduled(cur_query_mh, threshold_bp)

        if not self.counts.any():
            return []

        scaled = max(self.scaled, cur_query_mh.scaled)
        cur_query_mh = cur_query_mh.downsample(scaled=scaled)

        if not cur_query_mh:
            return []

        if cur_query_mh.contained_by(self.orig_query_mh, downsample=True) < 1:
            raise ValueError("current query not a subset of original query")

        try:
            threshold, n_threshold_hashes = calc_threshold_from_bp(
                threshold_bp, scaled, len(cur_query_mh)
            )
        except ValueError:
            return []

        best = int(np.argmax(self.counts))
        match_size = int(self.counts[best])
        if match_size == 0 or match_size < n_threshold_hashes:
            return []

        match = self.index._signatures[self._remap.get(best, best)]

        cont = cur_query_mh.contained_by(match.minhash, downsample=True)
        assert cont
        assert cont >= threshold

        match_mh = match.minhash.downsample(scaled=scaled).flatten()
        intersect_mh = cur_query_mh & match_mh

        return (
            IndexSearchResult(
                cont, match, self.index._location_for(self._remap.get(best, best))
            ),
            intersect_mh,
        )

    def consume(self, intersect_mh):
        """Decrement all dataset counters by their overlap with
        intersect_mh: one fused AND+popcount pass over the membership
        matrix per bank group — no index re-scan."""
        self.query_started = 1
        if self._use_schedule:
            # scheduled rounds already applied every removal in-scan; the
            # coordinator advances once all counters have consumed
            self._coord.note_consume()
            return
        if not intersect_mh:
            return
        active = self.counts > 0
        n_active = int(active.sum())
        if not n_active:
            return
        # an intersect at COARSER scaled (another database ratcheted the
        # comparison) needs no downsample: its mins already sit below this
        # counter's cutoff
        if intersect_mh.scaled >= self.scaled:
            mins = intersect_mh.mins_array()
        else:
            mins = intersect_mh.downsample(scaled=self.scaled).mins_array()
        if self._groups is None and n_active <= 256:
            # few candidates (typical after a truncated capped schedule):
            # direct sorted joins on host beat any device dispatch latency
            dec = np.zeros_like(self.counts)
            for i in np.nonzero(active)[0]:
                ds = self.index._ds_mins[int(i)]
                if len(ds) and len(mins):
                    idx = np.searchsorted(ds, mins)
                    np.minimum(idx, len(ds) - 1, out=idx)
                    dec[i] = int(np.count_nonzero(ds[idx] == mins))
            self.counts = np.where(
                active, np.maximum(self.counts - dec, 0), self.counts
            )
            return
        if self._groups is None and n_active > 8192:
            # huge candidate sets: extracting device membership groups
            # costs more than one fused counter pass over the whole index
            # — decrement via counts of the consumed intersection instead
            dec = self.index.counts_for(mins).astype(self.counts.dtype)
            self.counts = np.where(
                active, np.maximum(self.counts - dec, 0), self.counts
            )
            return
        dec = np.zeros_like(self.counts)
        for g in self._get_groups():
            idx = np.searchsorted(g.qh, mins)
            idx_c = np.minimum(idx, len(g.qh) - 1) if len(g.qh) else idx
            hit = len(g.qh) and (g.qh[idx_c] == mins)
            flat = g.qpos[idx_c[hit]] if len(g.qh) else np.zeros(0, np.int64)
            R = np.zeros(g.dq * g.B, dtype=bool)
            R[flat] = True
            Rp = (
                R.reshape(g.dq, g.B // 32, 32).astype(np.uint32)
                << np.arange(32, dtype=np.uint32)
            ).sum(-1, dtype=np.uint32)
            d = np.asarray(_dec_counts(g.M, jnp.asarray(Rp)))
            dec[g.ids] += d[: len(g.ids)]  # M rows are padded to a pow2
        if self._max_ids and len(mins) and mins[-1] == np.uint64(0xFFFFFFFFFFFFFFFF):
            for i in self._max_ids:
                dec[i] += 1
        self.counts = np.where(active, self.counts - dec, self.counts)
        np.maximum(self.counts, 0, out=self.counts)


class DeviceGatherSchedule:
    """Coordinator for the device-scheduled gather over one or more
    FlatCounterGather counters sharing the same query and scaled.

    Every counter's matched-dataset membership bitsets (over the shared
    query's element indices) concatenate counter-major into one [k, W] u32
    matrix; ONE scan replays every greedy round — argmax, winner-bit
    removal, AND+popcount decrements. A global argmax over the
    concatenated rows reproduces the cross-database selection of
    GatherDatabases._select_best exactly (reference
    `src/sourmash/search.py:782-949`): score ties go to the
    earliest-listed database (strict `>`), in-database ties to the lowest
    dataset id (Counter.most_common insertion order) — both are what
    "first index wins" argmax gives at uniform scaled.

    With more than one visible jax device the scan runs SHARDED over all
    of them (`parallel.make_sharded_bitset_scan`): rows split across the
    mesh, winners agreed by pmax over (count, -id) keys, removals
    psum-OR'd — `sourmash gather` rides the mesh whenever hardware is
    present, with the full 25-column GatherResult machinery downstream.
    """

    def __init__(self, counters):
        self.counters = list(counters)
        self._sched = None  # [(counter_idx, dataset_id, count)]
        self.pos = 0
        self._consumed = 0
        self.ready = False
        # candidate-cap state: when the matched set is huge (a cluster-rich
        # reference database can match ~everything), the scan covers only
        # the top-C candidates by initial count; `truncated` marks that
        # exhausting the schedule must fall back to exact host rounds
        # instead of ending the gather
        self._cap_bound = None  # best EXCLUDED candidate's initial count
        self._cap_guard = False  # bound could still pass the threshold
        self.truncated = False
        self.reschedules = 0  # iterative capped scheduling rounds so far
        self._alive_mins = None  # current-query mins after a reschedule
        # device-resident bitset rows reused across reschedules: the
        # re-ranked top-cap candidate sets overlap heavily, and the
        # [k, W] matrix upload is the dominant per-reschedule cost on a
        # bandwidth-limited host->device link
        self._dev_rows = {}  # (counter_idx, dataset_id) -> row in _dev_mat
        self._dev_mat = None  # jnp [n_cached, W] u32
        self._dev_W = None

    def current(self):
        "The (counter_idx, dataset_id, count) of the current round, or None."
        if self._sched is None or self.pos >= len(self._sched):
            return None
        return self._sched[self.pos]

    def note_consume(self):
        "Advance one round once every participating counter has consumed."
        self._consumed += 1
        if self._consumed >= len(self.counters):
            self._consumed = 0
            self.pos += 1

    def fallback(self, cur_query_mh, threshold_bp=0):
        "Drop every counter back to exact host peek/consume rounds."
        self.ready = True
        self.truncated = False
        self._sched = []
        for c in self.counters:
            c._fallback_recount(cur_query_mh, threshold_bp)

    def reschedule(self, cur_query_mh, threshold_bp):
        """Iterative capped scheduling: recount every counter against the
        CURRENT query (consumed clusters collapse, so true remaining
        candidates rise into the top-C) and rebuild a fresh schedule on
        the next peek. Keeps at-scale gathers on the device even when the
        initial candidate ranking is dominated by near-relatives that
        never win."""
        self.reschedules += 1
        scaled = self.counters[0].scaled
        for c in self.counters:
            c._recount(cur_query_mh, threshold_bp)
        self._alive_mins = cur_query_mh.downsample(
            scaled=max(scaled, cur_query_mh.scaled)
        ).mins_array()
        self.ready = False
        self.truncated = False
        self._sched = None
        self.pos = 0
        self._consumed = 0

    def _build_inputs(self, threshold_bp, dev_cached=None, build_mats=True):
        """The scan inputs for this coordinator's query:
        (rows [(counter_idx, dataset_id)], counts [k] i32, alive_p [W]
        u32, thresh, new_keys, M_new) — host membership bitsets are built
        ONLY for `new_keys` (rows not in `dev_cached`; all of them when
        dev_cached is None, in which case M_new is the full matrix in row
        order). Returns None when the query or match set is empty / the
        threshold is unattainable.

        When the matched candidate set exceeds SOURMASH_TPU_SCHEDULE_CAP
        (default 4096), only the top-cap candidates by initial count enter
        the scan, and `_cap_bound` records the best excluded candidate's
        count: a scheduled round whose winner count does not STRICTLY
        exceed the bound cannot be trusted (an excluded candidate might
        have won or tied with a lower id), so the schedule truncates there
        and exact host rounds take over. Rounds well above the bound — the
        typical case — are provably identical to the uncapped scan."""
        import os

        c0 = self.counters[0]
        q = c0._q_mins
        scaled = c0.scaled
        if not len(q):
            return None

        try:
            _, n_th = calc_threshold_from_bp(threshold_bp, scaled, len(q))
        except ValueError:
            return None
        thresh = np.int32(max(n_th, 1))

        W = -(-len(q) // 32)
        # global candidate table, counter-major, ascending id per counter
        per_counter_ids = []
        all_counts = []
        for c in self.counters:
            assert c.scaled == scaled, "schedule requires uniform scaled"
            ids = np.nonzero(c.counts > 0)[0]
            per_counter_ids.append(ids)
            all_counts.append(c.counts[ids])
        k_total = sum(len(ids) for ids in per_counter_ids)
        if not k_total:
            return None
        counts_all = np.concatenate(all_counts).astype(np.int64)

        cap = int(os.environ.get("SOURMASH_TPU_SCHEDULE_CAP", "4096"))
        self._cap_bound = None
        self._cap_guard = False
        keep_mask = None
        if cap and k_total > cap:
            order = np.argsort(-counts_all, kind="stable")
            self._cap_bound = int(counts_all[order[cap]])
            self._cap_guard = self._cap_bound >= int(thresh)
            keep_mask = np.zeros(k_total, dtype=bool)
            keep_mask[order[:cap]] = True

        rows = []  # global row -> (counter_idx, dataset_id)
        mats = []
        new_keys = []
        counts = []
        off = 0
        for ci, (c, ids) in enumerate(zip(self.counters, per_counter_ids)):
            if keep_mask is not None:
                ids = ids[keep_mask[off : off + len(ids)]]
            off += len(per_counter_ids[ci])
            if not len(ids):
                continue
            rows.extend((ci, int(i)) for i in ids)
            counts.append(c.counts[ids])
            if not build_mats:
                continue
            if dev_cached is None:
                need = ids
            else:  # host-build only rows not already resident on device
                need = np.asarray(
                    [i for i in ids if (ci, int(i)) not in dev_cached],
                    dtype=ids.dtype,
                )
            if len(need):
                mats.append(c._membership_for_ids(W, need))
                new_keys.extend((ci, int(i)) for i in need)
        if not rows:
            return None
        if mats:
            M_new = np.concatenate(mats, axis=0) if len(mats) > 1 else mats[0]
        else:
            M_new = np.zeros((0, W), dtype=np.uint32)
        counts = np.concatenate(counts).astype(np.int32)

        alive = np.zeros(W * 32, dtype=bool)
        if self._alive_mins is not None:
            # rescheduled mid-gather: only the CURRENT query's hashes are
            # live (the membership bitsets stay indexed by the original q)
            idx = np.searchsorted(q, self._alive_mins)
            np.minimum(idx, max(len(q) - 1, 0), out=idx)
            hit = q[idx] == self._alive_mins if len(q) else idx < 0
            alive[idx[hit]] = True
        else:
            alive[: len(q)] = True
        alive_p = (
            alive.reshape(W, 32).astype(np.uint32)
            << np.arange(32, dtype=np.uint32)
        ).sum(-1, dtype=np.uint32)
        return rows, counts, alive_p, thresh, new_keys, M_new

    def compute(self, threshold_bp):
        "Build the concatenated membership matrix and run the round scan."
        self.ready = True
        devices = jax.devices()
        multi = len(devices) > 1
        # single-counter resident-bank case: membership bitsets compute ON
        # DEVICE from the bank planes — no host build, no matrix upload
        # (the dominant at-scale (re)schedule cost on bandwidth-limited
        # links); the host path with its row cache remains for streamed
        # banks, multi-counter gathers and the sharded multi-device scan
        dev_membership = (
            not multi
            and len(self.counters) == 1
            and self.counters[0]._device_membership_worthwhile(threshold_bp)
        )
        if not multi:
            q0 = self.counters[0]._q_mins
            W0 = -(-len(q0) // 32) if len(q0) else 0
            if self._dev_W != W0:
                self._dev_rows, self._dev_mat, self._dev_W = {}, None, W0
        built = self._build_inputs(
            threshold_bp,
            dev_cached=None if (multi or dev_membership) else self._dev_rows,
            build_mats=not dev_membership,
        )
        if built is None:
            self._sched = []
            return
        rows, counts, alive_p, thresh, new_keys, M_new = built

        k = len(rows)
        if multi:
            # product multi-device path: rows sharded over every device
            from ..parallel import make_sharded_bitset_scan

            M = M_new  # dev_cached=None: the full matrix in row order
            n_dev = len(devices)
            k_pad = -(-k // n_dev) * n_dev
            if k_pad != k:
                M = np.concatenate(
                    [M, np.zeros((k_pad - k, M.shape[1]), np.uint32)], axis=0
                )
                counts = np.concatenate(
                    [counts, np.zeros(k_pad - k, np.int32)]
                )
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            mesh = Mesh(np.asarray(devices), ("shards",))
            # fewer rounds per dispatch when the candidate set is huge: each
            # scanned round costs O(k*W) u32 ops whether or not the
            # gather is already done
            chunk = int(min(k, 64 if k > 4096 else 256))
            scan = make_sharded_bitset_scan(mesh, chunk)
            # place M/counts sharded ONCE — re-passing host arrays would
            # re-upload the (potentially GB-scale) matrix every chunk
            Mdev = jax.device_put(M, NamedSharding(mesh, P("shards", None)))
            carry = (
                jnp.asarray(alive_p),
                jax.device_put(counts, NamedSharding(mesh, P("shards"))),
            )
            run = lambda c: scan(Mdev, c[0], c[1], jnp.int32(thresh))
        elif dev_membership:
            chunk = int(min(k, 64 if k > 4096 else 256))
            W = alive_p.shape[0]
            Mj, row_src = self.counters[0]._membership_rows_device(
                np.asarray([ds for _ci, ds in rows], dtype=np.int64), W
            )
            # grouped-order matrix: counts/keys align to row_src; the
            # key-based scan restores exact (counter, ascending-id)
            # tie-breaking independent of row order
            K = len(row_src)
            real = row_src >= 0
            counts_g = np.zeros(K, dtype=np.int32)
            counts_g[real] = counts[row_src[real]]
            keys_g = np.full(K, 1 << 40, dtype=np.int64)
            keys_g[real] = row_src[real]  # ids ascend with input position
            row_map = row_src
            carry = (jnp.asarray(alive_p), jnp.asarray(counts_g))
            keys_j = jnp.asarray(keys_g)
            run = lambda c: _schedule_scan(Mj, c, thresh, chunk, keys_j)
        else:
            # fewer rounds per dispatch when the candidate set is huge: each
            # scanned round costs O(k*W) u32 ops whether or not the
            # gather is already done
            chunk = int(min(k, 64 if k > 4096 else 256))
            # upload only rows the device hasn't seen; reschedules re-rank
            # mostly-overlapping candidate sets, so after the first compute
            # the matrix is assembled by a device-side row take
            if len(new_keys):
                Mn = jnp.asarray(M_new)
                base = 0 if self._dev_mat is None else self._dev_mat.shape[0]
                self._dev_mat = (
                    Mn if self._dev_mat is None
                    else jnp.concatenate([self._dev_mat, Mn], axis=0)
                )
                for j, kk in enumerate(new_keys):
                    self._dev_rows[kk] = base + j
            idxs = np.fromiter(
                (self._dev_rows[kk] for kk in rows), dtype=np.int32, count=k
            )
            if len(self._dev_rows) == k and np.array_equal(
                idxs, np.arange(k, dtype=np.int32)
            ):
                Mj = self._dev_mat  # first compute: already in row order
            else:
                Mj = jnp.take(self._dev_mat, jnp.asarray(idxs), axis=0)
            carry = (jnp.asarray(alive_p), jnp.asarray(counts))
            run = lambda c: _schedule_scan(Mj, c, thresh, chunk)

        schedule = []
        while True:
            carry, (bests, bcs) = run(carry)
            b_np, c_np = np.asarray(bests), np.asarray(bcs)
            done = False
            for b, c in zip(b_np, c_np):
                if b < 0:
                    done = True
                    break
                if self._cap_guard and int(c) <= self._cap_bound:
                    # a round at or below the best excluded candidate's
                    # initial count is no longer provably correct
                    done = True
                    break
                ci, ds = rows[
                    int(row_map[int(b)]) if dev_membership else int(b)
                ]
                schedule.append((ci, ds, int(c)))
            if done or len(schedule) >= k:
                break
        # with a guard bound, ANY end of the capped schedule (early stop,
        # natural end, exhaustion) may leave excluded candidates above the
        # threshold — exhausting it falls back to exact host rounds
        self.truncated = bool(self._cap_guard)
        self._sched = schedule


def _membership_rows_device_batch(
    counters, ids_list, W, bq: int = 32, cap_slice: int = 512
):
    """Batched on-device membership bitsets: Q single-counter queries over
    ONE shared FlatIndex with resident banks.

    Returns (M [Q, K, W] device u32 in bank-grouped order with pow2-sliced
    padding — K identical for every query — and row_srcs: per-query host
    int64 [K] mapping matrix row -> position in ids_list[q], -1 for pads).
    Device-call count scales with bank CHUNKS, not queries: one fused
    take+membership+pack dispatch per (chunk, cap slice) per bq-query
    block, so a 64-query wave costs ~tens of dispatches instead of
    thousands."""
    from ..ops.bucketed import _membership_bits_packed_batch

    index = counters[0].index
    lut_b, lut_c, lut_r = index._row_lookup()
    banks = index._banks
    Q = len(counters)

    # per-(bank, chunk): per-query (row selections, positions in ids)
    sel_by_chunk: dict = {}
    for qi, ids in enumerate(ids_list):
        ids = np.asarray(ids, dtype=np.int64)
        if not len(ids):
            continue
        gb = lut_b[ids]
        gc = lut_c[ids]
        order = np.lexsort((lut_r[ids], gc, gb))
        gbs = gb[order]
        gcs = gc[order]
        bounds = (
            np.flatnonzero(np.diff(gbs.astype(np.int64) << 32 | gcs)) + 1
        )
        for a, e in zip(
            np.concatenate([[0], bounds]),
            np.concatenate([bounds, [len(ids)]]),
        ):
            key = (int(gbs[a]), int(gcs[a]))
            slots = sel_by_chunk.setdefault(key, {})
            pos = order[a:e]
            slots[qi] = (lut_r[ids[pos]], pos)

    # shared per-bank query geometry: dq pads to the max across ALL
    # queries so every block shares one compiled shape, and the row slice
    # per bank adapts so the [bq, slice, dq, B] kernel intermediates stay
    # ~512 MB even for small-B banks queried by large metagenomes
    banks_used = sorted({k[0] for k in sel_by_chunk})
    cores = []
    for c in counters:
        q = c._q_mins
        cores.append(q[:-1] if c._q_has_max else q)
    dqm_of = {}
    for bank_i in banks_used:
        B = banks[bank_i].B
        max_load = 8
        for core in cores:
            if len(core):
                loads = np.bincount(
                    (core & np.uint64(B - 1)).astype(np.int64), minlength=B
                )
                max_load = max(max_load, int(loads.max()))
        dqm_of[bank_i] = max(8, -(-max_load // 8) * 8)

    def _slice_for(bank_i):
        B = banks[bank_i].B
        s = (512 << 20) // max(bq * dqm_of[bank_i] * B * 4, 1)
        s = max(64, min(1024, s))
        return 1 << (s.bit_length() - 1)

    # chunk layout: each chunk contributes ceil(max count / slice) slices
    # of its bank's slice width; K = total padded rows (uniform across
    # queries)
    chunk_keys = sorted(sel_by_chunk)
    layout = []  # (key, n_slices, slice width)
    K = 0
    for key in chunk_keys:
        cap_c = max(len(v[0]) for v in sel_by_chunk[key].values())
        sl = _slice_for(key[0])
        n_slices = -(-cap_c // sl)
        layout.append((key, n_slices, sl))
        K += n_slices * sl

    row_srcs = [np.full(K, -1, dtype=np.int64) for _ in range(Q)]
    blocks_out = []
    for q0 in range(0, Q, bq):
        qs = list(range(q0, min(q0 + bq, Q)))

        # per-bank query planes (device-packed from ONE shared raw-limb
        # upload) + host slotmaps at the shared dq
        from ..ops.bucketed import (
            pack_query_block_device,
            query_slot_map,
        )

        block_cores = [cores[qi] for qi in qs]
        block_cores += [np.zeros(0, dtype=np.uint64)] * (bq - len(qs))
        raw_shared = [None]
        bank_packs = {}

        def packs_for(bank_i):
            if bank_i in bank_packs:
                return bank_packs[bank_i]
            B = banks[bank_i].B
            dqm = dqm_of[bank_i]
            Qhi, Qlo, _Qcnt, dq_got, raw_shared[0] = pack_query_block_device(
                block_cores, B, raw_shared[0]
            )
            if dq_got != dqm:  # block-local loads can undershoot the
                # all-query dq; re-pad by slicing is wrong — repack at dqm
                from ..ops.bucketed import _query_pack_kernel_i32

                Qhi, Qlo, _Qcnt = _query_pack_kernel_i32(
                    raw_shared[0][0], raw_shared[0][1], B, dqm
                )
            smaps = np.full((bq, W * 32), dqm * B, dtype=np.int32)
            for j, core in enumerate(block_cores):
                if len(core):
                    smaps[j] = query_slot_map(core, B, dqm, W * 32)
            out = (Qhi, Qlo, jnp.asarray(smaps))
            bank_packs[bank_i] = out
            return out

        pieces = []
        base = 0
        for (bank_i, chunk_i), n_slices, sl in layout:
            chunk = banks[bank_i].chunks[chunk_i]
            Qhi, Qlo, smaps = packs_for(bank_i)
            slots = sel_by_chunk[(bank_i, chunk_i)]
            for s in range(n_slices):
                sel = np.zeros((bq, sl), dtype=np.int32)
                for j, qi in enumerate(qs):
                    got = slots.get(qi)
                    if got is None:
                        continue
                    rows_sel, pos = got
                    part = rows_sel[s * sl : (s + 1) * sl]
                    sel[j, : len(part)] = part
                    row_srcs[qi][base : base + len(part)] = pos[
                        s * sl : (s + 1) * sl
                    ]
                pieces.append(
                    _membership_bits_packed_batch(
                        Qhi, Qlo, chunk.hi, chunk.lo, chunk.cnt,
                        jnp.asarray(sel), smaps,
                    )
                )
                base += sl
        Mb = (
            pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
        )
        blocks_out.append(Mb[: len(qs)])
    M = (
        blocks_out[0]
        if len(blocks_out) == 1
        else jnp.concatenate(blocks_out, axis=0)
    )

    # spill / 2^64-1 patches, pooled across queries with pow2 padding
    qws, rws, cws, msks = [], [], [], []
    for qi, ids in enumerate(ids_list):
        ids = np.asarray(ids, dtype=np.int64)
        patches = counters[qi]._membership_patches(W)
        if not patches:
            continue
        row_src = row_srcs[qi]
        for r, srcpos in enumerate(row_src):
            if srcpos < 0:
                continue
            p = patches.get(int(ids[srcpos]))
            if p is None:
                continue
            words, masks = p
            qws.extend([qi] * len(words))
            rws.extend([r] * len(words))
            cws.extend(words.tolist())
            msks.extend(masks.tolist())
    if qws:
        n_p = len(qws)
        padded = 1 << max(4, (n_p - 1).bit_length())
        qws += [0] * (padded - n_p)
        rws += [0] * (padded - n_p)
        cws += [0] * (padded - n_p)
        msks += [0] * (padded - n_p)
        qj = jnp.asarray(np.asarray(qws, dtype=np.int32))
        ri = jnp.asarray(np.asarray(rws, dtype=np.int32))
        wi = jnp.asarray(np.asarray(cws, dtype=np.int32))
        mk = jnp.asarray(np.asarray(msks, dtype=np.uint32))
        M = M.at[qj, ri, wi].set(M[qj, ri, wi] | mk)
    return M, row_srcs


@functools.partial(jax.jit, static_argnames="length")
def _schedule_scan_batch(M, alive_p, counts, thresh, length, keys=None):
    """Data-parallel form of _schedule_scan: [Q, k, W] membership
    matrices, [Q, W] alive bitsets, [Q, k] counts, [Q] thresholds (and
    optional [Q, k] tie-break keys) -> per-query greedy rounds. Queries
    are independent, so the batch is a plain vmap — the data-parallel
    axis of config 5."""

    if keys is None:
        def one(Mq, aq, cq, tq):
            return _schedule_scan(Mq, (aq, cq), tq, length)

        return jax.vmap(one)(M, alive_p, counts, thresh)

    def one(Mq, aq, cq, tq, kq):
        return _schedule_scan(Mq, (aq, cq), tq, length, kq)

    return jax.vmap(one)(M, alive_p, counts, thresh, keys)


def compute_schedules_batch(coords, threshold_bp, block: int = 64, extend=False):
    """Compute MANY coordinators' gather round schedules in data-parallel
    batches — the product form of BASELINE config 5 (N samples streaming
    against one reference database; the reference's multigather loops
    per-sample serially, `/root/reference/src/sourmash/commands.py:1124`).

    Each coordinator owns one query's counters. Queries in a block pad to
    a common (k, W) and scan in one dispatch; with more than one visible
    device the block shards across a 'data' mesh axis (each device scans
    its queries — no collectives, queries are independent). Schedules
    land in each coordinator exactly as its own compute() would have
    produced them (same _schedule_scan semantics, verified by tests)."""
    import os

    devices = jax.devices()
    n_dev = len(devices)

    pending = []
    for coord in coords:
        coord.ready = True
        if not extend:
            coord._sched = []
        # single-device, single-counter, resident-bank coords build their
        # membership bitsets ON DEVICE (no host build / matrix upload) —
        # the same fast path as DeviceGatherSchedule.compute
        dev_ok = (
            n_dev == 1
            and len(coord.counters) == 1
            and coord.counters[0]._device_membership_worthwhile(threshold_bp)
        )
        built = coord._build_inputs(threshold_bp, build_mats=not dev_ok)
        if built is not None:
            pending.append((coord, built, dev_ok))
    if not pending:
        return

    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    for b0 in range(0, len(pending), block):
        sub = pending[b0 : b0 + block]
        # quantized pad classes: one compile per class instead of one per
        # block when query/candidate sizes drift; single-device blocks pad
        # the query axis to the full block size (zero-count pad rows are
        # inert) so every wave shares one compiled scan shape
        Wmax = -(-max(b[2].shape[0] for _, b, _ in sub) // 128) * 128
        Q = len(sub)
        Qp = -(-Q // n_dev) * n_dev if n_dev > 1 else block

        # pass 1: per-query matrices — on-device grouped-order membership
        # for eligible queries (at the block's shared width), host matrix
        # otherwise. row_src maps matrix row -> rows[] position. When the
        # whole block is eligible and shares one index, the BATCHED device
        # path computes every query's matrix in a handful of dispatches.
        all_dev = all(d for _c, _b, d in sub) and (
            len({id(c.counters[0].index) for c, _b, _d in sub}) == 1
        )
        per_q = []
        if all_dev and len(sub) > 1:
            Mall, row_srcs_b = _membership_rows_device_batch(
                [c.counters[0] for c, _b, _d in sub],
                [
                    np.asarray([ds for _ci, ds in b[0]], dtype=np.int64)
                    for _c, b, _d in sub
                ],
                Wmax,
            )
            per_q = [(Mall[i], row_srcs_b[i]) for i in range(len(sub))]
        else:
            # host path for the whole block: one [Qp, kmax, Wmax] host
            # array + ONE upload (per-query device pads cost a dispatch
            # each and regressed the small-collection batch 3x)
            for coord, (rows, counts, alive_p, thresh, _nk, M), dev_ok in sub:
                if dev_ok:
                    W = alive_p.shape[0]
                    M = coord.counters[0]._membership_for_ids(
                        W,
                        np.asarray([ds for _ci, ds in rows], dtype=np.int64),
                    )
                per_q.append((M, np.arange(len(rows), dtype=np.int64)))
        kmax = -(-max(p[0].shape[0] for p in per_q) // 1024) * 1024

        Ab = np.zeros((Qp, Wmax), dtype=np.uint32)
        Cb = np.zeros((Qp, kmax), dtype=np.int32)
        Tb = np.ones(Qp, dtype=np.int32)  # pad rows: zero counts, no rounds
        Kb = np.full((Qp, kmax), 1 << 40, dtype=np.int64)
        row_srcs = []
        if all_dev and len(sub) > 1:
            mats = []
            for qi, ((coord, built, _d), (Mq, row_src)) in enumerate(
                zip(sub, per_q)
            ):
                rows, counts, alive_p, thresh = (
                    built[0], built[1], built[2], built[3],
                )
                K = Mq.shape[0]
                real = row_src >= 0
                Cb[qi, :K][real] = counts[row_src[real]]
                Kb[qi, :K][real] = row_src[real]
                Ab[qi, : alive_p.shape[0]] = alive_p
                Tb[qi] = thresh
                row_srcs.append(row_src)
                mats.append(jnp.pad(Mq, ((0, kmax - K), (0, 0))))
            if Qp != Q:
                mats.extend(
                    [jnp.zeros((kmax, Wmax), dtype=jnp.uint32)] * (Qp - Q)
                )
            Mb = jnp.stack(mats)
        else:
            Mb_host = np.zeros((Qp, kmax, Wmax), dtype=np.uint32)
            for qi, ((coord, built, _d), (Mq, row_src)) in enumerate(
                zip(sub, per_q)
            ):
                rows, counts, alive_p, thresh = (
                    built[0], built[1], built[2], built[3],
                )
                K, Wq = Mq.shape
                Mb_host[qi, :K, :Wq] = Mq
                Cb[qi, :K] = counts
                Kb[qi, :K] = np.arange(K, dtype=np.int64)
                Ab[qi, : alive_p.shape[0]] = alive_p
                Tb[qi] = thresh
                row_srcs.append(row_src)
            Mb = Mb_host
        chunk = int(min(kmax, 64 if kmax > 4096 else 256))

        if n_dev > 1:
            mesh = Mesh(np.asarray(devices), ("data",))
            from ..parallel import make_data_parallel_schedule_scan

            scan = make_data_parallel_schedule_scan(mesh, chunk)
            Mj = jax.device_put(Mb, NamedSharding(mesh, P("data", None, None)))
            carry = (
                jax.device_put(Ab, NamedSharding(mesh, P("data", None))),
                jax.device_put(Cb, NamedSharding(mesh, P("data", None))),
            )
            Tj = jax.device_put(Tb, NamedSharding(mesh, P("data")))
        else:
            Mj = jnp.asarray(Mb)  # one upload; the scan loop reuses it
            carry = (jnp.asarray(Ab), jnp.asarray(Cb))
            Tj = jnp.asarray(Tb)
            Kj = jnp.asarray(Kb)

        scheds = [[] for _ in range(Q)]
        open_q = np.ones(Q, dtype=bool)
        rounds_done = 0
        while open_q.any() and rounds_done < kmax:
            carry, (bests, bcs) = _run_batch_scan(
                scan if n_dev > 1 else None, Mj, carry, Tj, chunk,
                None if n_dev > 1 else Kj,
            )
            b_np, c_np = np.asarray(bests), np.asarray(bcs)
            for qi in np.nonzero(open_q)[0]:
                coord = sub[qi][0]
                rows = sub[qi][1][0]
                row_src = row_srcs[qi]
                for b, c in zip(b_np[qi], c_np[qi]):
                    if b < 0 or (
                        coord._cap_guard and int(c) <= coord._cap_bound
                    ):
                        open_q[qi] = False
                        break
                    ci, ds = rows[int(row_src[int(b)])]
                    scheds[qi].append((ci, ds, int(c)))
                else:
                    if len(scheds[qi]) >= len(rows):
                        open_q[qi] = False
            rounds_done += chunk
        for qi, (coord, _built, _dev_ok) in enumerate(sub):
            coord.truncated = bool(coord._cap_guard)
            if extend:
                coord._sched = list(coord._sched) + scheds[qi]
            else:
                coord._sched = scheds[qi]


def converge_schedules_batch(coords, threshold_bp, block: int | None = None):
    """compute_schedules_batch plus BATCHED capped-reschedule convergence.

    A truncated capped schedule normally converges by per-query
    GatherRoundRestart cycles — each costing a full-bank recount pass.
    Here all truncated queries recount together in one batched device pass
    per iteration (`counts_for_banks_batch`) and their schedules EXTEND in
    place, so replay never restarts: the per-iteration cost is shared by
    the whole wave instead of paid per query. Single-counter coordinators
    only (the multigather shape); others keep the restart path."""
    from ..ops.index_ops import counts_for_banks_batch

    live = [c for c in coords if c is not None]
    if block is None:
        # size the query block so the stacked [Q, k, W] scan matrix stays
        # ~256 MB: at GTDB scale the resident bank already owns most of
        # HBM, and a 64-query block OOMed next to an 11 GB bank
        import os

        cap = int(os.environ.get("SOURMASH_TPU_SCHEDULE_CAP", "4096"))
        k_est = w_est = 1
        for c in live:
            c0 = c.counters[0]
            k = int(np.count_nonzero(c0.counts))
            k_est = max(k_est, min(k, cap) if cap else k)
            w_est = max(w_est, -(-len(c0._q_mins) // 32))
        block = int(max(4, min(64, (256 << 20) // max(k_est * w_est * 4, 1))))
        block = 1 << (block.bit_length() - 1)
    compute_schedules_batch(live, threshold_bp, block)
    stalled: set = set()
    for _ in range(16):
        pending = [
            c
            for c in live
            if c.truncated and len(c.counters) == 1 and id(c) not in stalled
        ]
        if not pending:
            break
        progress_base = {id(c): len(c._sched) for c in pending}
        # remaining query after the rounds scheduled so far (round removal
        # is set subtraction, so the union of winners suffices)
        alive_list = []
        for coord in pending:
            c0 = coord.counters[0]
            q = c0._q_mins
            won = [
                c0.index._ds_mins[ds] for _ci, ds, _cnt in coord._sched
            ]
            alive = (
                np.setdiff1d(q, np.concatenate(won), assume_unique=False)
                if won
                else q
            )
            alive_list.append(alive)
        # one batched pass per distinct index (multigather: all the same)
        groups = {}
        for coord, alive in zip(pending, alive_list):
            groups.setdefault(id(coord.counters[0].index), []).append(
                (coord, alive)
            )
        fresh_rows = {}
        for grp in groups.values():
            idx = grp[0][0].counters[0].index
            rows_g = counts_for_banks_batch(
                idx._banks, [a for _c, a in grp], len(idx._signatures)
            )
            for (coord, _a), row in zip(grp, rows_g):
                fresh_rows[id(coord)] = row
        for coord, alive in zip(pending, alive_list):
            row = fresh_rows[id(coord)]
            c0 = coord.counters[0]
            counts = np.where(c0.counts > 0, row, 0).astype(np.int64)
            if threshold_bp:
                try:
                    _, n_th = calc_threshold_from_bp(
                        threshold_bp, c0.scaled, max(len(alive), 1)
                    )
                except ValueError:
                    n_th = None
                if n_th is not None:
                    counts = np.where(counts >= max(n_th, 1), counts, 0)
            c0.counts = counts
            c0._groups = None
            c0._bitsets_cache = None
            coord.reschedules += 1
            coord._alive_mins = alive
            coord.truncated = False
        compute_schedules_batch(pending, threshold_bp, block, extend=True)
        for c in pending:
            # a coordinator gaining no rounds cannot converge here — its
            # replay falls back to exact host rounds at exhaustion (the
            # same no-progress bail as the serial GatherRoundRestart path)
            if len(c._sched) == progress_base[id(c)]:
                stalled.add(id(c))


def _run_batch_scan(sharded_scan, Mj, carry, Tj, chunk, keys=None):
    "One chunk of batched rounds, on the mesh when a sharded scan is given."
    if sharded_scan is not None:
        return sharded_scan(Mj, carry[0], carry[1], Tj)
    return _schedule_scan_batch(Mj, carry[0], carry[1], Tj, chunk, keys)


def schedule_device_gather(counters):
    """Put a group of FlatCounterGather counters (one per database, same
    query, uniform scaled) under one device-round schedule. Returns the
    coordinator, or None if the group is ineligible (mixed counter types
    or non-uniform scaled) — callers then keep the host peek/consume path.
    Set SOURMASH_TPU_NO_SCHEDULE=1 to force host rounds."""
    import os

    if os.environ.get("SOURMASH_TPU_NO_SCHEDULE"):
        return None
    if not counters:
        return None
    if not all(isinstance(c, FlatCounterGather) for c in counters):
        return None
    if len({c.scaled for c in counters}) != 1:
        return None
    q0 = counters[0]._q_mins
    if not all(np.array_equal(c._q_mins, q0) for c in counters[1:]):
        return None
    coord = DeviceGatherSchedule(counters)
    for i, c in enumerate(counters):
        c._use_schedule = True
        c._coord = coord
        c._coord_idx = i
    return coord
