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

    def __init__(self, siglist=None, location=None):
        self._signatures = list(siglist) if siglist else []
        self._location = location
        self._banks = None  # lazy device row banks
        self._ds_mins = None
        self._scaled = None

    @property
    def location(self):
        return self._location

    def signatures(self):
        return iter(self._signatures)

    def __bool__(self):
        return bool(self._signatures)

    def __len__(self):
        return len(self._signatures)

    def insert(self, ss):
        self._signatures.append(ss)
        self._banks = None

    def save(self, path):
        raise NotImplementedError

    @classmethod
    def load(cls, *args, **kwargs):
        raise NotImplementedError

    def select(self, **kwargs):
        _check_select_parameters(**kwargs)
        # manifest semantics for containment (reference manifest.py:324)
        containment = kwargs.pop("containment", False)
        sigs = [ss for ss in self._signatures if select_signature(ss, **kwargs)]
        if containment or kwargs.get("scaled"):
            sigs = [ss for ss in sigs if ss.minhash.scaled]
        return FlatIndex(sigs, self._location)

    # -- device state ------------------------------------------------------

    def _build(self):
        "Materialize the device row banks at the common scaled."
        if self._banks is not None:
            return
        if self._ds_mins is not None and self._scaled is not None:
            # preloaded mins (disk revindex): skip re-extracting from sigs
            self._banks = build_banks(self._ds_mins)
            return
        scaleds = {ss.minhash.scaled for ss in self._signatures}
        if 0 in scaleds:
            raise ValueError("FlatIndex requires scaled signatures")
        common = max(scaleds)
        cutoff = np.uint64(_get_max_hash_for_scaled(common))
        mins_list = []
        for ss in self._signatures:
            m = ss.minhash.mins_array()
            if ss.minhash.scaled != common:
                m = m[m <= cutoff]
            mins_list.append(m)
        self._banks = build_banks(mins_list)
        self._ds_mins = mins_list
        self._scaled = common

    def counts_for(self, query_mins: np.ndarray) -> np.ndarray:
        "Overlap counts of the (already downsampled) query with each dataset."
        self._build()
        return counts_for_banks(
            self._banks, query_mins, n_datasets=len(self._signatures)
        )

    # -- search protocol ---------------------------------------------------

    def find(self, search_fn, query, **kwargs):
        "Batched find via the generic in-memory path."
        sal = [(ss, self._location) for ss in self._signatures]
        yield from self._find_batched(search_fn, query, sal)

    def counter_gather(self, query, threshold_bp, **kwargs):
        "Build a device-backed CounterGather over matches to the query."
        if not hasattr(query, "update"):  # mutable signature
            query = query.to_frozen()
        with query.update() as prefetch_query:
            prefetch_query.minhash = prefetch_query.minhash.flatten()
        if not self:
            raise ValueError("no signatures to search")
        return FlatCounterGather(prefetch_query, self, threshold_bp)


class FlatCounterGather:
    """Device-vector CounterGather equivalent.

    Counters live as an int32 device/host vector indexed by dataset id;
    peek = argmax; consume = one fused decrement pass. Matches the reference
    CounterGather's observable behavior (peek/consume/signatures/union_found)
    for uniform-scaled collections.
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
        self.counts = counts.astype(np.int64)
        self.query_started = 0

    def signatures(self):
        "Return all signatures with nonzero counters."
        for i, c in enumerate(self.counts):
            if c > 0:
                yield self.index._signatures[i]

    @property
    def union_found(self):
        "Union of all found hashes, intersected with the original query."
        found_mh = self.orig_query_mh.copy_and_clear()
        q = self.orig_query_mh.mins_array()
        for i, c in enumerate(self.counts):
            if c > 0:
                m = self.index._ds_mins[i]
                inter = np.intersect1d(q, m)
                found_mh.add_many(inter)
        return found_mh

    def downsample(self, scaled):
        if scaled > self.scaled:
            raise ValueError(
                "FlatCounterGather cannot re-downsample after construction"
            )
        return self.scaled

    def peek(self, cur_query_mh, *, threshold_bp=0):
        "Get the next best match without mutating counters."
        self.query_started = 1

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

        match = self.index._signatures[best]

        cont = cur_query_mh.contained_by(match.minhash, downsample=True)
        assert cont
        assert cont >= threshold

        match_mh = match.minhash.downsample(scaled=scaled).flatten()
        intersect_mh = cur_query_mh & match_mh

        return (
            IndexSearchResult(cont, match, self.index._location),
            intersect_mh,
        )

    def consume(self, intersect_mh):
        "Decrement all dataset counters by their overlap with intersect_mh."
        self.query_started = 1
        if not intersect_mh:
            return
        active = self.counts > 0
        if not active.any():
            return
        dec = self.index.counts_for(
            intersect_mh.downsample(scaled=self.scaled).mins_array()
        )
        self.counts = np.where(active, self.counts - dec, self.counts)
        np.maximum(self.counts, 0, out=self.counts)
