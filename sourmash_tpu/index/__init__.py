"""Index classes: collections of signatures supporting select/find/search/
gather.

API + semantics parity: reference `src/sourmash/index/__init__.py`
(Index ABC :61, LinearIndex:397, LazyLinearIndex:456, ZipFileLinearIndex:529,
CounterGather:777, MultiIndex:912, StandaloneManifestIndex:1116).

TPU-native design: the generic `Index.find` loop scores one subject at a
time; in-memory indexes here instead pack all subject sketches into a padded
device tensor and compute every intersection in a single batched device
program (`ops/intersect`), applying per-pair scaled cutoffs so the scores are
numerically identical to the reference's pairwise downsampling semantics.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from collections import namedtuple, Counter

import numpy as np

from ..search import (
    make_jaccard_search_query,
    make_containment_query,
    calc_threshold_from_bp,
)
from ..manifest import CollectionManifest
from ..logging import debug_literal
from ..signature import load_signatures_from_json, save_signatures_to_json
from ..minhash import (
    _get_max_hash_for_scaled,
    flatten_and_downsample_scaled,
    flatten_and_downsample_num,
    flatten_and_intersect_scaled,
)

IndexSearchResult = namedtuple("Result", "score, signature, location")


class Index(ABC):
    is_database = False
    manifest = None

    @abstractmethod
    def __len__(self):
        "Return the number of signatures in this Index object."

    @property
    def location(self):
        "Return a resolvable location for this index, if possible."
        return None

    @abstractmethod
    def signatures(self):
        "Return an iterator over all signatures in the Index object."

    def signatures_with_location(self):
        "Return an iterator over tuples (signature, location) in the Index."
        for ss in self.signatures():
            yield ss, self.location

    def _signatures_with_internal(self):
        "Iterator of (ss, internal_location) over ALL signatures (pre-select)."
        raise NotImplementedError

    @abstractmethod
    def insert(self, signature):
        """ """

    @abstractmethod
    def save(self, path, storage=None, sparseness=0.0, structure_only=False):
        """ """

    @classmethod
    @abstractmethod
    def load(cls, location, leaf_loader=None, storage=None, print_version_warning=True):
        """ """

    # -- find: the core search loop ---------------------------------------

    def find(self, search_fn, query, **kwargs):
        """Use search_fn to find matching signatures; yields
        IndexSearchResult. Generic per-signature loop; in-memory subclasses
        batch this on device via _find_batched."""
        yield from self._find_over(
            search_fn, query, self.signatures_with_location()
        )

    def _find_over(self, search_fn, query, subjects_and_locations):
        "Generic scoring loop over an iterable of (signature, location)."
        search_fn.check_is_compatible(query)

        query_mh = query.minhash
        assert not query_mh.track_abundance
        if query_mh.scaled:
            query_scaled = query_mh.scaled

            def prepare_subject(subj_mh):
                return flatten_and_downsample_scaled(subj_mh, query_scaled)

            def prepare_query(query_mh, subj_mh):
                return flatten_and_downsample_scaled(query_mh, subj_mh.scaled)

        else:
            query_num = query_mh.num

            def prepare_subject(subj_mh):
                return flatten_and_downsample_num(subj_mh, query_num)

            def prepare_query(query_mh, subj_mh):
                return flatten_and_downsample_num(query_mh, subj_mh.num)

        for subj, location in subjects_and_locations:
            subj_mh = prepare_subject(subj.minhash)
            q_mh = prepare_query(query.minhash, subj_mh)

            assert not q_mh.track_abundance
            assert not subj_mh.track_abundance

            shared_size, total_size = q_mh.intersection_and_union_size(subj_mh)

            query_size = len(q_mh)
            subj_size = len(subj_mh)

            score = search_fn.score_fn(query_size, shared_size, subj_size, total_size)

            if search_fn.passes(score):
                if search_fn.collect(score, subj):
                    yield IndexSearchResult(score, subj, location)

    def _find_batched(self, search_fn, query, subjects_and_locations):
        """Batched scoring of a query against subjects, in lazy chunks.

        Computes per-pair (shared, union) counts in one device call per
        chunk with per-pair scaled cutoffs, reproducing the reference's
        pairwise flatten/downsample numerics exactly. Falls back to the
        generic loop for num queries. Subjects are only touched as their
        chunk is reached, and a subject raising mid-stream flushes the
        results gathered so far before propagating (the reference's
        per-item laziness contract).
        """
        from ..ops.intersect import query_vs_many_cutoff_counts

        query_mh = query.minhash
        search_fn.check_is_compatible(query)
        q_scaled = query_mh.scaled

        def process(chunk):
            if not chunk:
                return
            if not q_scaled or any(not s.minhash.scaled for s, _ in chunk):
                yield from self._find_over(search_fn, query, chunk)
                return
            q_mins = query_mh.mins_array()
            sub_mins = [s.minhash.mins_array() for s, _ in chunk]
            cutoffs = np.zeros(len(chunk), dtype=np.uint64)
            for i, (s, _) in enumerate(chunk):
                pair_scaled = max(q_scaled, s.minhash.scaled)
                cutoffs[i] = _get_max_hash_for_scaled(pair_scaled)

            shared, q_sizes, s_sizes = query_vs_many_cutoff_counts(
                q_mins, sub_mins, cutoffs
            )

            for i, (subj, location) in enumerate(chunk):
                shared_size = int(shared[i])
                query_size = int(q_sizes[i])
                subj_size = int(s_sizes[i])
                total_size = query_size + subj_size - shared_size
                score = search_fn.score_fn(
                    query_size, shared_size, subj_size, total_size
                )
                if search_fn.passes(score):
                    if search_fn.collect(score, subj):
                        yield IndexSearchResult(score, subj, location)

        CHUNK = 1024
        pending = []
        for item in subjects_and_locations:
            try:
                subj, _loc = item
                _ = subj.minhash.scaled  # may raise for lazy/fake subjects
            except Exception:
                yield from process(pending)
                raise
            pending.append(item)
            if len(pending) >= CHUNK:
                yield from process(pending)
                pending = []
        yield from process(pending)

    # -- search APIs -------------------------------------------------------

    def search_abund(self, query, *, threshold=None, **kwargs):
        "Angular-similarity search; returns sorted IndexSearchResult list."
        if not query.minhash.track_abundance:
            raise TypeError(
                "'search_abund' requires query signature with abundance information"
            )
        if threshold is None:
            raise TypeError("'search_abund' requires 'threshold'")
        threshold = float(threshold)

        matches = []
        for subj, loc in self.signatures_with_location():
            if not subj.minhash.track_abundance:
                raise TypeError(
                    "'search_abund' requires subject signatures with abundance information"
                )
            score = query.similarity(subj, downsample=True)
            if score >= threshold:
                matches.append(IndexSearchResult(score, subj, loc))

        matches.sort(key=lambda x: -x.score)
        return matches

    def search(
        self,
        query,
        *,
        threshold=None,
        do_containment=False,
        do_max_containment=False,
        best_only=False,
        **kwargs,
    ):
        "Jaccard/containment search; returns sorted IndexSearchResult list."
        if threshold is None:
            raise TypeError("'search' requires 'threshold'")
        threshold = float(threshold)

        search_obj = make_jaccard_search_query(
            do_containment=do_containment,
            do_max_containment=do_max_containment,
            best_only=best_only,
            threshold=threshold,
        )

        matches = list(self.find(search_obj, query, **kwargs))
        matches.sort(key=lambda x: -x.score)
        return matches

    def prefetch(self, query, threshold_bp, **kwargs):
        "Yield all matches with minimum overlap threshold_bp."
        if not self:
            raise ValueError("no signatures to search")

        best_only = kwargs.get("best_only", False)
        search_fn = make_containment_query(
            query.minhash, threshold_bp, best_only=best_only
        )
        yield from self.find(search_fn, query, **kwargs)

    def best_containment(self, query, threshold_bp=None, **kwargs):
        "Return the best containment match, or None."
        results = self.prefetch(query, threshold_bp, best_only=True, **kwargs)
        results = sorted(results, key=lambda x: (-x.score, x.signature.md5sum()))
        try:
            return next(iter(results))
        except StopIteration:
            return None

    def peek(self, query_mh, *, threshold_bp=0):
        "CounterGather.peek-alike on top of Index."
        from ..signature import SourmashSignature

        query_ss = SourmashSignature(query_mh)
        try:
            result = self.best_containment(query_ss, threshold_bp=threshold_bp)
        except ValueError:
            result = None
        if not result:
            return []
        intersect_mh = flatten_and_intersect_scaled(result.signature.minhash, query_mh)
        return [result, intersect_mh]

    def consume(self, intersect_mh):
        "CounterGather.consume-alike: no-op for plain indexes."
        pass

    def counter_gather(self, query, threshold_bp, **kwargs):
        "Return a CounterGather over matches to the query."
        with query.update() as prefetch_query:
            prefetch_query.minhash = prefetch_query.minhash.flatten()

        counter = CounterGather(prefetch_query)
        for result in self.prefetch(prefetch_query, threshold_bp, **kwargs):
            counter.add(result.signature, location=result.location)
        return counter

    @abstractmethod
    def select(
        self,
        ksize=None,
        moltype=None,
        scaled=None,
        num=None,
        abund=None,
        containment=None,
    ):
        "Return Index containing only signatures that match requirements."


def select_signature(
    ss,
    *,
    ksize=None,
    moltype=None,
    scaled=0,
    num=0,
    containment=False,
    abund=None,
    picklist=None,
):
    "Check that the given signature matches the specified requirements."
    if ksize and ksize != ss.minhash.ksize:
        return False
    if moltype and moltype != ss.minhash.moltype:
        return False
    if containment:
        if not scaled:
            raise ValueError("'containment' requires 'scaled' in Index.select'")
        if not ss.minhash.scaled:
            return False
    if scaled:
        if ss.minhash.num:
            return False
    if num:
        if ss.minhash.scaled or num != ss.minhash.num:
            return False
    if abund:
        if not ss.minhash.track_abundance:
            return False
    if picklist is not None and ss not in picklist:
        return False
    return True


class LinearIndex(Index):
    "In-memory list of signatures, with batched device find."

    def __init__(self, _signatures=None, filename=None):
        self._signatures = []
        if _signatures:
            self._signatures = list(_signatures)
        self.filename = filename

    @property
    def location(self):
        return self.filename

    def signatures(self):
        return iter(self._signatures)

    def __bool__(self):
        return bool(self._signatures)

    def __len__(self):
        return len(self._signatures)

    def insert(self, node):
        self._signatures.append(node)

    def save(self, path):
        with open(path, "w") as fp:
            save_signatures_to_json(self.signatures(), fp)

    @classmethod
    def load(cls, location, filename=None):
        "Load signatures from a JSON signature file."
        si = load_signatures_from_json(location, do_raise=True)
        if filename is None:
            filename = location
        return LinearIndex(si, filename=filename)

    def find(self, search_fn, query, **kwargs):
        "Batched device find over the in-memory signature list."
        sal = [(ss, self.location) for ss in self._signatures]
        yield from self._find_batched(search_fn, query, sal)

    def select(self, **kwargs):
        "New LinearIndex with signatures matching the requirements."
        _check_select_parameters(**kwargs)
        siglist = [ss for ss in self._signatures if select_signature(ss, **kwargs)]
        return LinearIndex(siglist, self.location)


class LazyLinearIndex(Index):
    """Lazy wrapper forcing linear find on another index; selection applied
    only when signatures are requested."""

    def __init__(self, db, selection_dict={}):
        self.db = db
        self.selection_dict = dict(selection_dict)

    def signatures(self):
        db = self.db.select(**self.selection_dict)
        yield from db.signatures()

    def signatures_with_location(self):
        db = self.db.select(**self.selection_dict)
        yield from db.signatures_with_location()

    def __bool__(self):
        try:
            next(iter(self.signatures()))
            return True
        except StopIteration:
            return False

    def __len__(self):
        db = self.db.select(**self.selection_dict)
        return len(db)

    def insert(self, node):
        raise NotImplementedError

    def save(self, path):
        raise NotImplementedError

    @classmethod
    def load(cls, path):
        raise NotImplementedError

    def select(self, **kwargs):
        "Stack another selection on top (lazy)."
        _check_select_parameters(**kwargs)
        selection_dict = dict(self.selection_dict)
        for k, v in kwargs.items():
            if k in selection_dict:
                if selection_dict[k] != v:
                    raise ValueError(f"cannot select on two different values for {k}")
            selection_dict[k] = v
        return LazyLinearIndex(self.db, selection_dict)


class ZipFileLinearIndex(Index):
    "Read-only collection of signatures in a zip file; manifest-driven."

    is_database = True

    def __init__(
        self,
        storage,
        *,
        selection_dict=None,
        traverse_yield_all=False,
        manifest=None,
        use_manifest=True,
    ):
        self.storage = storage
        self.selection_dict = selection_dict
        self.traverse_yield_all = traverse_yield_all
        self.use_manifest = use_manifest

        if use_manifest:
            if manifest is not None:
                debug_literal("ZipFileLinearIndex using passed-in manifest")
                self.manifest = manifest
            else:
                self._load_manifest()
        else:
            self.manifest = None

        if self.manifest is not None:
            assert not self.selection_dict, self.selection_dict
        if self.selection_dict:
            assert self.manifest is None

    def _load_manifest(self):
        "Load a manifest if one exists."
        try:
            manifest_data = self.storage.load("SOURMASH-MANIFEST.csv")
        except (KeyError, FileNotFoundError):
            self.manifest = None
        else:
            from io import StringIO

            debug_literal(f"found manifest on load for {self.storage.path}")
            self.manifest = CollectionManifest.load_from_csv(
                StringIO(manifest_data.decode("utf-8"))
            )

    def __bool__(self):
        try:
            next(iter(self.signatures()))
        except StopIteration:
            return False
        return True

    def __len__(self):
        if self.manifest is not None:
            return len(self.manifest)
        return sum(1 for _ in self.signatures())

    @property
    def location(self):
        return self.storage.path

    def insert(self, signature):
        raise NotImplementedError

    def save(self, path):
        raise NotImplementedError

    @classmethod
    def load(cls, location, traverse_yield_all=False, use_manifest=True):
        "Load a zipfile collection."
        from ..sbt_storage import ZipStorage

        if not os.path.exists(location):
            raise FileNotFoundError(location)

        storage = ZipStorage(location)
        return cls(
            storage, traverse_yield_all=traverse_yield_all, use_manifest=use_manifest
        )

    def _signatures_with_internal(self):
        "All signatures + internal locations (no selection)."
        for filename in self.storage._filenames():
            if (
                filename.endswith(".sig")
                or filename.endswith(".sig.gz")
                or self.traverse_yield_all
            ):
                sig_data = self.storage.load(filename)
                for ss in load_signatures_from_json(sig_data):
                    yield ss, filename

    def signatures(self):
        "Load all (selected) signatures in the zip file."
        selection_dict = self.selection_dict
        if self.manifest is not None:
            manifest = self.manifest
            assert not selection_dict
            for filename in manifest.locations():
                data = self.storage.load(filename)
                for ss in load_signatures_from_json(data):
                    if ss in manifest:
                        yield ss
        else:
            for filename in self.storage._filenames():
                if (
                    filename.endswith(".sig")
                    or filename.endswith(".sig.gz")
                    or self.traverse_yield_all
                ):
                    data = self.storage.load(filename)
                    for ss in load_signatures_from_json(data):
                        if not selection_dict or select_signature(
                            ss, **selection_dict
                        ):
                            yield ss

    def find(self, search_fn, query, **kwargs):
        "Materialize (lazily loaded) signatures, then batch on device."
        sal = [(ss, self.location) for ss in self.signatures()]
        yield from self._find_batched(search_fn, query, sal)

    def select(self, **kwargs):
        "Select signatures in zip file based on ksize/moltype/etc."
        _check_select_parameters(**kwargs)

        manifest = self.manifest
        traverse_yield_all = self.traverse_yield_all

        if manifest is not None:
            manifest = manifest.select_to_manifest(**kwargs)
            return ZipFileLinearIndex(
                self.storage,
                selection_dict=None,
                traverse_yield_all=traverse_yield_all,
                manifest=manifest,
                use_manifest=True,
            )
        else:
            if self.selection_dict:
                d = dict(self.selection_dict)
                for k, v in kwargs.items():
                    if k in d:
                        if d[k] is not None and d[k] != v:
                            raise ValueError(f"incompatible select on '{k}'")
                    d[k] = v
                kwargs = d
            return ZipFileLinearIndex(
                self.storage,
                selection_dict=kwargs,
                traverse_yield_all=traverse_yield_all,
                manifest=None,
                use_manifest=False,
            )


class CounterGather:
    """Ancillary class for fast gather post-prefetch: tracks overlap counters
    per matching signature, supports peek (best match) / consume (subtract).

    Keyed by md5 (duplicate matches collapse). Tie-breaking on peek follows
    Counter.most_common() semantics: ties break by insertion order —
    replicated here exactly for gather-output parity."""

    def __init__(self, query):
        query_mh = query.minhash
        if not query_mh.scaled:
            raise ValueError("gather requires scaled signatures")

        self.orig_query_mh = query_mh.copy().flatten()
        self.scaled = query_mh.scaled

        self.siglist = {}
        self.locations = {}
        self.counter = Counter()
        self.query_started = 0

    def add(self, ss, *, location=None, require_overlap=True):
        "Add a potential match."
        if self.query_started:
            raise ValueError("cannot add more signatures to counter after peek/consume")

        overlap = self.orig_query_mh.count_common(ss.minhash, True)
        if overlap:
            md5 = ss.md5sum()
            self.counter[md5] = overlap
            self.siglist[md5] = ss
            self.locations[md5] = location
            self.downsample(ss.minhash.scaled)
        elif require_overlap:
            raise ValueError("no overlap between query and signature!?")

    def downsample(self, scaled):
        "Track highest scaled across all possible matches."
        if scaled > self.scaled:
            self.scaled = scaled
        return self.scaled

    def signatures(self):
        "Return all signatures."
        yield from self.siglist.values()

    @property
    def union_found(self):
        "Union of all found hashes, intersected with the original query."
        orig_query_mh = self.orig_query_mh
        found_mh = orig_query_mh.copy_and_clear()
        for ss in self.siglist.values():
            intersect_mh = flatten_and_intersect_scaled(ss.minhash, orig_query_mh)
            found_mh.add_many(intersect_mh)
        return found_mh

    def peek(self, cur_query_mh, *, threshold_bp=0):
        "Get next gather result without changing counters."
        self.query_started = 1

        counter = self.counter
        if not counter:
            return []

        siglist = self.siglist
        assert siglist

        scaled = self.downsample(cur_query_mh.scaled)
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

        most_common = counter.most_common()
        dataset_id, match_size = most_common[0]

        if match_size < n_threshold_hashes:
            return []

        match = siglist[dataset_id]

        cont = cur_query_mh.contained_by(match.minhash, downsample=True)
        assert cont
        assert cont >= threshold

        match_mh = match.minhash.downsample(scaled=scaled).flatten()
        intersect_mh = cur_query_mh & match_mh
        location = self.locations[dataset_id]

        return (IndexSearchResult(cont, match, location), intersect_mh)

    def consume(self, intersect_mh):
        "Remove the given hashes from all counters; drop emptied datasets."
        self.query_started = 1

        if not intersect_mh:
            return

        siglist = self.siglist
        counter = self.counter

        for dataset_id, _ in counter.most_common():
            remaining_mh = siglist[dataset_id].minhash
            intersect_count = intersect_mh.count_common(remaining_mh, downsample=True)
            if intersect_count:
                counter[dataset_id] -= intersect_count
                if counter[dataset_id] == 0:
                    del counter[dataset_id]


class MultiIndex(Index):
    """In-memory collection of signatures from multiple sources, with a
    manifest recording original locations."""

    def __init__(self, manifest, parent, *, prepend_location=False):
        self.manifest = manifest
        self.parent = parent
        self.prepend_location = prepend_location

        if prepend_location and self.parent is None:
            raise ValueError("must set 'parent' if 'prepend_location' is set")

    @property
    def location(self):
        return self.parent

    def signatures(self):
        for row in self.manifest.rows:
            yield row["signature"]

    def signatures_with_location(self):
        for row in self.manifest.rows:
            loc = row["internal_location"]
            if self.prepend_location:
                loc = os.path.join(self.parent, loc)
            yield row["signature"], loc

    def _signatures_with_internal(self):
        for row in self.manifest.rows:
            yield row["signature"], row["internal_location"]

    def __len__(self):
        if self.manifest is None:
            return 0
        return len(self.manifest)

    def insert(self, *args):
        raise NotImplementedError

    def find(self, search_fn, query, **kwargs):
        "Batched device find over the in-memory manifest."
        sal = list(self.signatures_with_location())
        yield from self._find_batched(search_fn, query, sal)

    @classmethod
    def load(cls, index_list, source_list, parent, *, prepend_location=False):
        "Create a MultiIndex from already-loaded indices."
        assert len(index_list) == len(source_list)

        def sigloc_iter():
            for idx, iloc in zip(index_list, source_list):
                if iloc is None:
                    iloc = idx.location
                for ss in idx.signatures():
                    yield ss, iloc

        manifest = CollectionManifest.create_manifest(sigloc_iter())
        return cls(manifest, parent, prepend_location=prepend_location)

    @classmethod
    def load_from_directory(cls, pathname, *, force=False):
        "Create a MultiIndex from all .sig/.sig.gz files under a directory."
        from ..sourmash_args import traverse_find_sigs
        from ..exceptions import SourmashError

        if not os.path.isdir(pathname):
            raise ValueError(f"'{pathname}' must be a directory.")

        index_list = []
        source_list = []

        for thisfile in traverse_find_sigs([pathname], yield_all_files=force):
            try:
                idx = LinearIndex.load(thisfile)
                index_list.append(idx)
                source_list.append(os.path.relpath(thisfile, pathname))
            except (OSError, SourmashError, ValueError) as exc:
                if force:
                    continue
                raise ValueError(exc)

        if not index_list:
            raise ValueError(f"no signatures to load under directory '{pathname}'")

        return cls.load(index_list, source_list, pathname, prepend_location=True)

    @classmethod
    def load_from_path(cls, pathname, force=False):
        "Create a MultiIndex from a path (filename or directory)."
        from ..exceptions import SourmashError

        if not os.path.exists(pathname):
            raise ValueError(f"'{pathname}' must exist.")

        if os.path.isdir(pathname):
            return cls.load_from_directory(pathname, force=force)

        try:
            idx = LinearIndex.load(pathname)
        except (OSError, SourmashError, ValueError):
            if not force:
                raise ValueError(f"no signatures to load from '{pathname}'")
            return None

        return cls.load([idx], [pathname], pathname)

    @classmethod
    def load_from_pathlist(cls, filename):
        "Create a MultiIndex from all files listed in a text file."
        from ..sourmash_args import load_pathlist_from_file, load_file_as_index

        idx_list = []
        src_list = []

        for fname in load_pathlist_from_file(filename):
            idx_list.append(load_file_as_index(fname))
            src_list.append(fname)

        return cls.load(idx_list, src_list, filename)

    def save(self, *args):
        raise NotImplementedError

    def select(self, **kwargs):
        "Run 'select' on the manifest."
        _check_select_parameters(**kwargs)
        new_manifest = self.manifest.select_to_manifest(**kwargs)
        return MultiIndex(
            new_manifest, self.parent, prepend_location=self.prepend_location
        )


class StandaloneManifestIndex(Index):
    """Standalone-manifest index: selection works on the manifest alone;
    signatures are lazily loaded from their recorded locations on demand."""

    is_database = True

    def __init__(self, manifest, location, *, prefix=None):
        assert manifest is not None
        self.manifest = manifest
        self._location = location
        self.prefix = prefix

    @classmethod
    def load(cls, location, *, prefix=None):
        "Load a manifest file as an index."
        if not os.path.isfile(location):
            raise ValueError(f"provided manifest location '{location}' is not a file")

        m = CollectionManifest.load_from_filename(location)
        if prefix is None:
            prefix = os.path.dirname(location)
        return cls(m, location, prefix=prefix)

    @property
    def location(self):
        return self._location

    def signatures_with_location(self):
        yield from self._signatures_with_internal()

    def signatures(self):
        for ss, loc in self._signatures_with_internal():
            yield ss

    def _signatures_with_internal(self):
        "Iterate (sig, location) over the current (post-select) manifest."
        import sourmash_tpu

        picklist = self.manifest.to_picklist()
        for iloc in self.manifest.locations():
            if not iloc.startswith("/") and self.prefix:
                iloc = os.path.join(self.prefix, iloc)
            idx = sourmash_tpu.load_file_as_index(iloc)
            idx = idx.select(picklist=picklist)
            for ss in idx.signatures():
                yield ss, iloc

    def __len__(self):
        return len(self.manifest)

    def __bool__(self):
        return bool(self.manifest)

    def save(self, *args):
        raise NotImplementedError

    def insert(self, *args):
        raise NotImplementedError

    def select(self, **kwargs):
        "Run 'select' on the manifest."
        _check_select_parameters(**kwargs)
        new_manifest = self.manifest.select_to_manifest(**kwargs)
        return StandaloneManifestIndex(new_manifest, self._location, prefix=self.prefix)


def _check_select_parameters(**kw):
    "Check 'select' parameters for types/conversion."
    params = set(kw)
    params -= {"ksize", "num", "moltype", "scaled", "abund", "picklist", "containment"}
    if params:
        raise ValueError(f"unknown 'select' parameters: {params}")

    ksize = kw.get("ksize")
    if ksize is not None and not isinstance(ksize, int):
        raise ValueError(f"ksize value '{ksize}' must be an integer, is: {type(ksize)}")

    moltype = kw.get("moltype")
    if moltype is not None and moltype not in ["DNA", "protein", "dayhoff", "hp"]:
        raise ValueError(f"unknown moltype: {moltype}")

    scaled = kw.get("scaled")
    if scaled is not None and not isinstance(scaled, int):
        raise ValueError(
            f"scaled value '{scaled}' must be an integer, is: {type(scaled)}"
        )

    containment = kw.get("containment")
    if containment is not None and not isinstance(containment, bool):
        raise ValueError(
            f"containment value '{containment}' must be a bool, is: {type(containment)}"
        )

    abund = kw.get("abund")
    if abund is not None and not isinstance(abund, bool):
        raise ValueError(f"abund value '{abund}' must be a bool, is: {type(abund)}")

    num = kw.get("num")
    if num is not None and not isinstance(num, int):
        raise ValueError(f"num value '{num}' must be an integer, is: {type(num)}")
