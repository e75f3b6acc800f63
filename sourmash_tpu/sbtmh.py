"""MinHash-leaf SBT support (parity: reference `src/sourmash/sbtmh.py`)."""

from __future__ import annotations

import sys
from io import BytesIO

from .sbt import Leaf, SBT, GraphFactory
from . import signature


def load_sbt_index(filename, *, print_version_warning=True, cache_size=None):
    "Load and return an SBT index."
    return SBT.load(
        filename,
        leaf_loader=SigLeaf.load,
        print_version_warning=print_version_warning,
        cache_size=cache_size,
    )


def create_sbt_index(bloom_filter_size=1e5, n_children=2):
    "Create an empty SBT index."
    return SBT(GraphFactory(1, bloom_filter_size, 4), d=n_children)


def search_sbt_index(tree, query, threshold):
    "Search an SBT index with a query signature; yields (match, score)."
    for score, match, _ in tree.search(query, threshold=threshold, unload_data=True):
        yield match, score


def _ratchet_min_n_below(parent, n):
    "Fold a child's sketch size into the parent's min_n_below metadata."
    floor = min(parent.metadata.get("min_n_below", sys.maxsize), n)
    parent.metadata["min_n_below"] = max(floor, 1)


class SigLeaf(Leaf):
    "SBT leaf holding a signature (stored as .sig.gz in the SBT storage)."

    def __str__(self):
        return f"**Leaf:{self.name} -> {self.metadata}"

    def make_manifest_row(self, loc):
        from .manifest import CollectionManifest

        return CollectionManifest.make_manifest_row(
            self.data, loc, include_signature=0
        )

    def save(self, path):
        self.data  # trigger load before potential overwrite
        buf = signature.save_signatures_to_json([self.data], compression=1)
        return self.storage.save(path, buf)

    def update(self, parent):
        mh = self.data.minhash
        parent.data.update(mh)
        _ratchet_min_n_below(parent, len(mh))

    @property
    def data(self):
        if self._data is None:
            buf = BytesIO(self.storage.load(self._path))
            self._data = signature.load_one_signature_from_json(buf)
        return self._data

    @data.setter
    def data(self, new_data):
        self._data = new_data
