"""Sequence Bloom Tree index: n-ary tree of Bloom filters over signatures.

Behavior + format parity: reference `src/sourmash/sbt.py` (SBT:118,
GraphFactory:43, Node:1409, Leaf:1467; on-disk versions v1–v6, v6 writer
:637-820). Provided chiefly for compatibility with existing `.sbt.zip` /
`.sbt.json` databases — the TPU-native search path is the flat device index
(`index/flat.py`); SBT search here follows the reference's pruned queue walk.

The v1–v6 on-disk formats are decoded by ONE loader (`_load_any`) driven by
the `_LAYOUTS` table, which captures how each version differs: where leaf
records live, whether filenames are dirname-relative, where the Bloom-filter
factory parameters come from, and which post-load fixups apply.
"""

from __future__ import annotations

import json
import math
import os
import sys
from collections import namedtuple
from collections.abc import Mapping
from io import StringIO
from random import random
from tempfile import NamedTemporaryFile

from .exceptions import IndexNotSupported
from .index import Index, IndexSearchResult, _check_select_parameters
from .logging import error, notify, debug
from .manifest import CollectionManifest
from .nodegraph import Nodegraph, extract_nodegraph_info, calc_expected_collisions
from .picklist import passes_all_picklists
from .sbt_storage import FSStorage, ZipStorage, IPFSStorage, RedisStorage

STORAGES = {
    cls.__name__: cls
    for cls in (FSStorage, IPFSStorage, RedisStorage, ZipStorage)
}

NodePos = namedtuple("NodePos", ["pos", "node"])


class GraphFactory:
    "Build new nodegraphs (Bloom filters) of a fixed configuration."

    __slots__ = ("ksize", "starting_size", "n_tables")

    def __init__(self, ksize, starting_size, n_tables):
        self.ksize, self.starting_size = ksize, starting_size
        self.n_tables = n_tables

    def __call__(self):
        return Nodegraph(*self.init_args())

    def init_args(self):
        return (self.ksize, self.starting_size, self.n_tables)


class _NodesCache:
    """Bounded cache of loaded internal nodes; evicts largest node ids
    first (nearest the leaves) and unloads evicted nodes (reference
    `sbt.py:68-116`)."""

    def __init__(self, maxsize):
        self.maxsize = max(1, maxsize)
        self._d = {}

    @property
    def currsize(self):
        return len(self._d)

    def __contains__(self, key):
        return key in self._d

    def __getitem__(self, key):
        return self._d[key]

    def __setitem__(self, key, value):
        self._d[key] = value
        while len(self._d) > self.maxsize:
            evict = max(self._d)
            node = self._d.pop(evict)
            if node is not value:
                node.unload()


# how each on-disk SBT version lays out its JSON description:
#   leaves_key          key holding leaf records (None = mixed into "nodes",
#                       discriminated by "internal" in the node name)
#   dir_relative        filenames must be joined onto the index's dirname
#   factory_from_file   Bloom params read from a sample nodegraph file
#                       (older versions) vs. info["factory"]["args"]
#   track_missing       record absent positions for on-demand rebuild
#   fill_min_n          recompute min_n_below after loading
#   warn_old            print the "please migrate" warning
#   set_next_node       initialize next_node from the max position
_Layout = namedtuple(
    "_Layout",
    "leaves_key dir_relative factory_from_file track_missing fill_min_n warn_old set_next_node",
)

_LAYOUTS = {
    1: _Layout(None, True, True, False, True, False, False),
    2: _Layout(None, True, True, False, True, False, False),
    3: _Layout(None, False, False, True, True, True, False),
    4: _Layout(None, False, False, True, False, False, True),
    5: _Layout("leaves", False, False, True, False, False, False),
    6: _Layout("signatures", False, False, True, False, False, False),
}


class SBT(Index):
    "Sequence Bloom Tree with generic internal nodes and leaves."

    is_database = True

    def __init__(self, factory, *, d=2, storage=None, cache_size=None):
        self.factory, self.d = factory, d
        self._nodes, self._leaves = {}, {}
        self._missing_nodes = set()
        self.next_node = 0
        self.storage, self._location = storage, None
        self.picklists = []
        self.manifest = None
        if cache_size is None:
            cache_size = sys.maxsize
        self._nodescache = _NodesCache(maxsize=cache_size)

    @property
    def location(self):
        return self._location

    def signatures(self):
        if self.manifest:
            yield from self._signatures_from_manifest()
            return
        for k in self.leaves():
            if passes_all_picklists(k.data, self.picklists):
                yield k.data

    def _signatures_from_manifest(self):
        "Manifest-driven enumeration: decompress only the selected members."
        from .signature import load_one_signature_from_json

        rows = self.manifest
        for picklist in self.picklists:
            rows = rows.select_to_manifest(picklist=picklist)
        for loc in rows.locations():
            yield load_one_signature_from_json(self.storage.load(loc))

    def _signatures_with_internal(self):
        for k in self.leaves():
            yield k.data, k._path

    def select(self, ksize=None, moltype=None, num=0, scaled=0,
               containment=False, abund=None, picklist=None, **kwargs):
        "Check this database against requirements; raise ValueError if unmet."
        _check_select_parameters(
            ksize=ksize, num=num, moltype=moltype, scaled=scaled,
            containment=containment, abund=abund, picklist=picklist, **kwargs,
        )

        db_mh = next(iter(self.signatures())).minhash

        def forbid(failed, message):
            if failed:
                raise ValueError(message)

        forbid(
            ksize is not None and db_mh.ksize != ksize,
            f"search ksize {ksize} is different from database ksize {db_mh.ksize}",
        )
        forbid(
            moltype is not None and db_mh.moltype != moltype,
            f"search moltype {moltype} is different from database moltype {db_mh.moltype}",
        )
        forbid(
            containment and not db_mh.scaled,
            "cannot search this SBT for containment; signatures are not calculated with scaled",
        )
        if num:
            forbid(
                not db_mh.num,
                "this database was created with 'scaled' MinHash sketches, not 'num'",
            )
            forbid(num != db_mh.num, f"num mismatch for SBT: num={num}, {db_mh.num}")
        if scaled:
            forbid(
                not db_mh.scaled,
                "this database was created with 'num' MinHash sketches, not 'scaled'",
            )
            forbid(
                scaled > db_mh.scaled and not containment,
                f"search scaled value {scaled} is less than database scaled value of {db_mh.scaled}",
            )
        forbid(abund, "SBT indices do not support sketches with abund=True")

        if picklist is not None:
            self.picklists.append(picklist)
        forbid(
            len(self.picklists) > 1,
            "we do not (yet) support multiple picklists for SBTs",
        )
        return self

    # -- tree structure ----------------------------------------------------

    def new_node_pos(self, node):
        "Slot for the next insertion (the node argument is not consulted)."
        if not self._nodes:
            self.next_node, pos = 1, 0
        elif not self._leaves:
            self.next_node, pos = 2, 1
        else:
            first_leaf = min(self._leaves)
            pos = max(self._leaves) + 1
            if self.next_node <= first_leaf:
                # reuse a gap below the first leaf when one exists
                taken = (
                    self._nodes.keys() | self._leaves.keys()
                    | self._missing_nodes
                )
                pos = next(
                    (i for i in range(first_leaf) if i not in taken), pos
                )
            self.next_node = pos
        return pos

    def insert(self, signature):
        "Add a new SourmashSignature into the SBT."
        from .sbtmh import SigLeaf

        self.add_node(SigLeaf(signature.md5sum(), signature))

    def _new_internal(self, pos):
        n = Node(self.factory, name="internal." + str(pos))
        self._nodes[pos] = n
        return n

    def add_node(self, node):
        pos = self.new_node_pos(node)

        if pos == 0:
            self._new_internal(0)
            pos = self.new_node_pos(node)

        p = self.parent(pos)
        attach_under = None
        if isinstance(p.node, Leaf):
            # split: the occupied slot becomes an internal node with the
            # old leaf and the new node as its first two children
            attach_under = self._new_internal(p.pos)
            c1, c2 = self.children(p.pos)[:2]
            self._leaves[c1.pos] = p.node
            self._leaves[c2.pos] = node
            del self._leaves[p.pos]
            p.node.update(attach_under)
        elif isinstance(p.node, Node):
            attach_under = p.node
            self._leaves[pos] = node
        elif p.node is None:
            attach_under = self._new_internal(p.pos)
            self._leaves[self.children(p.pos)[0].pos] = node
        else:
            assert 0
        node.update(attach_under)

        # propagate the new hashes up to the root
        p = self.parent(p.pos)
        while p:
            self._rebuild_node(p.pos)
            node.update(self._nodes[p.pos])
            p = self.parent(p.pos)

    def _node_at(self, pos):
        "Resolve a position to its leaf/internal node, rebuilding if missing."
        node_g = self._leaves.get(pos)
        if node_g is not None:
            return node_g
        node_g = self._nodes.get(pos)
        if node_g is not None:
            return node_g
        if pos in self._missing_nodes:
            self._rebuild_node(pos)
            return self._nodes[pos]
        return None

    def _find_nodes(self, search_fn, *args, **kwargs):
        "Pruned queue walk of the tree using search_fn."
        unload_data = kwargs.get("unload_data", True)
        dfs = kwargs.get("dfs", True)

        matches = []
        seen = set()
        frontier = [0]

        def expand(pos, node):
            "A passing node: collect a leaf, or walk into an internal node."
            if isinstance(node, Leaf):
                matches.append(node)
                return
            if not isinstance(node, Node):
                return
            kids = [c.pos for c in self.children(pos)]
            if dfs:
                # prepended as a block == one-by-one reversed prepends
                # (reference sbt.py:419)
                frontier[0:0] = reversed(kids)
            else:
                frontier.extend(kids)

        def park(pos, node):
            "Post-visit memory policy: cache internals, unload leaves."
            if isinstance(node, Node):
                # bounded cache; eviction unloads (reference sbt.py:68-116)
                self._nodescache[pos] = node
            else:
                node.unload()

        while frontier:
            pos = frontier.pop(0)
            node = self._node_at(pos)
            if node is None or pos in seen:
                continue
            seen.add(pos)
            if search_fn(node, *args):
                expand(pos, node)
            if unload_data:
                park(pos, node)

        return matches

    def _align_to_query(self, query_mh, a_leaf):
        """Bring query/subjects to comparable resolution. Returns the working
        query sketch and a subject-downsampling function."""
        leaf_mh = a_leaf.data.minhash

        if leaf_mh.scaled:
            assert query_mh.scaled
            scaled = max(query_mh.scaled, leaf_mh.scaled)
            if query_mh.scaled < leaf_mh.scaled:
                query_mh = query_mh.downsample(scaled=leaf_mh.scaled)

            if scaled == leaf_mh.scaled:
                return query_mh, lambda x: x
            return query_mh, lambda mh: mh.downsample(scaled=scaled)

        assert query_mh.num
        min_num = min(query_mh.num, leaf_mh.num)
        if query_mh.num > min_num:
            query_mh = query_mh.downsample(num=min_num)

        if min_num == leaf_mh.num:
            return query_mh, lambda x: x
        return query_mh, lambda mh: mh.downsample(num=min_num)

    def find(self, search_fn, query, **kwargs):
        "Jaccard/containment search with internal-node upper-bound pruning."
        from .sbtmh import SigLeaf

        search_fn.check_is_compatible(query)

        a_leaf = next(iter(self.leaves()))
        query_mh, downsample_node = self._align_to_query(query.minhash, a_leaf)

        query_size = len(query_mh)
        results = {}

        def leaf_sizes(leaf):
            "Exact (downsampled, flattened) sketch comparison sizes."
            subj_mh = downsample_node(leaf.data.minhash)
            n_subj = len(subj_mh)
            flat = subj_mh.flatten()
            assert not flat.track_abundance
            shared, total = query_mh.intersection_and_union_size(flat)
            return shared, n_subj, total

        def internal_sizes(node):
            "Bloom-filter upper bound on the overlap below this node."
            bound = node.data.matches(query_mh)
            below = node.metadata.get("min_n_below", -1)
            if below == -1:
                raise ValueError(
                    "ERROR: no min_n_below on this tree, cannot search."
                )
            return bound, below, below

        def node_search(node, *args, **kw):
            leafy = isinstance(node, SigLeaf)
            sizes = leaf_sizes(node) if leafy else internal_sizes(node)
            score = search_fn.score_fn(query_size, *sizes)
            if not search_fn.passes(score):
                return False
            if not leafy:
                return True  # descend
            if search_fn.collect(score, node.data):
                results[node.data] = score
                return True
            return False

        for n in self._find_nodes(node_search, **kwargs):
            if passes_all_picklists(n.data, self.picklists):
                yield IndexSearchResult(results[n.data], n.data, self.location)

    def _rebuild_node(self, pos=0):
        "Recursively rebuild a missing internal node."
        if self._nodes.get(pos) is not None:
            return

        node = self._nodes[pos] = Node(self.factory, name=f"internal.{pos}")
        for c in self.children(pos):
            rebuildable = c.pos in self._missing_nodes or isinstance(c.node, Leaf)
            if rebuildable:
                if c.node is None:
                    self._rebuild_node(c.pos)
                (c.node or self._nodes[c.pos]).update(node)

    def _resolve_pos(self, pos):
        if pos in self._leaves:
            return NodePos(pos, self._leaves[pos])
        return NodePos(pos, self._nodes.get(pos, None))

    def parent(self, pos):
        if pos == 0:
            return None
        return self._resolve_pos(int(math.floor((pos - 1) / self.d)))

    def children(self, pos):
        return [self.child(pos, c) for c in range(self.d)]

    def child(self, parent, pos):
        return self._resolve_pos(self.d * parent + pos + 1)

    def leaves(self, with_pos=False, unload_data=False):
        if with_pos:
            return list(self._leaves.items())
        return list(self._leaves.values())

    def __len__(self):
        return len(self._leaves)

    def __iter__(self):
        yield from self._nodes.items()
        yield from self._leaves.items()

    # -- saving --------------------------------------------------------------

    def _prepare_save_storage(self, path, storage):
        """Resolve the output layout for save(): returns
        (kind, storage, name, subdir, index_filename, path, storage_info)."""
        subdir = None
        if not path.endswith(".sbt.json"):
            # default: self-contained .sbt.zip with an FSStorage-style subdir
            if not path.endswith(".sbt.zip"):
                path += ".sbt.zip"
            storage = ZipStorage(path, mode="w")

            name = os.path.basename(path[:-8])
            subdir = f".sbt.{name}"
            storage_info = {
                "backend": "FSStorage",
                "args": FSStorage("", subdir, make_dirs=False).init_args(),
            }
            storage.save(subdir + "/", b"")
            storage.subdir = subdir
            return "Zip", storage, name, subdir, os.path.abspath(path), path, storage_info

        name = os.path.basename(path)[:-9]
        index_filename = os.path.abspath(path)

        kind = None
        if storage is None:
            kind = "FS"
            where = os.path.dirname(index_filename)
            subdir = f".sbt.{name}"
            storage = FSStorage(where, subdir)
            index_filename = os.path.join(where, index_filename)

        backend = next(k for k, v in STORAGES.items() if v is type(storage))
        storage_info = {"backend": backend, "args": storage.init_args()}
        return kind, storage, name, subdir, index_filename, path, storage_info

    def save(self, path, storage=None, sparseness=0.0, structure_only=False):
        "Save the SBT: v6 JSON description + node blobs (zip or FS)."
        (
            kind,
            storage,
            name,
            subdir,
            index_filename,
            path,
            storage_info,
        ) = self._prepare_save_storage(path, storage)

        info = {
            "d": self.d,
            "version": 6,
            "index_type": self.__class__.__name__,
            "storage": storage_info,
            "factory": {
                "class": GraphFactory.__name__,
                "args": self.factory.init_args(),
            },
        }

        nodes, leaves = {}, {}
        total_nodes = len(self) + len(self._nodes.keys() | self._missing_nodes)
        manifest_rows = []

        def serialize_one(node):
            "One node/leaf -> its JSON record (+ blob written to storage)."
            record = {"filename": os.path.basename(node.name), "name": node.name}
            md = node.metadata
            if hasattr(md, "pop"):
                md.pop("max_n_below", None)
            record["metadata"] = md
            if not structure_only:
                node.data  # force the load before re-targeting storage
                node.storage = storage
                target = record["filename"]
                if kind == "Zip":
                    target = os.path.join(subdir, target)
                stored_at = node.save(target)
                if kind == "Zip":
                    assert stored_at.startswith(subdir + "/")
                    stored_at = stored_at[len(subdir) + 1:]
                record["filename"] = stored_at
            return record

        for n, (i, node) in enumerate(self):
            # --sparseness randomly drops internal nodes (rebuilt on load)
            dropped = node is None or (
                isinstance(node, Node) and random() - sparseness <= 0
            )
            if not dropped:
                record = serialize_one(node)
                if isinstance(node, Node):
                    nodes[i] = record
                else:
                    leaves[i] = record
                    row = node.make_manifest_row(record["filename"])
                    if row:
                        manifest_rows.append(row)
            if not dropped and n % 100 == 0:
                notify(f"{format(n+1)} of {format(total_nodes)} nodes saved", end="\r")

        notify("Finished saving nodes, now saving SBT index file.")
        info["nodes"] = nodes
        info["signatures"] = leaves

        manifest_fp = StringIO()
        CollectionManifest(manifest_rows).write_to_csv(manifest_fp, write_header=True)
        manifest_data = manifest_fp.getvalue().encode("utf-8")

        manifest_name = f"{name}.manifest.csv"
        if kind == "Zip":
            manifest_name = os.path.join(storage.subdir, manifest_name)
            info["manifest_path"] = storage.save(
                manifest_name, manifest_data, overwrite=True, compress=True
            )
        elif kind == "FS":
            info["manifest_path"] = storage.save(
                manifest_name, manifest_data, overwrite=True
            )

        tree_data = json.dumps(info).encode("utf-8")

        if kind == "Zip":
            storage.save(f"{name}.sbt.json", tree_data, overwrite=True)
            storage.flush()
            storage.close()
        else:
            # FS and explicit-storage layouts keep the index JSON at the
            # top-level path, next to the hidden storage dir
            with open(index_filename, "wb") as tree_fp:
                tree_fp.write(tree_data)

        notify(f"Finished saving SBT index, available at {format(index_filename)}\n")
        return path

    # -- loading -----------------------------------------------------------

    @staticmethod
    def _probe_zip_storage(location):
        "Open `location` (or `location`.sbt.zip) as ZipStorage if possible."
        if ZipStorage.can_open(location):
            return ZipStorage(location)
        if not location.endswith(".sbt.zip"):
            zip_location = location + ".sbt.zip"
            if os.path.exists(zip_location) and ZipStorage.can_open(zip_location):
                return ZipStorage(zip_location)
        return None

    @classmethod
    def _read_description(cls, location, storage):
        """Locate + parse the .sbt.json description. Returns
        (jnodes, dirname, sbt_name)."""
        if storage:
            sbts = storage.list_sbts()
            if len(sbts) == 1:
                # spool the description out of the archive for json.load
                with NamedTemporaryFile() as spool:
                    spool.write(storage.load(sbts[0]))
                    spool.flush()
                    with open(spool.name) as fp:
                        return (
                            json.load(fp),
                            os.path.dirname(spool.name),
                            os.path.basename(spool.name),
                        )

        dirname = os.path.dirname(os.path.abspath(location))
        sbt_name = os.path.basename(location)
        if sbt_name.endswith(".sbt.json"):
            sbt_name = sbt_name[: -len(".sbt.json")]
        sbt_fn = os.path.join(dirname, sbt_name)
        if not sbt_fn.endswith(".sbt.json"):
            sbt_fn += ".sbt.json"
        try:
            with open(sbt_fn) as fp:
                return json.load(fp), dirname, sbt_name
        except NotADirectoryError as exc:
            raise ValueError(str(exc))

    @classmethod
    def load(cls, location, *, leaf_loader=None, storage=None,
             print_version_warning=True, cache_size=None):
        "Load an SBT description (any version v1-v6, zip or FS layout)."
        storage = storage or cls._probe_zip_storage(location)
        jnodes, dirname, sbt_name = cls._read_description(location, storage)

        version = jnodes["version"] if isinstance(jnodes, Mapping) else 1

        if leaf_loader is None:
            leaf_loader = Leaf.load

        if version not in _LAYOUTS:
            raise IndexNotSupported()

        if storage is None:
            if version < 3:
                storage = FSStorage(dirname, f".sbt.{sbt_name}")
            else:
                storage = _storage_from_info(jnodes["storage"], dirname)

        obj = cls._load_any(
            jnodes,
            leaf_loader,
            dirname,
            storage,
            version=version,
            print_version_warning=print_version_warning,
            cache_size=cache_size,
        )
        obj._location = location

        if isinstance(jnodes, Mapping) and "manifest_path" in jnodes:
            manifest_data = storage.load(jnodes["manifest_path"]).decode("utf-8")
            obj.manifest = CollectionManifest.load_from_csv(StringIO(manifest_data))
        else:
            obj.manifest = None

        return obj

    @classmethod
    def _load_any(
        cls,
        info,
        leaf_loader,
        dirname,
        storage,
        *,
        version,
        print_version_warning=True,
        cache_size=None,
    ):
        "Version-table-driven SBT deserialization (see _LAYOUTS)."
        layout = _LAYOUTS[version]

        if version == 1:
            # v1 is a bare JSON list; adapt it to the dict shape
            info = {"nodes": dict(enumerate(info)), "d": 2}
            node_entries = info["nodes"]
        else:
            node_entries = {int(k): v for (k, v) in info["nodes"].items()}

        leaf_entries = None
        if layout.leaves_key:
            leaf_entries = {int(k): v for (k, v) in info[layout.leaves_key].items()}
            if not leaf_entries:
                raise ValueError("Empty tree!")
        elif version <= 2:
            if node_entries[0] is None:
                raise ValueError("Empty tree!")
        elif not node_entries:
            raise ValueError("Empty tree!")

        if layout.factory_from_file:
            sample_bf = os.path.join(dirname, node_entries[0]["filename"])
            factory = GraphFactory(*extract_nodegraph_info(sample_bf)[:3])
        else:
            factory = GraphFactory(*info["factory"]["args"])

        sbt_nodes = {}
        sbt_leaves = {}
        max_node = 0

        def load_entry(pos, entry, *, force_internal=False, force_leaf=False):
            nonlocal max_node
            if layout.dir_relative:
                entry["filename"] = os.path.join(dirname, entry["filename"])
            if force_internal or (not force_leaf and "internal" in entry["name"]):
                entry["factory"] = factory
                sbt_nodes[pos] = Node.load(entry, storage)
            else:
                sbt_leaves[pos] = leaf_loader(entry, storage)
            max_node = max(max_node, pos)

        for pos, entry in node_entries.items():
            if entry is None:
                continue
            load_entry(pos, entry, force_internal=bool(layout.leaves_key))

        if leaf_entries:
            for pos, entry in leaf_entries.items():
                load_entry(pos, entry, force_leaf=True)

        # v1/v2 trees predate the storage field and leave it unset
        tree_storage = storage if version >= 3 else None
        tree = cls(factory, d=info["d"], storage=tree_storage, cache_size=cache_size)
        tree._nodes = sbt_nodes
        tree._leaves = sbt_leaves

        if layout.track_missing:
            tree._missing_nodes = {
                i
                for i in range(max_node)
                if i not in sbt_nodes and i not in sbt_leaves
            }
        if layout.set_next_node:
            tree.next_node = max_node

        if layout.warn_old and print_version_warning:
            error(
                "WARNING: this is an old index version, please run `sourmash migrate` to update it."
            )
            error(
                "WARNING: proceeding with execution, but it will take longer to finish!"
            )

        if layout.fill_min_n:
            tree._fill_min_n_below()
        return tree

    # -- metadata maintenance ---------------------------------------------

    def _fill_min_n_below(self):
        "Propagate the smallest sketch size below each node up the tree."

        def child_floor(child):
            if isinstance(child.node, Leaf):
                return len(child.node.data.minhash)
            return child.node.metadata.get("min_n_below", sys.maxsize)

        def refresh(node, *args, **kwargs):
            before = node.metadata.get("min_n_below", sys.maxsize)
            floor = min(
                (
                    child_floor(c)
                    for c in kwargs["children"]
                    if c.node is not None
                ),
                default=before,
            )
            floor = min(floor, before) or 1
            node.metadata["min_n_below"] = floor
            return before != floor

        self._fill_up(refresh)

    def _fill_up(self, search_fn, *args, **kwargs):
        "Apply search_fn to all internal nodes, deepest first."
        debug("started filling up")
        pending = sorted(self._leaves.keys(), reverse=True)
        done = set()
        processed = 0

        def take_parent(pos):
            "Resolve pos's parent, rebuilding it if recorded as missing."
            parent = self.parent(pos)
            if parent is None:
                return None, False
            if parent.node is not None:
                return parent, False
            if parent.pos not in self._missing_nodes:
                return None, True
            self._rebuild_node(parent.pos)
            return self.parent(pos), True

        while pending:
            pos = pending.pop(0)
            parent, was_missing = take_parent(pos)
            if parent is None:
                continue

            if pos not in done:
                siblings = self.children(parent.pos)
                done.add(pos)
                for sib in siblings:
                    done.add(sib.pos)
                    if sib.pos in pending:
                        pending.remove(sib.pos)
                refreshed = search_fn(parent.node, children=siblings, *args)
                if refreshed or was_missing:
                    pending.append(parent.pos)

            processed += 1
            if not processed % 100:
                debug(
                    "processed {}, in queue {}", processed, len(pending),
                    sep="\r",
                )

    def print_dot(self):  # pragma: no cover
        preamble = ("digraph G {", "nodesep=0.3;", "ranksep=0.2;", "margin=0.1;",
                    "node [shape=ellipse];", "edge [arrowsize=0.8];")
        print("\n" + "\n".join("        " + line for line in preamble) + "\n")
        for i, node in self._nodes.items():
            if isinstance(node, Node):
                print(f'"{i}" [shape=box fillcolor=gray style=filled] // node')
                for j, child in self.children(i):
                    if child is not None:
                        print(f'"{i}" -> "{j}"')
        print("}")

    def combine(self, other):
        "Merge another SBT into this one by re-inserting all leaves."
        for leaf in other.leaves():
            self.add_node(leaf)
        return self


def _storage_from_info(storage_info, dirname):
    "Instantiate the storage backend recorded in an SBT's JSON description."
    klass = STORAGES[storage_info["backend"]]
    if storage_info["backend"] == "FSStorage":
        return FSStorage(dirname, storage_info["args"]["path"])
    return klass(**storage_info["args"])


class _StoredGraph:
    """Shared lazy-load/unload/save behavior for tree nodes whose payload
    is a Nodegraph blob in a storage backend."""

    _save_overwrite = False

    @property
    def data(self):
        if self._data is None:
            self._data = self._materialize()
        return self._data

    @data.setter
    def data(self, new_data):
        self._data = new_data

    def _materialize(self):
        return Nodegraph.from_buffer(self.storage.load(self._path))

    def unload(self):
        if self.storage:
            self._data = None

    def save(self, path):
        buf = self.data.to_bytes(compression=1)
        if self._save_overwrite:
            return self.storage.save(path, buf, overwrite=True)
        return self.storage.save(path, buf)

    def update(self, parent):
        parent.data.update(self.data)


class Node(_StoredGraph):
    "Internal node of SBT (a Bloom filter over all hashes below)."

    _save_overwrite = True

    def __init__(self, factory, name=None, path=None, storage=None):
        self.name, self.storage = name, storage
        self._factory = factory
        self._data, self._path = None, path
        self.metadata = {}

    def __str__(self):
        fpr = calc_expected_collisions(self.data, True, 1.1)
        return f"*Node:{self.name} [occupied: {self.data.n_occupied()}, fpr: {fpr:.2}]"

    def _materialize(self):
        if self._path is None:
            return self._factory()
        return super()._materialize()

    @staticmethod
    def load(info, storage=None):
        loaded = Node(info["factory"], name=info["name"],
                      path=info["filename"], storage=storage)
        loaded.metadata = info.get("metadata", {})
        return loaded

    def update(self, parent):
        super().update(parent)
        mine = self.metadata.get("min_n_below")
        if mine is not None:
            floor = min(parent.metadata.get("min_n_below", sys.maxsize), mine)
            parent.metadata["min_n_below"] = floor or 1


class Leaf(_StoredGraph):
    "Leaf node holding a Bloom filter (or, via SigLeaf, a signature)."

    def __init__(self, metadata, data=None, name=None, storage=None, path=None):
        self.metadata = metadata
        self.name = metadata if name is None else name
        self.storage = storage
        self._data, self._path = data, path

    def __str__(self):
        fpr = calc_expected_collisions(self.data, True, 1.1)
        return (f"**Leaf:{self.name} [occupied: {self.data.n_occupied()},"
                f" fpr: {fpr:.2}] -> {self.metadata}")

    def make_manifest_row(self, location):
        return None

    @classmethod
    def load(cls, info, storage=None):
        return cls(info["metadata"], name=info["name"],
                   path=info["filename"], storage=storage)


# per-class wrappers kept for reference API familiarity
def _make_versioned_loader(version):
    def loader(cls, info, leaf_loader, dirname, storage, *, print_version_warning=True, cache_size=None):
        return cls._load_any(
            info, leaf_loader, dirname, storage,
            version=version,
            print_version_warning=print_version_warning,
            cache_size=cache_size,
        )
    return classmethod(loader)


for _v in _LAYOUTS:
    setattr(SBT, f"_load_v{_v}", _make_versioned_loader(_v))


_CONVERT_BACKENDS = {
    "ipfs": IPFSStorage,
    "ipfsstorage": IPFSStorage,
    "redis": RedisStorage,
    "redisstorage": RedisStorage,
    "zip": ZipStorage,
    "zipstorage": ZipStorage,
    "fs": FSStorage,
    "fsstorage": FSStorage,
}


def convert_cmd(name, backend):
    """Convert an SBT to use a different storage back end (reference
    `sbt.py:1554-1596`). zip and fs backends are supported; ipfs/redis
    require client libraries not present in this environment."""
    from .sbtmh import SigLeaf

    options = backend.split("(")
    backend_name = options.pop(0).lower().strip("'")

    kwargs = {}
    if options:
        # the option is passed shell-quoted, e.g. 'ZipStorage("/path.zip")'
        options = [options[0].split(")")[0].strip("\"'")]

    klass = _CONVERT_BACKENDS.get(backend_name)
    if klass is None:
        error(f"backend not recognized: {backend_name}")
        return 1

    if klass is ZipStorage:
        kwargs["mode"] = "w"
    elif klass is FSStorage:
        if options:
            options = [os.path.dirname(options[0]), os.path.basename(options[0])]
        else:
            # default layout used by SBT v2
            tag = ".sbt." + os.path.basename(name)
            if tag.endswith(".sbt.json"):
                tag = tag[:-9]
            options = [os.path.dirname(name), tag]

    with klass(*options, **kwargs) as storage:
        sbt = SBT.load(name, leaf_loader=SigLeaf.load)
        sbt.save(name, storage=storage)
