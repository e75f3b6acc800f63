"""Index loading chain + bulk signature saving.

API parity: reference `src/sourmash/save_load.py`
(load_file_as_index:51, SaveSignaturesToLocation:69, loader chain :94-253,
saver classes :256-549). Loader priorities and location-matching rules are
identical so every reference-compatible location works: stdin, standalone
manifest CSV, pathlist, path/dir, SBT, LCA json, sqlite, zip, and a trailing
FASTA/FASTQ error check.
"""

from __future__ import annotations

import gzip
import itertools
import os
import sys
import traceback
import zipfile
from io import StringIO

from . import plugins as sourmash_plugins
from . import signature as sigmod
from .exceptions import SourmashError
from .index import LinearIndex, MultiIndex, ZipFileLinearIndex
from .logging import debug_literal, notify
from .manifest import CollectionManifest


class IndexNotLoaded(SourmashError):
    pass


def load_file_as_index(filename, *, yield_all_files=False):
    "Load 'filename' as a database via the generic loader chain."
    return _load_database(filename, yield_all_files)


def SaveSignaturesToLocation(location):
    """Context manager that saves signatures in the output format matching
    `location` (None, dir/, .zip, .sqldb, .sig[.gz], '-')."""
    save_list = itertools.chain(_save_classes, sourmash_plugins.get_save_to_functions())
    for priority, cls in sorted(save_list, key=lambda x: x[0]):
        debug_literal(f"trying to match save function {cls}, priority={priority}")
        if cls.matches(location):
            debug_literal(f"{cls} is a match!")
            return cls(location)

    raise Exception(
        f"cannot determine how to open location {location} for saving; this should never happen!?"
    )


def _iter_loaders():
    "Built-in + plugin loader functions, in priority order."
    plugin_fns = sourmash_plugins.get_load_from_functions()
    yield from sorted(itertools.chain(_loader_functions, plugin_fns))


def _load_database(filename, traverse_yield_all, *, cache_size=None):
    "Try loader functions in priority order; return the first Index."
    for priority, desc, load_fn in _iter_loaders():
        debug_literal(
            f"_load_databases: trying loader fn - priority {priority} - '{desc}'"
        )
        try:
            db = load_fn(
                filename, traverse_yield_all=traverse_yield_all, cache_size=cache_size
            )
        except (ValueError, IndexNotLoaded):
            debug_literal(f"_load_databases: FAIL with ValueError: on fn {desc}.")
            debug_literal(traceback.format_exc())
            continue

        if db is not None:
            debug_literal("_load_databases: success!")
            return db

    raise ValueError(f"Error while reading signatures from '{filename}'.")


_loader_functions = []


def add_loader(name, priority):
    "Decorator registering a loader function at a given priority."

    def dec_priority(func):
        _loader_functions.append((priority, name, func))
        return func

    return dec_priority


@add_loader("load from stdin", 10)
def _load_stdin(filename, **kwargs):
    "Load collection from .sig file streamed in via stdin."
    db = None
    if filename == "-":
        lidx = LinearIndex.load(sys.stdin, filename="-")
        db = MultiIndex.load((lidx,), (None,), parent="-")
    return db


@add_loader("load collection from sqlitedb", 20)
def _load_sqlite_db(filename, **kwargs):
    try:
        from .index.sqlite_index import load_sqlite_index
    except ImportError as exc:
        raise IndexNotLoaded(str(exc))

    return load_sqlite_index(filename)


@add_loader("load from standalone manifest", 30)
def _load_standalone_manifest(filename, **kwargs):
    from .index import StandaloneManifestIndex

    try:
        idx = StandaloneManifestIndex.load(filename)
    except gzip.BadGzipFile as exc:
        raise IndexNotLoaded(str(exc))
    return idx


@add_loader("load from path (file or directory)", 40)
def _multiindex_load_from_path(filename, **kwargs):
    "Load collection from a directory or .sig file."
    traverse_yield_all = kwargs["traverse_yield_all"]
    return MultiIndex.load_from_path(filename, traverse_yield_all)


@add_loader("load from list of paths", 50)
def _multiindex_load_from_pathlist(filename, **kwargs):
    "Load collection from a text file listing signature/database files."
    return MultiIndex.load_from_pathlist(filename)


@add_loader("load SBT", 60)
def _load_sbt(filename, **kwargs):
    "Load collection from an SBT (.sbt.zip / .sbt.json)."
    try:
        from .sbtmh import load_sbt_index
    except ImportError as exc:
        raise IndexNotLoaded(str(exc))

    try:
        db = load_sbt_index(filename, cache_size=kwargs.get("cache_size"))
    except (FileNotFoundError, TypeError) as exc:
        raise IndexNotLoaded(str(exc))
    return db


@add_loader("load revindex", 70)
def _load_revindex(filename, **kwargs):
    "Load collection from a disk revindex directory or an LCA database."
    from .index.revindex import is_revindex_dir, load_revindex

    if is_revindex_dir(filename):
        return load_revindex(filename)

    try:
        from .lca.lca_db import load_single_database
    except ImportError as exc:
        raise IndexNotLoaded(str(exc))

    db, _, _ = load_single_database(filename)
    return db


@add_loader("load collection from zipfile", 80)
def _load_zipfile(filename, **kwargs):
    "Load collection from a .zip file."
    db = None
    if filename.endswith(".zip"):
        traverse_yield_all = kwargs["traverse_yield_all"]
        try:
            db = ZipFileLinearIndex.load(
                filename, traverse_yield_all=traverse_yield_all
            )
        except FileNotFoundError as exc:
            raise IndexNotLoaded(str(exc))
    return db


@add_loader("catch FASTA/FASTQ files and error", 1000)
def _error_on_fastaq(filename, **kwargs):
    "Tail-end loader: FASTA/FASTQ input to a signature loader is an error."
    success = False
    try:
        from .sequence_io import iter_records_bytes

        _ = next(iter(iter_records_bytes(filename)))
        success = True
    except Exception:
        pass

    if success:
        raise Exception(
            f"Error while reading signatures from '{filename}' - got sequences instead! Is this a FASTA/FASTQ file?"
        )


### savers


class Base_SaveSignaturesToLocation:
    "Base signature saving class; tracks location and count."

    def __init__(self, location):
        self.location = location
        self.count = 0

    @classmethod
    def matches(cls, location):
        raise NotImplementedError

    def __repr__(self):
        raise NotImplementedError

    def __len__(self):
        return self.count

    def open(self):
        pass

    def close(self):
        pass

    def __enter__(self):
        self.open()
        return self

    def __exit__(self, type, value, traceback):
        self.close()

    def add(self, ss):
        self.count += 1

    def add_many(self, sslist):
        for ss in sslist:
            self.add(ss)


def _one_minhash_per_sig(siglist):
    "Normalize to one minhash per signature (md5-keyed outputs need this)."
    from .signature import expand_signatures

    for ss in siglist:
        yield from expand_signatures(ss)


class SaveSignatures_NoOutput(Base_SaveSignaturesToLocation):
    "Do not save signatures."

    def __repr__(self):
        return "SaveSignatures_NoOutput()"

    @classmethod
    def matches(cls, location):
        return location is None


class SaveSignatures_Directory(Base_SaveSignaturesToLocation):
    "Save signatures within a directory, using md5sum names."

    def __repr__(self):
        return f"SaveSignatures_Directory('{self.location}')"

    @classmethod
    def matches(cls, location):
        if location:
            return location.endswith("/")

    def open(self):
        try:
            os.mkdir(self.location)
        except FileExistsError:
            pass
        except Exception:
            notify(f"ERROR: cannot create signature output directory '{self.location}'")
            sys.exit(-1)

    def _fresh_path(self, md5):
        "First non-existing '<md5>[_N].sig.gz' path under the directory."
        outname = os.path.join(self.location, f"{md5}.sig.gz")
        i = 0
        while os.path.exists(outname):
            outname = os.path.join(self.location, f"{md5}_{i}.sig.gz")
            i += 1
        return outname

    def add(self, ss):
        super().add(ss)

        with open(self._fresh_path(ss.md5sum()), "wb") as fp:
            sigmod.save_signatures_to_json([ss], fp, compression=1)


class SaveSignatures_SqliteIndex(Base_SaveSignaturesToLocation):
    "Save signatures into a sqlite database (.sqldb)."

    def __init__(self, location):
        super().__init__(location)
        self.idx = None
        self.cursor = None

    @classmethod
    def matches(cls, location):
        if location:
            return location.endswith(".sqldb")

    def __repr__(self):
        return f"SaveSignatures_SqliteIndex('{self.location}')"

    def close(self):
        self.idx.commit()
        self.cursor.execute("VACUUM")
        self.idx.close()

    def open(self):
        from .index.sqlite_index import SqliteIndex

        self.idx = SqliteIndex.create(self.location, append=True)
        self.cursor = self.idx.cursor()

    def add(self, add_sig):
        for ss in _one_minhash_per_sig([add_sig]):
            super().add(ss)
            self.idx.insert(ss, cursor=self.cursor, commit=False)
            if self.count % 1000 == 0:
                self.idx.commit()


class SaveSignatures_SigFile(Base_SaveSignaturesToLocation):
    "Save signatures to a .sig / .sig.gz JSON file (or '-' for stdout)."

    def __init__(self, location):
        super().__init__(location)
        self.keep = []
        self.compress = 1 if self.location.endswith(".gz") else 0

    @classmethod
    def matches(cls, location):
        return bool(location)

    def __repr__(self):
        return f"SaveSignatures_SigFile('{self.location}')"

    def close(self):
        if self.location == "-":
            sigmod.save_signatures_to_json(self.keep, sys.stdout)
            return
        if self.compress:
            open_args = dict(mode="wb", encoding=None)
        else:
            open_args = dict(mode="w", encoding="utf-8")
        with open(self.location, **open_args) as fp:
            sigmod.save_signatures_to_json(self.keep, fp, compression=self.compress)

    def add(self, ss):
        super().add(ss)
        self.keep.append(ss)


class SaveSignatures_ZipFile(Base_SaveSignaturesToLocation):
    "Save gzip-compressed signatures into an uncompressed zip collection."

    def __init__(self, location):
        super().__init__(location)
        self.storage = None

    @classmethod
    def matches(cls, location):
        if location:
            return location.endswith(".zip")

    def __repr__(self):
        return f"SaveSignatures_ZipFile('{self.location}')"

    def close(self):
        manifest = CollectionManifest(self.manifest_rows)
        manifest_fp = StringIO()
        manifest.write_to_csv(manifest_fp, write_header=True)
        manifest_data = manifest_fp.getvalue().encode("utf-8")

        self.storage.save(
            "SOURMASH-MANIFEST.csv", manifest_data, overwrite=True, compress=True
        )
        self.storage.flush()
        self.storage.close()

    def open(self):
        from .sbt_storage import ZipStorage

        do_create = not os.path.exists(self.location)

        storage = None
        try:
            # "w" on an existing path opens read+buffer, so a non-zip file
            # raises BadZipFile here (reference save_load.py:486-489)
            storage = ZipStorage(self.location, mode="w")
        except zipfile.BadZipFile:
            pass

        if storage is None:
            raise ValueError(f"File '{self.location}' cannot be opened as a zip file.")

        if not storage.subdir:
            storage.subdir = "signatures"

        try:
            manifest_data = storage.load("SOURMASH-MANIFEST.csv")
        except (FileNotFoundError, KeyError):
            if not do_create:
                raise ValueError(
                    f"Cannot add to existing zipfile '{self.location}' without a manifest"
                )
            self.manifest_rows = []
        else:
            manifest = CollectionManifest.load_from_csv(
                StringIO(manifest_data.decode("utf-8"))
            )
            self.manifest_rows = list(manifest._select())

        self.storage = storage

    def add(self, add_sig):
        if not self.storage:
            raise ValueError("this output is not open")

        for ss in _one_minhash_per_sig([add_sig]):
            buf = sigmod.save_signatures_to_json([ss], compression=1)
            md5 = ss.md5sum()

            path = f"{self.storage.subdir}/{md5}.sig.gz"
            location = self.storage.save(path, buf)

            row = CollectionManifest.make_manifest_row(
                ss, location, include_signature=False
            )
            self.manifest_rows.append(row)
            super().add(ss)


_save_classes = [
    (10, SaveSignatures_NoOutput),
    (20, SaveSignatures_Directory),
    (30, SaveSignatures_ZipFile),
    (40, SaveSignatures_SqliteIndex),
    (1000, SaveSignatures_SigFile),
]


def _get_signatures_from_rust(siglist):
    """Split multi-sketch signature records into one-minhash signatures by
    JSON roundtrip (reference `save_load.py:297-304`)."""
    from . import signature as sigmod

    json_str = sigmod.save_signatures_to_json(siglist)
    yield from sigmod.load_signatures_from_json(json_str)
