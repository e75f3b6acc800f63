"""Collection manifests: CSV v1.0 metadata for signature collections
(API + format parity: reference `src/sourmash/manifest.py` —
BaseCollectionManifest:15, CollectionManifest:242; 11 required columns and
the `# SOURMASH-MANIFEST-VERSION: 1.0` header line).
"""

from __future__ import annotations

import ast
import csv
import gzip
import itertools
import os.path
from abc import abstractmethod

from . import picklist as picklist_mod


class BaseCollectionManifest:
    "Signature metadata for a collection; supports select + fast lookup."

    required_keys = (
        "internal_location",
        "md5",
        "md5short",
        "ksize",
        "moltype",
        "num",
        "scaled",
        "n_hashes",
        "with_abundance",
        "name",
        "filename",
    )

    @classmethod
    @abstractmethod
    def load_from_manifest(cls, manifest, **kwargs):
        "Load this manifest from another manifest object."

    @classmethod
    def load_from_filename(cls, filename):
        db = cls.load_from_sql(filename)
        if db is not None:
            return db

        xopen = gzip.open if filename.endswith(".gz") else open
        with xopen(filename, "rt", newline="") as fp:
            return cls.load_from_csv(fp)

    # CSV cell coercions applied on load
    _int_columns = ("num", "scaled", "ksize", "n_hashes")
    _bool_columns = ("with_abundance",)
    _version_prefix = "# SOURMASH-MANIFEST-VERSION: "

    @classmethod
    def _check_version_header(cls, fp):
        firstline = fp.readline().rstrip()
        if not firstline.startswith(cls._version_prefix):
            raise ValueError("manifest is missing version header")

        version = firstline[len(cls._version_prefix):]
        if float(version) != 1.0:
            raise ValueError(f"unknown manifest version number {version}")

    @classmethod
    def _typed_row(cls, row):
        "Coerce one CSV row's cells to their manifest types."
        for k in cls._int_columns:
            row[k] = int(row[k])
        for k in cls._bool_columns:
            row[k] = bool(ast.literal_eval(str(row[k])))
        row["signature"] = None
        return row

    @classmethod
    def load_from_csv(cls, fp):
        "Load a manifest from a CSV file with the v1.0 header line."
        cls._check_version_header(fp)

        r = csv.DictReader(fp)
        if not r.fieldnames:
            raise ValueError("missing column headers in manifest")

        for k in cls.required_keys:
            if k not in r.fieldnames:
                raise ValueError(f"missing column '{k}' in manifest.")

        return CollectionManifest(cls._typed_row(row) for row in r)

    @classmethod
    def load_from_sql(cls, filename):
        try:
            from .index.sqlite_index import load_sqlite_index
        except ImportError:
            return None

        db = load_sqlite_index(filename, request_manifest=True)
        if db is not None:
            return db.manifest
        return None

    def write_to_filename(self, filename, *, database_format="csv", ok_if_exists=False):
        if database_format == "sql":
            from .index.sqlite_index import SqliteCollectionManifest

            SqliteCollectionManifest.load_from_manifest(
                self, dbfile=filename, append=ok_if_exists
            )
            return None

        assert database_format == "csv"
        from .sourmash_args import FileOutputCSV

        if os.path.exists(filename) and not ok_if_exists:
            raise Exception("output manifest already exists")
        with FileOutputCSV(filename) as fp:
            return self.write_to_csv(fp, write_header=True)

    @classmethod
    def write_csv_header(cls, fp):
        "Write the manifest CSV header."
        fp.write(cls._version_prefix + "1.0\n")
        w = csv.DictWriter(fp, fieldnames=cls.required_keys)
        w.writeheader()

    def write_to_csv(self, fp, write_header=False):
        "Write manifest CSV to file handle."
        w = csv.DictWriter(fp, fieldnames=self.required_keys, extrasaction="ignore")
        if write_header:
            self.write_csv_header(fp)
        for row in self.rows:
            if "signature" in row:
                del row["signature"]
            w.writerow(row)

    @classmethod
    def make_manifest_row(cls, ss, location, *, include_signature=True):
        "Build a manifest row dict for one signature."
        mh = ss.minhash
        row = {
            "md5": ss.md5sum(),
            "ksize": int(mh.ksize),
            "moltype": mh.moltype,
            "num": int(mh.num),
            "scaled": int(mh.scaled),
            "n_hashes": len(mh),
            "with_abundance": mh.track_abundance,
            "name": ss.name,
            "filename": ss.filename,
            "internal_location": location,
        }
        row["md5short"] = row["md5"][:8]
        assert set(row.keys()) == set(cls.required_keys)
        if include_signature:
            row["signature"] = ss
        return row

    @classmethod
    def create_manifest(cls, locations_iter, *, include_signature=True):
        "Create a manifest from an iterator yielding (ss, location)."
        manifest_list = [
            cls.make_manifest_row(ss, location, include_signature=include_signature)
            for ss, location in locations_iter
        ]
        return cls(manifest_list)

    @abstractmethod
    def __add__(self, other):
        "Add two manifests."

    @abstractmethod
    def __bool__(self):
        "Test if manifest is empty."

    @abstractmethod
    def __len__(self):
        "Number of entries."

    def __eq__(self, other):
        "Row-wise equality over the required columns."
        for a, b in itertools.zip_longest(self.rows, other.rows):
            if a is None or b is None:
                return False
            for k in self.required_keys:
                if a[k] != b[k]:
                    return False
        return True

    @abstractmethod
    def select_to_manifest(self, **kwargs):
        "Select compatible signatures."

    @abstractmethod
    def filter_rows(self, row_filter_fn):
        "Filter rows by predicate."

    @abstractmethod
    def filter_on_columns(self, col_filter_fn, col_names):
        "Filter on column values."

    @abstractmethod
    def locations(self):
        "Distinct locations."

    @abstractmethod
    def __contains__(self, ss):
        "Is this signature in the manifest?"

    @abstractmethod
    def to_picklist(self):
        "Convert to a picklist."

    def _check_row_values(self):
        "Check that manifest rows have legit types/values (reference `manifest.py:230-239`)."
        from . import index as index_mod

        for row in self.rows:
            index_mod._check_select_parameters(
                num=row["num"],
                ksize=row["ksize"],
                moltype=row["moltype"],
                scaled=row["scaled"],
                abund=row["with_abundance"],
            )


class CollectionManifest(BaseCollectionManifest):
    "In-memory manifest: a list of row dicts + md5 set."

    def __init__(self, rows=[]):
        self.rows = []
        self._md5_set = set()
        self._add_rows(rows)

    @classmethod
    def load_from_manifest(cls, manifest, **kwargs):
        return cls(manifest.rows)

    def add_row(self, row):
        self._add_rows([row])

    def _add_rows(self, rows):
        for row in rows:
            self.rows.append(row)
            self._md5_set.add(row["md5"])

    def __iadd__(self, other):
        if self is other:
            raise Exception("cannot directly add manifest to itself")
        self._add_rows(other.rows)
        return self

    def __add__(self, other):
        mf = CollectionManifest(self.rows)
        mf._add_rows(other.rows)
        return mf

    def __bool__(self):
        return bool(self.rows)

    def __len__(self):
        return len(self.rows)

    def _select(
        self,
        *,
        ksize=None,
        moltype=None,
        scaled=0,
        num=0,
        containment=False,
        abund=None,
        picklist=None,
    ):
        "Yield manifest rows matching the requirements."
        from .index import _check_select_parameters

        _check_select_parameters(
            ksize=ksize, num=num, abund=abund, moltype=moltype, scaled=scaled
        )

        # stack one predicate per active requirement
        predicates = []
        if ksize:
            predicates.append(lambda row: row["ksize"] == ksize)
        if moltype:
            predicates.append(lambda row: row["moltype"] == moltype)
        if scaled or containment:
            predicates.append(lambda row: row["scaled"] and not row["num"])
        if num:
            predicates.append(lambda row: row["num"] and not row["scaled"])
        if abund:
            predicates.append(lambda row: row["with_abundance"])
        if picklist:
            predicates.append(picklist.matches_manifest_row)

        for row in self.rows:
            if all(pred(row) for pred in predicates):
                yield row

    def select_to_manifest(self, **kwargs):
        return CollectionManifest(self._select(**kwargs))

    def filter_rows(self, row_filter_fn):
        return CollectionManifest(row for row in self.rows if row_filter_fn(row))

    def filter_on_columns(self, col_filter_fn, col_names):
        def row_filter_fn(row):
            x = [row[col] for col in col_names if row[col] is not None]
            return col_filter_fn(x)

        return self.filter_rows(row_filter_fn)

    def locations(self):
        "Distinct internal locations, in first-seen order."
        seen = set()
        for row in self.rows:
            loc = row["internal_location"]
            if loc not in seen:
                seen.add(loc)
                yield loc

    def __contains__(self, ss):
        return ss.md5sum() in self._md5_set

    def to_picklist(self):
        pl = picklist_mod.SignaturePicklist("manifest")
        pl.pickset = {pl._get_value_for_manifest_row(row) for row in self.rows}
        return pl
