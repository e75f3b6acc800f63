"""Collection manifests: tabular metadata describing every sketch in a
collection, enabling selection and lazy loading without deserializing
signatures.

Design: one column-spec table (`_COLUMNS`) drives CSV decode, encode, and
row construction, so the v1.0 wire format lives in exactly one place.  The
in-memory manifest is a list of plain row dicts plus an md5 membership set.

Format/API parity surface: reference `src/sourmash/manifest.py` — the
eleven required columns, the `# SOURMASH-MANIFEST-VERSION: 1.0` header
line, and the BaseCollectionManifest / CollectionManifest class split.
"""

from __future__ import annotations

import ast
import csv
import gzip
import itertools
import os.path
from abc import abstractmethod

from . import picklist as picklist_mod

_HEADER_TAG = "# SOURMASH-MANIFEST-VERSION: "
_FORMAT_VERSION = 1.0


def _as_bool(cell):
    "Decode a CSV truth cell ('0'/'1'/'True'/'False') to a real bool."
    return bool(ast.literal_eval(str(cell)))


# Wire schema: (column name, CSV-decode coercion or None for identity),
# in on-disk column order.
_COLUMNS = (
    ("internal_location", None),
    ("md5", None),
    ("md5short", None),
    ("ksize", int),
    ("moltype", None),
    ("num", int),
    ("scaled", int),
    ("n_hashes", int),
    ("with_abundance", _as_bool),
    ("name", None),
    ("filename", None),
)

_DECODERS = tuple((name, fn) for name, fn in _COLUMNS if fn is not None)


def _decode_row_inplace(row):
    "Apply per-column type coercions to one freshly-read CSV row."
    for name, decode in _DECODERS:
        row[name] = decode(row[name])
    row["signature"] = None
    return row


class BaseCollectionManifest:
    """Signature metadata for a collection of signatures.

    Subclasses store rows however they like (list of dicts here; SQLite
    in `index.sqlite_index`), but all expose:

    * `rows` — iterable of row dicts
    * `select_to_manifest(...)` — the Index selector protocol
    * `locations()` — distinct storage locations, for lazy loading
    * `ss in manifest` — md5-based membership
    """

    required_keys = tuple(name for name, _ in _COLUMNS)

    # ------------------------------------------------------------------
    # loading

    @classmethod
    @abstractmethod
    def load_from_manifest(cls, manifest, **kwargs):
        "Load this manifest from another manifest object."

    @classmethod
    def load_from_filename(cls, filename):
        "Load from a path: SQLite databases first, then (gzipped) CSV."
        from_sql = cls.load_from_sql(filename)
        if from_sql is not None:
            return from_sql

        opener = gzip.open if filename.endswith(".gz") else open
        with opener(filename, "rt", newline="") as fp:
            return cls.load_from_csv(fp)

    @classmethod
    def load_from_sql(cls, filename):
        from .index.sqlite_index import load_sqlite_index

        db = load_sqlite_index(filename, request_manifest=True)
        return db.manifest if db is not None else None

    @classmethod
    def load_from_csv(cls, fp):
        "Load a manifest from an open CSV file with the version header."
        header = fp.readline().rstrip()
        if not header.startswith(_HEADER_TAG):
            raise ValueError("manifest is missing version header")
        version = header[len(_HEADER_TAG):]
        if float(version) != _FORMAT_VERSION:
            raise ValueError(f"unknown manifest version number {version}")

        reader = csv.DictReader(fp)
        available = reader.fieldnames
        if not available:
            raise ValueError("missing column headers in manifest")
        for name in cls.required_keys:
            if name not in available:
                raise ValueError(f"missing column '{name}' in manifest.")

        return CollectionManifest(map(_decode_row_inplace, reader))

    # ------------------------------------------------------------------
    # writing

    @classmethod
    def write_csv_header(cls, fp):
        "Write the version line + column-name row."
        fp.write(f"{_HEADER_TAG}{_FORMAT_VERSION}\n")
        csv.DictWriter(fp, fieldnames=cls.required_keys).writeheader()

    def write_to_csv(self, fp, write_header=False):
        "Write manifest rows as CSV to an open file handle."
        if write_header:
            self.write_csv_header(fp)
        writer = csv.DictWriter(
            fp, fieldnames=self.required_keys, extrasaction="ignore"
        )
        for row in self.rows:
            row.pop("signature", None)  # never serialize the payload
            writer.writerow(row)

    def write_to_filename(self, filename, *, database_format="csv", ok_if_exists=False):
        if database_format == "sql":
            from .index.sqlite_index import SqliteCollectionManifest

            SqliteCollectionManifest.load_from_manifest(
                self, dbfile=filename, append=ok_if_exists
            )
            return None

        assert database_format == "csv"
        if os.path.exists(filename) and not ok_if_exists:
            raise Exception("output manifest already exists")

        from .sourmash_args import FileOutputCSV

        with FileOutputCSV(filename) as fp:
            return self.write_to_csv(fp, write_header=True)

    # ------------------------------------------------------------------
    # row construction

    @classmethod
    def make_manifest_row(cls, ss, location, *, include_signature=True):
        "Summarize one signature into a manifest row dict."
        mh = ss.minhash
        md5 = ss.md5sum()
        row = dict(
            internal_location=location,
            md5=md5,
            md5short=md5[:8],
            ksize=int(mh.ksize),
            moltype=mh.moltype,
            num=int(mh.num),
            scaled=int(mh.scaled),
            n_hashes=len(mh),
            with_abundance=mh.track_abundance,
            name=ss.name,
            filename=ss.filename,
        )
        assert set(row) == set(cls.required_keys)
        if include_signature:
            row["signature"] = ss
        return row

    @classmethod
    def create_manifest(cls, locations_iter, *, include_signature=True):
        """Build a manifest from an iterator of (signature, location) pairs.

        Load exceptions from the iterator propagate to the caller.
        """
        return cls(
            cls.make_manifest_row(ss, loc, include_signature=include_signature)
            for ss, loc in locations_iter
        )

    def _check_row_values(self):
        "Validate row types/values via the Index selector checker."
        from .index import _check_select_parameters

        for row in self.rows:
            _check_select_parameters(
                num=row["num"],
                ksize=row["ksize"],
                moltype=row["moltype"],
                scaled=row["scaled"],
                abund=row["with_abundance"],
            )

    # ------------------------------------------------------------------
    # shared behavior + subclass contract

    def __eq__(self, other):
        "Row-wise equality over the required columns (order-sensitive)."
        pairs = itertools.zip_longest(self.rows, other.rows)
        return all(
            a is not None
            and b is not None
            and all(a[k] == b[k] for k in self.required_keys)
            for a, b in pairs
        )

    @abstractmethod
    def __add__(self, other):
        "Concatenate two manifests."

    @abstractmethod
    def __bool__(self):
        "False iff the manifest is empty."

    @abstractmethod
    def __len__(self):
        "Number of rows."

    @abstractmethod
    def select_to_manifest(self, **kwargs):
        "Restrict to rows compatible with the selector kwargs."

    @abstractmethod
    def filter_rows(self, row_filter_fn):
        "Restrict to rows passing a predicate."

    @abstractmethod
    def filter_on_columns(self, col_filter_fn, col_names):
        "Restrict via a predicate over selected column values."

    @abstractmethod
    def locations(self):
        "Distinct internal locations."

    @abstractmethod
    def __contains__(self, ss):
        "md5-based signature membership."

    @abstractmethod
    def to_picklist(self):
        "Convert to a picklist."


def _selector_predicates(
    *, ksize=None, moltype=None, scaled=0, num=0, containment=False,
    abund=None, picklist=None,
):
    "Translate Index-selector kwargs into a list of row predicates."
    from .index import _check_select_parameters

    _check_select_parameters(
        ksize=ksize, num=num, abund=abund, moltype=moltype, scaled=scaled
    )

    tests = []
    if ksize:
        tests.append(lambda row: row["ksize"] == ksize)
    if moltype:
        tests.append(lambda row: row["moltype"] == moltype)
    if scaled or containment:
        tests.append(lambda row: row["scaled"] and not row["num"])
    if num:
        tests.append(lambda row: row["num"] and not row["scaled"])
    if abund:
        # only constrains when abundance is *required*
        tests.append(lambda row: row["with_abundance"])
    if picklist:
        tests.append(picklist.matches_manifest_row)
    return tests


class CollectionManifest(BaseCollectionManifest):
    "In-memory manifest: ordered row dicts plus an md5 membership set."

    def __init__(self, rows=()):
        self.rows = []
        self._md5_set = set()
        self._add_rows(rows)

    @classmethod
    def load_from_manifest(cls, manifest, **kwargs):
        return cls(manifest.rows)

    def _add_rows(self, rows):
        # single pass: `rows` may be a generator
        append, md5s = self.rows.append, self._md5_set
        for row in rows:
            append(row)
            md5s.add(row["md5"])

    def add_row(self, row):
        self._add_rows((row,))

    def __iadd__(self, other):
        if self is other:
            raise Exception("cannot directly add manifest to itself")
        self._add_rows(other.rows)
        return self

    def __add__(self, other):
        combined = CollectionManifest(self.rows)
        combined._add_rows(other.rows)
        return combined

    def __bool__(self):
        return bool(self.rows)

    def __len__(self):
        return len(self.rows)

    def __contains__(self, ss):
        return ss.md5sum() in self._md5_set

    def _select(self, **kwargs):
        "Yield rows passing every selector predicate; see select_to_manifest."
        tests = _selector_predicates(**kwargs)
        return (row for row in self.rows if all(t(row) for t in tests))

    def select_to_manifest(self, **kwargs):
        return CollectionManifest(self._select(**kwargs))

    def filter_rows(self, row_filter_fn):
        return CollectionManifest(filter(row_filter_fn, self.rows))

    def filter_on_columns(self, col_filter_fn, col_names):
        def over_columns(row):
            cells = [row[c] for c in col_names if row[c] is not None]
            return col_filter_fn(cells)

        return self.filter_rows(over_columns)

    def locations(self):
        "Distinct internal locations, first-seen order."
        return iter(dict.fromkeys(row["internal_location"] for row in self.rows))

    def to_picklist(self):
        pl = picklist_mod.SignaturePicklist("manifest")
        pl.pickset = {pl._get_value_for_manifest_row(row) for row in self.rows}
        return pl
