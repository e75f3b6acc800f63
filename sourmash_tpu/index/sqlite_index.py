"""sqlite3-backed Index, CollectionManifest, and LCA database.

Format + behavior parity: reference `src/sourmash/index/sqlite_index.py`
(SqliteIndex:188, SqliteCollectionManifest:625, LCA_SqliteDatabase:1017;
schema: `sourmash_hashes`/`sourmash_sketches`/`sourmash_internal` tables,
hashes > 2^63-1 stored as wrapped signed ints).
"""

from __future__ import annotations

import itertools
import os
import sqlite3
from collections import defaultdict

from .. import sqlite_utils
from ..exceptions import IndexNotSupported
from ..index import (
    Index,
    IndexSearchResult,
    StandaloneManifestIndex,
    _check_select_parameters,
)
from ..lca.lca_db import cached_property
from ..logging import debug_literal
from ..manifest import BaseCollectionManifest
from ..minhash import MinHash
from ..picklist import SignaturePicklist
from ..signature import SourmashSignature

MAX_SQLITE_INT = 2**63 - 1


def convert_hash_to(x):
    "uint64 -> sqlite signed int (wrap around 2^63)."
    return x - 2**64 if x > MAX_SQLITE_INT else x


def convert_hash_from(x):
    "sqlite signed int -> uint64."
    return x + 2**64 if x < 0 else x


def load_sqlite_index(filename, *, request_manifest=False):
    """Load a SqliteIndex, standalone sqlite manifest, or LCA_SqliteDatabase
    from filename, depending on which tables are present."""
    conn = sqlite_utils.open_sqlite_db(filename)

    if conn is None:
        debug_literal("load_sqlite_index: conn is None.")
        return

    c = conn.cursor()
    try:
        internal_d = sqlite_utils.get_sourmash_internal(c)
    except (sqlite3.OperationalError, sqlite3.DatabaseError):
        internal_d = {}

    is_index = False
    is_manifest = False
    is_lca_db = False

    if "SqliteIndex" in internal_d:
        if internal_d["SqliteIndex"] != "1.0":
            raise IndexNotSupported("unsupported SqliteIndex version")
        is_index = True
        debug_literal("load_sqlite_index: it's an index!")

    if is_index and "SqliteLineage" in internal_d:
        if internal_d["SqliteLineage"] != "1.0":
            raise IndexNotSupported("unsupported SqliteLineage version")
        is_lca_db = True
        debug_literal("load_sqlite_index: it's got a lineage table!")

    if "SqliteManifest" in internal_d:
        if internal_d["SqliteManifest"] != "1.0":
            raise IndexNotSupported("unsupported SqliteManifest version")
        is_manifest = True

    if is_index or is_lca_db:
        assert is_manifest

    idx = None
    if is_index and not request_manifest:
        conn.close()

        if is_lca_db:
            debug_literal("load_sqlite_index: returning LCA_SqliteDatabase")
            idx = LCA_SqliteDatabase.load(filename)
        else:
            debug_literal("load_sqlite_index: returning SqliteIndex")
            idx = SqliteIndex(filename)
    elif is_manifest:
        managed_by_index = False
        if is_index:
            assert request_manifest
            managed_by_index = True

        prefix = os.path.dirname(filename)
        mf = SqliteCollectionManifest(conn, managed_by_index=managed_by_index)
        idx = StandaloneManifestIndex(mf, filename, prefix=prefix)
        debug_literal("load_sqlite_index: returning StandaloneManifestIndex")

    return idx


class SqliteIndex(Index):
    "Scaled signatures reverse-indexed by hash in a sqlite database."

    is_database = True

    def __init__(self, dbfile, *, sqlite_manifest=None, conn=None):
        self.dbfile = dbfile

        if conn is None:
            conn = self._open(dbfile)

        if sqlite_manifest is None:
            sqlite_manifest = SqliteCollectionManifest(conn, managed_by_index=True)
        self.manifest = sqlite_manifest
        self.conn = conn

        c = self.conn.cursor()
        c.execute("SELECT DISTINCT scaled FROM sourmash_sketches")
        scaled_vals = c.fetchall()
        if len(scaled_vals) > 1:
            raise ValueError(
                "this database has multiple scaled values, which is not currently allowed"
            )

        if scaled_vals:
            self.scaled = scaled_vals[0][0]
        else:
            self.scaled = None

    @classmethod
    def _open(cls, dbfile, *, empty_ok=True):
        "Connect to an existing SQLite database or create a new one."
        try:
            conn = sqlite3.connect(dbfile)
            c = conn.cursor()

            c.execute("PRAGMA cache_size=10000000")
            c.execute("PRAGMA synchronous = OFF")
            c.execute("PRAGMA journal_mode = MEMORY")
            c.execute("PRAGMA temp_store = MEMORY")

            if not empty_ok:
                c.execute("SELECT * FROM sourmash_hashes LIMIT 1")
                c.fetchone()
        except (sqlite3.OperationalError, sqlite3.DatabaseError):
            raise ValueError(f"cannot open '{dbfile}' as SqliteIndex database")

        return conn

    @classmethod
    def load(cls, dbfile):
        return SqliteIndex(dbfile)

    @classmethod
    def create(cls, dbfile, *, append=False):
        conn = cls._open(dbfile, empty_ok=True)
        cls._create_tables(conn.cursor(), ignore_exists=append)
        conn.commit()
        return cls(dbfile, conn=conn)

    @classmethod
    def _create_tables(cls, c, *, ignore_exists=False):
        "Create the index + manifest tables."
        try:
            sqlite_utils.add_sourmash_internal(c, "SqliteIndex", "1.0")
            SqliteCollectionManifest._create_tables(c)

            c.execute(
                """
            CREATE TABLE IF NOT EXISTS sourmash_hashes (
               hashval INTEGER NOT NULL,
               sketch_id INTEGER NOT NULL,
               FOREIGN KEY (sketch_id) REFERENCES sourmash_sketches (id)
            )
            """
            )
            c.execute(
                """
            CREATE INDEX IF NOT EXISTS sourmash_hashval_idx ON sourmash_hashes (
               hashval, sketch_id
            )
            """
            )
            c.execute(
                "CREATE INDEX IF NOT EXISTS sourmash_hashval_idx2 ON sourmash_hashes (hashval)"
            )
            c.execute(
                "CREATE INDEX IF NOT EXISTS sourmash_sketch_idx ON sourmash_hashes (sketch_id)"
            )
        except (sqlite3.OperationalError, sqlite3.DatabaseError):
            if not ignore_exists:
                raise ValueError("cannot create SqliteIndex tables")

        return c

    def cursor(self):
        return self.conn.cursor()

    def close(self):
        self.conn.close()

    def commit(self):
        self.conn.commit()

    def __len__(self):
        return len(self.manifest)

    def insert(self, ss, *, cursor=None, commit=True):
        "Insert a signature; hashes go into the reverse index."
        c = cursor if cursor else self.conn.cursor()

        if ss.minhash.num:
            raise ValueError("cannot store 'num' signatures in SqliteIndex")
        if ss.minhash.track_abundance:
            raise ValueError("cannot store signatures with abundance in SqliteIndex")

        if self.scaled is not None and self.scaled != ss.minhash.scaled:
            raise ValueError(
                f"this database can only store scaled values={self.scaled}"
            )
        elif self.scaled is None:
            self.scaled = ss.minhash.scaled

        row = BaseCollectionManifest.make_manifest_row(
            ss, None, include_signature=False
        )
        self.manifest._insert_row(c, row, call_is_from_index=True)

        c.execute("SELECT last_insert_rowid()")
        (sketch_id,) = c.fetchone()

        hashes_to_sketch = [
            (convert_hash_to(h), sketch_id) for h in ss.minhash.hashes
        ]
        c.executemany(
            "INSERT INTO sourmash_hashes (hashval, sketch_id) VALUES (?, ?)",
            hashes_to_sketch,
        )

        if commit:
            self.conn.commit()

    @property
    def location(self):
        return self.dbfile

    def signatures(self):
        for ss, loc in self.signatures_with_location():
            yield ss

    def signatures_with_location(self):
        c = self.conn.cursor()
        for ss, loc, iloc in self._load_sketches(c):
            yield ss, loc

    def save(self, *args, **kwargs):
        raise NotImplementedError

    def find(self, search_fn, query, **kwargs):
        "Search via SQL: reverse-index overlap counts drive scoring."
        search_fn.check_is_compatible(query)

        query_mh = query.minhash
        if self.scaled > query_mh.scaled:
            query_mh = query_mh.downsample(scaled=self.scaled)

        picklist = None
        if self.manifest.selection_dict:
            picklist = self.manifest.selection_dict.get("picklist")

        c1 = self.conn.cursor()
        c2 = self.conn.cursor()

        for sketch_id, n_matching_hashes in self._get_matching_sketches(
            c1, query_mh.hashes, query_mh._max_hash
        ):
            query_size = len(query_mh)
            subj_size = self._load_sketch_size(c2, sketch_id, query_mh._max_hash)
            total_size = query_size + subj_size - n_matching_hashes
            shared_size = n_matching_hashes

            score = search_fn.score_fn(query_size, shared_size, subj_size, total_size)

            if search_fn.passes(score):
                subj = self._load_sketch(c2, sketch_id)
                if search_fn.collect(score, subj):
                    if picklist is None or subj in picklist:
                        yield IndexSearchResult(score, subj, self.location)

    def _select(self, *, num=0, track_abundance=False, **kwargs):
        _check_select_parameters(**kwargs)

        if num:
            raise ValueError("cannot select on 'num' in SqliteIndex")
        if track_abundance:
            raise ValueError("cannot store or search signatures with abundance")

        manifest = self.manifest
        if manifest is None:
            manifest = SqliteCollectionManifest(self.conn, managed_by_index=True)

        return manifest.select_to_manifest(**kwargs)

    def select(self, *args, **kwargs):
        sqlite_manifest = self._select(*args, **kwargs)
        return SqliteIndex(self.dbfile, sqlite_manifest=sqlite_manifest, conn=self.conn)

    # -- SQL helpers -------------------------------------------------------

    def _load_sketch_size(self, c1, sketch_id, max_hash):
        if max_hash <= MAX_SQLITE_INT:
            c1.execute(
                """
            SELECT COUNT(hashval) FROM sourmash_hashes
            WHERE sketch_id=? AND hashval >= 0 AND hashval <= ?""",
                (sketch_id, max_hash),
            )
        else:
            c1.execute(
                "SELECT COUNT(hashval) FROM sourmash_hashes WHERE sketch_id=?",
                (sketch_id,),
            )
        (n_hashes,) = c1.fetchone()
        return n_hashes

    def _load_sketch(self, c, sketch_id, *, match_scaled=None):
        "Load one sketch as a signature, optionally downsampled."
        c.execute(
            """
        SELECT id, name, scaled, ksize, filename, moltype, seed
        FROM sourmash_sketches WHERE id=?""",
            (sketch_id,),
        )

        sketch_id, name, scaled, ksize, filename, moltype, seed = c.fetchone()
        if match_scaled is not None:
            scaled = max(scaled, match_scaled)

        mh = MinHash(
            n=0,
            ksize=ksize,
            scaled=scaled,
            seed=seed,
            is_protein=moltype == "protein",
            dayhoff=moltype == "dayhoff",
            hp=moltype == "hp",
        )

        template_values = [sketch_id]

        hash_constraint_str = ""
        max_hash = mh._max_hash
        if max_hash <= MAX_SQLITE_INT:
            hash_constraint_str = (
                "sourmash_hashes.hashval >= 0 AND sourmash_hashes.hashval <= ? AND"
            )
            template_values.insert(0, max_hash)

        c.execute(
            f"SELECT hashval FROM sourmash_hashes WHERE {hash_constraint_str} sourmash_hashes.sketch_id=?",
            template_values,
        )

        import numpy as np

        vals = np.fromiter(
            (convert_hash_from(hashval) for (hashval,) in c), dtype=np.uint64
        )
        mh.add_many(vals)

        return SourmashSignature(mh, name=name, filename=filename)

    def _load_sketches(self, c):
        "Load all (selected) sketches via the manifest's _id column."
        for row in self.manifest.rows:
            sketch_id = row["_id"]
            assert row["num"] == 0

            moltype = row["moltype"]
            mh = MinHash(
                n=0,
                ksize=row["ksize"],
                scaled=row["scaled"],
                seed=row["seed"],
                is_protein=moltype == "protein",
                dayhoff=moltype == "dayhoff",
                hp=moltype == "hp",
            )

            c.execute(
                "SELECT hashval FROM sourmash_hashes WHERE sketch_id=?", (sketch_id,)
            )

            import numpy as np

            vals = np.fromiter(
                (convert_hash_from(hashval) for (hashval,) in c), dtype=np.uint64
            )
            mh.add_many(vals)

            ss = SourmashSignature(mh, name=row["name"], filename=row["filename"])
            yield ss, self.dbfile, sketch_id

    def _get_matching_sketches(self, c, hashes, max_hash):
        """All sketches overlapping the given hashes, with overlap counts,
        ordered by count descending."""
        c.execute("DROP TABLE IF EXISTS sourmash_hash_query")
        c.execute(
            "CREATE TEMPORARY TABLE sourmash_hash_query (hashval INTEGER PRIMARY KEY)"
        )

        hashvals = [(convert_hash_to(h),) for h in hashes]
        c.executemany(
            "INSERT OR IGNORE INTO sourmash_hash_query (hashval) VALUES (?)", hashvals
        )

        conditions = []
        template_values = []

        max_hash = min(max_hash, max(hashes))
        if max_hash <= MAX_SQLITE_INT:
            conditions.append(
                "sourmash_hashes.hashval >= 0 AND sourmash_hashes.hashval <= ?"
            )
            template_values.append(max_hash)

        conditions.append("sourmash_hashes.hashval=sourmash_hash_query.hashval")
        conditions = " AND ".join(conditions)

        c.execute(
            f"""
        SELECT DISTINCT sourmash_hashes.sketch_id,COUNT(sourmash_hashes.hashval) as CNT
        FROM sourmash_hashes, sourmash_hash_query
        WHERE {conditions}
        GROUP BY sourmash_hashes.sketch_id ORDER BY CNT DESC
        """,
            template_values,
        )

        return c


class SqliteCollectionManifest(BaseCollectionManifest):
    "SQLite-backed manifest (standalone, or managed by a SqliteIndex)."

    def __init__(self, conn, *, selection_dict=None, managed_by_index=False):
        assert conn is not None
        self.conn = conn
        self.selection_dict = selection_dict
        self.managed_by_index = managed_by_index
        self._num_rows = None

    @classmethod
    def create(cls, filename):
        conn = sqlite3.connect(filename)
        cursor = conn.cursor()
        cls._create_tables(cursor)
        return cls(conn)

    @classmethod
    def create_or_open(cls, filename):
        conn = sqlite3.connect(filename)
        cursor = conn.cursor()
        try:
            cls._create_tables(cursor)
        except sqlite3.OperationalError:
            pass
        return cls(conn)

    @classmethod
    def load_from_manifest(cls, manifest, *, dbfile=":memory:", append=False):
        return cls._create_manifest_from_rows(
            manifest.rows, location=dbfile, append=append
        )

    @classmethod
    def create_manifest(cls, locations_iter, *, include_signature=False):
        def rows_iter():
            for ss, location in locations_iter:
                yield cls.make_manifest_row(ss, location, include_signature=False)

        return cls._create_manifest_from_rows(rows_iter())

    @classmethod
    def _create_tables(cls, cursor):
        sqlite_utils.add_sourmash_internal(cursor, "SqliteManifest", "1.0")
        cursor.execute(
            """
        CREATE TABLE sourmash_sketches
          (id INTEGER PRIMARY KEY,
           name TEXT,
           num INTEGER NOT NULL,
           scaled INTEGER NOT NULL,
           ksize INTEGER NOT NULL,
           filename TEXT,
           moltype TEXT NOT NULL,
           with_abundance BOOLEAN NOT NULL,
           md5sum TEXT NOT NULL,
           seed INTEGER NOT NULL,
           n_hashes INTEGER NOT NULL,
           internal_location TEXT,
        UNIQUE(internal_location, md5sum)
        )
        """
        )

    def add_row(self, row):
        c = self.conn.cursor()
        self._insert_row(c, row)

    def _insert_row(self, cursor, row, *, call_is_from_index=False):
        if self.managed_by_index and not call_is_from_index:
            raise Exception("must use SqliteIndex.insert to add to this manifest")

        row = dict(row)
        if "seed" not in row:
            row["seed"] = 42

        cursor.execute(
            """
        INSERT OR IGNORE INTO sourmash_sketches
          (name, num, scaled, ksize, filename, md5sum, moltype,
           seed, n_hashes, with_abundance, internal_location)
        VALUES (:name, :num, :scaled, :ksize, :filename, :md5,
                :moltype, :seed, :n_hashes, :with_abundance,
                :internal_location)""",
            row,
        )

        self._num_rows = None

    def __bool__(self):
        if self._num_rows is not None:
            return bool(self._num_rows)
        try:
            next(iter(self.rows))
            return True
        except StopIteration:
            return False

    def __eq__(self, other):
        for a, b in itertools.zip_longest(self.rows, other.rows):
            for k in self.required_keys:
                if a[k] != b[k]:
                    return False
        return True

    def __len__(self):
        if self._num_rows is not None:
            return self._num_rows
        self._num_rows = sum(1 for _ in self.rows)
        return self._num_rows

    def __iadd__(self, other):
        c = self.conn.cursor()
        for row in other.rows:
            self._insert_row(c, row)
        return self

    def __add__(self, other):
        new_mf = self.create(":memory:")
        new_mf += self
        new_mf += other
        return new_mf

    def close(self):
        self.conn.commit()

    def _make_select(self):
        "Build SQL WHERE conditions + values + picklist from selection_dict."
        conditions = []
        values = []
        picklist = None
        if self.selection_dict:
            select_d = self.selection_dict
            if "ksize" in select_d and select_d["ksize"]:
                conditions.append("sourmash_sketches.ksize = ?")
                values.append(select_d["ksize"])
            if "num" in select_d and select_d["num"] and select_d["num"] > 0:
                conditions.append("sourmash_sketches.num > 0")
            if "scaled" in select_d and select_d["scaled"] and select_d["scaled"] > 0:
                conditions.append("sourmash_sketches.scaled > 0")
            if "containment" in select_d and select_d["containment"]:
                conditions.append("sourmash_sketches.scaled > 0")
            if "moltype" in select_d and select_d["moltype"] is not None:
                moltype = select_d["moltype"]
                assert moltype in ("DNA", "protein", "dayhoff", "hp"), moltype
                conditions.append(f"sourmash_sketches.moltype = '{moltype}'")

            picklist = select_d.get("picklist")

        return conditions, values, picklist

    def select_to_manifest(self, **kwargs):
        if self.selection_dict:
            d = dict(self.selection_dict)
            for k, v in kwargs.items():
                if k in d:
                    if d[k] is not None and d[k] != v:
                        raise ValueError(f"incompatible select on '{k}'")
                d[k] = v
            kwargs = d

        new_mf = SqliteCollectionManifest(self.conn, selection_dict=kwargs)

        picklist = kwargs.get("picklist")
        if picklist is not None:
            _ = len(self)  # forces iteration, filling picklist.found

        return new_mf

    @property
    def rows(self):
        c1 = self.conn.cursor()

        conditions, values, picklist = self._make_select()
        if conditions:
            conditions = "WHERE " + " AND ".join(conditions)
        else:
            conditions = ""

        c1.execute(
            f"""
        SELECT id, name, md5sum, num, scaled, ksize, filename, moltype,
        seed, n_hashes, internal_location FROM sourmash_sketches {conditions}
        """,
            values,
        )

        for (
            _id,
            name,
            md5sum,
            num,
            scaled,
            ksize,
            filename,
            moltype,
            seed,
            n_hashes,
            iloc,
        ) in c1:
            row = dict(
                num=num,
                scaled=scaled,
                name=name,
                filename=filename,
                n_hashes=n_hashes,
                with_abundance=False,
                ksize=ksize,
                md5=md5sum,
                internal_location=iloc,
                moltype=moltype,
                md5short=md5sum[:8],
                seed=seed,
                _id=_id,
            )
            if picklist is None or picklist.matches_manifest_row(row):
                yield row

    def filter_rows(self, row_filter_fn):
        def rows_iter():
            for row in self.rows:
                if row_filter_fn(row):
                    yield row

        return self._create_manifest_from_rows(rows_iter())

    def filter_on_columns(self, col_filter_fn, col_names):
        def row_filter_fn(row):
            x = [row[col] for col in col_names if row[col] is not None]
            return col_filter_fn(x)

        return self.filter_rows(row_filter_fn)

    def locations(self):
        "All possible internal locations (may be a superset under picklists)."
        c1 = self.conn.cursor()

        conditions, values, picklist = self._make_select()
        if conditions:
            conditions = "WHERE " + " AND ".join(conditions)
        else:
            conditions = ""

        c1.execute(
            f"SELECT DISTINCT internal_location FROM sourmash_sketches {conditions}",
            values,
        )

        return (iloc for (iloc,) in c1)

    def __contains__(self, ss):
        md5 = ss.md5sum()
        c = self.conn.cursor()
        c.execute("SELECT COUNT(*) FROM sourmash_sketches WHERE md5sum=?", (md5,))
        (val,) = c.fetchone()

        if bool(val):
            picklist = self.picklist
            return picklist is None or ss in self.picklist
        return False

    @property
    def picklist(self):
        if self.selection_dict:
            return self.selection_dict.get("picklist")
        return None

    def to_picklist(self):
        pl = SignaturePicklist("manifest")
        pl.pickset = {pl._get_value_for_manifest_row(row) for row in self.rows}
        return pl

    @classmethod
    def _create_manifest_from_rows(cls, rows_iter, *, location=":memory:", append=False):
        try:
            mf = cls.create(location)
        except (sqlite3.OperationalError, sqlite3.DatabaseError) as exc:
            if not append:
                raise Exception(
                    f"cannot create sqlite3 db at '{location}'; exception: {str(exc)}"
                )
            db = load_sqlite_index(location, request_manifest=True)
            mf = db.manifest

        cursor = mf.conn.cursor()
        for row in rows_iter:
            mf._insert_row(cursor, row)

        mf.conn.commit()
        return mf


class LCA_SqliteDatabase(SqliteIndex):
    "SqliteIndex + sqlite lineage table => on-disk LCA database."

    is_database = True

    def __init__(self, dbfile, *, lineage_db=None, sqlite_manifest=None):
        super().__init__(dbfile, sqlite_manifest=sqlite_manifest)

        c = self.conn.cursor()

        c.execute("SELECT DISTINCT ksize, moltype FROM sourmash_sketches")
        res = list(c)
        if len(res) > 1:
            raise TypeError(
                "can only have one ksize & moltype in an LCA_SqliteDatabase"
            )
        if len(res) == 0:
            raise ValueError("cannot load an LCA_SqliteDatabase")

        self.ksize, self.moltype = res[0]

        if lineage_db is not None:
            self.lineage_db = lineage_db
            self._build_index()

    @classmethod
    def load(cls, filename):
        from ..tax.tax_utils import LineageDB_Sqlite

        try:
            obj = cls(filename)
        except sqlite3.OperationalError:
            raise ValueError(f"cannot open '{filename}' as a SQLite index.")

        lineage_db = LineageDB_Sqlite(obj.conn)
        obj.lineage_db = lineage_db
        obj._build_index()

        return obj

    @classmethod
    def create(cls, filename, idx, lineage_db):
        "Build an LCA_SqliteDatabase in one file from an index + lineage db."
        from ..tax.tax_utils import MultiLineageDB

        sqlidx = SqliteIndex.create(filename)

        for ss in idx.signatures():
            sqlidx.insert(ss)

        out_lineage_db = MultiLineageDB()
        out_lineage_db.add(lineage_db)
        out_lineage_db._save_sqlite(None, conn=sqlidx.conn)

        return cls.load(filename)

    def _build_index(self):
        "Build identifier <-> lineage mappings from manifest + lineage db."
        mf = self.manifest
        lineage_db = self.lineage_db

        ident_to_idx = {}
        next_lid = 0
        idx_to_lid = {}
        lineage_to_lid = {}
        lid_to_lineage = {}

        for row in mf.rows:
            name = row["name"]
            if name:
                ident = name.split(" ")[0]

                lineage = lineage_db.get(ident)
                if lineage is None:
                    ident = name.split(".")[0]
                    lineage = lineage_db.get(ident)

                idx = row["_id"]
                ident_to_idx[ident] = idx

                if lineage:
                    lid = lineage_to_lid.get(lineage)
                    if lid is None:
                        lid = next_lid
                        next_lid += 1
                        lineage_to_lid[lineage] = lid
                        lid_to_lineage[lid] = lineage
                    idx_to_lid[idx] = lid

        self.ident_to_idx = ident_to_idx
        self.idx_to_lid = idx_to_lid
        self.lid_to_lineage = lid_to_lineage

    def insert(self, *args, **kwargs):
        raise NotImplementedError

    def select(self, *args, **kwargs):
        sqlite_manifest = self._select(*args, **kwargs)
        return LCA_SqliteDatabase(
            self.dbfile, sqlite_manifest=sqlite_manifest, lineage_db=self.lineage_db
        )

    ### LCA_Database API/protocol.

    def downsample_scaled(self, scaled):
        if scaled < self.scaled:
            raise ValueError(f"cannot decrease scaled from {self.scaled} to {scaled}")
        self.scaled = scaled

    def get_lineage_assignments(self, hashval, *, min_num=None):
        x = []
        idx_list = self.hashval_to_idx.get(hashval, [])
        if min_num is None or len(idx_list) >= min_num:
            for idx in idx_list:
                lid = self.idx_to_lid.get(idx, None)
                if lid is not None:
                    x.append(self.lid_to_lineage[lid])
        return x

    @cached_property
    def idx_to_ident(self):
        d = defaultdict(set)
        for ident, idx in self.ident_to_idx.items():
            assert idx not in d
            d[idx] = ident
        return d

    @property
    def hashval_to_idx(self):
        return _SqliteIndexHashvalToIndex(self)

    @property
    def hashvals(self):
        return iter(_SqliteIndexHashvalToIndex(self))

    def get_identifiers_for_hashval(self, hashval):
        for idx in self.hashval_to_idx[hashval]:
            yield self.idx_to_ident[idx]


class _SqliteIndexHashvalToIndex:
    "Dict-like view of the hashval -> [sketch ids] reverse index."

    def __init__(self, sqlidx):
        self.sqlidx = sqlidx

    def __iter__(self):
        c = self.sqlidx.conn.cursor()
        c.execute("SELECT DISTINCT hashval FROM sourmash_hashes")
        for (hashval,) in c:
            yield convert_hash_from(hashval)

    def get(self, key, dv=None):
        c = self.sqlidx.cursor()
        hh = convert_hash_to(key)
        c.execute("SELECT sketch_id FROM sourmash_hashes WHERE hashval=?", (hh,))
        x = [sketch_id for (sketch_id,) in c]
        return x or dv

    def __getitem__(self, key):
        v = self.get(key)
        if v is None:
            raise KeyError(key)
        return v
