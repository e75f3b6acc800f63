"""Common sqlite3 utilities (parity: reference `src/sourmash/sqlite_utils.py`
— the `sourmash_internal` key/value version table)."""

from __future__ import annotations

import os
import sqlite3

from .logging import debug_literal

_SQLITE_ERRORS = (sqlite3.OperationalError, sqlite3.DatabaseError)


def _probe(cursor, query, failure_note):
    "Execute a probing query; False (with a debug note) on sqlite errors."
    try:
        cursor.execute(query)
        return True
    except _SQLITE_ERRORS:
        debug_literal(failure_note)
        return False


def open_sqlite_db(filename):
    "Return a connection if filename is an existing sourmash sqlite db."
    debug_literal("open_sqlite_db: started")
    if not os.path.exists(filename) or os.path.getsize(filename) == 0:
        debug_literal("open_sqlite_db: no file/zero sized file")
        return None

    try:
        conn = sqlite3.connect(filename)
    except _SQLITE_ERRORS:
        debug_literal("open_sqlite_db: cannot connect.")
        return None

    # recognizable iff it has a sourmash_internal table, or (legacy LCA
    # taxonomy databases) a bare 'taxonomy' table
    cursor = conn.cursor()
    if not _probe(
        cursor,
        "SELECT DISTINCT key, value FROM sourmash_internal",
        "open_sqlite_db: cannot read sourmash_internal.",
    ):
        if not _probe(
            cursor,
            "SELECT * FROM taxonomy LIMIT 1",
            "open_sqlite_db: cannot read 'taxonomy', either.",
        ):
            return None

    return conn


def add_sourmash_internal(cursor, use_type, version):
    "Add use_type/version to the sourmash_internal table."
    cursor.execute(
        """
    CREATE TABLE IF NOT EXISTS sourmash_internal (
       key TEXT UNIQUE,
       value TEXT
    )
    """
    )

    existing = get_sourmash_internal(cursor).get(use_type)
    if existing is None:
        cursor.execute(
            "INSERT INTO sourmash_internal (key, value) VALUES (?, ?)",
            (use_type, version),
        )
    elif version != existing:
        raise Exception(
            f"sqlite problem: for {use_type}, want version {version}, got version {existing}"
        )


def get_sourmash_internal(cursor):
    "Retrieve the key/value dict from sourmash_internal."
    cursor.execute("SELECT DISTINCT key, value FROM sourmash_internal")
    return dict(cursor)
