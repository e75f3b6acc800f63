"""Common sqlite3 utilities (parity: reference `src/sourmash/sqlite_utils.py`
— the `sourmash_internal` key/value version table)."""

from __future__ import annotations

import os
import sqlite3

from .logging import debug_literal


def open_sqlite_db(filename):
    "Return a connection if filename is an existing sourmash sqlite db."
    debug_literal("open_sqlite_db: started")
    if not os.path.exists(filename) or os.path.getsize(filename) == 0:
        debug_literal("open_sqlite_db: no file/zero sized file")
        return None

    try:
        conn = sqlite3.connect(filename)
    except (sqlite3.OperationalError, sqlite3.DatabaseError):
        debug_literal("open_sqlite_db: cannot connect.")
        return None

    cursor = conn.cursor()
    try:
        cursor.execute("SELECT DISTINCT key, value FROM sourmash_internal")
    except (sqlite3.OperationalError, sqlite3.DatabaseError):
        debug_literal("open_sqlite_db: cannot read sourmash_internal.")
        try:
            cursor.execute("SELECT * FROM taxonomy LIMIT 1")
        except (sqlite3.OperationalError, sqlite3.DatabaseError):
            debug_literal("open_sqlite_db: cannot read 'taxonomy', either.")
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

    d = get_sourmash_internal(cursor)

    val = d.get(use_type)
    if val is not None:
        if version != val:
            raise Exception(
                f"sqlite problem: for {use_type}, want version {version}, got version {val}"
            )
    else:
        cursor.execute(
            "INSERT INTO sourmash_internal (key, value) VALUES (?, ?)",
            (use_type, version),
        )


def get_sourmash_internal(cursor):
    "Retrieve the key/value dict from sourmash_internal."
    cursor.execute("SELECT DISTINCT key, value FROM sourmash_internal")
    return dict(cursor)
