"""Picklists: include/exclude subsetting of signature collections by CSV
column values (API parity: reference `src/sourmash/picklist.py`,
SignaturePicklist:54).
"""

from __future__ import annotations

import os
from enum import Enum


def _ident(x):
    return x.split(" ")[0]


def _identprefix(x):
    return x.split(" ")[0].split(".")[0]


def _md5short(x):
    return x[:8]


def _ident_md5short(tup):
    name, md5 = tup
    return (name.split(" ")[0], md5[:8])


# per-coltype value preprocessing
preprocess = {
    "name": lambda x: x,
    "md5": lambda x: x,
    "identprefix": _identprefix,
    "ident": _ident,
    "md5prefix8": _md5short,
    "md5short": _md5short,
    "manifest": _ident_md5short,
    "prefetch": _ident_md5short,
    "gather": _ident_md5short,
    "search": _ident_md5short,
}


class PickStyle(Enum):
    INCLUDE = 1
    EXCLUDE = 2


class SignaturePicklist:
    """Subset collections by CSV column: 'pickfile:column:coltype[:style]'.

    coltypes: name / md5 / md5prefix8 / md5short / ident / identprefix, plus
    meta-coltypes manifest / gather / prefetch / search which select on
    (ident, md5short) tuples from sourmash output CSVs.
    """

    meta_coltypes = ("manifest", "gather", "prefetch", "search")
    supported_coltypes = (
        "md5",
        "md5prefix8",
        "md5short",
        "name",
        "ident",
        "identprefix",
    )

    def __init__(
        self, coltype, *, pickfile=None, column_name=None, pickstyle=PickStyle.INCLUDE
    ):
        valid_coltypes = set(self.meta_coltypes) | set(self.supported_coltypes)
        if coltype not in valid_coltypes:
            raise ValueError(f"invalid picklist column type '{coltype}'")
        self.orig_coltype = coltype
        self.orig_colname = column_name

        if coltype in self.meta_coltypes:
            if column_name:
                raise ValueError(f"no column name allowed for coltype '{coltype}'")
            if coltype == "prefetch":
                column_name = "(match_name, match_md5)"
            else:
                column_name = "(name, md5)"

        self.coltype = coltype
        self.pickfile = pickfile
        self.column_name = column_name
        self.pickstyle = pickstyle

        self.preprocess_fn = preprocess[coltype]
        self.pickset = None
        self.found = set()
        self.n_queries = 0

    @classmethod
    def from_picklist_args(cls, argstr):
        "Parse 'pickfile:col:coltype[:include|exclude]'."
        parts = argstr.split(":")
        pickstyle = PickStyle.INCLUDE

        if len(parts) == 4:
            style = parts.pop()
            if style == "include":
                pickstyle = PickStyle.INCLUDE
            elif style == "exclude":
                pickstyle = PickStyle.EXCLUDE
            else:
                raise ValueError(
                    f"invalid picklist 'pickstyle' argument 4: '{style}' must be 'include' or 'exclude'"
                )

        if len(parts) != 3:
            raise ValueError(f"invalid picklist argument '{argstr}'")

        pickfile, column, coltype = parts
        return cls(coltype, pickfile=pickfile, column_name=column, pickstyle=pickstyle)

    def _get_sig_attribute(self, ss):
        coltype = self.coltype
        if coltype in self.meta_coltypes:
            return (ss.name, ss.md5sum())
        if coltype in ("md5", "md5prefix8", "md5short"):
            return ss.md5sum()
        if coltype in ("name", "ident", "identprefix"):
            return ss.name
        raise ValueError(f"picklist get_sig_attribute {coltype} has unhandled branch")

    # manifest column each simple coltype reads from
    _manifest_colkey = {
        "md5": "md5",
        "md5prefix8": "md5short",
        "md5short": "md5short",
        "name": "name",
        "ident": "name",
        "identprefix": "name",
    }

    def _get_value_for_manifest_row(self, row):
        if self.coltype in self.meta_coltypes:
            q = (row["name"], row["md5"])
        else:
            colkey = self._manifest_colkey.get(self.coltype)
            if colkey is None:
                raise ValueError(
                    f"picklist get_value_for_row {self.coltype} has unhandled branch"
                )
            q = row.get(colkey)
        assert q
        return self.preprocess_fn(q)

    def _get_value_for_csv_row(self, row):
        if self.coltype == "manifest":
            q = (row["name"], row["md5"])
        elif self.coltype == "prefetch":
            q = (row["match_name"], row["match_md5"])
        elif self.coltype in ("gather", "search"):
            q = (row["name"], row["md5"])
        else:
            q = row[self.column_name]
        if q:
            q = self.preprocess_fn(q)
        return q

    def init(self, values=[]):
        if self.pickset is not None:
            raise ValueError("already initialized?")
        self.pickset = set(values)
        return self.pickset

    def load(self, *, allow_empty=False):
        "Load the pickfile; return (num empty values, set of dup values)."
        from . import sourmash_args

        pickset = self.init()
        pickfile = self.pickfile

        if not os.path.exists(pickfile) or not os.path.isfile(pickfile):
            raise ValueError(f"pickfile '{pickfile}' must exist and be a regular file")

        n_empty_val = 0
        dup_vals = set()

        with sourmash_args.FileInputCSV(pickfile) as r:
            self.pickfile = pickfile
            if not r.fieldnames:
                if not allow_empty:
                    raise ValueError(
                        f"empty or improperly formatted pickfile '{pickfile}'"
                    )
                return 0, 0

            if not (
                self.column_name in r.fieldnames or self.coltype in self.meta_coltypes
            ):
                raise ValueError(
                    f"column '{self.column_name}' not in pickfile '{pickfile}'"
                )

            for row in r:
                col = self._get_value_for_csv_row(row)
                if not col:
                    n_empty_val += 1
                    continue
                if col in pickset:
                    dup_vals.add(col)
                else:
                    self.add(col)

        return n_empty_val, dup_vals

    def add(self, value):
        self.pickset.add(value)

    def _check(self, q):
        self.n_queries += 1
        in_pickset = q in self.pickset
        if in_pickset == (self.pickstyle == PickStyle.INCLUDE):
            self.found.add(q)
            return True
        return False

    def __contains__(self, ss):
        return self._check(self.preprocess_fn(self._get_sig_attribute(ss)))

    def matches_manifest_row(self, row):
        return self._check(self._get_value_for_manifest_row(row))

    def matched_csv_row(self, row):
        q = self._get_value_for_csv_row(row)
        self.n_queries += 1
        return q in self.found

    def filter(self, it):
        for ss in it:
            if self.__contains__(ss):
                yield ss


def passes_all_picklists(ss, picklists):
    "Does the signature pass every picklist?"
    return all(ss in picklist for picklist in picklists)
