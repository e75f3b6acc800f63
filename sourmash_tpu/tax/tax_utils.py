"""Taxonomy utilities: lineage types, lineage databases, gather-CSV
summarization.

Parity target: reference `src/sourmash/tax/tax_utils.py` (LineagePair:83,
BaseLineageInfo/RankLineageInfo/LINLineageInfo :89-640, LineageDB:1210,
MultiLineageDB:1590+, summarization dataclasses :1825+). Built out
incrementally; the core lineage types live here first.
"""

from __future__ import annotations

import csv
from collections import defaultdict
from dataclasses import dataclass, field, replace
from typing import NamedTuple

__all__ = [
    "LineagePair",
    "RankLineageInfo",
    "LINLineageInfo",
    "LineageDB",
    "MultiLineageDB",
    "ascending_taxlist",
]

RANKS = (
    "superkingdom",
    "phylum",
    "class",
    "order",
    "family",
    "genus",
    "species",
    "strain",
)


class LineagePair(NamedTuple):
    rank: str
    name: str = None
    taxid: int = None


def ascending_taxlist(include_strain=True):
    "Provide an ordered list of taxonomic ranks: strain --> superkingdom."
    ascending = [
        "species",
        "genus",
        "family",
        "order",
        "class",
        "phylum",
        "superkingdom",
    ]
    if include_strain:
        ascending = ["strain"] + ascending
    yield from ascending


@dataclass(frozen=True, order=True)
class BaseLineageInfo:
    """Handle hierarchical taxonomic lineages over a fixed rank list.

    Storage: `lineage` is a tuple of LineagePair, one per rank (filled
    entries first; missing ranks hold LineagePair(rank, None))."""

    ranks: tuple = ()
    lineage: tuple = None
    lineage_str: str = None

    def __post_init__(self):
        if self.lineage is not None:
            self._init_from_lineage_tuples()
        elif self.lineage_str is not None:
            self._init_from_lineage_str()
        else:
            object.__setattr__(
                self, "lineage", tuple(LineagePair(r) for r in self.ranks)
            )

    def __eq__(self, other):
        if other == ():
            return False
        return all([self.ranks == other.ranks, self.lineage == other.lineage])

    @property
    def taxlist(self):
        return self.ranks

    @property
    def ascending_taxlist(self):
        return self.ranks[::-1]

    @property
    def lowest_rank(self):
        if not self.filled_ranks:
            return None
        return self.filled_ranks[-1]

    def rank_index(self, rank):
        return self.ranks.index(rank)

    @property
    def filled_lineage(self):
        "Return lineage down to the lowest non-empty rank."
        if not self.filled_ranks:
            return ()
        lowest_filled_rank_idx = self.rank_index(self.filled_ranks[-1])
        return self.lineage[: lowest_filled_rank_idx + 1]

    @property
    def filled_ranks(self):
        return tuple(
            a.rank for a in self.lineage if a.name is not None and a.name != ""
        )

    @property
    def lowest_lineage_name(self):
        if not self.filled_ranks:
            return None
        return self.filled_lineage[-1].name

    @property
    def lowest_lineage_taxid(self):
        if not self.filled_ranks:
            return None
        return self.filled_lineage[-1].taxid

    def name_at_rank(self, rank):
        self.check_rank_availability(rank)
        if not self.filled_ranks or rank not in self.filled_ranks:
            return None
        return self.lineage[self.rank_index(rank)].name

    def taxid_at_rank(self, rank):
        self.check_rank_availability(rank)
        if not self.filled_ranks or rank not in self.filled_ranks:
            return None
        return self.lineage[self.rank_index(rank)].taxid

    def _init_from_lineage_tuples(self):
        "Initialize from tuple/list of LineagePairs, allowing empty ranks."
        new_lineage = []
        if not self.ranks:
            raise ValueError("Cannot initialize BaseLineageInfo. Please provide 'ranks'.")
        for rank in self.ranks:
            new_lineage.append(LineagePair(rank=rank))
        for lin_tup in self.lineage:
            if not isinstance(lin_tup, LineagePair):
                if isinstance(lin_tup, tuple) and len(lin_tup) >= 2:
                    lin_tup = LineagePair(*lin_tup)
                else:
                    raise ValueError(f"{lin_tup} is not LineagePair.")
            if lin_tup.rank:
                try:
                    rank_idx = self.rank_index(lin_tup.rank)
                except ValueError as e:
                    raise ValueError(
                        f"Rank '{lin_tup.rank}' not present in {', '.join(self.ranks)}"
                    ) from e
                new_lineage[rank_idx] = lin_tup

        object.__setattr__(self, "lineage", tuple(new_lineage))

    def _init_from_lineage_str(self):
        "Initialize from a ';'/',' separated lineage string."
        if not self.ranks:
            raise ValueError("Cannot initialize BaseLineageInfo. Please provide 'ranks'.")
        new_lineage = self.lineage_str.split(";")
        if len(new_lineage) == 1:
            new_lineage = self.lineage_str.split(",")
        new_lineage = [
            LineagePair(rank=rank, name=n)
            for (rank, n) in zip(self.ranks, new_lineage)
        ]
        # clean empty names
        cleaned = []
        for lin_tup in new_lineage:
            name = lin_tup.name
            if name is not None and name.strip() in ("", "[Blank]", "na", "null", "NA"):
                name = None
            cleaned.append(LineagePair(rank=lin_tup.rank, name=name))
        object.__setattr__(self, "lineage", tuple(cleaned))

    def zip_lineage(self, truncate_empty=False):
        "Return lineage names as a list, padded to all ranks."
        if truncate_empty:
            zipped = [a.name for a in self.filled_lineage]
        else:
            zipped = [a.name for a in self.lineage]
        return ["" if x is None else x for x in zipped]

    def zip_taxid(self, truncate_empty=False):
        if truncate_empty:
            zipped = [a.taxid for a in self.filled_lineage]
        else:
            zipped = [a.taxid for a in self.lineage]
        return ["" if x is None else str(x) for x in zipped]

    def display_lineage(self, truncate_empty=True, null_as_unclassified=False):
        lin = ";".join(self.zip_lineage(truncate_empty=truncate_empty))
        if null_as_unclassified and (lin == "" or lin is None):
            return "unclassified"
        return lin

    def display_taxid(self, truncate_empty=True):
        return ";".join(self.zip_taxid(truncate_empty=truncate_empty))

    def check_rank_availability(self, rank):
        if rank in self.ranks:
            return True
        raise ValueError(f"Desired Rank '{rank}' not available for this lineage.")

    def rank_is_filled(self, rank, other=None):
        self.check_rank_availability(rank)
        if other is not None:
            if rank in self.filled_ranks and rank in other.filled_ranks:
                return True
        elif rank in self.filled_ranks:
            return True
        return False

    def is_compatible(self, other):
        return self.ranks == other.ranks

    def is_lineage_match(self, other, rank):
        "Check if lineages match at the given rank (all ranks above equal)."
        self.check_rank_availability(rank)
        if not other.rank_is_filled(rank) or not self.rank_is_filled(rank):
            return False
        rank_idx = self.rank_index(rank)
        a_lin = self.lineage[: rank_idx + 1]
        b_lin = other.lineage[: rank_idx + 1]
        return bool(a_lin == b_lin)

    def pop_to_rank(self, rank):
        "Return a new LineageInfo truncated to the given rank."
        self.check_rank_availability(rank)
        if not self.rank_is_filled(rank):
            return replace(self)
        rank_idx = self.rank_index(rank)
        new_lineage = self.lineage[: rank_idx + 1]
        new = replace(self, lineage=new_lineage)
        new.__post_init__()
        return new

    def lineage_at_rank(self, rank):
        "Lineage tuple down to the given rank."
        self.check_rank_availability(rank)
        if not self.filled_ranks:
            return ()
        rank_idx = self.rank_index(rank)
        return self.filled_lineage[: rank_idx + 1]


@dataclass(frozen=True, order=True)
class RankLineageInfo(BaseLineageInfo):
    "Taxonomic lineage over the standard 8 ranks (superkingdom..strain)."

    ranks: tuple = RANKS
    lineage_dict: dict = None

    def __post_init__(self):
        if self.lineage is not None:
            self._init_from_lineage_tuples()
        elif self.lineage_str is not None:
            self._init_from_lineage_str()
        elif self.lineage_dict is not None:
            self._init_from_lineage_dict()
        elif self.ranks:
            object.__setattr__(
                self, "lineage", tuple(LineagePair(r) for r in self.ranks)
            )

    def __eq__(self, other):
        if other == ():
            return False
        return all([self.ranks == other.ranks, self.lineage == other.lineage])

    def _init_from_lineage_dict(self):
        "Initialize from a {rank: name} or {rank: {name, taxid}} dict."
        if not isinstance(self.lineage_dict, dict):
            raise ValueError(f"{self.lineage_dict} is not dictionary")
        new_lineage = [LineagePair(rank=rank) for rank in self.ranks]
        for key, val in self.lineage_dict.items():
            name, taxid = None, None
            if isinstance(val, dict):
                name = val.get("name")
                taxid = val.get("taxid")
            elif isinstance(val, str):
                name = val
            try:
                rank_idx = self.rank_index(key)
            except ValueError as e:
                raise ValueError(
                    f"Rank '{key}' not present in {', '.join(self.ranks)}"
                ) from e
            new_lineage[rank_idx] = LineagePair(rank=key, name=name, taxid=taxid)
        object.__setattr__(self, "lineage", tuple(new_lineage))


@dataclass(frozen=True, order=True)
class LINLineageInfo(BaseLineageInfo):
    "LIN taxonomic lineage: positional integer ranks."

    ranks: tuple = field(default=(), compare=False)
    n_lin_positions: int = field(default=None, compare=False)

    def __post_init__(self):
        if self.lineage is not None:
            self._init_from_lineage_tuples()
        elif self.lineage_str is not None:
            self._init_from_lineage_str()
        else:
            self._init_empty()

    def __eq__(self, other):
        if other == ():
            return False
        return all(
            [
                self.n_lin_positions == other.n_lin_positions,
                self.lineage == other.lineage,
            ]
        )

    def _init_empty(self):
        new_lineage = []
        if self.n_lin_positions is None:
            object.__setattr__(self, "n_lin_positions", 0)
        ranks = [str(x) for x in range(self.n_lin_positions)]
        for rank in ranks:
            new_lineage.append(LineagePair(rank=rank))
        object.__setattr__(self, "lineage", tuple(new_lineage))
        object.__setattr__(self, "ranks", tuple(ranks))

    def _init_from_lineage_str(self):
        new_lineage = self.lineage_str.split(";")
        if len(new_lineage) == 1:
            new_lineage = self.lineage_str.split(",")
        if self.n_lin_positions is not None:
            if self.n_lin_positions < len(new_lineage):
                raise ValueError(
                    "Provided 'n_lin_positions' has fewer positions than provided lineage."
                )
            n_pos = self.n_lin_positions
        else:
            n_pos = len(new_lineage)
        ranks = [str(x) for x in range(n_pos)]
        lineage = [LineagePair(rank=rank) for rank in ranks]
        for i, n in enumerate(new_lineage):
            if n is not None and n.strip() in ("", "[Blank]", "na", "null", "NA"):
                n = None
            lineage[i] = LineagePair(rank=str(i), name=n)
        object.__setattr__(self, "lineage", tuple(lineage))
        object.__setattr__(self, "ranks", tuple(ranks))
        object.__setattr__(self, "n_lin_positions", n_pos)

    def _init_from_lineage_tuples(self):
        new_lineage = []
        ranks = []
        for i, lin_tup in enumerate(self.lineage):
            if not isinstance(lin_tup, LineagePair):
                lin_tup = LineagePair(*lin_tup)
            new_lineage.append(LineagePair(rank=str(i), name=lin_tup.name))
            ranks.append(str(i))
        object.__setattr__(self, "lineage", tuple(new_lineage))
        object.__setattr__(self, "ranks", tuple(ranks))
        object.__setattr__(self, "n_lin_positions", len(new_lineage))

    @property
    def lowest_lineage_name(self):
        if not self.filled_lineage:
            return ""
        return self.filled_lineage[-1].name


class LineageDB:
    """An in-memory mapping {identifier: lineage tuple}.

    Parity: reference `tax_utils.py:1210+` — load from taxonomy CSV with
    'ident' + rank columns."""

    def __init__(self, assign_d, avail_ranks):
        self.assignments = dict(assign_d)
        self.available_ranks = set(avail_ranks)

    def __getitem__(self, ident):
        return self.assignments[ident]

    def __iter__(self):
        return iter(self.assignments)

    def __len__(self):
        return len(self.assignments)

    def __bool__(self):
        return bool(self.assignments)

    def keys(self):
        return self.assignments.keys()

    def items(self):
        return self.assignments.items()

    def values(self):
        return self.assignments.values()

    def get(self, key, default=None):
        return self.assignments.get(key, default)

    def __contains__(self, key):
        return key in self.assignments

    @classmethod
    def load(cls, filename, *, delimiter=",", force=False,
             keep_full_identifiers=False, keep_identifier_versions=False,
             lins=False):
        "Load a taxonomy assignment CSV into a LineageDB."
        include_strain = False

        with open(filename, newline="") as fp:
            r = csv.DictReader(fp, delimiter=delimiter)
            header = r.fieldnames
            if not header:
                raise ValueError(f"cannot read taxonomy assignments from {filename}")

            identifier = "ident"
            # check for ident/identifiers columns
            if "ident" not in header:
                if "identifiers" in header:
                    identifier = "identifiers"
                    header = ["ident" if c == "identifiers" else c for c in header]
                elif "accession" in header:
                    identifier = "accession"
                    header = ["ident" if c == "accession" else c for c in header]
                elif "name" in header and "lineage" in header:
                    return cls.load_from_gather_with_lineages(
                        filename, force=force, lins=lins
                    )
                else:
                    header_str = ",".join([repr(x) for x in header])
                    raise ValueError(
                        f"No taxonomic identifiers found; headers are {header_str}"
                    )

            if lins and "lin" not in header:
                raise ValueError(
                    f"'lin' column not found: cannot read LIN taxonomy assignments from {filename}."
                )

            if not lins:
                # is "strain" an available rank?
                if "strain" in header:
                    include_strain = True
                # check that all ranks are in header
                ranks = list(RANKS)
                if not include_strain:
                    ranks.remove("strain")
                if not set(ranks).issubset(header):
                    raise ValueError(
                        f"Not all taxonomy ranks present; cannot read taxonomy assignments from {filename}."
                    )

            assignments = {}
            num_rows = 0
            n_species = 0
            n_strains = 0
            n_pos = None

            for row in r:
                num_rows += 1
                if identifier != "ident":
                    row["ident"] = row[identifier]
                ident = row["ident"]
                if not keep_full_identifiers:
                    ident = ident.split(" ")[0]
                    if not keep_identifier_versions:
                        ident = ident.split(".")[0]

                if lins:
                    lineageInfo = LINLineageInfo(lineage_str=row["lin"])
                    if n_pos is not None:
                        if lineageInfo.n_lin_positions != n_pos:
                            raise ValueError(
                                "For taxonomic summarization, all LIN assignments must use the same number of LIN positions."
                            )
                    else:
                        n_pos = lineageInfo.n_lin_positions
                else:
                    lineage_d = {}
                    for rank in RANKS:
                        if rank in row:
                            value = row[rank]
                            if rank == "superkingdom" and value and not value.startswith("d__"):
                                pass
                            lineage_d[rank] = value
                    lineageInfo = RankLineageInfo(lineage_dict=lineage_d)

                lineage = lineageInfo.filled_lineage

                if lineage:
                    if lineage[-1].rank == "species":
                        n_species += 1
                    elif lineage[-1].rank == "strain":
                        n_species += 1
                        n_strains += 1

                if ident in assignments:
                    if (
                        assignments[ident] != tuple(lineage)
                        and not force
                    ):
                        raise ValueError(
                            f"multiple lineages for identifier {ident}"
                        )
                else:
                    assignments[ident] = tuple(lineage)

            if lins:
                available_ranks = set([str(x) for x in range(n_pos or 0)])
            else:
                available_ranks = set(RANKS if include_strain else RANKS[:-1])

        return cls(assignments, available_ranks)

    @classmethod
    def load_from_gather_with_lineages(cls, filename, *, force=False, lins=False):
        "Load an annotated gather-with-lineages CSV into a LineageDB."
        import os

        if not os.path.exists(filename):
            raise ValueError(f"'{filename}' does not exist")
        if os.path.isdir(filename):
            raise ValueError(f"'{filename}' is a directory")

        with open(filename, newline="") as fp:
            r = csv.DictReader(fp)
            header = r.fieldnames
            if not header:
                raise ValueError(f"cannot read taxonomy assignments from {filename}")

            if "name" not in header or "lineage" not in header:
                raise ValueError(
                    f"Expected headers 'name' and 'lineage' not found. Is this a with-lineages file?"
                )

            ranks = None
            assignments = {}
            n_species = 0
            n_strains = 0

            for row in r:
                name = row["name"]
                ident = get_ident(name)
                if lins:
                    lineageInfo = LINLineageInfo(lineage_str=row["lineage"])
                else:
                    lineageInfo = RankLineageInfo(lineage_str=row["lineage"])

                if ranks is None:
                    ranks = lineageInfo.taxlist

                lineage = lineageInfo.filled_lineage

                if lineage:
                    if lineage[-1].rank == "species":
                        n_species += 1
                    elif lineage[-1].rank == "strain":
                        n_species += 1
                        n_strains += 1

                if ident in assignments:
                    if assignments[ident] != tuple(lineage) and not force:
                        raise ValueError(f"multiple lineages for identifier {ident}")
                else:
                    assignments[ident] = tuple(lineage)

        return cls(assignments, set(ranks or ()))


class MultiLineageDB:
    "A wrapper for (possibly multiple) lineage databases."

    def __init__(self):
        self.lineage_dbs = []

    @property
    def available_ranks(self):
        "Compute available ranks across all databases."
        x = set()
        for db in self.lineage_dbs:
            x.update(db.available_ranks)
        return x

    def add(self, db):
        self.lineage_dbs.append(db)

    def __iter__(self):
        seen = set()
        for db in self.lineage_dbs:
            for k in db:
                if k not in seen:
                    seen.add(k)
                    yield k

    def items(self):
        seen = set()
        for db in self.lineage_dbs:
            for k, v in db.items():
                if k not in seen:
                    seen.add(k)
                    yield k, v

    def keys(self):
        yield from iter(self)

    def __getitem__(self, ident):
        "Return lineage tuple for first match to identifier."
        for db in self.lineage_dbs:
            if ident in db:
                return db[ident]
        raise KeyError(ident)

    def __contains__(self, ident):
        return any(ident in db for db in self.lineage_dbs)

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __bool__(self):
        return any(self.lineage_dbs)

    def __len__(self):
        return len(set(iter(self)))

    @classmethod
    def load(cls, locations, **kwargs):
        "Load one or more taxonomies into a MultiLineageDB."
        if isinstance(locations, str):
            raise TypeError("'locations' should be a list, not a string")

        tax_assign = cls()
        for location in locations:
            db = None
            # try sqlite first
            try:
                from .tax_sql import LineageDB_Sqlite

                db = LineageDB_Sqlite.load(location)
            except (ImportError, ValueError):
                db = None
            if db is None:
                db = LineageDB.load(location, **kwargs)
            tax_assign.add(db)

        return tax_assign

    def save(self, filename_or_fp, file_format="csv"):
        "Save to CSV (or sql later)."
        is_filename = isinstance(filename_or_fp, str)
        if file_format == "sql":
            raise NotImplementedError("sql lineage output: TODO")
        if is_filename:
            with open(filename_or_fp, "w", newline="") as fp:
                self._save_csv(fp)
        else:
            self._save_csv(filename_or_fp)

    def _save_csv(self, fp):
        ranks = sorted(
            self.available_ranks,
            key=lambda r: RANKS.index(r) if r in RANKS else 99,
        )
        w = csv.writer(fp)
        w.writerow(["ident"] + list(ranks))
        for ident, lineage in self.items():
            d = {p.rank: p.name for p in lineage}
            w.writerow([ident] + [d.get(r, "") or "" for r in ranks])


def get_ident(ident, *, keep_full_identifiers=False, keep_identifier_versions=False):
    "Hack identifiers from gather names: strip after space and version."
    i = ident.split(" ")[0]
    if not keep_full_identifiers:
        if not keep_identifier_versions:
            i = i.split(".")[0]
    return i
