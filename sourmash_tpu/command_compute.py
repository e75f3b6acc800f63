"""Legacy 'sourmash compute' command.

Behavior parity: reference `src/sourmash/command_compute.py:28-140` —
option validation, moltype combinations (DNA and/or protein-family in one
run), the v4 protein-ksize warning (raw ksizes divisible by 3), and the
merge/individual split. Sketching reuses the batched device path shared
with 'sketch' (`command_sketch.py`).
"""

from __future__ import annotations

import random
import sys

from .command_sketch import (
    ComputeParameters,
    _compute_individual,
    _compute_merged,
    signature_from_params,
)
from .logging import error, notify, set_quiet


def compute(args):
    "Compute signature(s) for one or more sequence files."
    set_quiet(args.quiet)

    if args.license != "CC0":
        error("error: sourmash only supports CC0-licensed signatures. sorry!")
        sys.exit(-1)

    if args.input_is_protein and args.dna:
        notify("WARNING: input is protein, turning off nucleotide hashing")
        args.dna = False
        args.protein = True

    if args.scaled:
        if args.scaled < 1:
            error("ERROR: --scaled value must be >= 1")
            sys.exit(-1)
        if args.scaled != round(args.scaled, 0):
            error("ERROR: --scaled value must be integer value")
            sys.exit(-1)
        if args.scaled >= 1e9:
            notify("WARNING: scaled value is nonsensical!? Continuing anyway.")

        if args.num_hashes != 0:
            notify("setting num_hashes to 0 because --scaled is set")
            args.num_hashes = 0

    notify("computing signatures for files: {}", ", ".join(args.filenames))

    if args.randomize:
        notify("randomizing file list because of --randomize")
        random.shuffle(args.filenames)

    ksizes = args.ksizes
    notify("Computing signature for ksizes: {}", str(ksizes))

    num_sigs = 0
    if args.dna and args.protein:
        notify("Computing both nucleotide and protein signatures.")
        num_sigs = 2 * len(ksizes)
    elif args.dna and args.dayhoff:
        notify("Computing both nucleotide and Dayhoff-encoded protein signatures.")
        num_sigs = 2 * len(ksizes)
    elif args.dna and args.hp:
        notify("Computing both nucleotide and hp-encoded protein signatures.")
        num_sigs = 2 * len(ksizes)
    elif args.dna:
        notify("Computing only nucleotide (and not protein) signatures.")
        num_sigs = len(ksizes)
    elif args.protein:
        notify("Computing only protein (and not nucleotide) signatures.")
        num_sigs = len(ksizes)
    elif args.dayhoff:
        notify("Computing only Dayhoff-encoded protein (and not nucleotide) signatures.")
        num_sigs = len(ksizes)
    elif args.hp:
        notify("Computing only hp-encoded protein (and not nucleotide) signatures.")
        num_sigs = len(ksizes)

    if args.protein or args.dayhoff or args.hp:
        notify("")
        notify(
            "WARNING: you are using 'compute' to make a protein/dayhoff/hp signature,"
        )
        notify("WARNING: but the meaning of ksize has changed in 4.0. Please see the")
        notify("WARNING: migration guide to sourmash v4.0 at http://sourmash.rtfd.io/")
        notify("")
        bad_ksizes = [str(k) for k in ksizes if k % 3 != 0]
        if bad_ksizes:
            error("protein ksizes must be divisible by 3, sorry!")
            error("bad ksizes: {}", ", ".join(bad_ksizes))
            sys.exit(-1)

    notify("Computing a total of {} signature(s) for each input.", num_sigs)

    if num_sigs == 0:
        error("...nothing to calculate!? Exiting!")
        sys.exit(-1)

    if args.merge and not args.output:
        error("ERROR: must specify -o with --merge")
        sys.exit(-1)

    if args.output and args.output_dir:
        error("ERROR: --output-dir doesn't make sense with -o/--output")
        sys.exit(-1)

    if args.track_abundance:
        notify("Tracking abundance of input k-mers.")

    signatures_factory = _signatures_for_compute_factory(args)

    if args.merge:
        _compute_merged(args, signatures_factory)
    else:
        _compute_individual(args, signatures_factory)


class _signatures_for_compute_factory:
    "Build signatures on demand, based on args input to 'compute'."

    def __init__(self, args):
        self.args = args

    def __call__(self):
        args = self.args
        params = ComputeParameters(
            ksizes=args.ksizes,
            seed=args.seed,
            protein=args.protein,
            dayhoff=args.dayhoff,
            hp=args.hp,
            dna=args.dna,
            num_hashes=args.num_hashes,
            track_abundance=args.track_abundance,
            scaled=int(args.scaled),
        )
        sig = signature_from_params(params)
        return [sig]
