"""'sourmash signature' (sig) subcommands: signature manipulation utilities.

Behavior parity: reference `src/sourmash/sig/__main__.py` (cat:114, split:166,
describe:250, manifest:347, overlap:379, merge:459, intersect:526,
inflate:595, subtract:643, rename:715, extract:753, filter:830, flatten:881,
downsample:926). Console/CSV formats match the reference.
"""

from __future__ import annotations

import csv
import os
import sys
from collections import defaultdict

import sourmash_tpu as sourmash
from .. import sourmash_args
from ..logging import set_quiet, error, notify, print_results, debug
from ..minhash import _get_max_hash_for_scaled, MinHash

_extend_notes = "(also see 'sourmash sig --help')"


def _extend_signatures_with_from_file(args, target_attr="signatures"):
    if getattr(args, "from_file", None):
        more = sourmash_args.load_pathlist_from_file(args.from_file)
        setattr(
            args, target_attr, list(getattr(args, target_attr)) + list(more)
        )


def _check_abundance_compatibility(sig1, sig2):
    if sig1.minhash.track_abundance != sig2.minhash.track_abundance:
        raise ValueError(
            "incompatible signatures: track_abundance is {} in first sig, {} in second".format(
                sig1.minhash.track_abundance, sig2.minhash.track_abundance
            )
        )


def _set_num_scaled(mh, num, scaled):
    "Set num and scaled values on a MinHash, re-inserting mins to re-trim."
    import numpy as np

    mins, abunds = mh._mins, mh._abunds
    mh._num = num
    mh._max_hash = _get_max_hash_for_scaled(scaled)
    mh._mins = np.zeros(0, dtype=np.uint64)
    if mh._track_abundance:
        mh._abunds = np.zeros(0, dtype=np.uint64)
    mh._invalidate()
    mh._insert_hashes(mins, abunds)
    assert mh.num == num
    assert mh.scaled == scaled


def cat(args):
    "Concatenate all signatures into one file."
    set_quiet(args.quiet, args.debug)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    pattern_search = sourmash_args.load_include_exclude_db_patterns(args)

    encountered_md5sums = defaultdict(int)

    save_sigs = sourmash_args.SaveSignaturesToLocation(args.output)
    save_sigs.open()

    _extend_signatures_with_from_file(args)

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.signatures,
        ksize=args.ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
        pattern=pattern_search,
    )
    for ss, sigloc in loader:
        md5 = ss.md5sum()
        encountered_md5sums[md5] += 1
        if args.unique and encountered_md5sums[md5] > 1:
            continue
        save_sigs.add(ss)

    notify(f"loaded {len(save_sigs)} signatures total.")
    if picklist:
        sourmash_args.report_picklist(args, picklist)

    save_sigs.close()

    notify(f"output {len(save_sigs)} signatures")

    multiple_md5 = [1 for cnt in encountered_md5sums.values() if cnt > 1]
    if multiple_md5:
        notify(f"encountered {sum(multiple_md5)} MinHashes multiple times")
        if args.unique:
            notify("...and removed the duplicates, because --unique was specified.")


def split(args):
    "Split all signatures into individual files."
    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    _extend_signatures_with_from_file(args)

    output_names = set()
    output_scaled_template = (
        "{md5sum}.k={ksize}.scaled={scaled}.{moltype}.dup={dup}.{basename}"
        + args.extension
    )
    output_num_template = (
        "{md5sum}.k={ksize}.num={num}.{moltype}.dup={dup}.{basename}" + args.extension
    )

    if args.output_dir:
        if not os.path.exists(args.output_dir):
            notify(f"Creating --output-dir {args.output_dir}")
            os.mkdir(args.output_dir)

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.signatures,
        ksize=args.ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
    )

    for sig, sigloc in loader:
        md5sum = sig.md5sum()[:8]
        minhash = sig.minhash
        basename = os.path.basename(sig.filename)
        if not basename or basename == "-":
            basename = "none"

        params = dict(
            basename=basename,
            md5sum=md5sum,
            scaled=minhash.scaled,
            ksize=minhash.ksize,
            num=minhash.num,
            moltype=minhash.moltype,
        )

        if minhash.scaled:
            output_template = output_scaled_template
        else:
            assert minhash.num
            output_template = output_num_template

        n = 0
        params["dup"] = n
        output_name = output_template.format(**params)
        while output_name in output_names:
            params["dup"] = n
            output_name = output_template.format(**params)
            n += 1

        output_names.add(output_name)

        if args.output_dir:
            output_name = os.path.join(args.output_dir, output_name)

        if os.path.exists(output_name):
            notify(f"** overwriting existing file {format(output_name)}")

        with sourmash_args.SaveSignaturesToLocation(output_name) as save_sigs:
            save_sigs.add(sig)
            notify(f"writing sig to {output_name}")

    notify(f"loaded and split {len(progress)} signatures total.")
    if picklist:
        sourmash_args.report_picklist(args, picklist)


def describe(args):
    "Provide basic info on signatures."
    set_quiet(args.quiet, args.debug)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    pattern_search = sourmash_args.load_include_exclude_db_patterns(args)
    _extend_signatures_with_from_file(args)

    w = None
    csv_obj = None
    if args.csv:
        csv_obj = sourmash_args.FileOutputCSV(args.csv)
        csv_fp = csv_obj.open()
        w = csv.DictWriter(
            csv_fp,
            [
                "signature_file",
                "md5",
                "ksize",
                "moltype",
                "num",
                "scaled",
                "n_hashes",
                "seed",
                "with_abundance",
                "name",
                "filename",
                "license",
                "sum_hashes",
            ],
            extrasaction="ignore",
        )
        w.writeheader()

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.signatures,
        ksize=args.ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
        pattern=pattern_search,
    )

    for sig, location in loader:
        signature_file = location
        mh = sig.minhash
        ksize = mh.ksize
        moltype = mh.moltype
        scaled = mh.scaled
        num = mh.num
        seed = mh.seed
        n_hashes = len(mh)
        sum_hashes = sum(mh.hashes.values())
        with_abundance = 0
        if mh.track_abundance:
            with_abundance = 1
        md5 = sig.md5sum()
        name = sig.name
        p_name = name or "** no name **"
        filename = sig.filename
        p_filename = filename or "** no name **"
        license = sig.license

        if w:
            w.writerow(locals())

        print_results(
            """\
---
signature filename: {location}
signature: {p_name}
source file: {p_filename}
md5: {md5}
k={ksize} molecule={moltype} num={num} scaled={scaled} seed={seed} track_abundance={with_abundance}
size: {n_hashes}
sum hashes: {sum_hashes}
signature license: {license}
""",
            **locals(),
        )

    if csv_obj:
        csv_obj.close()

    if picklist:
        sourmash_args.report_picklist(args, picklist)


def manifest(args):
    "Build a signature manifest."
    set_quiet(args.quiet, args.debug)

    try:
        loader = sourmash_args.load_file_as_index(
            args.location, yield_all_files=args.force
        )
    except ValueError:
        error(f"Cannot open '{args.location}' as a sourmash signature collection.")
        error("Use -d/--debug for details.")
        sys.exit(-1)

    rebuild = True
    if args.no_rebuild_manifest:
        debug("sig manifest: not forcing rebuild.")
        rebuild = False
    else:
        debug("sig manifest: forcing rebuild.")

    manifest = sourmash_args.get_manifest(loader, require=True, rebuild=rebuild)
    manifest._check_row_values()

    manifest.write_to_filename(
        args.output, database_format=args.manifest_format, ok_if_exists=args.force
    )
    notify(f"manifest contains {len(manifest)} signatures total.")
    notify(f"wrote manifest to '{args.output}' ({args.manifest_format})")


def overlap(args):
    "Provide detailed comparison of two signatures."
    set_quiet(args.quiet)

    moltype = sourmash_args.calculate_moltype(args)

    sig1 = sourmash_args.load_one_signature(
        args.signature1, ksize=args.ksize, select_moltype=moltype
    )
    sig2 = sourmash_args.load_one_signature(
        args.signature2, ksize=args.ksize, select_moltype=moltype
    )

    notify(f"loaded one signature each from {args.signature1} and {args.signature2}")

    similarity = sig1.similarity(sig2)
    cont1 = sig1.contained_by(sig2)
    cont2 = sig2.contained_by(sig1)

    sig1_file = args.signature1
    sig2_file = args.signature2

    name1 = sig1.name
    name2 = sig2.name

    md5_1 = sig1.md5sum()
    md5_2 = sig2.md5sum()

    ksize = sig1.minhash.ksize
    moltype = sig1.minhash.moltype

    num = sig1.minhash.num
    size1 = len(sig1.minhash)
    size2 = len(sig2.minhash)

    scaled = sig1.minhash.scaled

    hashes_1 = set(sig1.minhash.hashes)
    hashes_2 = set(sig2.minhash.hashes)

    num_common = len(hashes_1 & hashes_2)
    disjoint_1 = len(hashes_1 - hashes_2)
    disjoint_2 = len(hashes_2 - hashes_1)
    num_union = len(hashes_1.union(hashes_2))

    print(
        """\
first signature:
  signature filename: {sig1_file}
  signature: {name1}
  md5: {md5_1}
  k={ksize} molecule={moltype} num={num} scaled={scaled}

second signature:
  signature filename: {sig2_file}
  signature: {name2}
  md5: {md5_2}
  k={ksize} molecule={moltype} num={num} scaled={scaled}

similarity:                  {similarity:.5f}
first contained in second:   {cont1:.5f}
second contained in first:   {cont2:.5f}

number of hashes in first:   {size1}
number of hashes in second:  {size2}

number of hashes in common:  {num_common}
only in first:               {disjoint_1}
only in second:              {disjoint_2}
total (union):               {num_union}
""".format(**locals())
    )


def merge(args):
    "Merge one or more signatures."
    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    _extend_signatures_with_from_file(args)

    first_sig = None
    mh = None

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.signatures,
        ksize=args.ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
    )

    for sigobj, sigloc in loader:
        if first_sig is None:
            first_sig = sigobj
            mh = first_sig.minhash.copy_and_clear().to_mutable()
            if args.flatten:
                mh.track_abundance = False

        try:
            sigobj_mh = sigobj.minhash
            if not args.flatten:
                _check_abundance_compatibility(first_sig, sigobj)
            else:
                sigobj_mh = sigobj_mh.flatten()

            mh.merge(sigobj_mh)
        except (TypeError, ValueError) as exc:
            error(
                "ERROR when merging signature '{}' ({}) from file {}",
                sigobj,
                sigobj.md5sum()[:8],
                sigloc,
            )
            error(str(exc))
            sys.exit(-1)

    if not len(progress):
        error("no signatures to merge!?")
        sys.exit(-1)

    merged_sigobj = sourmash.SourmashSignature(mh, name=args.set_name or "")
    merged_sigobj._name = args.set_name

    with sourmash_args.SaveSignaturesToLocation(args.output) as save_sigs:
        save_sigs.add(merged_sigobj)

    notify(f"loaded and merged {len(progress)} signatures")

    if picklist:
        sourmash_args.report_picklist(args, picklist)


def intersect(args):
    "Intersect one or more signatures; removes abundances unless -A."
    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    _extend_signatures_with_from_file(args)

    first_sig = None
    mins = None

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.signatures,
        ksize=args.ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
    )

    for sigobj, sigloc in loader:
        if first_sig is None:
            first_sig = sigobj
            mins = set(sigobj.minhash.hashes)
        else:
            if not sigobj.minhash.is_compatible(first_sig.minhash):
                error("incompatible minhashes; specify -k and/or molecule type.")
                sys.exit(-1)

        mins.intersection_update(sigobj.minhash.hashes)

    if first_sig is None:
        notify("no signatures provided to intersect!?")
        sys.exit(-1)

    intersect_mh = first_sig.minhash.copy_and_clear().flatten().to_mutable()
    intersect_mh.add_many(mins)

    if args.abundances_from:
        notify(f"loading signature from {args.abundances_from}, keeping abundances")
        abund_sig = sourmash_args.load_one_signature(
            args.abundances_from, ksize=args.ksize, select_moltype=moltype
        )
        if not abund_sig.minhash.track_abundance:
            error("--track-abundance not set on loaded signature?! exiting.")
            sys.exit(-1)

        intersect_mh = intersect_mh.inflate(abund_sig.minhash)

    intersect_sigobj = sourmash.SourmashSignature(intersect_mh, name=args.set_name or "")
    intersect_sigobj._name = args.set_name

    with sourmash_args.SaveSignaturesToLocation(args.output) as save_sigs:
        save_sigs.add(intersect_sigobj)

    notify(f"loaded and intersected {len(progress)} signatures")
    if picklist:
        sourmash_args.report_picklist(args, picklist)


def inflate(args):
    "Inflate (add abundances to) signatures from the first signature."
    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)

    inflate_sig = sourmash_args.load_query_signature(
        args.signature_from, ksize=args.ksize, select_moltype=moltype
    )
    inflate_from_mh = inflate_sig.minhash
    ksize = inflate_from_mh.ksize
    moltype = inflate_from_mh.moltype

    if not inflate_from_mh.track_abundance:
        error(f"ERROR: signature '{inflate_sig.name}' from ")
        error(f"file '{args.signature_from}' has no abundances.")
        sys.exit(-1)

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.other_sigs,
        ksize=ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
    )

    with sourmash_args.SaveSignaturesToLocation(args.output) as save_sigs:
        for sigobj, sigloc in loader:
            inflated_mh = sigobj.minhash.inflate(inflate_from_mh)
            inflated_sigobj = sourmash.SourmashSignature(
                inflated_mh, name=sigobj.name
            )
            save_sigs.add(inflated_sigobj)

    if len(progress) == 0:
        error("no signatures to inflate!?")
        sys.exit(-1)

    notify(f"loaded and intersected {len(save_sigs)} signatures")
    if picklist:
        sourmash_args.report_picklist(args, picklist)


def subtract(args):
    "Subtract one or more signatures from another."
    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)

    from_sigobj = sourmash_args.load_one_signature(
        args.signature_from, ksize=args.ksize, select_moltype=moltype
    )

    if args.abundances_from:
        args.flatten = True

    from_mh = from_sigobj.minhash
    if from_mh.track_abundance and not args.flatten:
        error("Cannot use subtract on signatures with abundance tracking, sorry!")
        sys.exit(1)

    subtract_mins = set(from_mh.hashes)

    notify(f"loaded signature from {args.signature_from}...", end="\r")

    progress = sourmash_args.SignatureLoadingProgress()

    for sigfile in args.subtraction_sigs:
        for sigobj in sourmash_args.load_file_as_signatures(
            sigfile, ksize=args.ksize, select_moltype=moltype, progress=progress
        ):
            if not sigobj.minhash.is_compatible(from_mh):
                error("incompatible minhashes; specify -k and/or molecule type.")
                sys.exit(-1)

            if sigobj.minhash.track_abundance and not args.flatten:
                error(
                    "Cannot use subtract on signatures with abundance tracking, sorry!"
                )
                sys.exit(1)

            subtract_mins -= set(sigobj.minhash.hashes)

            notify(f"loaded and subtracted signatures from {sigfile}...", end="\r")

    if not len(progress):
        error("no signatures to subtract!?")
        sys.exit(-1)

    subtract_mh = from_sigobj.minhash.copy_and_clear().flatten().to_mutable()
    subtract_mh.add_many(subtract_mins)

    if args.abundances_from:
        notify(f"loading signature from {args.abundances_from}, keeping abundances")
        abund_sig = sourmash_args.load_one_signature(
            args.abundances_from, ksize=args.ksize, select_moltype=moltype
        )
        if not abund_sig.minhash.track_abundance:
            error("--track-abundance not set on loaded signature?! exiting.")
            sys.exit(-1)

        subtract_mh = subtract_mh.inflate(abund_sig.minhash)

    subtract_sigobj = sourmash.SourmashSignature(subtract_mh, name=args.set_name or "")
    subtract_sigobj._name = args.set_name

    with sourmash_args.SaveSignaturesToLocation(args.output) as save_sigs:
        save_sigs.add(subtract_sigobj)

    notify(f"loaded and subtracted {len(progress)} signatures")


def rename(args):
    "Rename one or more signatures."
    set_quiet(args.quiet, args.quiet)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    pattern_search = sourmash_args.load_include_exclude_db_patterns(args)
    _extend_signatures_with_from_file(args)

    save_sigs = sourmash_args.SaveSignaturesToLocation(args.output)
    save_sigs.open()

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.signatures,
        ksize=args.ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
        pattern=pattern_search,
    )

    for sigobj, sigloc in loader:
        sigobj = sigobj.to_mutable()
        sigobj._name = args.name
        save_sigs.add(sigobj)

    save_sigs.close()

    notify(f"set name to '{args.name}' on {len(save_sigs)} signatures")
    if picklist:
        sourmash_args.report_picklist(args, picklist)


def extract(args):
    "Extract signatures matching filters."
    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    pattern_search = sourmash_args.load_include_exclude_db_patterns(args)
    _extend_signatures_with_from_file(args)

    filter_fn = None
    if args.md5 is not None or args.name is not None:

        def filter_fn(row):
            keep = False
            if args.name:
                name = row["name"] or row["filename"]
                if args.name in name:
                    keep = True
            if args.md5 and args.md5 in row["md5"]:
                keep = True
            return keep

    save_sigs = sourmash_args.SaveSignaturesToLocation(args.output)
    save_sigs.open()

    total_rows_examined = 0
    for filename in args.signatures:
        idx = sourmash_args.load_file_as_index(filename, yield_all_files=args.force)
        idx = idx.select(ksize=args.ksize, moltype=moltype)
        idx = sourmash_args.apply_picklist_and_pattern(idx, picklist, pattern_search)

        manifest = sourmash_args.get_manifest(idx)
        total_rows_examined += len(manifest)

        if filter_fn and not pattern_search:
            sub_manifest = manifest.filter_rows(filter_fn)
            sub_picklist = sub_manifest.to_picklist()

            try:
                idx = idx.select(picklist=sub_picklist)
            except ValueError:
                error(
                    "** This input collection doesn't support 'extract' with picklists or patterns."
                )
                error("** EXITING.")
                error("**")
                error("** You can use 'sourmash sig cat' with a picklist or pattern,")
                error("** and then pipe the output to 'sourmash sig extract")
                sys.exit(-1)

        for ss in idx.signatures():
            save_sigs.add(ss)

    notify(f"loaded {total_rows_examined} total that matched ksize & molecule type")
    save_sigs.close()

    if not save_sigs:
        error("no matching signatures to save!")
        sys.exit(-1)

    notify(f"extracted {len(save_sigs)} signatures from {len(args.signatures)} file(s)")

    if picklist:
        sourmash_args.report_picklist(args, picklist)


def filter(args):
    "Filter hashes by abundance in all of the signatures."
    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)

    progress = sourmash_args.SignatureLoadingProgress()

    save_sigs = sourmash_args.SaveSignaturesToLocation(args.output)
    save_sigs.open()

    for filename in args.signatures:
        siglist = sourmash_args.load_file_as_signatures(
            filename, ksize=args.ksize, select_moltype=moltype, progress=progress
        )
        siglist = list(siglist)

        if args.md5 is not None:
            siglist = [ss for ss in siglist if args.md5 in ss.md5sum()]
        if args.name is not None:
            siglist = [ss for ss in siglist if args.name in str(ss)]

        for ss in siglist:
            mh = ss.minhash
            if not mh.track_abundance:
                notify(f"ignoring signature {ss} - track_abundance not set.")
                continue

            abunds = mh.hashes
            abunds2 = {}
            for k, v in abunds.items():
                if v >= args.min_abundance:
                    if args.max_abundance is None or v <= args.max_abundance:
                        abunds2[k] = v

            filtered_mh = mh.copy_and_clear().to_mutable()
            filtered_mh.set_abundances(abunds2)

            ss = ss.to_mutable()
            ss.minhash = filtered_mh

            save_sigs.add(ss)

    save_sigs.close()

    notify(f"loaded {len(progress)} total that matched ksize & molecule type")
    notify(f"extracted {len(save_sigs)} signatures from {len(args.signatures)} file(s)")


def flatten(args):
    "Flatten one or more signatures, removing abundances."
    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    _extend_signatures_with_from_file(args)

    save_sigs = sourmash_args.SaveSignaturesToLocation(args.output)
    save_sigs.open()

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.signatures,
        ksize=args.ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
    )
    for ss, sigloc in loader:
        if args.md5 is not None:
            if args.md5 not in ss.md5sum():
                continue
        if args.name is not None:
            if args.name not in ss.name:
                continue

        ss = ss.to_mutable()
        ss.minhash = ss.minhash.flatten()
        save_sigs.add(ss)

    save_sigs.close()

    notify(f"loaded {len(progress)} total that matched ksize & molecule type")
    notify(f"extracted {len(save_sigs)} signatures from {len(args.signatures)} file(s)")
    if picklist:
        sourmash_args.report_picklist(args, picklist)


def downsample(args):
    "Downsample num and scaled signatures; also interconvert."
    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    _extend_signatures_with_from_file(args)

    if not args.num_hashes and not args.scaled:
        error("ERROR: must specify either --num or --scaled value")
        sys.exit(-1)

    if args.num_hashes and args.scaled:
        error("ERROR: cannot specify both --num and --scaled")
        sys.exit(-1)

    save_sigs = sourmash_args.SaveSignaturesToLocation(args.output)
    save_sigs.open()

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.signatures,
        ksize=args.ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
    )
    for ss, sigloc in loader:
        sigobj = ss.to_mutable()
        mh = sigobj.minhash

        if args.scaled:
            args_scaled = int(args.scaled)
            if mh.scaled:
                mh_new = mh.downsample(scaled=args_scaled)
            else:
                max_hash = _get_max_hash_for_scaled(args_scaled)
                mins = mh.hashes
                if max(mins) < max_hash:
                    raise ValueError(
                        "this num MinHash does not have enough hashes to convert it into a scaled MinHash."
                    )
                mh_new = mh.copy().to_mutable()
                _set_num_scaled(mh_new, 0, args_scaled)
        elif args.num_hashes:
            if mh.num:
                mh_new = mh.downsample(num=args.num_hashes)
            else:
                if len(mh) < args.num_hashes:
                    raise ValueError(f"this scaled MinHash has only {len(mh)} hashes")
                mh_new = mh.copy().to_mutable()
                _set_num_scaled(mh_new, args.num_hashes, 0)

        sigobj.minhash = mh_new
        save_sigs.add(sigobj)

    save_sigs.close()

    notify(f"loaded {len(progress)} signatures")
    notify(f"output {len(save_sigs)} downsampled signatures", len(save_sigs))
    if picklist:
        sourmash_args.report_picklist(args, picklist)


def ingest(args):
    """Import signatures from mash JSON or CSV into sourmash format
    (reference `sig/__main__.py:1002-1056`)."""
    import json

    set_quiet(args.quiet)

    siglist = []
    if args.csv:
        for filename in args.filenames:
            with open(filename, newline="") as csv_fp:
                reader = csv.reader(csv_fp)
                siglist = []
                for row in reader:
                    hashfn = row[0]
                    hashseed = int(row[1])
                    assert hashfn == "murmur64"
                    assert hashseed == 42
                    _, _, ksize, name, hashes = row
                    ksize = int(ksize)
                    hashes = [int(x) for x in hashes.strip().split(" ")]
                    e = MinHash(len(hashes), ksize)
                    e.add_many(hashes)
                    s = sourmash.SourmashSignature(e, filename=name)
                    siglist.append(s)
                    notify(f"loaded signature: {name} {s.md5sum()[:8]}")
    else:
        for filename in args.filenames:
            with open(filename) as fp:
                x = json.loads(fp.read())
            ksize = x["kmer"]
            num = x["sketchSize"]
            assert x["hashType"] == "MurmurHash3_x64_128"
            assert x["hashBits"] == 64
            assert x["hashSeed"] == 42
            hashes = x["sketches"][0]["hashes"]
            mh = MinHash(ksize=ksize, n=num, is_protein=False)
            mh.add_many(hashes)
            siglist.append(sourmash.SourmashSignature(mh, filename=filename))

    notify(f"saving {len(siglist)} signatures to JSON")
    with sourmash_args.SaveSignaturesToLocation(args.output) as save_sigs:
        save_sigs.add_many(siglist)


def export(args):
    """Export a signature to mash-style JSON (reference
    `sig/__main__.py:1059-1084`)."""
    import json

    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)

    query = sourmash_args.load_query_signature(
        args.filename, ksize=args.ksize, select_moltype=moltype, select_md5=args.md5
    )
    mh = query.minhash

    x = {}
    x["kmer"] = mh.ksize
    x["sketchSize"] = len(mh)
    x["hashType"] = "MurmurHash3_x64_128"
    x["hashBits"] = 64
    x["hashSeed"] = mh.seed
    x["sketches"] = [{"hashes": list(mh.hashes)}]

    with sourmash_args.FileOutput(args.output, "wt") as fp:
        print(json.dumps(x), file=fp)
    notify(f"exported signature {query} ({query.md5sum()[:8]})")


def kmers(args):
    """Retrieve k-mers/sequences matching the hashes of given sketches
    (reference `sig/__main__.py:1087-1340`)."""
    from ..search import format_bp
    from .. import sequence_io

    set_quiet(args.quiet)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    _extend_signatures_with_from_file(args)

    first_sig = None
    query_mh = None

    progress = sourmash_args.SignatureLoadingProgress()
    loader = sourmash_args.load_many_signatures(
        args.signatures,
        ksize=args.ksize,
        moltype=moltype,
        picklist=picklist,
        progress=progress,
        yield_all_files=args.force,
        force=args.force,
    )

    for sigobj, sigloc in loader:
        if first_sig is None:
            first_sig = sigobj
            query_mh = first_sig.minhash.copy_and_clear()
            query_mh.track_abundance = False
        try:
            sigobj_mh = sigobj.minhash.to_mutable()
            sigobj_mh.track_abundance = False
            query_mh.merge(sigobj_mh)
        except (TypeError, ValueError) as exc:
            error(
                f"ERROR when merging signature '{sigobj}' ({sigobj.md5sum()[:8]}) from file {sigloc}"
            )
            error(str(exc))
            sys.exit(-1)

    if not len(progress):
        error("no signatures in query!?")
        sys.exit(-1)

    notify(f"loaded and merged {len(progress)} signatures")
    if picklist:
        sourmash_args.report_picklist(args, picklist)

    if query_mh.moltype == "DNA" and args.translate:
        error("ERROR: cannot use --translate with DNA sketches.")
        sys.exit(-1)

    if not query_mh:
        notify("ERROR: no hashes in query signature!?")
        sys.exit(-1)

    notify("")
    notify("merged signature has the following properties:")
    notify(
        f"k={query_mh.ksize} molecule={query_mh.moltype} num={query_mh.num} scaled={query_mh.scaled} seed={query_mh.seed}"
    )
    notify(f"total hashes in merged signature: {len(query_mh)}")
    notify("")
    notify("now processing sequence files for matches!")

    found_mh = query_mh.copy_and_clear()

    save_kmers = None
    kmer_w = None
    if args.save_kmers:
        save_kmers = sourmash_args.FileOutputCSV(args.save_kmers)
        save_kmers.open()
        kmer_w = csv.DictWriter(
            save_kmers.fp,
            fieldnames=["sequence_file", "sequence_name", "kmer", "hashval"],
        )
        kmer_w.writeheader()

    save_seqs = None
    if args.save_sequences:
        save_seqs = sourmash_args.FileOutput(args.save_sequences)
        save_seqs.open()

    is_protein = False
    if query_mh.moltype != "DNA" and not args.translate:
        is_protein = True

    n_files_searched = 0
    n_sequences_searched = 0
    n_bp_searched = 0
    n_kmers_found = 0
    n_sequences_found = 0
    n_bp_saved = 0

    progress_threshold = 1e6
    progress_interval = 1e6
    query_hash_set = set(query_mh.hashes)
    for filename in args.sequences:
        notify(f"opening sequence file '{filename}'")
        n_files_searched += 1

        for name, seq_bytes in sequence_io.iter_records_bytes(filename):
            sequence = seq_bytes.decode("ascii")
            seq_mh = query_mh.copy_and_clear()

            if is_protein:
                seq_mh.add_protein(sequence)
            else:
                try:
                    seq_mh.add_sequence(sequence, not args.check_sequence)
                except ValueError as exc:
                    seqname = name
                    if len(seqname) > 40:
                        seqname = seqname[:37] + "..."
                    notify(f"ERROR in sequence '{seqname}', file '{filename}'")
                    notify(str(exc))
                    if args.force:
                        notify("(continuing)")
                        continue
                    else:
                        sys.exit(-1)

            if seq_mh.intersection(query_mh):
                if save_seqs:
                    save_seqs.fp.write(f">{name}\n{sequence}\n")
                    n_sequences_found += 1
                    n_bp_saved += len(sequence)

                if kmer_w:
                    kh_iter = seq_mh.kmers_and_hashes(
                        sequence, force=False, is_protein=is_protein
                    )
                    for kmer, hashval in kh_iter:
                        if hashval in query_hash_set:
                            found_mh.add_hash(hashval)
                            n_kmers_found += 1
                            kmer_w.writerow(
                                dict(
                                    sequence_file=filename,
                                    sequence_name=name,
                                    kmer=kmer,
                                    hashval=hashval,
                                )
                            )

                found_mh += seq_mh.intersection(query_mh)

            n_sequences_searched += 1
            n_bp_searched += len(sequence)

            if n_bp_searched >= progress_threshold:
                notify(
                    f"... searched {n_bp_searched} from {n_files_searched} files so far"
                )
                while n_bp_searched >= progress_threshold:
                    progress_threshold += progress_interval

    if save_kmers:
        save_kmers.close()
    if save_seqs:
        save_seqs.close()

    if not n_sequences_searched:
        notify("ERROR: no sequences searched!?")
        sys.exit(-1)

    notify("DONE.")
    notify(
        f"searched {n_sequences_searched} sequences from {n_files_searched} files, containing a total of {format_bp(n_bp_searched)}."
    )

    if save_seqs:
        notify(
            f"matched and saved a total of {n_sequences_found} sequences with {format_bp(n_bp_saved)}."
        )
    if kmer_w:
        notify(f"matched and saved a total of {n_kmers_found} k-mers.")

    query_hashes = set(query_mh.hashes)
    found_hashes = set(found_mh.hashes)
    cont = len(query_hashes.intersection(found_hashes)) / len(query_hashes)

    notify(f"found {len(found_mh)} distinct matching hashes ({cont * 100:.1f}%)")

    if not kmer_w and not save_seqs:
        notify("NOTE: see --save-kmers or --save-sequences for output options.")


from collections import namedtuple, Counter

_SketchInfo = namedtuple("_SketchInfo", "ksize, moltype, scaled, num, abund")


def _summarize_manifest(manifest):
    "Summary dict of sketch types in a manifest (reference :1283-1313)."
    info_d = {}
    total_size = 0
    counter = Counter()
    hashcounts = Counter()
    for row in manifest.rows:
        ski = _SketchInfo(
            ksize=row["ksize"],
            moltype=row["moltype"],
            scaled=row["scaled"],
            num=row["num"],
            abund=row["with_abundance"],
        )
        counter[ski] += 1
        hashcounts[ski] += row["n_hashes"]
        total_size += row["n_hashes"]

    info_d["total_hashes"] = total_size
    sketch_info = []
    for ski, count in counter.items():
        sketch_d = dict(ski._asdict())
        sketch_d["count"] = count
        sketch_d["n_hashes"] = hashcounts[ski]
        sketch_info.append(sketch_d)
    info_d["sketch_info"] = sketch_info
    return info_d


def fileinfo(args):
    """Summary information on a signature collection/index (reference
    `sig/__main__.py:1343-1409`). Aliased as 'summarize'."""
    import json

    set_quiet(args.quiet, args.debug)

    text_out = not args.json_out

    try:
        notify(f"** loading from '{args.path}'")
        idx = sourmash_args.load_file_as_index(args.path, yield_all_files=args.force)
    except ValueError:
        error(f"Cannot open '{args.path}' as a sourmash signature collection.")
        error("Use -d/--debug for details.")
        sys.exit(-1)

    def print_bool(x):
        return "yes" if x else "no"

    info_d = {}
    info_d["path_filetype"] = type(idx).__name__
    info_d["location"] = "" if not idx.location else idx.location
    info_d["is_database"] = bool(idx.is_database)
    info_d["has_manifest"] = bool(idx.manifest)
    info_d["num_sketches"] = len(idx)

    if text_out:
        print_results(f"path filetype: {info_d['path_filetype']}")
        print_results(f"location: {info_d['location']}")
        print_results(f"is database? {print_bool(info_d['is_database'])}")
        print_results(f"has manifest? {print_bool(info_d['has_manifest'])}")
        print_results(f"num signatures: {info_d['num_sketches']}")

    notify("** examining manifest...")

    manifest = sourmash_args.get_manifest(
        idx, rebuild=args.rebuild_manifest, require=False
    )

    if manifest is None:
        notify("** no manifest and cannot be generated; exiting.")
        sys.exit(0)

    info_d.update(_summarize_manifest(manifest))

    if text_out:
        print_results(f"total hashes: {info_d['total_hashes']}")
        print_results("summary of sketches:")
        for ski in info_d["sketch_info"]:
            mh_type = f"num={ski['num']}" if ski["num"] else f"scaled={ski['scaled']}"
            mh_abund = ", abund" if ski["abund"] else ""
            sketch_str = f"{ski['count']} sketches with {ski['moltype']}, k={ski['ksize']}, {mh_type}{mh_abund}"
            print_results(f"   {sketch_str: <50} {ski['n_hashes']} total hashes")
    else:
        print(json.dumps(info_d))


# alias, reference cli aliases 'summarize' to fileinfo
summarize = fileinfo


def check(args):
    """Check signature db(s) against a picklist (reference
    `sig/__main__.py:1412-1550`)."""
    from ..picklist import PickStyle
    from ..manifest import CollectionManifest

    set_quiet(args.quiet, args.debug)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    sourmash_args.load_include_exclude_db_patterns(args)
    _extend_signatures_with_from_file(args)

    if not picklist:
        error("** No picklist provided?! Exiting.")
        sys.exit(-1)

    if picklist.pickstyle == PickStyle.EXCLUDE and args.output_missing:
        error("** ERROR: Cannot use an 'exclude' picklist with '-o/--output-missing'")
        sys.exit(-1)

    require_manifest = not args.no_require_manifest

    if args.abspath and args.relpath:
        error("** Cannot specify both --abspath and --relpath; pick one!")
        sys.exit(-1)

    if args.relpath or args.abspath and not args.save_manifest_matching:
        notify(
            "** WARNING: --abspath and --relpath only have effects when saving a manifest"
        )

    relpath = "."
    if args.relpath and args.save_manifest_matching:
        output_manifest_dir = os.path.dirname(args.save_manifest_matching)
        relpath = os.path.relpath(os.curdir, output_manifest_dir)

    total_manifest_rows = CollectionManifest([])

    total_rows_examined = 0
    for filename in args.signatures:
        if args.abspath:
            new_iloc = os.path.abspath(filename)
        elif args.relpath:
            if filename.startswith("/"):
                notify(
                    f"** WARNING: cannot convert abspath {filename} into relative path."
                )
            new_iloc = os.path.join(relpath, filename)
        else:
            new_iloc = filename

        idx = sourmash_args.load_file_as_index(filename, yield_all_files=args.force)
        idx = idx.select(ksize=args.ksize, moltype=moltype)

        if idx.manifest is None and require_manifest:
            error(f"ERROR on filename '{filename}'.")
            error("sig check requires a manifest by default, but no manifest present.")
            error("specify --no-require-manifest to dynamically generate one.")
            sys.exit(-1)

        new_manifest = sourmash_args.get_manifest(idx, require=True)
        sub_manifest = new_manifest.select_to_manifest(picklist=picklist)
        total_rows_examined += len(new_manifest)

        for row in sub_manifest.rows:
            row = dict(row)
            row["internal_location"] = new_iloc
            total_manifest_rows.add_row(row)

    notify(f"loaded {total_rows_examined} signatures.")

    sourmash_args.report_picklist(args, picklist)

    n_missing = len(picklist.pickset - picklist.found)
    if args.output_missing and n_missing:
        pickfile = picklist.pickfile
        n_input = 0
        n_output = 0
        with sourmash_args.FileInputCSV(pickfile) as r:
            with open(args.output_missing, "w", newline="") as outfp:
                w = csv.DictWriter(outfp, fieldnames=r.fieldnames)
                w.writeheader()
                for row in r:
                    n_input += 1
                    if not picklist.matched_csv_row(row):
                        n_output += 1
                        w.writerow(row)
        notify(
            f"saved {n_output} non-matching rows of {n_input} picklist rows to '{args.output_missing}'"
        )
    elif args.output_missing:
        notify(
            f"(no remaining picklist entries; not saving to '{args.output_missing}')"
        )

    if args.save_manifest_matching and total_manifest_rows:
        mf = total_manifest_rows
        mf.write_to_filename(
            args.save_manifest_matching, database_format=args.manifest_format
        )
        notify(
            f"wrote {len(mf)} matching manifest rows to '{args.save_manifest_matching}'"
        )
    elif args.save_manifest_matching:
        notify(
            f"(not saving matching manifest to '{args.save_manifest_matching}' because no matches)"
        )

    if args.fail_if_missing and n_missing:
        error("** ERROR: missing values, and --fail-if-missing requested. Exiting.")
        sys.exit(-1)


def collect(args):
    """Collect signature metadata across many locations into one manifest
    (reference `sig/__main__.py:1553-1667`)."""
    from ..manifest import CollectionManifest

    set_quiet(False, args.debug)

    if os.path.exists(args.output):
        if not args.merge_previous:
            error(f"ERROR: '{args.output}' already exists!")
            error("ERROR: please remove it, or use --merge-previous to merge")
            sys.exit(-1)
    elif args.merge_previous:
        notify(
            f"WARNING: --merge-previous specified, but output file '{args.output}' does not already exist?"
        )

    if args.abspath and args.relpath:
        error("** Cannot specify both --abspath and --relpath; pick one!")
        sys.exit(-1)

    try:
        if args.manifest_format == "sql":
            from ..index.sqlite_index import SqliteCollectionManifest

            if args.merge_previous:
                collected_mf = SqliteCollectionManifest.create_or_open(args.output)
            else:
                collected_mf = SqliteCollectionManifest.create(args.output)
        else:
            assert args.manifest_format == "csv"
            if args.merge_previous and os.path.exists(args.output):
                collected_mf = CollectionManifest.load_from_filename(args.output)
            else:
                collected_mf = CollectionManifest()
            if not isinstance(collected_mf, CollectionManifest):
                raise Exception
    except Exception:
        error(
            f"ERROR loading '{args.output}' with --merge-previous. Is it of type {args.manifest_format}?"
        )
        sys.exit(-1)

    if args.merge_previous:
        notify(f"merging new locations with {len(collected_mf)} previous rows.")

    require_manifest = not args.no_require_manifest

    _extend_signatures_with_from_file(args, target_attr="locations")

    relpath = None
    if args.relpath:
        output_manifest_dir = os.path.dirname(args.output)
        relpath = os.path.relpath(os.curdir, output_manifest_dir)

    for n_files, loc in enumerate(args.locations):
        notify(f"Loading signature information from {loc}.")
        if n_files and n_files % 100 == 0:
            notify(f"... loaded {len(collected_mf)} sigs from {n_files} files")
        idx = sourmash.load_file_as_index(loc)
        if idx.manifest is None and require_manifest:
            error(f"ERROR on location '{loc}'")
            error(
                "sig collect requires a manifest by default, but no manifest present."
            )
            error("specify --no-require-manifest to dynamically generate one.")
            sys.exit(-1)

        mf = sourmash_args.get_manifest(idx)

        if args.abspath:
            new_iloc = os.path.abspath(loc)
        elif args.relpath:
            if loc.startswith("/"):
                notify(f"** WARNING: cannot convert abspath {loc} into relative path.")
            new_iloc = os.path.join(relpath, loc)
        else:
            new_iloc = loc

        for row in mf.rows:
            row = dict(row)
            row["internal_location"] = new_iloc
            collected_mf.add_row(row)

    if args.manifest_format == "csv":
        collected_mf.write_to_filename(
            args.output, database_format="csv", ok_if_exists=args.merge_previous
        )
    else:
        collected_mf.close()

    notify(f"saved {len(collected_mf)} manifest rows to '{args.output}'")
    return 0


def grep(args):
    """Extract signatures matching a name/filename/md5 pattern (reference
    `sig/grep.py:14-139`)."""
    import re

    from ..manifest import CollectionManifest

    set_quiet(args.quiet, args.debug)
    moltype = sourmash_args.calculate_moltype(args)
    picklist = sourmash_args.load_picklist(args)
    _extend_signatures_with_from_file(args)

    pattern = args.pattern
    if args.ignore_case:
        pattern = re.compile(pattern, re.IGNORECASE)
    else:
        pattern = re.compile(pattern)

    if args.invert_match:

        def search_pattern(vals):
            return all(not pattern.search(val) for val in vals)

    else:

        def search_pattern(vals):
            return any(pattern.search(val) for val in vals)

    require_manifest = not args.no_require_manifest

    if args.count:
        args.silent = True

    if args.silent:
        notify("(no signatures will be saved because of --silent/--count).")
        save_sigs = sourmash_args.SaveSignaturesToLocation(None)
    else:
        notify(f"saving matching signatures to '{args.output}'")
        save_sigs = sourmash_args.SaveSignaturesToLocation(args.output)
        save_sigs.open()

    csv_obj = None
    if args.csv:
        csv_obj = sourmash_args.FileOutputCSV(args.csv)
        csv_fp = csv_obj.open()
        CollectionManifest.write_csv_header(csv_fp)

    total_rows_examined = 0
    for filename in args.signatures:
        idx = sourmash_args.load_file_as_index(filename, yield_all_files=args.force)
        idx = idx.select(ksize=args.ksize, moltype=moltype, picklist=picklist)

        manifest = idx.manifest
        if manifest is None:
            if require_manifest:
                error(f"ERROR on filename '{filename}'.")
                error(
                    "sig grep requires a manifest by default, but no manifest present."
                )
                error("specify --no-require-manifest to dynamically generate one.")
                sys.exit(-1)
            else:
                manifest = sourmash_args.get_manifest(idx, require=False)

        sub_manifest = manifest.filter_on_columns(
            search_pattern, ["name", "filename", "md5"]
        )
        total_rows_examined += len(manifest)

        if args.csv:
            sub_manifest.write_to_csv(csv_fp)

        if args.count:
            print_results(f"{len(sub_manifest)} matches: {filename}")
        elif not args.silent:
            sub_picklist = sub_manifest.to_picklist()
            try:
                idx = idx.select(picklist=sub_picklist)
            except ValueError:
                error("** This input collection doesn't support 'grep' with picklists.")
                error("** EXITING.")
                error("**")
                error("** You can use 'sourmash sig cat' with a picklist,")
                error("** and then pipe the output to 'sourmash sig grep -")
                sys.exit(-1)

            for ss in idx.signatures():
                save_sigs.add(ss)

    if not args.silent:
        notify(f"loaded {total_rows_examined} total that matched ksize & molecule type")
        if save_sigs:
            notify(
                f"extracted {len(save_sigs)} signatures from {len(args.signatures)} file(s)"
            )
            save_sigs.close()
        else:
            error("no matching signatures found!")
            sys.exit(-1)

    if args.csv:
        notify(f"wrote manifest containing all matches to CSV file '{args.csv}'")
        csv_obj.close()

    if picklist:
        sourmash_args.report_picklist(args, picklist)
