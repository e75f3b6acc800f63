"""Batched DNA k-mer sketching ops (Kernel A of the TPU design).

Replaces the reference per-k-mer hot loop (`SeqToHashes::next`,
`/root/reference/src/core/src/signature.rs:246-306`, plus
`add_hash_with_abundance`, `sketch/minhash.rs:309-383`) with one fused
device pass per chunk:

- window byte columns are *shifted slices* of the sequence (and of its
  complement), never a materialized [N, k] matrix;
- canonical strand selection compares 8-byte groups as big-endian u64
  lanes (≤ ceil(k/8) compares) instead of per-byte scans;
- murmur64 runs on the selected column lanes;
- the scaled threshold keeps ~1/scaled of windows, which are compacted
  with a cumsum+scatter into a small fixed-size output — no O(N log N)
  sort of the full window array.

Record boundaries are handled by joining records with (k-1) 'N' separator
bytes: windows spanning a boundary contain an invalid byte and are dropped,
which reproduces per-record iteration semantics exactly.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
from sourmash_tpu.ops import default_backend as _ops_default_backend
import jax.numpy as jnp
from jax import lax

from .murmur import C1, C2, F1, F2, M5, N1, N2

# --- host-side tables (shared with encodings) ----------------------------

from .encodings import COMPLEMENT, VALID_DNA, UPPER  # noqa: F401

MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rotl(x, r: int):
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix64(k):
    s33 = np.uint64(33)
    k = k ^ (k >> s33)
    k = k * F1
    k = k ^ (k >> s33)
    k = k * F2
    k = k ^ (k >> s33)
    return k


def _murmur_cols(col, L: int, seed: int, n: int):
    """MurmurHash3 x64_128 first word over n parallel byte streams.

    col(i) -> [n] uint64 lane holding byte i of every window.
    """
    h1 = jnp.full((n,), np.uint64(seed), dtype=jnp.uint64)
    h2 = jnp.full((n,), np.uint64(seed), dtype=jnp.uint64)

    def le64(base):
        acc = col(base)
        for i in range(1, 8):
            acc = acc | (col(base + i) << np.uint64(8 * i))
        return acc

    nblocks = L // 16
    for blk in range(nblocks):
        base = blk * 16
        k1 = le64(base)
        k2 = le64(base + 8)

        k1 = k1 * C1
        k1 = _rotl(k1, 31)
        k1 = k1 * C2
        h1 = h1 ^ k1
        h1 = _rotl(h1, 27)
        h1 = h1 + h2
        h1 = h1 * M5 + N1

        k2 = k2 * C2
        k2 = _rotl(k2, 33)
        k2 = k2 * C1
        h2 = h2 ^ k2
        h2 = _rotl(h2, 31)
        h2 = h2 + h1
        h2 = h2 * M5 + N2

    t = L & 15
    base = nblocks * 16
    if t > 8:
        k2 = jnp.zeros((n,), dtype=jnp.uint64)
        for i in range(t - 1, 7, -1):
            k2 = k2 ^ (col(base + i) << np.uint64(8 * (i - 8)))
        k2 = k2 * C2
        k2 = _rotl(k2, 33)
        k2 = k2 * C1
        h2 = h2 ^ k2
    if t > 0:
        k1 = jnp.zeros((n,), dtype=jnp.uint64)
        for i in range(min(t, 8) - 1, -1, -1):
            k1 = k1 ^ (col(base + i) << np.uint64(8 * i))
        k1 = k1 * C1
        k1 = _rotl(k1, 31)
        k1 = k1 * C2
        h1 = h1 ^ k1

    ln = np.uint64(L)
    h1 = h1 ^ ln
    h2 = h2 ^ ln
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    return h1


def _window_hash_pairs(seq, n: int, ksize: int, seed: int):
    """Canonical window hashes + validity, in 32-bit limb arithmetic.

    seq: [S] uint8 (uppercased); returns ((hi, lo) [n] uint32 pair,
    valid [n] bool). The TPU has no native u64 datapath, so the whole
    pipeline stays in uint32 lanes (see ops/murmur32.py).
    """
    from .murmur32 import murmur_cols32

    comp = jnp.asarray(COMPLEMENT)[seq].astype(jnp.uint32)
    squ = seq.astype(jnp.uint32)

    def fcol(j):
        return lax.slice(squ, (j,), (j + n,))

    def rcol(j):
        # revcomp-window byte j = complement(seq[i + k-1-j])
        return lax.slice(comp, (ksize - 1 - j,), (ksize - 1 - j + n,))

    # canonical strand: fwd <= rc on the k bytes, compared in 4-byte
    # big-endian uint32 groups (bytes past k pad as zero on both sides).
    G = -(-ksize // 4)

    def be_group(colf, t):
        acc = jnp.zeros((n,), dtype=jnp.uint32)
        for j in range(4):
            b = t * 4 + j
            if b < ksize:
                acc = acc | (colf(b) << np.uint32(8 * (3 - j)))
        return acc

    use_fwd = jnp.ones((n,), dtype=bool)
    for t in reversed(range(G)):
        gf = be_group(fcol, t)
        gr = be_group(rcol, t)
        use_fwd = (gf < gr) | ((gf == gr) & use_fwd)

    def ccol(j):
        return jnp.where(use_fwd, fcol(j), rcol(j))

    h_pair = murmur_cols32(ccol, ksize, seed, n)

    valid_pos = jnp.asarray(VALID_DNA)[seq]
    bad = (~valid_pos).astype(jnp.int32)
    cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(bad)])
    valid = (cs[ksize:] - cs[:-ksize]) == 0
    return h_pair, valid


def _window_hashes(seq, n: int, ksize: int, seed: int):
    "Compat wrapper: uint64 hashes + validity (packs the u32 limb pair)."
    from .murmur32 import le64_pair

    h_pair, valid = _window_hash_pairs(seq, n, ksize, seed)
    return le64_pair(*h_pair), valid


def _use_pallas_default():
    """Pallas kernel on real TPU backends; XLA path elsewhere.
    Overridable with SOURMASH_PALLAS=1/0."""
    import os

    env = os.environ.get("SOURMASH_PALLAS")
    if env is not None:
        return env not in ("0", "false", "no")
    try:
        from sourmash_tpu.ops import default_backend

        return default_backend() not in ("cpu",)
    except Exception:
        return False


def _compact_keep(keep, h_hi, h_lo, cap: int):
    """Compact surviving (hi, lo) hash pairs into the first n_valid slots of
    a [cap] uint64 output (MAX_U64-padded), preserving window order.

    Scatter-free: output slot j gathers the window whose inclusive keep-
    cumsum first reaches j+1 (a vectorized binary search). TPU scatters
    serialize (~3x slower than this searchsorted+gather on v5e).
    """
    from .murmur32 import le64_pair

    n = keep.shape[0]
    cs = jnp.cumsum(keep.astype(jnp.int32))
    n_valid = cs[-1]
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(cs, targets, side="left")
    idxc = jnp.minimum(idx, n - 1)
    gh = h_hi[idxc]
    gl = h_lo[idxc]
    ok = targets <= n_valid
    gh = jnp.where(ok, gh, np.uint32(0xFFFFFFFF))
    gl = jnp.where(ok, gl, np.uint32(0xFFFFFFFF))
    return le64_pair(gh, gl), n_valid


def _window_validity(seq, n: int, ksize: int):
    valid_pos = jnp.asarray(VALID_DNA)[seq]
    bad = (~valid_pos).astype(jnp.int32)
    cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(bad)])
    return (cs[ksize:] - cs[:-ksize]) == 0


@functools.partial(
    jax.jit, static_argnames=("ksize", "seed", "cap", "use_pallas")
)
def _seq_to_compact_hashes(
    seq, max_hash, ksize: int, seed: int, cap: int, use_pallas: bool = False
):
    """Fused sketch kernel: bytes -> compacted surviving hashes.

    Returns (out [cap] uint64 — surviving hashes in window order, padded
    with MAX_U64 — and n_valid). If n_valid > cap the output is truncated
    (caller retries with a bigger cap). Everything before the final pack
    runs in uint32 limb arithmetic; with use_pallas the hash pipeline runs
    as a fused VMEM kernel (ops/pallas_sketch.py).
    """
    from .murmur32 import pair_leq, le64_pair

    S = seq.shape[0]
    n = S - ksize + 1
    if use_pallas:
        from .pallas_sketch import window_hash_pairs_pallas

        interp = _ops_default_backend() == "cpu"
        h_hi, h_lo, validu = window_hash_pairs_pallas(
            seq, ksize=ksize, seed=seed, interpret=interp
        )
        h_hi = h_hi[:n]
        h_lo = h_lo[:n]
        valid = validu[:n] != 0
    else:
        (h_hi, h_lo), valid = _window_hash_pairs(seq, n, ksize, seed)

    mh = max_hash.astype(jnp.uint64)
    th = (mh >> np.uint64(32)).astype(jnp.uint32)
    tl = mh.astype(jnp.uint32)

    keep = valid & pair_leq((h_hi, h_lo), (th, tl))
    out, n_valid = _compact_keep(keep, h_hi, h_lo, cap)
    return out, n_valid


@functools.partial(
    jax.jit, static_argnames=("ksize", "seed", "cap", "use_pallas")
)
def _seq_batch_to_compact_hashes(
    seqs, max_hash, ksize: int, seed: int, cap: int, use_pallas: bool = False
):
    """Batched variant: [B, S] byte rows -> ([B, cap] survivors, [B] counts).

    One device dispatch for a whole batch of chunks — essential when the
    host<->device link has high per-call latency. The pallas path folds the
    batch dimension into the kernel grid rather than vmapping the kernel.
    """
    if not use_pallas:

        def one(seq):
            return _seq_to_compact_hashes(seq, max_hash, ksize, seed, cap)

        return jax.vmap(one)(seqs)

    from .murmur32 import pair_leq, le64_pair
    from .pallas_sketch import window_hash_pairs_pallas

    B, S = seqs.shape
    n = S - ksize + 1
    interp = _ops_default_backend() == "cpu"
    h_hi, h_lo, validu = window_hash_pairs_pallas(
        seqs, ksize=ksize, seed=seed, interpret=interp
    )
    h_hi = h_hi[:, :n]
    h_lo = h_lo[:, :n]
    valid = validu[:, :n] != 0

    mh = max_hash.astype(jnp.uint64)
    th = (mh >> np.uint64(32)).astype(jnp.uint32)
    tl = mh.astype(jnp.uint32)

    keep = valid & pair_leq((h_hi, h_lo), (th, tl))
    out, n_valid = jax.vmap(lambda k, hh, hl: _compact_keep(k, hh, hl, cap))(
        keep, h_hi, h_lo
    )
    return out, n_valid


def _slot_path_ok(max_hash, use_pallas: bool) -> bool:
    """The in-kernel segment compaction path applies when survivors are
    sparse: expected density 128/scaled per segment must leave headroom
    under the SLOTS=8 capacity (scaled >= 512 => lambda <= 0.25,
    P[Poisson > 8] ~ 3e-10 per segment)."""
    return bool(use_pallas) and int(max_hash) <= (1 << 64) // 512


def _pick_slots(max_hash) -> int:
    """Kernel slot capacity per 128-window segment. 4 slots run ~16%
    faster (fewer reduce passes); at scaled >= 768 (lambda <= 0.167) a
    segment overflows 4 slots with P ~ 9e-7, so per-2^21-window chunks
    reroute to the dense path ~0.4%% of the time — a ~1%% average cost.
    Below that, 8 slots keep overflow negligible down to the scaled=512
    gate."""
    return 4 if int(max_hash) <= (1 << 64) // 768 else 8


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_slots_device(sh, sl, cnt, cap: int):
    """Device epilogue: packed [B, nseg, slots] slot planes -> dense
    [B, cap] u64 survivors (window order) + per-row survivor counts +
    per-row slot-overflow flags. Compacting on device shrinks the
    readback ~8x vs pulling the slot planes to host — the CLI sketch
    flow's dominant cost on bandwidth-limited links."""
    slots = sh.shape[-1]
    mask = (
        jnp.arange(slots, dtype=jnp.int32)[None, None, :]
        < cnt[:, :, None].astype(jnp.int32)
    )
    bad = (cnt.astype(jnp.int32) > slots).any(axis=1)

    def row(m, hh, hl):
        return _compact_keep(m.reshape(-1), hh.reshape(-1), hl.reshape(-1), cap)

    out64, n_row = jax.vmap(row)(mask, sh, sl)
    return out64, n_row, bad


def _slots_to_hashes(slots_hi, slots_lo, counts):
    """Host finish: packed per-segment slot tensors -> uint64 survivor
    multiset (window order within each chunk row). Returns
    (hashes, bad_rows): bad_rows lists batch rows where some segment
    exceeded slot capacity (their hashes are excluded; the caller
    recomputes just those rows on the dense path)."""
    counts = np.asarray(counts)
    slots = slots_hi.shape[-1]
    hi = np.asarray(slots_hi)
    lo = np.asarray(slots_lo)
    bad_rows = np.nonzero((counts > slots).any(axis=1))[0].tolist()
    mask = np.arange(slots, dtype=np.int32)[None, None, :] < counts[:, :, None]
    if bad_rows:
        mask[bad_rows] = False
    h64 = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    return h64[mask], bad_rows


@functools.partial(jax.jit, static_argnames=("ksize", "seed"))
def _seq_to_sorted_hashes(seq, max_hash, ksize: int, seed: int):
    """Legacy full-sort variant: survivors form the sorted prefix.

    Kept for the single-chip entry() compile check and as a fallback.
    """
    S = seq.shape[0]
    n = S - ksize + 1
    h, valid = _window_hashes(seq, n, ksize, seed)
    keep = valid & (h <= max_hash)
    h_masked = jnp.where(keep, h, MAX_U64)
    n_valid = jnp.sum(keep.astype(jnp.int32))
    return jnp.sort(h_masked), n_valid


def seq_chunks_to_hashes(
    seq_bytes: bytes,
    ksize: int,
    max_hash: int,
    seed: int = 42,
    chunk: int = 1 << 21,
    cap: int | None = None,
):
    """Host driver: raw sequence bytes -> np.uint64 array of surviving
    window hashes (with multiplicity, in window order per chunk).

    `seq_bytes` may be a multi-record buffer pre-joined with (k-1) b'N'
    separators. Uppercasing is applied here.
    """
    arr = np.frombuffer(seq_bytes, dtype=np.uint8)
    arr = UPPER[arr]
    S = arr.shape[0]
    if S < ksize:
        return np.zeros(0, dtype=np.uint64)

    if S < (1 << 16):
        # small input: the host numpy twin beats device-dispatch overhead
        from .encodings import dna_hashes

        h, valid = dna_hashes(arr, ksize, seed)
        keep = valid & (h <= np.uint64(max_hash))
        return h[keep]

    mh = np.uint64(max_hash)
    # survivor cap per chunk: ~4x expected for scaled path; whole chunk for
    # num sketches (max_hash == 2^64-1).
    if cap is None:
        if max_hash >= (1 << 63):
            cap = chunk
        else:
            expected = int(chunk * (float(max_hash) / 2**64)) + 1
            cap = max(4096, 1 << int(np.ceil(np.log2(4 * expected + 1024))))
            cap = min(cap, chunk)

    # assemble all chunks and hash them in as few device dispatches as
    # possible (per-dispatch latency dominates on tunneled devices).
    pieces = []
    starts = list(range(0, max(S - ksize + 1, 1), chunk))
    for s in starts:
        e = min(s + chunk + ksize - 1, S)
        piece = arr[s:e]
        if piece.shape[0] < ksize:
            continue
        pad = (chunk + ksize - 1) - piece.shape[0]
        if pad > 0:
            piece = np.concatenate([piece, np.zeros(pad, dtype=np.uint8)])
        pieces.append(piece)

    if not pieces:
        return np.zeros(0, dtype=np.uint64)

    use_pallas = _use_pallas_default()
    slot_path = _slot_path_ok(mh, use_pallas)

    out = []
    max_batch = 32
    for b0 in range(0, len(pieces), max_batch):
        batch = np.stack(pieces[b0 : b0 + max_batch])
        if slot_path:
            from .pallas_sketch import sketch_survivor_slots_pallas

            interp = _ops_default_backend() == "cpu"
            sh, sl, cnt = sketch_survivor_slots_pallas(
                jnp.asarray(batch), jnp.asarray(mh), ksize=ksize, seed=seed,
                slots=_pick_slots(mh), interpret=interp,
            )
            dense, n_row, bad = _compact_slots_device(sh, sl, cnt, cap)
            # one batched transfer for all three outputs (a separate
            # blocking np.asarray per array costs one link RTT each)
            vals, n_row, bad = jax.device_get((dense, n_row, bad))
            bad_rows = []
            for i in range(len(n_row)):
                # slot overflow or survivor-cap overflow: dense-path retry
                if bad[i] or int(n_row[i]) > cap:
                    bad_rows.append(i)
                elif n_row[i]:
                    out.append(vals[i, : int(n_row[i])])
            if not bad_rows:
                continue
            # these rows only: recompute on the dense path
            batch = batch[np.asarray(bad_rows)]
        vals_dev, n_valid = _seq_batch_to_compact_hashes(
            jnp.asarray(batch), mh, ksize, seed, cap, _use_pallas_default()
        )
        nvs = np.asarray(n_valid)
        vals = np.asarray(vals_dev)
        for i, nv in enumerate(nvs):
            nv = int(nv)
            if nv == 0:
                continue
            if nv > cap:
                # rare overflow: retry this chunk at full capacity
                v2, n2 = _seq_to_compact_hashes(
                    jnp.asarray(batch[i]), mh, ksize, seed, chunk,
                    _use_pallas_default(),
                )
                out.append(np.asarray(v2)[: int(n2)])
            else:
                out.append(vals[i, :nv])
    if not out:
        return np.zeros(0, dtype=np.uint64)
    return np.concatenate(out)


def aa_chunks_to_hashes(
    aa_arr: np.ndarray,
    ksize: int,
    seed: int = 42,
    chunk: int = 1 << 21,
    mask_invalid: bool = False,
):
    """Device driver for amino-acid window hashing: uppercased (and, for
    dayhoff/hp, pre-remapped) aa bytes -> np.uint64 hashes for ALL windows
    in order (the protein SeqToHashes contract,
    `/root/reference/src/core/src/signature.rs:362-393` — no residue
    validity filtering; callers threshold downstream). Chunks batch into as
    few dispatches as possible; the trailing-window count trims block
    padding. With mask_invalid, windows containing a zero byte are dropped
    (the record-separator convention of the batched CLI path — aa bytes are
    ASCII letters/'*', never 0)."""
    from .pallas_sketch import aa_window_hash_pairs_pallas

    S = aa_arr.shape[0]
    n_total = S - ksize + 1
    if n_total <= 0:
        return np.zeros(0, dtype=np.uint64)

    pieces = []
    counts = []
    for s in range(0, n_total, chunk):
        e = min(s + chunk + ksize - 1, S)
        piece = aa_arr[s:e]
        counts.append(piece.shape[0] - ksize + 1)
        pad = (chunk + ksize - 1) - piece.shape[0]
        if pad > 0:
            piece = np.concatenate([piece, np.zeros(pad, dtype=np.uint8)])
        pieces.append(piece)

    interp = _ops_default_backend() == "cpu"
    out = []
    max_batch = 32
    for b0 in range(0, len(pieces), max_batch):
        batch = np.stack(pieces[b0 : b0 + max_batch])
        hi, lo, valid = aa_window_hash_pairs_pallas(
            jnp.asarray(batch), ksize=ksize, seed=seed, interpret=interp
        )
        hi = np.asarray(hi)
        lo = np.asarray(lo)
        valid = np.asarray(valid)
        for i, cnt in enumerate(counts[b0 : b0 + max_batch]):
            h = (hi[i, :cnt].astype(np.uint64) << np.uint64(32)) | lo[
                i, :cnt
            ].astype(np.uint64)
            if mask_invalid:
                h = h[valid[i, :cnt] != 0]
            out.append(h)
    return np.concatenate(out) if out else np.zeros(0, dtype=np.uint64)


def hashes_to_mins(hashes: np.ndarray, track_abundance: bool):
    "Survivor hash multiset -> (sorted unique mins, abundances|None)."
    if hashes.size == 0:
        empty = np.zeros(0, dtype=np.uint64)
        return empty, (np.zeros(0, dtype=np.uint64) if track_abundance else None)
    if track_abundance:
        mins, counts = np.unique(hashes, return_counts=True)
        return mins.astype(np.uint64), counts.astype(np.uint64)
    return np.unique(hashes).astype(np.uint64), None
