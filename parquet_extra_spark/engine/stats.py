"""Per-chunk column statistics + statistics-driven codec auto-selection.

This is the engine's analogue of the reference's schema-inference scan
(parquet-tensorflow ExampleScanner.java:23-89): one vectorized pass over
the chunk's values derives cardinality / run structure / size facts, and
a decision table turns those into a codec choice — mirroring how the
scanner turns min/max occurrence counts into required/optional/repeated
(ExampleScanner.java:77-87), but aimed at compression instead of
repetition.

Selection compares *estimated bytes-per-value* across applicable codecs
(dict vs rle vs for for ints; dict vs rle vs fsst-vs-raw trial for
strings). For strings with high cardinality the choice between FSST and
raw+zstd is made by actually trying both on a sample — statistics-driven,
never hard-coded per column name.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs import fsst, packing, typemap
from ..codecs import encode_array as encode_array_fn

_STR_TRUNC = 64


@dataclass
class ColumnStats:
    n: int
    null_count: int
    distinct: int
    n_runs: int
    raw_bytes: int
    min_val: str | None
    max_val: str | None
    dict_bytes: int = 0
    # sorted 63-bit member hashes of the EXACT distinct-value set, or None
    # when the dictionary was sampled/extrapolated or too large — see
    # member_hash_for (the plan-side half of the digest contract)
    members: list[int] | None = None
    # Bloom digest over the EXACT distinct-value set (opt-in, any
    # cardinality): _BLOOM_WORDS 63-bit words, or None
    bloom: list[int] | None = None
    # Bloom digest over the set of character 3-grams of the EXACT
    # distinct-value set (opt-in via encode(trigram_cols=...)): makes
    # substring predicates (LIKE '%x%') chunk-prunable — see
    # _trigram_digest. None = no digest / saturated / sampled dict
    trigrams: list[int] | None = None


# membership digest: only dtypes whose plan-time literals canonicalize to
# the same strings the encoder hashes (member_hash_for); cap keeps the
# per-chunk metadata tiny (64 hashes = 512 bytes)
_MEMBER_MAX = 64


def _member_hash(s: str) -> int:
    """Canonical-string -> stable 63-bit hash (same function on both the
    encode side and the plan side; NOT Python's salted hash())."""
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "little") >> 1


def member_hash_for(value, dtype: str) -> int | None:
    """Plan-side canonicalization of an eq/isin literal. Returns None when
    (value, dtype) is outside the digest contract — the caller must then
    fall back to min/max pruning only (sound). Type checks are strict:
    e.g. a float literal against an int column never digest-prunes (the
    row recheck decides 2.0 == 2; the digest must not)."""
    if dtype == "boolean":
        return _member_hash(str(int(value))) if isinstance(value, bool) else None
    if dtype in typemap.INT_DTYPES:
        if isinstance(value, int) and not isinstance(value, bool):
            return _member_hash(str(value))
        return None
    if dtype == "string":
        return _member_hash(value) if isinstance(value, str) else None
    return None


# Bloom digest (opt-in per column via encode(bloom_cols=...)): point-
# lookup pruning on HIGH-cardinality columns, where the exact member
# list is too big — the chunk-table analogue of parquet-mr's optional
# per-column bloom filters. 8190 bits packed 63 per int64 word (bit 63
# never used, so every mask literal is a positive int64 and the plan
# side tests bits with plain bitwiseAND — no unsigned-shift gymnastics).
# k=6 double-hashed probes from the SAME canonical 63-bit member hash
# the exact digest uses, so member_hash_for is the single plan-side
# contract for both digests. No false negatives by construction: an
# unset bit PROVES the value absent from the chunk; false positives
# only widen `possible` (sound). At the default chunk size (65536 rows,
# worst case all-distinct) fpp ~ (1-e^(-k*n/m))^k with m=8190 is high —
# size the chunk or accept weaker pruning; at <=2048 distinct/chunk
# fpp < 1e-3.
_BLOOM_BITS_PER_WORD = 63
_BLOOM_WORDS = 130
_BLOOM_BITS = _BLOOM_WORDS * _BLOOM_BITS_PER_WORD  # 8190
_BLOOM_K = 6


def bloom_positions(h: int) -> list[int]:
    """k bit positions from a canonical member hash (double hashing:
    Kirsch–Mitzenmacher). Same function on the encode and plan sides."""
    h1 = h & 0xFFFFFFFF
    h2 = ((h >> 32) & 0x7FFFFFFF) | 1  # odd -> coprime with any m
    return [(h1 + i * h2) % _BLOOM_BITS for i in range(_BLOOM_K)]


def _bloom_digest(dict_arr: pa.Array, dtype: str) -> list[int] | None:
    """Encode-side Bloom words from an EXACT dictionary (never from the
    sampled wide-string path — a sampled bloom would have false
    negatives and unsoundly skip chunks)."""
    if dict_arr is None or len(dict_arr) == 0:
        return None
    if dtype == "boolean" or dtype in typemap.INT_DTYPES:
        vals = [str(v) for v in dict_arr.to_pylist()]
    elif dtype == "string":
        vals = dict_arr.to_pylist()
    else:
        return None
    words = [0] * _BLOOM_WORDS
    for v in vals:
        for p in bloom_positions(_member_hash(v)):
            words[p // _BLOOM_BITS_PER_WORD] |= 1 << (p % _BLOOM_BITS_PER_WORD)
    return words


# Trigram digest (opt-in per column via encode(trigram_cols=...)): the
# pg_trgm idea applied to chunk pruning. A value CONTAINING needle s
# contains every 3-gram of s, so a chunk whose trigram set provably
# lacks ANY 3-gram of s cannot match LIKE '%s%' / '%s' — substring
# predicates, which [min,max] can never refute (position is order-
# independent), get a sound skip lane. Bloom false positives only
# widen `possible`; no false negatives by construction. Saturation
# guard: above _TRIGRAM_MAX_DISTINCT distinct trigrams the filter is
# mostly-set and prunes nothing — store None instead (content-scale
# text columns land here; the digest is for path/source/id-like
# columns, same audience as the membership digest).
_TRIGRAM_MAX_DISTINCT = 4096


def trigram_hashes(needle: str) -> list[int] | None:
    """Plan-side: canonical hashes of the needle's distinct 3-grams, or
    None when the needle is too short to constrain (len < 3)."""
    if not isinstance(needle, str) or len(needle) < 3:
        return None
    grams = {needle[i:i + 3] for i in range(len(needle) - 2)}
    return sorted(_member_hash(g) for g in grams)


def _trigram_digest(dict_arr: pa.Array, dtype: str) -> list[int] | None:
    """Encode-side Bloom words over all 3-grams of an EXACT dictionary
    (never the sampled wide-string path — false negatives would skip
    matching chunks)."""
    if dtype != "string" or dict_arr is None or len(dict_arr) == 0:
        return None
    grams: set[str] = set()
    for v in dict_arr.to_pylist():
        if v is None or len(v) < 3:
            continue
        for i in range(len(v) - 2):
            grams.add(v[i:i + 3])
        if len(grams) > _TRIGRAM_MAX_DISTINCT:
            return None
    if not grams:
        return None
    words = [0] * _BLOOM_WORDS
    for g in grams:
        for p in bloom_positions(_member_hash(g)):
            words[p // _BLOOM_BITS_PER_WORD] |= 1 << (p % _BLOOM_BITS_PER_WORD)
    return words


def _member_digest(dict_arr: pa.Array, dtype: str) -> list[int] | None:
    """Encode-side digest from an EXACT dictionary (no sampling)."""
    if dict_arr is None or not (0 < len(dict_arr) <= _MEMBER_MAX):
        return None
    if dtype == "boolean" or dtype in typemap.INT_DTYPES:
        # dict_encode_codes normalizes boolean dictionaries to int64 0/1
        vals = [str(v) for v in dict_arr.to_pylist()]
    elif dtype == "string":
        vals = dict_arr.to_pylist()
    else:
        return None
    return sorted(_member_hash(v) for v in vals)


def _minmax_strings(arr: pa.Array, dtype: str) -> tuple[str | None, str | None]:
    """Chunk min/max as strings, *sound for pushdown*: string minima may be
    truncated to a 64-char prefix (still a lower bound); a max that would
    need truncation is stored as NULL = unbounded (never unsound skips)."""
    if len(arr) == arr.null_count:
        return None, None
    if dtype == "boolean":
        arr = arr.cast(pa.int8())
    try:
        mm = pc.min_max(arr)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
    except pa.ArrowNotImplementedError:
        return None, None
    if isinstance(mn, bytes):
        try:
            mn, mx = mn.decode(), mx.decode()
        except UnicodeDecodeError:
            return None, None
    if isinstance(mn, float):
        import math

        # NaN handling differs by pyarrow version: some poison min_max
        # (any NaN -> mn = mx = NaN), current ones SKIP NaN and return
        # the finite bounds. Both are unsound as stored stats, because
        # Spark's total order places NaN ABOVE every double — a chunk
        # containing NaN matches x > B for ANY bound B, so its true max
        # is NaN and must be stored as NULL = unbounded (never skips).
        # The finite min stays sound: NaN never extends the lower bound
        # (NaN < B is false for every B in Spark).
        if math.isnan(mn) or math.isinf(mn):
            return (None, str(mx) if math.isfinite(mx) else None)
        if math.isnan(mx) or math.isinf(mx):
            return (str(mn), None)
        if pc.any(pc.is_nan(arr)).as_py():
            return (str(mn), None)
    mn_s, mx_s = str(mn), str(mx)
    if dtype in typemap.STRLIKE_DTYPES:
        if len(mn_s) > _STR_TRUNC:
            mn_s = mn_s[:_STR_TRUNC]
        if len(mx_s) > _STR_TRUNC:
            return mn_s, None  # unbounded max — conservative
    return mn_s, mx_s


def raw_size(arr: pa.Array, dtype: str) -> int:
    """Logical raw size in bytes (uncompressed value payload)."""
    n = len(arr)
    if dtype in typemap.STRLIKE_DTYPES:
        lengths, data, _ = typemap.str_buffers(arr)
        return len(data)
    if dtype in typemap.FLOAT_DTYPES:
        return n * (8 if dtype == "double" else 4)
    if dtype == "boolean":
        return n
    if dtype.startswith("array<"):
        flat = arr.cast(typemap.spark_to_arrow(dtype)).flatten()
        return raw_size(flat, dtype[len("array<"):-1]) + n * 4
    return n * 8


def canonical_sha256(arr: pa.Array, dtype: str) -> str:
    """Content hash of a column chunk for integrity checks (the per-chunk
    analogue of the round-trip oracle, ParquetExampleTest.scala:51-55)."""
    h = hashlib.sha256()
    mask = arr.is_null().to_numpy(zero_copy_only=False)
    h.update(np.packbits(mask.astype(np.uint8), bitorder="little").tobytes())
    if dtype in typemap.STRLIKE_DTYPES:
        lengths, data, _ = typemap.str_buffers(arr)
        h.update(lengths.astype("<u8").tobytes())
        h.update(data)
    elif dtype.startswith("array<"):
        a = arr.cast(typemap.spark_to_arrow(dtype))
        offsets = np.frombuffer(a.buffers()[1], dtype=np.int32)[a.offset : a.offset + len(a) + 1]
        h.update(np.diff(offsets).astype("<i8").tobytes())
        h.update(canonical_sha256(a.flatten(), dtype[len("array<"):-1]).encode())
    elif dtype in typemap.FLOAT_DTYPES:
        np_t = "<f8" if dtype == "double" else "<f4"
        h.update(arr.fill_null(0.0).to_numpy(zero_copy_only=False).astype(np_t).tobytes())
    elif dtype == "boolean":
        vals = arr.fill_null(False).to_numpy(zero_copy_only=False).astype(np.uint8)
        h.update(np.packbits(vals, bitorder="little").tobytes())
    else:
        vals, _ = typemap.to_int64_values(arr, dtype)
        h.update(vals.astype("<i8").tobytes())
    return h.hexdigest()


def _dict_facts(arr: pa.Array, dtype: str) -> tuple[int, int, int, pa.Array | None]:
    """-> (dict_n, n_runs, dict_bytes, dict_arr) via one dictionary_encode
    pass; dict_arr is the exact distinct-value dictionary (None if empty)."""
    from ..codecs.dictionary import dict_encode_codes

    codes, mask, dict_arr = dict_encode_codes(arr, dtype)
    if len(codes) == 0:
        return 0, 0, 0, None
    work = codes.copy()
    work[mask] = np.uint64(len(dict_arr))
    n_runs = len(packing.run_starts(work))
    if dtype in typemap.STRLIKE_DTYPES:
        lengths, data, _ = typemap.str_buffers(dict_arr)
        dict_bytes = len(data) + len(dict_arr) * 2
    else:
        dict_bytes = len(dict_arr) * 8
    return len(dict_arr), n_runs, dict_bytes, dict_arr


_DICT_SAMPLE_ROWS = 2048
_WIDE_STR_BYTES = 128


def compute_stats(
    arr: pa.Array, dtype: str, bloom: bool = False, trigram: bool = False
) -> ColumnStats:
    n = len(arr)
    raw = raw_size(arr, dtype)
    members: list[int] | None = None
    bloom_words: list[int] | None = None
    trigram_words: list[int] | None = None
    if dtype.startswith("array<"):
        dict_n, n_runs, dict_bytes = 0, n, 0
        mn, mx = None, None
    elif (
        dtype in typemap.STRLIKE_DTYPES
        and n > _DICT_SAMPLE_ROWS
        and raw >= n * _WIDE_STR_BYTES
    ):
        # Wide string columns (long text): hashing every byte just to learn
        # cardinality/run structure costs a full memory pass per chunk. A
        # contiguous prefix slice preserves run structure locally; the
        # distinct/run counts are rate-extrapolated. distinct_est is already
        # an estimate by contract; selection only needs coarse cardinality
        # bands (engine/stats._candidates), and min/max for pushdown are
        # still computed exactly below.
        sample = arr.slice(0, _DICT_SAMPLE_ROWS)
        s_dict, s_runs, s_dict_bytes, _ = _dict_facts(sample, dtype)
        scale = n / _DICT_SAMPLE_ROWS
        if s_dict > 0.5 * _DICT_SAMPLE_ROWS:
            dict_n = min(n, int(s_dict * scale))  # high-card: rate extrapolation
        else:
            dict_n = s_dict  # low-card: the sample saw (nearly) all values
        n_runs = min(n, max(1, int(s_runs * scale)))
        dict_bytes = int(s_dict_bytes * (dict_n / max(s_dict, 1)))
        # no digest: the sampled dictionary may miss values — a digest
        # built from it would unsoundly skip chunks (sampling is gated to
        # wide content-like strings, never the low-card columns digests
        # are for)
        mn, mx = _minmax_strings(arr, dtype)
    else:
        dict_n, n_runs, dict_bytes, dict_arr = _dict_facts(arr, dtype)
        members = _member_digest(dict_arr, dtype)
        if bloom and members is None:
            # exact digest already covers small dictionaries (stronger
            # and smaller); the bloom earns its ~1 KB only above the cap
            bloom_words = _bloom_digest(dict_arr, dtype)
        if trigram:
            trigram_words = _trigram_digest(dict_arr, dtype)
        mn, mx = _minmax_strings(arr, dtype)
    return ColumnStats(
        n=n,
        null_count=arr.null_count,
        distinct=dict_n,
        n_runs=n_runs,
        raw_bytes=raw,
        min_val=mn,
        max_val=mx,
        dict_bytes=dict_bytes,
        members=members,
        bloom=bloom_words,
        trigrams=trigram_words,
    )


def _fsst_gate(arr: pa.Array) -> bool:
    """Sample gate for the expensive FSST codec. Post-zstd sizes on a small
    sample mispredict full-chunk outcomes (zstd's window covers the whole
    sample), so the gate uses fsst's own substitution ratio plus the shape
    of the learned symbols: genuinely compressible text yields long symbols
    and a big substitution win; high-entropy data (hex digests) yields only
    2-gram symbols whose post-zstd size is no better than zstd alone."""
    _, data, _ = typemap.str_buffers(arr)
    sample = fsst._sample(data)
    if not sample:
        return False
    stripped, pos, _vals = fsst.strip_specials(sample)
    syms = fsst.learn_symbols(fsst._sample(stripped))
    if not syms:
        return False
    comp, used = fsst.compress_buffer(stripped, syms)
    pre_ratio = (len(comp) + 2 * len(pos)) / max(1, len(sample))
    if not used:
        return False
    avg_sym_len = sum(len(sy) for sy in used) / len(used)
    return pre_ratio < 0.75 and avg_sym_len >= 3.0


def _candidates(arr: pa.Array, dtype: str, stats: ColumnStats) -> list[str]:
    """Cheap-to-try codec shortlist from chunk stats; FSST only past its
    sample gate (it costs real CPU), dict/rle only when cardinality/run
    structure makes them plausible."""
    n = max(stats.n, 1)
    if dtype.startswith("array<"):
        return ["list"]
    dict_n = max(stats.distinct, 1)
    avg_run = n / max(stats.n_runs, 1)
    if typemap.is_intlike(dtype):
        cands = ["for", "delta"]
        if dict_n <= n * 0.5:
            cands.append("dict")
        if avg_run >= 2.0:
            cands.append("rle")
        return cands
    if dtype in typemap.FLOAT_DTYPES:
        # bss (byte-stream-split) beats raw+zstd on high-entropy floats
        # (grouped sign/exponent bytes); the trial pass decides per chunk
        cands = ["raw", "bss"]
        if dict_n <= n * 0.5:
            cands.append("dict")
        if avg_run >= 2.0:
            cands.append("rle")
        return cands
    if dtype == "boolean":
        return ["raw", "rle"] if avg_run >= 4 else ["raw"]
    # strings / binary
    avg_len = stats.raw_bytes / n
    cands = ["raw"]
    big_values = avg_len >= 256  # trial-encoding dict/rle on huge text is wasted work
    if dict_n <= n * 0.8 and not (big_values and dict_n > n * 0.1):
        cands += ["dict", "rle"]
    if avg_len >= 16 and _fsst_gate(arr):
        cands.append("fsst")
    return cands


_TRIAL_SAMPLE_ROWS = 4096


def choose_and_encode(
    arr: pa.Array, dtype: str, stats: ColumnStats, forced: str | None = None
) -> tuple[str, bytes]:
    """Trial-encode the candidate codecs and keep the smallest payload.
    The framing layer's zstd makes a-priori size estimates unreliable
    (zstd interacts with each codec's layout), so the honest selector is
    the encoded size itself; candidates are pre-filtered by stats, and
    the raw(+zstd) fallback is always in the set — guaranteeing every
    chunk is at worst zstd-of-raw, which is what keeps the total under
    the reference Parquet(zstd) size (BASELINE.json north_rule).

    Large chunks run the trials on a contiguous PREFIX sample and only
    the winner encodes full-size: measured 2-4x less selection CPU with
    the same winner in practice (chunks are clustered+sorted, so a
    prefix shares the full chunk's value/run structure — the same
    locality assumption the per-task codec memo already relies on).
    The per-chunk 'at worst zstd-of-raw' bound survives sampling: when
    the sampled winner is not raw, raw is ALSO encoded full-size and the
    smaller payload kept. Non-raw winners are dict/rle/for-shaped
    columns (narrow), so the guard's extra zstd pass is cheap exactly
    where it runs; wide high-entropy columns pick raw and pay nothing."""
    if forced is not None:
        return forced, encode_array_fn(arr, dtype, forced)
    cands = _candidates(arr, dtype, stats)
    if len(cands) == 1:
        return cands[0], encode_array_fn(arr, dtype, cands[0])
    if len(arr) > _TRIAL_SAMPLE_ROWS:
        sample = arr.slice(0, _TRIAL_SAMPLE_ROWS)
        best_codec, best_size = None, None
        for codec in cands:
            size = len(encode_array_fn(sample, dtype, codec))
            if best_size is None or size < best_size:
                best_codec, best_size = codec, size
        payload = encode_array_fn(arr, dtype, best_codec)
        if best_codec != "raw":
            raw_payload = encode_array_fn(arr, dtype, "raw")
            if len(raw_payload) < len(payload):
                return "raw", raw_payload
        return best_codec, payload
    best_codec, best_payload = None, None
    for codec in cands:
        payload = encode_array_fn(arr, dtype, codec)
        if best_payload is None or len(payload) < len(best_payload):
            best_codec, best_payload = codec, payload
    return best_codec, best_payload


def select_codec(arr: pa.Array, dtype: str, stats: ColumnStats) -> str:
    """Name-only variant of choose_and_encode (tests, introspection)."""
    return choose_and_encode(arr, dtype, stats)[0]
