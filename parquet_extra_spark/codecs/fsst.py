"""FSST-style symbol-table compression for string columns.

A simplified but real implementation of the Fast Static Symbol Table idea
(Boncz, Neumann, Leis — "FSST: Fast Random Access String Compression",
VLDB 2020): learn frequent substrings (2..8 bytes) from a sample, assign
each a 1-byte code, substitute greedily. Unlike the paper's AVX kernel we
run substitution as C-speed ``bytes.replace`` passes over the *entire
concatenated data buffer* of the Arrow string array, which is vectorized
(no per-row Python, per BASELINE.json input_hint) and exactly invertible:

* Code bytes are drawn from byte values rare in UTF-8 source text (high
  bytes + control chars). Any literal occurrence of such a byte in the
  input is *stripped out* into a (positions, values) side section first —
  a vectorized numpy mask/flatnonzero pass — so the buffer that symbol
  substitution sees contains no code bytes at all. A code byte in the
  compressed buffer therefore came from exactly one symbol, making
  sequential replace passes invertible by reverse-order replace, after
  which the stripped bytes are reinserted at their recorded positions.
* Symbol matches may span row boundaries; that's fine because decode
  restores the exact original concatenated buffer and row offsets are
  stored independently (bit-packed lengths).

The framing layer zstd-compresses the post-substitution buffer, giving the
fsst+zstd cascade that beats plain zstd on templated source text.

Payload sections:
  0: meta {n, null_count, lwidth, n_syms, data_len, n_spec, pwidth}
  1: null bitmap
  2: bit-packed row lengths (original)
  3: symbol table: per symbol u8 length + bytes (encode order)
  4: bit-packed stripped-byte positions (deltas, in original buffer coords)
  5: stripped byte values
  6: substituted data buffer
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import framing, packing, typemap

# bytes reserved as symbol codes: control chars (minus \t\n\r) + DEL + high bytes
CODE_BYTES: list[int] = (
    [b for b in range(0x00, 0x20) if b not in (0x09, 0x0A, 0x0D)]
    + [0x7F]
    + list(range(0x80, 0x100))
)
_SPECIAL_LUT = np.zeros(256, dtype=bool)
_SPECIAL_LUT[CODE_BYTES] = True

# Replace-pass count cap. Substitution costs one C-speed pass over the
# buffer per symbol, so encode time is ~linear in this; measured on the
# documents corpus, 32 symbols keeps 96% of the post-zstd win of 96
# symbols (0.187 vs 0.182 of raw, plain zstd 0.211) at ~40% of the cost,
# and decode sheds the same passes.
MAX_SYMBOLS = 32
_SAMPLE_BYTES = 1 << 16
_GRAM_LENS = (8, 6, 4, 3, 2)


def strip_specials(data: bytes) -> tuple[bytes, np.ndarray, np.ndarray]:
    """-> (special-free buffer, original positions of stripped bytes, their values)."""
    a = np.frombuffer(data, dtype=np.uint8)
    spec = _SPECIAL_LUT[a]
    pos = np.flatnonzero(spec).astype(np.uint64)
    if len(pos) == 0:
        return data, pos, np.empty(0, dtype=np.uint8)
    return a[~spec].tobytes(), pos, a[pos.astype(np.int64)]


def restore_specials(stripped: bytes, pos: np.ndarray, vals: np.ndarray, total: int) -> bytes:
    if len(pos) == 0:
        return stripped
    out = np.empty(total, dtype=np.uint8)
    mask = np.zeros(total, dtype=bool)
    mask[pos.astype(np.int64)] = True
    out[mask] = vals
    out[~mask] = np.frombuffer(stripped, dtype=np.uint8)
    return out.tobytes()


def _sample(data: bytes) -> bytes:
    if len(data) <= _SAMPLE_BYTES:
        return data
    # three evenly spaced slices — cheap guard against locally-unrepresentative heads
    third = _SAMPLE_BYTES // 3
    mid = len(data) // 2
    return data[:third] + data[mid : mid + third] + data[-third:]


def _top_ngrams(sample: np.ndarray, L: int, k: int) -> list[tuple[bytes, int]]:
    """Top-k L-grams by count. Each L<=8 gram is packed into one uint64
    (little-endian shifts), so counting is a single np.unique over ints —
    ~10x faster than sorting structured-void windows."""
    n = len(sample) - L + 1
    if n <= 0:
        return []
    x = np.zeros(n, dtype=np.uint64)
    for i in range(L):
        x |= sample[i : i + n].astype(np.uint64) << np.uint64(8 * i)
    uniq, counts = np.unique(x, return_counts=True)
    if len(uniq) == 0:
        return []
    order = np.argsort(counts)[::-1][:k]
    out = []
    for i in order:
        if counts[i] < 4:
            break
        out.append((int(uniq[i]).to_bytes(8, "little")[:L], int(counts[i])))
    return out


def learn_symbols(stripped_sample: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Greedy frequent-substring selection, gain = count * (len-1), highest first.
    Input must already be special-free (strip_specials)."""
    if len(stripped_sample) < 16:
        return []
    arr = np.frombuffer(stripped_sample, dtype=np.uint8)
    candidates: list[tuple[int, bytes]] = []
    for L in _GRAM_LENS:
        for gram, count in _top_ngrams(arr, L, k=192):
            gain = count * (L - 1)
            if gain > L + 8:  # must at least pay for its table entry
                candidates.append((gain, gram))
    candidates.sort(key=lambda t: (-t[0], t[1]))
    chosen: list[bytes] = []
    seen: set[bytes] = set()
    for _, gram in candidates:
        if len(chosen) >= max_symbols:
            break
        if gram in seen:
            continue
        seen.add(gram)
        chosen.append(gram)
    return chosen


def compress_buffer(
    stripped: bytes, symbols: list[bytes]
) -> tuple[bytes, list[bytes]]:
    """Replace symbols by code bytes, gain-ordered, with early termination:
    when a window of passes stops shrinking the buffer (post-zstd size is
    insensitive to the tail symbols anyway), stop and return the symbols
    actually applied — fewer decode passes too. -> (buffer, used_symbols)."""
    out = stripped
    window_start_len = len(out)
    used = 0
    for i, sym in enumerate(symbols):
        out = out.replace(sym, bytes([CODE_BYTES[i]]))
        used = i + 1
        if (i + 1) % 8 == 0:
            if window_start_len - len(out) < max(64, len(out) // 500):
                break
            window_start_len = len(out)
    return out, symbols[:used]


def decompress_buffer(data: bytes, symbols: list[bytes]) -> bytes:
    for i in range(len(symbols) - 1, -1, -1):
        data = data.replace(bytes([CODE_BYTES[i]]), symbols[i])
    return data


def trial_ratio(data: bytes) -> float:
    """Estimated substituted/raw size ratio of fsst on a sample — used by the
    codec auto-selection stats pass (engine/stats.py). Values near 1.0 mean
    the symbol table found nothing (high-entropy data)."""
    sample = _sample(data)
    if not sample:
        return 1.0
    stripped, pos, _ = strip_specials(sample)
    syms = learn_symbols(stripped)
    if not syms:
        return 1.0
    comp, _used = compress_buffer(stripped, syms)
    return (len(comp) + 2 * len(pos)) / max(1, len(sample))


def encode(arr: pa.Array, dtype: str) -> bytes:
    if dtype not in typemap.STRLIKE_DTYPES:
        raise TypeError(f"fsst codec requires string/binary, got {dtype}")
    n = len(arr)
    lengths, data, mask = typemap.str_buffers(arr)
    stripped, spec_pos, spec_vals = strip_specials(data)
    symbols = learn_symbols(_sample(stripped))
    comp, symbols = compress_buffer(stripped, symbols)
    lwidth = packing.bit_width(int(lengths.max()) if n else 0)
    # store positions as deltas for tighter packing
    deltas = np.diff(spec_pos, prepend=np.uint64(0)) if len(spec_pos) else spec_pos
    pwidth = packing.bit_width(int(deltas.max()) if len(deltas) else 0)
    table = b"".join(len(s).to_bytes(1, "little") + s for s in symbols)
    meta = {
        "n": n,
        "null_count": int(mask.sum()),
        "lwidth": lwidth,
        "n_syms": len(symbols),
        "data_len": len(data),
        "n_spec": len(spec_pos),
        "pwidth": pwidth,
    }
    return framing.pack_sections(
        [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            packing.pack_uints(lengths, lwidth),
            table,
            packing.pack_uints(deltas, pwidth),
            spec_vals.tobytes(),
            comp,
        ]
    )


def decode(payload: bytes, dtype: str) -> pa.Array:
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    n = meta["n"]
    mask = packing.unpack_mask(secs[1], n) if meta["null_count"] else np.zeros(n, dtype=bool)
    lengths = packing.unpack_uints(secs[2], n, meta["lwidth"])
    symbols, pos, table = [], 0, secs[3]
    for _ in range(meta["n_syms"]):
        sl = table[pos]
        symbols.append(table[pos + 1 : pos + 1 + sl])
        pos += 1 + sl
    deltas = packing.unpack_uints(secs[4], meta["n_spec"], meta["pwidth"])
    spec_pos = np.cumsum(deltas, dtype=np.uint64) if len(deltas) else deltas
    spec_vals = np.frombuffer(secs[5], dtype=np.uint8)
    stripped = decompress_buffer(secs[6], symbols)
    data = restore_specials(stripped, spec_pos, spec_vals, meta["data_len"])
    assert len(data) == meta["data_len"], "fsst decode length mismatch"
    return typemap.str_from_buffers(lengths, data, mask, dtype)
