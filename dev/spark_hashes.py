"""Pure-Python reimplementations of Spark's hash kernels, used to
derive VALUES-literal oracle rows INDEPENDENTLY of Spark (the round-6
verdict's sum_rev lesson: same-author oracles inherit same-author bugs,
so expected values must come from an independent spelling).

Both algorithms are public:
- Murmur3_x86_32 (Austin Appleby, public domain) with Spark's two
  quirks: little-endian 4-byte words and SIGNED tail bytes mixed one at
  a time (org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes;
  the reference reimplements the same quirks natively in
  native/spark-expr/src/hash_funcs/murmur3.rs).
- XXH64 (Yann Collet, BSD) as specified — Spark's
  o.a.s.sql.catalyst.expressions.XXH64 is the spec algorithm
  (reference: native/spark-expr/src/hash_funcs/xxhash64.rs).

Spark seeds both with 42.  Verified against Spark by
dev/gen_values_oracles.py before any oracle is emitted.
"""

from __future__ import annotations

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & MASK32
    h1 ^= h1 >> 16
    return h1


def _to_i32(x: int) -> int:
    x &= MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def murmur3_bytes(data: bytes, seed: int = 42) -> int:
    """Spark F.hash semantics for a byte payload (signed int32 out)."""
    h1 = seed & MASK32
    aligned = len(data) - len(data) % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, len(data)):
        b = data[i]
        if b >= 128:  # Java bytes are signed
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & MASK32))
    return _to_i32(_fmix(h1, len(data)))


def murmur3_int(value: int, seed: int = 42) -> int:
    """Spark F.hash semantics for one int32 input (hashInt)."""
    h1 = _mix_h1(seed & MASK32, _mix_k1(value & MASK32))
    return _to_i32(_fmix(h1, 4))


def murmur3_long(value: int, seed: int = 42) -> int:
    """Spark F.hash semantics for one int64 input (hashLong):
    low word mixed first, then high word."""
    v = value & MASK64
    h1 = _mix_h1(seed & MASK32, _mix_k1(v & MASK32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & MASK32))
    return _to_i32(_fmix(h1, 8))


def spark_hash(*values, seed: int = 42) -> int:
    """Variadic F.hash(...): fold left, each column's hash seeds the
    next (HashExpression codegen: `hash = computeHash(v, dataType,
    hash)`).  Supports str (UTF-8 bytes), int-typed Python ints, and
    None (skipped — null leaves the accumulator unchanged)."""
    h = seed
    for v in values:
        if v is None:
            continue
        if isinstance(v, str):
            h = murmur3_bytes(v.encode("utf-8"), h & MASK32)
        elif isinstance(v, bool):
            h = murmur3_int(1 if v else 0, h & MASK32)
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                h = murmur3_int(v, h & MASK32)
            else:
                h = murmur3_long(v, h & MASK32)
        else:
            raise TypeError(f"unsupported type for spark_hash: {type(v)}")
    return _to_i32(h)


# ---------------------------------------------------------------- XXH64
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _xxh_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & MASK64
    acc = _rotl64(acc, 31)
    return (acc * _P1) & MASK64


def _xxh_merge(acc: int, val: int) -> int:
    acc ^= _xxh_round(0, val)
    return (acc * _P1 + _P4) & MASK64


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """XXH64 over bytes (Spark F.xxhash64 semantics, signed int64 out)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64
        while i <= n - 32:
            v1 = _xxh_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & MASK64
        h = _xxh_merge(h, v1)
        h = _xxh_merge(h, v2)
        h = _xxh_merge(h, v3)
        h = _xxh_merge(h, v4)
    else:
        h = (seed + _P5) & MASK64
    h = (h + n) & MASK64
    while i + 8 <= n:
        h ^= _xxh_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _P1 + _P4) & MASK64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & MASK64
        h = (_rotl64(h, 23) * _P2 + _P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & MASK64
        h = (_rotl64(h, 11) * _P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def java_url_encode(s: str) -> str:
    """java.net.URLEncoder.encode(s, UTF_8) — Spark url_encode
    semantics: [A-Za-z0-9.*_-] literal, space → '+', everything else
    %XX-escaped per UTF-8 byte, uppercase hex."""
    out = []
    for ch in s:
        if ch == " ":
            out.append("+")
        elif ch.isascii() and (ch.isalnum() or ch in ".-*_"):
            out.append(ch)
        else:
            out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
    return "".join(out)
