"""Numeric-input oracle emitters for the byte-exact hash family.

CH hashes a numeric argument's native little-endian layout
(src/Functions/FunctionsHashing.h applies the hash to sizeof(T)
bytes of the value); since round 9 the engine does the same for bare
numeric columns (ch_compat._hash_arg_bytes). These subclasses replay
the byte-exact algorithms in DuckDB HUGEINT with the input as a
64-bit VALUE instead of an ASCII string: byte k of the stream is
plain arithmetic on the value ((v >> 8*(k-1)) & 0xFF), and reads
past the value's width return 0, exactly like the string emitters'
total ascii(substr(...)) fetches. Every base-class chain routes byte
access through ONE fetch method (f_le / f64le / f32-f64), so a
single override per emitter retargets the whole algorithm; the
caller pins the length class (8 bytes for Int64/UInt64 columns), so
the dispatch is static.

Validated in tests/test_numeric_hash_parity.py: each u64-mode
emitter is pinned against the Python byte models over random 64-bit
values (including the sign straddle), and the Spark side against the
same models end-to-end through run_ch_query.
"""

from __future__ import annotations

from .cityhash import CityEmitter
from .murmur import MurmurEmitter
from .siphash import SipEmitter
from .xxhash import XxEmitter


def _u64_fetch(e: str, pos: str, nbytes: int) -> str:
    """Bytes [pos, pos+nbytes) (1-based) of the u64 value `e` as a
    little-endian HUGEINT word; positions past byte 8 read 0."""
    return (
        f"((({e}) // (CAST(1 AS HUGEINT) << (8 * (({pos}) - 1)))) % "
        f"(CAST(1 AS HUGEINT) << {8 * nbytes}))"
    )


class XxU64Emitter(XxEmitter):
    def f_le(self, e: str, pos: str, nbytes: int) -> str:
        return self.emit(_u64_fetch(e, pos, nbytes))


class SipU64Emitter(SipEmitter):
    def f64le(self, e: str, pos: str) -> str:
        return self.emit(_u64_fetch(e, pos, 8))


class MurmurU64Emitter(MurmurEmitter):
    def f_le(self, e: str, pos: str, nbytes: int) -> str:
        return self.emit(_u64_fetch(e, pos, nbytes))


class CityU64Emitter(CityEmitter):
    def f64(self, e: str, pos) -> str:
        return self.emit(_u64_fetch(e, str(pos), 8))

    def f32(self, e: str, pos) -> str:
        return self.emit(_u64_fetch(e, str(pos), 4))
