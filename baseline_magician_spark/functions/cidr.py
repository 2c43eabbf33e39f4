"""CIDR arithmetic helpers — the go-cidr surface (SURVEY §2.8 X5/X6).

Driver-side pure Python, IPv4-focused (the reference skips IPv6
networks outright, main.go:223-226). Semantics follow the vendored
library, vendor/github.com/apparentlymart/go-cidr/cidr/cidr.go:

- ``subnet``       — cidr.go:30-60   (Subnet: carve the num-th child
                     prefix of ``new_bits`` extra mask bits)
- ``host``         — cidr.go:62-96   (Host: the num-th address; num
                     may exceed the range only by masked-bit overflow,
                     which errors exactly like the Go version)
- ``address_range``— cidr.go:106-129 (first/last address)
- ``address_count``— cidr.go:136-139 (2^(bits-prefix))
- ``inc_ip``/``dec_ip`` — cidr/wrangling.go:9-37
- ``previous_subnet``/``next_subnet`` — cidr.go:142-169 (returns the
  adjacent same-length prefix plus a rollover flag)
- ``verify_no_overlap`` — cidr.go:171-228 (every subnet inside the
  base and pairwise disjoint)

Columnar variants of the two operations the engine uses in plans
(range bounds, address count) live in functions/ip.py; these helpers
serve network-list preprocessing on the driver, where the reference
does the same work per-process.
"""

from __future__ import annotations

from .ip import ip4_to_long_py, long_to_ip4_py

_BITS = 32
_MAX = (1 << _BITS) - 1


def _parse(cidr: str) -> tuple[int, int]:
    """(network_long, masklen); the address is masked down to the
    network base like net.ParseCIDR's returned *IPNet."""
    addr, _, mask_s = cidr.partition("/")
    masklen = int(mask_s)
    if not 0 <= masklen <= _BITS:
        raise ValueError(f"bad mask length in {cidr!r}")
    base = ip4_to_long_py(addr) & ~((1 << (_BITS - masklen)) - 1) & _MAX
    return base, masklen


def _render(base: int, masklen: int) -> str:
    return f"{long_to_ip4_py(base)}/{masklen}"


def address_count(cidr: str) -> int:
    _, masklen = _parse(cidr)
    return 1 << (_BITS - masklen)


def address_range(cidr: str) -> tuple[str, str]:
    base, masklen = _parse(cidr)
    return long_to_ip4_py(base), long_to_ip4_py(base + (1 << (_BITS - masklen)) - 1)


def subnet(cidr: str, new_bits: int, num: int) -> str:
    base, masklen = _parse(cidr)
    new_len = masklen + new_bits
    if new_len > _BITS:
        raise ValueError(f"insufficient address space to extend {cidr!r} by {new_bits}")
    if num >= (1 << new_bits):
        raise ValueError(f"prefix extension of {new_bits} does not accommodate {num}")
    return _render(base + (num << (_BITS - new_len)), new_len)


def host(cidr: str, num: int) -> str:
    """Negative ``num`` counts back from the end of the range
    (cidr.go:62-96: Host(-1) is the broadcast address)."""
    base, masklen = _parse(cidr)
    size = 1 << (_BITS - masklen)
    if num < 0:
        if -num > size:
            raise ValueError(
                f"prefix of {masklen} does not accommodate host {num}"
            )
        num = size + num
    if num >= size:
        raise ValueError(f"prefix of {masklen} does not accommodate host {num}")
    return long_to_ip4_py(base + num)


def inc_ip(ip: str) -> str:
    return long_to_ip4_py((ip4_to_long_py(ip) + 1) & _MAX)


def dec_ip(ip: str) -> str:
    return long_to_ip4_py((ip4_to_long_py(ip) - 1) & _MAX)


def next_subnet(cidr: str, prefix_len: int | None = None) -> tuple[str, bool]:
    """The adjacent higher ``prefix_len`` block AFTER the whole input
    network, go-cidr's exact algorithm (cidr.go:157-169): take the
    network's LAST address, mask it down to prefix_len, step one block
    past it. True flags rollover past the end of the address space
    (the wrapped value is returned with the flag rather than raising).
    """
    base, masklen = _parse(cidr)
    plen = masklen if prefix_len is None else prefix_len
    mask = ~((1 << (_BITS - plen)) - 1) & _MAX
    last = base + (1 << (_BITS - masklen)) - 1
    nxt = (last & mask) + (1 << (_BITS - plen))
    return _render(nxt & _MAX & mask, plen), nxt > _MAX


def previous_subnet(cidr: str, prefix_len: int | None = None) -> tuple[str, bool]:
    """The ``prefix_len`` block containing the address just BEFORE the
    network's base (cidr.go:142-155: decrement, then mask). True flags
    rollover below address zero."""
    base, masklen = _parse(cidr)
    plen = masklen if prefix_len is None else prefix_len
    mask = ~((1 << (_BITS - plen)) - 1) & _MAX
    prev = base - 1
    return _render(prev & _MAX & mask, plen), prev < 0


def verify_no_overlap(subnets: list[str], base: str) -> None:
    """Raise ValueError unless every subnet lies inside ``base`` and no
    two subnets overlap (cidr.go:171-228's two checks, same order)."""
    b_lo, b_len = _parse(base)
    b_hi = b_lo + (1 << (_BITS - b_len)) - 1
    ranges = []
    for s in subnets:
        lo, mlen = _parse(s)
        hi = lo + (1 << (_BITS - mlen)) - 1
        if lo < b_lo or hi > b_hi:
            raise ValueError(f"{s} is not contained within {base}")
        ranges.append((lo, hi, s))
    ranges.sort()
    for (lo1, hi1, s1), (lo2, hi2, s2) in zip(ranges, ranges[1:]):
        if lo2 <= hi1:
            raise ValueError(f"{s1} overlaps with {s2}")
