"""CIDR helper parity with the go-cidr semantics (SURVEY §2.8 X5/X6;
golden values cross-checked against the library's documented behavior,
vendor/github.com/apparentlymart/go-cidr/cidr/cidr.go)."""

from __future__ import annotations

import pytest

from baseline_magician_spark.functions.cidr import (
    address_count,
    address_range,
    dec_ip,
    host,
    inc_ip,
    next_subnet,
    previous_subnet,
    subnet,
    verify_no_overlap,
)


def test_address_count_and_range():
    assert address_count("10.0.0.0/24") == 256
    assert address_count("10.0.0.0/32") == 1
    assert address_range("10.1.2.0/24") == ("10.1.2.0", "10.1.2.255")
    assert address_range("0.0.0.0/0") == ("0.0.0.0", "255.255.255.255")


def test_subnet_carving():
    assert subnet("10.0.0.0/16", 8, 0) == "10.0.0.0/24"
    assert subnet("10.0.0.0/16", 8, 5) == "10.0.5.0/24"
    assert subnet("10.0.0.0/16", 8, 255) == "10.0.255.0/24"
    with pytest.raises(ValueError, match="accommodate"):
        subnet("10.0.0.0/16", 8, 256)
    with pytest.raises(ValueError, match="insufficient"):
        subnet("10.0.0.0/30", 4, 0)


def test_host_addressing():
    assert host("10.0.0.0/24", 0) == "10.0.0.0"
    assert host("10.0.0.0/24", 255) == "10.0.0.255"
    with pytest.raises(ValueError, match="accommodate"):
        host("10.0.0.0/24", 256)


def test_base_address_is_masked():
    # net.ParseCIDR masks the address down to the network
    assert subnet("10.0.3.7/16", 8, 0) == "10.0.0.0/24"
    assert address_range("192.168.1.99/24") == ("192.168.1.0", "192.168.1.255")


def test_inc_dec_wrap():
    assert inc_ip("10.0.0.255") == "10.0.1.0"
    assert dec_ip("10.0.1.0") == "10.0.0.255"
    assert inc_ip("255.255.255.255") == "0.0.0.0"


def test_adjacent_subnets_and_rollover():
    assert next_subnet("10.0.0.0/24") == ("10.0.1.0/24", False)
    assert previous_subnet("10.0.1.0/24") == ("10.0.0.0/24", False)
    nxt, rolled = next_subnet("255.255.255.0/24")
    assert rolled and nxt == "0.0.0.0/24"
    prev, rolled = previous_subnet("0.0.0.0/24")
    assert rolled


def test_verify_no_overlap():
    verify_no_overlap(["10.0.0.0/24", "10.0.1.0/24"], "10.0.0.0/16")
    with pytest.raises(ValueError, match="not contained"):
        verify_no_overlap(["10.1.0.0/24"], "10.0.0.0/16")
    with pytest.raises(ValueError, match="overlaps"):
        verify_no_overlap(["10.0.0.0/23", "10.0.1.0/24"], "10.0.0.0/16")


# -- property-based invariants ----------------------------------------

from hypothesis import given, settings, strategies as st


@st.composite
def cidrs(draw, min_mask=0, max_mask=32):
    ip = draw(st.integers(min_value=0, max_value=(1 << 32) - 1))
    mask = draw(st.integers(min_value=min_mask, max_value=max_mask))
    from baseline_magician_spark.functions.ip import long_to_ip4_py

    return f"{long_to_ip4_py(ip)}/{mask}"


@given(cidrs(max_mask=24), st.integers(0, 7))
@settings(max_examples=50, deadline=None)
def test_subnets_partition_their_base(cidr, new_bits):
    from baseline_magician_spark.functions.ip import ip4_to_long_py

    lo_s, hi_s = address_range(cidr)
    lo, hi = ip4_to_long_py(lo_s), ip4_to_long_py(hi_s)
    n = 1 << new_bits
    subs = [subnet(cidr, new_bits, i) for i in range(n)]
    verify_no_overlap(subs, cidr)  # pairwise disjoint, inside base
    total = sum(address_count(s) for s in subs)
    assert total == hi - lo + 1  # they tile the base exactly


@given(cidrs(min_mask=8, max_mask=30))
@settings(max_examples=50, deadline=None)
def test_host_range_roundtrip(cidr):
    from baseline_magician_spark.functions.ip import ip4_to_long_py

    lo_s, hi_s = address_range(cidr)
    assert host(cidr, 0) == lo_s
    assert host(cidr, address_count(cidr) - 1) == hi_s
    assert ip4_to_long_py(inc_ip(lo_s)) == ip4_to_long_py(lo_s) + 1


def test_host_negative_counts_from_end():
    assert host("10.0.0.0/24", -1) == "10.0.0.255"
    assert host("10.0.0.0/24", -256) == "10.0.0.0"
    with pytest.raises(ValueError, match="accommodate"):
        host("10.0.0.0/24", -257)


def test_adjacent_subnets_with_different_prefix_len():
    # go-cidr: next steps past the WHOLE input network, masked to plen
    assert next_subnet("10.0.0.0/8", 24) == ("11.0.0.0/24", False)
    # previous masks (base - 1) down to plen
    assert previous_subnet("10.0.5.0/24", 8) == ("10.0.0.0/8", False)
    assert previous_subnet("10.0.0.0/8", 24) == ("9.255.255.0/24", False)


class TestIPv6:
    """go-cidr is family-agnostic (big.Int over the address width,
    cidr.go:98-129); the port must be too, even though the reference
    APP skips IPv6 networks (main.go:223-226)."""

    def test_address_count_and_range(self):
        from baseline_magician_spark.functions.cidr import (
            address_count,
            address_range,
        )

        assert address_count("2001:db8::/64") == 1 << 64
        lo, hi = address_range("2001:db8::/112")
        assert lo == "2001:db8::"
        assert hi == "2001:db8::ffff"

    def test_subnet_and_host(self):
        from baseline_magician_spark.functions.cidr import host, subnet

        assert subnet("2001:db8::/32", 16, 5) == "2001:db8:5::/48"
        assert host("2001:db8::/112", 1) == "2001:db8::1"
        assert host("2001:db8::/112", -1) == "2001:db8::ffff"

    def test_inc_dec_wrap(self):
        from baseline_magician_spark.functions.cidr import dec_ip, inc_ip

        assert inc_ip("2001:db8::ffff") == "2001:db8::1:0"
        assert dec_ip("2001:db8::1:0") == "2001:db8::ffff"
        assert inc_ip("ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff") == "::"
        assert dec_ip("::") == "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff"

    def test_adjacent_subnets_and_rollover(self):
        from baseline_magician_spark.functions.cidr import (
            next_subnet,
            previous_subnet,
        )

        nxt, rolled = next_subnet("2001:db8::/48")
        assert nxt == "2001:db8:1::/48" and not rolled
        prev, rolled = previous_subnet("2001:db8:1::/48")
        assert prev == "2001:db8::/48" and not rolled
        _, rolled = next_subnet("ffff:ffff:ffff:ffff::/64")
        assert rolled
        _, rolled = previous_subnet("::/64")
        assert rolled

    def test_overlap_mixed_family_rejected(self):
        import pytest as _pytest

        from baseline_magician_spark.functions.cidr import verify_no_overlap

        verify_no_overlap(
            ["2001:db8::/64", "2001:db8:0:1::/64"], "2001:db8::/32"
        )
        with _pytest.raises(ValueError, match="not contained"):
            verify_no_overlap(["10.0.0.0/24"], "2001:db8::/32")
