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
