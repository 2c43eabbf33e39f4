"""Networks-list + current-hostgroups sources (SURVEY §2.1 S2/S3/S5).

Three ways the reference obtains its CIDR dimension:

- CLI flag ``-networks_list`` — comma-split, each entry validated with
  net.ParseCIDR, invalid entries skipped with a log line
  (main.go:114-126). IPv6 entries are KEPT here (the IPv6 skip happens
  later in the pipeline, main.go:223-226).
- REST ``GET /main/networks_list`` -> ResponseArrayJson{success,
  error_text, values} (fnm/main.go:454-477).
- config file ``networks`` key (our extension; the reference has no
  such key but our config carries one for fully-offline runs).

The result feeds plans.baseline.networks_dataframe, which builds the
broadcastable (network, start_long, end_long, masklen) dimension.
"""

from __future__ import annotations

import ipaddress
import logging

from .rest import HttpTransport, RestError, Transport

log = logging.getLogger(__name__)


def networks_from_cli(spec: str) -> list[str]:
    """Parse the -networks_list flag value (main.go:114-126): comma
    split; entries net.ParseCIDR would reject are skipped with a log
    line; the ORIGINAL string is kept (host bits intact, e.g.
    192.168.1.33/24 — the range predicate later uses the masked
    network address, main.go:234-236)."""
    out: list[str] = []
    for entry in spec.split(","):
        entry = entry.strip()
        try:
            ipaddress.ip_network(entry, strict=False)
        except ValueError as e:
            log.warning("Cannot parse CIDR network: %s because of error: %s", entry, e)
            continue
        out.append(entry)
    return out


def fetch_networks_list(
    base_url: str,
    auth: tuple[str, str],
    transport: Transport | None = None,
) -> list[str]:
    """GET /main/networks_list (fnm/main.go:454-477)."""
    http = HttpTransport(transport)
    body = http("GET", f"{base_url}/main/networks_list", auth)
    if not body.get("success", False):
        raise RestError(body.get("error_text") or "networks_list request failed")
    return list(body.get("values") or [])


def fetch_current_hostgroups(
    base_url: str,
    auth: tuple[str, str],
    transport: Transport | None = None,
) -> list[dict]:
    """GET /hostgroup -> list of Ban_settings_t dicts
    (fnm/main.go:480-503); feeds the sink's overwrite semantics."""
    http = HttpTransport(transport)
    body = http("GET", f"{base_url}/hostgroup", auth)
    if not body.get("success", False):
        raise RestError(body.get("error_text") or "hostgroup request failed")
    return list(body.get("values") or [])
