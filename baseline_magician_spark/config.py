"""Job configuration — parity with BaselineMagicianConfiguration.

Field-for-field equivalent of the reference's config struct
(main.go:20-50) with the same defaults (main.go:62-73, 89-91) and the
same JSON overlay semantics (main.go:75-86): missing keys keep
defaults, unknown keys are ignored. The reference's JSON key for the
window is the (sic) typo ``calculaton_period`` — accepted verbatim so
real config files keep working; the corrected spelling is accepted too.

Extension beyond the reference: ``extra_channel_expressions`` lets
callers drive the generalized six-channel threshold surface
(plans.baseline.REFERENCE_CHANNELS) that the reference's three
incoming-only channels are a subset of.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, fields


@dataclass
class BaselineConfig:
    # window (main.go:62; JSON key "calculaton_period")
    calculation_period_seconds: int = 7 * 24 * 3600
    # "avg" (default, main.go:89-91) or "max"
    aggregation_function: str = "avg"

    # threshold channels (main.go:42-47); Generate* default false
    generate_incoming_packet_threshold: bool = False
    incoming_packet_expression: str = ""
    generate_incoming_bit_threshold: bool = False
    incoming_bit_expression: str = ""
    generate_incoming_flow_threshold: bool = False
    incoming_flow_expression: str = ""

    # sink overwrite mode (main.go:39-40, 153-185)
    remove_existing_hostgroups: bool = False

    # metrics source (main.go:30-31, defaults main.go:72-73)
    metrics_database: str = "fastnetmon"
    metrics_table: str = "host_metrics"

    # FastNetMon API endpoint (main.go:33-36, defaults main.go:67-70)
    api_host: str = "127.0.0.1"
    api_port: int = 10007
    api_user: str = "admin"
    api_password: str = "test_password"

    # extension: extra channels beyond the reference surface, e.g.
    # {"outgoing_packets": "value * 2"}
    extra_channel_expressions: dict[str, str] = field(default_factory=dict)
    networks: list[str] = field(default_factory=list)

    # reference JSON key -> field name (main.go:20-50 struct tags)
    _JSON_ALIASES = {
        "calculaton_period": "calculation_period_seconds",
        "calculation_period": "calculation_period_seconds",
        "clickhouse_database": "metrics_database",
        "clickhouse_table": "metrics_table",
    }

    @classmethod
    def from_json(cls, text: str) -> "BaselineConfig":
        raw = json.loads(text)
        known = {f.name for f in fields(cls)}
        kwargs = {}
        for k, v in raw.items():
            k = cls._JSON_ALIASES.get(k, k)
            if k in known:
                kwargs[k] = v
        cfg = cls(**kwargs)
        # main.go:89-91 — empty string falls back to avg
        if not cfg.aggregation_function:
            cfg.aggregation_function = "avg"
        return cfg

    @property
    def spark_agg(self) -> str:
        fn = (self.aggregation_function or "avg").lower()
        if fn not in ("avg", "max"):
            raise ValueError(f"unsupported aggregation_function {fn!r}")
        return fn

    @property
    def api_base_url(self) -> str:
        return f"http://{self.api_host}:{self.api_port}"

    def channel_expressions(self) -> dict[str, str]:
        """Enabled channel -> expression source, keyed by the channel
        names in plans.baseline.REFERENCE_CHANNELS. The reference
        evaluates a channel only when its Generate* flag is set
        (main.go:352, 380, 409)."""
        out: dict[str, str] = {}
        if self.generate_incoming_packet_threshold:
            out["incoming_packets"] = self.incoming_packet_expression
        if self.generate_incoming_bit_threshold:
            out["incoming_bits"] = self.incoming_bit_expression
        if self.generate_incoming_flow_threshold:
            out["incoming_flows"] = self.incoming_flow_expression
        out.update(self.extra_channel_expressions)
        return out
