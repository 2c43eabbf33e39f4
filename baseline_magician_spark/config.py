"""Job configuration — parity with BaselineMagicianConfiguration.

Field-for-field equivalent of the reference's config struct
(main.go:20-50) with the same defaults (main.go:62-73) and the same
JSON overlay semantics (main.go:75-86): missing keys keep defaults,
unknown keys are ignored.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, fields


@dataclass
class BaselineConfig:
    # window & scheduling
    calculation_period_seconds: int = 7 * 24 * 3600  # 7 days
    recalculation_interval_seconds: int = 3600
    # aggregation: "avg" (default) or "max" (main.go:89-91)
    aggregation_function: str = "avg"
    # threshold expressions (govaluate mini-language over `value`)
    incoming_packet_expression: str = ""
    outgoing_packet_expression: str = ""
    incoming_bit_expression: str = ""
    outgoing_bit_expression: str = ""
    incoming_flow_expression: str = ""
    outgoing_flow_expression: str = ""
    # per-channel enable flags
    enable_incoming_packets: bool = True
    enable_outgoing_packets: bool = True
    enable_incoming_bits: bool = True
    enable_outgoing_bits: bool = True
    enable_incoming_flows: bool = False
    enable_outgoing_flows: bool = False
    # sources / sinks
    metrics_table: str = "host_metrics"
    metrics_database: str = "fastnetmon"
    api_base_url: str = ""
    api_user: str = ""
    api_password: str = ""
    networks: list[str] = field(default_factory=list)

    @classmethod
    def from_json(cls, text: str) -> "BaselineConfig":
        raw = json.loads(text)
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})

    @property
    def spark_agg(self) -> str:
        fn = (self.aggregation_function or "avg").lower()
        if fn not in ("avg", "max"):
            raise ValueError(f"unsupported aggregation_function {fn!r}")
        return fn
