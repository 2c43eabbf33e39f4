"""CLI entry point (python -m baseline_magician_spark): reference-shaped
config + -networks_list flag + parquet fact table -> dry-run JSON."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_cli_dry_run(spark, tmp_path, capsys):
    from baseline_magician_spark.__main__ import main

    metrics_path = str(tmp_path / "host_metrics")
    (
        spark.createDataFrame(
            [(f"10.0.0.{i}", 100 + i) for i in range(50)],
            "host string, packets_incoming long",
        )
        .withColumn(
            "metricDateTime",
            F.current_timestamp() - F.make_dt_interval(secs=F.lit(60)),
        )
        .write.mode("overwrite")
        .parquet(metrics_path)
    )

    config_path = tmp_path / "baseline_magician.conf"
    config_path.write_text(json.dumps({
        "calculaton_period": 604800,
        "aggregation_function": "max",
        "generate_incoming_packet_threshold": True,
        "incoming_packet_expression": "value * 2",
    }))

    rc = main([
        "--config", str(config_path),
        "--metrics-path", metrics_path,
        "--networks_list", "10.0.0.0/24,bogus,10.9.0.0/24",
        "--dry-run",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    # bogus skipped; 10.9.0.0/24 has no traffic -> dropped; one group
    assert [g["name"] for g in out] == ["10_0_0_0_24"]
    assert out[0]["threshold_pps"] == 149 * 2
    assert out[0]["ban_for_pps"] is True


def test_run_query_prints_jsonl(spark, capsys):
    import json

    from baseline_magician_spark.__main__ import main
    from conftest import SF_ORACLE

    rc = main(["--run-query", "q6_forecast_revenue", "--sf-dir", SF_ORACLE])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    row = json.loads(out[0])
    assert "revenue" in {k.lower() for k in row}


def test_run_query_unknown_name_errors(spark, capsys):
    import pytest as _pytest

    from baseline_magician_spark.__main__ import main

    with _pytest.raises(SystemExit):
        main(["--run-query", "no_such_query"])
    assert "unknown query" in capsys.readouterr().err


def test_metrics_path_still_required_without_run_query(spark, capsys):
    import pytest as _pytest

    from baseline_magician_spark.__main__ import main

    with _pytest.raises(SystemExit):
        main(["--dry-run"])
    assert "--metrics-path is required" in capsys.readouterr().err


def test_cli_run_sql(capsys):
    import json

    from baseline_magician_spark.__main__ import main

    rc = main([
        "--run-sql",
        "SELECT o_orderstatus, count(*) AS n FROM orders "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    assert rc == 0
    lines = [
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
    ]
    assert [l["o_orderstatus"] for l in lines] == ["F", "O", "P"]
    assert sum(l["n"] for l in lines) == 1500
