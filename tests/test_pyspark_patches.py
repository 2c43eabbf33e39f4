"""Version guards for the two pyspark-internal performance patches
(catalog._patch_pyspark_driver_overheads). If a pyspark upgrade
renames either internal, these tests fail LOUDLY instead of the
optimization silently evaporating (ADVICE r11 #2)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_debugging_cache_attr_still_exists():
    import pyspark.errors.utils as eu

    assert hasattr(eu, "_enable_debugging_cache"), (
        "pyspark renamed errors.utils._enable_debugging_cache — the "
        "call-site-capture disable in catalog.py no longer applies; "
        "re-find the flag or retire the patch"
    )


def test_get_jvm_function_attr_still_exists():
    import pyspark.sql.functions.builtin as b

    assert hasattr(b, "_get_jvm_function"), (
        "pyspark renamed functions.builtin._get_jvm_function — the "
        "JVM function-handle cache in catalog.py no longer applies"
    )


def test_handle_cache_installed_and_transparent(spark):
    import pyspark.sql.functions.builtin as b

    # get_spark (the session fixture) installs the patch
    assert getattr(b._get_jvm_function, "_bms_cached", False)
    # cached handles still build working Columns, twice (cache hit)
    df = spark.range(3)
    for _ in range(2):
        rows = df.select(
            F.xxhash64(F.col("id")).alias("h"),
            F.sha1(F.col("id").cast("string").cast("binary")).alias("s"),
        ).collect()
        assert len(rows) == 3


def test_patch_is_idempotent():
    import pyspark.sql.functions.builtin as b

    from baseline_magician_spark.catalog import (
        _patch_pyspark_driver_overheads,
    )

    before = b._get_jvm_function
    _patch_pyspark_driver_overheads()
    assert b._get_jvm_function is before  # no double wrapping
