"""Ship this package to Python workers.

Operators built on mapInPandas/pandas UDFs close over functions in this
package; cloudpickle serializes those by reference, so every Python
worker must be able to ``import baseline_magician_spark``. The driver
contract gives us a bare SparkSession (no PYTHONPATH guarantees), so any
operator that runs Python on executors calls :func:`ensure_shipped`
first — it zips the package once per SparkContext and registers it with
``addPyFile``, which places it on the worker search path. On a real
cluster the same call distributes the package to every executor; no
deploy-time --py-files plumbing required.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="bms_pyfiles_"), f"{pkg_name}.zip"
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
