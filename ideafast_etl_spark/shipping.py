"""Ship this package to Python workers of a foreign SparkSession.

Our own session factory (session.py) exports the repo root on PYTHONPATH,
but the differential-oracle driver runs queries under ITS session, whose
executors know nothing about this repo. Any Arrow UDF whose closure
references a module of this package (cloudpickle serialises module-level
functions BY REFERENCE) then fails to unpickle on the worker. The fix is
Spark's own mechanism for exactly this: zip the package and
``sparkContext.addPyFile`` it — workers prepend the shipped zip to their
import path. Idempotent per SparkContext; costs one ~50 KB zip per session.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_spark_graft_pkg_shipped"


def ensure_package_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    fd, zpath = tempfile.mkstemp(prefix="spark_graft_pkg_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for cur, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(cur, fn)
                    z.write(p, os.path.relpath(p, root))
    sc.addPyFile(zpath)
    setattr(sc, _FLAG, True)
