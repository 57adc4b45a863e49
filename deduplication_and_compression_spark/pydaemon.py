"""PySpark worker daemon with the engine's heavyweight imports
preloaded (guide §4.5 taken one level up: heavyweight init once per
DAEMON, not once per worker).

Python workers fork from the daemon process, so every module imported
here is inherited copy-on-write by every worker for free.  Without
this, the FIRST task wave of any Arrow/pandas UDF stage pays
``import pandas`` + ``import pyarrow`` (plus the engine's numpy
kernels) once per worker — 32 concurrent cold imports at local[32],
measured ~7 s on the bench image pipeline's signature stage
(sig_minhash 8.2 s cold vs 0.85 s warm, OPTIMIZATION_r07.md), and a
1000-executor deployment re-pays it on every fresh executor.

Wired in session.py via ``spark.python.daemon.module``; the module
resolves exactly like the engine package itself (workers run with the
driver's cwd on local mode, and on a cluster the package ships with
the job).  Import failures fall through to a bare daemon rather than
breaking worker spawn — preloading is an optimization, never a
correctness dependency.
"""

from __future__ import annotations

try:  # heavyweight third-party deps used by every Arrow-batched kernel
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
except Exception:  # pragma: no cover - missing optional dep on a worker
    pass

try:  # serializer machinery the worker would import on first task
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.sql.pandas.types  # noqa: F401
except Exception:  # pragma: no cover
    pass

try:  # the engine's own kernel modules (numpy hashing, similarity)
    import deduplication_and_compression_spark.functions.hashing  # noqa: F401
    import deduplication_and_compression_spark.functions.text  # noqa: F401
except Exception:  # pragma: no cover - package not importable on worker
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
