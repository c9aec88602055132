"""vptstools_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of aloftdata/vptstools, re-designed Spark-first.

Public API mirrors the reference's four entry points
(reference: src/vptstools/__init__.py:20):

- :func:`vp`     — convert one ODIM HDF5 VP file to a VPTS-CSV-shaped DataFrame
- :func:`vpts`   — convert many VP files to one globally-sorted VPTS DataFrame
- :func:`vpts_to_csv` — write the VPTS DataFrame to CSV (single file per target)
- :func:`validate_vpts` — schema-conformance check of a VPTS DataFrame

Everything is expressed as Spark DataFrame plans (Catalyst-optimizable); the
only imperative code is the per-file HDF5 parse inside ``mapInPandas``.
"""

from vptstools_spark.operators.vpts import (  # noqa: F401
    vp,
    vpts,
    vpts_to_csv,
    validate_vpts,
)
from vptstools_spark.schemas import get_vpts_version  # noqa: F401

__all__ = ["vp", "vpts", "vpts_to_csv", "validate_vpts", "get_vpts_version"]
__version__ = "0.1.0"
