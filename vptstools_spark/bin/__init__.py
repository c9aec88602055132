"""Operational CLI entry points mirroring the reference's two commands
(reference: src/vptstools/bin/vph5_to_vpts.py, bin/transfer_baltrad.py).

No pip install is required: run as modules with the repo on sys.path —

    python -m vptstools_spark.bin.vph5_to_vpts --modified-days-ago 3
    python -m vptstools_spark.bin.transfer_baltrad
"""
