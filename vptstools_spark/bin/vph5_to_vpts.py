"""``vph5_to_vpts`` — convert and aggregate HDF5 VP files to daily and
monthly VPTS CSV files.

Option-for-option mirror of the reference CLI
(reference: src/vptstools/bin/vph5_to_vpts.py:30-251): ``--modified-days-ago``
drives inventory-based incremental selection, ``--path-folder`` (the
reference's ``--path-s3-folder``) recreates every radar-day under one
subtree instead. Where the reference loops radar-days on the driver
(download → pandas convert → upload per day), this CLI runs ONE Spark plan
per phase: binaryFile scan of all affected days' files → daily
partition-overwrite write → monthly rollup — then publishes the partition
files under the reference's S3-style names
(``{source}/daily/{radar}/{yyyy}/{radar}_vpts_{yyyymmdd}.csv`` and
``{source}/monthly/{radar}/{yyyy}/{radar}_vpts_{yyyymm}.csv.gz``,
reference: src/vptstools/s3.py:133-153).

Storage roots come from environment variables (the reference reads bucket
names the same way; here they are filesystem URIs, so any Hadoop-supported
store works — local paths in tests, ``s3a://`` buckets in production):

- ``VPTS_MANIFEST``: inventory manifest JSON (reference ``INVENTORY_BUCKET``)
- ``VPTS_H5_ROOT``: root of the HDF5 tree the inventory keys point into
  (reference ``DESTINATION_BUCKET`` read side)
- ``VPTS_DESTINATION``: output root for coverage.csv + daily/ + monthly/
  (reference ``DESTINATION_BUCKET`` write side)
- ``VPTS_NOW``: ISO timestamp freezing "now" (deterministic reruns/tests)
"""

from __future__ import annotations

import glob
import os
import shutil

import click

from vptstools_spark.functions.paths import with_parsed_inventory
from vptstools_spark.operators.inventory import coverage, handle_manifest
from vptstools_spark.operators.pipeline import (
    daily_vpts_job,
    monthly_vpts_job,
    write_descriptor,
)
from vptstools_spark.session import get_spark


def _write_single_csv(df, path: str) -> None:
    """Small driver-published CSV (coverage is radar-days-sized, not data-
    sized): one part file, renamed to the target path."""
    tmp = path + "._spark_tmp"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*"))[0]
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    shutil.move(part, path)
    shutil.rmtree(tmp)


def _publish(partition_glob: str, target: str) -> bool:
    """Copy the single partition part-file to its reference-named location."""
    parts = sorted(glob.glob(partition_glob))
    if not parts:
        return False
    os.makedirs(os.path.dirname(target), exist_ok=True)
    shutil.copyfile(parts[0], target)
    return True


def run(
    modified_days_ago: int = 2,
    path_folder: str | None = None,
    manifest: str | None = None,
    h5_root: str | None = None,
    destination: str | None = None,
    now: str | None = None,
    spark=None,
) -> dict:
    """Library form of the CLI (importable; the click command is a shell).

    Returns {"days": [...], "daily": n, "monthly": n} for callers/tests.
    """
    manifest = manifest or os.environ.get("VPTS_MANIFEST")
    h5_root = h5_root or os.environ.get("VPTS_H5_ROOT")
    destination = destination or os.environ.get("VPTS_DESTINATION")
    now = now or os.environ.get("VPTS_NOW")
    if not h5_root or not destination:
        raise click.UsageError("VPTS_H5_ROOT and VPTS_DESTINATION must be set")
    spark = spark or get_spark("vph5_to_vpts")

    if path_folder:
        # reference --path-s3-folder mode (vph5_to_vpts.py:100-119): recreate
        # every radar-day under the subtree; the inventory is not consulted
        click.echo(
            f"Applying the vpts conversion to all files within {path_folder}. "
            "Ignoring the modified date of the files."
        )
        names = glob.glob(
            os.path.join(h5_root, path_folder, "**", "*.h5"), recursive=True
        ) + glob.glob(os.path.join(h5_root, path_folder, "*.h5"))
        if not names:
            raise click.ClickException(
                f"No h5 files could be found in the current path "
                f"'{os.path.join(h5_root, path_folder)}'."
            )
        rel = [os.path.relpath(p, h5_root) for p in sorted(set(names))]
        listing = spark.createDataFrame([(k,) for k in rel], "file string")
        days = coverage(with_parsed_inventory(listing))
    else:
        if not manifest:
            raise click.UsageError("VPTS_MANIFEST must be set (or use --path-folder)")
        click.echo(
            f"Extract coverage and days to recreate from manifest {manifest}."
        )
        if modified_days_ago == 0:
            modified_days_ago = 10_000  # reference: full-bucket recreate
            click.echo(
                "Recreate the full set of files (files modified since "
                f"{modified_days_ago} days). This will take a while!"
            )
        df_cov, days = handle_manifest(
            spark, manifest, modified_days_ago=modified_days_ago, now=now
        )
        click.echo("Save coverage file to S3.")
        _write_single_csv(
            df_cov.orderBy("directory"), os.path.join(destination, "coverage.csv")
        )

    day_rows = days.collect()  # radar-days are driver-sized (the work list)
    click.echo(f"Create {len(day_rows)} daily VPTS files.")
    if not day_rows:
        click.echo("Finished VPTS update procedure.")
        return {"days": [], "daily": 0, "monthly": 0}

    from vptstools_spark.sources.odim import read_vp_files

    day_dirs = [r["directory"] for r in day_rows]
    profiles = read_vp_files(
        spark, [os.path.join(h5_root, d, "*.h5") for d in day_dirs]
    )
    keys = []
    for d in day_dirs:
        source, _ftype, radar, yyyy, mm, dd = d.split("/")
        keys.append((source, radar, yyyy, mm, dd, f"{yyyy}{mm}{dd}"))
    days_keys = spark.createDataFrame(
        [(k[1], k[5]) for k in keys], "radar_code string, date string"
    )
    daily_store = os.path.join(destination, "_daily_store")
    monthly_store = os.path.join(destination, "_monthly_store")
    daily_vpts_job(spark, profiles, days_keys, daily_store)

    n_daily = 0
    for source, radar, yyyy, mm, dd, ymd in keys:
        target = os.path.join(
            destination, source, "daily", radar, yyyy, f"{radar}_vpts_{ymd}.csv"
        )
        click.echo(f"Create daily VPTS file {os.path.relpath(target, destination)}.")
        if _publish(
            os.path.join(daily_store, f"p_radar={radar}", f"p_date={ymd}", "*.csv"),
            target,
        ):
            n_daily += 1
    click.echo("Finished creating daily VPTS files.")

    months = sorted({(s, r, y, m) for s, r, y, m, _d, _ymd in keys})
    click.echo(f"Create {len(months)} monthly VPTS files.")
    monthly_vpts_job(
        spark, daily_store, monthly_store, [f"{y}{m}" for _s, _r, y, m in months]
    )
    n_monthly = 0
    for source, radar, yyyy, mm in months:
        target = os.path.join(
            destination,
            source,
            "monthly",
            radar,
            yyyy,
            f"{radar}_vpts_{yyyy}{mm}.csv.gz",
        )
        click.echo(
            f"Create monthly VPTS file {os.path.relpath(target, destination)}."
        )
        if _publish(
            os.path.join(
                monthly_store, f"p_radar={radar}", f"p_month={yyyy}{mm}", "*.csv.gz"
            ),
            target,
        ):
            n_monthly += 1
    click.echo("Finished creating monthly VPTS files.")

    write_descriptor(destination)
    click.echo("Finished VPTS update procedure.")
    return {"days": day_dirs, "daily": n_daily, "monthly": n_monthly}


@click.command()
@click.option(
    "--modified-days-ago",
    "modified_days_ago",
    default=2,
    type=int,
    help="Range of HDF5 VP files to include, i.e. files modified between now "
    "and N modified-days-ago. If 0, all HDF5 files will be included.",
)
@click.option(
    "--path-folder",
    "path_folder",
    type=str,
    default=None,
    help="Apply the conversion to VPTS to all files within a sub-folder "
    "instead of using the modified date of the files. This option does not "
    "use the inventory files.",
)
def cli(modified_days_ago: int, path_folder: str | None = None) -> None:
    """Convert and aggregate HDF5 VP files to daily and monthly VPTS CSV files."""
    run(modified_days_ago=modified_days_ago, path_folder=path_folder)


if __name__ == "__main__":
    cli()
