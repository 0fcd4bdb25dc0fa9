"""Listing HTML parse (S1-S2) and the retry wrapper (S18)."""

from __future__ import annotations

import pytest

from aws_etl_dados_publicos_cnpj_spark.sources.acquisition import retry
from aws_etl_dados_publicos_cnpj_spark.sources.listing import parse_listing_html

INDEX_HTML = """
<html><body><table>
<tr><th>Icon</th><th>Name</th><th>Last modified</th><th>Size</th></tr>
<tr><th colspan="4"><hr></th></tr>
<tr><td><img src="/icons/back.gif"></td><td><a href="/up">Parent Directory</a></td><td></td><td>-</td></tr>
<tr><td><img src="/icons/folder.gif"></td><td><a href="regime/">regime/</a></td><td>2023-04-14 10:00</td><td>-</td></tr>
<tr><td><img src="/icons/compressed.gif"></td><td><a href="Empresas0.zip">Empresas0.zip</a></td><td>2023-05-06 10:22</td><td>200M</td></tr>
<tr><td><img src="/icons/compressed.gif"></td><td><a href="Municipios.zip">Municipios.zip</a></td><td>2023-05-06 10:23</td><td>1M</td></tr>
<tr><th colspan="4"><hr></th></tr>
</table></body></html>
"""


def test_parse_listing_slices_chrome_and_flags_folders():
    rows = parse_listing_html(INDEX_HTML)
    # first 3 rows (header, hr, parent) and final hr row are dropped
    assert [r.file_name for r in rows] == ["regime/", "Empresas0.zip", "Municipios.zip"]
    assert [r.is_folder for r in rows] == [True, False, False]
    assert rows[1].href == "Empresas0.zip"
    assert rows[1].last_modified == "2023-05-06 10:22"


def test_retry_succeeds_after_failures():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert retry(flaky, attempts=3, interval_s=60.0, backoff=2.0, sleep=sleeps.append) == "ok"
    assert sleeps == [60.0, 120.0]  # reference policy: 60 s interval, x2 backoff


def test_retry_exhausts():
    def always_fails():
        raise OSError("down")

    with pytest.raises(OSError):
        retry(always_fails, attempts=2, interval_s=0.0, sleep=lambda _: None)


def test_acquisition_failure_surfaces(spark, tmp_path):
    """A dead manifest URL must fail the run loudly after retries, not
    land a partial snapshot silently."""
    from aws_etl_dados_publicos_cnpj_spark.sources.acquisition import acquire_manifest

    manifest = spark.createDataFrame(
        [(f"file://{tmp_path}/does_not_exist.zip", "municipios", "20230506")],
        "url string, table_name string, date string",
    )
    with pytest.raises(Exception):
        acquire_manifest(manifest, str(tmp_path / "scratch"))
