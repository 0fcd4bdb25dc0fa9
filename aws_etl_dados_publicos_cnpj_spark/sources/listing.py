"""Source-listing scan — the engine's form of the reference's HTML
directory scrape (S1–S3, ``lambdas/check_update/check_update.py:40-53,95-97``).

The listing is tiny metadata (tens of rows), so parsing happens
driver-side and the rows become a small DataFrame that feeds the
pure-DataFrame planner (``plans/planner.py``). The HTML parser is gated
behind an import-try (bs4 may be absent); the planner itself only needs
the parsed-row DataFrame, so tests inject rows directly
(FIXTURES.md §A.6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType(), True),
        T.StructField("href", T.StringType(), True),
        T.StructField("last_modified", T.StringType(), True),  # 'YYYY-MM-DD HH:MM'
        T.StructField("is_folder", T.BooleanType(), True),
    ]
)


@dataclass
class ListingRow:
    file_name: str
    href: str
    last_modified: str
    is_folder: bool


def listing_df(spark: SparkSession, rows: list[ListingRow] | list[tuple]) -> DataFrame:
    """Materialize parsed listing rows as the planner's input DataFrame."""
    data = [
        (r.file_name, r.href, r.last_modified, r.is_folder)
        if isinstance(r, ListingRow)
        else tuple(r)
        for r in rows
    ]
    return spark.createDataFrame(data, LISTING_SCHEMA)


def parse_listing_html(html: str) -> list[ListingRow]:
    """Parse an Apache-style index page into listing rows.

    Mirrors the reference's row walk (``check_update.py:40-50``): each
    ``<tr>`` holds an icon ``<img>``, an ``<a href>`` file link, and a
    last-modified cell; the first 3 rows and the final row are
    header/nav chrome (``check_update.py:46``) — that slice is applied
    here as part of parsing (it is an artifact of the HTML table, not of
    the data), while the folder/name/date logic stays in the DataFrame
    planner.
    """
    try:
        from bs4 import BeautifulSoup  # type: ignore
    except ImportError as exc:  # pragma: no cover - bs4 is present in CI
        raise RuntimeError("beautifulsoup4 required for HTML listing parse") from exc

    soup = BeautifulSoup(html, "html.parser")
    rows = soup.find_all("tr")[3:-1]
    out: list[ListingRow] = []
    for tr in rows:
        img = tr.find("img")
        link = tr.find("a")
        cells = tr.find_all("td")
        if link is None or len(cells) < 3:
            continue
        icon_src = (img.get("src", "") if img else "") or ""
        out.append(
            ListingRow(
                file_name=link.text.strip(),
                href=link.get("href", ""),
                last_modified=cells[2].text.strip() if len(cells) > 2 else "",
                is_folder="folder" in icon_src,
            )
        )
    return out


def fetch_listing(spark: SparkSession, url: str, timeout: float = 15.0) -> DataFrame:
    """Scrape a live index page (15 s timeout per
    ``cnpj_infra_template.yml:135``) → listing DataFrame."""
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 - source URL is operator-supplied
        html = resp.read().decode("utf-8", errors="replace")
    return listing_df(spark, parse_listing_html(html))
