"""Workbook-link discovery: scrape a publication landing page for
spreadsheet links and map them to logical table ids.

Parity: queens/core/web_scraping.py:8-85 (GOV.UK DUKES chapter pages).
Uses stdlib html.parser (no bs4 dependency); the HTTP fetch is
separated from the HTML parsing so tests run fully offline and other
collections can plug their own parser via SCRAPERS.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Callable

DEFAULT_TIMEOUT = 30

#: "DUKES 1.1a Some description.xlsx" → table "1.1", suffix "a";
#: letter tables like "DUKES J.1" also match.
TABLE_ID_PATTERN = re.compile(
    r"DUKES[\s,]*((?:\d+(?:\.\d+)*|[A-Z](?:\.\d+)+))([a-z]*)", re.IGNORECASE
)


class _SpreadsheetLinkParser(HTMLParser):
    """Collect (href, anchor_text) for every spreadsheet anchor."""

    def __init__(self):
        super().__init__()
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._text: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = dict(attrs).get("href", "")
            if re.search(r"\.xlsx?($|\?)", href, re.IGNORECASE):
                self._href = href
                self._text = []

    def handle_data(self, data):
        if self._href is not None:
            self._text.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._href is not None:
            self.links.append((self._href, " ".join(self._text).strip()))
            self._href = None


def parse_dukes_links(html: str) -> dict[str, dict[str, str]]:
    """HTML → {table_id: {"description": ..., "url": ...}}. The table
    id comes from the anchor text (or the URL when the text has none);
    a lowercase suffix is normalised into the id ("1.1a" → "1.1.A")."""
    parser = _SpreadsheetLinkParser()
    parser.feed(html)
    out: dict[str, dict[str, str]] = {}
    for href, text in parser.links:
        m = TABLE_ID_PATTERN.search(text) or TABLE_ID_PATTERN.search(href)
        if not m:
            continue
        table = m.group(1)
        suffix = m.group(2)
        if suffix:
            table = f"{table}.{suffix.upper()}"
        out[table] = {"description": text or href, "url": href}
    return out


def fetch_html(url: str, timeout: int = DEFAULT_TIMEOUT) -> str:
    """Network boundary — isolated so everything else tests offline."""
    import requests

    resp = requests.get(url, timeout=timeout)
    resp.raise_for_status()
    return resp.text


def scrape_urls(data_collection: str, url: str) -> dict[str, dict[str, str]]:
    """Pluggable per-collection dispatch (≙ SCRAPERS_MAP,
    queens/core/web_scraping.py:65-67)."""
    if data_collection not in SCRAPERS:
        raise KeyError(f"no scraper registered for '{data_collection}'")
    return SCRAPERS[data_collection](fetch_html(url))


SCRAPERS: dict[str, Callable[[str], dict]] = {
    "dukes": parse_dukes_links,
}
