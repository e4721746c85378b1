"""URL parse/canonicalize kernel tests (functions/url.py) — pure Arrow,
no Ray needed. The driver queries `url_parse` / `domain_stats` carry the
DuckDB oracle; these pin the tricky rows the synthetic builder can't reach."""

import pyarrow as pa

from ethereum_etl_ray.functions.url import (
    canonicalize_urls_batch,
    parse_urls_batch,
)


def _parse(urls):
    return parse_urls_batch(pa.table({"url": pa.array(urls, pa.string())}))


def _canon(urls):
    t = canonicalize_urls_batch(pa.table({"url": pa.array(urls, pa.string())}))
    return t.column("canonical_url").to_pylist()


def test_parse_full_url():
    r = _parse(["HTTP://User:pw@WWW.Example.ORG:8080/a/b?x=1&y=2#frag"]).to_pylist()[0]
    assert r["scheme"] == "http"
    assert r["host"] == "www.example.org"      # lowercased
    assert r["port"] == "8080"
    assert r["path"] == "/a/b"
    assert r["query"] == "x=1&y=2"
    assert r["fragment"] == "frag"
    assert r["domain"] == "example.org"


def test_parse_edge_rows():
    rows = _parse([
        "https://example.com",        # no path
        "http://h:/weird",            # empty port capture
        "http://localhost/x",         # single-label host
        "relative/path?q=2",          # no scheme/host
        None,
    ]).to_pylist()
    assert rows[0]["path"] == "" and rows[0]["port"] is None
    assert rows[1]["port"] is None and rows[1]["host"] == "h"
    assert rows[2]["domain"] == "localhost"
    assert rows[3]["scheme"] is None and rows[3]["host"] is None
    assert rows[3]["path"] == "relative/path" and rows[3]["query"] == "q=2"
    assert all(v is None for k, v in rows[4].items() if k != "url")


def test_canonicalize_normalizations():
    assert _canon([
        "HTTP://WWW.Ex.org:80/a?x=1#frag",   # default port + fragment + case
        "https://ex.org:443/b",              # https default port
        "https://ex.org:8443/b",             # non-default port kept
        "https://ex.org",                    # empty path -> /
        "http://ex.org/c?",                  # empty query == absent query
        "http://u:p@ex.org/d",               # userinfo dropped
        "relative/only",                     # not canonicalizable
        None,
    ]) == [
        "http://www.ex.org/a?x=1",
        "https://ex.org/b",
        "https://ex.org:8443/b",
        "https://ex.org/",
        "http://ex.org/c",
        "http://ex.org/d",
        None,
        None,
    ]


def test_canonical_is_idempotent():
    urls = ["HTTP://WWW.Ex.org:80/a?x=1#f", "https://A.B.C.co.uk:443/"]
    once = _canon(urls)
    assert _canon(once) == once


def test_equivalent_urls_share_canonical_key():
    a, b = _canon(["http://EX.org:80/p?q=1#x", "HTTP://ex.ORG/p?q=1"])
    assert a == b
