"""Vectorized URL parsing / canonicalization over Arrow string columns.

Web-corpus pipelines key almost everything on the URL (the engine's CDC lake
key, SURVEY §1.4) — per-domain quotas, host-level dedup, crawl-politeness
grouping all need `url → (scheme, host, port, path, registrable domain)` and
a canonical form that makes `HTTP://WWW.Ex.org:80/a` and `http://www.ex.org/a`
the same key. The reference keys rows on 0x-hex addresses and never parses
them (SURVEY §1.2); this module supplies the webtext analogue.

Everything is one RE2 `pc.extract_regex` (RFC 3986 appendix-B grammar) plus
Arrow kernels — no per-row Python. Registrable domain is the last-two-labels
heuristic (no public-suffix list in this container; documented limitation —
`co.uk`-style suffixes collapse to `co.uk`).

Scale: stateless map_batches, zero shuffle; the per-domain aggregate in
pipelines/queries.py uses the usual combiner-bounded groupby.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RFC 3986 appendix B, with authority split into userinfo/host/port inline.
# RE2-safe (no backrefs). Host may be empty for scheme-relative junk rows.
_URL_RE = (
    r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*):)?"
    r"(?://(?:(?P<userinfo>[^/?#@]*)@)?(?P<host>[^/?#:]*)(?::(?P<port>[0-9]*))?)?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$"
)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def _str(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _parse_arrays(urls: pa.Array) -> dict[str, pa.Array]:
    parts = pc.extract_regex(urls, pattern=_URL_RE)
    scheme = pc.ascii_lower(pc.struct_field(parts, "scheme"))
    host = pc.ascii_lower(pc.struct_field(parts, "host"))
    port = pc.struct_field(parts, "port")
    # empty captures ("http://h:/x", scheme-less rows) normalize to NULL;
    # RE2 optional groups surface as "" through extract_regex, so "" is the
    # non-participating marker for scheme/host/port (an absent query or
    # fragment likewise reads "" — kept, since "?#"-empty and absent are
    # canonically the same)
    port = pc.if_else(pc.equal(port, pa.scalar("")), pa.scalar(None, pa.string()), port)
    host = pc.if_else(pc.equal(host, pa.scalar("")), pa.scalar(None, pa.string()), host)
    scheme = pc.if_else(pc.equal(scheme, pa.scalar("")), pa.scalar(None, pa.string()), scheme)
    # registrable domain: last two dot-labels of the host (heuristic)
    domain = pc.extract_regex(host, pattern=r"(?P<d>[^.]+\.[^.]+)$")
    domain = pc.struct_field(domain, "d")
    domain = pc.if_else(pc.is_valid(domain), domain, host)  # single-label host
    return {"scheme": scheme, "host": host, "port": port,
            "path": pc.struct_field(parts, "path"),
            "query": pc.struct_field(parts, "query"),
            "fragment": pc.struct_field(parts, "fragment"),
            "domain": domain}


def parse_urls_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Appends ``scheme, host, port, path, query, fragment, domain`` columns.

    ``scheme``/``host`` are lowercased (case-insensitive per RFC 3986 §3.1,
    §3.2.2); ``port`` is NULL when absent or empty; ``domain`` is the
    registrable-domain heuristic (last two host labels). Unparseable rows
    (the regex matches any string, so only NULL inputs) yield NULLs.
    """
    out = batch
    for name, col in _parse_arrays(_str(batch.column(url_col))).items():
        out = out.append_column(name, col)
    return out


def canonicalize_urls_batch(batch: pa.Table, url_col: str = "url",
                            out_col: str = "canonical_url") -> pa.Table:
    """Appends the canonical URL: lowercase scheme+host, default port
    stripped (80/http, 443/https, …), fragment dropped, empty path → ``/``,
    query preserved. Userinfo is dropped (it is never part of a fetch key).
    """
    parsed = _parse_arrays(_str(batch.column(url_col)))
    scheme, host, port = parsed["scheme"], parsed["host"], parsed["port"]
    path, query = parsed["path"], parsed["query"]
    is_default = pa.array([False] * len(batch), pa.bool_())
    for sch, dp in _DEFAULT_PORTS.items():
        both = pc.and_kleene(pc.equal(scheme, pa.scalar(sch)),
                             pc.equal(port, pa.scalar(dp)))
        is_default = pc.or_kleene(is_default, pc.fill_null(both, False))
    port_part = pc.if_else(
        pc.or_kleene(pc.is_null(port), is_default),
        pa.scalar("", pa.string()),
        pc.binary_join_element_wise(pa.scalar(":"), pc.fill_null(port, ""), ""))
    path_norm = pc.if_else(pc.equal(pc.fill_null(path, ""), pa.scalar("")),
                           pa.scalar("/", pa.string()), pc.fill_null(path, ""))
    # empty query ("...?") and absent query canonicalize identically (no "?")
    q_part = pc.if_else(
        pc.equal(pc.fill_null(query, ""), pa.scalar("")),
        pa.scalar("", pa.string()),
        pc.binary_join_element_wise(pa.scalar("?"), pc.fill_null(query, ""), ""))
    canon = pc.binary_join_element_wise(
        pc.fill_null(scheme, ""), pa.scalar("://"), pc.fill_null(host, ""),
        port_part, path_norm, q_part, "")
    # a URL without scheme+host has no canonical fetch key
    absolute = pc.and_kleene(pc.is_valid(scheme), pc.is_valid(host))
    canon = pc.if_else(pc.fill_null(absolute, False), canon,
                       pa.scalar(None, pa.string()))
    return batch.append_column(out_col, canon)
