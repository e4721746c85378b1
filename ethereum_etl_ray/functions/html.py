"""Deterministic HTML rendering + text extraction (the per-row invariant).

The engine's analogue of the reference's pure extract projections
(``src/tasks/extract/block.py:11-41``, ``src/tasks/extract/transaction.py:12-39``):
a deterministic, side-effect-free per-row transform, expressed here as
vectorized Arrow compute kernels so a ``map_batches(..., batch_format="pyarrow",
zero_copy_batch=True)`` stage runs at C speed with no Python row loop.

``extract_text_array`` is THE correctness invariant: the final lake's ``text``
per url must be byte-identical to the sequential-replay oracle, which uses the
independent pure-Python ``extract_text_py`` below (tests assert the two agree).

Extraction semantics (deterministic boilerplate removal):
  1. drop <script>…</script> and <style>…</style> blocks
  2. prefer the <article>…</article> main-content region when present,
     else fall back to the whole document
  3. strip all remaining tags
  4. decode the 5 core HTML entities (&lt; &gt; &quot; &#39; then &amp; last)
  5. collapse all whitespace runs to single spaces and trim
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_ARTICLE_RE = r"(?is)<article>(?P<c>.*?)</article>"
_TAG_RE = r"(?s)<[^>]*>"
_WS_RE = r"[ \t\r\n\f\v]+"

# entity decode order matters: &amp; last so "&amp;lt;" → "&lt;" not "<"
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]
_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]  # escape order: & first


def escape_html_array(text: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    out = text
    for raw, esc in _ESCAPES:
        out = pc.replace_substring(out, pattern=raw, replacement=esc)
    return out


def render_html_array(
    text,
    lang,
    title,
    rev,
) -> pa.Array | pa.ChunkedArray:
    """Vectorized page renderer: (text, lang, title, rev) → html binary.

    Deterministic template with realistic boilerplate (nav/script/style/footer)
    so extraction is a genuine tag-strip, not an identity transform.
    All args are equal-length arrow string arrays (or python lists).
    """
    text = pa.chunked_array([text]) if isinstance(text, pa.Array) else text
    esc = escape_html_array(text)
    html = pc.binary_join_element_wise(
        "<!DOCTYPE html>\n<html lang=\"", lang,
        "\">\n<head><meta charset=\"utf-8\"><title>", title,
        "</title>\n<script>var pv=1;track();</script>\n"
        "<style>body{margin:0;color:#111}</style>\n</head>\n<body>\n"
        "<nav><a href=\"/\">home</a> | <a href=\"/about\">about</a></nav>\n"
        "<article>\n<h1>", title,
        "</h1>\n<p>", esc,
        "</p>\n</article>\n<footer>rev=", rev,
        " &amp; crawl</footer>\n</body></html>",
        "",  # final arg = element-wise join separator
        null_handling="emit_null",
    )
    return pc.cast(html, pa.binary())


def extract_text_array(html) -> pa.Array | pa.ChunkedArray:
    """Vectorized html(binary) → text(string) extraction. Null-safe.

    Pure Arrow compute (re2 kernels); no Python per-row loop. This is the hot
    stage of the replay pipeline — applied only to merge winners, not to every
    event (SURVEY §7.1).
    """
    s = pc.cast(html, pa.string())
    s = pc.replace_substring_regex(s, pattern=_SCRIPT_RE, replacement=" ")
    s = pc.replace_substring_regex(s, pattern=_STYLE_RE, replacement=" ")
    art = pc.extract_regex(s, pattern=_ARTICLE_RE)
    content = pc.coalesce(pc.struct_field(art, "c"), s)
    content = pc.replace_substring_regex(content, pattern=_TAG_RE, replacement=" ")
    for ent, raw in _ENTITIES:
        content = pc.replace_substring(content, pattern=ent, replacement=raw)
    content = pc.replace_substring_regex(content, pattern=_WS_RE, replacement=" ")
    return pc.utf8_trim_whitespace(content)


# ---------------------------------------------------------------------------
# Independent pure-Python implementation used by the sequential-replay oracle
# (tests assert byte-identical agreement with the Arrow kernels above).
# ---------------------------------------------------------------------------

_PY_SCRIPT = re.compile(r"<script[^>]*>.*?</script>", re.I | re.S)
_PY_STYLE = re.compile(r"<style[^>]*>.*?</style>", re.I | re.S)
_PY_ARTICLE = re.compile(r"<article>(.*?)</article>", re.I | re.S)
_PY_TAG = re.compile(r"<[^>]*>", re.S)
_PY_WS = re.compile(r"[ \t\r\n\f\v]+")


def extract_text_py(html: bytes | None) -> str | None:
    if html is None:
        return None
    s = html.decode("utf-8")
    s = _PY_SCRIPT.sub(" ", s)
    s = _PY_STYLE.sub(" ", s)
    m = _PY_ARTICLE.search(s)
    content = m.group(1) if m else s
    content = _PY_TAG.sub(" ", content)
    for ent, raw in _ENTITIES:
        content = content.replace(ent, raw)
    return _PY_WS.sub(" ", content).strip()


def render_html_py(text: str, lang: str, title: str, rev: str) -> bytes:
    """Pure-Python single-row renderer (oracle/tests only)."""
    esc = text
    for raw, e in _ESCAPES:
        esc = esc.replace(raw, e)
    return (
        f"<!DOCTYPE html>\n<html lang=\"{lang}\">\n"
        f"<head><meta charset=\"utf-8\"><title>{title}</title>\n"
        "<script>var pv=1;track();</script>\n"
        "<style>body{margin:0;color:#111}</style>\n</head>\n<body>\n"
        "<nav><a href=\"/\">home</a> | <a href=\"/about\">about</a></nav>\n"
        f"<article>\n<h1>{title}</h1>\n<p>{esc}</p>\n</article>\n"
        f"<footer>rev={rev} &amp; crawl</footer>\n</body></html>"
    ).encode("utf-8")
