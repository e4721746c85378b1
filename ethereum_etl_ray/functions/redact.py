"""PII redaction and text normalization — per-batch Arrow RE2 transforms.

Webtext counterparts of the reference's per-row scrub/format projections
(``src/tasks/extract/*.py`` 1:1 string transforms): before a crawl lands in a
training corpus, emails / phone numbers / IP addresses are masked and the
text is canonicalized (case-fold, whitespace-collapse, trim).

Engine parity: both Arrow (``pyarrow.compute.replace_substring_regex``) and
DuckDB (``regexp_replace(..., 'g')``) execute RE2, so the same pattern string
produces byte-identical output on both sides — every pattern below is written
in the RE2 common subset (no lookarounds, no backrefs). Replacement ORDER is
part of the contract (emails first, then IPs, then phones) and is mirrored by
the nested ``regexp_replace`` calls in the oracle SQL.

The synthetic ``documents`` corpus contains no PII, so the redaction query
*plants* it deterministically from ``doc_id`` (same derivation in SQL) —
the operator is exercised on every row rather than being an identity map.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2 common-subset patterns (identical semantics in Arrow and DuckDB).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9][0-9-]{6,}[0-9]"

# (pattern, replacement) in contract order — emails carry dots and digits, so
# they must be masked before the IP pattern can see the text; phones last.
REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def _str(arr) -> pa.ChunkedArray | pa.Array:
    return pc.cast(arr, pa.string())


def plant_pii_batch(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id", out_col: str = "dirty") -> pa.Table:
    """Derive a PII-bearing string deterministically from (doc_id, text).

    dirty = 'contact user<id>@mail.example.com or +1-202-555-<1000+id%9000>'
            ' from 10.<id%256>.0.1 re: ' || text

    The SQL oracle repeats this concatenation verbatim, so the redaction
    operator is tested on strings where every pattern actually fires.
    """
    import numpy as np

    ids = batch.column(id_col)
    ids_np = ids.combine_chunks().to_numpy() if isinstance(ids, pa.ChunkedArray) \
        else ids.to_numpy()
    dirty = pc.binary_join_element_wise(
        "contact user", _str(ids),
        "@mail.example.com or +1-202-555-",
        _str(pa.array(ids_np % 9000 + 1000, pa.int64())),
        " from 10.", _str(pa.array(ids_np % 256, pa.int64())),
        ".0.1 re: ", batch.column(text_col),
        "")
    return batch.append_column(out_col, dirty)


def redact_pii_batch(batch: pa.Table, text_col: str = "dirty",
                     out_col: str = "clean") -> pa.Table:
    """Mask emails / IPv4s / phone numbers; count each kind pre-replacement.

    Fully vectorized: three RE2 count kernels + three RE2 global-replace
    kernels per batch. Stateless → plain task pool, no actor needed.
    """
    text = batch.column(text_col)
    counts = {
        "n_emails": EMAIL_RE,
        "n_ips": IPV4_RE,
        "n_phones": PHONE_RE,
    }
    for name, pat in counts.items():
        batch = batch.append_column(
            name, pc.cast(pc.count_substring_regex(text, pattern=pat), pa.int64()))
    clean = text
    for pat, repl in REDACTIONS:
        clean = pc.replace_substring_regex(clean, pattern=pat, replacement=repl)
    return batch.append_column(out_col, clean)


def normalize_text_batch(batch: pa.Table, text_col: str,
                         out_col: str = "norm") -> pa.Table:
    """Canonicalize: NFC → casefold-lower → collapse runs of whitespace to one
    space → trim. Matches the SQL
    ``trim(regexp_replace(lower(nfc_normalize(s)), '\\s+', ' ', 'g'))``.

    ``[\\s]`` in RE2 is ASCII-only in both engines, so parity holds for any
    input; NFC is pyarrow ``utf8_normalize`` vs DuckDB ``nfc_normalize``.
    """
    s = pc.utf8_normalize(batch.column(text_col), form="NFC")
    s = pc.utf8_lower(s)
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    s = pc.utf8_trim_whitespace(s)
    return batch.append_column(out_col, s)
