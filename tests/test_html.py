"""Extractor invariant: Arrow kernels ≡ independent pure-Python extractor."""

import pyarrow as pa

from ethereum_etl_ray.functions.html import (
    extract_text_array,
    extract_text_py,
    render_html_array,
    render_html_py,
)


def test_render_extract_roundtrip_matches_python():
    texts = ["hello world", "a <b> & c > d", "x&amp;y already escaped?", ""]
    langs = ["en", "de", "fr", "zh"]
    titles = ["t one", "t <two>", "t3", "t4"]
    revs = ["0", "1", "12", "3"]
    html = render_html_array(pa.array(texts), pa.array(langs), pa.array(titles), pa.array(revs))
    extracted = extract_text_array(html)
    for i in range(len(texts)):
        h_arrow = html[i].as_py()
        h_py = render_html_py(texts[i], langs[i], titles[i], revs[i])
        assert h_arrow == h_py
        assert extracted[i].as_py() == extract_text_py(h_arrow)


def test_extract_strips_script_style_and_tags():
    html = (b"<html><head><script>var x='<p>evil</p>';</script>"
            b"<style>p{color:red}</style></head>"
            b"<body><p>keep  this</p><div>and\nthis</div></body></html>")
    assert extract_text_py(html) == "keep this and this"
    assert extract_text_array(pa.array([html]))[0].as_py() == "keep this and this"


def test_extract_prefers_article_region():
    html = b"<body>boiler<article><p>main content</p></article>plate</body>"
    assert extract_text_py(html) == "main content"
    assert extract_text_array(pa.array([html]))[0].as_py() == "main content"


def test_extract_entities_decoded_amp_last():
    html = b"<p>&lt;tag&gt; &quot;q&quot; &#39;a&#39; &amp;lt; stays</p>"
    out = extract_text_py(html)
    assert out == '<tag> "q" \'a\' &lt; stays'
    assert extract_text_array(pa.array([html]))[0].as_py() == out


def test_extract_null_safe():
    out = extract_text_array(pa.array([None, b"<p>x</p>"], pa.binary()))
    assert out[0].as_py() is None
    assert out[1].as_py() == "x"
    assert extract_text_py(None) is None
