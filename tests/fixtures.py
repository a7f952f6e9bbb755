"""Deterministic edge-case fixture documents (FIXTURES.md §5 e01-e10).

Each fixture is (name, html_bytes, text) — extractor output is frozen in
tests/goldens/<name>.md (generated once by gen_goldens.py, committed, and
byte-compared forever after, mirroring the reference's golden snapshots
shared/outputs/0001-0040.md)."""

from __future__ import annotations

E02_NAV_ONLY = b"""<html><body>
<nav><a href="/">Home</a><a href="/a">A</a></nav>
<footer><a href="/t">Terms</a></footer>
</body></html>"""

E03_MARKDOWN_FENCE = b"""<html><body><article>
<pre><code class="markdown"># fenced heading
some *fenced* text</code></pre>
</article></body></html>"""

E03B_MIXED_FENCES = b"""<html><body><article>
<h1>Fences</h1>
<pre><code class="python">x = 1</code></pre>
<pre><code class="sql">SELECT 1</code></pre>
</article></body></html>"""

E06_UNICODE = (
    "<html><body><article>\r\n"
    "<h1>Café &amp; 100&#37; \U0001f600</h1>\r\n"
    "<p>A&nbsp;B &lt;tag&gt; &quot;q&quot; — dash​</p>\r\n"
    "<p>Combining: é (should NFC to é)</p>\r\n"
    "</article></body></html>"
).encode("utf-8")

E07_DOUBLE_HEADER_TABLE = b"""<html><body><article>
<h1>Report</h1>
<table>
 <thead>
  <tr><th>region</th><th>q1</th><th>q2</th></tr>
  <tr><th></th><th>rev</th><th>rev</th></tr>
 </thead>
 <tbody>
  <tr><td>north</td><td>10</td><td>20</td></tr>
  <tr><td>south</td><td>30</td><td>40</td></tr>
 </tbody>
</table>
</article></body></html>"""

E10_TAGS = b"""<html><body><article>
<img class="logo" alt="ACME Corp">
<h1>Form</h1>
<p><input type="checkbox" checked> accept terms</p>
<p><input type="checkbox"> subscribe</p>
<img class="watermark" alt="CONFIDENTIAL">
<img alt="chart of revenue" src="x.png">
<p>See <a href="https://example.com/more">details</a> and <strong>bold</strong>
<em>em</em> <code>code</code>.</p>
</article></body></html>"""

E11_MALFORMED = b"""<html><body>
<div class=content><p>unclosed paragraph
<p>second para <b>bold across <i>nested</b> italic</i>
<div><ul><li>one<li>two<li>three</ul>
<p>a < b and c > d &unknownentity; &amp; fin
</body></html>"""

E12_NESTED_LISTS = b"""<html><body><article>
<h2>Nested</h2>
<ol>
 <li>first</li>
 <li>second
  <ul><li>sub a</li><li>sub b</li></ul>
 </li>
 <li>third</li>
</ol>
<blockquote><p>quoted wisdom</p></blockquote>
<hr>
<dl><dt>term</dt><dd>definition</dd></dl>
</article></body></html>"""

# pseudo-PDF with a table crossing pages 1→2 (page 2's table has no header)
E05_CROSS_PAGE_TABLE = b"""%PDF-SYNTH 1.0
%%page no=1 w=612.0 h=792.0
%%line y=750.0 x=72.0 size=18.0 text=Quarterly Numbers
%%line y=700.0 x=72.0 size=10.0 kind=th text=region|revenue
%%line y=680.0 x=72.0 size=10.0 kind=tr text=north|100
%%line y=660.0 x=72.0 size=10.0 kind=tr text=south|200
%%line y=40.0 x=306.0 size=8.0 text=1
%%page no=2 w=612.0 h=792.0
%%line y=750.0 x=72.0 size=10.0 kind=tr text=east|300
%%line y=730.0 x=72.0 size=10.0 kind=tr text=west|400
%%line y=680.0 x=72.0 size=10.0 text=Totals look strong this quarter.
%%line y=40.0 x=306.0 size=8.0 text=2
"""

# round-2 tokenizer contract: '>' inside quoted attribute values stays in
# the tag (HTML5-correct); an unmatched quote swallows to EOF and drops the
# truncated fragment — this fixture covers the in-document cases so the
# contract is golden-locked at the byte level, not only unit-tested
E13_QUOTED_ATTRS = b"""<!DOCTYPE html>
<html><body><article>
<h1>Quote contract</h1>
<p title="1 > 2">gt inside a double-quoted attr</p>
<p title='3 > 4'>gt inside a single-quoted attr</p>
<p data-x="a'b" data-y='c"d'>mixed quote nesting</p>
<p>plain paragraph between</p>
<table class="stats"><tr><th>k</th><th>v</th></tr><tr><td>a > b</td><td>1</td></tr></table>
</article></body></html>"""

# round-2 container formats, byte-locked through the full pipeline: ODT
# (zip+XML), legacy .xls (CFB+BIFF8) and .doc (CFB+Word97 piece table) —
# built by the deterministic renderers the driver corpus uses
def _e14_odt() -> bytes:
    from zerox_spark.synth import _zip_bytes

    content = (
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
        "<office:body><office:text>"
        '<text:h text:outline-level="2">Open document</text:h>'
        "<text:p>Body with <text:span>nested span</text:span> text.</text:p>"
        "<text:list><text:list-item><text:p>alpha</text:p></text:list-item>"
        "<text:list-item><text:p>beta</text:p></text:list-item></text:list>"
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>k</text:p></table:table-cell>"
        "<table:table-cell><text:p>v</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "</office:text></office:body></office:document-content>"
    )
    return _zip_bytes(
        [
            ("mimetype", "application/vnd.oasis.opendocument.text"),
            ("content.xml", content),
        ]
    )


def _e15_xls() -> bytes:
    from zerox_spark.synth import render_xls

    return render_xls(42)


def _e16_doc() -> bytes:
    from zerox_spark.synth import render_doc

    return render_doc(43, "fixture words one two three four five six seven eight nine ten")


E14_ODT = _e14_odt()
E15_XLS = _e15_xls()
E16_DOC = _e16_doc()

FIXTURES: dict[str, bytes] = {
    "e02_nav_only": E02_NAV_ONLY,
    "e03_markdown_fence": E03_MARKDOWN_FENCE,
    "e03b_mixed_fences": E03B_MIXED_FENCES,
    "e06_unicode": E06_UNICODE,
    "e07_double_header_table": E07_DOUBLE_HEADER_TABLE,
    "e10_tags": E10_TAGS,
    "e11_malformed": E11_MALFORMED,
    "e12_nested_lists": E12_NESTED_LISTS,
    "e05_cross_page_table": E05_CROSS_PAGE_TABLE,
    "e13_quoted_attrs": E13_QUOTED_ATTRS,
    "e14_odt": E14_ODT,
    "e15_xls": E15_XLS,
    "e16_doc": E16_DOC,
}
