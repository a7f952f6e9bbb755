"""Unit tests: scoring + markdown emitter (the output dialect)."""

from __future__ import annotations

from zerox_spark.extract.markdown import html_to_markdown
from zerox_spark.html.dom import parse
from zerox_spark.html.score import compute_stats, is_boilerplate, select_content_root


def md(src: str) -> str:
    return html_to_markdown(src)[0]


def test_headings_and_paragraphs():
    out = md("<article><h1>T</h1><p>one</p><h3>S</h3><p>two</p></article>")
    assert out == "# T\n\none\n\n### S\n\ntwo"


def test_nav_aside_footer_stripped():
    src = (
        "<body><nav><a href='/'>Home</a></nav>"
        "<article><p>real content here that is long enough</p></article>"
        "<footer><a href='/t'>T</a></footer></body>"
    )
    assert md(src) == "real content here that is long enough"


def test_link_density_container_dropped():
    src = (
        "<body><div id='main'><p>genuine article text that goes on for a while"
        " and has no links at all in it</p>"
        "<div class='x'><a href='/1'>one link</a> <a href='/2'>two link</a>"
        " <a href='/3'>three link</a></div></div></body>"
    )
    assert "one link" not in md(src)
    assert "genuine article text" in md(src)


def test_in_content_header_footer_kept():
    # in-article header/footer are content (dialect keeps headers/footers)
    src = (
        "<body><article><header><h1>Doc Title</h1></header>"
        "<p>body text of the document</p>"
        "<footer><p>Page footer note</p></footer></article></body>"
    )
    out = md(src)
    assert "# Doc Title" in out and "Page footer note" in out


def test_table_html_canonical():
    src = (
        "<article><table class='z' border=1><thead><tr><th>a</th><th>b</th></tr>"
        "</thead><tbody><tr><td>1</td><td>2</td></tr></tbody></table></article>"
    )
    assert (
        md(src)
        == "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
    )


def test_code_fence_with_language():
    src = '<article><p>intro</p><pre><code class="language-js">f()\n g()</code></pre></article>'
    assert md(src) == "intro\n\n```js\nf()\n g()\n```"


def test_checkboxes():
    src = (
        "<article><p><input type='checkbox' checked> yes</p>"
        "<p><input type='checkbox'> no</p></article>"
    )
    assert md(src) == "☑ yes\n\n☐ no"


def test_logo_watermark_figure():
    src = (
        "<article><img class='logo' alt='Acme'><p>text body of it</p>"
        "<img alt='fig one' src='f.png'><img class='watermark' alt='DRAFT'></article>"
    )
    out = md(src)
    assert "<logo>Acme</logo>" in out
    assert "![fig one](#)" in out
    assert "<watermark>DRAFT</watermark>" in out


def test_inline_marks_and_links():
    src = (
        "<article><p>see <a href='http://x.y/z'>link</a>, <b>bold</b>,"
        " <em>it</em>, <code>c()</code> and <a href='#frag'>anchor</a></p></article>"
    )
    assert (
        md(src)
        == "see [link](http://x.y/z), **bold**, *it*, `c()` and anchor"
    )


def test_br_splits_lines_within_paragraph():
    out = md("<article><p>line one<br>line two</p></article>")
    assert out == "line one\n\nline two"


def test_ordered_and_nested_lists():
    src = (
        "<article><ol><li>a</li><li>b<ul><li>b1</li></ul></li></ol></article>"
    )
    assert md(src) == "1. a\n2. b\n  - b1"


def test_whitespace_collapsed():
    out = md("<article><p>  a\n\t b   c </p></article>")
    assert out == "a b c"


def test_empty_alt_img():
    assert md("<article><p>t t t</p><img src='x'></article>") == "t t t\n\n![](#)"


def test_select_root_prefers_article():
    nodes = parse(
        "<body><div><p>sidebar text that is quite long indeed here</p></div>"
        "<article><p>the real body of the actual article content</p></article></body>"
    )
    stats = compute_stats(nodes)
    root = nodes[select_content_root(nodes, stats)]
    assert root.tag == "article"


def test_negative_class_hint_dropped():
    nodes = parse("<div class='ad-banner'><p>buy stuff now please</p></div>")
    stats = compute_stats(nodes)
    div = [n for n in nodes if n.tag == "div"][0]
    assert is_boilerplate(nodes, stats, div.idx)


def test_spans_offsets():
    out, spans = html_to_markdown(
        "<article><h1>T</h1><p>body text</p></article>"
    )
    assert out == "# T\n\nbody text"
    assert spans[0][:3] == ("heading", 0, 3)
    assert spans[1][:3] == ("para", 5, 14)
    for kind, start, end, _ in spans:
        assert out[start:end]  # span addresses real content


def test_svg_accessibility_text_not_content():
    out = md(
        "<article><p>real content of the page here</p>"
        "<svg viewBox='0 0 1 1'><title>chart icon</title><text>42%</text></svg>"
        "<canvas>fallback text</canvas></article>"
    )
    assert "chart icon" not in out and "fallback" not in out
    assert "real content" in out


def test_unquoted_href_trailing_slash_not_self_closing():
    """HTML5: '/' ends an unquoted attr VALUE, it is not the self-closing
    flag — <a href=http://x.com/>text</a> must keep its anchor text and
    the slash in the href."""
    from zerox_spark.html.dom import parse

    nodes = parse("<div><a href=http://x.example/>Example</a> after</div>")
    a = next(n for n in nodes if n.tag == "a")
    assert a.attrs["href"] == "http://x.example/"
    texts = [nodes[c].text for c in a.children if nodes[c].tag is None]
    assert texts == ["Example"]
    # explicit self-closing forms still work
    nodes2 = parse('<p><img src="x"/>tail<br/>more</p>')
    img = next(n for n in nodes2 if n.tag == "img")
    assert img.attrs["src"] == "x"


def test_rawtext_close_requires_name_boundary():
    """'</scripty>' inside a JS string must NOT close the <script>."""
    md, _ = html_to_markdown(
        '<article><script>var s = "</scripty>";</script>'
        "<p>real content paragraph here</p></article>"
    )
    assert md == "real content paragraph here"


def test_pre_code_with_highlighter_spans_keeps_tokens():
    """Syntax-highlighted code (every token in a <span>) must keep all
    its text in the fence."""
    md, _ = html_to_markdown(
        '<article><pre><code class="language-python">'
        '<span class="k">def</span> <span class="nf">f</span>():'
        "</code></pre></article>"
    )
    assert md == "```python\ndef f():\n```"


def test_selected_root_not_dropped_by_own_negative_hint():
    """A chosen <article> with a negative class token must still emit its
    content — the root was selected AS content; only children re-test."""
    md, _ = html_to_markdown(
        '<article class="promo"><p>thirty characters of real body text'
        " right here</p></article>"
    )
    assert "real body text" in md
