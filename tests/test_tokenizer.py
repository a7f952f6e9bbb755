"""Unit tests: HTML tokenizer + DOM builder (error tolerance, entities,
rawtext elements, implied end tags)."""

from __future__ import annotations

from zerox_spark.html.dom import node_text, parse
from zerox_spark.html.tokenizer import Token, tokenize


def toks(src: str) -> list[Token]:
    # tokenize yields plain tuples (hot-loop optimization); wrap for
    # attribute access in assertions — equality still holds both ways
    return [Token(*t) for t in tokenize(src)]


def test_basic_tags_and_text():
    t = toks("<p>hello <b>world</b></p>")
    kinds = [(x.kind, x.tag or x.text) for x in t]
    assert kinds == [
        ("start", "p"),
        ("text", "hello "),
        ("start", "b"),
        ("text", "world"),
        ("end", "b"),
        ("end", "p"),
    ]


def test_attributes_quoted_unquoted_boolean():
    t = toks('<input type="checkbox" checked value=x>')
    assert t[0].attrs == {"type": "checkbox", "checked": "", "value": "x"}
    assert t[0].self_closing  # void element


def test_stray_lt_is_text():
    t = toks("a < b and <i>x</i>")
    assert t[0].text == "a "
    assert t[1].text == "<"
    assert t[2].text == " b and "


def test_comment_and_doctype_skippable():
    t = toks("<!DOCTYPE html><!-- c --><p>x</p>")
    assert [x.kind for x in t] == ["doctype", "comment", "start", "text", "end"]


def test_rawtext_script_content_not_parsed():
    t = toks('<script>if (a<b) document.write("<p>")</script><p>y</p>')
    assert t[0].tag == "script"
    assert t[1].text == 'if (a<b) document.write("<p>")'
    assert t[2] == Token("end", "script", None, "", False)


def test_unclosed_rawtext_at_eof():
    t = toks("<style>body{}")
    assert t[1].text == "body{}"
    assert t[2].kind == "end"


def test_unclosed_tag_at_eof_dropped():
    assert toks("ok<div class=")[0].text == "ok"


def test_entity_decoding_in_dom():
    nodes = parse("<p>A&amp;B &#169; &lt;x&gt;</p>")
    assert node_text(nodes, 0) == "A&B © <x>"


def test_implied_p_close():
    nodes = parse("<p>one<p>two")
    ps = [n for n in nodes if n.tag == "p"]
    assert len(ps) == 2
    assert node_text(nodes, ps[0].idx) == "one"
    assert node_text(nodes, ps[1].idx) == "two"


def test_implied_li_close():
    nodes = parse("<ul><li>a<li>b</ul>")
    lis = [n for n in nodes if n.tag == "li"]
    assert [node_text(nodes, li.idx) for li in lis] == ["a", "b"]


def test_li_not_closed_across_nested_list():
    nodes = parse("<ul><li>a<ul><li>inner</li></ul></li><li>b</li></ul>")
    outer = [n for n in nodes if n.tag == "ul"][0]
    outer_lis = [nodes[c] for c in outer.children if nodes[c].tag == "li"]
    assert len(outer_lis) == 2


def test_unmatched_end_tag_ignored():
    nodes = parse("<div>x</span></div><p>y</p>")
    assert node_text(nodes, 0) == "xy"


def test_table_cell_implied_closes():
    nodes = parse("<table><tr><td>a<td>b<tr><td>c</table>")
    trs = [n for n in nodes if n.tag == "tr"]
    assert len(trs) == 2
    tds = [n for n in nodes if n.tag == "td"]
    assert len(tds) == 3


def test_script_inside_text_excluded_from_node_text():
    nodes = parse("<div>keep<script>drop()</script></div>")
    assert node_text(nodes, 0) == "keep"


def test_cdata_becomes_text():
    t = toks("<p><![CDATA[a < b & c]]></p>")
    assert t[1].kind == "text" and t[1].text == "a < b & c"
    t2 = toks("<![CDATA[unterminated")
    assert t2[0].text == "unterminated"


# ---------------------------------------------------------------------------
# Scanner hardening (round-2 ADVICE): no catastrophic backtracking, explicit
# quoted-attribute contract, truncated-fragment drop semantics.
# ---------------------------------------------------------------------------


def test_truncated_multiquote_tag_no_backtracking_blowup():
    """A truncated tag stuffed with quoted attrs must tokenize in linear
    time (the round-1 scanner hung >10s on 87 chars; this must stay <1s on
    10k chars) and be dropped as a trailing fragment."""
    import time

    src = "<a " + '"x"' * 2000 + " dangling"
    t0 = time.monotonic()
    out = toks(src)
    assert time.monotonic() - t0 < 1.0
    assert out == []


def test_gt_inside_quoted_attr_stays_in_tag():
    """Contract: '>' inside a quoted attribute value does NOT end the tag
    (HTML5-correct; deliberate, documented change vs the pre-scanner
    tokenizer which ended every tag at the first raw '>')."""
    t = toks('<a title="1 > 2">x</a>')
    assert [x.kind for x in t] == ["start", "text", "end"]
    assert t[0].attrs == {"title": "1 > 2"}
    assert t[1].text == "x"
    # single-quoted variant
    t2 = toks("<a title='1 > 2'>y</a>")
    assert t2[0].attrs == {"title": "1 > 2"}


def test_unterminated_quote_drops_truncated_fragment():
    """Contract: a quote always opens a value; EOF inside the value makes the
    whole trailing fragment a truncated tag → dropped (HTML5 EOF-in-tag)."""
    assert toks('ok<a x="never closed') == [
        Token("text", "", None, "ok", False)
    ]
    # the unmatched quote swallows the raw '>' too — tail is gone by contract
    assert toks('ok<a x=1" y=2>tail') == [Token("text", "", None, "ok", False)]


def test_unterminated_declaration_at_eof_dropped():
    """Contract: '<!'/'<?' with no '>' before EOF is a truncated fragment and
    is dropped, not emitted as literal text."""
    assert toks("hello <!DOCTYPE html") == [
        Token("text", "", None, "hello ", False)
    ]
    assert toks("hello <?php echo") == [
        Token("text", "", None, "hello ", False)
    ]
    # terminated declarations still come through as doctype tokens
    t = toks("hello <!DOCTYPE html>x")
    assert [x.kind for x in t] == ["text", "doctype", "text"]
