"""Golden tests for the bs4-equivalent HTML→text extraction
(reference ``graphrag_sdk/document_loaders/html.py:42-48``; semantics
documented in kgforge/functions/html_text.py).  Expected strings are
hand-derived from the documented bs4>=4.9 + html.parser rules
(FIXTURES.md F4)."""

import pyarrow as pa

from kgforge.functions.html_text import (extract_text_batch, html_bytes_to_text,
                                         html_get_text)


def test_plain_paragraphs():
    assert html_get_text("<p>hello</p><p>world</p>") == "helloworld"
    assert html_get_text("<p>hello</p>\n<p>world</p>") == "hello\nworld"


def test_newline_collapse():
    # bs4 get_text keeps markup whitespace; reference collapses \n{2,}
    assert html_get_text("<div>a</div>\n\n\n<div>b</div>") == "a\nb"
    assert html_get_text("a\n\nb") == "a\nb"
    # only newlines collapse — spaces/tabs survive
    assert html_get_text("a \n \nb") == "a \n \nb"


def test_script_style_template_excluded():
    html = ("<html><head><style>p {color: red}</style>"
            "<script>var x = '<p>no</p>';</script></head>"
            "<body><p>yes</p><template>never</template></body></html>")
    assert html_get_text(html) == "yes"


def test_template_nested_text_included():
    # bs4 string containers look at the IMMEDIATE parent only
    assert html_get_text("<template><div>deep</div></template>") == "deep"
    assert html_get_text("<template>direct</template>") == ""
    # void element inside template doesn't change the container parent
    assert html_get_text("<template><br>direct</template>") == ""


def test_comments_doctype_pi_cdata_excluded():
    html = ("<!DOCTYPE html><!-- comment --><?php echo 1 ?>"
            "<![CDATA[ raw ]]><p>text</p>")
    assert html_get_text(html) == "text"


def test_charrefs_decoded():
    assert html_get_text("<p>a &amp; b &#39;c&#x27; &#8212;</p>") == "a & b 'c' —"
    # charrefs in excluded script content stay excluded either way
    assert html_get_text("<script>a &amp; b</script>ok") == "ok"


def test_unclosed_script_at_eof():
    # html.parser CDATA mode runs to EOF; bs4 stores it in a Script string
    assert html_get_text("<p>keep</p><script>var x = 1;") == "keep"


def test_unclosed_tags_and_stray_end_tags():
    assert html_get_text("<b>bold<i>both") == "boldboth"
    assert html_get_text("</div>text</p>") == "text"
    # implicit close: </template> pops the unclosed <b>
    assert html_get_text("<template><b>inner</template>after") == "innerafter"


def test_script_closed_then_text():
    assert html_get_text("<script>x</script>after<style>y</style>tail") == "aftertail"


def test_non_ascii_utf8_bytes():
    raw = "<p>café 中文</p>".encode("utf-8")
    assert html_bytes_to_text(raw) == "café 中文"


def test_title_and_structure():
    html = ("<!DOCTYPE html>\n<html>\n<head>\n<title>T</title>\n</head>\n"
            "<body>\n<p>a</p>\n<p>b</p>\n</body>\n</html>")
    # inter-tag newlines are character data; runs collapse to one
    assert html_get_text(html) == "\nT\na\nb\n"


def test_extract_text_batch_drops_html():
    t = pa.table({
        "url": ["u1", "u2"],
        "html": [b"<p>x</p>", None],
    })
    out = extract_text_batch(t)
    assert out.column_names == ["url", "text"]
    assert out.column("text").to_pylist() == ["x", ""]
    assert out.schema.field("text").type == pa.large_string()
