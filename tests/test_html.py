"""HTML → text extraction: tag/script/style/comment stripping, entity
decoding, block-line reconstruction, and the end-to-end composition with
the curation chain (planted boilerplate survives extraction and is then
stripped by line dedup)."""

from __future__ import annotations

import duckdb
import pytest

from hive_serde_schema_gen_spark.operators.html import (
    html_to_text,
    sql_html_chain,
)


def _extract(spark, html):
    d = spark.createDataFrame([(1, html)], "doc_id int, text string")
    return html_to_text(d).collect()[0]["text"]


def test_basic_page_structure(spark):
    html = (
        "<html><head><title>My Title</title><script>var x = 1 < 2;</script>"
        "<style>p { color: red; }</style><!-- secret --></head>"
        "<body><h1>Head</h1><p>First para.</p><p>Second para.</p></body></html>"
    )
    out = _extract(spark, html)
    assert out == "My Title\nHead\nFirst para.\nSecond para."
    assert "secret" not in out and "color" not in out and "var x" not in out


def test_inline_tags_are_zero_width_block_tags_break_lines(spark):
    out = _extract(spark, "<p>wo<b>rd</b> and <a href='/x'>link</a></p><div>next</div>")
    assert out == "word and link\nnext"


def test_entity_decoding_order(spark):
    # &amp;lt; must decode to the literal string "&lt;", not "<"
    out = _extract(spark, "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt;</p>")
    assert out == 'a & b <tag> "q" \'s\' &lt;'


def test_whitespace_reconstruction(spark):
    out = _extract(spark, "<div>  a\t b </div>\n\n<div>c</div><br><br><div> d </div>")
    assert out == "a b\nc\nd"


def test_sql_chain_parity_on_tricky_inputs(spark):
    """The DuckDB rendering of the rule chain must agree byte-for-byte with
    the Spark chain — this is what makes the driver oracle trustworthy."""
    cases = [
        "<html><body><h1>T</h1><p>a &amp; b</p></body></html>",
        "<p>wo<b>rd</b></p><script a=1>junk()</script>tail",
        "plain text with no tags at all",
        "<ul><li>one</li><li>two &lt;x&gt;</li></ul>",
        "<P>UPPER</P><DIV>case tags</DIV>",
        "",
    ]
    spark_out = [
        r["text"]
        for r in html_to_text(
            spark.createDataFrame(
                [(i, c) for i, c in enumerate(cases)], "doc_id int, text string"
            )
        )
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    duck_out = [
        con.execute(f"SELECT {sql_html_chain('?')}", [c]).fetchone()[0]
        for c in cases
    ]
    assert spark_out == duck_out


def test_html_front_end_feeds_boilerplate_strip(spark):
    """VERDICT round-8 item 3 end-to-end: crawl-style pages with a shared
    nav/footer -> html_to_text -> strip_boilerplate_lines removes the
    planted boilerplate lines while each page's unique content survives."""
    from hive_serde_schema_gen_spark.operators.dedup import (
        strip_boilerplate_lines,
    )

    def page(i):
        return (
            "<html><body><div class='nav'>Home | About | Contact</div>"
            f"<p>Unique content for page {i} speaking of topic {i * i}.</p>"
            "<div class='footer'>Copyright Example Corp</div></body></html>"
        )

    d = spark.createDataFrame(
        [(i, page(i)) for i in range(6)], "doc_id int, text string"
    )
    cleaned = strip_boilerplate_lines(html_to_text(d), min_docs=2)
    rows = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    for i in range(6):
        assert rows[i] == f"Unique content for page {i} speaking of topic {i * i}."


def test_full_entities_decodes_numeric_references(spark):
    from pyspark.sql import functions as F  # noqa: F401

    d = spark.createDataFrame(
        [(1, "<p>caf&#233; &#x2014; r&eacute;sum&eacute; &amp; more</p>")],
        "doc_id int, text string",
    )
    default = html_to_text(d).collect()[0]["text"]
    full = html_to_text(d, full_entities=True).collect()[0]["text"]
    # default chain: the five standard names only; numerics left as-is
    assert default == "caf&#233; &#x2014; r&eacute;sum&eacute; & more"
    assert full == "café — résumé & more"


def test_full_entities_never_double_decodes(spark):
    """Review-found bug: stacking html.unescape on the chain's decoded
    output decoded doubly-escaped text twice.  An author displaying
    entity SYNTAX (&amp;lt;) must come out as the literal '&lt;', and
    whitespace-decoding refs (&#10;, &#160;) must still be collapsed by
    the post-decode normalization."""
    d = spark.createDataFrame(
        [
            (1, "<p>5 &amp;lt; 10 and &amp;amp; and &amp;#233;</p>"),
            (2, "<p>a&#10;&#10;b&#160;&#160;c</p>"),
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r["text"]
        for r in html_to_text(d, full_entities=True).collect()
    }
    assert rows[1] == "5 &lt; 10 and &amp; and &#233;"
    assert rows[2] == "a\nb c"


def test_randomized_cross_engine_parity(spark):
    """200 seeded-random gnarly inputs — nested/unclosed/uppercase tags,
    entities (incl. doubled &amp;amp;), stray <> and quotes, CRLF, blank
    lines, unicode — must extract byte-identically through the Spark
    chain and the DuckDB rendering.  This is the property the
    html_extract driver slot's trustworthiness rests on."""
    import random

    rng = random.Random(42)
    frags = [
        "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<BR/>",
        "<b>", "</b>", "<a href=\"/x?a=1&b=2\">", "</a>", "<h2>", "</H2>",
        "<script>var x = 1 < 2;</script>", "<style>p{}</style>",
        "<!-- c -->", "&amp;", "&lt;", "&gt;", "&quot;", "&#39;",
        "&amp;amp;", "&nbsp;", "plain", "wörds", "x<y", "a > b", "\r\n",
        "\n\n", "   ", "\t", "mixed 文字 text", "<ul><li>i</li></ul>",
        "<unclosed", "lone > bracket", '"quoted"',
    ]
    cases = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 25)))
        for _ in range(200)
    ]
    spark_out = [
        r["text"]
        for r in html_to_text(
            spark.createDataFrame(
                [(i, c) for i, c in enumerate(cases)], "doc_id int, text string"
            )
        )
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    expr = sql_html_chain("?")
    duck_out = [con.execute(f"SELECT {expr}", [c]).fetchone()[0] for c in cases]
    mismatches = [
        (i, cases[i][:80], spark_out[i][:80], duck_out[i][:80])
        for i in range(len(cases))
        if spark_out[i] != duck_out[i]
    ]
    assert not mismatches, mismatches[:3]
