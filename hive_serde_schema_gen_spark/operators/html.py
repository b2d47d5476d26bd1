"""HTML → text extraction front-end — the raw-web-ingestion step that turns
crawl HTML (or WET-style payloads) into the clean text every downstream
curation operator consumes (``normalize_text``, quality scoring, dedup,
``corpus.curate_and_prepare``).

Design: ONE ordered rule list drives BOTH engines — the Spark side applies
it as a codegen'd ``regexp_replace``/``replace`` chain (narrow per-row
projection, zero shuffles, scan-speed at 100 TB exactly like
``curation.redact_pii``), and :func:`sql_html_chain` renders the identical
chain as nested DuckDB SQL for the driver oracle, so the two
implementations cannot drift.

Pipeline: strip comments → strip <script>/<style> WITH their contents →
block-level tags become newlines (paragraph structure survives) → inline
tags vanish (zero-width: ``wo<b>rd</b>`` → ``word``) → the five standard
named entities + ``&#39;`` decode (amp LAST, so ``&amp;lt;`` correctly
yields ``&lt;``) → whitespace collapses to single spaces / single
newlines, trimmed.

Known limitations (documented, standard for regex-level extraction): a
literal ``>`` inside an attribute value truncates that tag early; numeric
character references beyond ``&#39;`` are left as-is; malformed nesting is
handled textually, not by a DOM.  A production crawl pipeline would slot a
real HTML5 parser behind the same column contract; this chain is the
scan-speed approximation that keeps the whole path inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import query

_BLOCK = (
    "p|div|br|hr|h[1-6]|li|tr|td|th|ul|ol|table|thead|tbody|section|article"
    "|header|footer|nav|aside|blockquote|pre|title|form"
)

# (kind, pattern/from, replacement) applied IN ORDER; "\n" replacements are
# rendered as chr(10) on the SQL side.  `regex` rules use RE2-compatible
# syntax (inline (?is) flags, lazy quantifiers, no lookaround) so Java and
# DuckDB interpret them identically.
_TAG_RULES = (
    ("regex", r"(?s)<!--.*?-->", " "),
    ("regex", r"(?is)<script\b[^>]*>.*?</script>", " "),
    ("regex", r"(?is)<style\b[^>]*>.*?</style>", " "),
    ("regex", r"(?is)</?(?:" + _BLOCK + r")\b[^>]*>", "\n"),
    ("regex", r"(?s)<[^>]*>", ""),
    ("literal", "&nbsp;", " "),
    ("literal", "&lt;", "<"),
    ("literal", "&gt;", ">"),
    ("literal", "&quot;", '"'),
    ("literal", "&#39;", "'"),
    ("literal", "&amp;", "&"),
)

# Whitespace reconstruction — a SEPARATE tuple because the full_entities
# path must re-run exactly these rules after html.unescape (decoded refs
# can be whitespace); a hand-copied renorm would drift.  U+00A0 counts as
# collapsible whitespace in BOTH modes (raw NBSP chars are ubiquitous in
# crawl text; treating them differently per mode would make the two
# modes disagree on entity-free documents).
_WS_RULES = (
    ("regex", "[ \t\r\f\u00a0]+", " "),
    ("regex", r" ?\n ?", "\n"),
    ("regex", r"\n{2,}", "\n"),
    ("regex", r"^\n+|\n+$", ""),
)

_RULES = _TAG_RULES + _WS_RULES


def html_text_expr(col, entities: bool = True) -> "F.Column":
    """The extraction chain as a single Column expression (compose it into
    any projection).  ``entities=False`` skips the five SEMANTIC entity
    decodes (lt/gt/quot/#39/amp — ``&nbsp;``→space stays: it is pure
    whitespace and idempotent under a later full decode) for the
    ``full_entities`` mode, where ``html.unescape`` must be the one and
    only decoder — stacking it on already-decoded text would decode
    twice (``&amp;lt;`` → ``&lt;`` → ``<``, corrupting text that
    legitimately displays entity syntax)."""
    skip = () if entities else ("&lt;", "&gt;", "&quot;", "&#39;", "&amp;")
    c = F.col(col) if isinstance(col, str) else col
    for kind, pat, repl in _RULES:
        if kind == "literal" and pat in skip:
            continue
        if kind == "regex":
            c = F.regexp_replace(c, pat, repl)
        else:
            c = F.replace(c, F.lit(pat), F.lit(repl))
    return F.trim(c)


def html_to_text(
    d: DataFrame, text_col: str = "text", full_entities: bool = False
) -> DataFrame:
    """Replace ``text_col`` (raw HTML) with extracted plain text, one line
    per block-level element.  Pure narrow projection — composes with
    ``curate_and_prepare`` as the ingestion front-end.

    ``full_entities=True`` decodes the COMPLETE entity set — numeric
    character references (``&#233;``/``&#x2014;``) and all HTML5 named
    entities — via Python's ``html.unescape`` in an Arrow-batched
    ``mapInPandas`` pass.  In this mode unescape is the SOLE semantic
    decoder (the codegen chain skips its five literal decodes — running
    both would decode doubly-escaped text twice: ``&amp;lt;`` must yield
    the literal ``&lt;``, never ``<``), and because decoded references
    can themselves be whitespace (``&#10;``, ``&#160;``), the whitespace
    reconstruction re-runs AFTER the decode.  Opt-in because it moves
    the text through Python once; the default chain stays whole-stage
    codegen at scan speed and leaves exotic references as-is (the
    documented limitation)."""
    if not full_entities:
        return d.withColumn(text_col, html_text_expr(text_col))
    import html as _html

    out = d.withColumn(text_col, html_text_expr(text_col, entities=False))
    schema = out.schema

    def _unescape(batches):
        for pdf in batches:
            pdf[text_col] = pdf[text_col].map(
                lambda s: _html.unescape(s) if s is not None else None
            )
            yield pdf

    decoded = out.mapInPandas(_unescape, schema)
    # re-normalize with THE SAME whitespace rules (decoded refs may be
    # whitespace, incl. U+00A0)
    c = F.col(text_col)
    for _, pat, repl in _WS_RULES:
        c = F.regexp_replace(c, pat, repl)
    return decoded.withColumn(text_col, F.trim(c))


def sql_html_chain(expr: str) -> str:
    """Render the SAME rule chain as nested DuckDB SQL over ``expr`` — the
    oracle side of :func:`html_to_text` (single source of truth: edits to
    ``_RULES`` change both engines)."""

    def lit(s: str) -> str:
        if s == "\n":
            return "chr(10)"
        return "'" + s.replace("'", "''") + "'"

    out = expr
    for kind, pat, repl in _RULES:
        if kind == "regex":
            out = f"regexp_replace({out}, {lit(pat)}, {lit(repl)}, 'g')"
        else:
            out = f"replace({out}, {lit(pat)}, {lit(repl)})"
    return f"trim({out})"


# ---------------------------------------------------------------------------
# Driver-oracle slot: synthetic HTML wrap (identical on both sides) → extract
# ---------------------------------------------------------------------------

_WRAP_SQL = (
    "'<html><head><title>Doc</title>"
    "<script type=\"text/javascript\">var x = 1 < 2 && y; // junk</script>"
    "<style>p { color: red; }</style><!-- hidden --></head>"
    "<body><h1>' || upper(lang) || '</h1><p>' || text || '</p>"
    "<div class=\"nav\">Home &amp; About &lt;' || source || '&gt;</div>"
    "</body></html>'"
)


@query(
    "html_extract",
    oracle=f"""
    SELECT doc_id, {sql_html_chain(_WRAP_SQL)} AS text
    FROM documents ORDER BY doc_id
    """,
)
def html_extract(spark, sf_dir):
    """Driver slot for :func:`html_to_text` (round-8 raw-web ingestion
    front-end): wraps each document's text in a deterministic HTML page —
    script/style/comment noise, a block headline, an entity-bearing nav
    div — identically on both sides, then extracts.  The oracle renders
    the SAME rule list via :func:`sql_html_chain`, so the chain's
    ordering, entity policy, and whitespace reconstruction are all
    hash-checked."""
    from ..sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit(
            '<html><head><title>Doc</title>'
            '<script type="text/javascript">var x = 1 < 2 && y; // junk</script>'
            "<style>p { color: red; }</style><!-- hidden --></head><body><h1>"
        ),
        F.upper("lang"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><div class="nav">Home &amp; About &lt;'),
        F.col("source"),
        F.lit("&gt;</div></body></html>"),
    )
    return (
        d.select("doc_id", page.alias("text"))
        .withColumn("text", html_text_expr("text"))
        .orderBy("doc_id")
    )
