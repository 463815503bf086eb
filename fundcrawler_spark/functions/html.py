"""HTML main-text extraction — the crawl→corpus bridge: strip
script/style/comment blocks, drop tags, decode the common entities,
collapse whitespace. This is the step that turns a fetched page (the
engine's crawl output; reference pages are eastmoney HTML/JS —
reference/utils/downloader/impl/http_request_downloader.py fetches
them raw) into a row of the ``documents`` training-data table.

Pure codegen'd Column expressions — regexp_replace chains and literal
replace(), zero Python in the hot path. Every pattern is written in
the dialect subset BOTH java.util.regex (Spark) and RE2 (the DuckDB
oracle) implement identically: inline ``(?s)`` DOTALL, non-greedy
``.*?``, explicit whitespace classes (``\\s`` differs between the two
engines — java includes \\x0B, RE2 does not — so the collapse class
is spelled out).

At 100 TB this runs as a projection inside the scan stage: no
shuffle, no UDF, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stripped as blocks (content removed), in this order
RE_SCRIPT = r"(?s)<script[^>]*>.*?</script>"
RE_STYLE = r"(?s)<style[^>]*>.*?</style>"
RE_COMMENT = r"(?s)<!--.*?-->"
# then any remaining tag becomes a single space (word boundary)
RE_TAG = r"<[^>]*>"
# explicit class, NOT \s: java \s includes \x0B, RE2's does not
RE_WS = r"[ \t\r\n]+"

# literal entity decodes, applied after tag stripping; &amp; LAST so
# double-encoded text ("&amp;lt;") decodes one level per pass, the
# same in both engines
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_html_text(html: Column) -> Column:
    """Extracted main text: blocks stripped, tags -> spaces, entities
    decoded, whitespace collapsed to single spaces, trimmed."""
    out = html
    for pat in (RE_SCRIPT, RE_STYLE, RE_COMMENT, RE_TAG):
        out = F.regexp_replace(out, pat, " ")
    for ent, rep in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, RE_WS, " "))
