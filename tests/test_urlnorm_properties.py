"""Property tests (hypothesis): URL canonicalization must be idempotent
and stable under the alias transformations it claims to normalize —
the seen-set's correctness depends on canon being a true canonical form
(two aliases of one URL must never both enter the frontier)."""

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not available", allow_module_level=True)

from pyspark.sql import functions as F

from fundcrawler_spark.functions.urlnorm import canonicalize_url

HOST = st.from_regex(r"[a-z]([a-z0-9-]{0,10}[a-z0-9])?\.(com|net|org)", fullmatch=True)
PATH = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,8}){0,4}", fullmatch=True)
QUERY = st.one_of(st.just(""), st.from_regex(r"\?[a-z]=[0-9]{1,3}", fullmatch=True))


@settings(max_examples=30, deadline=None)
@given(host=HOST, path=PATH, query=QUERY,
       scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
       www=st.booleans(), port=st.sampled_from(["", ":80", ":443"]),
       trailing=st.booleans())
def test_canonicalize_idempotent_and_alias_stable(
        spark, host, path, query, scheme, www, port, trailing):
    base = f"{scheme}://{'www.' if www else ''}{host}{port}{path}"
    if trailing and not base.endswith("/"):
        base += "/"
    base += query
    plain = f"http://{host}{path or ''}{query}"
    df = spark.createDataFrame([(base,), (plain,)], "url string")
    out = df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    c_alias, c_plain = out[0]["c"], out[1]["c"]
    # alias forms collapse to the same canonical URL
    assert c_alias == c_plain, (base, plain, c_alias, c_plain)
    # idempotence: canon(canon(x)) == canon(x)
    df2 = spark.createDataFrame([(c_alias,)], "url string")
    again = df2.select(canonicalize_url(F.col("url")).alias("c")).first()["c"]
    assert again == c_alias
