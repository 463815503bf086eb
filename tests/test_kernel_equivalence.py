"""Arrow-kernel variants must be bit-identical to their oracle-parity
Column-math definitions (the kernels exist only because JVM higher-order
functions are interpreted per-element)."""

from pyspark.sql import functions as F

from fundcrawler_spark.operators.textstats import (
    doc_fingerprint,
    doc_fingerprint_kernel,
)

SF = "/root/testdata/sf0.001"


def test_doc_fingerprint_kernel_equals_column_math(spark):
    rows = [(0, ""), (1, "a"), (2, "ab"), (3, "abc"), (4, "abcd"),
            (5, "汉字测试文本"), (6, "x" * 5000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col = {r["doc_id"]: r["fp"]
           for r in df.select("doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    ker = {r["doc_id"]: r["fp"] for r in doc_fingerprint_kernel(df).collect()}
    assert col == ker

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    c2 = {r["doc_id"]: r["fp"]
          for r in docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    k2 = {r["doc_id"]: r["fp"] for r in doc_fingerprint_kernel(docs).collect()}
    assert c2 == k2


def test_minhash_signature_kernel_equals_column_math(spark):
    from fundcrawler_spark.operators.textstats import (
        minhash_signature,
        minhash_signature_kernel,
    )

    rows = [(0, ""), (1, "a"), (2, "ab"), (3, "abc"), (4, "abcd"),
            (5, "汉字测试文本"), (6, "x y z " * 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col = {r["doc_id"]: list(r["sig"]) for r in
           df.select("doc_id", minhash_signature(F.col("text"), 16).alias("sig")).collect()}
    ker = {r["doc_id"]: list(r["sig"])
           for r in minhash_signature_kernel(df, 16).collect()}
    assert col == ker

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    c2 = {r["doc_id"]: list(r["sig"]) for r in
          docs.select("doc_id", minhash_signature(F.col("text"), 16).alias("sig")).collect()}
    k2 = {r["doc_id"]: list(r["sig"])
          for r in minhash_signature_kernel(docs, 16).collect()}
    assert c2 == k2
