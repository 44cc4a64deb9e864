

def test_normalize_url_tracking_param_boundary(spark):
    """Only whole tracking params strip: a param merely CONTAINING a
    tracking name (xgclid) survives intact."""
    from elasticsearch_spark.functions.textstats import normalize_url

    df = spark.createDataFrame(
        [("https://ex.com/?xgclid=abc",),
         ("https://ex.com/?gclid=abc",),
         ("https://ex.com/?utm_source=a&id=7",),
         ("https://ex.com/?id=7&utm_source=a&utm_medium=b",)], "url string")
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    assert got == [
        "https://ex.com/?xgclid=abc",
        "https://ex.com",
        "https://ex.com/?id=7",
        "https://ex.com/?id=7",
    ]
