"""HTML main-content extraction: boilerplate subtree strip, title
capture, entity decode, whitespace collapse, malformed-markup
resilience, and the pandas-UDF face."""

from loc2vec_spark.operators.html import html_extract, html_extract_udf


def test_basic_strip():
    title, text = html_extract(
        "<html><head><title>My Page</title>"
        "<script>var x = 'not text';</script>"
        "<style>.a { color: red }</style></head>"
        "<body><nav>Home | About</nav>"
        "<h1>Heading</h1><p>First para.</p>"
        "<aside>ad ad ad</aside>"
        "<div><p>Second   para.</p></div>"
        "<footer>(c) 2026</footer></body></html>")
    assert title == "My Page"
    assert text == "Heading First para. Second para."


def test_nested_drop_and_stray_close():
    _, text = html_extract(
        "</footer><p>kept</p><nav>menu<div>sub<p>deep</p></div></nav>"
        "<p>also kept</p></div></nav>")
    assert text == "kept also kept"


def test_void_tags_do_not_unbalance():
    _, text = html_extract(
        "<p>a<br>b<img src=x><hr>c</p><nav>drop<br>me</nav><p>d</p>")
    assert text == "a b c d"


def test_entities_decoded():
    _, text = html_extract("<p>fish &amp; chips &lt;now&gt;</p>")
    assert text == "fish & chips <now>"


def test_title_in_dropped_subtree_ignored():
    # the ubiquitous <svg><title> icon label inside chrome must not
    # pollute the document title (and its text stays out of the body)
    title, text = html_extract(
        "<title>Real Title</title>"
        "<header><svg><title>Menu icon</title></svg>Site</header>"
        "<p>Body text</p>")
    assert title == "Real Title"
    assert text == "Body text"


def test_first_title_wins():
    title, text = html_extract(
        "<title>Doc</title><p>a</p><title>later soup</title><p>b</p>")
    assert title == "Doc"
    assert text == "a b"


def test_empty_title_does_not_consume_the_slot():
    # an empty or immediately-terminated first <title> must not
    # discard the page's real title (first NON-EMPTY title wins)
    assert html_extract(
        "<title></title><title>Real</title><p>x</p>") == ("Real", "x")
    assert html_extract(
        "<title></head><title>Real</title>body")[0] == "Real"
    assert html_extract(
        "<title> </title><title>Real</title><p>x</p>") == ("Real", "x")


def test_unclosed_title_does_not_swallow_document():
    # tag soup: an unclosed <title> must stop capturing at the first
    # tag event of ANY kind — start, void, or end — instead of
    # deleting the whole page text into the title
    title, text = html_extract(
        "<title>Oops<p>all the body text</p> more")
    assert title == "Oops"
    assert text == "all the body text more"
    title, text = html_extract(
        "<title>Oops<br>all the body text<br>more text")
    assert title == "Oops"
    assert text == "all the body text more text"
    title, text = html_extract(
        "<title>Oops</head>body line one<hr>body line two")
    assert title == "Oops"
    assert text == "body line one body line two"


def test_comments_and_truncation_never_raise():
    _, text = html_extract("<p>ok</p><!-- hidden --><p>trunc")
    assert text == "ok trunc"
    assert html_extract("")[1] == ""
    # pure tag soup: exact recovery text is html.parser's business —
    # the contract is only that it never raises
    assert isinstance(html_extract("<<<>>>&&& <b")[1], str)


def test_udf_face(spark):
    df = spark.createDataFrame(
        [(1, "<title>t1</title><p>body one</p><script>x</script>"),
         (2, None)], "doc_id int, html string")
    out = (df.withColumn("ex", html_extract_udf()("html"))
           .select("doc_id", "ex.title", "ex.text")
           .orderBy("doc_id").collect())
    assert (out[0]["title"], out[0]["text"]) == ("t1", "body one")
    assert out[1]["title"] is None and out[1]["text"] is None
