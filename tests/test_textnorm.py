"""Unit tests for the scalar text layer against reference semantics
(Stemming.java, StopWord.java, IndexerInvertedCompressed.java:110-253)."""

from websearchengine_spark.functions import textnorm as tn


class TestStemmer:
    def test_plain_plural(self):
        assert tn.stem("cats") == "cat"
        assert tn.stem("engines") == "engine"  # -es after "n": plain s strip

    def test_ss_kept(self):
        assert tn.stem("miss") == "miss"
        assert tn.stem("classes") == "class"  # charAt(-3)=='s' -> drop es

    def test_es_after_x_s_ch(self):
        assert tn.stem("boxes") == "box"
        assert tn.stem("churches") == "church"
        assert tn.stem("classes") == "class"

    def test_ed_ing(self):
        assert tn.stem("cated") == "cat"
        assert tn.stem("searching") == "search"
        assert tn.stem("searchingly") == "search"  # -ingly branch (ed/edly/ing all miss)

    def test_y_to_i(self):
        assert tn.stem("company") == "compani"
        assert tn.stem("companies") == "companie"  # step1: -es after 'i'? charAt(-3)='i' not x/s/ch -> strip s -> 'companie'; no ed/ing; no trailing y

    def test_stem_before_lowercase(self):
        # Bing: 'Bing' does not endswith 'ing'? it does ("Bing"[-3:]=='ing')
        assert tn.stem("Bing") == "B"
        assert tn.normalize_token("Bing") is None  # 'b' is a stopword
        # 'CATS' ends with uppercase 'S': Java endsWith is case-sensitive, so
        # step 1 does NOT fire; lowercase happens after -> 'cats' (unstemmed)
        assert tn.normalize_token("CATS") == "cats"
        assert tn.normalize_token("cats") == "cat"

    def test_short_tokens(self):
        assert tn.stem("s") == "s"
        assert tn.stem("as") == "a"
        assert tn.stem("y") == "i"


class TestTokenize:
    def test_stopwords_dropped_and_positions_compact(self):
        toks = tn.tokenize_document("T_itle", "the cats and dogs")
        # 'T_itle' -> stem no-op -> 't_itle' kept; 'the','and' stopwords
        assert toks == ["t_itle", "cat", "dog"]

    def test_boilerplate_strip(self):
        title = "Doc_1"
        text = title + tn.BOILERPLATE_SUFFIX + "hello world"
        assert tn.tokenize_document(title, text) == ["doc_1", "hello", "world"]

    def test_non_alnum_to_space_body_only(self):
        toks = tn.tokenize_document("A_B", "foo-bar baz's")
        # title token 'A_B' -> stem -> lower 'a_b' kept (underscore preserved in title)
        # body: 'foo bar baz s' -> 's' stopword
        assert toks == ["a_b", "foo", "bar", "baz"]


class TestExtract:
    def test_script_style_comment_stripped(self):
        html = (
            b"<html><head><title>T</title><script>var x='leak';</script>"
            b"</head><body><!-- c --><p>hello <b>world</b></p>"
            b"<script>tail</script></body></html>"
        )
        assert tn.extract_text(html) == "hello world"

    def test_entities_and_whitespace(self):
        html = b"<body>a&amp;b   c\n\td&nbsp;e</body>"
        # jsoup decodes &nbsp; to U+00A0 and does NOT treat it as
        # collapsible whitespace (StringUtil.isWhitespace is the 5 ASCII
        # chars only) — verified byte-identical vs the shipped jar.
        assert tn.extract_text(html) == "a&b c d\xa0e"

    def test_no_body_tag(self):
        assert tn.extract_text(b"<head><title>x</title></head>plain text") == "plain text"


class TestParseQuery:
    def test_plain(self):
        assert tn.parse_query("web search") == ["web", "search"]

    def test_phrase(self):
        assert tn.parse_query('"new york city"') == ["new york citi"]

    def test_mixed(self):
        assert tn.parse_query('history "web search" engine') == [
            "histori",
            "web search",
            "engine",
        ]

    def test_not_stopword_filtered(self):
        # query tokens are stemmed but NOT stopword-filtered (QueryPhrase.java)
        assert tn.parse_query("the") == ["the"]


class TestLinks:
    def test_link_regex(self):
        html = b'<a href="Other_Doc">x</a> <a href="has space">y</a> <a href="a/b">z</a>'
        assert tn.extract_links(html) == ["Other_Doc"]
