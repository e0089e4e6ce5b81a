"""Property tests for the HTML extractor: invariants that must hold on
ARBITRARY (generated) DOM trees, not just the fixture corpus.

* no leakage: text under script/style/title/template never appears in
  any extracted block;
* provenance: every extracted block's text is assembled from data that
  was actually in the document (token-level subset);
* order: extracted blocks preserve document order (their texts appear
  in the source in the same sequence);
* determinism: extraction is a pure function;
* renderer round-trip: for any word soup, the generated page's
  extracted text spans reconstruct the normalized input exactly
  (the closed-form oracle property, fuzzed).
"""

from html import escape

from hypothesis import given, settings
from hypothesis import strategies as st

from document_parser_private_ray.sources.html import (
    extract_html_blocks,
    render_html_page,
)

# paragraphs long enough to self-classify (>= 25 chars: 6 words x >=4
# chars + 5 spaces); the script alphabet is disjoint from the para
# alphabet so leakage is directly observable
_word = st.text(alphabet="abcdefghij", min_size=4, max_size=8)
_para = st.lists(_word, min_size=6, max_size=20).map(" ".join)


def _page(paras, scripts, navs):
    parts = ["<html><head><title>t</title>"]
    for s in scripts:
        parts.append(f"<script>{s}</script>")
    parts.append("</head><body>")
    for n in navs:
        parts.append(f"<nav><a href='/x'>{escape(n)}</a></nav>")
    for p in paras:
        parts.append(f"<p>{escape(p)}</p>")
    parts.append("</body></html>")
    return "".join(parts)


@settings(max_examples=60, deadline=None)
@given(
    paras=st.lists(_para, min_size=1, max_size=6),
    scripts=st.lists(st.text(alphabet="klmnop qz", max_size=30), max_size=3),
    navs=st.lists(_para, max_size=3),
)
def test_no_leakage_and_order(paras, scripts, navs):
    html = _page(paras, scripts, navs)
    got = extract_html_blocks(html)
    texts = [b["text"] for b in got]
    # script bodies never leak (alphabets disjoint, so direct check)
    out_tokens = set(" ".join(texts).split())
    for s in scripts:
        assert not (set(s.split()) & out_tokens)
    # provenance + order: the extracted paragraph texts are exactly the
    # input paragraphs (normalized), in order
    norm = [" ".join(p.split()) for p in paras]
    assert texts == [p for p in norm if p]
    # determinism
    assert [b["text"] for b in extract_html_blocks(html)] == texts


@settings(max_examples=40, deadline=None)
@given(
    doc_id=st.integers(min_value=0, max_value=10_000),
    words=st.lists(_word, min_size=10, max_size=120),
)
def test_renderer_roundtrip_fuzzed(doc_id, words):
    """The closed-form oracle property on arbitrary word soup: main
    text spans reconstruct the normalized input; media iff
    doc_id % 5 == 0; heading first."""
    text = " ".join(words)
    got = extract_html_blocks(render_html_page(doc_id, text))
    assert got[0] == {
        "kind": "heading",
        "text": f"Document {doc_id}",
        "media_ref": "",
    }
    main = " ".join(b["text"] for b in got if b["kind"] == "text")
    assert main == text
    media = [b for b in got if b["kind"] == "media"]
    if doc_id % 5 == 0:
        assert [m["media_ref"] for m in media] == [f"media://{doc_id}/0"]
        assert got[2]["kind"] == "media"
    else:
        assert media == []
