"""Unit tests for the pure-Python oracle — per-operator checks (SURVEY §5.2).

Each test pins one behavior of the reference's format_results
(/root/reference/pdfplucker/utils.py:23-219) on the span encoding.
"""

from pdfplucker_spark.gen import EDGE_DOCS
from pdfplucker_spark.oracle import TEXT_FORMATS, extract_doc

EDGE = dict(EDGE_DOCS)


def spans_of(name):
    return extract_doc(name, EDGE[name])


def test_all_labels_dispatch():
    out = spans_of("edge_all_labels")
    assert out["status"] == "ok"
    page = out["spans"][0]
    assert page["kind"] == "page" and page["media_ref"] == "1"
    assert page["text"] == (
        "\n# Head#1\n"
        " Equation: e=mc^2\n"
        "\nReference: Ref <1>\n"
        "\n- item_one\n"
        "\nFootnote: foot\n"
        "\n## The_Title\n"  # TITLE gets ## — inverted bug-compat (utils.py:72-73)
        " plain text"
        "\npara graph\n"
        "\np. 1\n"
        "\n- yes\n"
        "\n- no\n"
        " x = 1"  # default branch
    )
    assert len(out["spans"]) == 1  # no images/tables


def test_caption_format_in_page():
    out = extract_doc(
        "d", [{"kind": "caption", "text": "cap", "media_ref": "#/t/0", "offset": 0}]
    )
    assert out["spans"][0]["text"] == " _cap_\n"


def test_page_first_touch_order():
    out = spans_of("edge_page_order")
    pages = [s for s in out["spans"] if s["kind"] == "page"]
    assert [p["media_ref"] for p in pages] == ["3", "1", "2"]  # NOT sorted
    assert pages[0]["text"] == "\non three\n\nback to three\n"  # page 3 revisited


def test_picture_counter_and_placeholders():
    out = spans_of("edge_multi_picture")
    imgs = [s for s in out["spans"] if s["kind"] == "image"]
    assert [i["media_ref"] for i in imgs] == [
        "edge_multi_picture_0.png",
        "edge_multi_picture_1.png",
        "edge_multi_picture_2.png",
    ]
    page = [s for s in out["spans"] if s["kind"] == "page"][0]
    assert page["text"] == (
        " <edge_multi_picture_0.png> between <edge_multi_picture_1.png>"
        "\nmore\n <edge_multi_picture_2.png>"
    )


def test_last_caption_wins_and_echo():
    out = spans_of("edge_captioned")
    tbl = [s for s in out["spans"] if s["kind"] == "table"][0]
    img = [s for s in out["spans"] if s["kind"] == "image"][0]
    # attached caption = last one (dict overwrite, utils.py:69)
    assert out["tables"][0]["caption"] == "second table cap"
    assert img["text"] == "pic cap"
    # caption text ALSO echoed in page content (utils.py:61-62)
    page = [s for s in out["spans"] if s["kind"] == "page"][0]
    assert " _first table cap_\n" in page["text"]
    assert " _second table cap_\n" in page["text"]
    assert tbl["media_ref"] == "#/tables/0"


def test_orphan_caption_page_only():
    out = spans_of("edge_orphan_caption")
    assert [s["kind"] for s in out["spans"]] == ["page"]
    assert out["spans"][0]["text"] == " _nobody home_\n\nbody\n"


def test_table_placeholder_and_payload():
    out = spans_of("edge_table")
    page = out["spans"][0]
    assert page["text"] == "\nbefore\n <#/tables/0>\nafter\n"
    tbl = [s for s in out["spans"] if s["kind"] == "table"][0]
    assert tbl["text"] == "| x | y |\n|---|---|\n| 1 | 2 |"


def test_classification_argmax_first_max():
    out = spans_of("edge_classification")
    im0, im1 = out["images"]
    # argmax by confidence; tie (photo .9 vs logo .9) → first wins (max semantics)
    assert im0["classification"] == "photo" and im0["confidence"] == 0.9
    assert im1["classification"] is None and im1["confidence"] is None


def test_refs_footnotes_always_empty():
    out = spans_of("edge_refs_footnotes")
    assert out["images"][0]["references"] == [] and out["images"][0]["footnotes"] == []
    assert out["tables"][0]["references"] == [] and out["tables"][0]["footnotes"] == []


def test_empty_doc():
    out = spans_of("edge_empty")
    assert out == {
        "doc_id": "edge_empty",
        "status": "ok",
        "error": None,
        "spans": [],
        "pages": [],
        "images": [],
        "tables": [],
    }


def test_unknown_kinds_silently_dropped():
    out = spans_of("edge_unknown_kind")
    assert out["status"] == "ok" and out["spans"] == []


def test_poison_docs_error_not_crash():
    for name in ("edge_poison_nulltext", "edge_poison_badpage", "edge_poison_badann"):
        out = spans_of(name)
        assert out["status"] == "error" and out["error"]
        assert out["spans"] == []


def test_unicode_roundtrip():
    out = spans_of("edge_unicode")
    page = out["spans"][0]["text"]
    assert "\n## Ação não é atenção\n" in page
    assert "señor año 🙂 δx τ 東京" in page
    assert out["tables"][0]["caption"] == "coração _sublinhado_"


def test_null_caption_parent_never_matches():
    out = spans_of("edge_null_caption_ref")
    assert out["status"] == "ok"
    assert out["spans"][0]["text"].startswith(" _nullcap_\n")


def test_offsets_dense_and_ordered():
    for name in EDGE:
        out = spans_of(name)
        assert [s["offset"] for s in out["spans"]] == list(range(len(out["spans"])))


def test_unsorted_input_sorted_by_offset():
    spans = [
        {"kind": "paragraph", "text": "b", "media_ref": None, "offset": 1},
        {"kind": "paragraph", "text": "a", "media_ref": None, "offset": 0},
    ]
    out = extract_doc("d", spans)
    assert out["spans"][0]["text"] == "\na\n\nb\n"


def test_format_table_is_complete():
    assert len(TEXT_FORMATS) == 13
